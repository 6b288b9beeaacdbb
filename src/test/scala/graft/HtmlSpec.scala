package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Codecs, Html}

/** Pins every declared rule of the HTML visible-text extractor —
  * the rules the llm_html_text DuckDB oracle recomputes. */
class HtmlSpec extends AnyFunSuite {

  test("synthetic pages extract to the closed-form title/text/links") {
    (0L until 15L).foreach { d =>
      (1 to 7 by 2).foreach { i =>
        val doc = Html.extract(Codecs.synthHtml(d, i))
        val np = (2 + (d + i) % 3).toInt
        val nl = ((3 * d + i) % 4).toInt
        assert(doc.title == s"Doc $d page $i")
        assert(doc.links.length == nl, s"d=$d i=$i")
        doc.links.zipWithIndex.foreach { case (href, l) =>
          assert(href == s"http://ref$l.example/x?d=$d&l=$l") // entity-decoded
        }
        val pieces = Seq(s"Heading $d-$i") ++
          (0 until np).map(p => s"word${d}_${i}_$p text & entity $p") ++
          (0 until nl).map(l => s"link $l")
        assert(doc.text == pieces.mkString(" "), s"d=$d i=$i")
      }
    }
  }

  test("script and style content is dropped, comments removed") {
    val doc = Html.extract(
      "<body>a<script>var q = '<p>not text</p>';</script>b" +
        "<STYLE>h1 { x: 1 }</STYLE>c<!-- d --><p>e</p></body>")
    assert(doc.text == "a b c e")
  }

  test("tags act as separators so adjacent-tag text never fuses") {
    val doc = Html.extract("<a href='u'>one</a><a href='v'>two</a>")
    assert(doc.text == "one two")
    assert(doc.links.toSeq == Seq("u", "v"))
  }

  test("entities decode in text and attributes; bad refs pass through") {
    val doc = Html.extract(
      """<a href="x?a=1&amp;b=&#50;">A &lt;&gt; &quot;B&quot; &#65;""" +
        " &#x42; &bogus; & C</a>")
    assert(doc.links.head == "x?a=1&b=2")
    assert(doc.text == "A <> \"B\" A B &bogus; & C")
  }

  test("title is captured separately and excluded from body text") {
    val doc = Html.extract(
      "<head><title>The  Title </title></head><body>body text</body>")
    assert(doc.title == "The Title")
    assert(doc.text == "body text")
  }

  test("hostile markup degrades to text instead of throwing") {
    // truncated tag at EOF, stray '<', unclosed script
    assert(Html.extract("a < b").text == "a < b")
    assert(Html.extract("ok <div unfinished").text == "ok <div unfinished")
    assert(Html.extract("x<script>never closed").text == "x")
    assert(Html.extract("").text == "")
    // href without quotes is not collected (declared: quoted forms only)
    assert(Html.extract("<a href=u>t</a>").links.isEmpty)
    // a non-anchor tag containing 'href' in an attribute value is ignored
    assert(Html.extract("<p data-x=\"href=z\">t</p>").links.isEmpty)
  }

  test("anchor texts pair with hrefs in document order") {
    val doc = Html.extract(
      """<a href="/a">first &amp; link</a>x<a href="/b"> second  one </a>""" +
        """<a name="no-href">skipped</a><a href="/c">""")
    assert(doc.links.toSeq == Seq("/a", "/b", "/c"))
    // entity-decoded, whitespace-normalized; no-href anchors skipped;
    // an anchor left open at EOF still yields its (empty) text
    assert(doc.linkTexts.toSeq == Seq("first & link", "second one", ""))
    assert(doc.anchors.toSeq ==
      Seq(("/a", "first & link"), ("/b", "second one"), ("/c", "")))
    // synthetic pages: anchor l reads "link l"
    (0L until 8L).foreach { d =>
      val p = Html.extract(graft.operators.Codecs.synthHtml(d, 3))
      p.anchors.zipWithIndex.foreach { case ((href, t), l) =>
        assert(t == s"link $l" && href.endsWith(s"l=$l"), s"d=$d l=$l")
      }
    }
  }

  test("blocks segment at block tags with per-block link-word counts") {
    val bs = Html.blocks(
      """<body><div><a href="/a">nav one</a><a href="/b">nav two</a></div>
        |<h1>Big story number 7</h1>
        |<p>real prose with plenty of words here</p>
        |<p>See <a href="/m">more 7</a></p>
        |<footer>c 7</footer></body>""".stripMargin)
    assert(bs.map(_.text).toSeq == Seq(
      "nav one nav two", "Big story number 7",
      "real prose with plenty of words here", "See more 7", "c 7"))
    assert(bs.map(b => (b.nWords, b.nLinkWords)).toSeq ==
      Seq((4, 4), (4, 0), (7, 0), (3, 2), (2, 0)))
    assert(bs.map(_.isContent).toSeq ==
      Seq(false, true, true, false, false))
  }

  test("content rule boundaries: exactly 3 words, exactly half links") {
    // 3 words, 0 links → content (>= 3 is inclusive)
    assert(Html.blocks("<p>a b c</p>").head.isContent)
    // 2 words → boilerplate
    assert(!Html.blocks("<p>a b</p>").head.isContent)
    // 4 words, 2 in links → ratio exactly 1/2 → content (<= is inclusive)
    assert(Html.blocks("<p>a b <a href='u'>c d</a></p>").head.isContent)
    // 4 words, 3 in links → boilerplate
    assert(!Html.blocks("<p>a <a href='u'>b c d</a></p>").head.isContent)
  }

  test("blocks skip script/style/title and survive hostile markup") {
    val bs = Html.blocks(
      "<title>t</title><p>x<script>var a=1;</script>y</p><p></p>trail")
    assert(bs.map(_.text).toSeq == Seq("x y", "trail"))
    assert(Html.blocks("").isEmpty)
    assert(Html.blocks("<p>a</a></a>b</p>").head.text == "a b") // depth floor
  }

  test("synthetic web pages block-extract to the closed-form features") {
    (0L until 12L).foreach { d =>
      val bs = Html.blocks(graft.operators.Codecs.synthWebPage(d))
      val np = (3 + d % 4).toInt
      assert(bs.length == np + 4, s"d=$d")
      val content = bs.filter(_.isContent)
      assert(content.length == np + 1)
      assert(content.map(_.nWords).sum == 4 + 7 * np)
      assert(content.head.text == s"Big story number $d")
    }
  }

  test("fuzz: extract and blocks terminate on arbitrary corruption") {
    // the extractor's contract is TOLERANCE — hostile markup degrades
    // to text, never throws, never hangs (crawl HTML is adversarial)
    val rng = new scala.util.Random(41)
    val seeds = Seq(
      graft.operators.Codecs.synthHtml(7L, 3),
      graft.operators.Codecs.synthWebPage(11L))
    seeds.foreach { ok =>
      (0 until 200).foreach { _ =>
        val chars = ok.toCharArray
        (0 until 1 + rng.nextInt(8)).foreach { _ =>
          chars(rng.nextInt(chars.length)) =
            "<>&;#/\"'= abz-!".charAt(rng.nextInt(15))
        }
        val bad = new String(chars)
        val doc = Html.extract(bad) // must not throw
        assert(doc.links.length == doc.linkTexts.length)
        Html.blocks(bad) // must not throw
      }
    }
  }

  test("whitespace collapses: newlines, tabs, runs") {
    assert(Html.extract("<p>a\n\n  b\t c </p>\n<p> d</p>").text == "a b c d")
  }

  test("metadata: og/twitter pairs entity-decode, ld+json parses") {
    val html = """<html><head><title>T</title>""" +
      """<meta property="og:title" content="A &amp; B"/>""" +
      """<meta property="og:image" content="http://x.example/i.webp"/>""" +
      """<meta name="twitter:card" content="summary"/>""" +
      """<meta name="viewport" content="width=device-width"/>""" +
      """<script type="application/ld+json">""" +
      """{"@type":"Article","name":"N","position":5}</script>""" +
      """<script>var x = {"@type":"NotLd"};</script>""" +
      """</head><body><p>hi</p></body></html>"""
    val m = Html.metadata(html)
    assert(m.og.toSeq == Seq("title" -> "A & B",
      "image" -> "http://x.example/i.webp"))
    assert(m.twitter.toSeq == Seq("card" -> "summary"))
    assert(m.nLd == 1 && m.ldTypes.toSeq == Seq("Article"))
    assert(m.ldNames.toSeq == Seq("N") && m.ldPositions.toSeq == Seq(5L))
    // the untyped script is NOT counted and text extraction still
    // skips both script bodies
    assert(Html.extract(html).text == "hi")
  }

  test("metadata: malformed ld+json is counted but contributes nothing") {
    val m = Html.metadata(
      """<script type="application/ld+json">{"@type": oops</script>""" +
        """<script type="application/LD+JSON">{"@type":"Recipe"}</script>""")
    assert(m.nLd == 2) // case-insensitive type match, broken block counted
    assert(m.ldTypes.toSeq == Seq("Recipe"))
  }

  test("metadata never throws on hostile markup") {
    val rng = new scala.util.Random(9292)
    val ok = graft.operators.Codecs.synthHtml(7L, 1)
    (0 until 200).foreach { _ =>
      val chars = ok.toCharArray
      (0 until 1 + rng.nextInt(8)).foreach { _ =>
        chars(rng.nextInt(chars.length)) =
          "<>&;#/\"'= abz-!{}".charAt(rng.nextInt(17))
      }
      Html.metadata(new String(chars)) // must not throw
    }
  }
}
