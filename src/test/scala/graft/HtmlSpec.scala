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

  test("whitespace collapses: newlines, tabs, runs") {
    assert(Html.extract("<p>a\n\n  b\t c </p>\n<p> d</p>").text == "a b c d")
  }
}
