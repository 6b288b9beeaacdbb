package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Markdown

class MarkdownSpec extends AnyFunSuite {

  test("closed-form fixture extracts to the oracle's exact text and counts") {
    for (d <- 0L to 40L) {
      val doc = Markdown.extract(Markdown.synthMd(d))
      val para = (0 until (5 + d % 7).toInt)
        .map(i => s"w${(d * 2 + i) % 13}").mkString(" ")
      val items = (0 until (2 + d % 3).toInt).map(k => s"it$k").mkString(" ")
      val want = s"head w${d % 13} $para see w${d % 13} and " +
        s"w${(d + 3) % 13} or c${d % 11} $items ot${d % 4} q w${(d + 5) % 13}"
      assert(doc.text == want, s"d=$d")
      assert(doc.nHeadings == 1 && doc.links.toSeq ==
        Seq(s"http://ex.com/p/$d"), s"d=$d")
      assert(doc.nCodeBlocks == (if (d % 2 == 0) 1 else 0), s"d=$d")
      assert(doc.nListItems == (3 + d % 3).toInt, s"d=$d")
    }
  }

  test("declared inline semantics: links, images, code spans, emphasis, snake_case") {
    val doc = Markdown.extract(
      "a [t x](u1) b ![alt y](u2) c `span z` d *em* snake_case e")
    assert(doc.text == "a t x b alt y c span z d em snake_case e")
    assert(doc.links.toSeq == Seq("u1", "u2"))
    // malformed markup is literal prose, never an error
    assert(Markdown.extract("un [closed bracket").text == "un [closed bracket")
    assert(Markdown.extract("lone ` tick").text == "lone ` tick")
    assert(Markdown.extract("no [paren](open").text == "no [paren](open")
    assert(Markdown.extract("empty []() stays").links.toSeq == Seq(""))
  }

  test("declared block semantics: headings, lists, quotes, fences") {
    // 7 hashes or no space after hashes = not a heading (ATX rule)
    assert(Markdown.extract("####### seven").nHeadings == 0)
    assert(Markdown.extract("#nospace").nHeadings == 0)
    assert(Markdown.extract("###### six").nHeadings == 1)
    assert(Markdown.extract("#").nHeadings == 1)
    // ordered items need the dot-space; nested quotes strip fully
    assert(Markdown.extract("12. x").nListItems == 1)
    assert(Markdown.extract("1.x").nListItems == 0)
    assert(Markdown.extract("> > deep quote").text == "deep quote")
    // fenced content is excluded; an unclosed fence swallows the rest
    val f = Markdown.extract("before\n```\nhidden secret\n```\nafter")
    assert(f.text == "before after" && f.nCodeBlocks == 1)
    val unclosed = Markdown.extract("a\n```\nhidden\nstill hidden")
    assert(unclosed.text == "a" && unclosed.nCodeBlocks == 1)
    val two = Markdown.extract("```\nx\n```\nmid\n```\ny\n```")
    assert(two.text == "mid" && two.nCodeBlocks == 2)
  }

  test("extraction is total on arbitrary input") {
    val rng = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val len = rng.nextInt(200)
      val s = new String(Array.fill(len)(
        (32 + rng.nextInt(95)).toChar)) + "\n`[*](#>"
      Markdown.extract(s) // must not throw
    }
    Markdown.extract("")
    Markdown.extract("\n\n\n")
  }
}
