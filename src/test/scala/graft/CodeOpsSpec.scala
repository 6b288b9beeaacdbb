package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CodeOps

class CodeOpsSpec extends AnyFunSuite {

  test("closed-form fixture strips to the oracle's exact text") {
    for (d <- 0L to 60L) {
      val s = CodeOps.strip(CodeOps.synthSrc(d))
      val want = s"int a${d % 5} = ${d % 100};\n" +
        "s = \"p// q" + (d % 9) + "\";\n" +
        s" y = ${d % 11};\n" +
        s"z${d % 4}++;"
      assert(s.text == want, s"d=$d")
      assert(s.nLineComments == 2 && s.nBlockComments == 1 &&
        s.nStrings == 1 && s.nLinesKept == 4, s"d=$d")
    }
  }

  test("strings protect comment markers; escapes; total on malformed") {
    // // inside a string is code
    assert(CodeOps.strip("a = \"//x\";").text == "a = \"//x\";")
    // escaped quote does not close the string
    assert(CodeOps.strip("a = \"x\\\"y//z\";").text == "a = \"x\\\"y//z\";")
    // block comments do not nest: first star-slash closes
    assert(CodeOps.strip("/* a /* b */ c").text == " c")
    // unterminated block comment runs to end of input
    assert(CodeOps.strip("x;\n/* open\nmore").text == "x;")
    assert(CodeOps.strip("x;\n/* open\nmore").nBlockComments == 1)
    // unterminated string runs to end of line, scan continues after
    assert(CodeOps.strip("a = \"open\nb = 1; // c").text ==
      "a = \"open\nb = 1;")
    // a lone slash is code
    assert(CodeOps.strip("a = b / c;").text == "a = b / c;")
    // trailing slash at end of input
    assert(CodeOps.strip("a /").text == "a /")
    // right-trim and empty-line dropping
    assert(CodeOps.strip("x;   \n\n  \ny;").text == "x;\ny;")
    // block comment interior newlines preserve line structure
    assert(CodeOps.strip("a; /* c1\nc2\nc3 */ b;").text == "a;\n b;")
    // empty input
    assert(CodeOps.strip("").text == "")
  }

  test("stripping is idempotent: strip(strip(s).text).text == strip(s).text") {
    // Comment markers can only survive a strip INSIDE string literals,
    // and a second pass protects those identically — so stripped text
    // is a fixed point. Catches asymmetries between what the scanner
    // removes and what it preserves.
    val rng = new scala.util.Random(13)
    val chars = "/*\"\\\n aZ9;()"
    for (_ <- 0 until 300) {
      val s = new String(
        Array.fill(300)(chars(rng.nextInt(chars.length))))
      val once = CodeOps.strip(s).text
      assert(CodeOps.strip(once).text == once, s"input=$s")
    }
  }

  test("scanner is linear and terminates on adversarial input") {
    val rng = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val chars = "/*\"\\\n aZ9".toCharArray
      val s = new String(Array.fill(500)(chars(rng.nextInt(chars.length))))
      val out = CodeOps.strip(s) // must terminate, never throw
      assert(out.text.length <= s.length)
    }
  }
}
