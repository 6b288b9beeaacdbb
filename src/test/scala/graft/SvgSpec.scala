package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Svg

class SvgSpec extends AnyFunSuite {

  test("fixtures walk to the closed forms") {
    for (d <- 0L until 80L) {
      val m = Svg.parse(Svg.synth(d))
      assert(m.width == (100 + d % 50).toString, s"d=$d")
      assert(m.viewBox == s"0 0 ${100 + d % 50} ${80 + d % 40}")
      assert(m.nPaths == (1 + d % 4).toInt)
      assert(m.nShapes == (d % 3 + d % 2).toInt)
      assert(m.nScripts == (if (d % 7 == 0) 1 else 0))
      val cmds = (0 until m.nPaths).map(i => (2 + (d + i) % 5).toInt).sum
      assert(m.nCommands == cmds, s"d=$d commands")
      assert(m.title == s"icon & $d")
    }
  }

  test("hostile markup never throws; a missing root is loud") {
    val rng = new scala.util.Random(2001)
    val ok = Svg.synth(7L)
    (0 until 200).foreach { _ =>
      val chars = ok.toCharArray
      (0 until 1 + rng.nextInt(6)).foreach { _ =>
        chars(rng.nextInt(chars.length)) =
          "<>&;\"'= abz/".charAt(rng.nextInt(12))
      }
      try { Svg.parse(new String(chars)); () }
      catch {
        case e: RuntimeException
            if e.isInstanceOf[IllegalArgumentException] ||
              e.getClass == classOf[RuntimeException] => ()
      }
    }
    assert(intercept[IllegalArgumentException](
      Svg.parse("<html><p>nope</p></html>"))
      .getMessage.contains("svg"))
  }
}
