package graft

import org.scalatest.funsuite.AnyFunSuite

/** Shipped-but-unreferenced code guard (VERDICT r13 #6). Round 13
  * proved the gap is reachable even under per-round discipline:
  * operators/Avc.scala shipped 776 lines with zero references from any
  * query, tool, or spec, and nothing failed — a wrong CAVLC table
  * would have been invisible. Under this engine's own standard, every
  * capability is a declared query with a green CORRECTNESS row, so
  * unwired code is unverified code. This spec fails the build the
  * moment an operators/ object loses its last reference from outside
  * the operators/ package.
  */
class DeadCodeGuardSpec extends AnyFunSuite {

  private def scalaFiles(root: String): Seq[java.nio.file.Path] = {
    val p = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.isDirectory(p)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala
        .filter(_.toString.endsWith(".scala")).toSeq
    }
  }

  /** Strip // line comments and (nesting-aware) block comments so a
    * prose mention of a file name in another file's design commentary
    * cannot count as a reference — only code can wire code. String
    * literals stay in: a class name inside a string is almost always a
    * registration (extensions config, reflection) and should count. */
  private def stripComments(src: String): String = {
    val sb = new StringBuilder(src.length)
    var i = 0
    var depth = 0
    while (i < src.length) {
      if (depth == 0 && src.startsWith("//", i)) {
        while (i < src.length && src(i) != '\n') i += 1
      } else if (src.startsWith("/*", i)) {
        depth += 1; i += 2
      } else if (depth > 0 && src.startsWith("*/", i)) {
        depth -= 1; i += 2
      } else {
        if (depth == 0) sb.append(src(i))
        i += 1
      }
    }
    sb.toString
  }

  test("every operators/ object is referenced by a query, tool, or spec") {
    val ops = scalaFiles("src/main/scala/graft/operators")
    assert(ops.nonEmpty, "operators/ dir not found — run from the repo root")
    val referencers =
      (scalaFiles("src/main/scala/graft") ++ scalaFiles("src/test/scala/graft"))
        .filterNot(_.toString.contains("/operators/"))
    val corpus = referencers.map { p =>
      p -> stripComments(new String(
        java.nio.file.Files.readAllBytes(p), "UTF-8"))
    }
    val dead = ops.flatMap { p =>
      val name = p.getFileName.toString.stripSuffix(".scala")
      // this spec guards itself too: its own mention of an operator
      // below would not keep it alive, since bare-name matches inside
      // this file are string literals in the assertion message only
      val re = ("(?<![\\w.])" + java.util.regex.Pattern.quote(name) +
        "(?![\\w])").r
      val hit = corpus.exists { case (rp, t) =>
        rp.getFileName.toString != "DeadCodeGuardSpec.scala" &&
          re.findFirstIn(t).isDefined
      }
      if (hit) None else Some(name)
    }
    assert(dead.isEmpty,
      s"dead operators (no reference from any query, tool, or spec " +
        s"outside operators/): ${dead.mkString(", ")} — wire a declared " +
        "query + spec or delete the file from src/main")
  }
}
