package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sitemap

class SitemapSpec extends AnyFunSuite {

  test("closed-form sitemaps round-trip every field and child order") {
    (0L until 20L).foreach { d =>
      val es = Sitemap.parse(Sitemap.synth(d))
      assert(es.length == (2 + d % 4).toInt, s"d=$d")
      es.zipWithIndex.foreach { case (e, j) =>
        assert(e.loc == s"http://site$d.example/p$j?x=$d&y=$j") // decoded
        assert(e.lastmod == java.time.LocalDate.of(2024, 1, 1)
          .plusDays((7 * d + j) % 365).toString)
        assert(e.changefreq ==
          Seq("daily", "weekly", "monthly")(((d + j) % 3).toInt))
        assert(e.priority == (5 + (d + j) % 5) / 10.0)
      }
    }
  }

  test("whitespace-tolerant, prolog optional, entities decode in loc") {
    val es = Sitemap.parse(
      """<urlset xmlns="x">
        |  <url>
        |    <loc>http://a.example/?q=1&amp;r=2</loc>
        |  </url>
        |</urlset>""".stripMargin)
    assert(es.length == 1)
    assert(es.head.loc == "http://a.example/?q=1&r=2")
    assert(es.head.lastmod == "" && es.head.priority == -1.0)
  }

  test("fuzz: corrupted sitemaps either parse or fail with the loud class") {
    val rng = new scala.util.Random(43)
    val ok = Sitemap.synth(9L)
    (0 until 200).foreach { trial =>
      val chars = ok.toCharArray
      (0 until 1 + rng.nextInt(6)).foreach { _ =>
        chars(rng.nextInt(chars.length)) =
          "<>/&; =\"ablz0".charAt(rng.nextInt(13))
      }
      try { Sitemap.parse(new String(chars)); () }
      catch {
        // IllegalArgumentException (incl. NumberFormatException) IS
        // the declared loud contract; DateTimeParse etc. never leak
        // because the parser returns strings — any other throwable is
        // a missing guard and fails this test
        case _: IllegalArgumentException => ()
      }
    }
  }

  test("malformed sitemaps fail loudly") {
    // unknown child element
    intercept[IllegalArgumentException](Sitemap.parse(
      "<urlset><url><loc>u</loc><bogus>x</bogus></url></urlset>"))
    // missing mandatory loc
    intercept[IllegalArgumentException](Sitemap.parse(
      "<urlset><url><lastmod>2024-01-01</lastmod></url></urlset>"))
    // unterminated urlset
    intercept[IllegalArgumentException](Sitemap.parse(
      "<urlset><url><loc>u</loc></url>"))
    // mismatched nesting (url closed before child)
    intercept[IllegalArgumentException](Sitemap.parse(
      "<urlset><url><loc>u</url></loc></urlset>"))
    // priority out of range
    intercept[IllegalArgumentException](Sitemap.parse(
      "<urlset><url><loc>u</loc><priority>1.5</priority></url></urlset>"))
    // non-numeric priority (NumberFormatException is an IAE)
    intercept[IllegalArgumentException](Sitemap.parse(
      "<urlset><url><loc>u</loc><priority>hi</priority></url></urlset>"))
  }

  test("sitemapindex parses refs in order and rejects violations by name") {
    for (d <- 0L to 40L) {
      val refs = Sitemap.parseIndex(Sitemap.synthIndex(d))
      assert(refs.length == Sitemap.indexChildren(d), s"d=$d")
      refs.zipWithIndex.foreach { case (r, k) =>
        assert(r.loc == s"http://site$d.example/sm$k.xml", s"d=$d k=$k")
        assert(r.lastmod == java.time.LocalDate.of(2024, 1, 1)
          .plusDays((11 * d + k) % 365).toString, s"d=$d k=$k")
      }
    }
    // a urlset is NOT an index — the walk must not silently accept it
    val e1 = intercept[IllegalArgumentException](
      Sitemap.parseIndex(Sitemap.synth(3L)))
    assert(e1.getMessage.contains("sitemapindex"), e1.getMessage)
    // unknown child element
    val e2 = intercept[IllegalArgumentException](Sitemap.parseIndex(
      "<sitemapindex><sitemap><priority>1</priority></sitemap>" +
        "</sitemapindex>"))
    assert(e2.getMessage.contains("unknown element"), e2.getMessage)
    // missing mandatory loc
    val e3 = intercept[IllegalArgumentException](Sitemap.parseIndex(
      "<sitemapindex><sitemap><lastmod>2024-01-01</lastmod></sitemap>" +
        "</sitemapindex>"))
    assert(e3.getMessage.contains("missing <loc>"), e3.getMessage)
  }
}
