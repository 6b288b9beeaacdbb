package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Robots

/** Pins the REP parser and RFC 9309 precedence rules the
  * llm_robots_filter oracle recomputes. */
class RobotsSpec extends AnyFunSuite {

  test("only the * group's rules apply; comments and unknowns skipped") {
    val rules = Robots.parse(Robots.synthRobots(3L))
    // the exoticbot Disallow: / must NOT leak into the * group
    assert(rules.toSeq == Seq(
      Robots.RobotsRule(allow = false, "/a3/"),
      Robots.RobotsRule(allow = true, "/a3/ok")))
  }

  test("longest match wins; tie goes to Allow; no match allows") {
    val rules = Array(
      Robots.RobotsRule(allow = false, "/a/"),
      Robots.RobotsRule(allow = true, "/a/ok"))
    assert(!Robots.allowed(rules, "/a/page"))
    assert(Robots.allowed(rules, "/a/ok123")) // longer Allow wins
    assert(Robots.allowed(rules, "/b/anything")) // no match
    // exact tie between Allow and Disallow of equal length → Allow
    val tie = Array(
      Robots.RobotsRule(allow = false, "/x/"),
      Robots.RobotsRule(allow = true, "/x/"))
    assert(Robots.allowed(tie, "/x/page"))
  }

  test("a user-agent line after rules starts a new group") {
    val rules = Robots.parse(
      """User-agent: *
        |Disallow: /keep/
        |User-agent: otherbot
        |Disallow: /not-ours/
        |""".stripMargin)
    assert(rules.toSeq == Seq(Robots.RobotsRule(allow = false, "/keep/")))
  }

  test("stacked user-agent lines share one group") {
    val rules = Robots.parse(
      """User-agent: somebot
        |User-agent: *
        |Disallow: /both/
        |""".stripMargin)
    assert(rules.toSeq == Seq(Robots.RobotsRule(allow = false, "/both/")))
  }

  test("empty Disallow matches nothing; blank line ends a group") {
    assert(Robots.parse("User-agent: *\nDisallow:\n").isEmpty)
    val rules = Robots.parse(
      "User-agent: *\n\nDisallow: /orphan/\n") // rule outside any group
    assert(rules.isEmpty)
  }

  test("fuzz: robots parse is total — arbitrary text never throws") {
    val rng = new scala.util.Random(47)
    val ok = Robots.synthRobots(5L)
    (0 until 200).foreach { _ =>
      val chars = ok.toCharArray
      (0 until 1 + rng.nextInt(6)).foreach { _ =>
        chars(rng.nextInt(chars.length)) =
          ":#*/ \nabz-".charAt(rng.nextInt(10))
      }
      val rules = Robots.parse(new String(chars)) // tolerant by contract
      rules.foreach(r => Robots.allowed(Array(r), "/any/path"))
    }
  }

  test("crawl-delay: * group's value captured, other agents' ignored") {
    // synthRobots carries Crawl-delay: 999 in the exoticbot group and
    // 1 + k%9 in the * group — only the latter may surface
    val p = Robots.parsePolicy(Robots.synthRobots(13L))
    assert(p.crawlDelay.contains(5)) // 1 + 13%9
    assert(p.rules.toSeq == Robots.parse(Robots.synthRobots(13L)).toSeq)
    // delay in a specific-agent group only → * group has none
    val other = Robots.parsePolicy(
      """User-agent: otherbot
        |Crawl-delay: 7
        |Disallow: /
        |
        |User-agent: *
        |Disallow: /x/
        |""".stripMargin)
    assert(other.crawlDelay.isEmpty)
    assert(other.rules.toSeq == Seq(Robots.RobotsRule(allow = false, "/x/")))
  }

  test("crawl-delay: first valid wins; malformed/negative skipped") {
    val p = Robots.parsePolicy(
      """User-agent: *
        |Crawl-delay: -3
        |Crawl-delay: soon
        |Crawl-delay: 4 # seconds
        |Crawl-delay: 9
        |Disallow: /a/
        |""".stripMargin)
    assert(p.crawlDelay.contains(4))
    // a delay line counts as a rule for group accounting: a later
    // user-agent line starts a NEW group whose delay must not apply
    val regrouped = Robots.parsePolicy(
      """User-agent: *
        |Crawl-delay: 2
        |User-agent: otherbot
        |Crawl-delay: 8
        |""".stripMargin)
    assert(regrouped.crawlDelay.contains(2))
    // absent directive → None (no default invented)
    assert(Robots.parsePolicy("User-agent: *\nDisallow: /a/\n")
      .crawlDelay.isEmpty)
  }

  test("field names are case-insensitive, inline comments stripped") {
    val rules = Robots.parse(
      "USER-AGENT: *\nDISALLOW: /a/ # private\nALLOW: /a/b\n")
    assert(rules.toSeq == Seq(
      Robots.RobotsRule(allow = false, "/a/"),
      Robots.RobotsRule(allow = true, "/a/b")))
  }
}
