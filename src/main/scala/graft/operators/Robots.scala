package graft.operators

/** robots.txt (REP, RFC 9309) — the crawl-policy filter every
  * web-corpus pipeline applies before a page may enter the corpus.
  *
  * Declared semantics (what the llm_robots_filter oracle recomputes):
  *   - only the `User-agent: *` group's rules apply;
  *   - field names are case-insensitive, `#` starts a comment,
  *     blank lines end a group;
  *   - a URL path is judged by the LONGEST matching rule prefix;
  *     on a length tie Allow wins; no matching rule ⇒ allowed
  *     (RFC 9309 §2.2.2 precedence);
  *   - an empty `Disallow:` value matches nothing (allow-all).
  *
  * The rules table is a per-HOST dimension — tiny next to the URL
  * fact table (one robots.txt per site vs millions of pages), so the
  * filter is a broadcast join + a per-URL argmax, never a shuffle of
  * the URL side.
  */
object Robots {

  final case class RobotsRule(allow: Boolean, prefix: String)

  /** The `*` group's full policy: path rules plus the de-facto
    * Crawl-delay extension (seconds between fetches; not in RFC 9309
    * but honored by most non-Google crawlers). `crawlDelay` is the
    * FIRST valid value in the `*` group — non-negative integer
    * seconds; malformed or negative values are skipped like any
    * unknown field, and a delay in another agent's group never
    * applies. */
  final case class RobotsPolicy(
      rules: Array[RobotsRule], crawlDelay: Option[Int])

  /** Parse the `*` group's Allow/Disallow rules. Real-world tolerant:
    * unknown fields are skipped, group boundaries are blank lines or
    * a new User-agent run after rules. */
  def parse(content: String): Array[RobotsRule] =
    parsePolicy(content).rules

  /** Full `*`-group parse: rules + crawl-delay (see RobotsPolicy). */
  def parsePolicy(content: String): RobotsPolicy = {
    val out = collection.mutable.ArrayBuffer.empty[RobotsRule]
    var delay: Option[Int] = None
    var inStar = false
    var sawRulesInGroup = false
    content.split("\n").foreach { raw =>
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.take(h) else raw }
        .trim
      if (line.isEmpty) {
        // blank line ends the current group
        inStar = false; sawRulesInGroup = false
      } else {
        val i = line.indexOf(':')
        if (i > 0) {
          val field = line.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(i + 1).trim
          field match {
            case "user-agent" =>
              // a user-agent line AFTER rules starts a new group
              if (sawRulesInGroup) { inStar = false; sawRulesInGroup = false }
              if (value == "*") inStar = true
            case "allow" if inStar =>
              sawRulesInGroup = true
              if (value.nonEmpty) out += RobotsRule(allow = true, value)
            case "disallow" if inStar =>
              sawRulesInGroup = true
              if (value.nonEmpty) out += RobotsRule(allow = false, value)
            case "crawl-delay" if inStar =>
              // de-facto extension: first valid value wins; rule-group
              // accounting matches allow/disallow (a later user-agent
              // line starts a fresh group)
              sawRulesInGroup = true
              if (delay.isEmpty && value.matches("\\d{1,9}"))
                delay = Some(value.toInt)
            case _ => () // sitemap, other agents' rules
          }
        }
      }
    }
    RobotsPolicy(out.toArray, delay)
  }

  /** RFC 9309 precedence: longest matching prefix wins; tie → Allow;
    * no match → allowed. */
  def allowed(rules: Array[RobotsRule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (path.startsWith(r.prefix)) {
        val l = r.prefix.length
        if (l > bestLen || (l == bestLen && r.allow)) {
          bestLen = l; bestAllow = r.allow
        }
      }
    }
    bestAllow
  }

  /** Closed-form robots.txt for host k — a specific-agent group the
    * `*` rules must NOT absorb, comments, an empty Disallow, then the
    * `*` group: Disallow: /a{k%7}/ with an Allow: /a{k%7}/ok carve-out
    * (longer prefix ⇒ wins under RFC precedence). The `*` group's
    * Crawl-delay varies per host (1 + k%9 seconds) so the frontier's
    * delay-derived fetch budget exercises every value; the exoticbot
    * group's delay must NOT apply. */
  def synthRobots(k: Long): String =
    s"""# robots for site$k.example
       |User-agent: exoticbot
       |Crawl-delay: 999
       |Disallow: /
       |
       |User-agent: *
       |Crawl-delay: ${1 + k % 9}
       |Disallow:
       |Disallow: /a${k % 7}/
       |Allow: /a${k % 7}/ok
       |""".stripMargin
}
