package graft.operators

/** sitemaps.org sitemap.xml — robots.txt's companion: the per-site
  * URL inventory a crawl planner diffs against its frontier. The
  * parser is a real (schema-scoped) XML walk: optional prolog,
  * `<urlset>` with attributes, `<url>` entries whose child elements
  * appear in ANY order, whitespace anywhere between elements, entity
  * references in text content, and loud failures on mismatched
  * nesting, unknown elements, or a missing mandatory `<loc>`.
  */
object Sitemap {

  final case class SitemapEntry(loc: String, lastmod: String,
      changefreq: String, priority: Double)

  private def decodeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&amp;", "&") // amp LAST so &amp;lt; decodes to &lt;

  def parse(xml: String): Array[SitemapEntry] = {
    var pos = 0
    def skipWs(): Unit =
      while (pos < xml.length && Character.isWhitespace(xml.charAt(pos)))
        pos += 1
    def expect(tok: String): Unit = {
      require(xml.startsWith(tok, pos),
        s"sitemap: expected '$tok' at $pos, found " +
          s"'${xml.slice(pos, pos + 20)}'")
      pos += tok.length
    }
    // optional prolog
    skipWs()
    if (xml.startsWith("<?xml", pos)) {
      val end = xml.indexOf("?>", pos)
      require(end > 0, "sitemap: unterminated XML prolog")
      pos = end + 2
    }
    skipWs()
    expect("<urlset")
    val gt = xml.indexOf('>', pos)
    require(gt > 0, "sitemap: unterminated <urlset> tag")
    pos = gt + 1
    val out = collection.mutable.ArrayBuffer.empty[SitemapEntry]
    skipWs()
    while (!xml.startsWith("</urlset>", pos)) {
      require(pos < xml.length, "sitemap: unterminated <urlset>")
      expect("<url>")
      var loc: String = null
      var lastmod = ""; var changefreq = ""; var priority = -1.0
      skipWs()
      while (!xml.startsWith("</url>", pos)) {
        require(pos < xml.length && xml.charAt(pos) == '<',
          s"sitemap: expected child element at $pos")
        val nameEnd = xml.indexOf('>', pos)
        require(nameEnd > 0, "sitemap: unterminated child tag")
        val name = xml.substring(pos + 1, nameEnd)
        require(Set("loc", "lastmod", "changefreq", "priority")(name),
          s"sitemap: unknown element <$name>")
        val close = s"</$name>"
        val end = xml.indexOf(close, nameEnd + 1)
        require(end > 0, s"sitemap: missing $close")
        val text = decodeEntities(xml.substring(nameEnd + 1, end).trim)
        name match {
          case "loc" => loc = text
          case "lastmod" => lastmod = text
          case "changefreq" => changefreq = text
          case "priority" =>
            priority = text.toDouble // NFE IS the loud contract
            require(priority >= 0.0 && priority <= 1.0,
              s"sitemap: priority $priority out of [0,1]")
        }
        pos = end + close.length
        skipWs()
      }
      pos += "</url>".length
      require(loc != null, "sitemap: <url> entry missing <loc>")
      out += SitemapEntry(loc, lastmod, changefreq, priority)
      skipWs()
    }
    out.toArray
  }

  private val freqs = Array("daily", "weekly", "monthly")

  /** Closed-form sitemap for site d: 2 + d%4 entries; entry j has an
    * entity-escaped loc, lastmod 2024-01-01 + (7d+j)%365 days,
    * changefreq cycling, priority (5 + (d+j)%5)/10 — every field
    * integer-recomputable. Child order rotates per entry so the
    * any-order contract is exercised by the fixture itself. */
  def synth(d: Long): String = {
    val sb = new StringBuilder(
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      .append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
    val n = (2 + d % 4).toInt
    (0 until n).foreach { j =>
      val loc = s"http://site$d.example/p$j?x=$d&amp;y=$j"
      val lastmod = java.time.LocalDate.of(2024, 1, 1)
        .plusDays((7 * d + j) % 365).toString
      val freq = freqs(((d + j) % 3).toInt)
      val pri = (5 + (d + j) % 5) / 10.0
      val kids = Seq(
        s"<loc>$loc</loc>",
        s"<lastmod>$lastmod</lastmod>",
        s"<changefreq>$freq</changefreq>",
        s"<priority>$pri</priority>")
      val rot = (j % 4)
      sb.append("  <url>")
        .append((kids.drop(rot) ++ kids.take(rot)).mkString(" "))
        .append("</url>\n")
    }
    sb.append("</urlset>\n").toString
  }

  final case class SitemapRef(loc: String, lastmod: String)

  /** The TWO-LEVEL form real sites serve: a `<sitemapindex>` whose
    * `<sitemap>` children each point at a child urlset (sites cap
    * urlsets at 50k URLs, so the index IS the common case). Same
    * schema-scoped walk discipline as parse: mandatory `<loc>`,
    * optional `<lastmod>`, loud on unknown elements or bad nesting. */
  def parseIndex(xml: String): Array[SitemapRef] = {
    var pos = 0
    def skipWs(): Unit =
      while (pos < xml.length && Character.isWhitespace(xml.charAt(pos)))
        pos += 1
    def expect(tok: String): Unit = {
      require(xml.startsWith(tok, pos),
        s"sitemapindex: expected '$tok' at $pos, found " +
          s"'${xml.slice(pos, pos + 20)}'")
      pos += tok.length
    }
    skipWs()
    if (xml.startsWith("<?xml", pos)) {
      val end = xml.indexOf("?>", pos)
      require(end > 0, "sitemapindex: unterminated XML prolog")
      pos = end + 2
    }
    skipWs()
    expect("<sitemapindex")
    val gt = xml.indexOf('>', pos)
    require(gt > 0, "sitemapindex: unterminated open tag")
    pos = gt + 1
    val out = collection.mutable.ArrayBuffer.empty[SitemapRef]
    skipWs()
    while (!xml.startsWith("</sitemapindex>", pos)) {
      require(pos < xml.length, "sitemapindex: unterminated document")
      expect("<sitemap>")
      var loc: String = null
      var lastmod = ""
      skipWs()
      while (!xml.startsWith("</sitemap>", pos)) {
        require(pos < xml.length && xml.charAt(pos) == '<',
          s"sitemapindex: expected child element at $pos")
        val nameEnd = xml.indexOf('>', pos)
        require(nameEnd > 0, "sitemapindex: unterminated child tag")
        val name = xml.substring(pos + 1, nameEnd)
        require(Set("loc", "lastmod")(name),
          s"sitemapindex: unknown element <$name>")
        val close = s"</$name>"
        val end = xml.indexOf(close, nameEnd + 1)
        require(end > 0, s"sitemapindex: missing $close")
        val text = decodeEntities(xml.substring(nameEnd + 1, end).trim)
        if (name == "loc") loc = text else lastmod = text
        pos = end + close.length
        skipWs()
      }
      pos += "</sitemap>".length
      require(loc != null, "sitemapindex: <sitemap> entry missing <loc>")
      out += SitemapRef(loc, lastmod)
      skipWs()
    }
    out.toArray
  }

  def indexChildren(d: Long): Int = (2 + d % 3).toInt

  /** Closed-form index fixture: 2 + d%3 child refs; child k's urlset
    * is synth(1000·d + k), its loc naming sm{k}.xml on the site host. */
  def synthIndex(d: Long): String = {
    val sb = new StringBuilder(
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      .append("<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
    (0 until indexChildren(d)).foreach { k =>
      sb.append("  <sitemap><loc>")
        .append(s"http://site$d.example/sm$k.xml")
        .append("</loc><lastmod>")
        .append(java.time.LocalDate.of(2024, 1, 1)
          .plusDays((11 * d + k) % 365).toString)
        .append("</lastmod></sitemap>\n")
    }
    sb.append("</sitemapindex>\n").toString
  }
}
