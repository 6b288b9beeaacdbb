package graft.operators

/** HTML → visible-text extraction — the third operation of a
  * web-corpus curation pipeline (after WARC record walk and HTTP body
  * framing) and the step that turns crawl archives into the
  * `documents` table every downstream curation operator consumes.
  *
  * Declared semantics (each rule is what the paired DuckDB oracles
  * recompute, and what the specs pin):
  *   - tags are SEPARATORS: every element boundary contributes
  *     whitespace, then runs of whitespace collapse to one space —
  *     so adjacent-tag text nodes ("…</a><a…>…") never fuse;
  *   - `<script>`/`<style>` content is dropped wholesale (matching
  *     case-insensitive close tag), `<!-- comments -->` are dropped;
  *   - `<title>` is captured separately and EXCLUDED from body text;
  *   - character references are decoded in text AND attribute values
  *     (named amp/lt/gt/quot/apos + decimal/hex numeric);
  *   - `<a href>` targets are collected in document order.
  *
  * A single forward scan, zero allocation beyond the builders: the
  * per-partition batch shape in Multimodal.webTextFeatures keeps this
  * embarrassingly parallel — the right 100 TB shape for a pure
  * per-document transform.
  */
object Html {

  final case class HtmlDoc(title: String, text: String,
      links: Array[String], linkTexts: Array[String]) {
    /** (href, anchor text) pairs in document order. */
    def anchors: Array[(String, String)] = links.zip(linkTexts)
  }

  private[operators] def decodeEntities(s: String): String = {
    val amp = s.indexOf('&')
    if (amp < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        // unterminated or overlong references pass through literally —
        // real pages contain bare '&' and the extractor must not throw
        if (semi > i && semi - i <= 10) {
          val name = s.substring(i + 1, semi)
          val decoded: Int = name match {
            case "amp" => '&'
            case "lt" => '<'
            case "gt" => '>'
            case "quot" => '"'
            case "apos" => '\''
            case _ if name.startsWith("#x") || name.startsWith("#X") =>
              try Integer.parseInt(name.substring(2), 16) catch {
                case _: NumberFormatException => -1
              }
            case _ if name.startsWith("#") =>
              try Integer.parseInt(name.substring(1)) catch {
                case _: NumberFormatException => -1
              }
            case _ => -1
          }
          if (decoded >= 0 && decoded <= 0x10ffff &&
              !(decoded >= 0xd800 && decoded <= 0xdfff)) {
            sb.appendAll(Character.toChars(decoded))
            i = semi + 1
          } else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Lowercased element name at `html(start)` == '<' (skipping '/'),
    * or "" for non-name constructs. */
  private[operators] def tagName(html: String, start: Int): String = {
    var i = start + 1
    if (i < html.length && html.charAt(i) == '/') i += 1
    val b = new StringBuilder(8)
    while (i < html.length && b.length < 16 && {
      val c = html.charAt(i)
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9')
    }) { b.append(Character.toLowerCase(html.charAt(i))); i += 1 }
    b.toString
  }

  /** Extract an attribute value from the tag source `[tagStart, tagEnd)`
    * (quoted forms only — the forms this extractor declares). */
  private[operators] def attrValue(tag: String, attr: String): Option[String] = {
    val lower = tag.toLowerCase(java.util.Locale.ROOT)
    var from = 0
    while (from >= 0 && from < lower.length) {
      val at = lower.indexOf(attr, from)
      if (at < 0) return None
      // must be a standalone attribute name followed by =
      val before = if (at == 0) ' ' else lower.charAt(at - 1)
      var eq = at + attr.length
      while (eq < tag.length && tag.charAt(eq) == ' ') eq += 1
      if (Character.isWhitespace(before) && eq < tag.length &&
          tag.charAt(eq) == '=') {
        var v = eq + 1
        while (v < tag.length && tag.charAt(v) == ' ') v += 1
        if (v < tag.length && (tag.charAt(v) == '"' || tag.charAt(v) == '\'')) {
          val q = tag.charAt(v)
          val end = tag.indexOf(q, v + 1)
          if (end > v) return Some(decodeEntities(tag.substring(v + 1, end)))
        }
        return None
      }
      from = at + attr.length
    }
    None
  }

  final case class HtmlBlock(idx: Int, text: String, nWords: Int,
      nLinkWords: Int) {
    /** jusText-style content rule: enough words AND not link-dominated. */
    def isContent: Boolean = nWords >= 3 && nLinkWords * 2 <= nWords
  }

  private val blockTags = Set("p", "h1", "h2", "h3", "h4", "h5", "h6",
    "div", "li", "ul", "ol", "nav", "footer", "header", "section",
    "article", "td", "tr", "table", "br", "blockquote", "pre", "body")

  /** Segment a page into text blocks at block-level tag boundaries,
    * counting anchor-enclosed words per block — the input to
    * boilerplate removal (jusText/trafilatura family): navigation,
    * footers, and "read more" stubs are link-dominated or too short,
    * body prose is neither. Same tolerance contract as extract():
    * never throws on hostile markup. */
  def blocks(html: String): Array[HtmlBlock] = {
    val out = collection.mutable.ArrayBuffer.empty[HtmlBlock]
    val text = new StringBuilder()
    val linkText = new StringBuilder()
    var anchorDepth = 0
    def words(s: String): Array[String] =
      decodeEntities(s).split("\\s+").filter(_.nonEmpty)
    def flush(): Unit = {
      val w = words(text.toString)
      if (w.nonEmpty)
        out += HtmlBlock(out.length, w.mkString(" "), w.length,
          words(linkText.toString).length)
      text.clear(); linkText.clear()
    }
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
          text.append(' ')
        } else {
          val name = tagName(html, i)
          val close = html.indexOf('>', i + 1)
          if (close < 0) { text.append(html.substring(i)); i = n }
          else {
            val isEnd = i + 1 < n && html.charAt(i + 1) == '/'
            name match {
              case "script" | "style" | "title" if !isEnd =>
                val closeTag = "</" + name
                var j = close + 1
                var found = -1
                while (found < 0 && j >= 0 && j < n) {
                  j = html.indexOf('<', j)
                  if (j < 0) found = n
                  else if (j + closeTag.length <= n &&
                      html.regionMatches(true, j, closeTag, 0,
                        closeTag.length)) {
                    val e = html.indexOf('>', j)
                    found = if (e < 0) n else e + 1
                  } else j += 1
                }
                i = if (found < 0) n else found
                text.append(' ')
              case "a" =>
                anchorDepth = math.max(0, anchorDepth + (if (isEnd) -1 else 1))
                i = close + 1
                text.append(' '); linkText.append(' ')
              case t if blockTags.contains(t) =>
                flush()
                i = close + 1
              case _ =>
                i = close + 1
                text.append(' ')
            }
          }
        }
      } else {
        text.append(c)
        if (anchorDepth > 0) linkText.append(c)
        i += 1
      }
    }
    flush()
    out.toArray
  }

  /** One forward scan; never throws on malformed markup (truncated
    * tags and stray '<' degrade to text, per the declared semantics —
    * crawl HTML is hostile and an extractor that aborts a partition
    * on one bad page is useless at corpus scale). */
  def extract(html: String): HtmlDoc = {
    val text = new StringBuilder(html.length / 2)
    val title = new StringBuilder()
    val links = collection.mutable.ArrayBuffer.empty[String]
    val linkTexts = collection.mutable.ArrayBuffer.empty[String]
    // active when inside an <a href=...> whose href was collected —
    // anchor text is the link-graph's relevance signal, captured in
    // parallel with the normal text flow (same separator rules)
    var anchorBuf: StringBuilder = null
    def normalize(sb: StringBuilder): String =
      decodeEntities(sb.toString).split("\\s+").filter(_.nonEmpty)
        .mkString(" ")
    var i = 0
    var inTitle = false
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
          text.append(' ')
        } else {
          val name = tagName(html, i)
          val close = html.indexOf('>', i + 1)
          if (close < 0) { // truncated tag: emit literally, done
            (if (inTitle) title else text).append(html.substring(i))
            i = n
          } else {
            val isEnd = i + 1 < n && html.charAt(i + 1) == '/'
            name match {
              case "script" | "style" if !isEnd =>
                // skip to the matching case-insensitive close tag
                val closeTag = "</" + name
                var j = close + 1
                var found = -1
                while (found < 0 && j >= 0 && j < n) {
                  j = html.indexOf('<', j)
                  if (j < 0) found = n
                  else if (j + closeTag.length <= n &&
                      html.regionMatches(true, j, closeTag, 0,
                        closeTag.length)) {
                    val e = html.indexOf('>', j)
                    found = if (e < 0) n else e + 1
                  } else j += 1
                }
                i = if (found < 0) n else found
                text.append(' ')
              case "title" =>
                inTitle = !isEnd
                i = close + 1
                text.append(' ')
              case "a" if !isEnd =>
                attrValue(html.substring(i, close + 1), "href").foreach {
                  href =>
                    // an anchor opening while another is still open
                    // (missing </a> — the fuzz found this) finalizes
                    // the previous one, keeping links/linkTexts paired
                    if (anchorBuf != null) linkTexts += normalize(anchorBuf)
                    links += href
                    anchorBuf = new StringBuilder()
                }
                i = close + 1
                text.append(' ')
              case "a" =>
                if (anchorBuf != null) {
                  linkTexts += normalize(anchorBuf)
                  anchorBuf = null
                }
                i = close + 1
                text.append(' ')
              case _ =>
                i = close + 1
                text.append(' ')
            }
          }
        }
      } else {
        (if (inTitle) title else text).append(c)
        if (anchorBuf != null && !inTitle) anchorBuf.append(c)
        i += 1
      }
    }
    // an anchor left open at EOF still yields its text
    if (anchorBuf != null) linkTexts += normalize(anchorBuf)
    val norm = decodeEntities(text.toString)
      .split("\\s+").filter(_.nonEmpty).mkString(" ")
    val t = decodeEntities(title.toString)
      .split("\\s+").filter(_.nonEmpty).mkString(" ")
    HtmlDoc(t, norm, links.toArray, linkTexts.toArray)
  }

  /** Structured page metadata: og:* / twitter:* meta tags and
    * application/ld+json blocks. */
  final case class PageMeta(og: Array[(String, String)],
      twitter: Array[(String, String)], ldTypes: Array[String],
      ldNames: Array[String], ldPositions: Array[Long], nLd: Int)

  /** Mine the crawl-curation metadata a corpus builder gates on:
    * OpenGraph (`<meta property="og:...">`) and Twitter-card
    * (`<meta name="twitter:...">`) pairs under the SAME quoted-
    * attribute + entity-decode rules as href extraction, plus every
    * `<script type="application/ld+json">` block parsed as REAL JSON
    * (json4s, the bundled parser the JX surface uses) for its @type /
    * name / position. Tolerance contract matches extract(): hostile
    * markup never throws; a malformed ld+json block is COUNTED (nLd)
    * but contributes no fields — real crawl pages ship broken JSON-LD
    * and a metadata miner must not die on them. */
  def metadata(html: String): PageMeta = {
    val og = collection.mutable.ArrayBuffer.empty[(String, String)]
    val tw = collection.mutable.ArrayBuffer.empty[(String, String)]
    val ldTypes = collection.mutable.ArrayBuffer.empty[String]
    val ldNames = collection.mutable.ArrayBuffer.empty[String]
    val ldPositions = collection.mutable.ArrayBuffer.empty[Long]
    var nLd = 0
    var i = 0
    val n = html.length
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val name = tagName(html, i)
          val close = html.indexOf('>', i + 1)
          if (close < 0) i = n
          else {
            val isEnd = i + 1 < n && html.charAt(i + 1) == '/'
            val tag = html.substring(i, close + 1)
            name match {
              case "meta" if !isEnd =>
                val content = attrValue(tag, "content").getOrElse("")
                attrValue(tag, "property").foreach { p =>
                  if (p.startsWith("og:")) og += ((p.substring(3), content))
                }
                attrValue(tag, "name").foreach { p =>
                  if (p.startsWith("twitter:"))
                    tw += ((p.substring(8), content))
                }
                i = close + 1
              case "script" | "style" if !isEnd =>
                // find the matching close tag (extract()'s rule)
                val closeTag = "</" + name
                var j = close + 1
                var found = -1
                var bodyEnd = n
                while (found < 0 && j >= 0 && j < n) {
                  j = html.indexOf('<', j)
                  if (j < 0) found = n
                  else if (j + closeTag.length <= n &&
                      html.regionMatches(true, j, closeTag, 0,
                        closeTag.length)) {
                    bodyEnd = j
                    val e = html.indexOf('>', j)
                    found = if (e < 0) n else e + 1
                  } else j += 1
                }
                if (name == "script" && attrValue(tag, "type")
                    .exists(_.equalsIgnoreCase("application/ld+json"))) {
                  nLd += 1
                  val raw = html.substring(
                    math.min(close + 1, n), math.min(bodyEnd, n))
                  try {
                    import org.json4s._
                    org.json4s.jackson.JsonMethods.parse(raw) match {
                      case JObject(fields) =>
                        fields.foreach {
                          case ("@type", JString(v)) => ldTypes += v
                          case ("name", JString(v))  => ldNames += v
                          case ("position", JInt(v)) =>
                            ldPositions += v.toLong
                          case _ => ()
                        }
                      case _ => ()
                    }
                  } catch { case _: Exception => () }
                }
                i = if (found < 0) n else found
              case _ => i = close + 1
            }
          }
        }
      } else i += 1
    }
    PageMeta(og.toArray, tw.toArray, ldTypes.toArray, ldNames.toArray,
      ldPositions.toArray, nLd)
  }
}
