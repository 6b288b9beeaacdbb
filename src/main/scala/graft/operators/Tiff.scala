package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Standalone TIFF file walk (VERDICT r15 #5) — Exif.scala's
  * both-endian IFD machinery lifted to the FILE level: the header
  * (byte-order mark, magic 42), the full multi-page IFD CHAIN via the
  * next-IFD pointers (scanned-document corpora are multi-page), the
  * baseline-TIFF tag set (dims, BitsPerSample, Compression,
  * PhotometricInterpretation, SamplesPerPixel, RowsPerStrip,
  * StripOffsets/StripByteCounts), and REAL strip decode: uncompressed
  * and PackBits (the run-length scheme of the public TIFF 6.0 spec),
  * each strip's decoded size validated against rows-in-strip × width
  * × samples — a lying strip table fails loudly.
  *
  * Subset boundary (loud, by name): compressions beyond 1 (none) and
  * 32773 (PackBits) — LZW/CCITT/JPEG-in-TIFF stay behind the codec
  * boundary; BitsPerSample other than 8; tiled layouts (TileWidth is
  * rejected by name — strip organization only).
  *
  * Bomb guards: IFD page count and entry counts capped, next-IFD
  * pointers containment-checked (a pointer cycle cannot loop the
  * walk), PackBits output capped at the strip's declared decoded
  * size, all value offsets containment-checked.
  */
object Tiff {

  // ------------------------------------------------- closed forms

  def nPages(d: Long): Int = (1 + d % 3).toInt
  def pageW(d: Long, p: Int): Int = (16 + (d + p) % 9).toInt
  def pageH(d: Long, p: Int): Int = (10 + (d + 2 * p) % 7).toInt
  def samples(d: Long, p: Int): Int = (1 + 2 * ((d + p) % 2)).toInt
  def packbits(d: Long, p: Int): Boolean = (d + 2 * p) % 2 == 1
  def rowsPerStrip(d: Long, p: Int): Int = (3 + (d + p) % 4).toInt
  /** Rows where (d+p+y)%4==0 are CONSTANT across x — they force real
    * PackBits run packets; other rows vary per pixel (literals). */
  def px(d: Long, p: Int, x: Int, y: Int, c: Int): Int =
    if ((d + p + y) % 4 == 0) ((d + 17 * p + 5 * y + 7 * c) % 256).toInt
    else ((d + 17 * p + 3 * x + 5 * y + 7 * c) % 256).toInt

  // ---------------------------------------------------- fixture

  private def packBitsEncode(row: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < row.length) {
      // find run length at i
      var run = 1
      while (i + run < row.length && run < 128 && row(i + run) == row(i))
        run += 1
      if (run >= 2) {
        out.write(1 - run) // -(run-1)
        out.write(row(i))
        i += run
      } else {
        // literal stretch: until the next run of >= 3 or 128 bytes
        var lit = 1
        var continue = true
        while (continue && i + lit < row.length && lit < 128) {
          var r2 = 1
          while (i + lit + r2 < row.length && r2 < 3 &&
            row(i + lit + r2) == row(i + lit)) r2 += 1
          if (r2 >= 3) continue = false else lit += 1
        }
        out.write(lit - 1)
        out.write(row, i, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  /** Closed-form multi-page TIFF for id d: 1+d%3 pages chained via
    * next-IFD pointers, little-endian on even ids / big-endian on
    * odd, per page gray or RGB, uncompressed or PackBits strips with
    * a small RowsPerStrip so every page is genuinely multi-strip. */
  def synth(d: Long): Array[Byte] = {
    val le = d % 2 == 0
    val out = new java.io.ByteArrayOutputStream(4096)
    def w16(v: Int): Unit =
      if (le) { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      else { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Int): Unit =
      if (le) { out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
      else { out.write((v >> 24) & 0xff); out.write((v >> 16) & 0xff)
        out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    out.write(if (le) 'I' else 'M'); out.write(if (le) 'I' else 'M')
    w16(42)
    // layout: header(8) | per page: strips then IFD (+ offset arrays)
    val np = nPages(d)
    // precompute strips per page
    val pageStrips = (0 until np).map { p =>
      val w = pageW(d, p); val h = pageH(d, p); val sp = samples(d, p)
      val rps = rowsPerStrip(d, p)
      (0 until h by rps).map { y0 =>
        val rows = math.min(rps, h - y0)
        val raw = new Array[Byte](rows * w * sp)
        var i = 0
        for (y <- y0 until y0 + rows; x <- 0 until w; c <- 0 until sp) {
          raw(i) = px(d, p, x, y, c).toByte; i += 1
        }
        if (packbits(d, p)) packBitsEncode(raw) else raw
      }
    }
    var pos = 8 // running file offset
    val stripOffsets = pageStrips.map { strips =>
      strips.map { s => val o = pos; pos += s.length; o }
    }
    // IFD offsets: after all strip data, IFDs laid sequentially; each
    // IFD may need two out-of-line arrays (offsets + bytecounts)
    val ifdAt = new Array[Int](np)
    var ifdPos = pos
    val entriesPerIfd = 10
    (0 until np).foreach { p =>
      ifdAt(p) = ifdPos
      val ns = pageStrips(p).size
      val extra = if (ns > 1) 2 * 4 * ns else 0
      ifdPos += 2 + 12 * entriesPerIfd + 4 + extra
    }
    // first IFD pointer
    w32(ifdAt(0))
    // strip data
    pageStrips.foreach(_.foreach(s => out.write(s, 0, s.length)))
    // IFDs
    (0 until np).foreach { p =>
      val w = pageW(d, p); val h = pageH(d, p); val sp = samples(d, p)
      val ns = pageStrips(p).size
      val arraysAt = ifdAt(p) + 2 + 12 * entriesPerIfd + 4
      w16(entriesPerIfd)
      def entry(tag: Int, typ: Int, cnt: Int, value: Int): Unit = {
        w16(tag); w16(typ); w32(cnt)
        // SHORT inline values sit in the upper half on BE — pack per
        // the spec: value field is 4 bytes, left-justified
        if (typ == 3 && cnt == 1) { w16(value); w16(0) } else w32(value)
      }
      entry(256, 3, 1, w)                        // ImageWidth
      entry(257, 3, 1, h)                        // ImageLength
      entry(258, 3, 1, 8)                        // BitsPerSample
      entry(259, 3, 1, if (packbits(d, p)) 32773 else 1) // Compression
      entry(262, 3, 1, if (sp == 3) 2 else 1)    // Photometric
      entry(273, 4, ns,                          // StripOffsets
        if (ns == 1) stripOffsets(p)(0) else arraysAt)
      entry(277, 3, 1, sp)                       // SamplesPerPixel
      entry(278, 3, 1, rowsPerStrip(d, p))       // RowsPerStrip
      entry(279, 4, ns,                          // StripByteCounts
        if (ns == 1) pageStrips(p)(0).length else arraysAt + 4 * ns)
      entry(296, 3, 1, 2)                        // ResolutionUnit
      w32(if (p + 1 < np) ifdAt(p + 1) else 0)   // next IFD
      if (ns > 1) {
        stripOffsets(p).foreach(w32)
        pageStrips(p).foreach(s => w32(s.length))
      }
    }
    out.toByteArray
  }

  // ------------------------------------------------------- walk

  final case class TiffPage(page: Int, width: Int, height: Int,
      samples: Int, compression: Int, nStrips: Int, decodedBytes: Long,
      pixelSum: Long)

  private def packBitsDecode(b: Array[Byte], from: Int, until: Int,
      expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    var o = 0
    var i = from
    while (i < until) {
      val n = b(i); i += 1
      if (n >= 0) {
        val lit = n + 1
        require(i + lit <= until, "tiff: PackBits literal overruns its strip")
        require(o + lit <= expect,
          "tiff: PackBits output exceeds the declared strip size")
        System.arraycopy(b, i, out, o, lit)
        i += lit; o += lit
      } else if (n != -128) {
        val run = 1 - n
        require(i < until, "tiff: PackBits run missing its byte")
        require(o + run <= expect,
          "tiff: PackBits output exceeds the declared strip size")
        java.util.Arrays.fill(out, o, o + run, b(i))
        i += 1; o += run
      } // -128: no-op per the spec
    }
    require(o == expect,
      s"tiff: strip decodes to $o bytes, expected $expect")
    out
  }

  def parse(bytes: Array[Byte]): Seq[TiffPage] = {
    require(bytes.length >= 8, "tiff: truncated header")
    val le = (bytes(0), bytes(1)) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => throw new IllegalArgumentException(
        "tiff: bad byte-order mark")
    }
    def u16(o: Int): Int = {
      require(o >= 0 && o + 2 <= bytes.length, "tiff: read out of bounds")
      if (le) (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      else ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    }
    def u32(o: Int): Int = {
      require(o >= 0 && o + 4 <= bytes.length, "tiff: read out of bounds")
      if (le) (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      else ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    }
    require(u16(2) == 42, "tiff: bad magic")
    var ifd = u32(4)
    val pages = collection.mutable.ArrayBuffer.empty[TiffPage]
    while (ifd != 0) {
      require(pages.size < 64, "tiff: IFD chain bomb (over 64 pages)")
      require(ifd >= 8 && ifd < bytes.length, s"tiff: IFD offset $ifd " +
        "outside the file")
      val n = u16(ifd)
      require(n >= 1 && n <= 1000, s"tiff: absurd IFD entry count $n")
      var w = -1; var h = -1; var bits = -1; var comp = 1
      var sp = 1; var rps = Int.MaxValue
      var offsets: Array[Int] = null
      var counts: Array[Int] = null
      (0 until n).foreach { k =>
        val e = ifd + 2 + 12 * k
        val tag = u16(e)
        val typ = u16(e + 2)
        val cnt = u32(e + 4)
        require(cnt >= 0 && cnt <= bytes.length,
          s"tiff: absurd value count $cnt for tag $tag")
        def scalar(): Int = typ match {
          case 3 => u16(e + 8)
          case 4 => u32(e + 8)
          case t => throw new IllegalArgumentException(
            s"tiff: tag $tag has type $t where SHORT/LONG is expected")
        }
        def longArray(): Array[Int] = {
          val unit = typ match {
            case 3 => 2
            case 4 => 4
            case t => throw new IllegalArgumentException(
              s"tiff: tag $tag array type $t out of subset")
          }
          val size = unit * cnt
          val at = if (size <= 4) e + 8 else u32(e + 8)
          require(at >= 0 && at + size <= bytes.length,
            s"tiff: tag $tag value array overruns the file")
          Array.tabulate(cnt)(i =>
            if (unit == 2) u16(at + 2 * i) else u32(at + 4 * i))
        }
        tag match {
          case 256 => w = scalar()
          case 257 => h = scalar()
          case 258 =>
            longArray().foreach(b => require(b == 8,
              s"tiff: BitsPerSample $b is outside the 8-bit subset"))
            bits = 8
          case 259 =>
            comp = scalar()
            require(comp == 1 || comp == 32773,
              s"tiff: compression $comp is outside the walk subset " +
                "(uncompressed and PackBits only)")
          case 273 => offsets = longArray()
          case 277 => sp = scalar()
          case 278 => rps = scalar()
          case 279 => counts = longArray()
          case 322 | 323 | 324 | 325 =>
            throw new IllegalArgumentException(
              "tiff: tiled organization is outside the walk subset")
          case _ => () // baseline tags we don't surface — skippable
        }
      }
      require(w > 0 && h > 0, "tiff: page lacks dimensions")
      require(bits == 8, "tiff: page lacks an 8-bit BitsPerSample")
      require(sp >= 1 && sp <= 4, s"tiff: absurd SamplesPerPixel $sp")
      require(offsets != null && counts != null,
        "tiff: page lacks strip offsets or byte counts")
      require(offsets.length == counts.length,
        s"tiff: ${offsets.length} strip offsets but ${counts.length} counts")
      val nStrips = offsets.length
      require(rps >= 1, s"tiff: absurd RowsPerStrip $rps")
      val expectStrips = (h + math.min(rps, h) - 1) / math.min(rps, h)
      require(nStrips == expectStrips,
        s"tiff: $nStrips strips but RowsPerStrip implies $expectStrips")
      var sum = 0L
      var decoded = 0L
      (0 until nStrips).foreach { s =>
        val y0 = s * rps
        val rows = math.min(rps, h - y0)
        val expect = rows * w * sp
        val o = offsets(s); val c = counts(s)
        require(o >= 0 && c >= 0 && o + c <= bytes.length,
          s"tiff: strip $s overruns the file")
        val raw =
          if (comp == 1) {
            require(c == expect,
              s"tiff: uncompressed strip $s is $c bytes, expected $expect")
            java.util.Arrays.copyOfRange(bytes, o, o + c)
          } else packBitsDecode(bytes, o, o + c, expect)
        raw.foreach(b => sum += b & 0xff)
        decoded += raw.length
      }
      pages += TiffPage(pages.size, w, h, sp, comp, nStrips, decoded, sum)
      ifd = u32(ifd + 2 + 12 * n)
    }
    require(pages.nonEmpty, "tiff: no IFDs")
    pages.toSeq
  }

  // ------------------------------------------------ spark plumbing

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("page", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("compression", IntegerType),
    StructField("n_strips", IntegerType),
    StructField("decoded_bytes", LongType),
    StructField("pixel_sum", LongType)))

  /** ids → one row per decoded TIFF page. Per-doc map work. */
  def pageFeatures(ids: DataFrame, idCol: String): DataFrame = {
    val idIdx = ids.schema.fieldIndex(idCol)
    val rdd = ids.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val d = r.getLong(idIdx)
        parse(synth(d)).map { p =>
          Row(d, p.page, p.width, p.height, p.samples, p.compression,
            p.nStrips, p.decodedBytes, p.pixelSum)
        }
      }
    }
    ids.sparkSession.createDataFrame(rdd, schema)
  }
}
