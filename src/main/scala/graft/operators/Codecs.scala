package graft.operators

/** REAL pure-JVM media codecs for the multimodal column (SURVEY §2.11).
  *
  * The container has no image/audio libraries, so earlier rounds
  * shipped the multimodal family with a documented stub codec. These
  * two formats need no library — they are fixed-layout byte formats
  * decodable with plain arithmetic — so for them the codec body is no
  * longer a stub:
  *
  *  - BMP (BITMAPINFOHEADER, 24-bit uncompressed): bottom-up rows,
  *    4-byte row padding, BGR pixel order.
  *  - WAV (RIFF/PCM, 16-bit little-endian mono).
  *
  * Encode exists so the fixture can synthesize deterministic media
  * payloads; decode parses the actual bytes back (header fields, pixel
  *  grid, PCM samples). The cross-engine oracle story: the synthetic
  * payloads are generated from closed-form integer formulas of
  * (doc_id, x, y) / (doc_id, i), so DuckDB can recompute the expected
  * decoded features without parsing bytes — any drift between the
  * encoder, the decoder, and the declared features breaks the driver
  * hash. Resize/frame-sample operate on DECODED data and re-encode,
  * so the round-trip exercises both directions.
  */
object Codecs {

  // ---------------------------------------------------------------- BMP

  final case class Bmp(width: Int, height: Int,
      /** pixels(y)(x) = (r,g,b), y=0 is the TOP row */
      pixels: Array[Array[(Int, Int, Int)]])

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def put16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def put32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
  }

  def rowStride(width: Int): Int = ((width * 3 + 3) / 4) * 4

  def encodeBmp(img: Bmp): Array[Byte] = {
    val stride = rowStride(img.width)
    val dataSize = stride * img.height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    put32(out, 2, out.length); put32(out, 10, 54)
    put32(out, 14, 40)
    put32(out, 18, img.width); put32(out, 22, img.height)
    put16(out, 26, 1); put16(out, 28, 24)
    put32(out, 34, dataSize)
    var y = 0
    while (y < img.height) {
      // BMP stores rows bottom-up
      val fileRow = img.height - 1 - y
      var x = 0
      while (x < img.width) {
        val (r, g, b) = img.pixels(y)(x)
        val o = 54 + fileRow * stride + x * 3
        out(o) = b.toByte; out(o + 1) = g.toByte; out(o + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  def decodeBmp(bytes: Array[Byte]): Bmp = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload")
    require(u16(bytes, 28) == 24 && u32(bytes, 30) == 0,
      "only 24bpp uncompressed BMP supported")
    val off = u32(bytes, 10)
    val width = u32(bytes, 18); val height = u32(bytes, 22)
    // biHeight < 0 means a top-down DIB — reject explicitly rather than
    // let the row math throw NegativeArraySize on non-synthetic input.
    require(width > 0 && height > 0, "only bottom-up (height>0) BMP supported")
    // Long stride: an Int rowStride overflows (negative) at width ≥ 2^29
    // and would make the truncation check below trivially pass, turning
    // a hostile header into an OOM instead of this error.
    val strideL = (width.toLong * 3 + 3) / 4 * 4
    require(off >= 54 && off.toLong + height.toLong * strideL <= bytes.length,
      "truncated BMP payload")
    val stride = strideL.toInt
    val px = Array.ofDim[(Int, Int, Int)](height, width)
    var y = 0
    while (y < height) {
      val fileRow = height - 1 - y
      var x = 0
      while (x < width) {
        val o = off + fileRow * stride + x * 3
        px(y)(x) = (bytes(o + 2) & 0xff, bytes(o + 1) & 0xff, bytes(o) & 0xff)
        x += 1
      }
      y += 1
    }
    Bmp(width, height, px)
  }

  /** Nearest-neighbor resample on decoded pixels: src = floor(dst * srcDim / dstDim). */
  def resizeNearest(img: Bmp, w2: Int, h2: Int): Bmp = {
    val px = Array.ofDim[(Int, Int, Int)](h2, w2)
    var y = 0
    while (y < h2) {
      val sy = y * img.height / h2
      var x = 0
      while (x < w2) { px(y)(x) = img.pixels(sy)(x * img.width / w2); x += 1 }
      y += 1
    }
    Bmp(w2, h2, px)
  }

  // ---------------------------------------------------------------- WAV

  final case class Wav(sampleRate: Int, samples: Array[Int])

  def encodeWavPcm16(w: Wav): Array[Byte] = {
    val dataSize = w.samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    put32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    put32(out, 16, 16); put16(out, 20, 1); put16(out, 22, 1)
    put32(out, 24, w.sampleRate); put32(out, 28, w.sampleRate * 2)
    put16(out, 32, 2); put16(out, 34, 16)
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    put32(out, 40, dataSize)
    var i = 0
    while (i < w.samples.length) { put16(out, 44 + i * 2, w.samples(i) & 0xffff); i += 1 }
    out
  }

  def decodeWav(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 44 && bytes(0) == 'R' && bytes(8) == 'W',
      "not a WAV payload")
    require(u16(bytes, 20) == 1 && u16(bytes, 22) == 1 && u16(bytes, 34) == 16,
      "only PCM16 mono supported")
    // Canonical 44-byte layout only: the 'data' chunk tag must sit at
    // offset 36 and its declared size must fit the payload — otherwise
    // a non-canonical or truncated file would misparse garbage samples
    // or throw a raw index error instead of this message.
    require(bytes(36) == 'd' && bytes(37) == 'a' &&
      bytes(38) == 't' && bytes(39) == 'a', "not a canonical 44-byte WAV")
    val sampleRate = u32(bytes, 24)
    val dataSize = u32(bytes, 40)
    require(dataSize >= 0 && 44L + dataSize <= bytes.length,
      "truncated WAV payload")
    val n = dataSize / 2
    val s = new Array[Int](n)
    var i = 0
    while (i < n) {
      val v = u16(bytes, 44 + i * 2)
      s(i) = if (v >= 0x8000) v - 0x10000 else v // sign-extend i16le
      i += 1
    }
    Wav(sampleRate, s)
  }

  // ---------------------------------------------------------------- PNG
  //
  // PNG needs no external library either: the JVM ships the only
  // nontrivial piece (zlib, via java.util.zip.Deflater/Inflater); the
  // rest is chunk framing (length/type/data/CRC32), big-endian header
  // arithmetic, and the five per-row byte filters
  // (None/Sub/Up/Average/Paeth). Scope: 8-bit truecolor (color type 2),
  // non-interlaced — the layout real RGB corpora use. JPEG/MP4 remain
  // behind the documented stub boundary (entropy coding + DCT is a
  // library-scale job).

  private def u32be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def put32be(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = ((v >> 24) & 0xff).toByte; b(o + 1) = ((v >> 16) & 0xff).toByte
    b(o + 2) = ((v >> 8) & 0xff).toByte; b(o + 3) = (v & 0xff).toByte
  }

  private val pngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  private def pngChunk(out: java.io.ByteArrayOutputStream,
      typ: String, data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); put32be(len, 0, data.length)
    out.write(len)
    val tb = typ.getBytes("US-ASCII")
    out.write(tb); out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    val c = new Array[Byte](4); put32be(c, 0, crc.getValue.toInt)
    out.write(c)
  }

  /** a = left, b = up, c = upper-left (PNG spec §9, exact tie-break
    * order: a, then b, then c). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode as 8-bit truecolor non-interlaced PNG. `filterOf(y)` picks
    * the per-row filter type (0-4); the default cycles through all five
    * so every synthesized payload exercises every unfilter path. */
  def encodePng(img: Bmp, filterOf: Int => Int = _ % 5): Array[Byte] = {
    val w = img.width; val h = img.height; val bpp = 3
    val rowLen = w * bpp
    val raw = new Array[Byte](h * (1 + rowLen))
    var prior: Array[Byte] = null
    val cur = new Array[Byte](rowLen)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = img.pixels(y)(x)
        cur(x * 3) = r.toByte; cur(x * 3 + 1) = g.toByte; cur(x * 3 + 2) = b.toByte
        x += 1
      }
      val f = filterOf(y)
      require(f >= 0 && f <= 4, s"bad PNG filter type $f")
      val base = y * (1 + rowLen)
      raw(base) = f.toByte
      var i = 0
      while (i < rowLen) {
        val left = if (i >= bpp) cur(i - bpp) & 0xff else 0
        val up = if (prior != null) prior(i) & 0xff else 0
        val ul = if (prior != null && i >= bpp) prior(i - bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(base + 1 + i) = (((cur(i) & 0xff) - pred) & 0xff).toByte
        i += 1
      }
      prior = if (prior == null) new Array[Byte](rowLen) else prior
      System.arraycopy(cur, 0, prior, 0, rowLen)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](math.max(1024, raw.length + 64))
    val zOut = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf); zOut.write(buf, 0, n)
    }
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(pngSig)
    val ihdr = new Array[Byte](13)
    put32be(ihdr, 0, w); put32be(ihdr, 4, h)
    ihdr(8) = 8; ihdr(9) = 2; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    pngChunk(out, "IHDR", ihdr)
    pngChunk(out, "IDAT", zOut.toByteArray)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Parse the chunk stream, inflate IDAT, undo per-row filters.
    * Validates signature, per-chunk CRC32, and the IHDR layout fields,
    * failing loudly on anything outside 8-bit RGB non-interlaced. */
  def decodePng(bytes: Array[Byte]): Bmp = {
    require(bytes.length >= 8 + 25 && pngSig.indices.forall(i => bytes(i) == pngSig(i)),
      "not a PNG payload")
    var off = 8
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(off + 8 <= bytes.length, "truncated PNG chunk header")
      val len = u32be(bytes, off)
      require(len >= 0 && off + 12L + len <= bytes.length, "truncated PNG chunk")
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, off + 4, 4 + len)
      require(crc.getValue.toInt == u32be(bytes, off + 8 + len),
        s"PNG chunk CRC mismatch in $typ")
      typ match {
        case "IHDR" =>
          require(len == 13, "bad IHDR length")
          w = u32be(bytes, off + 8); h = u32be(bytes, off + 12)
          require(w > 0 && h > 0, "bad PNG dimensions")
          require(bytes(off + 16) == 8 && bytes(off + 17) == 2,
            "only 8-bit truecolor (RGB) PNG supported")
          require(bytes(off + 18) == 0 && bytes(off + 19) == 0 &&
            bytes(off + 20) == 0,
            "only deflate/adaptive-filter/non-interlaced PNG supported")
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks (tEXt, pHYs, ...) are skippable
      }
      off += 12 + len
    }
    require(w > 0, "PNG missing IHDR")
    // Bound the decoded size BEFORE allocating: hostile dimensions would
    // otherwise overflow the Int row math (NegativeArraySize) or OOM —
    // the same class decodeBmp guards against. 1 GiB of raw scanlines
    // is far beyond any payload this codec's scope handles.
    val rawLenL = h.toLong * (1L + w.toLong * 3)
    require(rawLenL <= (1L << 30), s"PNG dimensions ${w}x$h too large")
    val rowLen = w * 3
    val rawLen = rawLenL.toInt
    val raw = new Array[Byte](rawLen)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var got = 0
    while (got < rawLen && !inflater.finished()) {
      val n = inflater.inflate(raw, got, rawLen - got)
      // inflate()==0 without finishing means the stream can make no
      // progress — truncated input, or a zlib FDICT (preset dictionary)
      // header, which needsInput() does NOT report: without this check
      // that stream spins this loop forever instead of failing loudly.
      require(n > 0 || inflater.finished(),
        "truncated or unsupported (preset-dictionary) PNG IDAT stream")
      got += n
    }
    inflater.end()
    require(got == rawLen, s"PNG IDAT inflated to $got of $rawLen bytes")
    val px = Array.ofDim[(Int, Int, Int)](h, w)
    var prior: Array[Byte] = null
    var y = 0
    while (y < h) {
      val base = y * (1 + rowLen)
      val f = raw(base) & 0xff
      require(f <= 4, s"bad PNG filter type $f in row $y")
      val cur = new Array[Byte](rowLen)
      var i = 0
      while (i < rowLen) {
        val left = if (i >= 3) cur(i - 3) & 0xff else 0
        val up = if (prior != null) prior(i) & 0xff else 0
        val ul = if (prior != null && i >= 3) prior(i - 3) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        cur(i) = (((raw(base + 1 + i) & 0xff) + pred) & 0xff).toByte
        i += 1
      }
      var x = 0
      while (x < w) {
        px(y)(x) = (cur(x * 3) & 0xff, cur(x * 3 + 1) & 0xff, cur(x * 3 + 2) & 0xff)
        x += 1
      }
      prior = cur
      y += 1
    }
    Bmp(w, h, px)
  }

  // ------------------------------------------- deterministic generators

  /** Closed-form pixel: DuckDB recomputes these exact integers from
    * (doc_id, x, y) — the cross-engine contract for the decode path. */
  def synthPixel(d: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((d + x + 11L * y) % 256).toInt,
    ((3L * d + 7L * x + y) % 256).toInt,
    ((5L * d + 2L * x + 3L * y) % 256).toInt)

  def synthBmp(d: Long, width: Int = 16, height: Int = 12): Bmp =
    Bmp(width, height, Array.tabulate(height, width)((y, x) => synthPixel(d, x, y)))

  /** Closed-form PCM sample in [-1000, 1000]. */
  def synthSample(d: Long, i: Int): Int =
    (((i.toLong * (37L + d % 13) + d) % 2001L) - 1000L).toInt

  def synthWav(d: Long, n: Int = 2000, sampleRate: Int = 8000): Wav =
    Wav(sampleRate, Array.tabulate(n)(i => synthSample(d, i)))
}
