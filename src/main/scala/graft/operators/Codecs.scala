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

  // ------------------------------ JPEG / MP4 header-only metadata parse
  //
  // Full JPEG decode (Huffman + DCT) and MP4 video decode remain behind
  // the documented stub boundary — but METADATA does not need a decoder.
  // At 100 TB the first multimodal pass is "filter by dims / duration /
  // codec BEFORE paying for decode", and that pass is plain header
  // arithmetic: a JPEG marker walk to the SOF segment, an ISO-BMFF box
  // walk to mvhd/tkhd. Both are real parsers over real byte layouts
  // (variable-length segment skipping, both SOF0/SOF2 and mvhd v0/v1
  // branches), validated to fail loudly on malformed input.

  final case class JpegMeta(width: Int, height: Int, nComponents: Int,
      progressive: Boolean)

  /** Structurally real JPEG shell: SOI, APP0/JFIF, a variable-length
    * COM segment, DQT, SOF0 (baseline) or SOF2 (progressive), SOS with
    * a short entropy-coded stub, EOI. The entropy bytes are NOT a valid
    * Huffman stream (decode is out of scope); every segment header and
    * length is exact, so a marker-walking parser must do real work. */
  def encodeJpegShell(width: Int, height: Int, nComponents: Int,
      progressive: Boolean, commentLen: Int): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff)
    require(nComponents == 1 || nComponents == 3)
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Byte]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(payload)
    }
    marker(0xd8) // SOI
    seg(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xfe, Array.fill(commentLen)('x'.toByte)) // COM, doc-varying length
    seg(0xdb, 0.toByte +: Array.tabulate(64)(i => ((i * 7) % 255 + 1).toByte))
    val sof = new Array[Byte](6 + 3 * nComponents)
    sof(0) = 8 // precision
    sof(1) = ((height >> 8) & 0xff).toByte; sof(2) = (height & 0xff).toByte
    sof(3) = ((width >> 8) & 0xff).toByte; sof(4) = (width & 0xff).toByte
    sof(5) = nComponents.toByte
    var c = 0
    while (c < nComponents) {
      sof(6 + 3 * c) = (c + 1).toByte     // component id
      sof(7 + 3 * c) = 0x11.toByte        // 1x1 sampling
      sof(8 + 3 * c) = 0                  // quant table
      c += 1
    }
    seg(if (progressive) 0xc2 else 0xc0, sof)
    val sos = new Array[Byte](1 + 2 * nComponents + 3)
    sos(0) = nComponents.toByte
    c = 0
    while (c < nComponents) {
      sos(1 + 2 * c) = (c + 1).toByte; sos(2 + 2 * c) = 0; c += 1
    }
    sos(1 + 2 * nComponents + 2) = 0x3f
    seg(0xda, sos)
    out.write(Array[Byte](0x12, 0x34, 0x56)) // entropy stub, no 0xFF bytes
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Marker walk: skip variable-length segments until a SOF marker,
    * read dimensions/components from it. Handles baseline (SOF0/SOF1)
    * and progressive (SOF2); fails loudly on truncation, a missing
    * SOF, or a non-JPEG payload. */
  def jpegMeta(bytes: Array[Byte]): JpegMeta = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JPEG payload")
    var pos = 2
    while (true) {
      require(pos + 4 <= bytes.length, "truncated JPEG (no SOF segment)")
      require((bytes(pos) & 0xff) == 0xff, s"bad JPEG marker at $pos")
      val m = bytes(pos + 1) & 0xff
      require(m != 0xd9 && m != 0xda, "JPEG scan/EOI reached before SOF")
      val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      require(len >= 2 && pos + 2 + len <= bytes.length,
        "truncated JPEG segment")
      if (m == 0xc0 || m == 0xc1 || m == 0xc2) {
        require(len >= 8, "truncated SOF segment")
        val h = ((bytes(pos + 5) & 0xff) << 8) | (bytes(pos + 6) & 0xff)
        val w = ((bytes(pos + 7) & 0xff) << 8) | (bytes(pos + 8) & 0xff)
        val n = bytes(pos + 9) & 0xff
        require(len == 8 + 3 * n, "SOF length/component mismatch")
        return JpegMeta(w, h, n, progressive = m == 0xc2)
      }
      pos += 2 + len
    }
    sys.error("unreachable")
  }

  final case class Mp4Meta(timescale: Int, durationS: Long, width: Int,
      height: Int, trackId: Int, mvhdVersion: Int)

  private def put64be(b: Array[Byte], o: Int, v: Long): Unit = {
    put32be(b, o, (v >>> 32).toInt); put32be(b, o + 4, (v & 0xffffffffL).toInt)
  }

  private def mp4Box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + payload.length)
    put32be(out, 0, out.length)
    val t = typ.getBytes("US-ASCII"); System.arraycopy(t, 0, out, 4, 4)
    System.arraycopy(payload, 0, out, 8, payload.length)
    out
  }

  /** Structurally real ISO-BMFF metadata shell: ftyp, a doc-varying
    * `free` box, moov{ [free,] mvhd (version 0 OR 1 — different field
    * widths), trak{tkhd with 16.16 fixed-point dims} }. No mdat —
    * sample data is out of scope; the box tree is exact. */
  def encodeMp4Meta(m: Mp4Meta, freeLen: Int, innerFree: Boolean): Array[Byte] = {
    val ftyp = mp4Box("ftyp", {
      val p = new Array[Byte](16)
      System.arraycopy("isom".getBytes("US-ASCII"), 0, p, 0, 4)
      put32be(p, 4, 0x200)
      System.arraycopy("isom".getBytes("US-ASCII"), 0, p, 8, 4)
      System.arraycopy("mp41".getBytes("US-ASCII"), 0, p, 12, 4)
      p
    })
    val free = mp4Box("free", Array.fill(freeLen)(0x20.toByte))
    val duration = m.durationS * m.timescale
    // the v0 duration field is u32 — a longer movie needs a v1 mvhd
    // (the same constraint real muxers enforce)
    require(m.mvhdVersion == 1 || duration <= 0xffffffffL,
      "duration overflows the 32-bit v0 mvhd field; use mvhdVersion = 1")
    val mvhd = if (m.mvhdVersion == 0) {
      val p = new Array[Byte](100) // v0 payload: box totals 108
      // verflags at 0..3 (version 0); ctime/mtime 0 at 4..11
      put32be(p, 12, m.timescale); put32be(p, 16, duration.toInt)
      put32be(p, 20, 0x00010000) // rate 1.0
      p(24) = 1; p(25) = 0       // volume 1.0
      // unity matrix at 36..71
      put32be(p, 36, 0x00010000); put32be(p, 52, 0x00010000)
      put32be(p, 68, 0x40000000)
      put32be(p, 96, 2) // next track id
      mp4Box("mvhd", p)
    } else {
      val p = new Array[Byte](112) // v1 payload: box totals 120
      p(0) = 1 // version
      // 64-bit ctime/mtime at 4..19; timescale at 20, 64-bit duration at 24
      put32be(p, 20, m.timescale); put64be(p, 24, duration)
      put32be(p, 32, 0x00010000)
      p(36) = 1; p(37) = 0
      put32be(p, 48, 0x00010000); put32be(p, 64, 0x00010000)
      put32be(p, 80, 0x40000000)
      put32be(p, 108, 2)
      mp4Box("mvhd", p)
    }
    val tkhd = mp4Box("tkhd", {
      val p = new Array[Byte](84) // v0 payload: box totals 92
      p(3) = 7 // flags: enabled | in-movie | in-preview
      put32be(p, 12, m.trackId)
      put32be(p, 20, duration.toInt)
      put32be(p, 40, 0x00010000); put32be(p, 56, 0x00010000)
      put32be(p, 72, 0x40000000)
      put32be(p, 76, m.width << 16); put32be(p, 80, m.height << 16)
      p
    })
    val trak = mp4Box("trak", tkhd)
    val innerParts =
      if (innerFree) Array(mp4Box("free", Array.fill(12)(0x20.toByte)), mvhd, trak)
      else Array(mvhd, trak)
    val moov = mp4Box("moov", innerParts.flatten)
    ftyp ++ free ++ moov
  }

  /** ISO-BMFF box walk: find moov at the top level, then mvhd (v0 or
    * v1 — the field widths differ) and trak/tkhd inside it. Supports
    * 64-bit `size==1` largesize headers; fails loudly on truncation or
    * missing boxes. */
  def mp4Meta(bytes: Array[Byte]): Mp4Meta = {
    final case class Box(typ: String, start: Int, end: Int)
    def walk(from: Int, to: Int): List[Box] = {
      var pos = from
      val out = List.newBuilder[Box]
      while (pos < to) {
        require(pos + 8 <= to, "truncated MP4 box header")
        val size32 = u32be(bytes, pos)
        val typ = new String(bytes, pos + 4, 4, "US-ASCII")
        val (size, hdr) =
          if (size32 == 1) {
            require(pos + 16 <= to, "truncated MP4 largesize header")
            val hi = u32be(bytes, pos + 8).toLong << 32
            ((hi | (u32be(bytes, pos + 12) & 0xffffffffL)), 16)
          } else (size32.toLong, 8)
        require(size >= hdr && pos + size <= to, s"bad MP4 box size in $typ")
        out += Box(typ, pos + hdr, pos + size.toInt)
        pos += size.toInt
      }
      out.result()
    }
    require(bytes.length >= 8 &&
      new String(bytes, 4, 4, "US-ASCII") == "ftyp", "not an MP4 payload")
    val top = walk(0, bytes.length)
    val moov = top.find(_.typ == "moov")
      .getOrElse(sys.error("MP4 missing moov box"))
    val kids = walk(moov.start, moov.end)
    val mvhd = kids.find(_.typ == "mvhd")
      .getOrElse(sys.error("MP4 missing mvhd box"))
    val ver = bytes(mvhd.start) & 0xff
    val (timescale, duration) =
      if (ver == 0) (u32be(bytes, mvhd.start + 12),
        (u32be(bytes, mvhd.start + 16) & 0xffffffffL))
      else if (ver == 1) (u32be(bytes, mvhd.start + 20), {
        val hi = u32be(bytes, mvhd.start + 24).toLong << 32
        hi | (u32be(bytes, mvhd.start + 28) & 0xffffffffL)
      })
      else sys.error(s"unsupported mvhd version $ver")
    require(timescale > 0, "bad mvhd timescale")
    val trak = kids.find(_.typ == "trak")
      .getOrElse(sys.error("MP4 missing trak box"))
    val tkhd = walk(trak.start, trak.end).find(_.typ == "tkhd")
      .getOrElse(sys.error("MP4 missing tkhd box"))
    require((bytes(tkhd.start) & 0xff) == 0, "only tkhd version 0 supported")
    Mp4Meta(timescale, duration / timescale,
      u32be(bytes, tkhd.start + 76) >>> 16, u32be(bytes, tkhd.start + 80) >>> 16,
      u32be(bytes, tkhd.start + 12), ver)
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

  /** Closed-form JPEG shell — every field the DuckDB oracle recomputes
    * from doc_id alone. Odd ids are progressive (SOF2), every 5th is
    * grayscale (1 component), and the COM length varies per doc so the
    * marker walk's segment skipping is load-bearing. */
  def synthJpeg(d: Long): Array[Byte] =
    encodeJpegShell(
      width = (64 + d % 193).toInt,
      height = (48 + (3 * d) % 157).toInt,
      nComponents = if (d % 5 == 0) 1 else 3,
      progressive = d % 2 == 1,
      commentLen = (10 + d % 40).toInt)

  /** Closed-form MP4 metadata shell: every 3rd id uses a v1 (64-bit)
    * mvhd, odd ids get an extra free box inside moov, and the top-level
    * free box length varies — the box walk cannot assume fixed offsets. */
  def synthMp4(d: Long): Array[Byte] =
    encodeMp4Meta(
      Mp4Meta(
        timescale = (600 + 100 * (d % 9)).toInt,
        durationS = 5 + d % 60,
        width = (320 + 16 * (d % 7)).toInt,
        height = (240 + 16 * (d % 5)).toInt,
        trackId = (1 + d % 3).toInt,
        mvhdVersion = if (d % 3 == 0) 1 else 0),
      freeLen = (d % 32).toInt,
      innerFree = d % 2 == 1)
}
