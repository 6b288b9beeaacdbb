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
    val stride = rowStride(width)
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
    val sampleRate = u32(bytes, 24)
    val dataSize = u32(bytes, 40)
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
