package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** FLAC metadata walk — the lossless member of the audio family
  * (WAV = llm_audio_decode, MP3 = llm_audio_mp3_meta, AAC-in-MP4 =
  * llm_audio_mp4a_meta). Same filter-before-decode posture as all the
  * media walks: everything an audio curation pass gates on (sample
  * rate, channels, bit depth, duration, tags) lives in the metadata
  * blocks before the first audio frame, so the walk never touches
  * entropy-coded subframes (the documented audio stub boundary).
  *
  * From the public FLAC format spec:
  *   - `fLaC` magic, then metadata blocks: a 1-byte header (bit 7 =
  *     last-block flag, bits 0-6 = type) + 24-bit big-endian length;
  *   - STREAMINFO (type 0, 34 bytes, REQUIRED FIRST by spec — a
  *     stream violating that fails loudly): min/max blocksize u16,
  *     min/max framesize u24, then 64 bits packed as sample rate (20)
  *     | channels-1 (3) | bits-per-sample-1 (5) | total samples (36),
  *     then the 16-byte unencoded-audio MD5;
  *   - VORBIS_COMMENT (type 4): little-endian u32 lengths (the one
  *     corner of FLAC that is LE, inherited from Ogg) — vendor string,
  *     comment count, `KEY=value` entries.
  *
  * Malformed input fails loudly (require → IllegalArgumentException):
  * truncated blocks, a non-STREAMINFO first block, a block length
  * overrunning the file, comment lengths overrunning their block.
  */
object Flac {

  final case class FlacMeta(sampleRate: Int, channels: Int,
      bitsPerSample: Int, totalSamples: Long, durationMs: Long,
      nBlocks: Int, title: String)

  private def u16be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u24be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 16) | ((b(o + 1) & 0xff) << 8) | (b(o + 2) & 0xff)
  private def u32le(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  def meta(bytes: Array[Byte]): FlacMeta = {
    require(bytes.length >= 4 + 4 + 34 &&
      bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' &&
      bytes(3) == 'C', "not a FLAC payload")
    var off = 4
    var nBlocks = 0
    var last = false
    var sr = -1; var ch = -1; var bps = -1; var total = -1L
    var title: String = null
    while (!last) {
      require(off + 4 <= bytes.length, "truncated FLAC block header")
      val hdr = bytes(off) & 0xff
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7f
      val len = u24be(bytes, off + 1)
      val body = off + 4
      require(body + len <= bytes.length,
        s"FLAC block length $len overruns the file")
      if (nBlocks == 0) require(typ == 0,
        s"first FLAC block must be STREAMINFO, got type $typ")
      typ match {
        case 0 =>
          require(len == 34, s"STREAMINFO must be 34 bytes, got $len")
          require(sr < 0, "duplicate STREAMINFO block")
          // 10 bytes of blocksize/framesize bounds, then the packed 64
          val p = body + 10
          sr = ((bytes(p) & 0xff) << 12) | ((bytes(p + 1) & 0xff) << 4) |
            ((bytes(p + 2) & 0xff) >> 4)
          ch = ((bytes(p + 2) >> 1) & 0x7) + 1
          bps = (((bytes(p + 2) & 0x1) << 4) |
            ((bytes(p + 3) & 0xff) >> 4)) + 1
          total = ((bytes(p + 3) & 0xfL) << 32) |
            ((bytes(p + 4) & 0xffL) << 24) | ((bytes(p + 5) & 0xffL) << 16) |
            ((bytes(p + 6) & 0xffL) << 8) | (bytes(p + 7) & 0xffL)
          require(sr > 0, "STREAMINFO sample rate is zero")
        case 4 =>
          // Vorbis comment: LE-length vendor, LE count, KEY=value runs
          var p = body
          def readLen(): Int = {
            require(p + 4 <= body + len, "truncated vorbis length")
            val v = u32le(bytes, p); p += 4
            require(v >= 0 && p + v <= body + len,
              s"vorbis field length $v overruns the block")
            v.toInt
          }
          // NB: not `p += readLen()` — that reads the old p before
          // readLen() advances it past the length field.
          val vendLen = readLen(); p += vendLen // vendor string skipped
          require(p + 4 <= body + len, "truncated vorbis comment count")
          val n = u32le(bytes, p).toInt; p += 4
          require(n >= 0 && n <= len, s"absurd vorbis comment count $n")
          (0 until n).foreach { _ =>
            val l = readLen()
            val c = new String(bytes, p, l, "UTF-8"); p += l
            val eq = c.indexOf('=')
            require(eq > 0, s"vorbis comment without '=': $c")
            // field names are case-insensitive ASCII per spec
            if (c.substring(0, eq)
                .toUpperCase(java.util.Locale.ROOT) == "TITLE")
              title = c.substring(eq + 1)
          }
        case t =>
          require(t != 127, "invalid FLAC block type 127")
          // PADDING/SEEKTABLE/APPLICATION/... — skippable by length
      }
      nBlocks += 1
      off = body + len
    }
    require(sr > 0, "FLAC missing STREAMINFO")
    FlacMeta(sr, ch, bps, total, total * 1000L / sr, nBlocks, title)
  }

  /** Closed-form FLAC shell for id d: STREAMINFO (sr by d%3, channels
    * 1+d%2, bps 16/24 by d%2, total samples 10000 + 37*d % 50000),
    * a PADDING block (even ids — varies the block count), and a
    * VORBIS_COMMENT carrying TITLE=t{d%20} as the last block. */
  def synth(d: Long): Array[Byte] = {
    val sr = (d % 3) match {
      case 0 => 44100; case 1 => 48000; case _ => 96000
    }
    val ch = (1 + d % 2).toInt
    val bps = if (d % 2 == 0) 16 else 24
    val total = 10000L + 37 * d % 50000
    val out = new java.io.ByteArrayOutputStream(256)
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO
    out.write(0x00); out.write(0); out.write(0); out.write(34)
    val si = new Array[Byte](34)
    def put16(o: Int, v: Int): Unit = {
      si(o) = (v >> 8).toByte; si(o + 1) = v.toByte
    }
    def put24(o: Int, v: Int): Unit = {
      si(o) = (v >> 16).toByte; si(o + 1) = (v >> 8).toByte
      si(o + 2) = v.toByte
    }
    put16(0, 4096); put16(2, 4096)
    put24(4, (14 + d % 100).toInt); put24(7, (2000 + d % 500).toInt)
    si(10) = (sr >> 12).toByte
    si(11) = ((sr >> 4) & 0xff).toByte
    si(12) = (((sr & 0xf) << 4) | ((ch - 1) << 1) |
      ((bps - 1) >> 4)).toByte
    si(13) = ((((bps - 1) & 0xf) << 4) | ((total >> 32) & 0xf)).toInt.toByte
    si(14) = ((total >> 24) & 0xff).toByte
    si(15) = ((total >> 16) & 0xff).toByte
    si(16) = ((total >> 8) & 0xff).toByte
    si(17) = (total & 0xff).toByte
    // bytes 18-33: unencoded-audio MD5, zero in a metadata shell
    out.write(si, 0, 34)
    if (d % 2 == 0) { // PADDING block, varies n_blocks
      val padLen = (3 + d % 5).toInt
      out.write(0x01); out.write(0); out.write(0); out.write(padLen)
      (0 until padLen).foreach(_ => out.write(0))
    }
    // VORBIS_COMMENT (last block)
    val vendor = "graft0".getBytes("UTF-8")
    val comment = s"TITLE=t${d % 20}".getBytes("UTF-8")
    val vcLen = 4 + vendor.length + 4 + 4 + comment.length
    out.write(0x80 | 0x04); out.write(0); out.write(vcLen >> 8)
    out.write(vcLen & 0xff)
    def putLe(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    putLe(vendor.length); out.write(vendor, 0, vendor.length)
    putLe(1)
    putLe(comment.length); out.write(comment, 0, comment.length)
    out.toByteArray
  }

  private val metaSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("total_samples", LongType),
    StructField("duration_ms", LongType),
    StructField("n_blocks", IntegerType),
    StructField("title", StringType)))

  /** ids → parsed metadata features over closed-form FLAC shells. */
  def metaFeatures(ids: DataFrame, idCol: String): DataFrame = {
    val idIdx = ids.schema.fieldIndex(idCol)
    val rdd = ids.rdd.mapPartitions { rows =>
      rows.map { r =>
        val d = r.getLong(idIdx)
        val m = meta(synth(d))
        Row(d, m.sampleRate, m.channels, m.bitsPerSample, m.totalSamples,
          m.durationMs, m.nBlocks, m.title)
      }
    }
    ids.sparkSession.createDataFrame(rdd, metaSchema)
  }
}
