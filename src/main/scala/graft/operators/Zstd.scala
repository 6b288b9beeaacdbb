package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Zstandard FRAME walk with real RAW/RLE block decode (RFC 8878) —
  * the lake-compression triage pass beside the parquet footer walk:
  * magic numbers, frame-header descriptors (content-size field sizes
  * 0/2/4/8 with the +256 bias on the 2-byte form, single-segment,
  * dictionary-id widths), window descriptors, SKIPPABLE frames
  * (0x184D2A5x) carried by real streams for metadata/padding, and the
  * 3-byte block headers. Raw and RLE blocks are DECODED — files built
  * from them are valid zstd any tool can read — and both integrity
  * ladders are verified: the declared Frame_Content_Size against the
  * decoded length, and the 4-byte content checksum against the low 32
  * bits of XXH64(content, seed 0), implemented here from the public
  * xxHash spec and cross-checked in ZstdSpec against Spark's own
  * catalyst XXH64. FSE/Huffman-compressed blocks are the loud
  * boundary — triage reads structure; bulk decompression is the
  * bundled codec's job. */
object Zstd {

  // ------------------------------------------------------------ XXH64

  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  /** XXH64 of bytes[from, until) with the given seed (xxHash spec). */
  def xxh64(b: Array[Byte], from: Int, until: Int, seed: Long): Long = {
    def u64le(o: Int): Long = {
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (b(o + i) & 0xffL); i -= 1 }
      v
    }
    def u32le(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))
    def round(acc: Long, in: Long): Long =
      rotl(acc + in * P2, 31) * P1
    def merge(acc: Long, v: Long): Long =
      (acc ^ round(0L, v)) * P1 + P4
    val len = until - from
    var p = from
    var h =
      if (len >= 32) {
        var v1 = seed + P1 + P2
        var v2 = seed + P2
        var v3 = seed
        var v4 = seed - P1
        while (p + 32 <= until) {
          v1 = round(v1, u64le(p)); v2 = round(v2, u64le(p + 8))
          v3 = round(v3, u64le(p + 16)); v4 = round(v4, u64le(p + 24))
          p += 32
        }
        var acc = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        acc = merge(acc, v1); acc = merge(acc, v2)
        acc = merge(acc, v3); acc = merge(acc, v4)
        acc
      } else seed + P5
    h += len
    while (p + 8 <= until) { h = rotl(h ^ round(0L, u64le(p)), 27) * P1 + P4; p += 8 }
    if (p + 4 <= until) { h = rotl(h ^ (u32le(p) * P1), 23) * P2 + P3; p += 4 }
    while (p < until) { h = rotl(h ^ ((b(p) & 0xffL) * P5), 11) * P1; p += 1 }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  // ------------------------------------------------------------- walk

  private def u32le(b: Array[Byte], o: Int): Long = {
    require(o >= 0 && o + 4 <= b.length, "zstd stream truncated")
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  }

  final case class ZstdInfo(nFrames: Int, nSkippable: Int, nBlocks: Int,
      nRleBlocks: Int, contentBytes: Long, contentSum: Long,
      checksummed: Int, dictId: Long)

  def walk(bytes: Array[Byte]): ZstdInfo = {
    var pos = 0
    var nFrames = 0
    var nSkip = 0
    var nBlocks = 0
    var nRle = 0
    var content = 0L
    var contentSum = 0L
    var checksummed = 0
    var dictId = -1L
    while (pos < bytes.length) {
      val magic = u32le(bytes, pos)
      if ((magic & 0xfffffff0L) == 0x184D2A50L) {
        // skippable frame: magic + u32 size + payload, never decoded
        val sz = u32le(bytes, pos + 4)
        require(pos + 8 + sz <= bytes.length,
          s"skippable frame overruns the stream at $pos")
        nSkip += 1
        pos += 8 + sz.toInt
      } else {
        require(magic == 0xFD2FB528L,
          f"bad zstd magic 0x$magic%08x at offset $pos")
        pos += 4
        require(pos < bytes.length, "zstd frame header truncated")
        val fhd = bytes(pos) & 0xff
        pos += 1
        require((fhd & 0x08) == 0, "reserved frame-header bit set")
        val singleSegment = (fhd & 0x20) != 0
        val checksumFlag = (fhd & 0x04) != 0
        val didSize = Array(0, 1, 2, 4)(fhd & 0x3)
        val fcsFlag = (fhd >> 6) & 0x3
        if (!singleSegment) pos += 1 // window descriptor
        if (didSize > 0) {
          var v = 0L
          (0 until didSize).foreach(i =>
            v |= (bytes(pos + i) & 0xffL) << (8 * i))
          if (dictId < 0) dictId = v
          pos += didSize
        }
        val fcsSize =
          if (fcsFlag == 0) (if (singleSegment) 1 else 0)
          else Array(0, 2, 4, 8)(fcsFlag)
        var fcs = -1L
        if (fcsSize > 0) {
          var v = 0L
          (0 until fcsSize).foreach(i =>
            v |= (bytes(pos + i) & 0xffL) << (8 * i))
          if (fcsSize == 2) v += 256 // the spec's 2-byte bias
          fcs = v
          pos += fcsSize
        }
        // blocks. RLE amplification is the bomb vector here: a 4-byte
        // block (header + one byte) legally expands to 2^21 bytes, so
        // a small hostile stream could claim hundreds of GB — cap the
        // decoded size at 4096x the input plus slack and fail loudly
        // (the Flac/Pdf bomb posture)
        val contentCap = bytes.length.toLong * 4096 + (1L << 20)
        val frameContent = new java.io.ByteArrayOutputStream()
        var last = false
        while (!last) {
          require(pos + 3 <= bytes.length, s"truncated block header at $pos")
          val hdr = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
            ((bytes(pos + 2) & 0xff) << 16)
          pos += 3
          last = (hdr & 1) == 1
          val btype = (hdr >> 1) & 0x3
          val bsize = hdr >>> 3
          require(content + frameContent.size + bsize <= contentCap,
            s"decoded content would exceed ${contentCap} bytes from a " +
              s"${bytes.length}-byte stream — RLE bomb")
          nBlocks += 1
          btype match {
            case 0 =>
              require(pos + bsize <= bytes.length,
                s"raw block overruns the stream at $pos")
              frameContent.write(bytes, pos, bsize)
              pos += bsize
            case 1 =>
              require(pos < bytes.length, "RLE block missing its byte")
              nRle += 1
              val v = bytes(pos)
              pos += 1
              (0 until bsize).foreach(_ => frameContent.write(v))
            case 2 =>
              throw new IllegalArgumentException(
                "FSE/Huffman-compressed blocks are outside the triage " +
                  "subset — hand the frame to the bundled codec")
            case _ =>
              throw new IllegalArgumentException("reserved block type 3")
          }
        }
        val fc = frameContent.toByteArray
        require(fcs < 0 || fcs == fc.length,
          s"frame declares $fcs content bytes but decodes to ${fc.length}")
        if (checksumFlag) {
          val stored = u32le(bytes, pos)
          pos += 4
          val computed = xxh64(fc, 0, fc.length, 0L) & 0xffffffffL
          require(stored == computed,
            f"zstd content checksum 0x$stored%08x != XXH64 0x$computed%08x")
          checksummed += 1
        }
        nFrames += 1
        content += fc.length
        fc.foreach(b => contentSum += b & 0xff)
      }
    }
    require(nFrames > 0, "stream carries no zstd data frames")
    ZstdInfo(nFrames, nSkip, nBlocks, nRle, content, contentSum,
      checksummed, dictId)
  }

  // ---------------------------------------------------------- fixture

  /** Closed-form stream: 1 + d%3 data frames (blocks alternating RAW
    * and RLE by (d+j+k)%2, 2 + (d+j)%3 blocks each), a skippable
    * frame interleaved on d%4==0, content checksums on even d,
    * a 4-byte dictionary id on d%5==0, FCS field widths rotating
    * 0/2/4/8 by frame, single-segment on (d+j)%3==0. */
  def synth(d: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    val nf = (1 + d % 3).toInt
    (0 until nf).foreach { j =>
      if (d % 4 == 0 && j == 1) {
        // a skippable frame between data frames
        u32(0x184D2A50L + (d % 16))
        val sz = (5 + d % 20).toInt
        u32(sz.toLong)
        (0 until sz).foreach(i => out.write(((d + i) % 251).toInt))
      }
      // build this frame's content blocks first
      val nb = (2 + (d + j) % 3).toInt
      val blocks = (0 until nb).map { k =>
        if ((d + j + k) % 2 == 0) {
          val len = (20 + (7 * d + 13 * k) % 100).toInt
          ("raw", Array.tabulate(len)(p => ((d + 31 * j + 17 * k + p) % 251).toByte))
        } else {
          val len = (10 + (d + k) % 50).toInt
          ("rle", Array.fill(len)(((d + j + k) % 251).toByte))
        }
      }
      val contentLen = blocks.map(_._2.length).sum
      val checksum = d % 2 == 0
      val dict = d % 5 == 0
      val single = (d + j) % 3 == 0
      val fcsFlag = (j % 4) match {
        case 0 => 0 // 1 byte when single-segment, absent otherwise
        case 1 => 1 // 2 bytes (+256 bias) — content must be >= 256
        case 2 => 2
        case _ => 3
      }
      // field-width legality: the 2-byte form cannot represent < 256
      // (the +256 bias) and the single-segment 1-byte form cannot
      // represent > 255 — both fall back to the 4-byte field
      val fcsUse = fcsFlag match {
        case 1 if contentLen < 256 => 2
        case 0 if single && contentLen > 255 => 2
        case f => f
      }
      val fhd = (fcsUse << 6) | (if (single) 0x20 else 0) |
        (if (checksum) 0x04 else 0) | (if (dict) 0x3 else 0)
      u32(0xFD2FB528L)
      out.write(fhd)
      if (!single) out.write(0x70) // window descriptor
      if (dict) u32((d % 100000) + 1)
      fcsUse match {
        case 0 => if (single) out.write(contentLen & 0xff)
        case 1 =>
          val v = contentLen - 256
          out.write(v & 0xff); out.write((v >> 8) & 0xff)
        case 2 => u32(contentLen.toLong)
        case _ => u32(contentLen.toLong); u32(0L)
      }
      blocks.zipWithIndex.foreach { case ((kind, data), k) =>
        val lastBit = if (k == nb - 1) 1 else 0
        if (kind == "raw") {
          val hdr = (data.length << 3) | (0 << 1) | lastBit
          out.write(hdr & 0xff); out.write((hdr >> 8) & 0xff)
          out.write((hdr >> 16) & 0xff)
          out.write(data, 0, data.length)
        } else {
          val hdr = (data.length << 3) | (1 << 1) | lastBit
          out.write(hdr & 0xff); out.write((hdr >> 8) & 0xff)
          out.write((hdr >> 16) & 0xff)
          out.write(data(0))
        }
      }
      if (checksum) {
        val fc = blocks.flatMap(_._2).toArray
        u32(xxh64(fc, 0, fc.length, 0L) & 0xffffffffL)
      }
    }
    out.toByteArray
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("n_frames", IntegerType),
    StructField("n_skippable", IntegerType),
    StructField("n_blocks", IntegerType),
    StructField("n_rle_blocks", IntegerType),
    StructField("content_bytes", LongType),
    StructField("content_sum", LongType),
    StructField("n_checksummed", IntegerType),
    StructField("dict_id", LongType)))

  /** ids -> closed-form stream -> frame walk + block decode. */
  def features(ids: DataFrame, idCol: String): DataFrame = {
    val idIdx = ids.schema.fieldIndex(idCol)
    val rdd = ids.rdd.mapPartitions { rows =>
      rows.map { r =>
        val d = r.getLong(idIdx)
        val m = walk(synth(d))
        Row(d, m.nFrames, m.nSkippable, m.nBlocks, m.nRleBlocks,
          m.contentBytes, m.contentSum, m.checksummed,
          if (m.dictId < 0) null else Long.box(m.dictId))
      }
    }
    ids.sparkSession.createDataFrame(rdd, schema)
  }
}
