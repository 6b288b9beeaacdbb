package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** HEVC / H.265 NAL + SPS metadata walk — the filter-before-decode
  * pass for the other half of modern video, twin to the H.264 row
  * (llm_video_nal_meta). Implemented from ITU-T H.265: the two-byte
  * NAL header (forbidden bit, 6-bit type, 6-bit layer id, 3-bit
  * temporal id), profile_tier_level (profile space / tier / profile
  * idc / compatibility flags / source flags / level idc), and the SPS
  * fields through the bit depths: chroma format, luma dimensions,
  * conformance window (output size = luma size minus SubWidthC/
  * SubHeightC-scaled offsets), bit_depth_luma/chroma_minus8. The 44
  * reserved/constraint bits after the source flags are skipped
  * without validation (real encoders set profile-specific constraint
  * flags there; a metadata gate must tolerate them).
  *
  * Framing reuses the shared NAL splitter: Annex-B start codes or
  * 4-byte length prefixes (reported as 'hvcc'). Emulation-prevention
  * unescaping is PROVEN on the oracle path exactly like the AVC row:
  * the fixture PPS embeds a 00 00 01 triple, so the wire form always
  *carries an escape byte and a parser that skips unescaping reports
  * the wrong pps_rbsp_len. Slice payload decode is the documented
  * boundary (llm_video_decode_iframe covers H.264; HEVC CABAC is
  * out), rejected by construction: only VPS/SPS/PPS/IDR/TRAIL NAL
  * types are accepted in the shell, anything else fails by name. */
object Hevc {

  final case class HevcMeta(framing: String, nNals: Int, nSlices: Int,
      hasVps: Boolean, tier: Int, profile: Int, level: Int,
      width: Int, height: Int, chromaFormat: Int,
      bitDepthLuma: Int, bitDepthChroma: Int, ppsRbspLen: Int)

  /** SPS parse through the bit depths; `rbsp` EXCLUDES the 2-byte
    * NAL header. Returns (tier, profile, level, width, height,
    * chromaFormat, bitDepthLuma, bitDepthChroma). */
  def parseSps(rbsp: Array[Byte]): (Int, Int, Int, Int, Int, Int, Int, Int) = {
    val r = new Codecs.ExpGolombReader(rbsp)
    r.u(4) // sps_video_parameter_set_id
    val maxSubLayers = r.u(3)
    require(maxSubLayers == 0,
      "sub-layer profile_tier_level is outside the meta subset")
    r.u(1) // sps_temporal_id_nesting_flag
    // profile_tier_level
    val space = r.u(2)
    require(space == 0, s"bad general_profile_space $space")
    val tier = r.u(1)
    val profile = r.u(5)
    r.u(16); r.u(16) // general_profile_compatibility_flags (32)
    r.u(4) // progressive / interlaced / non_packed / frame_only
    // 43 reserved/constraint bits + 1 inbld/reserved bit: tolerated,
    // not validated (profile-specific constraint flags live here)
    r.u(22); r.u(22)
    val level = r.u(8)
    r.ue() // sps_seq_parameter_set_id
    val chroma = r.ue()
    require(chroma <= 3, s"bad chroma_format_idc $chroma")
    if (chroma == 3) r.u(1) // separate_colour_plane_flag
    val wLuma = r.ue()
    val hLuma = r.ue()
    var (cl, cr, ct, cb) = (0, 0, 0, 0)
    if (r.u(1) == 1) { cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue() }
    val bdLuma = r.ue() + 8
    val bdChroma = r.ue() + 8
    // SubWidthC/SubHeightC per chroma_format_idc (4:2:0 -> 2/2)
    val subW = if (chroma == 1 || chroma == 2) 2 else 1
    val subH = if (chroma == 1) 2 else 1
    val width = wLuma - subW * (cl + cr)
    val height = hLuma - subH * (ct + cb)
    require(width > 0 && height > 0, s"conformance window eats the frame")
    (tier, profile, level, width, height, chroma, bdLuma, bdChroma)
  }

  /** Full stream walk: framing detect (shared splitter) -> per-NAL
    * two-byte header check -> SPS parse -> PPS unescaped length. */
  def nalMeta(bytes: Array[Byte]): HevcMeta = {
    val (framing, nals) = Codecs.nalUnits(bytes)
    var sps: Option[(Int, Int, Int, Int, Int, Int, Int, Int)] = None
    var ppsLen = -1
    var slices = 0
    var hasVps = false
    nals.foreach { nal =>
      require(nal.length >= 2, "HEVC NAL shorter than its 2-byte header")
      val b0 = nal(0) & 0xff
      val b1 = nal(1) & 0xff
      require((b0 & 0x80) == 0, "forbidden_zero_bit set")
      val nalType = (b0 >> 1) & 0x3f
      val layerId = ((b0 & 1) << 5) | (b1 >> 3)
      val tidPlus1 = b1 & 0x7
      require(layerId == 0, s"multi-layer nuh_layer_id $layerId " +
        "is outside the meta subset")
      require(tidPlus1 >= 1, "nuh_temporal_id_plus1 must be nonzero")
      val rbsp = Codecs.rbspUnescape(nal.drop(2))
      nalType match {
        case 32 => hasVps = true
        case 33 =>
          require(sps.isEmpty, "duplicate SPS in metadata shell")
          sps = Some(parseSps(rbsp))
        case 34 => ppsLen = rbsp.length
        case 0 | 1 | 19 | 20 | 21 => slices += 1
        case t => sys.error(s"unexpected HEVC NAL type $t in metadata shell")
      }
    }
    val (tier, p, l, w, h, cf, bdl, bdc) =
      sps.getOrElse(sys.error("stream carries no SPS"))
    require(ppsLen >= 0, "stream carries no PPS")
    HevcMeta(if (framing == "avcc") "hvcc" else framing, nals.length,
      slices, hasVps, tier, p, l, w, h, cf, bdl, bdc, ppsLen)
  }

  // ---------------------------------------------------------- fixtures

  private def nalHeader(nalType: Int): Array[Byte] =
    Array(((nalType << 1) & 0x7e).toByte, 0x01.toByte) // layer 0, tid+1 = 1

  /** Closed-form SPS NAL: profile rotates Main/Main10/MainStillPicture
    * (Main10 pairs with 10-bit depths, the realistic coupling), tier
    * set on d%7==0, level over five real idc values, dims in luma
    * samples with a conformance window on d%4==0. */
  def synthSpsNal(d: Long): Array[Byte] = {
    val profile = Array(1, 2, 3)((d % 3).toInt)
    val tier = if (d % 7 == 0) 1 else 0
    val level = Array(93, 120, 123, 150, 153)((d % 5).toInt)
    val bd = if (profile == 2) 2 else 0
    val w = new Codecs.ExpGolombWriter
    w.u(0, 4) // vps id
    w.u(0, 3) // max_sub_layers_minus1
    w.u(1, 1) // temporal_id_nesting
    w.u(0, 2); w.u(tier, 1); w.u(profile, 5)
    w.u(1 << (16 - profile), 16); w.u(0, 16) // compat flag for `profile`
    w.u(0x9, 4) // progressive=1, interlaced=0, non_packed=0, frame_only=1
    w.u(0, 22); w.u(0, 22) // reserved/constraint bits
    w.u(level, 8)
    w.ue(0) // sps id
    w.ue(1) // chroma 4:2:0
    w.ue((8 * (8 + d % 20)).toInt) // pic_width_in_luma_samples
    w.ue((8 * (6 + d % 15)).toInt) // pic_height_in_luma_samples
    if (d % 4 == 0) {
      w.u(1, 1)
      w.ue(0); w.ue(1 + ((d / 4) % 2).toInt) // left, right
      w.ue(0); w.ue(((d / 4) % 2).toInt)     // top, bottom
    } else w.u(0, 1)
    w.ue(bd); w.ue(bd)
    w.ue((d % 5).toInt) // log2_max_pic_order_cnt_lsb_minus4
    nalHeader(33) ++ Codecs.rbspEscape(w.rbspTrailing())
  }

  /** Fixture PPS: 9 + d%5 RBSP bytes embedding a 00 00 01 triple so
    * the wire form always needs an emulation-prevention byte. */
  def synthPpsNal(d: Long): Array[Byte] = {
    val rbsp = new Array[Byte]((9 + d % 5).toInt)
    rbsp.indices.foreach(i => rbsp(i) = ((d + 29 * i) % 250 + 1).toByte)
    rbsp(3) = 0; rbsp(4) = 0; rbsp(5) = 1
    nalHeader(34) ++ Codecs.rbspEscape(rbsp)
  }

  /** Closed-form HEVC metadata shell: optional VPS (absent when
    * d%3==1), SPS, PPS, then 1 + d%4 slice NALs (an IDR — W_RADL or
    * N_LP rotating by d%2 — followed by TRAIL_R). Length-prefixed
    * 'hvcc' framing on even d, Annex-B on odd. */
  def synthHevcStream(d: Long): Array[Byte] = {
    val nals = collection.mutable.ArrayBuffer.empty[Array[Byte]]
    if (d % 3 != 1)
      nals += (nalHeader(32) ++ Array.tabulate(4)(i =>
        ((d + 17 * i) % 250 + 1).toByte))
    nals += synthSpsNal(d)
    nals += synthPpsNal(d)
    val nSlices = (1 + d % 4).toInt
    (0 until nSlices).foreach { k =>
      val t = if (k == 0) (if (d % 2 == 0) 19 else 20) else 1
      nals += (nalHeader(t) ++ Array.tabulate(6 + k)(i =>
        ((d + 7 * k + 3 * i) % 250 + 1).toByte))
    }
    if (d % 2 == 0) {
      val out = new java.io.ByteArrayOutputStream()
      nals.foreach { n =>
        out.write(n.length >>> 24); out.write((n.length >> 16) & 0xff)
        out.write((n.length >> 8) & 0xff); out.write(n.length & 0xff)
        out.write(n, 0, n.length)
      }
      out.toByteArray
    } else {
      val out = new java.io.ByteArrayOutputStream()
      nals.zipWithIndex.foreach { case (n, k) =>
        if (k == 0 || k % 2 == 1) out.write(0) // mixed 4- and 3-byte codes
        out.write(0); out.write(0); out.write(1)
        out.write(n, 0, n.length)
      }
      out.toByteArray
    }
  }

  // ---------------------------------------------------- Spark features

  private val metaSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("framing", StringType),
    StructField("n_nals", IntegerType),
    StructField("n_slices", IntegerType),
    StructField("has_vps", IntegerType),
    StructField("tier", IntegerType),
    StructField("profile", IntegerType),
    StructField("level", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("chroma_fmt", IntegerType),
    StructField("bit_depth_luma", IntegerType),
    StructField("bit_depth_chroma", IntegerType),
    StructField("pps_rbsp_len", IntegerType)))

  /** ids -> closed-form HEVC shell -> NAL/SPS walk. Pure per-doc map
    * work — the scan-stage-only gate a 100 TB video corpus runs
    * before deciding what to transcode or decode. */
  def metaFeatures(ids: DataFrame, idCol: String): DataFrame = {
    val idIdx = ids.schema.fieldIndex(idCol)
    val rdd = ids.rdd.mapPartitions { rows =>
      rows.map { r =>
        val d = r.getLong(idIdx)
        val m = nalMeta(synthHevcStream(d))
        Row(d, m.framing, m.nNals, m.nSlices, if (m.hasVps) 1 else 0,
          m.tier, m.profile, m.level, m.width, m.height, m.chromaFormat,
          m.bitDepthLuma, m.bitDepthChroma, m.ppsRbspLen)
      }
    }
    ids.sparkSession.createDataFrame(rdd, metaSchema)
  }
}
