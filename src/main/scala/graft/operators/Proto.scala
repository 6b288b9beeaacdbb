package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Protobuf WIRE-FORMAT walk, from the public encoding spec — the
  * RPC/log serialization the telemetry side of a data platform ships.
  * No protobuf runtime exists on this classpath, so the walk is
  * from-spec hand parsing like the other container ops: tag varints
  * (field number << 3 | wire type), base-128 varints, ZigZag sint64,
  * little-endian fixed64 doubles, length-delimited strings and PACKED
  * repeated int32s — and, the behavior that makes protobuf protobuf,
  * UNKNOWN fields skipped BY WIRE TYPE (forward compatibility: the
  * fixture injects unknown varint, fixed64, fixed32, and
  * length-delimited fields that a correct walk must step over and a
  * naive one cannot). Message subset:
  *   1 rec_id  int64 (varint)   2 name   string
  *   3 score   double (fixed64) 4 tags   repeated int32 (packed)
  *   5 delta   sint64 (zigzag)
  * Wire type 3/4 (the removed groups) and truncation fail loudly. */
object Proto {

  final case class ProtoRec(recId: Long, name: String, score: Double,
      tags: Array[Int], delta: Long)

  private final class In(val b: Array[Byte], val limit: Int) {
    var pos = 0
    def hasMore: Boolean = pos < limit
    def u8(): Int = {
      require(pos < limit, "proto: truncated message")
      val v = b(pos) & 0xff; pos += 1; v
    }
    /** plain base-128 varint (no zigzag). */
    def varint(): Long = {
      var shift = 0
      var acc = 0L
      var more = true
      while (more) {
        require(shift < 64, "proto: varint longer than 10 bytes")
        val v = u8()
        acc |= (v & 0x7fL) << shift
        more = (v & 0x80) != 0
        shift += 7
      }
      acc
    }
    def fixed64(): Long = {
      require(pos + 8 <= limit, "proto: truncated fixed64")
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (b(pos + i) & 0xffL); i -= 1 }
      pos += 8
      v
    }
    def fixed32(): Int = {
      require(pos + 4 <= limit, "proto: truncated fixed32")
      val v = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
        ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)
      pos += 4
      v
    }
    def lenDelim(): (Int, Int) = { // (start, length)
      val n = varint()
      require(n >= 0 && pos + n <= limit,
        s"proto: length-delimited field of $n bytes overruns the message")
      val start = pos
      pos += n.toInt
      (start, n.toInt)
    }
  }

  def parse(bytes: Array[Byte]): ProtoRec = {
    val in = new In(bytes, bytes.length)
    var recId = 0L
    var name: String = null
    var score = 0.0
    val tags = collection.mutable.ArrayBuffer.empty[Int]
    var delta = 0L
    while (in.hasMore) {
      val tag = in.varint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      (field, wire) match {
        case (1, 0) => recId = in.varint()
        case (2, 2) =>
          val (s, n) = in.lenDelim()
          name = new String(in.b, s, n, "UTF-8")
        case (3, 1) =>
          score = java.lang.Double.longBitsToDouble(in.fixed64())
        case (4, 2) => // packed repeated int32
          val (s, n) = in.lenDelim()
          val sub = new In(in.b, s + n)
          sub.pos = s
          while (sub.hasMore) tags += sub.varint().toInt
        case (5, 0) => // sint64: zigzag varint
          val z = in.varint()
          delta = (z >>> 1) ^ -(z & 1L)
        case (_, 0) => in.varint() // unknown varint: skip
        case (_, 1) => in.fixed64() // unknown fixed64: skip
        case (_, 5) => in.fixed32() // unknown fixed32: skip
        case (_, 2) => in.lenDelim() // unknown length-delimited: skip
        case (_, w) =>
          sys.error(s"proto: wire type $w (group or reserved) on " +
            s"field $field is outside the walk's scope")
      }
    }
    require(name != null, "proto: message missing required-by-contract name")
    ProtoRec(recId, name, score, tags.toArray, delta)
  }

  // ------------------------------------------------------------------
  // Closed-form fixture: rec_id 1000+d, name n{d%13}, score quarter
  // steps, 1+d%4 packed tags (7d+3k)%100, delta = zigzagged ±(d%50)
  // (negative on odd ids — the encoding zigzag exists for). d%3==1
  // docs interleave FOUR unknown fields (varint #9, fixed64 #10,
  // length-delimited #11, fixed32 #12) BETWEEN the known ones, so
  // skipping is load-bearing, not incidental.
  // ------------------------------------------------------------------

  def tagCount(d: Long): Int = (1 + d % 4).toInt
  def hasUnknown(d: Long): Boolean = d % 3 == 1

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def writeTag(out: java.io.ByteArrayOutputStream, f: Int, w: Int): Unit =
    writeVarint(out, (f.toLong << 3) | w)

  def synth(d: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(128)
    def unknowns(phase: Int): Unit = if (hasUnknown(d)) phase match {
      case 0 =>
        writeTag(out, 9, 0); writeVarint(out, 7 * d + 1)
      case 1 =>
        writeTag(out, 10, 1)
        (0 until 8).foreach(i => out.write(((d + i) % 251).toInt))
      case 2 =>
        writeTag(out, 11, 2)
        val junk = s"junk$d".getBytes("UTF-8")
        writeVarint(out, junk.length.toLong); out.write(junk, 0, junk.length)
      case _ =>
        writeTag(out, 12, 5)
        (0 until 4).foreach(i => out.write(((3 * d + i) % 251).toInt))
    }
    unknowns(0)
    writeTag(out, 1, 0); writeVarint(out, 1000 + d)
    unknowns(1)
    val nb = s"n${d % 13}".getBytes("UTF-8")
    writeTag(out, 2, 2); writeVarint(out, nb.length.toLong)
    out.write(nb, 0, nb.length)
    unknowns(2)
    writeTag(out, 3, 1)
    val bits = java.lang.Double.doubleToLongBits((d % 5) + (d % 4) / 4.0)
    (0 until 8).foreach(i => out.write(((bits >>> (8 * i)) & 0xff).toInt))
    val packed = new java.io.ByteArrayOutputStream(16)
    (0 until tagCount(d)).foreach(k => writeVarint(packed, (7 * d + 3 * k) % 100))
    writeTag(out, 4, 2)
    writeVarint(out, packed.size.toLong)
    packed.writeTo(out)
    unknowns(3)
    val deltaV = if (d % 2 == 1) -(d % 50) else d % 50
    writeTag(out, 5, 0); writeVarint(out, (deltaV << 1) ^ (deltaV >> 63))
    out.toByteArray
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("rec_id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("n_tags", IntegerType),
    StructField("tag_sum", LongType),
    StructField("delta", LongType)))

  /** ids → one decoded message each — per-doc map work. */
  def protoFeatures(ids: DataFrame, idCol: String): DataFrame = {
    val idIdx = ids.schema.fieldIndex(idCol)
    val rdd = ids.rdd.mapPartitions { rows =>
      rows.map { r =>
        val d = r.getLong(idIdx)
        val m = parse(synth(d))
        var ts = 0L
        m.tags.foreach(ts += _)
        Row(d, m.recId, m.name, m.score, m.tags.length, ts, m.delta)
      }
    }
    ids.sparkSession.createDataFrame(rdd, schema)
  }
}
