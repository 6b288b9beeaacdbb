package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing (SURVEY.md §2.11).
  *
  * Media is an opaque binary column plus typed metadata:
  * struct<bytes:binary, mime:string, meta:map<string,string>>. All the
  * Spark-side mechanics — schema, partition-friendly batch shape,
  * per-partition decode — are real; only the codec itself is stubbed
  * (image/audio libraries are not in this container) with a
  * deterministic fake so tests are reproducible. On a real cluster the
  * stub body is replaced by the JNI/library call; the surrounding
  * mapPartitions batch loop (one codec init per partition, not per row)
  * is exactly the shape that call needs.
  */
object Multimodal {

  val mediaType: StructType = StructType(Seq(
    StructField("bytes", BinaryType),
    StructField("mime", StringType),
    StructField("meta", MapType(StringType, StringType))))

  /** Wrap a text corpus as a media column (fixture stand-in for real
    * image/audio payloads). */
  def asMedia(df: DataFrame, idCol: String, textCol: String,
      extraMeta: Seq[String]): DataFrame =
    df.select(
      col(idCol),
      struct(
        to_binary(col(textCol), lit("utf-8")).as("bytes"),
        lit("application/octet-stream").as("mime"),
        map(extraMeta.flatMap(m => Seq(lit(m), col(m).cast("string"))): _*)
          .as("meta")).as("media"))

  /** STUB CODEC — deterministic fake "decode + feature extract".
    *
    * Real implementation would decode image bytes and emit e.g. a CLIP
    * embedding; here: 4 floats derived from byte statistics, stable
    * across runs/partitions. Marked clearly per the north star — the
    * Spark plumbing around it is the deliverable.
    */
  private def stubDecodeFeatures(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null) return Array.fill(4)(0f)
    var s0 = 0L; var s1 = 0L
    var i = 0
    while (i < bytes.length) {
      s0 += bytes(i) & 0xff
      s1 += (bytes(i) & 0xff).toLong * ((i % 251) + 1)
      i += 1
    }
    Array(
      bytes.length.toFloat,
      (s0 % 10007).toFloat,
      (s1 % 10007).toFloat,
      if (bytes.length > 0) s0.toFloat / bytes.length else 0f)
  }

  /** STUB RESIZE — deterministic fake "resample to targetBytes".
    * Real implementation: image decode → resample → re-encode. Here:
    * truncate or cyclically pad the payload to exactly targetBytes, so
    * the downstream contract (fixed-size payloads) is real and
    * testable while the pixel math is stubbed. */
  private def stubResize(bytes: Array[Byte], targetBytes: Int): Array[Byte] = {
    if (bytes == null || bytes.length == 0) return new Array[Byte](targetBytes)
    val out = new Array[Byte](targetBytes)
    var i = 0
    while (i < targetBytes) { out(i) = bytes(i % bytes.length); i += 1 }
    out
  }

  /** Resize every media payload to a fixed byte budget (stub codec,
    * real batch shape: one codec init per partition). The media struct
    * shape is preserved; meta records the original size. */
  def resize(df: DataFrame, idCol: String, targetBytes: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType), StructField("media", mediaType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex("media")
    val rdd = df.rdd.mapPartitions { rows =>
      // codec init would happen HERE, once per partition
      rows.map { r =>
        val media = r.getStruct(mediaIdx)
        val bytes = media.getAs[Array[Byte]]("bytes")
        val meta = media.getAs[Map[String, String]]("meta") +
          ("orig_bytes" -> String.valueOf(if (bytes == null) 0 else bytes.length))
        Row(r.getLong(idIdx),
          Row(stubResize(bytes, targetBytes), media.getAs[String]("mime"), meta))
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling: one media row → `frames` frame rows (the
    * generator shape a video pipeline needs — at scale the fan-out
    * happens inside the partition, nothing reshuffles). STUB sampler:
    * frame i is the byte slice [i·n/F, (i+1)·n/F) of the payload (a
    * real codec would seek and decode every k-th frame); the slice
    * arithmetic is deliberately SQL-replicable so the plumbing has a
    * DuckDB oracle even though the codec is a stub. */
  def frameSample(df: DataFrame, idCol: String, frames: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", mediaType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex("media")
    val rdd = df.rdd.mapPartitions { rows =>
      // codec init would happen HERE, once per partition
      rows.flatMap { r =>
        val media = r.getStruct(mediaIdx)
        val bytes = media.getAs[Array[Byte]]("bytes")
        val n = if (bytes == null) 0 else bytes.length
        (0 until frames).map { i =>
          val lo = i * n / frames
          val hi = (i + 1) * n / frames
          val slice =
            if (bytes == null) Array.emptyByteArray
            else java.util.Arrays.copyOfRange(bytes, lo, hi)
          Row(r.getLong(idIdx), i,
            Row(slice, media.getAs[String]("mime"),
              media.getAs[Map[String, String]]("meta") +
                ("frame" -> i.toString)))
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Per-partition batched decode: one "codec" per partition, rows
    * streamed through it. Output schema: id, mime, n_bytes, features. */
  def decode(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("mime", StringType),
      StructField("n_bytes", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex("media")
    val rdd = df.rdd.mapPartitions { rows =>
      // codec init would happen HERE, once per partition
      rows.map { r =>
        val media = r.getStruct(mediaIdx)
        val bytes = media.getAs[Array[Byte]]("bytes")
        Row(
          r.getLong(idIdx),
          media.getAs[String]("mime"),
          if (bytes == null) 0 else bytes.length,
          stubDecodeFeatures(bytes).toSeq)
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }
}
