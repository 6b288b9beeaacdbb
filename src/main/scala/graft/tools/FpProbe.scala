package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Times the exact-dedup fingerprint kernels (native vs regex) on the
  * ScaleBench ×100 corpus — dev utility behind the TextNorm rewrite. */
object FpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratch.dir("spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/tmp/graft-scale-x100/documents.parquet")
    def t(label: String)(f: => Long): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime(); val n = f
      println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n)")
    }
    t("fp native")(docs.select(TextOps.fingerprint(col("text")).as("fp"))
      .agg(count_distinct(col("fp"))).first().getLong(0))
    t("fp regex")(docs.select(TextOps.fingerprintRegex(col("text")).as("fp"))
      .agg(count_distinct(col("fp"))).first().getLong(0))
    t("exactDedup e2e")(TextOps.exactDedup(docs, "doc_id", "text").count())
    spark.stop()
  }
}
