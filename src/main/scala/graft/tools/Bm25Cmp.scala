package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Differential exactness check AT SCALE: maxscore vs the full probe
  * on the ×mult corpus for nq common-term queries — the fixture-scale
  * oracle equality, re-proven where the pruning actually engages.
  * Usage: runMain graft.tools.Bm25Cmp [nq] [prefixR]
  */
object Bm25Cmp {
  def main(args: Array[String]): Unit = {
    val nq = if (args.nonEmpty) args(0).toLong else 100L
    val prefixR = if (args.length > 1) args(1).toInt else 5000
    val mult = sys.env.getOrElse("SCALE_MULT", "100").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratch.dir("spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"/tmp/graft-scale-x$mult/documents.parquet")
    def digest(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(qid, rk, doc_id, score))")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val exact = digest(graft.queries.Llm.bm25TopK(docs, nq, 10))
    val ms = digest(graft.queries.Llm.bm25TopKMaxScore(docs, nq, 10, prefixR))
    println(s"exact=$exact maxscore=$ms equal=${exact == ms}")
    spark.stop()
  }
}
