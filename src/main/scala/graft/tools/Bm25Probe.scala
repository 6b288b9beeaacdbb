package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostics for the BM25 MaxScore bound on the ×mult replica
  * corpus: per-query θ/Δ/prunability and candidate volumes, plus the
  * per-term impact decay (c@1 vs c@R+1) that decides whether the
  * bound can ever hold. Dev tool for sizing prefixR.
  * Usage: runMain graft.tools.Bm25Probe [prefixR] [nQueries]
  */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val prefixR = if (args.nonEmpty) args(0).toInt else 5000
    val nq = if (args.length > 1) args(1).toLong else 1000L
    val mult = sys.env.getOrElse("SCALE_MULT", "100").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratch.dir("spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"/tmp/graft-scale-x$mult/documents.parquet")
    val queries = docs.filter(col("doc_id") < nq)
      .select(col("doc_id").as("qid"),
        explode(array_distinct(slice(
          graft.operators.TextOps.tokens(col("text")), 1, 5))).as("qw"))
    val t0 = System.nanoTime()
    val (_, qstat) = graft.queries.Llm.bm25MaxScoreParts(
      docs, queries, 10, prefixR)
    qstat.persist()
    val agg = qstat.agg(
      count(lit(1)).as("n_q"),
      sum(when(col("prunable"), 1).otherwise(0)).as("n_prunable"),
      round(avg("delta"), 4).as("avg_delta"),
      round(avg("theta"), 4).as("avg_theta"),
      round(min(col("theta") - col("delta")), 4).as("min_gap"),
      round(max(col("theta") - col("delta")), 4).as("max_gap"))
    agg.show(false)
    println(f"qstat wall: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    // impact decay for the first query's terms
    val tok = docs.select(col("doc_id"),
      explode(graft.operators.TextOps.tokens(col("text"))).as("w"))
    val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      .withColumn("h", xxhash64(col("w")))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      round(avg("dl"), 6).as("avgdl"))
    val dfq = tf.groupBy("h").agg(count(lit(1)).as("df"))
    val postings = tf.join(dfq, "h").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("c", round(
        log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          col("tf") * lit(2.2) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))), 6))
    val q0 = queries.filter(col("qid") === 0).select(
      xxhash64(col("qw")).as("h")).distinct()
    import org.apache.spark.sql.expressions.Window
    val byImpact = Window.partitionBy("h").orderBy(desc("c"), asc("doc_id"))
    postings.join(q0, "h")
      .withColumn("r", row_number().over(byImpact))
      .filter(col("r") === 1 || col("r") === prefixR + 1)
      .groupBy("h").pivot("r", Seq(1, prefixR + 1)).agg(first("c"))
      .join(dfq, "h")
      .show(false)
    spark.stop()
  }
}
