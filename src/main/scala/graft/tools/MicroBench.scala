package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.sources.Catalog

object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Catalog.table(spark, "/root/testdata/sf0.1", "documents")
    def time[T](label: String)(f: => T): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"$label run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    if (sys.env.contains("MB_VEC")) {
      val emb = Catalog.table(spark, "/root/testdata/sf0.1", "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val a = emb.select(col("vec_id").as("ia"), col("v").as("va"))
      val b = emb.select(col("vec_id").as("ib"), col("v").as("vb"))
      val pairs = a.crossJoin(b)
      def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, p) => acc + p)
      time("4M pairs HOF dot")(
        pairs.select(sum(hofDot(col("va"), col("vb")))).collect())
      time("4M pairs native dot")(
        pairs.select(sum(graft.plans.VectorExprs.dot(col("va"), col("vb")))).collect())
      spark.stop(); return
    }
    if (sys.env.contains("MB_MAT")) {
      // count() lets Catalyst prune projections away — force real
      // materialization via an agg that consumes the array.
      time("mat shingles (sum size)")(
        df.select(TextOps.shingles3(col("text")).as("sh"))
          .agg(sum(size(col("sh")))).collect())
      time("mat shingles (collect)")(
        df.select(col("doc_id"), TextOps.shingles3(col("text")).as("sh")).collect())
      time("mat sig (agg)")(
        df.select(graft.plans.MinHashSigExpr.minhashSig(
          TextOps.shingles3(col("text")), 16).as("sig"))
          .agg(sum(element_at(col("sig"), 1))).collect())
      time("mat split only (collect)")(
        df.select(col("doc_id"), split(col("text"), " ").as("w")).collect())
      spark.stop(); return
    }
    time("plain count")(df.count())
    time("split")(df.select(split(col("text"), " ").as("w")).count())
    time("shingles3")(df.select(TextOps.shingles3(col("text")).as("sh")).count())
    time("shingles3+hash16")(df.select(
      graft.plans.MinHashSigExpr.minhashSig(TextOps.shingles3(col("text")), 16).as("sig")).count())
    time("agg on sig")(df.select(
      graft.plans.MinHashSigExpr.minhashSig(TextOps.shingles3(col("text")), 16).as("sig"))
      .select(sum(element_at(col("sig"), 1))).count())
    def persistCount(label: String, cols: org.apache.spark.sql.Column*): Unit = {
      val d = df.select(cols: _*).persist()
      val t0 = System.nanoTime(); d.count()
      println(f"$label persist+count: ${(System.nanoTime()-t0)/1e9}%.2f s")
      d.unpersist(true)
    }
    persistCount("id+sig", col("doc_id"),
      graft.plans.MinHashSigExpr.minhashSig(TextOps.shingles3(col("text")), 16).as("sig"))
    persistCount("id+sh", col("doc_id"), TextOps.shingles3(col("text")).as("sh"))
    persistCount("id+sh+sig", col("doc_id"), TextOps.shingles3(col("text")).as("sh"),
      graft.plans.MinHashSigExpr.minhashSig(TextOps.shingles3(col("text")), 16).as("sig"))
    spark.stop()
  }
}
