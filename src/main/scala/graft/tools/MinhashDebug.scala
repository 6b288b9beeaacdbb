package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.sources.Catalog

object MinhashDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Catalog.table(spark, "/root/testdata/sf0.1", "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val base = df
      .select(col("doc_id").as("id"), TextOps.shingles3(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", graft.plans.MinHashSigExpr.minhashSig(col("sh"), 16))
      .persist()
    time("sig stage")(base.count())
    val bandRows = base
      .select(col("id"), explode(TextOps.lshBands(col("sig"), 16, 4)).as("b"))
      .select(col("id"), col("b.band"), col("b.bucket"))
      .persist()
    time("band rows")(println("bands=" + bandRows.count()))
    val cand = bandRows.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(bandRows.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b")).select("id_a","id_b").distinct().persist()
    time("candidates")(println("cand=" + cand.count()))
    val sh = base.select(col("id"), col("sh"))
    val verified = cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(TextOps.jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    time("verify")(println("verified=" + verified.count()))
    spark.stop()
  }
}
