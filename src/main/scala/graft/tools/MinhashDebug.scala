package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.sources.Catalog

object MinhashDebug {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("MH_CPUS", "32")
    new java.io.File("/tmp/mh-eventlog").mkdirs()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", "/tmp/mh-eventlog")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Catalog.table(spark, "/root/testdata/sf0.1", "documents")
    if (sys.env.contains("MH_PROD")) {
      val pairs = TextOps.minhashNearDupPairs(df, "doc_id", "text")
      if (sys.env.contains("MH_EXPLAIN")) pairs.explain("formatted")
      time("prod pairs")(println("pairs=" + pairs.count()))
      spark.stop(); return
    }
    if (sys.env.contains("MH_VEC_EDGE")) {
      import spark.implicits._
      import graft.operators.Similarity
      val emb = Seq(
        (1L, Seq(1.0, 0.0, 0.0)), (2L, Seq(0.9, 0.1, 0.0)),
        (3L, Seq(0.0, 1.0)),              // mismatched length
        (4L, Seq(0.0, 0.0, 0.0))          // zero vector
      ).toDF("vec_id", "embedding")
      println("topk:")
      Similarity.cosineTopK(emb, emb.filter(col("vec_id") === 1), "vec_id", "embedding", 3)
        .show()
      println("lsh topk:")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") === 1), "vec_id", "embedding", 3, bits = 4)
        .show()
      spark.stop(); return
    }
    if (sys.env.contains("MH_EDGE")) {
      import spark.implicits._
      val edge = Seq(
        (1L, null.asInstanceOf[String]), (2L, ""), (3L, "one two"),
        (4L, "a a a a a a"), (5L, "a a a a a a"),
        (6L, (1 to 50).map(i => s"w$i").mkString(" ")),
        (7L, (1 to 50).map(i => s"w$i").mkString(" "))
      ).toDF("doc_id", "text")
      println("pairs:")
      TextOps.minhashNearDupPairs(edge, "doc_id", "text").show()
      println("dedup kept:")
      TextOps.minhashDedup(edge, "doc_id", "text").select("doc_id").show()
      println("simhash dedup kept:")
      TextOps.simhashDedup(edge, "doc_id", "text").select("doc_id", "sh64").show()
      spark.stop(); return
    }
    if (sys.env.contains("MH_ENTRY")) {
      val q = graft.SparkEntry.queries("llm_minhash_dedup")(
        spark, "/root/testdata/sf0.1")
      time("entry dedup")(println("n=" + q.count()))
      spark.stop(); return
    }
    if (sys.env.contains("MH_SORT")) {
      val dd = TextOps.minhashDedup(df, "doc_id", "text")
        .select("doc_id", "lang").orderBy("doc_id")
      if (sys.env.contains("MH_EXPLAIN")) dd.explain("formatted")
      time("dedup+sort")(println("n=" + dd.count()))
      spark.stop(); return
    }
    if (sys.env.contains("MH_DEDUP")) {
      val dd = TextOps.minhashDedup(df, "doc_id", "text")
      if (sys.env.contains("MH_EXPLAIN")) dd.explain("formatted")
      time("prod dedup")(println("kept=" + dd.count()))
      spark.stop(); return
    }
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
    val capped = bandRows
      .withColumn("bsize",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("band", "bucket")))
      .filter(col("bsize") <= 1000)
    time("capped")(println("capped=" + capped.count()))
    val cand = capped.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(capped.select(col("band"), col("bucket"), col("id").as("id_b")),
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
