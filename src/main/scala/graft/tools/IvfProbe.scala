package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Stage-by-stage timing of ivfTopK on the /tmp scaled corpus — dev
  * tool for locating the expensive stage (assignment, probe, re-rank
  * join, final top-k) at 200k × nlist scale.
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratch.dir("spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/tmp/graft-scale-x100/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10000)
    val (nlist, nprobe, k) = (447, 27, 10)

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }

    val c = emb.select(col("vec_id").as("nid"),
        col("embedding").cast("array<double>").as("nvec"))
      .withColumn("nnorm", Similarity.norm(col("nvec")))
    val cents = c.select(col("nid").as("cid"), col("nvec").as("cvec"),
        col("nnorm").as("cnorm"))
      .orderBy(xxhash64(col("cid")), col("cid")).limit(nlist)
    val assignedSlim = c.crossJoin(broadcast(cents))
      .select(col("nid"), col("cid"),
        Similarity.cosine(col("nvec"), col("cvec"), col("nnorm"), col("cnorm")).as("csim"))
      .groupBy("nid")
      .agg(max(struct(col("csim"), (-col("cid")).as("negcid"))).as("m"))
      .select(col("nid"), (-col("m.negcid")).as("cid"))
    t("assignedSlim")(assignedSlim.count())
    val assigned = assignedSlim.join(c, Seq("nid"))
      .select(col("cid"), col("nid"), col("nvec"), col("nnorm"))
    t("assigned+vecs")(assigned.count())
    val q = queries.select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qvec"))
      .withColumn("qnorm", Similarity.norm(col("qvec")))
    val wProbe = Window.partitionBy("qid")
      .orderBy(desc_nulls_last("csim"), asc("cid"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("qid"), col("cid"),
        Similarity.cosine(col("qvec"), col("cvec"), col("qnorm"), col("cnorm")).as("csim"))
      .withColumn("crk", row_number().over(wProbe))
      .filter(col("crk") <= nprobe)
      .select(col("cid"), col("qid"))
      .join(q, Seq("qid"))
      .select(col("cid"), col("qid"), col("qvec"), col("qnorm"))
    t("probes")(probes.count())
    val scored = assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", round(Similarity.cosine(
        col("qvec"), col("nvec"), col("qnorm"), col("nnorm")), 6))
      .select("qid", "nid", "sim")
    t("scored(count)")(scored.count())
    t("scored(sum sim)")(scored.agg(sum("sim")).count())
    t("full ivfTopK")(Similarity.ivfTopK(
      emb, queries, "vec_id", "embedding", k, nlist, nprobe).count())
    spark.stop()
  }
}
