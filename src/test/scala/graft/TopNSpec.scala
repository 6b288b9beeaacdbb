package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TopN
import graft.sources.Catalog

/** The salted partial-top-N (operators/TopN.scala) must return exactly
  * the rows+ranks of the plain low-cardinality window it replaces.
  */
class TopNSpec extends SparkSpec {

  test("saltedRowNumber == plain row_number top-N per key") {
    val orders = Catalog.table(spark, sf0001, "orders")
    val plainW = Window.partitionBy("o_orderstatus")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val plain = orders
      .withColumn("rn", row_number().over(plainW))
      .filter(col("rn") <= 5)
      .select("o_orderstatus", "rn", "o_orderkey")
    val salted = TopN.saltedRowNumber(
      orders,
      keys = Seq(col("o_orderstatus")),
      order = Seq(desc("o_totalprice"), asc("o_orderkey")),
      n = 5, rankCol = "rn")
      .select("o_orderstatus", "rn", "o_orderkey")
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("saltedDenseRank == plain rank/dense_rank with ties kept") {
    val li = Catalog.table(spark, sf0001, "lineitem")
    val plainW = Window.partitionBy("l_returnflag").orderBy(desc("l_quantity"))
    val plain = li
      .withColumn("rnk", rank().over(plainW))
      .withColumn("drnk", dense_rank().over(plainW))
      .filter(col("drnk") <= 2)
      .select("l_returnflag", "l_quantity", "rnk", "drnk")
    val salted = TopN.saltedDenseRank(
      li,
      keys = Seq(col("l_returnflag")),
      order = Seq(desc("l_quantity")),
      n = 2, rankCol = "rnk", denseRankCol = "drnk")
      .select("l_returnflag", "l_quantity", "rnk", "drnk")
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("bucketedGlobalRank == plain global row_number at every granularity") {
    val orders = Catalog.table(spark, sf0001, "orders").limit(500)
      .select(col("o_orderkey"), col("o_totalprice"))
    val order = Seq(desc("o_totalprice"), asc("o_orderkey"))
    val plain = orders
      .withColumn("r", row_number().over(Window.orderBy(order: _*)))
    // Granularities from "everything in one bucket" (degenerate: the
    // whole corpus through one window task, still EXACT) through a fine
    // histogram; each must reproduce the single-window rank bit-for-bit.
    for (bucket <- Seq(lit(0), -floor(col("o_totalprice") / 10000),
        -floor(col("o_totalprice")))) {
      val (ranked, n) = TopN.bucketedGlobalRank(orders, bucket, order, "r")
      assert(n == 500)
      assert(plain.exceptAll(ranked).isEmpty && ranked.exceptAll(plain).isEmpty)
    }
  }

  test("bucketedGlobalRank keeps tied order keys deterministic via tiebreak") {
    import spark.implicits._
    // heavy ties on the score; doc id is the tiebreak — same contract
    // as llm_perplexity_filter's (mean_logp desc, doc_id asc)
    val df = (0 until 100).map(i => (i.toLong, (i % 5).toDouble))
      .toDF("id", "score")
    val order = Seq(desc("score"), asc("id"))
    val plain = df.withColumn("r", row_number().over(Window.orderBy(order: _*)))
    val (ranked, n) = TopN.bucketedGlobalRank(df,
      -floor(col("score") * 8), order, "r")
    assert(n == 100)
    assert(plain.exceptAll(ranked).isEmpty && ranked.exceptAll(plain).isEmpty)
    // and the ranking window really is partitioned (no single-task rank)
    val warns = graft.plans.PlanAudit.audit(ranked)
      .filter(_.rule == "single-partition-window")
    assert(warns.isEmpty, s"expected no single-partition window, got $warns")
  }

  test("salted pre-filter keeps ALL tied rows of a boundary value") {
    import spark.implicits._
    // 40 rows: value 10 ×20 (rank 1, tied), value 9 ×19, value 8 ×1 —
    // dense_rank<=2 must keep exactly the 39 rows of values {10, 9}.
    val df = (Seq.fill(20)(10) ++ Seq.fill(19)(9) :+ 8)
      .zipWithIndex.map { case (v, i) => ("k", v, i) }
      .toDF("key", "value", "id")
    // rank/dense_rank order deliberately carries NO unique tiebreak —
    // ties are the point (a tiebreak would degrade dense_rank to
    // row_number and drop the tied rows this test protects).
    val out = TopN.saltedDenseRank(df, Seq(col("key")),
      Seq(desc("value")), n = 2,
      rankCol = "rnk", denseRankCol = "drnk", salt = 7)
    assert(out.count() == 39)
    assert(out.filter(col("value") === 9 && col("rnk") === 21).count() == 19)
  }
}
