package graft

import org.apache.spark.sql.functions._

import graft.sources.Catalog

/** Sketch-aggregate error bounds: the approximate (mergeable,
  * 100 TB-viable) operators must track their exact counterparts.
  */
class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("approx_percentile tracks exact percentile within digest error") {
    val li = Catalog.table(spark, sf0001, "lineitem")
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.90)").as("p"))
      .as[(String, Double)].collect().toMap
    val approx = li.groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, 0.90, 1000)").as("p"))
      .as[(String, Double)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e) / math.max(e, 1e-9) < 0.05,
        s"$k: approx $a vs exact $e drifts beyond 5%")
    }
  }

  test("agg_mode picks max count with min-value tie-break") {
    val df = Seq(
      ("g1", "b"), ("g1", "b"), ("g1", "a"), ("g1", "a"), ("g1", "c"),
      ("g2", "z")).toDF("o_orderstatus", "o_orderpriority")
    val cnt = df.groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderstatus")
      .orderBy(desc("cnt"), asc("o_orderpriority"))
    val mode = cnt.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_orderstatus", "o_orderpriority")
      .as[(String, String)].collect().toMap
    // g1 ties a(2) vs b(2): min value 'a' must win; singleton g2 → 'z'.
    assert(mode == Map("g1" -> "a", "g2" -> "z"))
  }

  test("exp-sum-log product matches direct multiplication") {
    val terms = Seq(1.0, 1.04, 1.1, 1.07, 1.0, 1.02)
    val df = terms.toDF("x")
    val viaLog = df.agg(exp(sum(log(col("x"))))).as[Double].head()
    val direct = terms.product
    assert(math.abs(viaLog - direct) < 1e-9,
      s"exp-sum-log $viaLog vs direct $direct")
  }

  test("bitwise aggregates reduce order-independently") {
    val xs = Seq(0x3L, 0x5L, 0x9L, 0x11L)
    def run(s: Seq[Long]) = s.toDF("x")
      .agg(expr("bit_and(x)"), expr("bit_or(x)"), expr("bit_xor(x)"))
      .as[(Long, Long, Long)].head()
    assert(run(xs) == run(xs.reverse))
    assert(run(xs) == (
      xs.reduce(_ & _), xs.reduce(_ | _), xs.reduce(_ ^ _)))
  }

  test("approx_count_distinct tracks exact cardinality within rsd") {
    val li = Catalog.table(spark, sf0001, "lineitem")
    val exact = li.groupBy("l_returnflag")
      .agg(count_distinct(col("l_partkey")).as("n"))
      .as[(String, Long)].collect().toMap
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / math.max(e, 1L) < 0.05,
        s"$k: approx $a vs exact $e drifts beyond 5%")
    }
  }

  test("funnel step counts are a monotone chain bounded by step-1 users") {
    val rows = SparkEntry.queries("agg_funnel")(spark, sf0001)
      .select("step", "n_users").as[(Int, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3))
    val counts = rows.map(_._2)
    // Each funnel prefix is a subset of the previous one — any
    // inversion means the fold advanced out of order.
    assert(counts(0) >= counts(1) && counts(1) >= counts(2), counts.toSeq)
    // And step 1 can't exceed the number of users who ever viewed.
    val viewers = Catalog.table(spark, sf0001, "events")
      .filter(col("event_type") === "view")
      .select(count_distinct(col("user_id"))).as[Long].head()
    assert(counts(0) == viewers, s"step1 ${counts(0)} != viewers $viewers")
  }

  test("hll day-sketch month-merge estimate stays in the 5% contract") {
    val bad = SparkEntry.queries("agg_hll_merge")(spark, sf0001)
      .filter(!col("est_in_bounds")).count()
    assert(bad == 0L, s"$bad months outside the HLL merge error contract")
  }
}
