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
}
