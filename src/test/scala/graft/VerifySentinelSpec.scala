package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A query that throws (plan time or run time) must leave a sentinel
  * parquet + an error entry, never vanish from the verify dump —
  * VERDICT r6: four plan-time AnalysisExceptions were swallowed to
  * stderr and the driver had nothing to mark red. */
class VerifySentinelSpec extends SparkSpec {

  test("throwing query dumps a __error sentinel and reports the error") {
    val out = Scratch.dir("verify-sentinel-test")
    val boom: (SparkSession, String) => DataFrame =
      (s, _) => s.range(1).select(col("id").cast("map<int,int>"))
    val err = Verify.dumpOne(spark, sf0001, out, "intentionally_broken", boom)
    assert(err.isDefined && err.get._1 == "intentionally_broken")
    val sentinel = spark.read.parquet(s"$out/intentionally_broken")
    assert(sentinel.columns.toSeq == Seq("__error"))
    assert(sentinel.count() == 1)
  }

  test("healthy query dumps normally with no error") {
    val out = Scratch.dir("verify-sentinel-test-ok")
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => s.range(3).toDF("n")
    val err = Verify.dumpOne(spark, sf0001, out, "healthy", ok)
    assert(err.isEmpty)
    assert(spark.read.parquet(s"$out/healthy").count() == 3)
  }
}
