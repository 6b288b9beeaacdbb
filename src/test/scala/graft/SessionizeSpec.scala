package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the sub-second precision of gap-based sessionization
  * (StreamingBatch "sessionize_batch"): a 1800.5 s gap must break a
  * 30-minute session even though it truncates to exactly 1800 whole
  * seconds — the round-1 bug was cast("long") differencing.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def sessionCount(gapMicros: Long): Long = {
    val t0 = 1700000000000000L // µs since epoch
    // timestamp_micros, not java.sql.Timestamp(ms): the ±1 µs boundary
    // cases must genuinely exercise sub-millisecond precision.
    val df = Seq((1L, t0), (1L, t0 + gapMicros))
      .toDF("user_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
      .drop("us")
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val runSum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("brk",
        when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser)
          > 1800L * 1000000L || lag(col("ts"), 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("sid", sum("brk").over(runSum))
      .select("sid").distinct().count()
  }

  test("gap of exactly 1800 s does NOT break the session") {
    assert(sessionCount(1800L * 1000000L) == 1)
  }

  test("gap of 1800.5 s DOES break the session (sub-second precision)") {
    assert(sessionCount(1800L * 1000000L + 500000L) == 2)
  }

  test("gap of 1799.999999 s does NOT break the session") {
    assert(sessionCount(1800L * 1000000L - 1L) == 1)
  }

  test("gap of 1800.000001 s DOES break the session (+1 µs boundary)") {
    assert(sessionCount(1800L * 1000000L + 1L) == 2)
  }
}
