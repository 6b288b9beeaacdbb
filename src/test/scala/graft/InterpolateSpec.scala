package graft

import org.apache.spark.sql.functions._

/** Edge cases of Relational.interpolateHourly the fixture never hits:
  * the dense axis always starts/ends on an OBSERVED hour, so the
  * endpoint-clamp branches (pv/nv null) only fire when the boundary
  * bucket's observations are all null — synthesized here directly. */
class InterpolateSpec extends SparkSpec {
  import spark.implicits._

  test("lerp midpoint, endpoint clamp both directions, gap flags") {
    val ev = Seq(
      (1L, "2024-01-01 00:10:00", Option.empty[Double]), // null head bucket
      (1L, "2024-01-01 01:20:00", Some(10.0)),
      // 02:xx absent entirely -> grid gap, lerp between 01 and 03
      (1L, "2024-01-01 03:05:00", Some(20.0)),
      (1L, "2024-01-01 04:45:00", Option.empty[Double])) // null tail bucket
      .toDF("user_id", "ts_s", "value")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"),
        col("value"))
    val out = queries.Relational.interpolateHourly(ev)
      .select("v_interp", "is_gap").as[(Double, Boolean)].collect().toSeq
    assert(out == Seq(
      (10.0, true),  // 00h: no earlier observation -> clamp to next
      (10.0, false), // 01h: observed
      (15.0, true),  // 02h: exact time-weighted midpoint
      (20.0, false), // 03h: observed
      (20.0, true))) // 04h: no later observation -> clamp to prev
  }

  test("uneven spacing weights by time, not by row count") {
    // Known at 00h (0.0) and 03h (30.0); gaps at 01h and 02h must land
    // at 10 and 20 — 1/3 and 2/3 of the span, not an average.
    val ev = Seq(
      (7L, "2024-06-01 00:00:00", Some(0.0)),
      (7L, "2024-06-01 03:00:00", Some(30.0)))
      .toDF("user_id", "ts_s", "value")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"),
        col("value"))
    val out = queries.Relational.interpolateHourly(ev)
      .select("v_interp").as[Double].collect().toSeq
    assert(out == Seq(0.0, 10.0, 20.0, 30.0))
  }
}
