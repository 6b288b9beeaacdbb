package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryModule}
import graft.operators.TopN
import graft.sources.Catalog

/** SURVEY.md §2.6 — window functions.
  *
  * JX `window` clause {name, value, aggregate, edges(=partition), sort,
  * range} (reference jx_python/windows.py per SURVEY §2.6 [P]) lowered
  * onto Spark's native window exec: one shuffle per distinct partition
  * spec, sort within partition, frame-sliding aggregation — codegen'd,
  * spill-aware, and skew handled by AQE at 100 TB. Every orderBy inside
  * a window carries a unique tiebreak so frames are deterministic.
  */
object Windows extends QueryModule {

  def defs: Seq[QueryDef] = Seq(

    // o_orderstatus has 3 values — the low-cardinality-partition case.
    // Mitigated with the salted partial-top-N pre-filter (TopN.scala):
    // same answer, but the heavy shuffle runs at key×salt parallelism.
    QueryDef(
      "win_rownum",
      (s, dir) =>
        TopN.saltedRowNumber(
          Catalog.table(s, dir, "orders"),
          keys = Seq(col("o_orderstatus")),
          order = Seq(desc("o_totalprice"), asc("o_orderkey")),
          n = 5, rankCol = "rn")
          .select("o_orderstatus", "rn", "o_orderkey")
          .orderBy("o_orderstatus", "rn"),
      Some("""SELECT o_orderstatus, rn, o_orderkey FROM (
          SELECT o_orderstatus, o_orderkey,
            row_number() OVER (PARTITION BY o_orderstatus
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders)
        WHERE rn <= 5 ORDER BY o_orderstatus, rn""")),

    // Same mitigation for rank/dense_rank over a 3-value key: the salted
    // dense-rank pre-filter keeps all tied rows of the global top-2
    // distinct values, so the exact phase-2 ranks match the plain window.
    QueryDef(
      "win_rank",
      (s, dir) =>
        TopN.saltedDenseRank(
          Catalog.table(s, dir, "lineitem"),
          keys = Seq(col("l_returnflag")),
          order = Seq(desc("l_quantity")),
          n = 2, rankCol = "rnk", denseRankCol = "drnk")
          .select("l_returnflag", "l_quantity", "rnk", "drnk")
          .orderBy("l_returnflag", "rnk", "l_quantity"),
      Some("""SELECT l_returnflag, l_quantity, rnk, drnk FROM (
          SELECT l_returnflag, l_quantity,
            rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS rnk,
            dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS drnk
          FROM lineitem)
        WHERE drnk <= 2 ORDER BY l_returnflag, rnk, l_quantity""")),

    // Running aggregate: JX range {min: None, max: 0}.
    QueryDef(
      "win_agg_running",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Catalog.table(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .withColumn("running", round(sum("o_totalprice").over(w), 2))
          .select("o_custkey", "o_orderkey", "running")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
          round(sum(o_totalprice) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        FROM orders WHERE o_custkey < 100
        ORDER BY o_custkey, o_orderkey""")),

    // Moving aggregate: JX range {min: -6, max: 0} — trailing 7 rows.
    QueryDef(
      "win_agg_moving",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(-6, Window.currentRow)
        Catalog.table(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .withColumn("mov_avg", round(avg("o_totalprice").over(w), 6))
          .select("o_custkey", "o_orderkey", "mov_avg")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
          round(avg(o_totalprice) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS mov_avg
        FROM orders WHERE o_custkey < 100
        ORDER BY o_custkey, o_orderkey""")),

    QueryDef(
      "win_lead_lag",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        Catalog.table(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .withColumn("prev_price", round(lag("o_totalprice", 1).over(w), 2))
          .withColumn("next_price", round(lead("o_totalprice", 1).over(w), 2))
          .select("o_custkey", "o_orderkey", "prev_price", "next_price")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
          round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
          round(lead(o_totalprice, 1) OVER w, 2) AS next_price
        FROM orders WHERE o_custkey < 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey""")),

    QueryDef(
      "win_first_last",
      (s, dir) => {
        val wf = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Catalog.table(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .withColumn("first_key", first("o_orderkey").over(wf))
          .withColumn("last_key", last("o_orderkey").over(wf))
          .select("o_custkey", "o_orderkey", "first_key", "last_key")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
          first_value(o_orderkey) OVER w AS first_key,
          last_value(o_orderkey) OVER w AS last_key
        FROM orders WHERE o_custkey < 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_custkey, o_orderkey""")),

    // Percentile bucket of each row — unique total order inside the
    // window spec keeps ntile/percent_rank deterministic. ntile needs
    // ALL rows of a partition on one reducer (no partial-top-N trick
    // exists — every row's bucket depends on the partition size), so the
    // scale-safe form partitions by a HIGH-cardinality key (per-customer
    // here); for global/low-card quantiles use agg_percentile instead.
    QueryDef(
      "win_ntile",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_totalprice", "o_orderkey")
        Catalog.table(s, dir, "orders")
          .filter(col("o_orderkey") < 2000)
          .withColumn("quartile", ntile(4).over(w))
          .withColumn("pr", round(percent_rank().over(w), 6))
          .select("o_custkey", "o_orderkey", "quartile", "pr")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
          ntile(4) OVER w AS quartile,
          round(percent_rank() OVER w, 6) AS pr
        FROM orders WHERE o_orderkey < 2000
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_custkey, o_orderkey""")),

    // Time-RANGE moving aggregate — "sum of the trailing hour per
    // user": the frame is bounded by TIME, not row count (the range
    // form of win_agg_moving's row frame). user_id is high-cardinality
    // so the single window shuffle is skew-safe. ts_s is epoch seconds
    // via integer floor division on both engines (epoch_us // 1e6 in
    // the oracle; a double epoch() would round, not truncate).
    QueryDef(
      "win_agg_range_frame",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_s")
          .rangeBetween(-3600L, 0L)
        Catalog.table(s, dir, "events")
          .filter(col("user_id") < 100)
          .select(col("event_id"), col("user_id"),
            col("ts").cast("long").as("ts_s"), col("value"))
          .withColumn("sum_1h", round(sum("value").over(w), 4))
          .select("event_id", "user_id", "ts_s", "sum_1h")
          .orderBy("user_id", "ts_s", "event_id")
      },
      Some("""SELECT event_id, user_id, epoch_us(ts) // 1000000 AS ts_s,
          round(sum(value) OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts) // 1000000
            RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4) AS sum_1h
        FROM events WHERE user_id < 100
        ORDER BY user_id, ts_s, event_id""")),

    // Cumulative distribution — the last of the rank family. Same
    // determinism + scale posture as win_ntile: unique total order in
    // the spec, HIGH-cardinality partition key (per-customer).
    QueryDef(
      "win_cume_dist",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_totalprice", "o_orderkey")
        Catalog.table(s, dir, "orders")
          .filter(col("o_orderkey") < 2000)
          .select(col("o_custkey"), col("o_orderkey"),
            round(cume_dist().over(w), 6).as("cd"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
          round(cume_dist() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice, o_orderkey), 6) AS cd
        FROM orders WHERE o_orderkey < 2000
        ORDER BY o_custkey, o_orderkey""")),

    // Positional value access in a window — nth_value over the full
    // partition frame (second-cheapest order per customer), the last
    // member of the value-access family beside first/last/lead/lag.
    QueryDef(
      "win_nth_value",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_totalprice", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Catalog.table(s, dir, "orders")
          .filter(col("o_orderkey") < 2000)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            nth_value(col("o_totalprice"), 2).over(w).as("second_cheapest"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
          nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS second_cheapest
        FROM orders WHERE o_orderkey < 2000
        ORDER BY o_custkey, o_orderkey""")),

    // Moving MEDIAN — robust smoothing over a trailing 5-row frame
    // (the order-statistic counterpart of win_agg_moving's mean;
    // outlier-immune trend extraction). Exact percentile as a window
    // aggregate; per-user partitions keep the frame sort local.
    QueryDef(
      "win_median",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-4, 0)
        Catalog.table(s, dir, "events")
          .filter(col("user_id") < 100)
          .select(col("user_id"), col("event_id"),
            round(expr("percentile(value, 0.5)").over(w), 6).as("med5"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
          round(quantile_cont(value, 0.5) OVER (PARTITION BY user_id
            ORDER BY ts, event_id
            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS med5
        FROM events WHERE user_id < 100
        ORDER BY user_id, event_id""")),

    // Gaps-and-islands: collapse each user's consecutive same-type run
    // into one island row (sessionize-by-change-of-state — the classic
    // "when did the status change and how long did it hold" shape).
    // Formulated as lag-compare → running sum of break flags, NOT the
    // textbook difference-of-two-row_numbers: that needs a second
    // window partitioned by (user_id, event_type) — a second full
    // shuffle+sort of the fact table — while lag and the running sum
    // share ONE partition spec, so Spark plans a single Exchange+Sort
    // and evaluates both functions in the same Window exec.
    QueryDef(
      "win_islands",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Catalog.table(s, dir, "events")
          .filter(col("user_id") < 50)
          .withColumn("brk",
            when(col("event_type") === lag("event_type", 1).over(w), lit(0))
              .otherwise(lit(1)))
          .withColumn("island", sum("brk").over(run))
          .groupBy("user_id", "island", "event_type")
          .agg(
            min("event_id").as("first_event"),
            max("event_id").as("last_event"),
            count(lit(1)).as("n_events"))
          .select("user_id", "event_type", "first_event", "last_event",
            "n_events")
          .orderBy("user_id", "first_event")
      },
      Some("""WITH g AS (
          SELECT user_id, event_id, ts, event_type,
            CASE WHEN event_type = lag(event_type) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)
              THEN 0 ELSE 1 END AS brk
          FROM events WHERE user_id < 50),
        i AS (
          SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts,
              event_id ROWS UNBOUNDED PRECEDING) AS island
          FROM g)
        SELECT user_id, event_type,
          min(event_id) AS first_event, max(event_id) AS last_event,
          count(*)::BIGINT AS n_events
        FROM i GROUP BY user_id, event_type, island
        ORDER BY user_id, first_event""")))
}
