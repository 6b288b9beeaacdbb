package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryModule}
import graft.sources.Catalog

/** SURVEY.md §2.4 — aggregations.
  *
  * JX aggregates (`select: {value, aggregate}` + `groupby`; reference
  * jx_base/expressions per SURVEY.md §2.4 [P]) lowered to Spark's hash
  * aggregate. Declaring with groupBy/agg gives partial (map-side)
  * aggregation + whole-stage codegen for free; at 100 TB the knobs that
  * matter are shuffle partition count and key skew, both handled by AQE.
  * collect_set/collect_list results are always array_sort-ed so the
  * hash compare is deterministic (SURVEY.md §7.5).
  */
object Aggregates extends QueryModule {

  /** Flagship: TPC-H Q1-shaped scan→filter→groupBy→agg→sort. */
  val q1 = QueryDef(
    "agg_groupby",
    (s, dir) => {
      Catalog.table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_extendedprice"), 6).as("avg_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity), 2) AS sum_qty,
      round(sum(l_extendedprice), 2) AS sum_base_price,
      round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      round(avg(l_quantity), 6) AS avg_qty,
      round(avg(l_extendedprice), 6) AS avg_price,
      round(avg(l_discount), 6) AS avg_disc,
      count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  def defs: Seq[QueryDef] = Seq(
    q1,

    // count(*) vs count(col): col carries synthesized NULLs so the
    // null-skipping semantics of count(col) are actually tested.
    QueryDef(
      "agg_count",
      (s, dir) =>
        Catalog.table(s, dir, "orders")
          .withColumn("p",
            when(col("o_orderpriority") === "1-URGENT", lit(null))
              .otherwise(col("o_orderpriority")))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_rows"), count(col("p")).as("n_p"))
          .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(*) AS n_rows,
        count(nullif(o_orderpriority, '1-URGENT')) AS n_p
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    QueryDef(
      "agg_sum",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            sum("l_orderkey").as("sum_key"))
          .orderBy("l_returnflag"),
      // DuckDB sum(BIGINT) yields HUGEINT (128-bit); cast to BIGINT so
      // the hash compare sees the same logical type as Spark's LongType.
      Some("""SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
        CAST(sum(l_orderkey) AS BIGINT) AS sum_key
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    QueryDef(
      "agg_minmax",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            min("l_quantity").as("min_qty"),
            max("l_quantity").as("max_qty"),
            min("l_shipdate").as("min_ship"),
            max("l_shipdate").as("max_ship"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, min(l_quantity) AS min_qty,
        max(l_quantity) AS max_qty, min(l_shipdate) AS min_ship,
        max(l_shipdate) AS max_ship
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    QueryDef(
      "agg_avg",
      (s, dir) =>
        Catalog.table(s, dir, "customer")
          .groupBy("c_mktsegment")
          .agg(round(avg("c_acctbal"), 6).as("avg_bal"))
          .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, round(avg(c_acctbal), 6) AS avg_bal
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    QueryDef(
      "agg_sos",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(round(sum(pow(col("l_quantity"), 2)), 2).as("sos_qty"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, round(sum(pow(l_quantity, 2)), 2) AS sos_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // DuckDB stddev = sample stddev (SURVEY §2.4); round to absorb
    // accumulation-order float noise between the two engines.
    QueryDef(
      "agg_stats",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
            round(var_samp(col("l_quantity")), 6).as("var_qty"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, round(stddev(l_quantity), 6) AS sd_qty,
        round(var_samp(l_quantity), 6) AS var_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Spark `percentile` is the exact interpolating aggregate —
    // semantics match DuckDB quantile_cont (SURVEY §2.4).
    //
    // SCALE CONTRACT (agg_median + agg_percentile): the EXACT aggregate
    // buffers every group value on one reducer per group — with 3
    // groups over 100 TB of lineitem that single-reducer buffer is the
    // scale killer, and it exists here ONLY for oracle parity with
    // quantile_cont. At scale use `agg_percentile_approx`
    // (percentile_approx / t-digest): mergeable, bounded-memory,
    // map-side-combinable — its bracketing contract oracle below pins
    // the approximation to the exact value. Same swap meta_profile
    // documents for count_distinct → approx_count_distinct.
    QueryDef(
      "agg_median",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 6) AS median_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    QueryDef(
      "agg_percentile",
      (s, dir) =>
        // Array-form percentile: ONE counts-map buffer per group serves
        // both targets (the agg_percentile_approx lesson) — two scalar
        // percentile() calls each built and merged their own full-group
        // buffer, doubling exactly the part of this query that is the
        // documented single-reducer cost.
        Catalog.table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(expr("percentile(l_extendedprice, array(0.25, 0.90))")
            .as("p"))
          .select(col("l_returnflag"),
            round(element_at(col("p"), 1), 4).as("p25"),
            round(element_at(col("p"), 2), 4).as("p90"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        round(quantile_cont(l_extendedprice, 0.90), 4) AS p90
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    QueryDef(
      "agg_cardinality",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(count_distinct(col("l_partkey")).as("n_parts"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // HLL sketch path for 100 TB cardinality — result is approximate,
    // so no DuckDB hash-match; rows-only check (SURVEY §2.4 no-sql).
    // Datasketches HLL (lgK=12, 4K registers), the same mergeable-sketch
    // family as agg_hll_merge: approx_count_distinct at rsd=0.01 forced
    // a 16K-register HLL++ buffer per group x partition, whose
    // humongous-allocation GC profile cost 18 s in the r6 shared suite
    // run (vs <0.3 s for this form) — and a store/merge-able sketch is
    // the shape a 100 TB rollup actually wants.
    QueryDef(
      "agg_cardinality_approx",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 12))")
            .as("n_parts_approx"))
          .orderBy("l_returnflag"),
      None),

    // Sketch-based frequent items (heavy hitters): approx_top_k is a
    // bounded-memory mergeable summary — one map-side partial per
    // partition, no exact GROUP BY over the full key domain — the
    // 100 TB shape for "top event types across the firehose". Hard
    // oracle: with distinct keys (5) far below the sketch's tracked
    // capacity the summary is EXACT by contract, so plain GROUP BY
    // counts must match; the query re-sorts with a total order
    // (count desc, item) so ties can never flap the hash.
    QueryDef(
      "agg_topk_approx",
      (s, dir) =>
        Catalog.table(s, dir, "events")
          .agg(expr("approx_top_k(event_type, 10)").as("tk"))
          .select(explode(col("tk")).as("e"))
          .select(col("e.item").as("event_type"),
            col("e.count").cast("long").as("n"))
          .orderBy(desc("n"), col("event_type")),
      Some("""SELECT event_type, count(*) AS n FROM events
        GROUP BY event_type ORDER BY n DESC, event_type""")),

    // Mergeable-sketch percentile for 100 TB quantiles (exact
    // percentile sorts every group; approx_percentile is a bounded-
    // error mergeable digest — one map-side partial per partition).
    // PROMOTED to a hard oracle (round 6): the digest VALUE is
    // merge-order-dependent so no other engine can recompute it, but
    // its CONTRACT is checkable — Greenwald-Khanna with accuracy a
    // guarantees rank error <= N/a, so the sketch result must lie
    // between the exact percentiles at p ± 2/a. The declared output is
    // those exact bracketing values (cross-engine value-checked) plus
    // the in-bounds booleans, which DuckDB emits as the contract's
    // literal TRUE — a digest regression now fails the driver's hash,
    // not just the local spec (AggregatesSpec still bounds the raw
    // error). The sketch itself still runs inside the query.
    QueryDef(
      "agg_percentile_approx",
      (s, dir) =>
        // Array-form percentiles: ONE counts-map buffer per group for
        // the four exact brackets and one digest for both approx
        // targets, instead of six independent aggregate buffers — the
        // 6× buffer build/merge was the whole cost (and GC-noise
        // source) of the previous form at sf0.1.
        Catalog.table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            expr("approx_percentile(l_extendedprice, array(0.25, 0.90), 1000)")
              .as("a"),
            expr("percentile(l_extendedprice, array(0.248, 0.252, 0.898, 0.902))")
              .as("p"))
          .select(col("l_returnflag"),
            round(element_at(col("p"), 1), 4).as("p25_lo"),
            round(element_at(col("p"), 2), 4).as("p25_hi"),
            (element_at(col("a"), 1) >= element_at(col("p"), 1) &&
              element_at(col("a"), 1) <= element_at(col("p"), 2))
              .as("p25_ok"),
            round(element_at(col("p"), 3), 4).as("p90_lo"),
            round(element_at(col("p"), 4), 4).as("p90_hi"),
            (element_at(col("a"), 2) >= element_at(col("p"), 3) &&
              element_at(col("a"), 2) <= element_at(col("p"), 4))
              .as("p90_ok"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
          round(quantile_cont(l_extendedprice, 0.248), 4) AS p25_lo,
          round(quantile_cont(l_extendedprice, 0.252), 4) AS p25_hi,
          true AS p25_ok,
          round(quantile_cont(l_extendedprice, 0.898), 4) AS p90_lo,
          round(quantile_cont(l_extendedprice, 0.902), 4) AS p90_hi,
          true AS p90_ok
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Array-valued results are serialized with to_json in the DECLARED
    // output (QueryDef determinism contract: arrays render to strings
    // where hashing would be ambiguous — the driver's comparator cannot
    // sort raw array cells). The operator itself stays array-native.
    QueryDef(
      "agg_union",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(to_json(array_sort(collect_set(col("l_linenumber")))).as("linenums"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        CAST(to_json(list(DISTINCT l_linenumber ORDER BY l_linenumber)) AS VARCHAR) AS linenums
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    QueryDef(
      "agg_list",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .filter(col("l_orderkey") < 100)
          .groupBy("l_orderkey")
          .agg(to_json(array_sort(collect_list(col("l_linenumber")))).as("linenums"))
          .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey,
        CAST(to_json(list(l_linenumber ORDER BY l_linenumber)) AS VARCHAR) AS linenums
        FROM lineitem WHERE l_orderkey < 100
        GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // min_by/max_by with a struct sort key — the unique o_orderkey
    // tiebreak makes the pick deterministic on both engines.
    QueryDef(
      "agg_first_last",
      (s, dir) =>
        Catalog.table(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            min_by(col("o_orderkey"), struct(col("o_orderdate"), col("o_orderkey")))
              .as("first_key"),
            max_by(col("o_orderkey"), struct(col("o_orderdate"), col("o_orderkey")))
              .as("last_key"))
          .orderBy("o_orderstatus"),
      Some("""WITH ranked AS (
        SELECT o_orderstatus, o_orderkey,
          row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey) AS rf,
          row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate DESC, o_orderkey DESC) AS rl
        FROM orders)
        SELECT o_orderstatus,
          max(CASE WHEN rf = 1 THEN o_orderkey END) AS first_key,
          max(CASE WHEN rl = 1 THEN o_orderkey END) AS last_key
        FROM ranked GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    QueryDef(
      "agg_distinct",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .groupBy("l_linestatus")
          .agg(count_distinct(col("l_partkey"), col("l_suppkey")).as("n_ps"))
          .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus, count(DISTINCT (l_partkey, l_suppkey)) AS n_ps
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    QueryDef(
      "agg_cube",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
        round(sum(l_quantity), 2) AS qty
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    QueryDef(
      "agg_rollup",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // Explicit GROUPING SETS (the general form behind cube/rollup).
    QueryDef(
      "agg_grouping_sets",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .groupingSets(
            Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
            col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // JX has no separate HAVING — post-agg `where` (SURVEY §2.4);
    // in Spark that is just .agg(...).filter(...).
    QueryDef(
      "agg_having",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .groupBy("l_partkey")
          .agg(count(lit(1)).as("n"))
          .filter(col("n") > 40)
          .orderBy("l_partkey"),
      Some("""SELECT l_partkey, count(*) AS n FROM lineitem
        GROUP BY l_partkey HAVING count(*) > 40 ORDER BY l_partkey""")),

    // Pivot (wide reshape): explicit pivot values keep the output
    // schema static — at 100 TB you never let the engine scan for
    // distinct pivot keys first. Missing combinations coalesce to 0 to
    // match the oracle's FILTER form.
    QueryDef(
      "agg_pivot",
      (s, dir) =>
        Catalog.table(s, dir, "orders")
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .select(col("o_orderpriority"),
            coalesce(col("F"), lit(0L)).as("F"),
            coalesce(col("O"), lit(0L)).as("O"),
            coalesce(col("P"), lit(0L)).as("P"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
          count(*) FILTER (o_orderstatus = 'F') AS F,
          count(*) FILTER (o_orderstatus = 'O') AS O,
          count(*) FILTER (o_orderstatus = 'P') AS P
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Deterministic mode (argmax): most frequent priority per status.
    // Plain mode() is tie-arbitrary in both engines, so both sides pin
    // the same total order (count DESC, value ASC) — the windowed
    // argmax runs over the 15-row AGGREGATED counts, not the fact
    // table, so the low-cardinality partition key funnels nothing.
    QueryDef(
      "agg_argmax",
      (s, dir) => {
        val counts = Catalog.table(s, dir, "orders")
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(desc("n"), asc("o_orderpriority"))
        counts.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("o_orderstatus"),
            col("o_orderpriority").as("mode_priority"), col("n"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, o_orderpriority AS mode_priority, n
        FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS n,
            row_number() OVER (PARTITION BY o_orderstatus
              ORDER BY count(*) DESC, o_orderpriority) AS rk
          FROM orders GROUP BY o_orderstatus, o_orderpriority)
        WHERE rk = 1 ORDER BY o_orderstatus""")),

    // Bivariate statistics: correlation + covariance per group. All
    // three accumulate co-moments in the same single two-phase hash
    // aggregate — adding statistics adds no shuffles. Covariances are
    // rounded coarser than corr: their magnitude is price-scaled, so
    // the engines' different partial-sum orders can disagree further
    // out in the mantissa.
    QueryDef(
      "agg_corr",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            round(corr(col("l_quantity"), col("l_extendedprice")), 6)
              .as("corr_qp"),
            round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
              .as("cov_s"),
            round(covar_pop(col("l_quantity"), col("l_extendedprice")), 2)
              .as("cov_p"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
          round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
          round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_s,
          round(covar_pop(l_quantity, l_extendedprice), 2) AS cov_p
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Fixed-width histogram: integer bucket arithmetic then a plain
    // two-phase hash aggregate — no sort, no window; bucket count is
    // bounded by the value range, not the row count. The per-bucket
    // measure sums whole-number quantities, so any summation order is
    // bit-exact.
    QueryDef(
      "agg_histogram",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .groupBy(floor(col("l_extendedprice") / 10000).cast("long")
            .as("bucket"))
          .agg(count(lit(1)).as("n"), sum("l_quantity").as("total_qty"))
          .orderBy("bucket"),
      Some("""SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket,
          count(*) AS n, sum(l_quantity) AS total_qty
        FROM lineitem GROUP BY 1 ORDER BY bucket""")),

    // Weighted average — price-weighted mean discount: two sums in the
    // SAME single two-phase hash aggregate, divided after the final
    // merge (never a per-row division column that would lose the
    // map-side combine).
    QueryDef(
      "agg_weighted_avg",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(round(
            sum(col("l_extendedprice") * col("l_discount")) /
              sum(col("l_extendedprice")), 6).as("wavg_disc"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
          round(sum(l_extendedprice * l_discount) / sum(l_extendedprice), 6)
            AS wavg_disc,
          count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Median absolute deviation — the robust dispersion measure
    // (insensitive to the outliers agg_outliers hunts). Two passes by
    // necessity (the second depends on the first's median), broadcast
    // of the tiny per-group medians in between — same shape as
    // agg_outliers, never a window.
    QueryDef(
      "agg_mad",
      (s, dir) => {
        val li = Catalog.table(s, dir, "lineitem")
        val med = li.groupBy("l_returnflag")
          .agg(expr("percentile(l_quantity, 0.5D)").as("med"))
        li.join(broadcast(med), "l_returnflag")
          .groupBy("l_returnflag")
          .agg(round(max("med"), 6).as("med"),
            round(expr("percentile(abs(l_quantity - med), 0.5D)"), 6)
              .as("mad"))
          .orderBy("l_returnflag")
      },
      Some("""WITH med AS (SELECT l_returnflag,
            quantile_cont(l_quantity, 0.5) AS med
          FROM lineitem GROUP BY 1)
        SELECT l.l_returnflag, round(max(med), 6) AS med,
          round(quantile_cont(abs(l_quantity - med), 0.5), 6) AS mad
        FROM lineitem l JOIN med USING (l_returnflag)
        GROUP BY l.l_returnflag ORDER BY l.l_returnflag""")),

    // FILTER-clause (conditional) aggregates: several differently-
    // filtered measures in ONE two-phase hash aggregate — the
    // alternative to N self-joins or N passes over the facts.
    QueryDef(
      "agg_filtered",
      (s, dir) =>
        Catalog.table(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            expr("count(*) FILTER (WHERE o_orderpriority = '1-URGENT')")
              .as("n_urgent"),
            expr("""CAST(count(*) FILTER (
                WHERE o_orderpriority = '5-LOW') AS BIGINT)""").as("n_low"),
            expr("round(sum(o_totalprice) FILTER (WHERE o_totalprice > 100000), 2)")
              .as("big_total"))
          .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
          count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
          count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_low,
          round(sum(o_totalprice) FILTER (WHERE o_totalprice > 100000), 2)
            AS big_total
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Rollup with grouping markers: subtotal rows are distinguishable
    // from genuine NULL groups via grouping() — without this, cube
    // consumers cannot tell "subtotal over all statuses" from "status
    // IS NULL". Spark grouping() is TINYINT, DuckDB GROUPING() wider —
    // both cast to BIGINT.
    QueryDef(
      "agg_grouping_id",
      (s, dir) =>
        Catalog.table(s, dir, "orders")
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"),
            grouping(col("o_orderstatus")).cast("long").as("g_status"),
            grouping(col("o_orderpriority")).cast("long").as("g_prio"))
          .orderBy("o_orderstatus", "o_orderpriority"),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
          CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),

    // Z-score outlier detection — the two-pass distributed shape: one
    // aggregate for per-group moments, broadcast the (tiny, bounded
    // by |group|) stats back onto the fact table, filter on the
    // ROUNDED score so engine ulp differences in mean/stddev cannot
    // flip the threshold. No window, no second shuffle of the facts.
    QueryDef(
      "agg_outliers",
      (s, dir) => {
        val ev = Catalog.table(s, dir, "events")
        val stats = ev.groupBy("event_type")
          .agg(avg("value").as("mu"), stddev_samp("value").as("sd"))
        ev.join(broadcast(stats), "event_type")
          .withColumn("z",
            round((col("value") - col("mu")) / col("sd"), 6))
          .filter(abs(col("z")) > lit(2.5))
          .select("event_id", "event_type", "value", "z")
          .orderBy("event_id")
      },
      Some("""WITH stats AS (SELECT event_type, avg(value) AS mu,
            stddev_samp(value) AS sd FROM events GROUP BY event_type)
        SELECT event_id, e.event_type, value,
            round((value - mu) / sd, 6) AS z
        FROM events e JOIN stats s ON e.event_type = s.event_type
        WHERE abs(round((value - mu) / sd, 6)) > 2.5
        ORDER BY event_id""")),

    // Long-form reshape (unpivot/melt) — the inverse of agg_pivot.
    // Spark's unpivot is a zero-shuffle Expand: each input row emits
    // one row per measure locally, so the reshape never moves data
    // across the cluster.
    QueryDef(
      "agg_unpivot",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .filter(col("l_orderkey") < 500)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_extendedprice"), col("l_discount"))
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_extendedprice"),
              col("l_discount")),
            "metric", "value")
          .orderBy("l_orderkey", "l_linenumber", "metric"),
      Some("""SELECT l_orderkey, l_linenumber,
            'l_quantity' AS metric, l_quantity AS value
          FROM lineitem WHERE l_orderkey < 500
        UNION ALL SELECT l_orderkey, l_linenumber,
            'l_extendedprice', l_extendedprice
          FROM lineitem WHERE l_orderkey < 500
        UNION ALL SELECT l_orderkey, l_linenumber,
            'l_discount', l_discount
          FROM lineitem WHERE l_orderkey < 500
        ORDER BY l_orderkey, l_linenumber, metric""")),

    // Higher central moments: population skewness / excess kurtosis.
    // Spark's skewness/kurtosis ARE the population forms (m3/m2^1.5,
    // m4/m2²−3) computed in one streaming-moment pass; DuckDB's
    // skewness/kurtosis are the bias-corrected sample forms, so the
    // oracle recomputes the population formulas from central moments
    // explicitly. round(…,6) absorbs update-order ulps.
    QueryDef(
      "agg_moments",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            round(skewness(col("l_quantity")), 6).as("skew_pop"),
            round(kurtosis(col("l_quantity")), 6).as("kurt_pop"))
          .orderBy("l_returnflag"),
      Some("""WITH mu AS (SELECT l_returnflag, avg(l_quantity) AS m
            FROM lineitem GROUP BY l_returnflag)
        SELECT l.l_returnflag,
          round(avg(pow(l_quantity - m, 3))
            / pow(avg(pow(l_quantity - m, 2)), 1.5), 6) AS skew_pop,
          round(avg(pow(l_quantity - m, 4))
            / pow(avg(pow(l_quantity - m, 2)), 2) - 3, 6) AS kurt_pop
        FROM lineitem l JOIN mu ON l.l_returnflag = mu.l_returnflag
        GROUP BY l.l_returnflag ORDER BY l.l_returnflag""")),

    // Ordered string aggregation (listagg / string_agg) — the report
    // formatter. Determinism: WITHIN GROUP (ORDER BY n_name) pins the
    // concatenation order on both engines.
    QueryDef(
      "agg_string_agg",
      (s, dir) =>
        Catalog.table(s, dir, "nation")
          .join(Catalog.table(s, dir, "region"),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)")
            .as("members"))
          .orderBy("r_name"),
      Some("""SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS members
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""")),

    // Deterministic mode (most frequent value per group). Neither
    // engine's built-in mode() pins tie order, so both sides compute it
    // the same explicit way: count per (group, value) first — the
    // aggregate collapses the corpus to |status|×|priority| ≈ 15 rows —
    // then a row_number window over those aggregated rows picks
    // (count DESC, value ASC). At 100 TB the window never sees raw
    // rows, only the tiny count table (same shape as llm_domain_mix).
    QueryDef(
      "agg_mode",
      (s, dir) => {
        val cnt = Catalog.table(s, dir, "orders")
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(desc("cnt"), asc("o_orderpriority"))
        cnt.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_orderstatus"),
            col("o_orderpriority").as("mode_priority"), col("cnt"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
        FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
            row_number() OVER (PARTITION BY o_orderstatus
              ORDER BY count(*) DESC, o_orderpriority) AS rn
          FROM orders GROUP BY o_orderstatus, o_orderpriority)
        WHERE rn = 1 ORDER BY o_orderstatus""")),

    // Boolean aggregates: bool_and / bool_or plus a filtered count —
    // the data-quality assertion shape ("do ALL rows in this partition
    // satisfy the invariant; does ANY violate it"). All three are
    // map-side-combinable single-bit/long states.
    QueryDef(
      "agg_bool",
      (s, dir) =>
        Catalog.table(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            bool_and(col("o_totalprice") > 1000.0).as("all_over_1k"),
            bool_or(col("o_totalprice") > 400000.0).as("any_over_400k"),
            count(when(col("o_totalprice") > 200000.0, 1)).as("n_over_200k"))
          .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
          bool_and(o_totalprice > 1000.0) AS all_over_1k,
          bool_or(o_totalprice > 400000.0) AS any_over_400k,
          count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_over_200k
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Bitwise aggregates (bit_and / bit_or / bit_xor over int keys) —
    // the bitmap/flag-merging shape. Fixed-width Long state, fully
    // map-side-combinable; the xor form is the order-independent
    // set-digest used by Bench's own full-row result hash.
    QueryDef(
      "agg_bitagg",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            expr("bit_and(l_orderkey)").as("band"),
            expr("bit_or(l_orderkey)").as("bor"),
            expr("bit_xor(l_orderkey)").as("bxor"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, bit_and(l_orderkey) AS band,
          bit_or(l_orderkey) AS bor, bit_xor(l_orderkey) AS bxor
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Product aggregate. Spark has no product(); the distributed form
    // is exp(sum(ln x)) — an O(1)-state commutative reduction instead
    // of an ordered multiply, which is exactly how a 1000-executor
    // cluster wants it (DuckDB's product() is the oracle). Terms are
    // 1+discount ∈ [1, 1.1] over ≤7-row groups, so the log/exp detour
    // costs ~1 ulp — far inside the round(…,6) contract.
    QueryDef(
      "agg_product",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .filter(col("l_orderkey") < 200)
          .groupBy("l_orderkey")
          .agg(round(exp(sum(log(lit(1.0) + col("l_discount")))), 6)
            .as("disc_product"))
          .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey,
          round(product(1.0 + l_discount), 6) AS disc_product
        FROM lineitem WHERE l_orderkey < 200
        GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // Re-aggregatable HLL sketch workflow — THE 100 TB cardinality
    // pattern: build one Datasketches HLL per fine grain (day), store
    // it, and answer any coarser rollup (month here) by MERGING the
    // byte-array sketches with hll_union_agg instead of re-scanning the
    // fact table. count(DISTINCT) cannot pre-aggregate (distinct keys
    // must meet in one place); sketches make cardinality associative,
    // so a 1000-executor cluster ships ~2 KB per day-partition rather
    // than re-shuffling raw keys per query. Oracle follows the
    // agg_percentile_approx precedent: the merged estimate's VALUE is
    // sketch-internal, but its CONTRACT is checkable — lgConfigK=12
    // gives ~1.6% relative standard error, so the day-merged estimate
    // must land within ±5% (>3 sigma) of the exact per-month
    // cardinality. Output = exact count (cross-engine value-checked) +
    // the in-bounds boolean DuckDB emits as literal TRUE; an estimator
    // or merge regression flips the boolean and fails the driver hash.
    QueryDef(
      "agg_hll_merge",
      (s, dir) => {
        val orders = Catalog.table(s, dir, "orders")
          .select(
            date_format(col("o_orderdate"), "yyyy-MM").as("month"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
            col("o_custkey"))
        // Fine-grain sketch build (the "stored" layer)…
        val perDay = orders.groupBy("month", "day")
          .agg(expr("hll_sketch_agg(o_custkey, 12)").as("sk"))
        // …then pure sketch MERGE to the coarser grain — no raw keys.
        val merged = perDay.groupBy("month")
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
        val exact = orders.groupBy("month")
          .agg(countDistinct(col("o_custkey")).as("n_exact"))
        exact.join(broadcast(merged), "month")
          .select(col("month"), col("n_exact"),
            (abs(col("est") / col("n_exact") - 1.0) <= 0.05)
              .as("est_in_bounds"))
          .orderBy("month")
      },
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month,
          count(DISTINCT o_custkey)::BIGINT AS n_exact,
          TRUE AS est_in_bounds
        FROM orders GROUP BY 1 ORDER BY month""")),

    // Ordered-step funnel (view -> click -> purchase): how many users
    // completed each prefix IN ORDER. The textbook form is one
    // self-join per step (each a full shuffle of the fact table); here
    // the whole funnel is ONE shuffle — per-user events are gathered
    // once (collect_list, map-side partial), time-sorted in place, and
    // a codegen'd aggregate() fold walks the state machine: step
    // advances on the first qualifying event after the previous step's
    // event. Per-user state is bounded by that user's event count —
    // the same contract as any sessionize. The oracle recomputes the
    // identical semantics via the 3-CTE min-timestamp-chain form
    // (t2 = first click AFTER first view, etc.) — two independent
    // formulations agreeing is the point. Determinism: events are
    // fold-ordered by (ts, event_id) and the fixture has no duplicate
    // (user_id, ts), so the oracle's strict ts inequalities match.
    QueryDef(
      "agg_funnel",
      (s, dir) => {
        val reached = Catalog.table(s, dir, "events")
          .filter(col("event_type").isin("view", "click", "purchase"))
          .groupBy("user_id")
          .agg(array_sort(collect_list(struct(
            col("ts"), col("event_id"), col("event_type")))).as("evs"))
          .select(expr("""aggregate(evs, 0, (acc, e) -> CASE
              WHEN acc = 0 AND e.event_type = 'view' THEN 1
              WHEN acc = 1 AND e.event_type = 'click' THEN 2
              WHEN acc = 2 AND e.event_type = 'purchase' THEN 3
              ELSE acc END)""").as("reached"))
        reached.agg(
            sum(when(col("reached") >= 1, 1L).otherwise(0L)).as("s1"),
            sum(when(col("reached") >= 2, 1L).otherwise(0L)).as("s2"),
            sum(when(col("reached") >= 3, 1L).otherwise(0L)).as("s3"))
          .select(explode(array(
            struct(lit(1).as("step"), lit("view").as("step_name"),
              col("s1").as("n_users")),
            struct(lit(2).as("step"), lit("click").as("step_name"),
              col("s2").as("n_users")),
            struct(lit(3).as("step"), lit("purchase").as("step_name"),
              col("s3").as("n_users")))).as("f"))
          .select(col("f.step").as("step"), col("f.step_name").as("step_name"),
            col("f.n_users").as("n_users"))
          .orderBy("step")
      },
      Some("""WITH e AS (SELECT user_id, ts, event_type FROM events
            WHERE event_type IN ('view', 'click', 'purchase')),
          s1 AS (SELECT user_id, min(ts) AS t1 FROM e
            WHERE event_type = 'view' GROUP BY user_id),
          s2 AS (SELECT e.user_id, min(ts) AS t2 FROM e JOIN s1 USING (user_id)
            WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id),
          s3 AS (SELECT e.user_id, min(ts) AS t3 FROM e JOIN s2 USING (user_id)
            WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id)
        SELECT * FROM (VALUES
            (1, 'view', (SELECT count(*) FROM s1)),
            (2, 'click', (SELECT count(*) FROM s2)),
            (3, 'purchase', (SELECT count(*) FROM s3)))
          AS t(step, step_name, n_users)
        ORDER BY step""")),

    // RETENTION COHORT MATRIX — the classic product-analytics rollup
    // (users grouped by first-activity week × activity-week offset):
    // one aggregate keyed on user_id finds each user's cohort week,
    // an equi-join on user_id tags every event, and the final
    // aggregate shuffles only (cohort, offset) pairs. At 100 TB the
    // first shuffle is the unavoidable per-user reduction; everything
    // after it carries |users| rows, not |events| — the matrix itself
    // is |weeks|² tiny. Monday-truncated weeks on BOTH engines, so
    // day-diffs between week starts are exact multiples of 7.
    QueryDef(
      "agg_retention_cohort",
      (s, dir) => {
        val ev = Catalog.table(s, dir, "events")
          .select(col("user_id"),
            date_trunc("week", col("ts")).cast("date").as("wk"))
        val cohort = ev.groupBy("user_id")
          .agg(min(col("wk")).as("cohort_wk"))
        ev.join(cohort, "user_id")
          .groupBy(col("cohort_wk"),
            (datediff(col("wk"), col("cohort_wk")) / 7).cast("int")
              .as("offset_wk"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy("cohort_wk", "offset_wk")
      },
      Some("""WITH e AS (SELECT user_id,
            CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
          c AS (SELECT user_id, min(wk) AS cohort_wk FROM e
            GROUP BY user_id)
        SELECT c.cohort_wk,
          CAST(date_diff('day', c.cohort_wk, e.wk) // 7 AS INT)
            AS offset_wk,
          count(DISTINCT e.user_id) AS n_users
        FROM e JOIN c USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2""")))
}
