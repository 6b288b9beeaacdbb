package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryModule}
import graft.sources.Catalog

/** SURVEY.md §2.2 (projection/filter/predicates) + §2.7 (sort/limit/set).
  *
  * JX's `select`/`where` clauses (reference jx_base/expressions per
  * SURVEY.md §2.2 [P]) lowered to declarative Column expressions so
  * Catalyst keeps predicate pushdown + column pruning: at 100 TB every
  * one of these filters reaches the parquet row-group stats
  * (PushedFilters) and the scan reads only projected columns.
  *
  * Determinism: every oracle query ends in a total-order sort (unique
  * key in the sort), doubles are rounded identically on both sides.
  */
object Relational extends QueryModule {

  private def d(defs: QueryDef*): Seq[QueryDef] = defs

  def defs: Seq[QueryDef] = d(
    QueryDef(
      "proj_select",
      (s, dir) =>
        Catalog.table(s, dir, "customer")
          .select(
            col("c_custkey").as("id"),
            upper(col("c_name")).as("name_uc"),
            round(col("c_acctbal") * 2, 2).as("bal2"),
            col("c_mktsegment").as("segment"))
          .orderBy("id")
          .limit(1000),
      Some("""SELECT c_custkey AS id, upper(c_name) AS name_uc,
        round(c_acctbal * 2, 2) AS bal2, c_mktsegment AS segment
        FROM customer ORDER BY id LIMIT 1000""")),

    QueryDef(
      "filter_where",
      (s, dir) =>
        Catalog.table(s, dir, "orders")
          .filter(col("o_totalprice") > 150000.0 && col("o_orderstatus") === "O")
          .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
          .orderBy("o_orderkey")
          .limit(2000),
      Some("""SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
        WHERE o_totalprice > 150000.0 AND o_orderstatus = 'O'
        ORDER BY o_orderkey LIMIT 2000""")),

    QueryDef(
      "pred_compare",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .filter(
            col("l_quantity") > 30 && col("l_quantity") <= 45 &&
            col("l_discount") >= 0.02 && col("l_discount") < 0.08 &&
            col("l_linenumber") =!= 1 && col("l_returnflag") === "R")
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber", "l_quantity")
          .limit(2000),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_quantity > 30 AND l_quantity <= 45 AND l_discount >= 0.02
          AND l_discount < 0.08 AND l_linenumber != 1 AND l_returnflag = 'R'
        ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 2000""")),

    QueryDef(
      "pred_bool",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .filter(
            (col("l_returnflag") === "A" && col("l_discount") > 0.05) ||
            (!(col("l_linestatus") === "O") && col("l_tax") < 0.02))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem
        WHERE (l_returnflag = 'A' AND l_discount > 0.05)
           OR (NOT (l_linestatus = 'O') AND l_tax < 0.02)
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    QueryDef(
      "pred_in",
      (s, dir) =>
        Catalog.table(s, dir, "orders")
          .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS n FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    QueryDef(
      "pred_between",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .filter(
            col("l_quantity").between(10, 20) &&
            col("l_shipdate").between(
              lit("1996-01-01").cast("timestamp"),
              lit("1996-12-31").cast("timestamp")))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty
        FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 20
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Fixtures have no physical NULLs (verified FIXTURES.md) — synthesize
    // them with nullif so missing/exists semantics are actually exercised.
    QueryDef(
      "pred_missing",
      (s, dir) => {
        val p = when(col("o_orderpriority") === "1-URGENT", lit(null))
          .otherwise(col("o_orderpriority"))
        Catalog.table(s, dir, "orders")
          .withColumn("p", p)
          .groupBy("o_orderstatus")
          .agg(
            sum(when(col("p").isNull, 1).otherwise(0)).as("n_missing"),
            sum(when(col("p").isNotNull, 1).otherwise(0)).as("n_exists"))
          .orderBy("o_orderstatus")
      },
      // CAST: DuckDB sum(INT) is HUGEINT; Spark sum(int) is LongType.
      Some("""SELECT o_orderstatus,
        CAST(sum(CASE WHEN nullif(o_orderpriority, '1-URGENT') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
        CAST(sum(CASE WHEN nullif(o_orderpriority, '1-URGENT') IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_exists
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    QueryDef(
      "pred_prefix",
      (s, dir) =>
        Catalog.table(s, dir, "part")
          .filter(col("p_type").startsWith("ECO") || col("p_name").endsWith("bolt"))
          .select("p_partkey", "p_name", "p_type")
          .orderBy("p_partkey")
          .limit(1000),
      Some("""SELECT p_partkey, p_name, p_type FROM part
        WHERE p_type LIKE 'ECO%' OR p_name LIKE '%bolt'
        ORDER BY p_partkey LIMIT 1000""")),

    QueryDef(
      "pred_regex",
      (s, dir) =>
        Catalog.table(s, dir, "documents")
          .filter(col("text").rlike("agg\\s+\\w+\\s+join"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n"))
          .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n FROM documents
        WHERE regexp_matches(text, 'agg\s+\w+\s+join')
        GROUP BY lang ORDER BY lang""")),

    // SQL LIKE wildcards (% and _) — between the prefix/suffix
    // predicates and full regex; translated to the same pattern
    // machinery on both engines.
    QueryDef(
      "pred_like",
      (s, dir) =>
        Catalog.table(s, dir, "part")
          .filter(col("p_name").like("%ring%") &&
            col("p_brand").like("Brand#1_"))
          .select("p_partkey", "p_name", "p_brand")
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name, p_brand FROM part
        WHERE p_name LIKE '%ring%' AND p_brand LIKE 'Brand#1_'
        ORDER BY p_partkey""")),

    QueryDef(
      "pred_case",
      (s, dir) =>
        Catalog.table(s, dir, "customer")
          .withColumn("bucket",
            when(col("c_acctbal") < 0, "neg")
              .when(col("c_acctbal") < 5000, "low")
              .otherwise("high"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), round(avg("c_acctbal"), 4).as("avg_bal"))
          .orderBy("bucket"),
      Some("""SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
                     WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bucket,
        count(*) AS n, round(avg(c_acctbal), 4) AS avg_bal
        FROM customer GROUP BY 1 ORDER BY 1""")),

    QueryDef(
      "expr_coalesce",
      (s, dir) =>
        Catalog.table(s, dir, "orders")
          .select(
            col("o_orderkey"),
            coalesce(
              when(col("o_orderpriority") === "1-URGENT", lit(null))
                .otherwise(col("o_orderpriority")),
              lit("0-FALLBACK")).as("pri"))
          .orderBy("o_orderkey")
          .limit(1000),
      Some("""SELECT o_orderkey,
        coalesce(nullif(o_orderpriority, '1-URGENT'), '0-FALLBACK') AS pri
        FROM orders ORDER BY o_orderkey LIMIT 1000""")),

    QueryDef(
      "sort_multi",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .select("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
          .orderBy(
            asc("l_returnflag"), desc("l_quantity"),
            asc("l_orderkey"), asc("l_linenumber"))
          .limit(1000),
      Some("""SELECT l_returnflag, l_quantity, l_orderkey, l_linenumber
        FROM lineitem
        ORDER BY l_returnflag ASC, l_quantity DESC, l_orderkey ASC, l_linenumber ASC
        LIMIT 1000""")),

    QueryDef(
      "limit_n",
      (s, dir) =>
        Catalog.table(s, dir, "orders")
          .select("o_orderkey")
          .orderBy("o_orderkey")
          .limit(42),
      Some("SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 42")),

    // Fuses to TakeOrderedAndProject — no full sort, no full shuffle: each
    // partition keeps its local top-k, driver merges k*numPartitions rows.
    QueryDef(
      "topk",
      (s, dir) =>
        Catalog.table(s, dir, "orders")
          .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
          .orderBy(desc("price"), asc("o_orderkey"))
          .limit(15),
      Some("""SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
        ORDER BY price DESC, o_orderkey ASC LIMIT 15""")),

    QueryDef(
      "distinct_rows",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .select("l_returnflag", "l_linestatus")
          .distinct()
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        ORDER BY l_returnflag, l_linestatus""")),

    QueryDef(
      "set_union",
      (s, dir) => {
        val o = Catalog.table(s, dir, "orders")
        val a = o.filter(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey", "o_orderpriority")
        val b = o.filter(col("o_orderpriority") === "2-HIGH")
          .select("o_orderkey", "o_orderpriority")
        a.unionByName(b).orderBy("o_orderkey").limit(2000)
      },
      Some("""SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH'
        ORDER BY o_orderkey LIMIT 2000""")),

    QueryDef(
      "set_intersect",
      (s, dir) => {
        val o = Catalog.table(s, dir, "orders")
        o.filter(col("o_orderstatus") === "O").select("o_custkey")
          .intersect(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
          .orderBy("o_custkey")
          .limit(2000)
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        ORDER BY o_custkey LIMIT 2000""")),

    QueryDef(
      "set_except",
      (s, dir) => {
        val c = Catalog.table(s, dir, "customer").select(col("c_custkey"))
        val o = Catalog.table(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("c_custkey"))
        c.except(o).orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        ORDER BY c_custkey""")),

    // SCD-1 upsert / CDC merge: apply a delta of changed rows onto a
    // base snapshot, keeping the highest-version row per key. The
    // distributed shape is union + one row_number window on the
    // HIGH-cardinality key — one shuffle of base+delta, no join; at
    // 100 TB the same shape runs partition-local if both sides are
    // bucketed on the key (join_bucketed's layout).
    QueryDef(
      "etl_upsert",
      (s, dir) => {
        val orders = Catalog.table(s, dir, "orders")
        // The delta price is an exact IEEE addition (no rounding):
        // round(x * 1.1, 2) sits on .xx5 ties where the engines'
        // double-rounding implementations disagree by a cent.
        val base = orders.select(col("o_orderkey"),
          col("o_totalprice").as("price"),
          lit(0L).as("version"))
        val delta = orders.filter(pmod(col("o_orderkey"), lit(10)) === 0)
          .select(col("o_orderkey"),
            (col("o_totalprice") + lit(1000.0)).as("price"),
            lit(1L).as("version"))
        val w = Window.partitionBy("o_orderkey").orderBy(desc("version"))
        base.unionByName(delta)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select("o_orderkey", "price", "version")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, price, version FROM (
          SELECT o_orderkey, price, version,
            row_number() OVER (PARTITION BY o_orderkey
              ORDER BY version DESC) AS rk
          FROM (
            SELECT o_orderkey, o_totalprice AS price,
              CAST(0 AS BIGINT) AS version FROM orders
            UNION ALL
            SELECT o_orderkey, o_totalprice + 1000.0 AS price,
              CAST(1 AS BIGINT) AS version
            FROM orders WHERE o_orderkey % 10 = 0))
        WHERE rk = 1 ORDER BY o_orderkey""")),

    // SCD-2 history construction: each key's change events become
    // validity intervals — valid_from = this event's ts, valid_to =
    // the next event's ts (null = current). One lead() window on the
    // HIGH-cardinality key, one shuffle, no self-join — the standard
    // dimension-history builder at any scale.
    QueryDef(
      "etl_scd2",
      (s, dir) => {
        Catalog.table(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts").as("valid_from"),
            col("value"))
          .withColumn("valid_to", lead(col("valid_from"), 1).over(
            Window.partitionBy("user_id").orderBy("valid_from", "event_id")))
          .withColumn("is_current", col("valid_to").isNull)
          .orderBy("user_id", "valid_from", "event_id")
      },
      Some("""SELECT user_id, event_id, ts AS valid_from, value,
          lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS valid_to,
          (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            IS NULL) AS is_current
        FROM events WHERE event_type = 'purchase'
        ORDER BY user_id, valid_from, event_id""")),

    // Forward fill (gap filling): carry the last non-null observation
    // forward within each key's timeline — last(..., ignoreNulls) over
    // a running frame, one window on the HIGH-cardinality key. The
    // sensor/telemetry repair op; nulls are synthesized from 'error'
    // events so the fixture exercises real gaps.
    QueryDef(
      "etl_forward_fill",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Catalog.table(s, dir, "events")
          .filter(col("user_id") < 200)
          .select(col("user_id"), col("event_id"), col("ts"),
            when(col("event_type") =!= "error", col("value")).as("v"))
          .withColumn("v_filled",
            round(last(col("v"), ignoreNulls = true).over(w), 4))
          .select(col("user_id"), col("event_id"), round(col("v"), 4).as("v"),
            col("v_filled"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
          round(CASE WHEN event_type != 'error' THEN value END, 4) AS v,
          round(last_value(CASE WHEN event_type != 'error' THEN value END
              IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
            AS v_filled
        FROM events WHERE user_id < 200
        ORDER BY user_id, event_id""")),

    // Incremental dedup: a new batch admitted only where its content
    // fingerprint is unseen in history AND unique within the batch —
    // the per-increment form of llm_exact_dedup (dedup the delta, not
    // the corpus). One shuffle on the fingerprint; at scale history is
    // a bucketed fingerprint table and the anti-join runs
    // partition-local.
    QueryDef(
      "etl_incremental_dedup",
      (s, dir) => {
        val docs = Catalog.table(s, dir, "documents")
          .select(col("doc_id"), md5(col("text")).as("fp"))
        val history = docs.filter(col("doc_id") < 250)
        val batch = docs.filter(col("doc_id") >= 250)
        val w = Window.partitionBy("fp").orderBy("doc_id")
        batch
          .join(history.select("fp"), Seq("fp"), "left_anti")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select("doc_id", "fp")
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, md5(text) AS fp FROM documents),
        batch AS (SELECT * FROM d WHERE doc_id >= 250),
        hist AS (SELECT fp FROM d WHERE doc_id < 250)
        SELECT doc_id, fp FROM (
          SELECT doc_id, fp, row_number() OVER (PARTITION BY fp
            ORDER BY doc_id) AS rk
          FROM batch WHERE fp NOT IN (SELECT fp FROM hist))
        WHERE rk = 1 ORDER BY doc_id""")),

    // Corpus VERSION DIFF (round 10): classify every doc id across two
    // corpus versions as added / removed / changed / unchanged by
    // full-outer-joining the two versions' content fingerprints — the
    // dataset-release audit every training-data pipeline runs before
    // shipping v(N+1). v2 is derived deterministically from the fixture
    // (every 7th doc removed, the next class rewritten, the next class
    // re-added under a shifted id) so both engines diff identical
    // corpora. One sort-merge full-outer join on doc_id; at 100 TB both
    // versions are bucketed by doc_id and the join runs exchange-free.
    QueryDef(
      "etl_delta_corpus",
      (s, dir) => {
        val docs = Catalog.table(s, dir, "documents")
        val v1 = docs.select(col("doc_id"), md5(col("text")).as("fp1"))
        val v2 = docs.filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"),
            md5(when(col("doc_id") % 7 === 1, concat(col("text"), lit(" v2")))
              .otherwise(col("text"))).as("fp2"))
          .unionAll(docs.filter(col("doc_id") % 7 === 2)
            .select((col("doc_id") + 1000000L).as("doc_id"),
              md5(col("text")).as("fp2")))
        v1.join(v2, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            when(col("fp1").isNull, "added")
              .when(col("fp2").isNull, "removed")
              .when(col("fp1") =!= col("fp2"), "changed")
              .otherwise("unchanged").as("status"))
          .orderBy("doc_id")
      },
      Some("""WITH v1 AS (SELECT doc_id, md5(text) AS fp1 FROM documents),
        v2 AS (SELECT doc_id,
            md5(CASE WHEN doc_id % 7 = 1 THEN text || ' v2' ELSE text END)
              AS fp2
          FROM documents WHERE doc_id % 7 != 0
          UNION ALL
          SELECT doc_id + 1000000, md5(text) FROM documents
          WHERE doc_id % 7 = 2)
        SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
          CASE WHEN v1.fp1 IS NULL THEN 'added'
               WHEN v2.fp2 IS NULL THEN 'removed'
               WHEN v1.fp1 != v2.fp2 THEN 'changed'
               ELSE 'unchanged' END AS status
        FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        ORDER BY doc_id""")),

    // Time-series resample + gap fill: snap an irregular event stream
    // to a dense fixed-interval axis (hourly), averaging observations
    // per bucket and forward-filling buckets with no data — the
    // telemetry/metrics "materialize the regular grid" op. The dense
    // axis is generated PER KEY from that key's own [min,max] span
    // (sequence + explode), so axis size is span/granularity per key —
    // never a cross join with a global calendar — and the fill window
    // partitions on the high-cardinality key. One agg shuffle, one
    // equi-join on (key,bucket), one per-key window: every stage is
    // keyed on user_id and scales with the key count.
    QueryDef(
      "etl_resample_ffill",
      (s, dir) => {
        val ev = Catalog.table(s, dir, "events")
          .filter(col("user_id") < 20)
          .select(col("user_id"), date_trunc("hour", col("ts")).as("h"),
            col("value"))
        val hourly = ev.groupBy("user_id", "h")
          .agg(round(avg("value"), 4).as("v"))
        val axis = ev.groupBy("user_id")
          .agg(min("h").as("h0"), max("h").as("h1"))
          .select(col("user_id"),
            explode(sequence(col("h0"), col("h1"),
              expr("interval 1 hour"))).as("h"))
        val w = Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        axis.join(hourly, Seq("user_id", "h"), "left")
          .select(col("user_id"), col("h"), col("v"),
            last(col("v"), ignoreNulls = true).over(w).as("v_filled"),
            col("v").isNull.as("is_gap"))
          .orderBy("user_id", "h")
      },
      Some("""WITH ev AS (SELECT user_id, date_trunc('hour', ts) AS h, value
          FROM events WHERE user_id < 20),
        hourly AS (SELECT user_id, h, round(avg(value), 4) AS v
          FROM ev GROUP BY 1, 2),
        axis AS (SELECT user_id,
            unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
          FROM (SELECT user_id, min(h) AS h0, max(h) AS h1
                FROM ev GROUP BY 1))
        SELECT a.user_id, a.h, hv.v,
          last_value(hv.v IGNORE NULLS) OVER (
            PARTITION BY a.user_id ORDER BY a.h
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
          hv.v IS NULL AS is_gap
        FROM axis a LEFT JOIN hourly hv
          ON a.user_id = hv.user_id AND a.h = hv.h
        ORDER BY a.user_id, a.h""")),

    // Time-series linear interpolation: the resample grid again, but
    // gap buckets get the time-weighted blend of the surrounding
    // observations instead of a carried-forward copy — the sensor /
    // metrics "reconstruct the continuous signal" op. Four windowed
    // lookups (prev/next known hour and value) share ONE partition
    // spec each direction, so Catalyst evaluates them in two Window
    // nodes over the same user_id shuffle; the lerp itself is
    // row-local codegen'd arithmetic. Endpoints clamp to the nearest
    // known value (no extrapolation).
    QueryDef(
      "etl_interpolate",
      (s, dir) =>
        interpolateHourly(
          Catalog.table(s, dir, "events")
            .filter(col("user_id") < 20)
            .select(col("user_id"), col("ts"), col("value"))),
      Some("""WITH ev AS (SELECT user_id, date_trunc('hour', ts) AS h, value
          FROM events WHERE user_id < 20),
        hourly AS (SELECT user_id, h, round(avg(value), 4) AS v
          FROM ev GROUP BY 1, 2),
        axis AS (SELECT user_id,
            unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
          FROM (SELECT user_id, min(h) AS h0, max(h) AS h1
                FROM ev GROUP BY 1)),
        g AS (SELECT a.user_id, a.h, hv.v
          FROM axis a LEFT JOIN hourly hv
            ON a.user_id = hv.user_id AND a.h = hv.h),
        w AS (SELECT user_id, h, v,
          last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
            OVER wb AS ph,
          last_value(v IGNORE NULLS) OVER wb AS pv,
          first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
            OVER wf AS nh,
          first_value(v IGNORE NULLS) OVER wf AS nv
          FROM g
          WINDOW wb AS (PARTITION BY user_id ORDER BY h
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            wf AS (PARTITION BY user_id ORDER BY h
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT user_id, h, v,
          floor((CASE WHEN v IS NOT NULL THEN v
            WHEN pv IS NULL THEN nv
            WHEN nv IS NULL THEN pv
            ELSE pv + (nv - pv) * (epoch(h) - epoch(ph))
                   / (epoch(nh) - epoch(ph)) END) * 10000 + 0.5) / 10000
            AS v_interp,
          v IS NULL AS is_gap
        FROM w ORDER BY user_id, h""")),

    // Dead-letter routing: parse a JSON-lines feed where some records
    // are malformed, route parse failures to a dead-letter bucket
    // instead of killing the job, and account for every input row —
    // the ingestion-robustness pattern every production pipeline needs
    // (Spark's PERMISSIVE JSON mode; from_json returns NULL on
    // malformed input rather than throwing). The corrupt lines are
    // synthesized deterministically from the fixture (doc_id % 50) so
    // both engines parse the IDENTICAL byte stream — no staged file
    // for the oracle to miss. Row-local parse + one hash aggregate.
    QueryDef(
      "etl_dead_letter",
      (s, dir) => {
        val lines = Catalog.table(s, dir, "documents")
          .select(col("doc_id"),
            when(col("doc_id") % 50 === 0, lit("{broken"))
              .otherwise(concat(lit("{\"lang\": \""), col("lang"),
                lit("\"}"))).as("line"))
        lines
          .withColumn("j", from_json(col("line"),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("lang",
                org.apache.spark.sql.types.StringType)))))
          .groupBy(coalesce(col("j.lang"), lit("_dead_letter")).as("lang"))
          .agg(count(lit(1)).as("n"))
          .orderBy("lang")
      },
      Some("""WITH lines AS (SELECT doc_id,
            CASE WHEN doc_id % 50 = 0 THEN '{broken'
                 ELSE '{"lang": "' || lang || '"}' END AS line
          FROM documents)
        SELECT coalesce(CASE WHEN json_valid(line)
            THEN line->>'lang' END, '_dead_letter') AS lang,
          count(*) AS n
        FROM lines GROUP BY 1 ORDER BY 1""")),

    // Z-order layout key: interleave the bits of two dimension columns
    // into one space-filling-curve value — the multi-dimensional
    // data-layout technique behind Delta/Iceberg Z-ORDER clustering.
    // Sorting (repartitionByRange at write time) on z co-locates rows
    // close in BOTH dimensions, so min/max row-group stats prune scans
    // filtered on EITHER column — the 100 TB point of the op. The key
    // itself is pure row-local bit arithmetic (codegen'd, no shuffle);
    // this query materializes the curve order so the oracle can pin
    // the interleave bit-exactly. 8 bits per dimension here; the
    // construction widens mechanically.
    QueryDef(
      "layout_zorder",
      (s, dir) => {
        val x = pmod(col("l_partkey"), lit(256L))
        val y = pmod(col("l_suppkey"), lit(256L))
        val z = (0 until 8).map { i =>
          shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
            shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
        }.reduce(_ + _)
        Catalog.table(s, dir, "lineitem")
          .filter(col("l_orderkey") < 2000)
          .select(col("l_orderkey"), col("l_linenumber"),
            x.as("zx"), y.as("zy"), z.as("zkey"))
          .orderBy("zkey", "l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
          l_partkey % 256 AS zx, l_suppkey % 256 AS zy,
          (((l_partkey % 256) // 1) % 2) * 2
            + (((l_suppkey % 256) // 1) % 2) * 1
            + (((l_partkey % 256) // 2) % 2) * 8
            + (((l_suppkey % 256) // 2) % 2) * 4
            + (((l_partkey % 256) // 4) % 2) * 32
            + (((l_suppkey % 256) // 4) % 2) * 16
            + (((l_partkey % 256) // 8) % 2) * 128
            + (((l_suppkey % 256) // 8) % 2) * 64
            + (((l_partkey % 256) // 16) % 2) * 512
            + (((l_suppkey % 256) // 16) % 2) * 256
            + (((l_partkey % 256) // 32) % 2) * 2048
            + (((l_suppkey % 256) // 32) % 2) * 1024
            + (((l_partkey % 256) // 64) % 2) * 8192
            + (((l_suppkey % 256) // 64) % 2) * 4096
            + (((l_partkey % 256) // 128) % 2) * 32768
            + (((l_suppkey % 256) // 128) % 2) * 16384 AS zkey
        FROM lineitem WHERE l_orderkey < 2000
        ORDER BY zkey, l_orderkey, l_linenumber""")),

    // DATA EXPECTATION SUITE — the ingest-gate contract check (the
    // great-expectations shape): N declared rules evaluated in ONE
    // scan as conditional aggregates (never a scan per rule — at
    // 100 TB the rule count must not multiply the I/O), then the
    // 1-row aggregate exploded into a per-rule verdict table with a
    // violation-rate threshold. NULL in a value rule is NOT a
    // violation (the dedicated not-null rule owns nulls) — both
    // engines get that via identical CASE/when null semantics.
    QueryDef(
      "etl_expectations",
      (s, dir) => {
        val li = Catalog.table(s, dir, "lineitem")
        val agg = li.agg(
          count(lit(1)).as("n"),
          sum(when(!(col("l_quantity") >= 1 && col("l_quantity") <= 50),
            1L).otherwise(0L)).as("v_qty"),
          sum(when(!(col("l_extendedprice") > 0), 1L).otherwise(0L))
            .as("v_price"),
          sum(when(!(col("l_discount") <= 0.08), 1L).otherwise(0L))
            .as("v_disc"),
          sum(when(col("l_shipdate").isNull, 1L).otherwise(0L))
            .as("v_ship"))
        agg.select(explode(array(
            struct(lit("discount_le_008").as("rule"), col("n"),
              col("v_disc").as("v")),
            struct(lit("price_positive").as("rule"), col("n"),
              col("v_price").as("v")),
            struct(lit("quantity_in_1_50").as("rule"), col("n"),
              col("v_qty").as("v")),
            struct(lit("shipdate_not_null").as("rule"), col("n"),
              col("v_ship").as("v")))).as("r"))
          .select(col("r.rule").as("rule"), col("r.n").as("n_rows"),
            col("r.v").as("n_violations"),
            round(col("r.v").cast("double") / col("r.n"), 6)
              .as("viol_rate"),
            (col("r.v").cast("double") <= col("r.n") * 0.05).as("pass"))
          .orderBy("rule")
      },
      Some("""WITH a AS (SELECT count(*) AS n,
            CAST(sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50)
              THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
            CAST(sum(CASE WHEN NOT (l_extendedprice > 0)
              THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
            CAST(sum(CASE WHEN NOT (l_discount <= 0.08)
              THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
            CAST(sum(CASE WHEN l_shipdate IS NULL
              THEN 1 ELSE 0 END) AS BIGINT) AS v_ship
          FROM lineitem),
        r AS (
          SELECT 'discount_le_008' AS rule, n, v_disc AS v FROM a
          UNION ALL SELECT 'price_positive', n, v_price FROM a
          UNION ALL SELECT 'quantity_in_1_50', n, v_qty FROM a
          UNION ALL SELECT 'shipdate_not_null', n, v_ship FROM a)
        SELECT rule, n AS n_rows, v AS n_violations,
          round(v::DOUBLE / n, 6) AS viol_rate,
          v::DOUBLE <= n * 0.05 AS pass
        FROM r ORDER BY rule""")))

  /** Hourly resample + linear interpolation over (user_id, ts, value)
    * rows: dense per-key hour axis from each key's own [min,max] span,
    * per-bucket mean, gap buckets filled with the time-weighted blend
    * of the surrounding observations; endpoints clamp to the nearest
    * known value (no extrapolation). Four prev/next lookups share one
    * partition spec per frame direction, so Catalyst plans exactly two
    * Window nodes over a single user_id shuffle.
    *
    * floor(x*1e4 + 0.5)/1e4 instead of round(): both engines run the
    * IDENTICAL double ops on an identical lerp value, where round()'s
    * half-tie rule differs between them (HALF_UP vs
    * nearest-representable) and flaps the 4th decimal. */
  def interpolateHourly(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ev = events.select(col("user_id"),
      date_trunc("hour", col("ts")).as("h"), col("value"))
    val hourly = ev.groupBy("user_id", "h")
      .agg(round(avg("value"), 4).as("v"))
    val axis = ev.groupBy("user_id")
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("h"))
    val wb = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val knownH = when(col("v").isNotNull, col("h"))
    val sec = (c: org.apache.spark.sql.Column) =>
      unix_timestamp(c).cast("double")
    axis.join(hourly, Seq("user_id", "h"), "left")
      .withColumn("ph", last(knownH, ignoreNulls = true).over(wb))
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wb))
      .withColumn("nh", first(knownH, ignoreNulls = true).over(wf))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wf))
      .select(col("user_id"), col("h"), col("v"),
        (floor(
          when(col("v").isNotNull, col("v"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              (sec(col("h")) - sec(col("ph"))) /
              (sec(col("nh")) - sec(col("ph")))) * 10000 + 0.5) /
          10000).as("v_interp"),
        col("v").isNull.as("is_gap"))
      .orderBy("user_id", "h")
  }
}
