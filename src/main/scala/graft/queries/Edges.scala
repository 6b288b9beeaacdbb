package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryModule}
import graft.sources.Catalog

/** SURVEY.md §2.5 — JX `edges`: grouping over a DENSE domain.
  *
  * Every domain part appears in the output even with zero matching rows,
  * and rows matching no part fall into a NULL overflow part (reference
  * jx_base/domains.py per SURVEY §2.5 [P]). Spark pattern: build the
  * domain as its own (tiny) DataFrame — literal, sequence(), or derived
  * from data bounds — LEFT JOIN the grouped counts onto it (broadcast:
  * the domain is bounded by construction), coalesce missing counts to 0,
  * and union the overflow part. At 100 TB the expensive side (the fact
  * groupBy) is one shuffle; the dense-domain join adds no shuffle at all
  * because the domain broadcasts.
  */
object Edges extends QueryModule {

  /** domain LEFT JOIN counts → zero-filled dense parts. */
  private def dense(domain: DataFrame, counts: DataFrame, key: String): DataFrame =
    domain.join(counts, Seq(key), "left")
      .select(col(key), coalesce(col("n"), lit(0L)).as("n"))

  def defs: Seq[QueryDef] = Seq(

    // Distinct-values domain given explicitly; AEROSPACE has no rows
    // (zero part) and the two segments outside the domain roll into the
    // NULL overflow part.
    QueryDef(
      "edge_default",
      (s, dir) => {
        import s.implicits._
        val domain = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "AEROSPACE")
          .toDF("part")
        val cust = Catalog.table(s, dir, "customer")
        val counts = cust.groupBy(col("c_mktsegment").as("part"))
          .agg(count(lit(1)).as("n"))
        val overflow = cust
          .filter(!col("c_mktsegment").isin("AUTOMOBILE", "BUILDING", "FURNITURE", "AEROSPACE"))
          .agg(count(lit(1)).as("n"))
          .select(lit(null).cast("string").as("part"), col("n"))
        dense(domain, counts, "part").unionByName(overflow)
          .orderBy(asc_nulls_first("part"))
      },
      Some("""WITH domain(part) AS (VALUES ('AUTOMOBILE'), ('BUILDING'), ('FURNITURE'), ('AEROSPACE')),
        counts AS (SELECT c_mktsegment AS part, count(*) AS n FROM customer GROUP BY 1)
        SELECT d.part, coalesce(c.n, 0) AS n FROM domain d LEFT JOIN counts c ON d.part = c.part
        UNION ALL
        SELECT NULL AS part, count(*) AS n FROM customer
          WHERE c_mktsegment NOT IN ('AUTOMOBILE', 'BUILDING', 'FURNITURE', 'AEROSPACE')
        ORDER BY part NULLS FIRST""")),

    // Numeric range domain {min,max,interval} — sequence() + explode
    // generates the dense bucket table; floor(v/1000)*1000 assigns rows.
    QueryDef(
      "edge_range",
      (s, dir) => {
        val domain = s.range(1)
          .select(explode(sequence(lit(-1000L), lit(9000L), lit(1000L))).as("lo"))
        val counts = Catalog.table(s, dir, "customer")
          .groupBy((floor(col("c_acctbal") / 1000) * 1000).as("lo"))
          .agg(count(lit(1)).as("n"))
        dense(domain, counts, "lo").orderBy("lo")
      },
      Some("""WITH domain AS (SELECT unnest(generate_series(-1000, 9000, 1000)) AS lo),
        counts AS (SELECT CAST(floor(c_acctbal / 1000) AS BIGINT) * 1000 AS lo, count(*) AS n
          FROM customer GROUP BY 1)
        SELECT d.lo, coalesce(c.n, 0) AS n FROM domain d LEFT JOIN counts c ON d.lo = c.lo
        ORDER BY d.lo""")),

    // Calendar-bucket domain derived from the data's own [min, max] day
    // bounds — every day present even with zero events.
    QueryDef(
      "edge_time",
      (s, dir) => {
        val ev = Catalog.table(s, dir, "events")
        val domain = ev
          .agg(
            date_trunc("day", min(col("ts"))).as("lo"),
            date_trunc("day", max(col("ts"))).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"),
            expr("INTERVAL 1 DAY"))).as("day"))
        val counts = ev.groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        dense(domain, counts, "day").orderBy("day")
      },
      Some("""WITH b AS (SELECT date_trunc('day', min(ts)) AS lo, date_trunc('day', max(ts)) AS hi FROM events),
        domain AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM b),
        counts AS (SELECT date_trunc('day', ts) AS day, count(*) AS n FROM events GROUP BY 1)
        SELECT d.day, coalesce(c.n, 0) AS n FROM domain d LEFT JOIN counts c ON d.day = c.day
        ORDER BY d.day""")),

    // Explicit set-of-partitions domain: named where-clauses; `dead` is
    // an always-empty part (stays at 0), unmatched rows → NULL part.
    QueryDef(
      "edge_set",
      (s, dir) => {
        import s.implicits._
        val domain = Seq("urgent", "high", "dead").toDF("part")
        val orders = Catalog.table(s, dir, "orders")
        val bucketed = orders.withColumn("part",
          when(col("o_orderpriority") === "1-URGENT", "urgent")
            .when(col("o_orderpriority") === "2-HIGH", "high")
            .when(col("o_totalprice") < 0, "dead"))
        val counts = bucketed.filter(col("part").isNotNull)
          .groupBy("part").agg(count(lit(1)).as("n"))
        val overflow = bucketed.filter(col("part").isNull)
          .agg(count(lit(1)).as("n"))
          .select(lit(null).cast("string").as("part"), col("n"))
        dense(domain, counts, "part").unionByName(overflow)
          .orderBy(asc_nulls_first("part"))
      },
      Some("""WITH domain(part) AS (VALUES ('urgent'), ('high'), ('dead')),
        bucketed AS (SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent'
                                 WHEN o_orderpriority = '2-HIGH' THEN 'high'
                                 WHEN o_totalprice < 0 THEN 'dead' END AS part
          FROM orders),
        counts AS (SELECT part, count(*) AS n FROM bucketed WHERE part IS NOT NULL GROUP BY 1)
        SELECT d.part, coalesce(c.n, 0) AS n FROM domain d LEFT JOIN counts c ON d.part = c.part
        UNION ALL
        SELECT NULL AS part, count(*) AS n FROM bucketed WHERE part IS NULL
        ORDER BY part NULLS FIRST""")))
}
