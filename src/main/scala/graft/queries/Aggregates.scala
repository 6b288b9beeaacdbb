package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryModule}
import graft.sources.Catalog

/** SURVEY.md §2.4 — aggregations.
  *
  * JX aggregates (`select: {value, aggregate}` + `groupby`; reference
  * jx_base/expressions, per SURVEY.md §2.4 [P]) lowered to Spark's
  * hash aggregate. Partial (map-side) aggregation + whole-stage codegen
  * come free from declaring with groupBy/agg; at 100 TB the only knob
  * that matters is the shuffle partition count and key skew, both
  * handled by AQE.
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

  def defs: Seq[QueryDef] = Seq(q1)
}
