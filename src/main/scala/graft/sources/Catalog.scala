package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Table catalog over the driver-generated parquet fixtures.
  *
  * Mirrors the reference's Container/Table notion (jx_base/container.py:
  * a named queryable collection with discovered schema — SURVEY.md §1.1)
  * as a thin name→DataFrame resolver. Schema discovery is Parquet
  * footer metadata (no inference cost); at 100 TB the same API would be
  * backed by a real metastore/Delta catalog, and the per-table reader
  * keeps predicate pushdown + column pruning available to Catalyst.
  */
object Catalog {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one fixture table rooted at sfDir.
    *
    * events.parquet carries TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects; sessions set spark.sql.legacy.parquet.nanosAsLong
    * so it arrives as nanos-since-epoch LongType, and we restore a
    * proper TimestampType here (integer DIV — nanos exceed 2^53, so
    * double math would corrupt them). DuckDB truncates ns→µs the same
    * way, keeping the oracle comparable.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "orders_nested") return ordersNested(spark, sfDir)
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" &&
        df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  /** Derived snowflake view: orders with its lineitem children nested
    * as an array<struct> `lines` column — the jx_sqlite parent/child
    * table shape (SURVEY §1.1) the dotted-`from` descent targets. Built
    * on the fly from the flat fixtures with one shuffle on the parent
    * key; at 100 TB this would be a materialized nested parquet and the
    * descent reads it shuffle-free. Line order inside an array is
    * execution-dependent — nested consumers must aggregate or re-sort,
    * never rely on element order (same contract as any collect_list).
    */
  private def ordersNested(spark: SparkSession, sfDir: String): DataFrame = {
    val lines = table(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(collect_list(struct(
        col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))).as("lines"))
    table(spark, sfDir, "orders")
      .join(lines, col("o_orderkey") === col("l_orderkey"), "left")
      .drop("l_orderkey")
  }

  /** Register every fixture table as a temp view (for spark.sql parity). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
