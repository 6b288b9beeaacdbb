package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Read one fixture table rooted at sfDir. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every fixture table as a temp view (for spark.sql parity). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
