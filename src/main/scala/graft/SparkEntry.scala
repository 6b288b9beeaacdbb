package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every declared capability (SURVEY.md §2) from the query
  * modules under graft.queries; each module row is a QueryDef carrying
  * both the Spark implementation and (where SQL-expressible) the DuckDB
  * oracle SQL the driver hash-compares against.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    q.Sources, q.Relational, q.Aggregates, q.Scalars, q.Joins, q.Edges,
    q.Windows, q.Llm, q.Graph, q.StreamingBatch, q.Extensions)

  private lazy val all: Seq[QueryDef] = {
    val ds = modules.flatMap(_.defs)
    val dup = ds.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query ids: ${dup.mkString(",")}")
    ds
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q.Aggregates.q1.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
