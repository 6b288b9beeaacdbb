package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared capability from SURVEY.md §2.
  *
  * @param name   opId (key into SparkEntry.queries)
  * @param fn     Spark-side implementation; sfDir is the fixture root
  * @param oracle equivalent DuckDB SQL over the same parquet tables
  *               (None = `no-sql`: driver records a weaker rows-only check)
  *
  * Determinism contract (SURVEY.md §7.5): every oracle-backed query ends
  * with a total-order sort, double-valued aggregates are rounded to the
  * same digit count on both sides, sets are sorted, arrays rendered to
  * strings where hashing would be ambiguous.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def defs: Seq[QueryDef]
}
