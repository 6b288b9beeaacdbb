package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryModule}
import graft.sources.Catalog

/** SURVEY.md §2.1 — scans and sinks.
  *
  * scan_parquet is the engine's default path (every other query uses
  * it); jsonl/csv are proven by round-trip: fixture → format → read
  * back → aggregate must hash-match the oracle computed on the
  * original parquet. sink_parquet exercises partitioned idempotent
  * overwrite — the reference's keyed re-ETL semantics (SURVEY §2.1 [P]).
  */
object Sources extends QueryModule {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "scan_parquet",
      (s, dir) =>
        Catalog.table(s, dir, "region")
          .select("r_regionkey", "r_name")
          .orderBy("r_regionkey"),
      Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")),

    // JSONL with schema inference: documents → ndjson → spark.read.json.
    QueryDef(
      "scan_jsonl",
      (s, dir) => {
        val out = tmp("graft-jsonl")
        Catalog.table(s, dir, "documents")
          .write.mode("overwrite").json(out)
        s.read.json(out)
          .groupBy("lang")
          .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
          .orderBy("lang")
      },
      // CAST: DuckDB sum(INT) is HUGEINT; Spark sum over the JSON-inferred
      // long column is LongType.
      Some("""SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents GROUP BY lang ORDER BY lang""")),

    QueryDef(
      "scan_csv",
      (s, dir) => {
        val out = tmp("graft-csv")
        Catalog.table(s, dir, "customer")
          .write.mode("overwrite").option("header", "true").csv(out)
        s.read.option("header", "true").option("inferSchema", "true").csv(out)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Partitioned write, idempotent overwrite by key: write twice with
    // dynamic partition overwrite; the re-run must leave identical
    // contents (reference re-ETL idempotence), proven by the oracle
    // matching the original table.
    QueryDef(
      "sink_parquet",
      (s, dir) => {
        val out = tmp("graft-sink")
        def writeOnce(): Unit =
          Catalog.table(s, dir, "orders")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("o_orderstatus")
            .parquet(out)
        writeOnce(); writeOnce()
        s.read.parquet(out)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")))
}
