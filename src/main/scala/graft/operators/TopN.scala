package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-N-per-group for LOW-cardinality grouping keys (SURVEY.md §2.6).
  *
  * A plain `row_number() OVER (PARTITION BY key ...)` with a 3-value key
  * sorts the whole table through 3 reducers — 3 busy cores out of 32
  * locally, 3 executors out of 1000 at 100 TB. The fix is the classic
  * two-phase pattern:
  *
  *   Phase 1 — salt each row into one of `salt` sub-buckets per key and
  *   take a LOCAL top-N inside each (key, salt) bucket. That shuffle has
  *   key×salt partitions (parallel), and its output is ≤ salt×N rows per
  *   key — a superset of the global top-N, because any row in the global
  *   top-N by a total order is also in the top-N of whichever bucket it
  *   landed in.
  *
  *   Phase 2 — exact window over the tiny candidate set (≤ salt×N rows
  *   per key) to assign final ranks.
  *
  * For `rank`/`dense_rank` the phase-1 filter keeps every row whose
  * DENSE rank within its bucket is ≤ n: a value in the global top-n
  * distinct values has ≤ n-1 distinct greater values in ANY subset, so
  * all of its tied rows survive phase 1 — which is exactly what rank's
  * tie-counting needs in phase 2.
  *
  * The salt is derived from monotonically_increasing_id (cycles within a
  * scan partition), so buckets fill evenly even when the input is a
  * single parquet split; phase 2 recomputes ranks exactly, so the salt
  * assignment does not need to be reproducible across runs.
  */
object TopN {

  private val SaltCol = "__graft_salt"

  private def salted(df: DataFrame, salt: Int): DataFrame =
    df.withColumn(SaltCol, pmod(monotonically_increasing_id(), lit(salt.toLong)))

  /** Global top-N rows per key by `order` (row_number semantics; give
    * `order` a unique tiebreak for determinism). Appends `rankCol`. */
  def saltedRowNumber(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      n: Int, rankCol: String, salt: Int = 32): DataFrame = {
    val local = Window.partitionBy((keys :+ col(SaltCol)): _*).orderBy(order: _*)
    val global = Window.partitionBy(keys: _*).orderBy(order: _*)
    salted(df, salt)
      .withColumn(rankCol, row_number().over(local))
      .filter(col(rankCol) <= n)
      .withColumn(rankCol, row_number().over(global))
      .filter(col(rankCol) <= n)
      .drop(SaltCol)
  }

  /** Exact GLOBAL row_number over `order` WITHOUT the single-reducer
    * sort a bare `row_number().over(Window.orderBy(...))` plans — that
    * shape funnels the whole input through one task, the classic
    * 100 TB scale-killer this library's own PlanAudit warns on.
    *
    * Two-phase construction, fully deterministic (no sampling, no
    * spark_partition_id — both halves of the plan recompute the SAME
    * bucket assignment, which sampled range partitioning cannot
    * promise across re-evaluations):
    *
    *   Phase 1 — `bucketOf` coarsens the order into a BOUNDED set of
    *   buckets (caller contract: bucket values must be monotone
    *   non-decreasing along `order`, e.g. `-floor(score * 8)` for a
    *   `desc(score)` order; ties in the order share a bucket
    *   automatically when the bucket derives from the order key
    *   alone). A count aggregate per bucket — map-side combinable,
    *   bucket-count rows total — is collected and turned into exact
    *   integer rank OFFSETS (rows in all strictly-earlier buckets).
    *
    *   Phase 2 — row_number PARTITIONED by bucket (parallel across
    *   buckets) plus the broadcast-literal offset = the exact global
    *   rank.
    *
    * The driver-side collect is bounded by the bucket count (hundreds
    * for any sane granularity — same bounded-metadata class as AQE's
    * own shuffle statistics), never by the data. Skew caveat: rows
    * sharing one bucket value serialize through that bucket's window
    * task; pick `bucketOf` granularity so no single bucket holds a
    * memory-breaking share (a wider score histogram = more parallel
    * buckets).
    *
    * Returns (input + rankCol, total row count) — the total falls out
    * of phase 1 for free, so callers needing rank arithmetic against n
    * (tercile cuts, top-p fractions) skip a separate count job. */
  def bucketedGlobalRank(df: DataFrame, bucketOf: Column,
      order: Seq[Column], rankCol: String): (DataFrame, Long) = {
    val BktCol = "__graft_bkt"
    val b = df.withColumn(BktCol, bucketOf.cast("long"))
    val counts = b.groupBy(BktCol)
      .agg(count(lit(1)).as("cnt"))
      .orderBy(BktCol)
      .collect()
    var running = 0L
    val offsets = counts.map { r =>
      // enforce the bucketOf contract loudly: a null bucket (null score
      // reaching floor(), a missing column) would otherwise surface as
      // an opaque NPE here or as silently-null ranks after the join.
      // NaN scores are the caller's to filter — NaN casts to 0L and
      // cannot be told apart from a real bucket at this point.
      require(!r.isNullAt(0),
        "bucketedGlobalRank: bucketOf produced NULL — every row must " +
          "map to a non-null bucket (filter null scores first)")
      val o = running; running += r.getLong(1); (r.getLong(0), o)
    }.toMap
    val w = Window.partitionBy(BktCol).orderBy(order: _*)
    // Phase 2 re-evaluates the input plan; a non-deterministic input
    // could surface a bucket phase 1 never counted, and a silent
    // element_at NULL would propagate into downstream rank arithmetic
    // (tercile cuts, top-p fractions) as quietly-wrong answers. Fail
    // loudly at the first such row instead.
    val offset = element_at(typedLit(offsets), col(BktCol))
    val loudOffset = when(offset.isNull, raise_error(concat(
      lit("bucketedGlobalRank: bucket "), col(BktCol).cast("string"),
      lit(" was not seen in the phase-1 count — the input plan is not " +
        "re-evaluation-deterministic; localCheckpoint it first"))))
      .otherwise(offset)
    val ranked = b
      .withColumn(rankCol, loudOffset + row_number().over(w))
      .drop(BktCol)
    (ranked, running)
  }

  /** All rows whose dense_rank per key is ≤ n, with exact `rank` and
    * `dense_rank` columns appended (ties preserved). */
  def saltedDenseRank(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      n: Int, rankCol: String, denseRankCol: String,
      salt: Int = 32): DataFrame = {
    val local = Window.partitionBy((keys :+ col(SaltCol)): _*).orderBy(order: _*)
    val global = Window.partitionBy(keys: _*).orderBy(order: _*)
    salted(df, salt)
      .withColumn(denseRankCol, dense_rank().over(local))
      .filter(col(denseRankCol) <= n)
      .withColumn(rankCol, rank().over(global))
      .withColumn(denseRankCol, dense_rank().over(global))
      .filter(col(denseRankCol) <= n)
      .drop(SaltCol)
  }
}
