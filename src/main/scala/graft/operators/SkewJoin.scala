package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §4.2 "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join handles most skew by splitting oversized partitions,
  * but it only fires on sort-merge joins and after a shuffle has
  * already materialized the skew. Salting removes the hot-partition
  * problem structurally: every row of the big side gets a salt in
  * [0, nSalts), the small side is replicated nSalts times, and the join
  * key becomes (key, salt) — a single hot key now spreads over nSalts
  * reducers. Cost: small side inflated ×nSalts (keep it broadcast-size
  * ÷ nSalts). Result is row-identical to the plain inner join, which is
  * how the driver oracle proves it.
  */
object SkewJoin {

  /** Inner equi-join of `big ⋈ small` on `bigKey = smallKey`, salted
    * `nSalts` ways. The salt is derived from a row id, not the key —
    * rows sharing a hot key land on different reducers by construction.
    */
  def saltedInnerJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, nSalts: Int): DataFrame = {
    require(nSalts > 0)
    val saltedBig = big.withColumn(
      "__salt", pmod(monotonically_increasing_id(), lit(nSalts.toLong)))
    val replicatedSmall = small.withColumn(
      "__salt", explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    saltedBig
      .join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
          saltedBig("__salt") === replicatedSmall("__salt"),
        "inner")
      .drop("__salt")
  }
}
