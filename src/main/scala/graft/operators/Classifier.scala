package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained quality classification — the fastText-style gate real
  * web-corpus pipelines run after heuristic filters: learn a linear
  * separator over cheap per-doc features, score every document.
  *
  * The trainer is a FULL-BATCH PERCEPTRON built to be exactly
  * reproducible cross-engine, the same discipline as the PQ/kmeans
  * trainers: integer (centered) features, so each round's gradient is
  * an INTEGER sum — exact under any aggregation order — and the only
  * floating-point steps are divisions by round constants and a
  * fixed-association dot product, which IEEE 754 pins bit-identically
  * on any engine. No exp/log (a logistic loss would drag libm
  * differences into the hash), no RNG, no rounding tricks needed.
  *
  * Scale shape: each round is ONE slim aggregate over a 4-column
  * long projection (map-side partial sums, 32-byte rows); the model
  * state crossing the driver is 4 doubles per round — the same
  * bounded-metadata class as AQE statistics. At 100 TB: R passes over
  * a checkpointed slim projection, nothing else.
  */
object Classifier {

  /** Train R full-batch perceptron rounds on centered integer
    * features of `textCol`, return per-doc (label, pred, margin).
    * Label (the training signal a real pipeline would take from
    * human/LLM annotations): 2*cap(len) + 5*distinct_tokens >= 735.
    */
  def perceptronQuality(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int = 4): DataFrame = {
    val toks = split(col(textCol), " ")
    val feats = docs.select(col(idCol).as("doc_id"),
      (least(length(col(textCol)), lit(1000)) - 300).cast("long").as("f1"),
      (size(toks) - 60).cast("long").as("f2"),
      (size(array_distinct(toks)) - 25).cast("long").as("f3"),
      when(least(length(col(textCol)), lit(1000)) * 2
          + size(array_distinct(toks)) * 5 >= 735, 1L)
        .otherwise(0L).as("y"))
      // slim 4-long projection: this is what the R training passes
      // re-read, not the corpus
      .localCheckpoint()
    val n = feats.count()
    require(n > 0, "perceptronQuality: empty corpus")
    var w = Array(0.0, 0.0, 0.0, 0.0)
    // fixed association: ((w0 + w1*f1) + w2*f2) + w3*f3 — the oracle
    // writes the same shape, so the doubles agree bit-for-bit
    def margin = lit(w(0)) + lit(w(1)) * col("f1") +
      lit(w(2)) * col("f2") + lit(w(3)) * col("f3")
    (1 to rounds).foreach { _ =>
      val d = col("y") - when(margin >= 0, 1L).otherwise(0L)
      val row = feats.agg(sum(d), sum(d * col("f1")),
        sum(d * col("f2")), sum(d * col("f3"))).head()
      w = Array.tabulate(4)(j => w(j) + row.getLong(j) / (1000.0 * n))
    }
    feats.select(col("doc_id"), col("y").cast("int").as("label"),
      when(margin >= 0, 1).otherwise(0).as("pred"),
      round(margin, 6).as("margin"))
  }
}
