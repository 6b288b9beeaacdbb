package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

class ClassifierSpec extends SparkSpec {

  test("perceptron converges to a real separator on the fixture") {
    val out = Classifier.perceptronQuality(
      graft.sources.Catalog.table(spark, sf0001, "documents"),
      "doc_id", "text").cache()
    val n = out.count()
    val acc = out.filter(col("pred") === col("label")).count().toDouble / n
    val pos = out.filter(col("pred") === 1).count()
    // non-degenerate: both classes predicted; accuracy floor pinned
    assert(acc >= 0.95, s"accuracy $acc")
    assert(pos > n / 4 && pos < 3 * n / 4, s"degenerate predictions: $pos/$n")
    out.unpersist()
  }

  test("training is deterministic: two runs agree exactly") {
    val docs = graft.sources.Catalog.table(spark, sf0001, "documents")
    val a = Classifier.perceptronQuality(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val b = Classifier.perceptronQuality(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("margins order documents by separator distance, rounded") {
    val out = Classifier.perceptronQuality(
      graft.sources.Catalog.table(spark, sf0001, "documents"),
      "doc_id", "text")
    // every positive prediction has margin >= 0 and vice versa — the
    // emitted margin is the decision value itself
    assert(out.filter((col("pred") === 1) =!= (col("margin") >= 0))
      .count() == 0)
  }
}
