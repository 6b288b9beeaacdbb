package graft

import org.apache.spark.sql.functions._
import graft.operators.WordPiece

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def tok(words: String*): Map[String, Seq[String]] = {
    val df = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    WordPiece.tokenize(df, "doc_id", "text")
      .orderBy("doc_id", "word_ord", "piece_ord")
      .collect()
      .groupBy(_.getString(2))
      .map { case (w, rows) => w -> rows.map(_.getString(4)).toSeq }
  }

  test("greedy longest-match-first, continuation prefixes applied") {
    val t = tok("scan", "batch", "customer", "table", "value")
    assert(t("scan") == Seq("sc", "##an")) // 'sc' beats 's'
    assert(t("batch") == Seq("ba", "##tch"))
    assert(t("customer") == Seq("cu", "##stomer")) // 6-char continuation
    assert(t("table") == Seq("tab", "##l", "##e")) // singles fallback
    assert(t("value") == Seq("val", "##ue"))
  }

  test("a word with any unmatchable position collapses to one [UNK]") {
    val t = tok("x9y", "9", "ok")
    assert(t("x9y") == Seq("[UNK]")) // fails at position 1, whole word
    assert(t("9") == Seq("[UNK]"))
    assert(t("ok") == Seq("o", "##k"))
  }

  test("native kernel and HOF reference implementations agree exactly") {
    val docs = graft.sources.Catalog.table(spark, sf0001, "documents")
      .filter(col("doc_id") < 80)
    val kernel = WordPiece.tokenize(docs, "doc_id", "text")
      .orderBy("doc_id", "word_ord", "piece_ord").collect()
    val hof = WordPiece.tokenizeHof(docs, "doc_id", "text")
      .orderBy("doc_id", "word_ord", "piece_ord").collect()
    assert(kernel.length == hof.length)
    assert(kernel.sameElements(hof))
  }

  test("piece sequences reassemble the word exactly when not [UNK]") {
    val docs = graft.sources.Catalog.table(spark, sf0001, "documents")
      .filter(col("doc_id") < 50)
    val bad = WordPiece.tokenize(docs, "doc_id", "text")
      .groupBy("doc_id", "word_ord", "word")
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("piece_ord"), col("piece")))),
        _.getField("piece"))).as("joined"))
      .filter(col("joined") =!= lit("[UNK]") &&
        regexp_replace(col("joined"), "##", "") =!= col("word"))
    assert(bad.count() == 0)
  }
}
