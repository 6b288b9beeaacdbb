package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenization (BERT's runtime algorithm): greedy
  * LONGEST-MATCH-FIRST segmentation of each word against a
  * word-initial vocab and a `##`-continuation vocab; a word any
  * position of which cannot be matched collapses to a single [UNK].
  *
  * The production path is the native kernel expression
  * (graft.plans.WordPieceExpr — codegen'd monomorphic loop, stable
  * ×100 wall); the `aggregate`-HOF formulation below is KEPT as the
  * declarative reference implementation, and a differential spec
  * pins kernel == HOF on the fixture corpus. (History: a
  * plan-unrolled step chain blew the optimizer up exponentially via
  * constraint propagation; the HOF fixed the plan but is
  * CodegenFallback — interpreted, with bimodal 25-104 s ×100 walls
  * on JIT/GC mode luck — hence the kernel.)
  *
  * The companion BPE pair (llm_bpe_train/apply) covers merge-based
  * training; this is the deployment-side greedy segmenter, declared
  * with a fixed vocab the oracle shares.
  */
object WordPiece {

  /** Demo vocab over the fixture alphabet: every single letter in
    * both tables (so the fixture corpus never UNKs; the UNK path is
    * spec-pinned with crafted words) plus multi-char pieces that
    * actually win the longest-match race on common corpus words. */
  val initVocab: Seq[String] = graft.plans.WordPieceExpr.initVocab
  /** Continuation pieces, stored WITHOUT the ## prefix. */
  val contVocab: Seq[String] = graft.plans.WordPieceExpr.contVocab

  private def byLen(v: Seq[String]): Seq[(Int, Seq[String])] =
    v.groupBy(_.length).toSeq.sortBy(-_._1)

  /** Length of the longest vocab piece matching `word` at 0-based
    * `off`, or NULL — a coalesce over longest-first membership tests,
    * all against literal arrays (codegen'd hash-set lookups). */
  private def matchLen(word: Column, off: Column,
      vocab: Seq[String]): Column = {
    val whens = byLen(vocab).map { case (l, pieces) =>
      when(off + l <= length(word) &&
        word.substr(off + 1, lit(l)).isin(pieces: _*), lit(l))
    }
    coalesce(whens: _*)
  }

  /** Segment one word: the greedy walk runs as an `aggregate`
    * higher-order function over character positions with an
    * (offset, pieces, failed) accumulator struct — RUNTIME iteration,
    * one copy of the match cascade in the plan. (A plan-unrolled
    * step chain was tried first and blew the optimizer up
    * exponentially through constraint propagation over the chained
    * CASE columns; the HOF form is both the fix and the more
    * Spark-idiomatic shape: still pure codegen'd expressions, no UDF.)
    * Positions that are not the current offset pass the accumulator
    * through; boundary positions consume the longest matching piece
    * or mark the word failed ([UNK] consumes the rest). */
  def piecesHof(word: Column): Column = {
    val unk = "[UNK]"
    val init = struct(lit(0).as("off"),
      array().cast("array<string>").as("ps"), lit(false).as("failed"))
    aggregate(
      sequence(lit(1), greatest(length(word), lit(1))),
      init,
      (acc, i) => {
        val off = acc.getField("off")
        val ps = acc.getField("ps")
        val failed = acc.getField("failed")
        val atBoundary = !failed && off === (i - 1) && off < length(word)
        val ml = when(off === 0, matchLen(word, off, initVocab))
          .otherwise(matchLen(word, off, contVocab))
        val piece = concat(
          when(off === 0, lit("")).otherwise(lit("##")),
          word.substr(off + 1, ml))
        when(!atBoundary, acc)
          .when(ml.isNull, struct(length(word).as("off"), ps.as("ps"),
            lit(true).as("failed")))
          .otherwise(struct((off + ml).as("off"),
            concat(ps, array(piece)).as("ps"), failed.as("failed")))
      },
      s => when(s.getField("failed"), array(lit(unk)))
        // loud completeness guard (assert_true is NULL when satisfied):
        // the walk visits every position, so a word can only be left
        // unconsumed if the invariant itself breaks
        .otherwise(when(
          assert_true(s.getField("off") >= length(word)).isNull,
          s.getField("ps"))))
  }

  /** Reference implementation on the HOF walk — differentially
    * pinned against the kernel path in WordPieceSpec. */
  def tokenizeHof(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("word_ord", "word")))
      .select(col("doc_id"), col("word_ord"), col("word"),
        posexplode(piecesHof(col("word")))
          .as(Seq("piece_ord", "piece")))

  /** Production path — the native kernel expression: one codegen'd
    * monomorphic loop per word, inside whole-stage codegen. One row
    * per (doc, word ordinal, piece ordinal, piece). */
  def tokenize(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("word_ord", "word")))
      .select(col("doc_id"), col("word_ord"), col("word"),
        posexplode(graft.plans.WordPieceExpr.pieces(col("word")))
          .as(Seq("piece_ord", "piece")))
}
