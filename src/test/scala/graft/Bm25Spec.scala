package graft

import org.apache.spark.sql.DataFrame
import graft.sources.Catalog

/** The MaxScore path's contract is EXACTNESS: identical rows to the
  * full-probe bm25TopKQueries for every (corpus, queries, k, prefixR).
  * These tests pin that differentially — including configurations
  * where the pruned path engages (non-vacuous) and where the bound
  * fails and the per-query fallback routes — plus the bound
  * diagnostics themselves.
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Double)] =
    df.select("qid", "rk", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

  private def queriesOf(corpus: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    corpus.filter(col("doc_id") < n)
      .select(col("doc_id").as("qid"),
        explode(array_distinct(
          slice(graft.operators.TextOps.tokens(col("text")), 1, 5))).as("qw"))
  }

  test("maxscore == exact on the fixture corpus across prefixR settings") {
    val corpus = Catalog.table(spark, sf0001, "documents")
    val qs = queriesOf(corpus, 3)
    val exact = rows(graft.queries.Llm.bm25TopKQueries(corpus, qs, 5))
    assert(exact.nonEmpty)
    // tiny prefix (bound mostly fails -> fallback), mid (mixed), and
    // prefix >= every df (tails empty, Delta=0 -> all prunable)
    for (r <- Seq(2, 16, 100000)) {
      val ms = rows(
        graft.queries.Llm.bm25TopKMaxScoreQueries(corpus, qs, 5, r))
      assert(ms == exact, s"prefixR=$r diverged from the exact probe")
    }
  }

  test("crafted decaying-impact corpus: pruned path engages and is exact") {
    // doc 0 repeats both query terms (high tf -> dominant impacts);
    // the tail docs carry tf=1 with long filler (low impacts). With
    // k=1 and prefixR=2, theta ~ doc 0's partial and Delta = two tiny
    // tail impacts -> the bound holds and the query prunes.
    val filler = (1 to 30).map(i => s"filler$i").mkString(" ")
    val docs = (
      (0L, "apple apple apple apple banana banana banana") +:
      (1L to 40L).map(i => (i, s"apple banana $filler pad$i"))
    ).toDF("doc_id", "text")
    val qs = Seq((0L, "apple"), (0L, "banana")).toDF("qid", "qw")
    val exact = rows(graft.queries.Llm.bm25TopKQueries(docs, qs, 1))
    val (res, qstat) =
      graft.queries.Llm.bm25MaxScoreParts(docs, qs, 1, 2)
    assert(rows(res) == exact)
    val stat = qstat.select("qid", "prunable")
      .as[(Long, Boolean)].collect().toMap
    assert(stat(0L), "the decaying-impact query must take the pruned path")
    assert(exact.head._3 == 0L, "doc 0 is the unambiguous top hit")
  }

  test("flat-impact corpus: bound fails, fallback routes, still exact") {
    // every doc has identical (tf, dl) -> every impact equals the
    // tail impact, so Delta >= theta and the query MUST fall back.
    val docs = (0L to 30L).map(i => (i, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val qs = Seq((7L, "alpha"), (7L, "beta")).toDF("qid", "qw")
    val exact = rows(graft.queries.Llm.bm25TopKQueries(docs, qs, 3))
    val (res, qstat) =
      graft.queries.Llm.bm25MaxScoreParts(docs, qs, 3, 2)
    assert(rows(res) == exact)
    val stat = qstat.select("qid", "prunable")
      .as[(Long, Boolean)].collect().toMap
    assert(!stat(7L), "flat impacts cannot satisfy the MaxScore bound")
  }

  test("seeded random corpora: maxscore == exact for every prefixR") {
    val rnd = new scala.util.Random(42)
    val vocab = (1 to 25).map(i => s"w$i")
    // Zipf-ish draw: low ranks much more likely
    def word(): String = vocab(math.min(vocab.size - 1,
      (math.pow(rnd.nextDouble(), 2.5) * vocab.size).toInt))
    val docs = (0L until 80L).map { i =>
      (i, (0 until (5 + rnd.nextInt(40))).map(_ => word()).mkString(" "))
    }.toDF("doc_id", "text")
    val qs = (0 until 8).flatMap { q =>
      (0 until (1 + rnd.nextInt(3))).map(_ => (q.toLong, word()))
    }.distinct.toDF("qid", "qw")
    val exact = rows(graft.queries.Llm.bm25TopKQueries(docs, qs, 4))
    for (r <- Seq(1, 3, 10, 200)) {
      val ms = rows(
        graft.queries.Llm.bm25TopKMaxScoreQueries(docs, qs, 4, r))
      assert(ms == exact, s"prefixR=$r diverged on the random corpus")
    }
  }
}
