package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (Kudo 2018, the SentencePiece trainer) —
  * the third standard member of the tokenizer family beside BPE
  * (train/apply) and WordPiece (apply): seed a substring vocabulary
  * from corpus counts, run Viterbi-EM rounds (hard EM: each round
  * segments every word TYPE optimally under the current unigram
  * probabilities, then re-estimates counts from the chosen
  * segmentations, pruning pieces that go unused), and serve by
  * Viterbi-segmenting through the final vocabulary.
  *
  * CROSS-ENGINE BIT-EXACTNESS (the llm_quality_classifier / kmeans /
  * PQ discipline, extended to EM): the whole training loop re-runs
  * inside the DuckDB oracle, so every float op here is IEEE-pinned —
  *  - piece probabilities are single divisions cnt/T of exact
  *    integer-valued doubles (division is correctly rounded in IEEE
  *    754: both engines produce the identical double);
  *  - a segmentation's score is the LEFT-TO-RIGHT product
  *    ((1.0·s1)·s2)·… — multiplication is correctly rounded too, and
  *    the association is fixed on both sides (here an `aggregate`
  *    fold; in the oracle a left-associative `1.0*s1*…*sN` chain with
  *    trailing ·1.0 identities, which are exact);
  *  - NO transcendentals: log-space scoring would drag libm
  *    differences into the hash, so comparisons happen on raw
  *    probability products (doubles reach ~1e-90 for 12 pieces at
  *    p≈1e-7 — far above the 1e-308 underflow floor);
  *  - the argmax tie-break is (score DESC, parts DESC) where `parts`
  *    is the piece-length sequence: two distinct compositions of the
  *    same word always differ at a position before either ends (both
  *    sum to the word length), so the lexicographic comparison is
  *    total and both engines pick the identical segmentation.
  *
  * WHY ENUMERATION, NOT A DP: both engines score every composition of
  * each word length into parts ≤ maxPieceLen. A Viterbi DP is
  * per-word-linear, but its tie handling composes per-suffix and can
  * diverge from a whole-sequence comparison when two FULL products
  * collide after rounding while their suffix factors differ — an
  * enumerated argmax has no such seam, and the candidate count is
  * tetranacci(len) ≤ 1490 at len 12 PER WORD TYPE. The unit of work
  * is the vocabulary (types), not the corpus: at 100 TB the type
  * table is MB-scale, each EM round is O(|types|·comps) map work plus
  * piece-keyed aggregates on 8-byte-ish keys, and serve-time
  * tokenization is one broadcast segmentation-table join + doc-keyed
  * aggregate — the exact llm_bpe_apply shape. Words longer than
  * maxWordLen fail LOUDLY (a silent drop would shrink the vocab);
  * real deployments raise maxWordLen (cost grows ~1.9^len per type)
  * or pre-split on punctuation upstream.
  */
object Unigram {

  /** All compositions of n into ordered parts of size 1..maxPart, for
    * n = 1..maxN — the candidate segmentation shapes. Tiny by
    * construction (Σ tetranacci(n) ≈ 3k rows at maxN=12), broadcast
    * everywhere it joins. */
  def compositions(maxN: Int, maxPart: Int): Seq[(Int, Seq[Int])] = {
    def comps(n: Int): Seq[List[Int]] =
      if (n == 0) Seq(Nil)
      else (1 to math.min(maxPart, n)).flatMap(p =>
        comps(n - p).map(p :: _))
    (1 to maxN).flatMap(n => comps(n).map(c => (n, c: Seq[Int])))
  }

  private def compsDf(df: DataFrame, maxN: Int, maxPart: Int): DataFrame = {
    import df.sparkSession.implicits._
    val rows = compositions(maxN, maxPart)
    df.sparkSession.createDataFrame(rows).toDF("n", "parts")
      // row-wise no-op limit: the table IS this many rows — carries
      // the broadcast bound in-plan for PlanAudit
      .limit(rows.size)
  }

  /** pieces of `word` under `parts`: starts are the running prefix
    * sums, each piece a substring slice. Pure Column work. */
  private def pieceArr(word: Column, parts: Column): Column = {
    val starts = aggregate(parts, array(lit(0)),
      (acc, x) => concat(acc, array(element_at(acc, -1) + x)))
    zip_with(slice(starts, lit(1), size(parts)), parts,
      (st, len) => substring(word, st + 1, len))
  }

  /** Seed vocabulary: every substring OCCURRENCE of length
    * 1..maxPieceLen, weighted by word frequency; kept iff the count
    * reaches minCount OR the piece is a single character (chars are
    * always kept so every word stays segmentable). */
  def seedVocab(wordFreq: DataFrame, maxPieceLen: Int,
      minCount: Long): DataFrame = {
    val wl = wordFreq.withColumn("len", length(col("word")))
    val subs = wl.select(col("freq"), explode(flatten(
      transform(sequence(lit(1), col("len")), i =>
        transform(sequence(lit(1),
          least(lit(maxPieceLen), col("len") - i + lit(1))), l =>
          substring(col("word"), i, l))))).as("piece"))
    subs.groupBy("piece").agg(sum("freq").as("cnt"))
      .filter(col("cnt") >= minCount || length(col("piece")) === 1)
  }

  /** One Viterbi pass: each word TYPE's best segmentation under the
    * current vocab counts. Returns (word, freq, parts, pieces).
    * `vocabRows` is the caller's provable bound on |vocab| (seed
    * vocabulary of a bounded fixture, or the shrinking EM vocab) —
    * attached as a row-wise no-op limit so the broadcast joins carry
    * their proof in-plan. */
  def viterbiSegment(wordFreq: DataFrame, vocab: DataFrame,
      maxPieceLen: Int, maxWordLen: Int,
      vocabRows: Option[Int] = None): DataFrame = {
    val sess = wordFreq.sparkSession
    val comps = compsDf(wordFreq, maxWordLen, maxPieceLen)
    val vb0 = vocab.select(col("piece"), col("cnt"))
    val vb = vocabRows.fold(vb0)(vb0.limit)
    val total = vb.agg(sum("cnt").cast("double").as("t"))
    val scored = vb.crossJoin(broadcast(total))
      .select(col("piece"), (col("cnt").cast("double") / col("t")).as("s"))
    val wl = wordFreq
      .withColumn("len", when(length(col("word")) > maxWordLen,
        raise_error(concat(
          lit(s"unigram: word exceeds maxWordLen $maxWordLen: "),
          col("word"))))
        .otherwise(length(col("word"))))
    val cand = wl.join(broadcast(comps), col("len") === col("n"))
      .select(col("word"), col("freq"), col("parts"),
        posexplode(pieceArr(col("word"), col("parts")))
          .as(Seq("pos", "piece")))
    // all pieces must be in-vocab (count match), product in position
    // order with the fixed ((1.0*s1)*s2)*... association. Slot-pivoted
    // flat form (12 conditional max aggregates, one codegen'd multiply
    // chain) rather than collect_list+sort+HOF fold: positions are
    // contiguous 1..|parts| so absent slots are TRAILING and their
    // coalesced 1.0 factors are exact identities — bit-identical to
    // the fold AND to the oracle's 1.0*s1*…*s12 chain, without the
    // per-group array allocation.
    // NB posexplode's pos is 0-based (the oracle's generate_subscripts
    // is 1-based — its slots run 1..12, these run 0..11)
    val prodExpr = (0 until maxWordLen).map(p =>
      s"coalesce(max(CASE WHEN pos = $p THEN s END), 1.0D)")
      .mkString("1.0D * ", " * ", "")
    val segs = cand.join(broadcast(scored), Seq("piece"))
      .groupBy("word", "parts")
      .agg(first("freq").as("freq"), count(lit(1)).as("n_in"),
        expr(prodExpr).as("prod"))
      .filter(col("n_in") === size(col("parts")))
    segs.groupBy("word")
      .agg(max(struct(col("prod"), col("parts"), col("freq"))).as("b"))
      .select(col("word"), col("b.freq").as("freq"),
        col("b.parts").as("parts"))
      .withColumn("pieces", pieceArr(col("word"), col("parts")))
  }

  /** `rounds` Viterbi-EM rounds from the seed: segment → recount →
    * prune. Returns the final (piece, cnt) vocabulary. Each round's
    * vocab is localCheckpoint'd — it is MB-scale by construction and
    * four plan consumers read it.
    *
    * Pruning: unused pieces always drop (cnt = 0 never appears in a
    * recount). `targetVocab` adds SentencePiece's TARGET-SIZE prune —
    * each round keeps only the top-V pieces by (cnt DESC, piece),
    * plus ALL single characters unconditionally (the coverage
    * guarantee: any word remains segmentable, worst-case char-by-char,
    * exactly the byte-fallback contract). The next round's EM then
    * re-segments under the smaller vocabulary, shifting counts onto
    * the survivors — the shrinking-vocabulary dynamic the real trainer
    * runs. The rank window rides a row-wise no-op `vocabCap` limit so
    * its input is plan-provably bounded (the PlanAudit discipline). */
  def train(wordFreq: DataFrame, rounds: Int, maxPieceLen: Int = 4,
      maxWordLen: Int = 12, minCount: Long = 2,
      vocabCap: Option[Int] = None,
      targetVocab: Option[Int] = None): DataFrame = {
    val wf = wordFreq.localCheckpoint()
    trainFrom(wf, round1Recount(wf, maxPieceLen, maxWordLen, minCount,
      vocabCap), rounds, maxPieceLen, maxWordLen, vocabCap, targetVocab)
  }

  /** One segment → recount pass of `wf` under `vocab`: the E-step's
    * chosen segmentations re-counted per piece (piece, cnt). */
  private def recount(wf: DataFrame, vocab: DataFrame, maxPieceLen: Int,
      maxWordLen: Int, vocabCap: Option[Int]): DataFrame =
    viterbiSegment(wf, vocab, maxPieceLen, maxWordLen,
      vocabRows = vocabCap)
      .select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))

  /** The ROUND-1 recount from the seed vocabulary. Exposed as the
    * trainers' shared-prefix boundary: a target-size prune applies
    * AFTER the recount, so round 1's recount is byte-identical between
    * the pruned and unpruned trainers (exact integer sums — they
    * round-trip parquet bit-exactly). The pruned trainer consumes the
    * unpruned sibling's staged copy via trainFrom; the sibling keeps
    * computing it live. */
  def round1Recount(wordFreq: DataFrame, maxPieceLen: Int = 4,
      maxWordLen: Int = 12, minCount: Long = 2,
      vocabCap: Option[Int] = None): DataFrame = {
    val wf = wordFreq.localCheckpoint()
    recount(wf, seedVocab(wf, maxPieceLen, minCount).localCheckpoint(),
      maxPieceLen, maxWordLen, vocabCap)
  }

  /** EM rounds from a PRECOMPUTED round-1 recount: finish round 1
    * (prune + character floor), then run rounds 2..`rounds` live.
    * train(wf, …) ≡ trainFrom(wf, round1Recount(wf, …), …) — the
    * split only names the shared-prefix boundary. */
  def trainFrom(wordFreq: DataFrame, firstRecount: DataFrame,
      rounds: Int, maxPieceLen: Int = 4, maxWordLen: Int = 12,
      vocabCap: Option[Int] = None,
      targetVocab: Option[Int] = None): DataFrame = {
    require(rounds >= 1, s"unigram: rounds must be >= 1 (got $rounds)")
    val wf = wordFreq.localCheckpoint()
    // the coverage floor: every character of every word stays in the
    // vocabulary FOREVER, at count 0 when the round's segmentations
    // didn't use it (p = 0 ⇒ chosen only when nothing positive
    // segments the word — the char-by-char last resort). Without this
    // a target-size prune can drop a whole-word piece whose word then
    // has NO valid segmentation next round and silently vanishes from
    // the recount — the exact hole SentencePiece's character coverage
    // exists to close.
    val chars = wf
      .select(explode(split(col("word"), "")).as("piece"))
      .distinct().localCheckpoint()
    var vocab: DataFrame = null
    (1 to rounds).foreach { r =>
      var next =
        if (r == 1) firstRecount
        else recount(wf, vocab, maxPieceLen, maxWordLen, vocabCap)
      targetVocab.foreach { v =>
        val ranked = vocabCap.fold(next)(next.limit)
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(desc("cnt"), asc("piece"))))
        next = ranked
          .filter(col("rk") <= v || length(col("piece")) === 1)
          .drop("rk")
      }
      vocab = next
        .unionByName(chars.join(next, Seq("piece"), "left_anti")
          .withColumn("cnt", lit(0L)))
        .localCheckpoint()
    }
    vocab
  }

  /** Serve-time tokenization: corpus word occurrences left-join the
    * trained segmentation table, and words OUTSIDE it fall back to
    * single-character pieces — SentencePiece's byte-fallback, at the
    * char level. This is the 100 TB serve shape: the trained table
    * covers the frequent-type head (training itself prunes to the
    * head — rare singleton types contribute noise counts to EM, so
    * capping the trained type table is standard practice), and the
    * fallback guarantees TOTAL coverage of the unbounded rare-type
    * tail without enumerating compositions for it. `segRows` is the
    * caller's provable bound on the segmentation table (broadcast
    * proof in-plan). */
  def tokenize(docWords: DataFrame, seg: DataFrame,
      segRows: Option[Int] = None): DataFrame = {
    val sg = segRows.fold(seg)(seg.limit)
    docWords.join(broadcast(sg), Seq("word"), "left")
      .withColumn("pieces",
        coalesce(col("pieces"), split(col("word"), "")))
  }

  /** Serve-time segmentation table after training: word → pieces under
    * the FINAL vocabulary (one extra Viterbi pass, the apply twin of
    * bpeVocabSyms). */
  def trainSegmentation(wordFreq: DataFrame, rounds: Int,
      maxPieceLen: Int = 4, maxWordLen: Int = 12, minCount: Long = 2,
      vocabCap: Option[Int] = None): DataFrame = {
    val wf = wordFreq.localCheckpoint()
    val vocab = train(wf, rounds, maxPieceLen, maxWordLen, minCount,
      vocabCap)
    viterbiSegment(wf, vocab, maxPieceLen, maxWordLen,
      vocabRows = vocabCap)
      .select(col("word"), col("pieces"))
  }
}
