package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Golden-file regression net for the plan-critical queries — the Spark
  * analogue of the reference's sqlplannertest harness
  * (/root/reference/tests/sqlplannertest/src/lib.rs:36-41, which diffs
  * planner output against checked-in `.planner.sql` files).
  *
  * PlanQualitySpec asserts targeted properties (pushdown, broadcast, no
  * cartesian); this spec freezes the WHOLE normalized plan text so any
  * rule/shape drift — even one the targeted asserts don't cover — fails
  * loudly and shows the diff.
  *
  * Regenerate after an intentional plan change:
  *   GRAFT_REGEN_GOLDEN=1 sbt "testOnly graft.GoldenPlanSpec"
  * then review the diff like any other code change.
  */
class GoldenPlanSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"
  private val goldenDir = Paths.get("src/test/resources/golden")
  private val regen = sys.env.contains("GRAFT_REGEN_GOLDEN")

  /** The queries whose plan shape carries the 100-TB design decisions. */
  private val planCritical = Seq(
    "q1_agg",              // pushdown + pruning + partial agg
    "q11_multi_join",      // broadcast dims, single fact shuffle
    "d1_dedup_exact",      // fingerprint-keyed single window shuffle
    "d3_dedup_minhash_lsh",// band-bucket equi self-join, persisted sigs
    "tpch16_parts_supplied", // hash left-anti join
    "e5_asof_join",        // union + running-last window
    "e6_range_join",       // bucketed equi join. NOTE: the pin carries the
                           // testdata's ts encoding (timestamp_ntz in the
                           // current generation); against an older
                           // Long-nanos dataset it fails on ReadSchema even
                           // though Tables.readEvents handles both — regen
                           // against the generation you run on.
    "a1_ann_bruteforce",   // broadcast queries + bounded-heap top-k
    "t9_repetition",       // fused kernel, map-only scan+project
    "u1_token_surprisal",  // broadcast vocabulary, text never shuffles
    "c2_decon_fuzzy",      // broadcast eval band index, no corpus self-join
    "s4_stratified_sample",// TopKPerKey bounded heap, no full sort
    "c3_decon_bloom",      // map-side bloom prefilter before the verify join
    "k3_heavy_hitters",    // ObjectHashAggregate partial/final sketch pair
    "k2_quantile_sketch",  // mergeable quantile buffers, no per-group sort
    "v3_embedding_covariance", // pair expansion collapses map-side
    "e7_asof_forward",     // union + running-first window (e5's mirror)
    "k4_sketch_cube",      // two-level aggregate over binary sketch states
    "x3_zorder",           // codegen'd interleave inside the scan stage
    "m4_media_dedup",      // payload-slice fingerprint; blobs never shuffle
    "k7_join_card",        // two state aggs meet in a one-row nested loop
    "t14_tfidf_simjoin",   // df-banded postings self-join, n_docs broadcast
    "a4_pq_adc",           // LUT broadcast join + bounded-heap winners
    "t16_quality_probe",   // map-only margin over literal weights, no join
    "t17_topk_similar",    // two-phase TopKPerKey over symmetrized pairs
    "d13_containment",     // prefix-filtered equi candidate join, pruned postings
    "x5_probe_auc",        // range-partitioned prefix-sum, no global window
    "x6_latest_wins",      // max-struct compaction, no window
    "k8_hll",              // map-side partial HLL states before the exchange
    "s6_dsir_weights",     // floored count tables broadcast, text never shuffles
    "e12_transitions",     // per-user window, broadcast row totals
    "t18_collocations",    // df-banded equi self-join, no cartesian
    "d14_sorted_neighborhood", // block-partitioned neighbor window
    "a5_rrf_fusion",       // two bounded-heap rankings fused, no window
    "x7_incremental_stats",// base+delta stats merge, full-outer on lang
    "c5_split_leakage",    // fp-keyed flags, single-row rollup
    "s7_quota_interleave", // bounded-heap quotas + arithmetic position
    "t19_bm25",            // broadcast df/query tables, TakeOrdered top-50
    "e13_decay",           // 1-row max broadcast, shift-exact weights
    "x8_source_drift",     // TakeOrdered head vocab, broadcast grid
    "m5_media_phash",      // banded equi join over codegen'd aHash keys
    "c6_eval_leak_report", // broadcast eval grams, per-eval rollup
    "e14_rolling_window",  // user-partitioned RANGE frame
    // g9_pagerank_fixpoint is NOT whole-plan-pinned: its rounds pass
    // through localCheckpoint, so the plan is a LogicalRDD with
    // unstable ids — the loop is gated by its oracle (≡ g8's replay)
    // and the GraphSpec loop≡unrolled property instead.
    // u3_bpe_distributed is NOT whole-plan-pinned: its symbol tables are
    // persistPublic frames, the d8/g4 cache-manager situation — guarded
    // by targeted PlanQualitySpec asserts instead.
    "x9_source_overlap",   // distinct postings, token-keyed equi self-join
    "s8_temperature_mix",  // one corpus count, O(sources) apportionment
    "t20_novelty",         // distinct trigram frames, gram-keyed left join
    "d15_winnowing",       // doc-partitioned min-struct window, one scan
    "e15_mad_outliers",    // user-keyed selection windows + equi joins
    "v7_truncation_recall",// two bounded-heap rankings, broadcast queries
    "k9_bloom",            // map-side partial bloom states, OR rollup
    "u2_stupid_backoff",   // floored count tables broadcast, integer backoff
    "t22_sentences",       // map-only segmentation, single order exchange
    "a6_ivf_pq",           // fused cell+code projection, cell-pruned ADC
    "d16_winnow_pairs",    // df-capped fingerprint postings, equi pairs
    "x12_source_cdf",      // distinct-value cumsum, equi CDF assignment
    "t23_readability",     // map-only ratio features, single order exchange
    "v8_centroid_drift",   // decimal-summed centroids, label-keyed drift
    "p4_chunk_overlap",    // per-doc sequence explode, fp'd chunks, no shuffle
    "c9_contam_spans",     // broadcast eval grams, semi-join localization
    "s9_hard_negatives",   // broadcast queries, label-filtered bounded heap
    "e16_burst_ratio",     // hourly pre-agg, type-partitioned RANGE frame
    "x13_budget_waterfill",// one corpus count, O(langs) waterfill rounds
    "t26_blocklist",       // literal-array filter lambda, map-only scan
    "u4_bpe_encode",       // merge-table expression, one fused corpus pass
    "u7_unigram_encode",   // piece-table Viterbi expression, one fused pass
    "u10_byte_bpe",        // byte-table expression, one fused corpus pass
    "u12_tokenizer_coverage", // distinct types, fused segmenter, O(langs) agg
    "s13_mixture_manifest",   // bounded-heap per-source prefix, O(sources) alloc broadcast
    "x15_global_ids",      // O(B) bucket offsets, bucket-partitioned ranks
    "s11_dedup_discount",  // one fp window, weight is integer arithmetic
    "x16_curation_funnel", // one scan, one fp window, one funnel aggregate
    "c10_span_excise",     // broadcast eval grams, cover agg, equi join back
    "e17_event_paths",     // per-user lead window, 1-row total broadcast
    "p5_pad_waste",        // map-only pow2 buckets, one partial aggregate
    "u5_tokenizer_fertility", // fused segment pass, O(langs) aggregate
    "u8_tokenizer_compare", // BOTH segmenters in one fused pass, no join
    "v9_pair_sim_hist",    // TakeOrdered sample prefix, broadcast all-pairs
    "q30_pivot",           // CASE-armed partial+final aggregate, no joins
    "a7_radius_search",    // broadcast queries, codegen'd radius filter
    "a9_ivf_append",       // persisted-cells assignment, O(nlist·dim) drift join
    "m6_audio_energy",     // md5 synth + frame explode, map-only features
    "t25_langid_confusion",// fused langid pass, O(langs²) cells, 1-row total
    "x17_source_scorecard",// one fp window, O(sources) scorecard aggregate
    "d18_dup_cluster_hist",// fp aggregate then O(sizes) rollup, no window
    "x18_manifest_diff",   // two manifest aggregates, O(shards) join
    "v10_norm_hist",       // fused dot kernel, one histogram aggregate
    "a10_adc_rerank",      // ADC shortlist + broadcast exact re-rank heaps
    "v11_ann_recall",      // left-semi hit join over two bounded retrievals
    "v12_pq_distortion",   // broadcast codebooks, decimal map-combine SSE
    "q31_unpivot")         // melt via Expand over the O(sources) aggregate
  // g1_pagerank / g5_ppr / g8_pagerank_dangling are NOT whole-plan-
  // pinned (r17): their edge frames are now cached PRE-PARTITIONED
  // (partitionedEdges), and a cached subtree's rendering depends on
  // which other suites populated the CacheManager first — the g4/g6
  // cache-state situation. The load-bearing property (edge cache
  // partitioned on doc_a, so rounds plan no edge-side exchange) is
  // pinned by the targeted PlanQualitySpec assert instead.
  // g2_triangle_count is NOT whole-plan-pinned (r17): g10's hits now
  // caches the canonical pairs (doc_a, doc_b) select internally, so
  // g2's subtree flips to InMemoryTableScan whenever another suite has
  // constructed g10 first — the g4/g6 cache-state situation. Guarded
  // by the targeted PlanQualitySpec asserts (wedge/closure equi joins,
  // no hint over grouped aggregates) instead.
  // t21_rake / t24_vocab_growth are NOT whole-plan-pinned (r17): they
  // read through Tables.loadFanned, whose parallelism-floor repartition
  // appears only when the scan is under-split — the plan text varies
  // with the testdata's file/row-group layout (exactly the environment
  // difference the fan-out defends against). Their shapes are guarded
  // by the targeted PlanQualitySpec asserts instead.
  // d17_incremental_dedup is NOT whole-plan-pinned: its token/prefix
  // frames are persistPublic caches (the d8/g4 cache-manager situation)
  // — guarded by targeted PlanQualitySpec asserts instead.
  // g11_louvain_move is NOT whole-plan-pinned: it scans the shared
  // tfidf_pairs index (the g7 situation) — targeted asserts instead.
  // d19_incremental_minhash is NOT whole-plan-pinned: it scans the
  // materialized mh_index (the g7 shared-index situation) — targeted
  // PlanQualitySpec asserts instead.
  // g13_louvain_levels is NOT whole-plan-pinned: same shared pair index
  // plus per-level eager checkpoint rounds at construction (LogicalRDDs
  // with unstable ids, the g9 situation) — its round unit is pinned by
  // targeted PlanQualitySpec asserts instead.
  // g10_hits is NOT whole-plan-pinned: it scans the shared pair index
  // (the g7 cache-state situation) — guarded by the targeted
  // PlanQualitySpec assert instead.
  // g7_modularity is NOT whole-plan-pinned: it scans the shared pair
  // index, whose subtree flips to InMemoryTableScan when another suite
  // has persisted the same relation in this JVM — the g4/g6 cache-state
  // situation. The shape is guarded by the targeted PlanQualitySpec
  // assert instead.
  // x11_dataset_card is NOT whole-plan-pinned: RewriteDistinctAggregates
  // orders the multi-distinct Expand arms by attribute id, which varies
  // with session registration order — the shape (one scan, Expand,
  // two-level aggregate) is guarded by the targeted PlanQualitySpec
  // assert instead.
  // g6_ktruss is pinned as its repeated round unit (g6_truss_round
  // below) — the full query's plan text varies with the JVM's
  // cache-manager state, the d8/g4 situation exactly.
  // g4_kcore is pinned as its repeated round unit (g4_kcore_round below):
  // the full query's plan text varies with the JVM's cache-manager state
  // (each peel round persists its edge frame), the d8 situation exactly.

  /** Strip run-to-run noise: expression ids, plan ids, paths, sizes. */
  private def normalize(plan: String): String =
    plan
      .replaceAll("#\\d+", "#x")
      .replaceAll("plan_id=\\d+", "plan_id=x")
      .replaceAll("lambda x_\\d+", "lambda x_n") // session-global counter
      .replaceAll("lambda y_\\d+", "lambda y_n") // zip_with's 2nd variable
      .replaceAll("@[0-9a-f]{1,8}\\b", "@x")     // object identity hashes (Integer.toHexString is 1-8 chars)
      .replaceAll("\\$\\$Lambda\\$\\d+/0x[0-9a-f]+", "\\$\\$Lambda\\$x") // JVM lambda ids
      .replaceAll("file:[^\\]\\s,)]+", "file:PATH")
      .replaceAll("Location: .*", "Location: PATH")
      .replaceAll("(?m)\\s+$", "")
      .trim

  private def checkGolden(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
    val got = normalize(
      df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    val file = goldenDir.resolve(s"$name.plan")
    if (regen || !Files.exists(file)) {
      Files.createDirectories(goldenDir)
      Files.writeString(file, got + "\n")
      info(s"wrote golden ${file.toAbsolutePath}")
    } else {
      val want = Files.readString(file).trim
      assert(got == want,
        s"\nplan drift for $name — if intentional, regen with " +
          s"GRAFT_REGEN_GOLDEN=1 and review the diff.\n" +
          s"--- golden\n$want\n--- current\n$got")
    }
  }

  planCritical.foreach { name =>
    test(s"golden plan: $name") {
      checkGolden(name, SparkEntry.queries(name)(spark, dir))
    }
  }

  // Not SparkEntry queries, but plan shapes that carry 100-TB decisions:

  test("golden plan: hybrid_skew_join") {
    // pins the round-6 single-scan rewrite: ONE parquet scan of the big
    // side with a conditional-salt projection, a replica-union small
    // side, one join — a regression back to the two-scan union form
    // shows up as a second `Scan parquet` in the diff. Hot keys are
    // explicit so the pinned plan has no data-dependent profile pass.
    import org.apache.spark.sql.functions.col
    val big = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val small = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"), col("o_orderdate"))
    checkGolden("hybrid_skew_join",
      graft.operators.SkewJoin.hybridJoin(big, small, Seq("l_orderkey"),
        hotKeys = Some(Seq(Seq(1L), Seq(2L))), saltFactor = 8))
  }

  test("golden plan: d8_cc_round") {
    // pins the repeated unit of the connected-components closure (the
    // most expensive query in every bench): one neighbor-min aggregate +
    // one pointer-jump self-join — two id-keyed shuffles per round. A
    // lineage/checkpoint regression multiplies this shape per round and
    // previously only surfaced as a 3× bench number.
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, dir, "documents")
    val labels = docs.select(col("doc_id"), col("doc_id").as("rep"))
    val edges = docs.select(col("doc_id").as("u"), (col("doc_id") + 1).as("v"))
    checkGolden("d8_cc_round", graft.operators.Dedup.ccRound(labels, edges))
  }

  test("golden plan: g6_truss_round") {
    // pins the repeated support unit of the k-truss peel: two wedge
    // equi joins (anchor = smallest vertex) with a left-semi closure
    // probe, three-way triangle crediting, one map-combinable count,
    // and the left join restoring support-0 edges. A regression to a
    // cartesian wedge stage or a window-ranked support would surface
    // here.
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, dir, "documents")
    val edges = docs.select(col("doc_id").as("doc_a"),
      (col("doc_id") + 1).as("doc_b"))
    checkGolden("g6_truss_round",
      graft.operators.Graph.trussSupport(edges))
  }

  test("golden plan: g4_kcore_round") {
    // pins the repeated peel unit of the k-core decomposition: one
    // map-combinable degree aggregate + two left-semi equi joins that
    // restrict the edge list to survivors — the per-round cost at any
    // graph size. A regression to an inner join (duplicating edges) or
    // a window-ranked degree would surface here.
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, dir, "documents")
    val edges = docs.select(col("doc_id").as("doc_a"),
      (col("doc_id") + 1).as("doc_b"))
    checkGolden("g4_kcore_round",
      graft.operators.Graph.kCorePeel(edges, 3)._2)
  }
}
