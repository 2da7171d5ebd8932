package graft.tools

/** ONE-COMMAND SF-1 scale rehearsal (r17 verdict task 7): replicate the
  * sf0.1 testdata 10× with [[ScaleUp]] (skipped when the output dir
  * already holds all ten tables — pass `--fresh` to regenerate after a
  * ScaleUp rule change) and run [[graft.Bench]] over the rehearsal
  * subset, writing the round artifacts:
  *
  *   sbt "runMain graft.tools.Rehearse"
  *     → /tmp/sf1 (data), BENCH_sf1.json (summary line),
  *       BENCH_sf1_DETAIL.json (per-query wall/cpu/gc/steady)
  *
  * The subset = all of TPC-H + the historically heaviest pipeline
  * queries + (r18, closing the r17 gap) the ENTIRE lifecycle/audit
  * family — x22/x24/x25/x26, d23/d23b/d25/d25b/d26/d27, s16 — exactly
  * the queries whose cost is claimed "∝ drop/takedown, never corpus";
  * the rehearsal is where that claim has to survive 10× the corpus.
  *
  * Bench is invoked in-process (system-property channel — see
  * `Bench.envOrProp`), so one sbt command produces data + both
  * artifacts with no shell env plumbing.
  */
object Rehearse {

  /** The lifecycle/audit family — every persisted-store delete/merge/
    * audit path. */
  val LifecycleFamily: Seq[String] = Seq(
    "x22_takedown_audit", "x24_takedown_audit_ext",
    "x25_takedown_audit_full", "x26_compaction_audit",
    "d23_index_delete", "d23b_postings_delete",
    "d25_index_merge", "d25b_postings_merge",
    "d26_components_delete", "d27_char_excise_incremental",
    "s16_curriculum_incremental", "x23_retention_sweep",
    "x27_governance_loop", "x28_curriculum_buffered_delete")

  /** The r17 heavy list — the queries whose sf0.1 cost made the
    * steady-channel tail. */
  val HeavyList: Seq[String] = Seq(
    "c3_decon_bloom", "c9_contam_spans", "d10_span_dedup",
    "d24_char_excise", "d2_dedup_ngram_jaccard", "d13_containment",
    "g9_pagerank_fixpoint", "g13_louvain_levels", "t21_rake",
    "t24_vocab_growth", "t28_quality_logit", "a10_adc_rerank")

  /** The ANN serving family (r18 verdict task 3): exactly the queries
    * whose first-touch cost moved into the persisted `pq_codes` store
    * in r18 — rehearsed at sf1 so the store-served ADC path's scale
    * claim is executed, not inferred. */
  val AnnFamily: Seq[String] = Seq(
    "a2_ann_ivf", "a4_pq_adc", "a6_ivf_pq", "a10_adc_rerank",
    "a11_ivf_pq_residual", "a12_opq_adc", "a13_opq_ivf_pq",
    "v11_ann_recall", "v13_partial_refit", "v14_pq_partial_refit")

  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    val pos = args.filterNot(_.startsWith("--"))
    val src = pos.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (pos.length > 1) pos(1) else "/tmp/sf1"
    val reps = if (pos.length > 2) pos(2).toInt else 10

    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // completeness, not mere existence: an interrupted ScaleUp leaves
    // partial table directories that would silently rehearse truncated
    // data — require the committer's _SUCCESS marker in each
    val haveAll = tables.forall(t =>
      new java.io.File(s"$out/$t.parquet/_SUCCESS").exists())
    if (!haveAll || flags("--fresh")) {
      println(s"rehearse: generating $out from $src ($reps replicas)")
      ScaleUp.main(Array(src, out, reps.toString))
    } else println(s"rehearse: reusing existing $out")

    val tpch = graft.SparkEntry.queries.keys.filter(_.startsWith("tpch"))
    val subset =
      (tpch.toSeq ++ HeavyList ++ LifecycleFamily ++ AnnFamily).distinct
    sys.props("SPARK_GRAFT_SF_DIR") = out
    sys.props("SPARK_GRAFT_BENCH_QUERIES") = subset.mkString(",")
    sys.props("SPARK_GRAFT_BENCH_DETAIL") = "BENCH_sf1_DETAIL.json"
    sys.props("SPARK_GRAFT_BENCH_SUMMARY") = "BENCH_sf1.json"
    graft.Bench.main(Array.empty)
  }
}
