package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eval-set decontamination: find (and drop) training documents that leak
  * benchmark/eval text, by verbatim n-gram overlap — the standard
  * contamination check run before training on a scraped corpus.
  *
  * No analogue in the reference (it has no text pipeline); this is part of
  * the training-data extension surface, next to [[Dedup]].
  *
  * Scale shape: the eval set is benchmark-sized (thousands of documents)
  * while the corpus is the 100 TB side — so eval grams are deduped,
  * reduced to 64-bit hashes (8 bytes each vs ~50-byte strings), and
  * BROADCAST. The corpus side streams: one codegen'd pass per document to
  * its distinct gram hashes (`graft_shingle_hashes`), a map-side hash join
  * against the broadcast, and a per-doc count whose shuffle carries only
  * (doc_id, partial count) for MATCHING grams — contamination is rare, so
  * that shuffle is near-empty. Corpus text never shuffles. A gram-hash
  * collision against an eval gram could flag a clean document, with
  * probability bounded by |corpus grams|·|eval grams|·2^-64 — negligible
  * at any realistic scale, and the DuckDB oracle (string grams, no
  * hashing) agrees exactly at the tested SFs.
  */
object Decontaminate {

  /** Corpus documents sharing ≥ 1 verbatim n-gram with the eval set →
    * (doc_id, n_shared) where n_shared counts the document's DISTINCT
    * contaminated grams. Documents with no overlap are absent.
    */
  def ngramOverlap(corpus: DataFrame, evalSet: DataFrame, n: Int = 8): DataFrame = {
    val evalGrams = evalSet
      .select(explode(
        call_function("graft_shingle_hashes", col("text"), lit(n))).as("g"))
      .distinct()
    corpus
      .select(col("doc_id"),
        explode(call_function("graft_shingle_hashes", col("text"), lit(n))).as("g"))
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Static-side eval-gram index for INCREMENTAL decontamination (the
    * minhashIndex discipline): ONE row holding the eval set's deduped,
    * ascending-sorted gram-hash array. Build once per eval-set snapshot,
    * persist or write to parquet; it is a plain DataFrame, so the index
    * survives as a table and serves any number of streaming jobs. Sorted
    * because `graft_intersect_size` is a merge walk — the per-document
    * probe is O(|doc grams| + |eval grams|) with zero allocation.
    */
  def evalGramIndex(evalSet: DataFrame, n: Int = 8): DataFrame =
    evalSet
      .select(explode(
        call_function("graft_shingle_hashes", col("text"), lit(n))).as("g"))
      .agg(array_sort(collect_set(col("g"))).as("eval_grams"))

  /** Streaming twin of [[ngramOverlap]] — contamination flags for
    * ARRIVING documents against a static eval-set index, per microbatch:
    * `(doc_id, n_shared)` for every arriving doc sharing ≥ 1 verbatim
    * n-gram with the eval set, n_shared counting its distinct
    * contaminated grams — the batch operator's exact contract.
    *
    * Stateless by construction: each document carries its whole gram
    * set in one row, so the flag is a map-only cross join against the
    * ONE-ROW broadcast index plus one codegen'd sorted-merge intersect —
    * no streaming aggregation, no watermark state, nothing retained
    * across batches. The one-row index costs 8 bytes per eval gram
    * (same budget as the batch broadcast); for eval sets beyond
    * executor-broadcast scale, run the [[ngramOverlapBloom]] shape in
    * `foreachBatch` instead — the bloom state is an order of magnitude
    * smaller and the exact verify join prunes to near-empty input.
    */
  def streamFlags(docs: DataFrame, index: DataFrame, n: Int = 8): DataFrame =
    docs
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", col("text"), lit(n)).as("hs"))
      .filter(size(col("hs")) > 0)
      .crossJoin(broadcast(index))
      .select(col("doc_id"),
        call_function("graft_intersect_size", col("hs"), col("eval_grams"))
          .cast("long").as("n_shared"))
      .filter(col("n_shared") > 0)

  /** [[ngramOverlap]] with a BLOOM-FILTER prefilter — the shape for when
    * the eval set is too large to broadcast as a hash relation. A hashed
    * relation costs ≥ 8 bytes per gram plus table overhead; the Bloom
    * filter costs ~1.2 bytes per gram at 1% fpp, an order of magnitude
    * more eval grams per executor-memory budget. The filter is built once
    * driver-side (`stat.bloomFilter` merges per-partition partials — the
    * Lloyd-fit/BPE-table discipline: bounded driver state, fit once,
    * amortized across runs), probes as a codegen'd map-side expression, and
    * survivors — true matches plus the fpp tail — are re-verified against
    * the exact gram set, so the RESULT IS IDENTICAL to [[ngramOverlap]]:
    * false positives die in the verify join, which now probes a
    * prefiltered, near-empty input and can afford a shuffle join when the
    * eval side outgrows broadcast (no hint — AQE decides).
    */
  def ngramOverlapBloom(
      corpus: DataFrame,
      evalSet: DataFrame,
      n: Int = 8,
      expectedGrams: Long = 1L << 22,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    import graft.functions.{BloomContains, SerializableBloom}
    val evalGrams = Dedup.persistPublic(evalSet
      .select(explode(
        call_function("graft_shingle_hashes", col("text"), lit(n))).as("g"))
      .distinct())
    val bloom = SerializableBloom.from(
      evalGrams.stat.bloomFilter("g", expectedGrams, fpp))
    val probe = GraftSqlBridge.column(
      BloomContains(GraftSqlBridge.expressionNoSpark(col("g")), bloom))
    corpus
      .select(col("doc_id"),
        explode(call_function("graft_shingle_hashes", col("text"), lit(n))).as("g"))
      .filter(probe)
      .join(evalGrams, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** The corpus with contaminated documents removed: anti join against the
    * flagged set (threshold `minShared` distinct grams).
    */
  def clean(
      corpus: DataFrame, evalSet: DataFrame, n: Int = 8,
      minShared: Long = 1L): DataFrame = {
    val flagged = ngramOverlap(corpus, evalSet, n)
      .filter(col("n_shared") >= minShared)
      .select(col("doc_id"))
    corpus.join(flagged, Seq("doc_id"), "left_anti")
  }

  /** [[clean]] over the Bloom-prefiltered path — same output (the
    * prefilter is exact-verified), sized for eval sets beyond broadcast.
    */
  def cleanBloom(
      corpus: DataFrame, evalSet: DataFrame, n: Int = 8,
      minShared: Long = 1L,
      expectedGrams: Long = 1L << 22, fpp: Double = 0.01): DataFrame = {
    val flagged = ngramOverlapBloom(corpus, evalSet, n, expectedGrams, fpp)
      .filter(col("n_shared") >= minShared)
      .select(col("doc_id"))
    corpus.join(flagged, Seq("doc_id"), "left_anti")
  }

  /** SEMANTIC decontamination: corpus items whose embedding is too close
    * (cosine ≥ `tau`) to any eval-set embedding — the check that catches
    * translated / heavily-paraphrased benchmark leakage where neither the
    * verbatim grams ([[ngramOverlap]]) nor the shingle sets
    * ([[fuzzyPairs]]) survive. Same scale contract as the other decon
    * paths: the eval set is benchmark-sized and BROADCAST; the corpus
    * side is ONE map-side pass (cross join against the broadcast + the
    * fused codegen'd cosine kernel) and only (vec_id, partial hit
    * count/max) rows — near-empty, contamination is rare — reach the
    * final aggregate. Corpus embeddings never shuffle.
    *
    * Output: (vec_id, n_eval_hits, max_sim) for flagged corpus items.
    * Scores are the strict left-to-right `graft_cosine` fold, so the
    * threshold predicate and max are bit-reproducible cross-engine (the
    * a1 discipline).
    */
  def semanticFlags(corpus: DataFrame, evalSet: DataFrame, tau: Double): DataFrame = {
    val q = broadcast(evalSet.select(
      col("vec_id").as("eval_id"), col("embedding").as("qv")))
    corpus
      .select(col("vec_id"), col("embedding").as("cv"))
      .crossJoin(q)
      .select(col("vec_id"),
        call_function("graft_cosine", col("qv"), col("cv")).as("sim"))
      .filter(col("sim") >= lit(tau))
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_eval_hits"), max(col("sim")).as("max_sim"))
  }

  /** FUZZY decontamination: corpus documents that are near-duplicates of
    * an eval document (paraphrase-level leakage the verbatim
    * [[ngramOverlap]] check misses — reworded benchmark questions still
    * share most of their shingle set). MinHash-LSH candidates against the
    * eval set's band index ([[Dedup.minhashIndex]] — benchmark-sized, so
    * it BROADCASTS), then the exact Jaccard predicate decides; identical
    * discipline to `Dedup.minhashLshPairs`, with the self-join replaced by
    * a corpus⋈eval probe, so the corpus never self-shuffles. Output:
    * (doc_id, eval_id, jaccard ≥ threshold) — a pair colliding in several
    * bands appears once per band; aggregate or distinct downstream.
    */
  def fuzzyPairs(
      corpus: DataFrame,
      evalSet: DataFrame,
      shingleLen: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.8): DataFrame = {
    // divisibility-checked: a truncated banding here would probe the eval
    // index with DIFFERENT buckets than the index was built with
    val rows = Dedup.bandRows(numHashes, bands, "fuzzyPairs")
    val idx = broadcast(Dedup.minhashIndex(evalSet, shingleLen, numHashes, bands)
      .select(col("doc_id").as("eval_id"), col("hs").as("e_hs"),
        col("n").as("e_n"), col("band"), col("bucket")))
    corpus
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", col("text"), lit(shingleLen)).as("hs"))
      .withColumn("n", size(col("hs")))
      .filter(col("n") > 0)
      .withColumn("sig", call_function("graft_minhash", col("hs"), lit(numHashes)))
      .select(col("doc_id"), col("hs"), col("n"),
        posexplode(Dedup.bandBuckets(col("sig"), bands, rows))
          .as(Seq("band", "bucket")))
      .join(idx, Seq("band", "bucket"))
      .filter(Dedup.sizeRatioAtLeast(col("n"), col("e_n"), threshold))
      .withColumn("inter",
        call_function("graft_intersect_size", col("hs"), col("e_hs")).cast("double"))
      .withColumn("uni",
        col("n").cast("double") + col("e_n").cast("double") - col("inter"))
      .filter(col("uni") > 0 && col("inter") / col("uni") >= lit(threshold))
      .select(col("doc_id"), col("eval_id"),
        (col("inter") / col("uni")).as("jaccard"))
  }

  /** CHAR-granular decontamination SURGERY — d24's excision pointed at
    * the eval set (the c9→c10 relationship at character level): every
    * char position of a corpus document covered by an `n`-char window
    * (of the lowercased text) that appears VERBATIM anywhere in the
    * eval set is removed, and the document is kept. Catches leakage
    * the token-window form cannot see — an eval string embedded in a
    * URL, a code literal, or unsegmented text — which is exactly where
    * benchmark answers hide in web corpora (the GPT-3/Lee et al.
    * char-overlap decontamination regime). Union-of-windows = the
    * maximal leaked substring, the d24 property.
    *
    * Scale shape: the eval side is benchmark-sized by contract, so its
    * DISTINCT window strings broadcast (the c1/c9 discipline — the
    * join is on RAW strings, no hash, collision-freedom by
    * construction); the corpus side enumerates windows map-side and
    * only (doc_id, pos) survivor rows reach the cover aggregate;
    * the rebuild is the shared d24 indexed filter. Output
    * `(doc_id, n_chars, n_removed, clean_text)` — one row per corpus
    * document.
    */
  def charOverlapExcise(corpus: DataFrame, evalSet: DataFrame,
      n: Int = 40, textCol: String = "text"): DataFrame = {
    require(n >= 2, s"window length must be >= 2, got $n")
    def windows(df: DataFrame) =
      df.select(col("doc_id"), lower(col(textCol)).as("t"))
        .filter(length(col("t")) >= n)
        .select(col("doc_id"),
          explode(sequence(lit(0), length(col("t")) - n)).as("pos"),
          col("t"))
        .select(col("doc_id"), col("pos"),
          expr(s"substring(t, pos + 1, $n)").as("g"))
    val evalW = windows(evalSet).select(col("g")).distinct()
    val covers = windows(corpus)
      .join(broadcast(evalW), Seq("g"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + n - 1)).as("i"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("i")).as("cov"))
    Dedup.rebuildExcisedChars(
      corpus.select(col("doc_id"), lower(col(textCol)).as("t")), covers)
  }
}
