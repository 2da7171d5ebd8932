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
}
