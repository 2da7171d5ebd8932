package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Frequency-gated secret redaction — the k-anonymity text scrub
  * (Carlini et al. USENIX'21 memorization regime): a digit-bearing
  * token is PII-risky exactly when it is RARE, so candidates (tokens
  * carrying a digit run of length >= minDigitRun) are redacted iff
  * they appear in fewer than `k` distinct documents corpus-wide.
  * Frequent codes (years, common model numbers, public constants)
  * survive; one-off keys, account numbers, and phone fragments do not.
  * This is the corpus-level complement to the pattern-only
  * `TextFunctions.redactPii` (t10): a regex can say "looks like a
  * number", only the corpus can say "is unique to one document".
  *
  * Also home to the retention/TTL half of data governance
  * ([[retentionExpiry]]/[[retentionSweep]]): policy-driven expiry that
  * emits exactly the revoked-set shape the d23/d26 takedown paths
  * consume, so scheduled deletion and request-driven deletion share
  * one index-lifecycle machinery.
  *
  * No analogue in the reference (no text surface); part of the
  * training-data extension family.
  *
  * Scale shape: candidate extraction is map-only (a codegen'd
  * filter+rlike over the token array — bodies never leave their row);
  * ONLY candidate tokens shuffle, and the per-doc DISTINCT projection
  * bounds that at (docs x distinct digit tokens per doc), a sliver of
  * the corpus. The doc-frequency qualification is one map-combinable
  * count on the token, the rare set joins back per-doc as a small
  * string array (left-semi + collect_set keyed on doc_id), and the
  * rewrite is a map-side transform. With the corpus doc_id-bucketed
  * (the d20 posture, [[Bucketing]]), the join-back exchanges only the
  * candidate side and text never enters a shuffle.
  */
object Privacy {

  /** Digit-run candidate predicate as a Spark regex (RE2-safe — no
    * lookarounds, no unicode classes, so Java and DuckDB agree).
    */
  private def runPattern(minDigitRun: Int): String = s"[0-9]{$minDigitRun}"

  /** Per-document DISTINCT candidate tokens: lowercased whitespace
    * tokens carrying a digit run of length >= `minDigitRun`. The
    * distinct projection happens INSIDE the row (array_distinct on the
    * filtered array) before the explode, so duplicate occurrences
    * within one document never reach the shuffle.
    */
  def candidateSecrets(docs: DataFrame, minDigitRun: Int = 4,
      textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
        explode(array_distinct(filter(
          TextFunctions.tokens(col(textCol)),
          t => t.rlike(runPattern(minDigitRun))))).as("tok"))

  /** Corpus doc-frequency of every candidate token — the persisted
    * index shape for the incremental form ([[secretScrubAgainstIndex]]):
    * one row per candidate token with its distinct-document count.
    * Counted rows make the index delete/merge-capable with the d23/d25
    * delta arithmetic (decrement on takedown, full-outer fold on
    * compaction).
    */
  def secretFrequencies(docs: DataFrame, minDigitRun: Int = 4,
      textCol: String = "text"): DataFrame =
    candidateSecrets(docs, minDigitRun, textCol)
      .groupBy(col("tok")).agg(count(lit(1)).as("nd"))

  /** Redact every occurrence of a rare candidate token (corpus doc
    * frequency < `k`); emit per doc the token count, the distinct rare
    * secrets seen, the occurrences masked, and the rewritten text
    * (redacted tokens become `<secret>`, order preserved, lowercased
    * whitespace re-join — the d20 clean-text contract).
    */
  def secretScrub(docs: DataFrame, k: Int = 3, minDigitRun: Int = 4,
      textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minDigitRun >= 1, s"minDigitRun must be >= 1, got $minDigitRun")
    // the candidate frame feeds BOTH the frequency aggregate and the
    // rare-set join-back — persist it (the spanExciseChars shared-map
    // discipline, released by Dedup.unpersistAll between serving
    // batches) so the tokenize+regex corpus pass runs once, not twice
    val cand = Dedup.persistPublic(candidateSecrets(docs, minDigitRun, textCol))
    val rare = cand.groupBy(col("tok")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") < k).select(col("tok"))
    val rset = cand.join(rare, Seq("tok"), "left_semi")
      .groupBy(col("doc_id")).agg(collect_set(col("tok")).as("rt"))
    scrubWithRareSets(docs, rset, textCol)
  }

  /** Incremental form — the daily-drop / streaming posture (the d22
    * discipline): an arriving drop scrubs against a PERSISTED
    * [[secretFrequencies]] index of the base corpus. A drop token is
    * redacted when its base frequency plus its within-drop distinct-doc
    * count stays under `k` — so a secret that is rare in the base but
    * suddenly common in the drop (a leaked key pasted everywhere)
    * still survives only if the COMBINED evidence clears the
    * anonymity bar. One left join of drop candidates against the index
    * (fixed-width rows only), one drop-side count, the same map-side
    * rewrite; the per-doc decision reads only the static index plus
    * the current batch, which is what gives it a streaming twin.
    */
  def secretScrubAgainstIndex(drop: DataFrame, freqIndex: DataFrame,
      k: Int = 3, minDigitRun: Int = 4,
      textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // persisted for the same two-consumer reason as secretScrub's.
    // Release obligation: batch callers free it via Dedup.unpersistAll
    // once results are materialized; the streaming twin
    // (EventsStream.secretScrubStream) frees it PER BATCH via
    // Dedup.releaseScope — without one of the two, repeated calls
    // accumulate cached frames without bound (r16 ADVICE).
    val cand = Dedup.persistPublic(candidateSecrets(drop, minDigitRun, textCol))
    val dropNd = cand.groupBy(col("tok")).agg(count(lit(1)).as("drop_nd"))
    val rare = dropNd
      .join(freqIndex.select(col("tok"), col("nd").as("base_nd")),
        Seq("tok"), "left")
      .filter(coalesce(col("base_nd"), lit(0L)) + col("drop_nd") < k)
      .select(col("tok"))
    val rset = cand.join(rare, Seq("tok"), "left_semi")
      .groupBy(col("doc_id")).agg(collect_set(col("tok")).as("rt"))
    scrubWithRareSets(drop, rset, textCol)
  }

  /** TAKEDOWN on the persisted secret-frequency index (the d23 delta
    * arithmetic on the counted rows): per-token decrements come from
    * the REVOKED documents alone (their per-doc DISTINCT candidates —
    * each doc contributes at most 1 per token, so the decrement is
    * exact), tokens reaching nd = 0 drop. Bit-identical to
    * `secretFrequencies(survivors)` (spec-pinned); cost ∝ the takedown
    * set, never the corpus. NOTE the privacy direction: deleting docs
    * can only LOWER counts, so a previously-shared secret can fall
    * back under k and future scrubs redact MORE — takedown never
    * weakens the gate.
    */
  def secretIndexDelete(index: DataFrame, revoked: DataFrame,
      minDigitRun: Int = 4, textCol: String = "text"): DataFrame = {
    val deltas = secretFrequencies(revoked, minDigitRun, textCol)
      .select(col("tok"), col("nd").as("dnd"))
    index.join(deltas, Seq("tok"), "left")
      .select(col("tok"),
        (col("nd") - coalesce(col("dnd"), lit(0L))).as("nd"))
      .filter(col("nd") > 0)
  }

  /** COMPACTION on the secret-frequency index — the append half (the
    * d25 discipline): an arriving drop's per-token distinct-doc counts
    * fold in with one full-outer merge on the token; the base corpus
    * is never re-read. Bit-identical to rebuilding over base ∪ drop
    * for disjoint doc_ids (the snapshot contract), and the lifecycle
    * roundtrips: `delete(merge(idx, drop), drop) ≡ idx`. Merging into
    * an EMPTY index bootstraps it.
    */
  def secretIndexMerge(index: DataFrame, drop: DataFrame,
      minDigitRun: Int = 4, textCol: String = "text"): DataFrame = {
    val deltas = secretFrequencies(drop, minDigitRun, textCol)
      .select(col("tok"), col("nd").as("dnd"))
    index.join(deltas, Seq("tok"), "full_outer")
      .select(col("tok"),
        (coalesce(col("nd"), lit(0L)) + coalesce(col("dnd"), lit(0L)))
          .as("nd"))
  }

  /** Retention/TTL expiry set — the SCHEDULED counterpart to the d23
    * takedown (takedown answers a request; retention enforces a
    * policy on a clock): given a per-source policy `(source,
    * retention_days)` and a docs relation carrying an `ingest_day`,
    * return the rows whose age at `asOfDay` has reached their source's
    * retention, annotated with `age_days` and `retention_days`. The
    * result is exactly the revoked-set shape the d23/d26 delete paths
    * and the x22 audit consume — retention composes into the same
    * index-lifecycle machinery instead of owning a second delete path.
    * A source with no policy row never expires (null retention —
    * "keep" is the safe default for an unconfigured source; an
    * organization wanting default-delete ships a catch-all policy
    * row per source, which is what makes the rule explicit and
    * auditable). Map-only over the corpus: the policy is an
    * O(sources) broadcast, the verdict is row-local arithmetic.
    */
  def retentionExpiry(docs: DataFrame, policy: DataFrame,
      asOfDay: Long): DataFrame =
    docs.join(broadcast(policy), Seq("source"), "left")
      .withColumn("age_days", lit(asOfDay) - col("ingest_day"))
      .filter(col("retention_days").isNotNull &&
        col("age_days") >= col("retention_days"))

  /** Per-source retention sweep report — the governance rollup a
    * scheduled retention job emits before it fires the deletes: doc
    * counts, how many are past retention (exact ppm), and the oldest
    * SURVIVING ingest day (null when the sweep empties the source —
    * the signal a policy is eating a source alive). One broadcast
    * policy join + one map-combinable O(sources) aggregate.
    */
  def retentionSweep(docs: DataFrame, policy: DataFrame,
      asOfDay: Long): DataFrame =
    docs.join(broadcast(policy), Seq("source"), "left")
      .select(col("source"), col("retention_days"), col("ingest_day"),
        (lit(asOfDay) - col("ingest_day")).as("age_days"))
      .withColumn("expired", col("retention_days").isNotNull &&
        col("age_days") >= col("retention_days"))
      .groupBy(col("source"), col("retention_days"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("expired"), lit(1L)).otherwise(lit(0L)))
          .as("n_expired"),
        min(when(!col("expired"), col("ingest_day")))
          .as("oldest_surviving_day"))
      .withColumn("expired_ppm", expr("(1000000 * n_expired) div n_docs"))
      .select(col("source"), col("retention_days"), col("n_docs"),
        col("n_expired"), col("expired_ppm"), col("oldest_surviving_day"))

  /** Shared rewrite: join the per-doc rare-token arrays back and mask
    * occurrences in place (order-preserving transform; docs with no
    * rare token pass through with counts 0).
    */
  private def scrubWithRareSets(docs: DataFrame, rset: DataFrame,
      textCol: String): DataFrame = {
    val toks = docs.select(col("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    // shuffle_hash, not broadcast: the rare-set frame's collect_set
    // arrays are priced at the array type's default width by the
    // size-only estimator, so it can be picked for broadcast while its
    // real size scales with the corpus (the r19 cover-join lesson —
    // see Dedup.rebuildExcisedChars)
    toks.join(rset.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        coalesce(col("rt"), array().cast("array<string>")).as("rt"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(col("rt")).cast("long").as("n_secrets"),
        size(filter(col("toks"),
          t => array_contains(col("rt"), t))).cast("long").as("n_redacted"),
        array_join(transform(col("toks"),
          t => when(array_contains(col("rt"), t), lit("<secret>"))
            .otherwise(t)), " ").as("clean_text"))
  }
}
