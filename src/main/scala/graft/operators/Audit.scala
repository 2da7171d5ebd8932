package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The UNIFIED takedown audit — one `(store, n_before, n_after,
  * n_changed)` row per persisted lifecycle index, ALL EIGHT in one
  * artifact (r15 split this across x22's four and x24's three, with
  * per-query corpus conventions; a compliance officer wants one
  * record): span, charspan, tf-idf postings, minhash, streaming
  * prefix, secret-frequency, near-dup components, and IVF members.
  * Since r18 the historical x22/x24 keys are THIN VIEWS of this one
  * convention — the `stores` parameter selects the subset a view
  * serves, and only the selected stores' delete paths are planned.
  *
  * Every number comes from the DELETE PATHS running on the stale
  * stores (delta arithmetic / anti joins / the components edge
  * splice — the corpus is read only to build each index once and for
  * the revoked slice), so a hash-green audit against an oracle that
  * REBUILDS each store from surviving raw data certifies all eight
  * deletes end-to-end in one statement.
  *
  * Per-store n_changed semantics (documented, the x22/x24
  * conventions): counted/posting/prefix stores = index rows removed;
  * components = SURVIVING docs whose representative changed (a
  * takedown can split components); ivf_members = DISTINCT CELLS that
  * lost at least one member (the serving-relevant blast radius —
  * which probe lists shrank).
  *
  * Relations: `docs` carries (doc_id, lang, text) — one corpus, one
  * convention, every text store audits the same snapshot; `revoked`
  * carries full doc rows (doc_id + text — the span/charspan/secrets
  * deletes compute their deltas from the revoked documents alone, and
  * `Privacy.retentionExpiry`'s output is exactly this shape, so
  * scheduled expiry feeds the audit directly); `members` is the
  * persisted (vec_id, cell) IVF member table and `revokedVecs` its
  * (vec_id) takedown set.
  *
  * Scale shape: each store build is the operator's own documented
  * one-pass shape; each delete is ∝ the takedown set (components ∝
  * affected components' edges); the audit itself is eight O(1)
  * count aggregates unioned — nothing here adds a shuffle beyond the
  * stores' own builds. In the production posture every input is
  * PRE-STAGED: the stores persist (`prebuilt`), and the revocation
  * batch arrives as input rather than being carved from a corpus scan
  * — so the audit's cost is delete paths + counts alone.
  */
object Audit {

  /** The store names the audit knows — also the `stores` vocabulary. */
  val AllStores: Seq[String] = Seq("span_index", "charspan_index",
    "tfidf_postings", "mh_index", "prefix_index", "secrets_index",
    "components", "ivf_members")

  private def countRow(store: String, params: String, before: DataFrame,
      after: DataFrame): DataFrame =
    before.agg(count(lit(1)).as("n_before"))
      .crossJoin(after.agg(count(lit(1)).as("n_after")))
      .select(lit(store).as("store"), col("n_before"), col("n_after"),
        (col("n_before") - col("n_after")).as("n_changed"),
        lit(params).as("params"))

  /** `prebuilt` optionally supplies PERSISTED stores by name
    * (`span_index`, `charspan_index`, `tfidf_postings`, `mh_index`,
    * `prefix_index`, `secrets_index`, `components`) — the production
    * posture: every store the audit deletes from already exists on
    * disk, so the audit's cost is the eight DELETE paths plus O(1)
    * counts, never a build (x25 passes all seven text stores from its
    * materialized planted snapshot). A store not supplied — the SQL
    * TVF path, where the relations are arbitrary — builds inline from
    * `docs` with the documented parameters; a prebuilt store MUST have
    * been built with those same parameters (the caller's snapshot
    * contract, same as every materialized index). Because a prebuilt
    * store built under DIFFERENT parameters would yield plausible but
    * wrong before/after numbers with no error, every output row
    * carries a `params` column naming the parameters the audit ASSUMED
    * — the compliance record is self-describing, and a mismatch with
    * the store's build manifest is visible in the artifact itself.
    *
    * `stores` selects which audit rows to emit (default: all eight).
    * Unselected stores are never planned — a subset view pays only for
    * its own delete paths. Row construction is lazy per store, so an
    * inline build (and its scratch persists) happens only for selected,
    * non-prebuilt stores.
    */
  /** `docs`, `members`, and `revokedVecs` are BY-NAME: a subset view
    * whose `stores` exclude every inline build / the ivf row must not
    * force them — x27 selects the seven text stores and would otherwise
    * trigger the corpus-wide member-table build just to pass an
    * argument no selected path reads.
    */
  def takedownAudit(docs: => DataFrame, revoked: DataFrame,
      members: => DataFrame, revokedVecs: => DataFrame,
      spanN: Int = 8, charN: Int = 40, minDigitRun: Int = 4,
      num: Int = 4, den: Int = 5,
      prebuilt: Map[String, DataFrame] = Map.empty,
      stores: Seq[String] = AllStores): DataFrame = {
    val unknown = stores.filterNot(AllStores.contains)
    require(stores.nonEmpty && unknown.isEmpty,
      s"takedownAudit: stores must be a non-empty subset of " +
        s"${AllStores.mkString(", ")} — got ${unknown.mkString(", ")}")
    // a duplicated name would plan the store's delete path twice and
    // emit duplicate rows in the compliance artifact
    require(stores.distinct.size == stores.size,
      s"takedownAudit: stores must be distinct — got ${stores.mkString(", ")}")
    // Every selected store's delete path consumes the revocation set
    // (full rows or ids), and Catalyst plans each branch's copy of the
    // subtree independently — a COMPUTED set (x27's retention sweep:
    // corpus scan ⋈ policy) re-ran per branch, 30 corpus scans in one
    // x27 plan (guide §2.4/§5). Persist it once per statement when it
    // is genuinely computed; a pre-staged store (x25's pin_revoked_docs
    // parquet) stays a cheap rescan and is left alone. Released by the
    // caller's unpersistAll like every tracked frame.
    val rev = Dedup.persistIfComputed(revoked)
    val revIds = rev.select(col("doc_id"))
    def store(name: String)(build: => DataFrame): DataFrame =
      prebuilt.getOrElse(name, build)
    val rowByStore: Map[String, () => DataFrame] = Map(
      "span_index" -> (() => {
        val spanB = store("span_index")(Dedup.spanIndexCounted(docs, n = spanN))
        countRow("span_index", s"n=$spanN", spanB,
          Dedup.spanIndexDelete(spanB, rev, n = spanN))
      }),
      "charspan_index" -> (() => {
        val chB = store("charspan_index")(
          Dedup.spanIndexCountedChars(docs, n = charN))
        countRow("charspan_index", s"n=$charN", chB,
          Dedup.spanIndexCharsDelete(chB, rev, n = charN))
      }),
      "tfidf_postings" -> (() => {
        val postB = store("tfidf_postings")(Dedup.tfidfPostingsFull(docs))
        countRow("tfidf_postings", "gram_n=2", postB,
          Dedup.postingsDelete(postB, revIds))
      }),
      "mh_index" -> (() => {
        val mhB = store("mh_index")(Dedup.minhashIndex(docs, maxBandBucket = 0))
        countRow("mh_index", "shingle=3,hashes=32,bands=8", mhB,
          Dedup.minhashIndexDelete(mhB, revIds))
      }),
      "prefix_index" -> (() => {
        val pfB = store("prefix_index")(
          Dedup.incrementalIndex(docs, num = num, den = den))
        countRow("prefix_index", s"t=$num/$den", pfB,
          Dedup.prefixIndexDelete(pfB, revIds))
      }),
      "secrets_index" -> (() => {
        val secB = store("secrets_index")(
          Privacy.secretFrequencies(docs, minDigitRun))
        countRow("secrets_index", s"run=$minDigitRun", secB,
          Privacy.secretIndexDelete(secB, rev, minDigitRun))
      }),
      "components" -> (() => {
        val compStore = store("components")(Dedup.componentsIndex(docs))
        val compB = Dedup.componentsFromIndex(compStore)
        val compA = Dedup.componentsFromIndex(
          Dedup.componentsIndexDelete(compStore, revIds))
        compA
          .join(compB.withColumnRenamed("rep", "rep_b"), Seq("doc_id"))
          .agg(count(lit(1)).as("n_after"),
            sum(when(col("rep") =!= col("rep_b"), 1L).otherwise(0L))
              .as("n_changed"))
          .crossJoin(compB.agg(count(lit(1)).as("n_before")))
          .select(lit("components").as("store"), col("n_before"),
            col("n_after"), col("n_changed"),
            lit("n=1,t=0.95").as("params"))
      }),
      "ivf_members" -> (() => {
        val mem = members // force the by-name arg once for this thunk
        val revVecIds = revokedVecs.select(col("vec_id"))
        val memA = Similarity.ivfMembersDelete(mem, revVecIds)
        val lostCells = mem.join(revVecIds, Seq("vec_id"), "left_semi")
          .select(col("cell")).distinct()
        mem.agg(count(lit(1)).as("n_before"))
          .crossJoin(memA.agg(count(lit(1)).as("n_after")))
          .crossJoin(lostCells.agg(count(lit(1)).as("n_changed")))
          .select(lit("ivf_members").as("store"), col("n_before"),
            col("n_after"), col("n_changed"),
            lit("cells=caller").as("params"))
      }))
    stores.map(rowByStore(_)()).reduce(_ unionByName _)
      .orderBy(col("store"))
  }
}
