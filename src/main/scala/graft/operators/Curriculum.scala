package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The curriculum RANKING INDEX — s15's per-source md5-ordered top-B
  * ranking persisted as a lifecycle store (the s16 operator): s15
  * re-ranked the whole corpus per run, but its own prefix-stability
  * property is exactly what makes the ranking INCREMENTAL — the pick
  * lists are prefixes of one per-source total order `(md5(doc_id),
  * doc_id)`, so an arriving drop merges into the persisted heap state
  * with cost ∝ index + drop, and the corpus is never re-ranked.
  *
  * Store schema: one row per ranked doc, `(source, doc_id, h, rank,
  * n_src)` — the [[graft.plans.TopKPerKey]] top-`k` per source with
  * the hash it ranked by, plus the source's FULL corpus count
  * (`n_src`, constant within a source), which is what the quota
  * apportionment needs so serving never touches the corpus either.
  *
  * Lifecycle:
  *  - MERGE ([[curriculumIndexMerge]]) is EXACT: top-k of (top-k(S) ∪
  *    D) = top-k(S ∪ D) — an element outside the old top-k has k
  *    better elements that are all still present — so the merged
  *    index is bit-identical to a rebuild on the union (spec-pinned),
  *    at cost ∝ index + drop.
  *  - DELETE ([[curriculumIndexDelete]]) is the PREFIX contract (the
  *    prefixIndexDelete discipline): revoked rows leave by one anti
  *    join and survivors re-rank in place; the global order is
  *    untouched, so the result is rank-for-rank the PREFIX of a full
  *    rebuild on the survivors — exact for every quota that fits the
  *    surviving length, while docs below the old top-k that a rebuild
  *    would promote into the tail are (documented) not re-admitted
  *    without a rebuild. Counts decrement from the revoked rows alone.
  *    With an OVERFLOW BUFFER ([[curriculumOverflow]] — the rows
  *    ranked (k, k+pad] per source, persisted beside the index) the
  *    delete is EXACTLY the rebuild as long as no saturated source
  *    loses more than `pad` stored rows, and RAISES (assert in the
  *    returned plan) when the buffer is exhausted instead of silently
  *    serving short — closing the below-k divergence for bounded
  *    revocation rates at the cost of `pad` extra rows per source.
  *  - The roundtrip `delete(merge(idx, drop), drop)` restores idx's
  *    counts exactly and its rows as a per-source PREFIX (spec-
  *    pinned): surviving old rows keep their original relative order
  *    and ranks, but old rows the drop displaced OUT of a saturated
  *    top-k are gone from the store and — like every delete-promoted
  *    tail — come back only with a rebuild. A source the drop never
  *    saturated roundtrips bit-exactly.
  *
  * Serving ([[curriculumServe]]) replays s15's quota machinery —
  * Hamilton apportionment of the temperature and proportional
  * weights, the 4-epoch integer anneal — from the index's O(sources)
  * count rows, and trims the ranking to each epoch's quota. Output
  * and arithmetic are s15's exactly, so
  * `curriculumServe(merge(index(older), drop)) ≡ s15(older ∪ drop)`
  * is DuckDB-replayable with s15's own row_number oracle (the s16
  * gate).
  */
object Curriculum {

  /** Build the ranking store from a corpus snapshot: one bounded-heap
    * pass ([[graft.plans.TopKPerKey]] — never a full sort) plus one
    * map-combinable per-source count.
    */
  def curriculumIndex(docs: DataFrame, k: Int = 1000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val hashed = docs.select(col("source"), col("doc_id"),
      md5(col("doc_id").cast("string")).as("h"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    graft.plans.TopKPerKey(hashed, Seq(col("source")),
        Seq(col("h").asc, col("doc_id").asc), k)
      .join(counts, Seq("source"))
      .select(col("source"), col("doc_id"), col("h"),
        col("rank").cast("long").as("rank"), col("n_src"))
  }

  /** COMPACTION: fold an arriving drop (disjoint doc_ids — the
    * snapshot contract) into the persisted ranking. The heap re-runs
    * over index rows ∪ the drop's hashed rows — never the base
    * corpus — and counts fold per source (new sources bootstrap).
    * Bit-identical to `curriculumIndex(base ∪ drop, k)`.
    */
  def curriculumIndexMerge(index: DataFrame, drop: DataFrame,
      k: Int = 1000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val dropH = drop.select(col("source"), col("doc_id"),
      md5(col("doc_id").cast("string")).as("h"))
    val dropCnt = drop.groupBy(col("source")).agg(count(lit(1)).as("dn"))
    val oldCnt = index.select(col("source"), col("n_src")).distinct()
    val newCnt = oldCnt.join(dropCnt, Seq("source"), "full_outer")
      .select(col("source"),
        (coalesce(col("n_src"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_src"))
    val cand = index.select(col("source"), col("doc_id"), col("h"))
      .unionByName(dropH)
    graft.plans.TopKPerKey(cand, Seq(col("source")),
        Seq(col("h").asc, col("doc_id").asc), k)
      .join(newCnt, Seq("source"))
      .select(col("source"), col("doc_id"), col("h"),
        col("rank").cast("long").as("rank"), col("n_src"))
  }

  /** The OVERFLOW BUFFER: the rows ranked `(k, k+pad]` per source under
    * the same total order — the delete's refill stock. Persisted
    * beside the index (it is NOT part of the serving store: quotas,
    * merges, and the s16/x26 counts see exactly the top-k rows they
    * always did). `(source, doc_id, h)` — rank and count re-derive on
    * use. Same bounded-heap build shape as the index.
    */
  def curriculumOverflow(docs: DataFrame, k: Int = 1000,
      pad: Int = 32): DataFrame = {
    require(k >= 1 && pad >= 1, s"k and pad must be >= 1, got k=$k pad=$pad")
    val hashed = docs.select(col("source"), col("doc_id"),
      md5(col("doc_id").cast("string")).as("h"))
    graft.plans.TopKPerKey(hashed, Seq(col("source")),
        Seq(col("h").asc, col("doc_id").asc), k + pad)
      .filter(col("rank") > k)
      .select(col("source"), col("doc_id"), col("h"))
  }

  /** COMPACTION for the overflow buffer — the merge convention's tenth
    * persisted artifact advances WITH the index (r18 verdict task: a
    * merge that advances the index but not its buffer leaves the next
    * buffered delete exact against the wrong snapshot). Same heap
    * exactness argument as [[curriculumIndexMerge]] applied at depth
    * `k + pad`: index ∪ overflow IS the stored top-(k+pad) prefix of
    * the base snapshot, so top-(k+pad) of (index ∪ overflow ∪ drop) =
    * top-(k+pad) of (base ∪ drop), and rows ranked `(k, k+pad]` of
    * that are EXACTLY `curriculumOverflow(base ∪ drop, k, pad)`
    * (spec-pinned with the post-merge buffered delete). Cost ∝ index +
    * buffer + drop — the corpus is never re-ranked.
    */
  def curriculumOverflowMerge(index: DataFrame, overflow: DataFrame,
      drop: DataFrame, k: Int = 1000, pad: Int = 32): DataFrame = {
    require(k >= 1 && pad >= 1, s"k and pad must be >= 1, got k=$k pad=$pad")
    val dropH = drop.select(col("source"), col("doc_id"),
      md5(col("doc_id").cast("string")).as("h"))
    val cand = index.select(col("source"), col("doc_id"), col("h"))
      .unionByName(overflow.select(col("source"), col("doc_id"), col("h")))
      .unionByName(dropH)
    graft.plans.TopKPerKey(cand, Seq(col("source")),
        Seq(col("h").asc, col("doc_id").asc), k + pad)
      .filter(col("rank") > k)
      .select(col("source"), col("doc_id"), col("h"))
  }

  /** TAKEDOWN: revoked rows leave by one anti join, survivors re-rank
    * in place (one index-sized window — the order itself never
    * changes), counts decrement from the revoked rows alone (`revoked`
    * carries (doc_id, source) — `Privacy.retentionExpiry`'s shape).
    * Rank-for-rank the PREFIX of a rebuild on the survivors; sources
    * whose count reaches zero drop entirely.
    *
    * With `overflow` supplied (built by [[curriculumOverflow]] for the
    * SAME snapshot and the same `k` — the caller's snapshot contract),
    * survivors of index ∪ overflow re-rank together and trim to `k`:
    * since both prefixes share one per-source total order, the result
    * is EXACTLY `curriculumIndex(survivors, k)` whenever each source
    * still has ≥ min(k, n_src_after) stored survivors — i.e. until a
    * saturated source loses more than `pad` stored rows. Beyond that
    * the call RAISES EAGERLY (the violation count is evaluated as its
    * own action before the plan is returned) instead of silently
    * serving a short ranking: buffer exhaustion is a rebuild-now
    * signal, not a degraded answer. Eager, not in-plan, deliberately:
    * an assert riding the returned plan can be optimized AWAY — a
    * downstream predicate pushed through a zero-row guard branch
    * constant-folds on its literal-null columns and prunes the
    * assert's subtree, and a per-row raise never fires when the
    * consumer's filter leaves zero rows — so the lazy forms guard only
    * some consumption shapes. The price is one extra (window-free)
    * pass over index ∪ overflow at call time, ∝ the index, same order
    * as the delete itself.
    *
    * CONTRACT (the n_src decrement trusts the request): `revoked` must
    * be a subset of the indexed corpus, applied EXACTLY ONCE — the
    * store ranks only the top-k per source but counts the WHOLE
    * source, so a revoked doc outside the top-k is invisible to the
    * store and its decrement cannot be membership-checked against
    * index rows (checking would need a persisted per-source membership
    * the index deliberately does not carry). Restating the same
    * (source, doc_id) WITHIN one request is harmless — the request
    * dedups below — but replaying a whole request, or revoking a doc
    * the source never held, over-decrements n_src, skews the Hamilton
    * quotas, and can drop a live source via the n_src > 0 filter.
    * Unlike componentsIndexDelete this delete is NOT idempotent.
    */
  def curriculumIndexDelete(index: DataFrame, revoked: DataFrame,
      overflow: Option[DataFrame] = None, k: Int = 1000): DataFrame = {
    // within-request replay guard: the same revocation stated twice in
    // one request is one revocation (cross-request replay remains the
    // caller's exactly-once obligation — see the contract above)
    val rev = revoked.select(col("source"), col("doc_id")).distinct()
    val revIds = rev.select(col("doc_id"))
    val revCnt = rev.groupBy(col("source")).agg(count(lit(1)).as("rn"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
    overflow match {
      case None =>
        index.join(revIds, Seq("doc_id"), "left_anti")
          .join(revCnt, Seq("source"), "left")
          .select(col("source"), col("doc_id"), col("h"),
            row_number().over(w).cast("long").as("rank"),
            (col("n_src") - coalesce(col("rn"), lit(0L))).as("n_src"))
          .filter(col("n_src") > 0)
      case Some(over) =>
        require(k >= 1, s"k must be >= 1, got $k")
        // post-delete per-source counts, from the index's count rows +
        // the request alone (the overflow carries no counts)
        val cntAfter = index.select(col("source"), col("n_src")).distinct()
          .join(revCnt, Seq("source"), "left")
          .select(col("source"),
            (col("n_src") - coalesce(col("rn"), lit(0L))).as("n_src"))
          .filter(col("n_src") > 0)
        val stored = index.select(col("source"), col("doc_id"), col("h"))
          .unionByName(over.select(col("source"), col("doc_id"), col("h")))
        // EAGER exhaustion gate: a source with FEWER than min(k,
        // n_src_after) stored survivors means more than `pad` of its
        // stored rows were revoked — the rebuild would promote rows the
        // store never kept. Evaluated NOW as its own action (see the
        // Scaladoc: any in-plan form — zero-row union branch or per-row
        // conditional raise — is prunable by a downstream predicate
        // pushed into the returned plan, and would then silently serve
        // short). Window-free: n_served = min(k, n_stored_survivors),
        // so n_served < min(k, n_src_after) ⟺ n_stored_survivors <
        // min(k, n_src_after) — a count per source suffices, no rank
        // needed. A source whose stored rows ALL left appears only in
        // cntAfter; the left join's null count coalesces to 0 and still
        // violates, so total exhaustion raises too.
        val storedSurv = stored.join(revIds, Seq("doc_id"), "left_anti")
          .groupBy(col("source")).agg(count(lit(1)).as("n_stored"))
        val nViol = cntAfter.join(storedSurv, Seq("source"), "left")
          .filter(coalesce(col("n_stored"), lit(0L)) <
            least(lit(k.toLong), col("n_src")))
          .count()
        if (nViol > 0) throw new IllegalStateException(
          s"curriculumIndexDelete: overflow buffer exhausted — $nViol " +
            "source(s) lost more than `pad` stored rows; rebuild the " +
            "index (and its overflow) from the surviving corpus")
        stored
          .join(revIds, Seq("doc_id"), "left_anti")
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= k)
          .join(cntAfter, Seq("source"))
          .select(col("source"), col("doc_id"), col("h"), col("rank"),
            col("n_src"))
    }
  }

  /** The s15 serving face, INDEX-ONLY: quotas (Hamilton apportionment
    * of the √n temperature weights and the proportional weights,
    * 4-epoch integer anneal — s15's arithmetic verbatim) from the
    * store's O(sources) count rows, pick lists by trimming the stored
    * ranking to each epoch's quota. Output `(epoch, source, rank,
    * doc_id)`, prefix-stable across epochs like s15.
    */
  def curriculumServe(index: DataFrame, budget: Long = 1000L,
      epochs: Int = 4): DataFrame = {
    require(budget >= 1 && epochs >= 2,
      s"need budget >= 1 and epochs >= 2 (the anneal divides by " +
        s"epochs - 1), got $budget/$epochs")
    val wnd = Window
    val counts = index.select(col("source"), col("n_src").as("n_docs"))
      .distinct()
    def hamilton(wt: org.apache.spark.sql.Column, out: String) =
      counts.select(col("source"), wt.as("wt"))
        .withColumn("wtot", sum(col("wt")).over(wnd.partitionBy()))
        .select(col("source"),
          expr(s"($budget * wt) div wtot").as("base_n"),
          expr(s"($budget * wt) % wtot").as("rem"))
        .withColumn("leftover",
          lit(budget) - sum(col("base_n")).over(wnd.partitionBy()))
        .withColumn("rk", row_number().over(
          wnd.orderBy(col("rem").desc, col("source"))))
        .select(col("source"),
          (col("base_n") +
            when(col("rk") <= col("leftover"), 1L).otherwise(0L))
            .as(out))
    val qt = hamilton(
      floor(sqrt(col("n_docs").cast("double"))).cast("long"), "q_temp")
    val qp = hamilton(col("n_docs"), "q_prop")
    val we = Window.partitionBy(col("epoch"))
    val e = epochs - 1
    val spark = index.sparkSession
    val quotas = qt.join(qp, Seq("source"))
      .crossJoin(spark.range(0, epochs).select(col("id").as("epoch")))
      .select(col("epoch"), col("source"),
        ((lit(e.toLong) - col("epoch")) * col("q_temp") +
          col("epoch") * col("q_prop")).as("rr"))
      .select(col("epoch"), col("source"),
        expr(s"rr div $e").as("base_n"), expr(s"rr % $e").as("rem"))
      .withColumn("leftover", lit(budget) - sum(col("base_n")).over(we))
      .withColumn("rk", row_number().over(
        we.orderBy(col("rem").desc, col("source"))))
      .select(col("epoch"), col("source"),
        (col("base_n") +
          when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("quota"))
    index
      .join(broadcast(quotas), Seq("source"))
      .filter(col("rank") <= col("quota"))
      .select(col("epoch"), col("source"), col("rank"), col("doc_id"))
      .orderBy(col("epoch"), col("source"), col("rank"))
  }
}
