package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed evaluation statistics over scored corpora — the "did the
  * learned filter actually rank well" half of a curation pipeline (the
  * fit half is [[Probe]]).
  *
  * No analogue in the reference (no ML surface); part of the
  * training-data extension family.
  */
object Stats {

  /** Training-shard manifest body — ONE definition shared by the batch
    * x14 gate query and the streaming twin
    * (`EventsStream.shardManifestStream`), so the shard rule and the
    * manifest columns cannot drift between them. Every doc maps to
    * shard = md5-bucket(doc_id) % nShards (content-independent,
    * refresh-stable); the per-shard row carries doc/token/char totals
    * and the id range. Map-only assignment + one map-combinable
    * aggregate; output is O(nShards) at any corpus size, exact longs.
    */
  def shardManifest(docs: DataFrame, nShards: Int = 16): DataFrame =
    docs
      .select(
        (graft.functions.TextFunctions.md5Bucket(col("doc_id")) % nShards)
          .as("shard"),
        col("doc_id"), col("n_chars"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("n_toks"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))

  /** Exact ROC-AUC of `scoreCol` against binary `labelCol` (1.0 =
    * positive), tie-aware (Mann-Whitney U with average ranks — ties
    * count half).
    *
    * Scale shape: a global rank statistic needs a global order, and the
    * naive form — `row_number() OVER (ORDER BY score)` — is an
    * unpartitioned window: every row through ONE task. This is instead
    * the textbook distributed prefix-sum, with the heavy lifting on
    * DISTINCT scores:
    *
    *  1. ONE hash aggregate to (score, n_pos, n_neg) — map-combinable,
    *     so duplicate scores collapse before the shuffle;
    *  2. `repartitionByRange(score)` of that (already reduced) frame —
    *     equal scores co-locate, ranges are balanced by sampling;
    *  3. per-range NEGATIVE totals — O(partitions) rows — collected and
    *     prefix-summed on the driver (the Lloyd/BPE bounded-driver-state
    *     discipline), then rejoined as a broadcast offset table;
    *  4. a window partitioned BY RANGE ID (each task sorts one balanced
    *     range, never the full corpus) finishes the local cumsum.
    *
    * Exactness: counts are longs; the pair count U is accumulated in
    * DOUBLED form (`u2 = Σ n_pos·(2·negBelow + n_neg)` — ties contribute
    * the odd half) so everything up to the final `u2 / (2·P·N)` division
    * is integer arithmetic, and that one division is the same IEEE op in
    * any engine. Output: one row (n_pos, n_neg, u2, auc).
    */
  def rankSumAuc(
      scored: DataFrame,
      scoreCol: Column,
      labelCol: Column,
      rangePartitions: Int = 32): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val dist = scored
      .select(scoreCol.as("s"), labelCol.cast("double").as("y"))
      .groupBy(col("s"))
      .agg(
        sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("y") === 1.0, 0L).otherwise(1L)).as("n_neg"))
    // range-partition the reduced frame and pin the partition id; persist
    // so the offset aggregate and the cumsum window read the SAME shuffle
    // output (pids must agree between the two consumers)
    val ranged = Dedup.persistPublic(
      dist.repartitionByRange(rangePartitions, col("s"))
        .withColumn("pid", spark_partition_id()))
    val offsets = ranged.groupBy(col("pid"))
      .agg(sum(col("n_neg")).as("part_neg"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val prefix = offsets
      .scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
      .sliding(2).collect { case Array((_, acc), (pid, _)) => (pid, acc) }
      .toSeq
    val offsetDf = broadcast(
      (if (prefix.isEmpty) Seq((0, 0L)) else prefix).toDF("pid", "neg_before_part"))
    val w = Window.partitionBy(col("pid")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val terms = ranged
      .join(offsetDf, Seq("pid"))
      .withColumn("neg_below",
        col("neg_before_part") + sum(col("n_neg")).over(w) - col("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        // decimal-routed: P·N pair counts overflow a long around 10^9.5
        // rows per class — decimal(38,0) holds any realistic corpus
        (col("n_pos").cast("decimal(38,0)") *
          (lit(2L) * col("neg_below") + col("n_neg")).cast("decimal(38,0)"))
          .as("u2"))
    terms.agg(
        coalesce(sum(col("n_pos")), lit(0L)).as("n_pos"),
        coalesce(sum(col("n_neg")), lit(0L)).as("n_neg"),
        coalesce(sum(col("u2")), lit(0L).cast("decimal(38,0)")).as("u2"))
      .select(col("n_pos"), col("n_neg"),
        // the doubled-U total is emitted as a long: engines surface wide
        // decimals inconsistently, and a corpus would need ~10^9.5 rows
        // PER CLASS before 2·P·N left long range (internal accumulation
        // stays decimal-routed above for exactly that regime)
        col("u2").cast("long").as("u2"),
        // AUC is undefined without both classes — NULL, not NaN (engines
        // disagree on 0/0)
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("u2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg"))).as("auc"))
  }
}
