package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed data-layout primitives that replace the single-partition
  * idioms a laptop-scale pipeline reaches for. Companion to the
  * file-layout helpers in `graft.functions.LayoutExprFunctions`
  * (z-order); this object holds the ROW-layout side.
  */
object Layout {

  /** Contiguous global ids 0..N-1 in `key` order — the training-data
    * "assign every example a stable dense row id" primitive (shard
    * offsets, example ids, negative-sampling index spaces) — WITHOUT
    * the `row_number() OVER (ORDER BY key)` single-partition window
    * that serializes the whole corpus through one task at 100 TB.
    *
    * Shape: value-derived bucketing. `bucket = key div bucketWidth`
    * (floor division, so negative keys order correctly), then
    *   1. one map-combinable count per bucket → the O(B) bucket frame,
    *      B = key-range / bucketWidth;
    *   2. exclusive prefix-sum offsets via a window over that O(B)
    *      frame ONLY (the x12/x13 bounded-frame discipline — at 10¹²
    *      rows and width 2²⁰ that window sees ~10⁶ rows, not 10¹²);
    *   3. offsets broadcast back onto the bucketed rows;
    *   4. `row_number` partitioned BY BUCKET — per-task frames are
    *      bounded by bucketWidth rows for unique integral keys, so no
    *      task ever sees more than `bucketWidth` rows regardless of
    *      corpus size.
    *
    * Contract: `key` must be integral and UNIQUE (ids) — uniqueness
    * makes the order total, hence the assignment deterministic and
    * exactly replayable by a `row_number() OVER (ORDER BY key)` oracle.
    * Gaps in the key space are fine (that is the point: gid is the
    * RANK, not the key); empty buckets cost nothing (they never appear
    * in the count frame).
    */
  def globalIds(df: DataFrame, key: Column, outCol: String = "gid",
      bucketWidth: Long = 1L << 20): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    // floor division via pmod so key = -1 lands in bucket -1, not 0.
    // The quotient MUST be integral `div`, not Column./ (double
    // division): past 2^53 a double quotient can round into the wrong
    // bucket for non-power-of-two widths, breaking the contiguous-rank
    // contract. The numerator is an exact multiple of bucketWidth, so
    // truncating integral division IS floor division here.
    val k = key.cast("long")
    val bucket = call_function("div", k - pmod(k, lit(bucketWidth)),
      lit(bucketWidth))
    val bucketed = df.withColumn("__gid_b", bucket)
    val counts = bucketed.groupBy(col("__gid_b"))
      .agg(count(lit(1)).as("__gid_c"))
    // exclusive prefix sum over the O(B) bucket frame — the only
    // unpartitioned window, bounded by the bucket count, never by rows
    val offs = counts
      .withColumn("__gid_off",
        sum(col("__gid_c")).over(Window.orderBy(col("__gid_b")))
          - col("__gid_c"))
      .select(col("__gid_b"), col("__gid_off"))
    bucketed.join(broadcast(offs), Seq("__gid_b"))
      .withColumn(outCol,
        col("__gid_off") - 1 + row_number().over(
          Window.partitionBy(col("__gid_b")).orderBy(key)))
      .drop("__gid_b", "__gid_off")
  }

  /** Per-group INCLUSIVE running sum of `value` in `ord` order — the
    * `sum(value) OVER (PARTITION BY part ORDER BY ord)` shape — WITHOUT
    * the per-group single-task sort: a plain grouped window puts every
    * row of a group in ONE task, and at 100 TB the dominant group (the
    * majority language of a crawl, say 60%+) is a 60 TB sort on one
    * executor. Same two-level prefix-sum discipline as [[globalIds]]:
    *   1. value-derived bucketing (`ord div bucketWidth`, floor
    *      division) splits each group into bounded runs;
    *   2. one map-combinable sum per (group, bucket) → the O(B) bucket
    *      frame;
    *   3. exclusive per-group offsets via a window over that bounded
    *      frame ONLY (ordered by bucket — B = ord-range/bucketWidth
    *      rows per group, never row count);
    *   4. offsets broadcast back; each task then runs the local
    *      running sum over at most `bucketWidth` rows (unique integral
    *      `ord`) and adds its bucket's offset.
    *
    * Contract: `ord` must be integral and UNIQUE within its group (the
    * [[globalIds]] totality condition), `value` integral — long
    * addition is associative, so the split-and-offset recomposition is
    * BIT-IDENTICAL to the single-window form and replays in a plain
    * `SUM() OVER ()` SQL oracle.
    */
  def groupedRunningSum(df: DataFrame, part: Column, ord: Column,
      value: Column, outCol: String,
      bucketWidth: Long = 1L << 20): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    // floor division via pmod — the globalIds discipline (exact for
    // negative keys, no double-division rounding past 2^53)
    val k = ord.cast("long")
    val bucket = call_function("div", k - pmod(k, lit(bucketWidth)),
      lit(bucketWidth))
    val bucketed = df.withColumn("__rs_b", bucket).withColumn("__rs_p", part)
    val totals = bucketed.groupBy(col("__rs_p"), col("__rs_b"))
      .agg(sum(value.cast("long")).as("__rs_t"))
    // exclusive per-group prefix sum over the O(B) bucket frame — the
    // only cross-bucket window, bounded by buckets per group
    val offs = totals
      .withColumn("__rs_off",
        sum(col("__rs_t")).over(
          Window.partitionBy(col("__rs_p")).orderBy(col("__rs_b")))
          - col("__rs_t"))
      .select(col("__rs_p"), col("__rs_b"), col("__rs_off"))
    bucketed.join(broadcast(offs), Seq("__rs_p", "__rs_b"))
      .withColumn(outCol,
        col("__rs_off") + sum(value.cast("long")).over(
          Window.partitionBy(col("__rs_p"), col("__rs_b")).orderBy(ord)))
      .drop("__rs_b", "__rs_p", "__rs_off")
  }
}
