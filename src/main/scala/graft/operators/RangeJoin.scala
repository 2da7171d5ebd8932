package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join via bucket expansion — the scale path for
  * `point >= start AND point < end` joins, which Spark otherwise plans as
  * a broadcast-nested-loop (right side small) or cartesian (right side
  * large): every interval registers under each fixed-width bucket it
  * overlaps, every point under its own bucket, and the non-equi predicate
  * becomes ONE equi shuffle join plus an exact residual filter.
  *
  * Each (interval, point) pair can only meet in the point's bucket, so the
  * expansion introduces no duplicates — no dedup pass. Cost:
  * |intervals| × avg-buckets-per-interval join rows on the build side;
  * pick `bucketWidth` near the typical interval length so that factor
  * stays ~2. Works on any integral axis (epoch micros, sequence ids).
  */
object RangeJoin {

  /** Inner join of `points` to every interval `[start, end)` containing
    * `pt`. All three columns must be integral (long) and non-negative on
    * the same axis; `bucketWidth > 0`.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pt: String,
      start: String,
      end: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val b = intervals
      .filter(col(end) > col(start))
      .withColumn("__bucket",
        explode(sequence(
          expr(s"`$start` div $bucketWidth"),
          expr(s"(`$end` - 1) div $bucketWidth"))))
    val p = points.withColumn("__bucket", expr(s"`$pt` div $bucketWidth"))
    p.join(b, Seq("__bucket"))
      .filter(col(pt) >= col(start) && col(pt) < col(end))
      .drop("__bucket")
  }

  /** Inner join of every CLOSED interval `[lStart, lEnd]` in `left` to
    * every overlapping closed `[rStart, rEnd]` in `right` — the
    * interval×interval generalization of [[pointInInterval]], which Spark
    * would otherwise plan as a nested-loop over the conjunction of two
    * inequalities.
    *
    * Both sides register under each fixed-width bucket they cover and the
    * overlap predicate becomes one equi shuffle join + exact residual.
    * Two overlapping intervals share every bucket their intersection
    * touches, so naive expansion duplicates pairs; instead each pair is
    * kept ONLY in the canonical bucket of its intersection's left edge —
    * `max(lStart, rStart) div bucketWidth` — which both sides cover by
    * definition, making the output duplicate-free with NO distinct pass.
    * Cost is expansion ×(len/bucketWidth + 1) per side; pick the width
    * near the typical interval length so that factor stays ~2.
    *
    * All four bound columns must be integral (long), non-negative, on one
    * axis, with `start <= end` (violating rows are dropped, matching
    * [[pointInInterval]]'s empty-interval filter).
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def expand(df: DataFrame, s: String, e: String): DataFrame = df
      .filter(col(e) >= col(s))
      .withColumn("__bucket",
        explode(sequence(
          expr(s"`$s` div $bucketWidth"), expr(s"`$e` div $bucketWidth"))))
    expand(left, lStart, lEnd)
      .join(expand(right, rStart, rEnd), Seq("__bucket"))
      .filter(
        col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
          col("__bucket") ===
            expr(s"greatest(`$lStart`, `$rStart`) div $bucketWidth"))
      .drop("__bucket")
  }
}
