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
}
