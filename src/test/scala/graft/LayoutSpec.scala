package graft

import org.apache.spark.sql.functions.{call_function, col, lit, max, min, spark_partition_id}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{LayoutExprFunctions, ZOrderKernel}

/** Z-order layout kernel + helper (`graft_zorder`, `zorderLayout`). */
class LayoutSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Naive 16-step interleave loop — the definition the kernel's magic
    * numbers must match bit-for-bit.
    */
  private def naive(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("known values") {
    assert(ZOrderKernel.interleave16(0L, 0L) == 0L)
    assert(ZOrderKernel.interleave16(0xFFFFL, 0L) == 0x55555555L)
    assert(ZOrderKernel.interleave16(0L, 0xFFFFL) == 0xAAAAAAAAL)
    assert(ZOrderKernel.interleave16(3L, 1L) == 7L) // a→bits 0,2; b→bit 1
    assert(ZOrderKernel.interleave16(0xFFFFL, 0xFFFFL) == 0xFFFFFFFFL)
  }

  test("matches the naive bit loop; masks to 16 bits") {
    val rnd = new scala.util.Random(7)
    (0 until 2000).foreach { _ =>
      val a = rnd.nextLong().abs
      val b = rnd.nextLong().abs
      assert(ZOrderKernel.interleave16(a, b) == naive(a & 0xFFFFL, b & 0xFFFFL))
    }
  }

  test("SQL function evaluates through codegen and interpreted paths") {
    assert(spark.sql("SELECT graft_zorder(3, 1)").head().getLong(0) == 7L)
    val df = (0 until 1000).map(i => (i, i * 31 % 65536)).toDF("a", "b")
    val got = df.select(call_function("graft_zorder", col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    val want = (0 until 1000)
      .map(i => ZOrderKernel.interleave16(i.toLong, (i * 31 % 65536).toLong))
    assert(got.toSeq == want)
  }

  test("rejects non-integral input") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_zorder('x', 1)").collect()
    }
    assert(err.getMessage.contains("graft_zorder") ||
      err.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("zorderLayout yields disjoint, locally-sorted z ranges per partition") {
    val rnd = new scala.util.Random(11)
    val df = (0 until 20000)
      .map(_ => (rnd.nextInt(65536), rnd.nextInt(65536)))
      .toDF("a", "b")
    val laid = LayoutExprFunctions.zorderLayout(df, col("a"), col("b"), 8)
    assert(laid.columns.toSeq == Seq("a", "b"), "helper column must be dropped")

    val z = laid.select(
      spark_partition_id().as("pid"),
      call_function("graft_zorder", col("a"), col("b")).as("z"))

    // per-partition [min, max] ranges must not overlap (range exchange)
    val ranges = z.groupBy(col("pid"))
      .agg(min(col("z")).as("lo"), max(col("z")).as("hi"))
      .orderBy(col("lo"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(ranges.nonEmpty)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2,
        s"partition z ranges overlap: hi=$hi1 lo=$lo2")
      case _ =>
    }

    // rows must be locally sorted by z inside each partition
    val sortedWithin = z.rdd.mapPartitions { it =>
      val zs = it.map(_.getLong(1)).toArray
      Iterator.single(zs.sameElements(zs.sorted))
    }.collect()
    assert(sortedWithin.forall(identity), "partitions must be z-sorted")
  }

  // ---- Layout.globalIds -------------------------------------------------

  test("globalIds: gappy keys get contiguous rank ids in key order") {
    val keys = Seq(3L, 64L, 65L, 129L, 1000L, 7L, 500L)
    val got = graft.operators.Layout
      .globalIds(keys.toDF("k"), col("k"), bucketWidth = 64L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = keys.sorted.zipWithIndex.map { case (k, i) => k -> i.toLong }
    assert(got == want.toMap)
  }

  test("globalIds: negative keys bucket by floor division, not toward zero") {
    // -1 div-toward-zero would share bucket 0 with key 0 AND, worse,
    // bucket -63..-1 would all collide at 0 — floor keeps bucket order
    // aligned with key order so the prefix-sum offsets are correct
    val keys = Seq(-130L, -65L, -64L, -1L, 0L, 1L, 63L, 64L)
    val got = graft.operators.Layout
      .globalIds(keys.toDF("k"), col("k"), bucketWidth = 64L)
      .orderBy(col("gid")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._2).toSeq == (0L until keys.size).toSeq)
    assert(got.map(_._1).toSeq == keys.sorted)
  }

  test("globalIds: ids are exactly 0..n-1 on a 20k random-gap frame") {
    val rnd = new scala.util.Random(7)
    val keys = scala.collection.mutable.LinkedHashSet[Long]()
    while (keys.size < 20000) keys += rnd.nextLong() % 10000000L
    val df = keys.toSeq.toDF("k").repartition(13)
    val out = graft.operators.Layout
      .globalIds(df, col("k"), bucketWidth = 1024L)
    val ids = out.select(col("gid")).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 20000L).toSeq)
    // and order matches key order
    val byKey = out.orderBy(col("k")).select(col("gid"))
      .collect().map(_.getLong(0))
    assert(byKey.toSeq == (0L until 20000L).toSeq)
  }

  test("globalIds: the row-level window is partitioned by bucket (no " +
      "single-partition corpus window)") {
    val df = (0L until 1000L).toDF("k")
    val out = graft.operators.Layout.globalIds(df, col("k"), bucketWidth = 64L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__gid_b"),
      s"expected the row_number exchange keyed on the bucket, got:\n$plan")
  }

  test("globalIds: rejects a non-positive bucket width") {
    val e = intercept[IllegalArgumentException] {
      graft.operators.Layout.globalIds((0L to 3L).toDF("k"), col("k"),
        bucketWidth = 0L)
    }
    assert(e.getMessage.contains("bucketWidth"))
  }

  // ---- Layout.groupedRunningSum -------------------------------------------

  test("groupedRunningSum: bit-identical to the single grouped window") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 5000).map { i =>
      (s"g${rnd.nextInt(3)}", rnd.nextLong() % 100000L, rnd.nextInt(4000).toLong)
    }
    val df = rows.toDF("g", "k", "v")
      .dropDuplicates(Seq("g", "k")) // ord must be unique within its group
      .repartition(11)
    val got = graft.operators.Layout
      .groupedRunningSum(df, col("g"), col("k"), col("v"), "cum",
        bucketWidth = 512L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    val want = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.sortBy(_._2).scanLeft((g, 0L, 0L)) { case ((_, _, acc), (_, k, v)) =>
          (g, k, acc + v)
        }.drop(1).map { case (_, k, cum) => (g, k) -> cum }
      }.toMap
    assert(got == want)
  }

  test("groupedRunningSum: negative ord keys bucket by floor division") {
    val df = Seq(("a", -130L, 1L), ("a", -65L, 2L), ("a", -64L, 3L),
      ("a", -1L, 4L), ("a", 0L, 5L), ("a", 63L, 6L), ("a", 64L, 7L))
      .toDF("g", "k", "v")
    val got = graft.operators.Layout
      .groupedRunningSum(df, col("g"), col("k"), col("v"), "cum",
        bucketWidth = 64L)
      .orderBy(col("k")).collect().map(_.getLong(3))
    assert(got.toSeq == Seq(1L, 3L, 6L, 10L, 15L, 21L, 28L))
  }

  test("groupedRunningSum: no window ever partitions on the group alone") {
    // the 100 TB contract: the row-level window is keyed on
    // (group, bucket) — bounded by bucketWidth rows per task — and the
    // only group-partitioned window runs over the O(buckets) offset
    // frame, never the corpus
    val df = (0L until 1000L).map(i => ("g", i, 1L)).toDF("g", "k", "v")
    val out = graft.operators.Layout
      .groupedRunningSum(df, col("g"), col("k"), col("v"), "cum",
        bucketWidth = 64L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__rs_p") &&
      plan.contains("__rs_b"),
      s"expected the running-sum exchange keyed on (group, bucket), got:\n$plan")
    assert(got10kContiguous(out), "running sum over unit values is the rank")
  }

  private def got10kContiguous(out: org.apache.spark.sql.DataFrame): Boolean =
    out.orderBy(col("k")).select(col("cum")).collect()
      .map(_.getLong(0)).toSeq == (1L to 1000L).toSeq

  test("groupedRunningSum: rejects a non-positive bucket width") {
    val e = intercept[IllegalArgumentException] {
      graft.operators.Layout.groupedRunningSum(
        Seq(("a", 0L, 1L)).toDF("g", "k", "v"),
        col("g"), col("k"), col("v"), "cum", bucketWidth = 0L)
    }
    assert(e.getMessage.contains("bucketWidth"))
  }
}
