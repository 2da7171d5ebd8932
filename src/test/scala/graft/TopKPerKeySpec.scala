package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKPerKey

class TopKPerKeySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // deterministic multi-group data with duplicate order values (the
  // neighbor-id tiebreak column makes the order total, like the ANN use)
  private lazy val df = (0 until 2000)
    .map(i => (i % 7L, i.toLong, (i * 2654435761L % 97).toDouble))
    .toDF("key", "id", "score")

  private def windowed(k: Int) = df
    .withColumn("rank", row_number().over(
      Window.partitionBy(col("key")).orderBy(col("score").desc, col("id").asc)))
    .filter(col("rank") <= k)

  private def collectSet(d: org.apache.spark.sql.DataFrame) =
    d.select("key", "id", "score", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  test("matches window row_number + filter exactly (ties broken by id)") {
    Seq(1, 5, 64).foreach { k =>
      val got = collectSet(TopKPerKey(df, Seq(col("key")),
        Seq(col("score").desc, col("id").asc), k))
      val want = collectSet(windowed(k))
      assert(got == want, s"k=$k: ${got.size} vs ${want.size}")
    }
  }

  test("k larger than every group returns all rows ranked") {
    val got = collectSet(TopKPerKey(df, Seq(col("key")),
      Seq(col("score").desc, col("id").asc), 10000))
    assert(got == collectSet(windowed(10000)))
    assert(got.size == 2000)
  }

  test("empty input yields empty output") {
    val empty = df.filter(col("key") < 0)
    assert(TopKPerKey(empty, Seq(col("key")), Seq(col("score").desc), 3).count() == 0)
  }

  test("empty key set = global top-k (TakeOrderedAndProject per-key analogue)") {
    val got = TopKPerKey(df, Seq.empty, Seq(col("score").desc, col("id").asc), 5)
      .select("id", "rank").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = df.orderBy(col("score").desc, col("id").asc).limit(5)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("id").asc)))
      .select("id", "rank").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == want)
  }

  test("physical plan: partial heap → exchange → final heap, no sort") {
    val p = TopKPerKey(df, Seq(col("key")), Seq(col("score").desc, col("id").asc), 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p)
    assert(p.contains("TopKPerKeyPartial"),
      s"map-side partial phase must run before the exchange:\n$p")
    assert(!p.contains("WindowExec") && !p.contains("Sort "), s"no sort expected:\n$p")
  }

  test("partial phase preserves partitioning-independence of the result") {
    // the partial heap's OUTPUT depends on how rows are partitioned (which
    // ≤ k survivors each partition contributes) — the FINAL result must
    // not; any partial-phase bug that drops a globally-top row for some
    // layout shows up here
    def run(d: org.apache.spark.sql.DataFrame) = collectSet(
      TopKPerKey(d, Seq(col("key")), Seq(col("score").desc, col("id").asc), 3))
    val want = collectSet(windowed(3))
    assert(run(df.repartition(1)) == want, "single partition")
    assert(run(df.repartition(13)) == want, "13 partitions")
    assert(run(df.repartition(64, col("id"))) == want, "64 id-hash partitions")
  }

  test("sort fallback: key cardinality over the threshold matches the heap path") {
    // 50k distinct keys, several rows per key, against a 16-key threshold —
    // every partition trips the fallback and must still match the window
    // form exactly (including ranks); spill-capable, never OOM
    val wide = (0 until 200000)
      .map(i => (i % 50000L, i.toLong, (i * 40503L % 7919).toDouble))
      .toDF("key", "id", "score")
    def run(k: Int) = TopKPerKey(wide, Seq(col("key")),
      Seq(col("score").desc, col("id").asc), k)
      .select("key", "id", "score", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val want = wide
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("score").desc, col("id").asc)))
      .filter(col("rank") <= 2)
      .select("key", "id", "score", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val heapPath = run(2) // default threshold: heap path
    spark.conf.set("spark.graft.topk.maxHeapKeys", "16")
    try {
      val sortPath = run(2)
      assert(sortPath == want, s"fallback diverges: ${sortPath.size} vs ${want.size}")
      assert(sortPath == heapPath)
    } finally {
      spark.conf.unset("spark.graft.topk.maxHeapKeys")
    }
  }

  test("fallback boundary: maxHeapKeys exactly and ±1, tripped mid-partition") {
    // The degrade path's edge: with threshold M, M-1 and M distinct keys
    // must stay pure-heap, M+1 trips the sorter on the LAST key's first
    // row — arriving mid-partition, after every earlier key already
    // holds heap rows (which merge into the sorter) and before further
    // rows for those same keys (which insert directly) — so each key's
    // final top-k mixes rows that crossed the transition on both sides.
    val M = 8
    spark.conf.set("spark.graft.topk.maxHeapKeys", M.toString)
    try {
      def data(nKeys: Int): Seq[(Long, Long, Double)] = {
        // 3 arrival passes over keys 0..nKeys-2, then the last key's
        // first row, then 2 passes over ALL keys
        val early = for (pass <- 0 until 3; key <- 0 until (nKeys - 1))
          yield (key.toLong, (pass * 1000 + key).toLong,
            ((pass * 1009 + key * 131) % 97).toDouble)
        val trip = Seq(((nKeys - 1).toLong, 777000L, 50.0))
        val late = for (pass <- 3 until 5; key <- 0 until nKeys)
          yield (key.toLong, (pass * 1000 + key).toLong,
            ((pass * 1009 + key * 131) % 97).toDouble)
        early ++ trip ++ late
      }
      for (nKeys <- Seq(M - 1, M, M + 1)) {
        // coalesce(1) preserves the local Seq's arrival order — the
        // transition point inside the partition is deterministic
        val d = data(nKeys).toDF("key", "id", "score").coalesce(1)
        val got = collectSet(TopKPerKey(d, Seq(col("key")),
          Seq(col("score").desc, col("id").asc), 3))
        val want = collectSet(d.withColumn("rank", row_number().over(
            Window.partitionBy(col("key"))
              .orderBy(col("score").desc, col("id").asc)))
          .filter(col("rank") <= 3))
        assert(got == want, s"nKeys=$nKeys diverged: ${got.size} vs ${want.size}")
      }
    } finally spark.conf.unset("spark.graft.topk.maxHeapKeys")
  }

  test("expression keys work (not just column refs)") {
    val got = TopKPerKey(df, Seq(col("key") % 2), Seq(col("score").desc, col("id").asc), 3)
      .collect()
    assert(got.length == 6)
  }
}
