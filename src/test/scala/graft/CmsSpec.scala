package graft

import org.apache.spark.sql.functions.{call_function, col, count, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CmsBuffer, CmsCodec, CmsHash}

/** Count-Min sketch (`graft_cms_state` / `graft_cms_merge` /
  * `graft_cms_query`).
  */
class CmsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("kernel: estimate is never an underestimate, exact without collisions") {
    val buf = new CmsBuffer(4, 1024)
    val keys = (0 until 50).map(i => s"key_$i")
    keys.zipWithIndex.foreach { case (k, i) => (0 to i).foreach(_ => buf.add(k, 1L)) }
    keys.zipWithIndex.foreach { case (k, i) =>
      val est = buf.estimate(k)
      assert(est >= i + 1, s"$k underestimated: $est < ${i + 1}")
    }
    // wide grid, 50 keys: overwhelmingly collision-free at depth 4
    val exact = keys.zipWithIndex.count { case (k, i) => buf.estimate(k) == i + 1 }
    assert(exact == keys.size, s"expected exactness at width 1024, got $exact/50 exact")
  }

  test("codec round-trips the grid bit-for-bit") {
    val buf = new CmsBuffer(3, 7)
    Seq("a", "b", "c", "a", "a").foreach(buf.add(_, 1L))
    val back = CmsCodec.read(CmsCodec.write(buf))
    assert(back.depth == 3 && back.width == 7)
    assert(back.counters.sameElements(buf.counters))
  }

  test("merged shard states equal the single-pass state byte-for-byte") {
    val rows = (0 until 5000).map(i => (i % 7, s"t${i % 23}")).toDF("shard", "k")
    val single = rows
      .agg(call_function("graft_cms_state", col("k"), lit(4), lit(16)).as("st"))
      .head().getAs[Array[Byte]](0)
    val merged = rows
      .groupBy(col("shard"))
      .agg(call_function("graft_cms_state", col("k"), lit(4), lit(16)).as("st"))
      .agg(call_function("graft_cms_merge", col("st"), lit(4), lit(16)).as("st"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(single, merged),
      "element-wise merge must reproduce the one-pass grid exactly")
  }

  test("sql estimates dominate true counts and are partition-invariant") {
    val df = (0 until 20000).map(i => s"e${i % 31}").toDF("k")
    def ests(parts: Int): Map[String, Long] = {
      val st = df.repartition(parts)
        .agg(call_function("graft_cms_state", col("k"), lit(4), lit(16)).as("st"))
      df.distinct().crossJoin(st)
        .select(col("k"),
          call_function("graft_cms_query", col("st"), col("k")).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val a = ests(1)
    val b = ests(32)
    assert(a == b, "estimates must not depend on partitioning")
    val truth = df.groupBy(col("k")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, n) =>
      assert(a(k) >= n, s"$k: est ${a(k)} < true $n")
    }
  }

  test("inner product dominates the true join size; exact without collisions") {
    val a = new CmsBuffer(4, 4096)
    val b = new CmsBuffer(4, 4096)
    // fA = {x:3, y:2, z:1}, fB = {y:5, z:2, w:7} → Σ fA·fB = 2·5+1·2 = 12
    Seq.fill(3)("x").foreach(a.add(_, 1)); Seq.fill(2)("y").foreach(a.add(_, 1)); a.add("z", 1)
    Seq.fill(5)("y").foreach(b.add(_, 1)); Seq.fill(2)("z").foreach(b.add(_, 1))
    Seq.fill(7)("w").foreach(b.add(_, 1))
    assert(a.innerProduct(b) == 12L, "wide grid: exact inner product")
    assert(a.innerProduct(b) == b.innerProduct(a), "symmetric")
    // tiny grid: collisions inflate, never deflate
    val a2 = new CmsBuffer(2, 2)
    val b2 = new CmsBuffer(2, 2)
    (0 until 100).foreach(i => a2.add(s"k$i", 1))
    (0 until 100 by 2).foreach(i => b2.add(s"k$i", 1))
    assert(a2.innerProduct(b2) >= 50L)
    // mismatched shapes must be rejected, not silently misread
    intercept[IllegalArgumentException] {
      a.innerProduct(a2)
    }
  }

  test("bucket hash matches the oracle's md5 hex math") {
    // mirror of the DuckDB-side parse: first 8 hex chars base-16, mod width
    val keys = Seq("view", "click", "purchase", "x y", "ünïcode")
    keys.foreach { k =>
      (0 until 4).foreach { d =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"$d:$k".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        val want = (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 16).toInt
        assert(CmsHash.bucket(d, k, 16) == want)
      }
    }
  }
}
