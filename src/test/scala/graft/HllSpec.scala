package graft

import org.apache.spark.sql.functions.{call_function, col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HllBuffer, HllCodec, HllHash}

/** HyperLogLog (`graft_hll_state` / `graft_hll_merge` /
  * `graft_hll_registers` / `graft_hll_estimate`). The register table is
  * oracle-gated (k8); these specs pin the kernel properties the gate
  * can't see — estimator accuracy, merge ≡ single pass, partition
  * invariance, and the exact small-range (linear counting) regime.
  */
class HllSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("kernel: bucket and rank are in range, rank ≡ 33 − bitlen") {
    (0 until 2000).foreach { i =>
      val (b, r) = HllHash.bucketRank(s"key_$i", 64)
      assert(b >= 0 && b < 64, s"bucket out of range: $b")
      assert(r >= 1 && r <= 32, s"rank out of range: $r")
    }
  }

  test("registers are monotone under adds and idempotent on re-adds") {
    val buf = new HllBuffer(64)
    (0 until 500).foreach(i => buf.add(s"k$i"))
    val snap = buf.registers.clone()
    // re-adding the same keys can never move a register
    (0 until 500).foreach(i => buf.add(s"k$i"))
    assert(buf.registers.sameElements(snap), "re-add must be a no-op")
    // adding new keys can only raise registers
    (500 until 600).foreach(i => buf.add(s"k$i"))
    buf.registers.zip(snap).foreach { case (now, before) =>
      assert(now >= before, "registers only grow")
    }
  }

  test("codec round-trips the registers bit-for-bit") {
    val buf = new HllBuffer(32)
    (0 until 100).foreach(i => buf.add(s"x$i"))
    val back = HllCodec.read(HllCodec.write(buf))
    assert(back.m == 32)
    assert(back.registers.sameElements(buf.registers))
  }

  test("estimate lands inside the HLL error band across cardinalities") {
    // standard error is ~1.04/sqrt(m) ≈ 3.25% at m=1024; allow 5 sigma
    val m = 1024
    Seq(100, 1000, 10000, 50000).foreach { n =>
      val buf = new HllBuffer(m)
      (0 until n).foreach(i => buf.add(s"item_$i"))
      val est = buf.estimate
      val rel = math.abs(est - n) / n
      assert(rel < 5 * 1.04 / math.sqrt(m),
        s"n=$n est=$est rel=$rel beyond the 5-sigma band")
    }
  }

  test("tiny cardinalities are EXACT via linear counting") {
    // n ≪ m with distinct buckets: V = m − n zeros, and m·ln(m/(m−n))
    // is within rounding of n — but exactness here means the register
    // count: every key occupies a bucket, est rounds to n
    val m = 1024
    (1 to 20).foreach { n =>
      val buf = new HllBuffer(m)
      (0 until n).foreach(i => buf.add(s"only_$i"))
      val est = math.round(buf.estimate)
      assert(math.abs(est - n) <= 1, s"n=$n est=$est")
    }
  }

  test("merged shard states equal the single-pass state byte-for-byte") {
    val rows = (0 until 5000).map(i => (i % 7, s"u${i % 431}")).toDF("shard", "k")
    val single = rows
      .agg(call_function("graft_hll_state", col("k"), lit(64)).as("st"))
      .head().getAs[Array[Byte]](0)
    val merged = rows
      .groupBy(col("shard"))
      .agg(call_function("graft_hll_state", col("k"), lit(64)).as("st"))
      .agg(call_function("graft_hll_merge", col("st"), lit(64)).as("st"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(single, merged),
      "max-merge must reproduce the one-pass registers exactly")
  }

  test("sql state is partition-invariant and the estimate tracks truth") {
    val df = (0 until 20000).map(i => s"u${i % 997}").toDF("k")
    def state(parts: Int): Array[Byte] = df.repartition(parts)
      .agg(call_function("graft_hll_state", col("k"), lit(256)).as("st"))
      .head().getAs[Array[Byte]](0)
    val a = state(1)
    val b = state(13)
    assert(java.util.Arrays.equals(a, b), "state must not depend on partitioning")
    val est = df.agg(call_function("graft_hll_estimate",
        call_function("graft_hll_state", col("k"), lit(256))).as("e"))
      .head().getDouble(0)
    assert(math.abs(est - 997) / 997.0 < 5 * 1.04 / 16.0,
      s"997 distinct, estimated $est")
  }

  test("bucket/rank hash matches the oracle's md5 hex math") {
    // independent recompute of the SQL-side formula: md5 hex chars 1–8
    // (mod m) and 33 − bitlen(chars 9–16)
    val mdig = java.security.MessageDigest.getInstance("MD5")
    (0 until 500).foreach { i =>
      val key = s"user_$i"
      val hex = mdig.digest(key.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      mdig.reset()
      val v1 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      val v2 = java.lang.Long.parseLong(hex.substring(8, 16), 16)
      val bitlen = if (v2 == 0) 1 else 64 - java.lang.Long.numberOfLeadingZeros(v2)
      val (b, r) = HllHash.bucketRank(key, 64)
      assert(b == (v1 % 64).toInt, s"bucket mismatch for $key")
      assert(r == 33 - bitlen, s"rank mismatch for $key")
    }
  }
}
