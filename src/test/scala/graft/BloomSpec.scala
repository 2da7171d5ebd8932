package graft

import org.apache.spark.sql.functions.{call_function, col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BloomBuffer, BloomCodec, BloomHash}

/** Exact-replayable Bloom filter (`graft_bloom_state` /
  * `graft_bloom_merge` / `graft_bloom_positions` /
  * `graft_bloom_contains`). The set-bit position table is oracle-gated
  * (k9); these specs pin the kernel properties the gate can't see —
  * no false negatives, merge ≡ single pass, partition invariance, the
  * md5-slice position math, and analysis-time validation.
  */
class BloomSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("kernel: positions match the oracle's md5 hex-slice math") {
    (0 until 500).foreach { i =>
      val key = s"doc_$i"
      val hex = BloomHash.md5Hex(key)
      // independent recompute of the SQL-side formula:
      // CAST('0x' || substr(md5(k), 8j+1, 8) AS BIGINT) % m
      val want = (0 until 3).map { j =>
        (java.lang.Long.parseLong(hex.substring(8 * j, 8 * j + 8), 16) % 4096).toInt
      }.toSet
      val buf = new BloomBuffer(4096)
      buf.add(key)
      assert(buf.positions.toSet == want, s"position mismatch for $key")
    }
  }

  test("no false negatives; re-adds are idempotent") {
    val buf = new BloomBuffer(1024)
    (0 until 300).foreach(i => buf.add(s"k$i"))
    val snap = buf.bits.clone()
    (0 until 300).foreach(i => buf.add(s"k$i"))
    assert(buf.bits.sameElements(snap), "re-add must be a no-op")
    val state = BloomCodec.write(buf)
    val df = (0 until 300).map(i => s"k$i").toDF("k")
    val misses = df.filter(
      !call_function("graft_bloom_contains", lit(state), col("k"))).count()
    assert(misses == 0, "a Bloom filter can never false-negative")
  }

  test("false-positive rate is plausible at the design point") {
    // m=4096, k=3, n=400 → fpr = (1 - e^{-kn/m})^k ≈ 1.6%; allow 4×
    val buf = new BloomBuffer(4096)
    (0 until 400).foreach(i => buf.add(s"member_$i"))
    val state = BloomCodec.write(buf)
    val probes = (0 until 2000).map(i => s"absent_$i").toDF("k")
    val fp = probes.filter(
      call_function("graft_bloom_contains", lit(state), col("k"))).count()
    assert(fp < 2000 * 0.016 * 4, s"fp=$fp of 2000 — position math broken?")
  }

  test("codec round-trips the bit image byte-for-byte") {
    val buf = new BloomBuffer(512)
    (0 until 100).foreach(i => buf.add(s"x$i"))
    val back = BloomCodec.read(BloomCodec.write(buf))
    assert(back.m == 512)
    assert(back.bits.sameElements(buf.bits))
  }

  test("merged shard states equal the single-pass state byte-for-byte") {
    val rows = (0 until 5000).map(i => (i % 7, s"u${i % 431}")).toDF("shard", "k")
    val single = rows
      .agg(call_function("graft_bloom_state", col("k"), lit(2048)).as("st"))
      .head().getAs[Array[Byte]](0)
    val merged = rows
      .groupBy(col("shard"))
      .agg(call_function("graft_bloom_state", col("k"), lit(2048)).as("st"))
      .agg(call_function("graft_bloom_merge", col("st"), lit(2048)).as("st"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(single, merged),
      "bit-OR merge must reproduce the one-pass image exactly")
  }

  test("sql state is partition-invariant") {
    val df = (0 until 20000).map(i => s"u${i % 997}").toDF("k")
    def state(parts: Int): Array[Byte] = df.repartition(parts)
      .agg(call_function("graft_bloom_state", col("k"), lit(2048)).as("st"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(state(1), state(13)),
      "state must not depend on partitioning")
  }

  test("rejects bad arguments at analysis time") {
    val df = Seq("a").toDF("k")
    val e1 = intercept[Exception] {
      df.agg(call_function("graft_bloom_state", col("k"), lit(4)).as("st"))
        .collect()
    }
    assert(e1.getMessage.contains("graft_bloom_state"))
    val e2 = intercept[Exception] {
      df.agg(call_function("graft_bloom_state", lit(1), lit(1024)).as("st"))
        .collect()
    }
    assert(e2.getMessage.contains("graft_bloom_state"))
  }

  test("corrupt binary state fails with a named error, not an internal one") {
    import graft.functions.BloomCodec
    // shorter than the 4-byte header
    val e1 = intercept[IllegalArgumentException] { BloomCodec.read(Array[Byte](1, 2)) }
    assert(e1.getMessage.contains("graft_bloom"))
    // header claims m = 0 → would be % 0 downstream
    val e2 = intercept[IllegalArgumentException] {
      BloomCodec.read(Array[Byte](0, 0, 0, 0))
    }
    assert(e2.getMessage.contains("graft_bloom"))
    // header claims m = -16 → would be NegativeArraySize
    val e3 = intercept[IllegalArgumentException] {
      BloomCodec.read(Array[Byte](-1, -1, -1, -16))
    }
    assert(e3.getMessage.contains("graft_bloom"))
    // valid m but truncated bit image
    val e4 = intercept[IllegalArgumentException] {
      BloomCodec.read(Array[Byte](0, 0, 0, 64, 1, 2, 3))
    }
    assert(e4.getMessage.contains("graft_bloom"))
    // a probe against a corrupt state surfaces the same named error
    val e5 = intercept[Exception] {
      Seq(Array[Byte](9)).toDF("st")
        .select(call_function("graft_bloom_contains", col("st"), lit("k")))
        .collect()
    }
    assert(e5.getMessage.contains("graft_bloom") ||
      e5.getCause != null && e5.getCause.getMessage.contains("graft_bloom"))
  }
}
