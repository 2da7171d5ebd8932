package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // one pathologically hot key (80% of the big side) plus a uniform tail —
  // the shape AQE's partition splitting cannot fix when the hot key's rows
  // all hash to one task
  private def skewed = {
    val big = spark.range(0, 10000)
      .select(
        when(col("id") % 5 =!= 0, lit(42L)).otherwise(col("id") % 100).as("k"),
        col("id").as("payload"))
    val small = spark.range(0, 100)
      .select(col("id").as("k"), concat(lit("dim_"), col("id")).as("name"))
    (big, small)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("salted inner join returns exactly the plain join's rows") {
    val (big, small) = skewed
    val plain = big.join(small, Seq("k"), "inner")
    val salted = SkewJoin.saltedJoin(big, small, Seq("k"), saltFactor = 8)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(canon(salted) == canon(plain))
  }

  test("salted left join preserves unmatched left rows with nulls") {
    val (big, small0) = skewed
    val small = small0.filter(col("k") < 50) // make some keys unmatched
    val plain = big.join(small, Seq("k"), "left")
    val salted = SkewJoin.saltedJoin(big, small, Seq("k"), saltFactor = 8,
      joinType = "left")
    assert(canon(salted) == canon(plain))
  }

  test("saltFactor = 1 degenerates to the plain join") {
    val (big, small) = skewed
    assert(canon(SkewJoin.saltedJoin(big, small, Seq("k"), saltFactor = 1)) ==
      canon(big.join(small, Seq("k"), "inner")))
  }

  test("hybrid routing: hot keys salted + tail plain, unioned = plain join") {
    val (big, small) = skewed
    val hot = SkewJoin.isHot(Seq(col("k")), Seq(Seq(42L)))
    val salted = SkewJoin.saltedJoin(big.filter(hot), small, Seq("k"), 8)
    val tail = big.filter(!hot).join(small, Seq("k"), "inner")
    val hybrid = salted.unionByName(tail)
    assert(canon(hybrid) == canon(big.join(small, Seq("k"), "inner")))
  }

  test("rejects unsound join types") {
    val (big, small) = skewed
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, Seq("k"), 8, joinType = "right")
    }
  }

  test("rejects inputs that already carry a __salt column") {
    val (big, small) = skewed
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big.withColumn("__salt", lit(0)), small, Seq("k"), 8)
    }
  }

  test("hotKeyProfile finds the dominant key first, deterministically") {
    val (big, _) = skewed
    val hot = SkewJoin.hotKeyProfile(big, Seq("k"), n = 3)
    assert(hot.head == Seq(42L), s"dominant key must lead the profile: $hot")
    assert(hot == SkewJoin.hotKeyProfile(big, Seq("k"), n = 3))
  }

  test("hybridJoin with auto-profile equals the plain join (inner and left)") {
    val (big, small0) = skewed
    val small = small0.filter(col("k") < 50)
    Seq("inner", "left").foreach { jt =>
      val got = canon(SkewJoin.hybridJoin(big, small, Seq("k"), joinType = jt))
      val want = canon(big.join(small, Seq("k"), jt))
      assert(got == want, s"$jt hybrid diverges from plain")
    }
  }

  test("hybridJoin with explicit hot keys equals the plain join") {
    val (big, small) = skewed
    val got = canon(SkewJoin.hybridJoin(big, small, Seq("k"),
      hotKeys = Some(Seq(Seq(42L))), saltFactor = 8))
    assert(got == canon(big.join(small, Seq("k"), "inner")))
  }

  test("hybridJoin with an explicitly-empty profile is the plain join, no salt") {
    val (big, small) = skewed
    val hybrid = SkewJoin.hybridJoin(big, small, Seq("k"),
      hotKeys = Some(Seq.empty))
    assert(!hybrid.queryExecution.executedPlan.toString.contains("__salt"))
    assert(canon(hybrid) == canon(big.join(small, Seq("k"), "inner")))
  }

  test("hybridJoin scans the big side exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("skew_big").toString
    try {
      val (big0, small) = skewed
      big0.write.mode("overwrite").parquet(dir)
      val big = spark.read.parquet(dir)
      val hybrid = SkewJoin.hybridJoin(big, small, Seq("k"),
        hotKeys = Some(Seq(Seq(42L))), saltFactor = 8)
      val p = hybrid.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val scans = """\(\d+\) Scan parquet""".r.findAllIn(p).size
      assert(scans == 1, s"big side must be scanned once, saw $scans:\n$p")
      assert(canon(hybrid) == canon(big.join(small, Seq("k"), "inner")))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("hybridJoin rejects inputs that already carry a __salt column") {
    val (big, small) = skewed
    intercept[IllegalArgumentException] {
      SkewJoin.hybridJoin(big.withColumn("__salt", lit(0)), small, Seq("k"),
        hotKeys = Some(Seq(Seq(42L))))
    }
  }
}
