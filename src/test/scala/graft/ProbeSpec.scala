package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Probe

/** Ridge-probe fit vs planted linear ground truth. The fit arithmetic
  * (decimal-routed Gram sums + pivoted elimination) is the system under
  * test; the partition-invariance cases pin the bit-determinism the
  * model-as-data oracle relies on.
  */
class ProbeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Exactly-representable features so the planted rule is recoverable
    * to float precision: x1 ∈ {0, 0.25, …}, x2 ∈ {0, 0.5, …}.
    */
  private def planted(n: Int): Seq[(Long, Seq[Double], Double)] =
    (0 until n).map { i =>
      val x1 = (i % 8) * 0.25
      val x2 = ((i / 8) % 8) * 0.5
      (i.toLong, Seq(1.0, x1, x2), 2.0 + 3.0 * x1 - 0.5 * x2)
    }

  test("solve: known 3x3 system") {
    val a = Array(
      Array(2.0, 1.0, 0.0),
      Array(1.0, 3.0, 1.0),
      Array(0.0, 1.0, 4.0))
    val x = Array(1.0, -2.0, 3.0)
    val b = Array(
      2.0 * 1 + 1.0 * -2,
      1.0 * 1 + 3.0 * -2 + 1.0 * 3,
      1.0 * -2 + 4.0 * 3)
    val got = Probe.solve(a, b)
    x.indices.foreach(i => assert(math.abs(got(i) - x(i)) < 1e-12))
  }

  test("solve: rejects a singular system") {
    val a = Array(Array(1.0, 2.0), Array(2.0, 4.0))
    intercept[IllegalArgumentException](Probe.solve(a, Array(1.0, 2.0)))
  }

  test("fit recovers a planted linear rule (lambda = 0)") {
    val df = planted(256).toDF("doc_id", "features", "label")
    val m = Probe.fitRidge(df, dim = 3, lambda = 0.0, fitCap = Int.MaxValue)
    val want = Seq(2.0, 3.0, -0.5)
    want.indices.foreach(i =>
      assert(math.abs(m.weights(i) - want(i)) < 1e-6,
        s"w($i) = ${m.weights(i)}"))
    assert(m.nFit == 256L)
  }

  test("ridge shrinks: larger lambda, smaller non-intercept norm") {
    val df = planted(256).toDF("doc_id", "features", "label")
    def norm(l: Double): Double = {
      val w = Probe.fitRidge(df, dim = 3, lambda = l).weights
      math.sqrt(w(1) * w(1) + w(2) * w(2))
    }
    assert(norm(100.0) < norm(0.001))
  }

  test("fit is partition-invariant bit-for-bit") {
    val rows = planted(200)
    val a = Probe.fitRidge(rows.toDF("doc_id", "features", "label")
      .repartition(1), dim = 3, lambda = 0.5)
    val b = Probe.fitRidge(rows.toDF("doc_id", "features", "label")
      .repartition(17), dim = 3, lambda = 0.5)
    assert(a.weights.toSeq == b.weights.toSeq)
  }

  test("fitCap >= corpus is identical to the uncapped fit") {
    val df = planted(100).toDF("doc_id", "features", "label")
    val capped = Probe.fitRidge(df, dim = 3, lambda = 0.1, fitCap = 100)
    val full = Probe.fitRidge(df, dim = 3, lambda = 0.1,
      fitCap = Int.MaxValue)
    assert(capped.weights.toSeq == full.weights.toSeq)
  }

  test("sampled fit (cap < corpus) is deterministic and uses cap rows") {
    val df = planted(200).toDF("doc_id", "features", "label")
    val a = Probe.fitRidge(df, dim = 3, fitCap = 64)
    val b = Probe.fitRidge(df.repartition(13), dim = 3, fitCap = 64)
    assert(a.weights.toSeq == b.weights.toSeq)
    assert(a.nFit == 64L)
  }

  test("margin column replays the fitted rule") {
    val rows = planted(64)
    val df = rows.toDF("doc_id", "features", "label")
    val m = Probe.fitRidge(df, dim = 3, lambda = 0.0)
    val got = df.select(col("doc_id"),
        Probe.margin(col("features"), m).as("margin"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, _, y) =>
      assert(math.abs(got(id) - y) < 1e-5, s"doc $id") }
  }

  /** Noisy threshold rule for the logistic fit: y = 1 iff x1 > x2,
    * features exactly representable. Linearly separable by w = (0, 1, −1)
    * scaled.
    */
  private def logitPlanted(n: Int): Seq[(Long, Seq[Double], Double)] =
    (0 until n).map { i =>
      val x1 = (i % 8) * 0.25
      val x2 = ((i / 8) % 8) * 0.25
      (i.toLong, Seq(1.0, x1, x2), if (x1 > x2) 1.0 else 0.0)
    }

  test("IRLS separates a planted threshold rule in 3 steps") {
    val df = logitPlanted(256).toDF("doc_id", "features", "label")
    val m = Probe.fitLogistic(df, dim = 3, lambda = 0.1, iters = 3,
      fitCap = Int.MaxValue)
    // direction recovered: x1 up, x2 down
    assert(m.weights(1) > 0.0 && m.weights(2) < 0.0, m.weights.toSeq.toString)
    // margin-threshold classification is perfect on the separable rule
    val got = df.select(col("label"),
        Probe.margin(col("features"), m).as("s"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val correct = got.count { case (y, s) => (s > 0.0) == (y > 0.5) }
    assert(correct == got.length,
      s"only $correct/${got.length} classified under the fitted margin")
  }

  test("IRLS fit is partition-invariant bit-for-bit") {
    val rows = logitPlanted(200)
    val a = Probe.fitLogistic(rows.toDF("doc_id", "features", "label")
      .repartition(1), dim = 3, lambda = 0.1)
    val b = Probe.fitLogistic(rows.toDF("doc_id", "features", "label")
      .repartition(17), dim = 3, lambda = 0.1)
    assert(a.weights.toSeq == b.weights.toSeq)
  }

  test("IRLS regularizes: larger lambda, smaller non-intercept norm") {
    val df = logitPlanted(256).toDF("doc_id", "features", "label")
    def norm(l: Double): Double = {
      val w = Probe.fitLogistic(df, dim = 3, lambda = l).weights
      math.sqrt(w(1) * w(1) + w(2) * w(2))
    }
    assert(norm(10.0) < norm(0.01))
  }

  test("IRLS validation: lambda must be positive, iters bounded") {
    val df = logitPlanted(16).toDF("doc_id", "features", "label")
    intercept[IllegalArgumentException](
      Probe.fitLogistic(df, dim = 3, lambda = 0.0))
    intercept[IllegalArgumentException](
      Probe.fitLogistic(df, dim = 3, iters = 0))
    intercept[IllegalArgumentException](
      Probe.fitLogistic(df, dim = 3, iters = 17))
  }

  test("input validation: empty, ragged, undersized dim, missing id col") {
    val empty = Seq.empty[(Long, Seq[Double], Double)]
      .toDF("doc_id", "features", "label")
    intercept[IllegalArgumentException](Probe.fitRidge(empty, dim = 3))
    val ragged = Seq(
      (0L, Seq(1.0, 2.0), 1.0), (1L, Seq(1.0), 0.0))
      .toDF("doc_id", "features", "label")
    intercept[IllegalArgumentException](Probe.fitRidge(ragged, dim = 2))
    val ok = planted(10).toDF("doc_id", "features", "label")
    intercept[IllegalArgumentException](Probe.fitRidge(ok, dim = 2))
    intercept[IllegalArgumentException](
      Probe.fitRidge(ok.withColumnRenamed("doc_id", "k"), dim = 3))
  }
}

/** Exact tie-aware AUC via the distributed prefix-sum — equivalence with
  * a driver-side brute-force pair count, known closed-form cases, and
  * partition-count invariance (the boundary-placement property the
  * range-partitioned cumsum must have).
  */
class StatsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import graft.operators.Stats

  private def auc(rows: Seq[(Double, Double)], parts: Int = 32): (Long, Long, BigDecimal, Double) = {
    val df = rows.toDF("score", "label")
    val r = Stats.rankSumAuc(df, col("score"), col("label"), parts).collect().head
    // auc is NULL (not NaN) when a class is empty — surface as NaN here
    val a = if (r.isNullAt(3)) Double.NaN else r.getDouble(3)
    (r.getLong(0), r.getLong(1), BigDecimal(r.getLong(2)), a)
  }

  /** Brute-force doubled U: every (pos, neg) pair contributes 2 when the
    * positive scores higher, 1 on a tie.
    */
  private def bruteU2(rows: Seq[(Double, Double)]): BigInt = {
    val pos = rows.filter(_._2 == 1.0).map(_._1)
    val neg = rows.filter(_._2 == 0.0).map(_._1)
    val pairs = for (p <- pos; n <- neg) yield {
      if (p > n) BigInt(2) else if (p == n) BigInt(1) else BigInt(0)
    }
    pairs.sum
  }

  test("perfect separation scores 1.0, reversed scores 0.0, all-tied 0.5") {
    val perfect = Seq((1.0, 0.0), (2.0, 0.0), (3.0, 1.0), (4.0, 1.0))
    assert(auc(perfect)._4 == 1.0)
    val reversed = perfect.map { case (s, y) => (s, 1.0 - y) }
    assert(auc(reversed)._4 == 0.0)
    val tied = Seq((5.0, 0.0), (5.0, 1.0), (5.0, 0.0), (5.0, 1.0))
    assert(auc(tied)._4 == 0.5)
  }

  test("tie-aware U matches the brute-force pair count on mixed data") {
    // deterministic pseudo-random scores with deliberate tie mass
    val rows = (0 until 400).map { i =>
      val s = ((i * 2654435761L) % 17).toDouble / 4.0
      val y = if ((i * 40503L) % 5 < 2) 1.0 else 0.0
      (s, y)
    }
    val (p, n, u2, a) = auc(rows)
    assert(p == rows.count(_._2 == 1.0) && n == rows.count(_._2 == 0.0))
    assert(u2 == BigDecimal(bruteU2(rows)))
    assert(a == u2.toDouble / (2.0 * p * n))
  }

  test("partition-count invariance: 1, 3, and 64 range partitions agree") {
    val rows = (0 until 500).map { i =>
      (((i * 48271L) % 23).toDouble, if (i % 3 == 0) 1.0 else 0.0)
    }
    val want = auc(rows, parts = 1)
    assert(auc(rows, parts = 3) == want)
    assert(auc(rows, parts = 64) == want)
  }

  test("degenerate inputs: empty frame and single-class frames") {
    val (p0, n0, u0, _) = auc(Seq.empty[(Double, Double)])
    assert(p0 == 0L && n0 == 0L && u0 == BigDecimal(0))
    val (p1, n1, u1, _) = auc(Seq((1.0, 1.0), (2.0, 1.0)))
    assert(p1 == 2L && n1 == 0L && u1 == BigDecimal(0))
  }
}
