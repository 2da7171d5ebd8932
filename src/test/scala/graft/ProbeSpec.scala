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
