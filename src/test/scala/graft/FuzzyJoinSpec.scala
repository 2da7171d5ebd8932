package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyJoin

/** FuzzyJoin (deletion-neighborhood edit-distance join) vs a driver-side
  * brute force. The blocking is the system under test: a lost candidate
  * pair cannot be recovered by the verify step, so equality with the
  * all-pairs recompute proves the neighborhood join lossless on these
  * corpora. Randomized corpora are seeded — failures reproduce.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def bruteForce(rows: Seq[(Long, String)], tau: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows
      (ib, sb) <- rows
      if ia < ib
      d = FuzzyJoin.levenshteinRef(sa, sb)
      if d <= tau
    } yield (ia, ib, d)).toSet

  private def viaOperator(rows: Seq[(Long, String)], tau: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.editDistanceJoin(rows.toDF("id", "s"), "id", "s", maxDist = tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  // seeded random corpus over a 3-letter alphabet: short strings collide
  // under few edits constantly, exercising every edit kind
  private def corpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val len = rnd.nextInt(7) // 0..6, includes empty strings
      (i.toLong, Seq.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString)
    }
  }

  test("tau=1 equals brute force on a random 3-letter corpus") {
    val rows = corpus(seed = 1, n = 60)
    assert(viaOperator(rows, 1) == bruteForce(rows, 1))
  }

  test("tau=2 equals brute force on a random 3-letter corpus") {
    val rows = corpus(seed = 2, n = 40)
    assert(viaOperator(rows, 2) == bruteForce(rows, 2))
  }

  test("planted single-char edits are all found at tau=1") {
    // every edit kind against one base string: substitution, deletion,
    // insertion — each must pair with the base at distance exactly 1
    val base = "spark engine"
    val rows = Seq(
      0L -> base,
      1L -> "spark enginx",      // substitution
      2L -> "spark engin",       // deletion
      3L -> "sparks engine",     // insertion
      4L -> "flink runtime")     // far away — must NOT pair
    // (1,2) also pair: deleting the substituted 'x' yields the deletion
    val got = viaOperator(rows, 1)
    assert(got == Set((0L, 1L, 1), (0L, 2L, 1), (0L, 3L, 1), (1L, 2L, 1)))
  }

  test("maxBucket drops oversize blocking keys but keeps the rest") {
    // 30 identical strings (a degenerate hot key) plus one distinct pair;
    // capping the bucket removes the hot clique's pairs, not the pair
    // whose keys stay under the cap
    val hot = (0L until 30L).map(i => i -> "aaaa")
    val rows = hot ++ Seq(100L -> "zzzz", 101L -> "zzzy")
    val capped = FuzzyJoin.editDistanceJoin(
        rows.toDF("id", "s"), "id", "s", maxDist = 1, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(capped == Set((100L, 101L, 1)))
  }

  test("levenshteinRef matches Spark's levenshtein") {
    val rows = corpus(seed = 3, n = 40)
    val pairs = for { (_, a) <- rows; (_, b) <- rows } yield (a, b)
    val spark_ = pairs.toDF("a", "b")
      .select(levenshtein(col("a"), col("b"))).collect().map(_.getInt(0))
    val ref = pairs.map { case (a, b) => FuzzyJoin.levenshteinRef(a, b) }
    assert(spark_.toSeq == ref)
  }

  test("maxDist outside {1,2} is rejected") {
    val df = Seq(1L -> "a").toDF("id", "s")
    intercept[IllegalArgumentException] {
      FuzzyJoin.editDistanceJoin(df, "id", "s", maxDist = 3)
    }
  }
}
