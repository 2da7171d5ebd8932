package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  // One session for the whole test JVM (Test / fork := true).
  lazy val spark: SparkSession =
    GraftSession.build(master = "local[4]", appName = "graft-test", shufflePartitions = 4)
  val sf = "/root/testdata/sf0.001"
}

class ParitySpec extends AnyFunSuite {
  import TestSpark._

  test("every declared query has an oracle or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only queries are allowed but must be intentional; keep the list
    // here in sync when adding non-SQL-expressible operators.
    val allowedRowsOnly = Set(
      // LSH/approximate variants: bucketing is not SQL-expressible; their
      // exact twins (d1/d2/d6/a1) are oracle-checked, the pair/full-probe
      // gates (d3p/d4p/d5p/a2p) hash-check soundness, and PipelineSpec
      // asserts agreement/recall against the exact twins.
      "d3_dedup_minhash_lsh", "d4_dedup_simhash",
      "d5_dedup_embedding_lsh", "a2_ann_ivf",
      // IVF-pruned radius: cell pruning is not SQL-expressible; the
      // full-probe twin a8p is oracle-checked ≡ a7's SQL, and
      // SimilaritySpec pins full-probe≡exact + pruned⊆exact
      "a8_ivf_radius",
      // hash-derived weighted sampling keys are not DuckDB-expressible;
      // WeightedSampleSpec pins determinism/bias/exactness
      "s1_weighted_sample",
      // an eigensolver is not SQL-expressible; PcaSpec pins fit
      // determinism, orthonormality, diagonalization and the bit-exact
      // column≡driver projection; the fit INPUT is the hash-gated v3
      "v4_pca_project",
      // LSH band recall is a probabilistic bet (a qualifying pair can
      // miss all 8 bands), so a quadratic oracle would pin 100% recall
      // these operators never promise; their exact-recall prefix-filter
      // twins d19p/x19p carry the hash gates (round-13 ADVICE)
      "d19_incremental_minhash", "x19_syndication_matrix")
    assert(noOracle == allowedRowsOnly, s"queries missing oracle: $noOracle")
  }

  test("every oracle key has a query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("all queries run and return rows at sf0.001") {
    // d5p is a pure soundness gate: this corpus has NO embedding pair with
    // cosine >= 0.95 (probe-measured max ~0.51), so its correct output is
    // the empty set — the oracle recomputes the same empty exact set
    val emptyOk = Set("d5p_embedding_pairs")
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0 && !emptyOk(name)) Some(name) else None
    }
    assert(empties.isEmpty, s"queries with 0 rows: $empties")
  }

  test("entry smoke returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1_agg values: grouped sums are exact") {
    val rows = SparkEntry.queries("q1_agg")(spark, sf).collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatus in testdata
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Double]("min_qty") <= r.getAs[Double]("max_qty"))
    }
  }

  test("q12 order/limit/offset is deterministic") {
    val a = SparkEntry.queries("q12_order_limit_offset")(spark, sf).collect()
    val b = SparkEntry.queries("q12_order_limit_offset")(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 10)
    val prices = a.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (x, y) => x >= y })
  }

  test("q9 full join pads both sides with nulls") {
    val df = SparkEntry.queries("q9_join_full")(spark, sf)
    val rows = df.collect()
    assert(rows.exists(_.getAs[Long]("cust") == -1L) ||
      rows.exists(_.getAs[Long]("big_spender") == -1L))
  }
}
