package graft

import org.apache.spark.sql.functions.{call_function, col, countDistinct, lit}
import org.scalatest.funsuite.AnyFunSuite

class WeightedSampleSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def sample(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.select(call_function("graft_weighted_sample",
      col("id"), col("w"), lit(k)).as("s"))
      .collect()(0).getSeq[Long](0)

  test("returns every positive-weight id when group is smaller than k") {
    val df = Seq((1L, 1.0), (2L, 0.5), (3L, 0.0), (4L, -1.0), (5L, 2.0))
      .toDF("id", "w")
    val got = sample(df, 10)
    assert(got.toSet == Set(1L, 2L, 5L)) // zero/negative weights excluded
  }

  test("deterministic under any partitioning") {
    val df = (0L until 20000L).map(i => (i, 1.0 + (i % 7))).toDF("id", "w")
    val a = sample(df.repartition(1), 100)
    val b = sample(df.repartition(32), 100)
    assert(a == b, "sample must not depend on partitioning")
    assert(a.length == 100 && a.distinct.length == 100)
  }

  test("saturated keys (huge weights) stay deterministic via id tiebreak") {
    // all keys collapse to ~1.0 in double precision; the id tiebreak must
    // make the winner set identical under any partitioning
    val df = (0L until 5000L).map(i => (i, 1e20)).toDF("id", "w")
    val a = sample(df.repartition(1), 20)
    val b = sample(df.repartition(32), 20)
    assert(a == b)
    assert(a == (0L until 20L), "total order (key desc, id asc) expected")
  }

  test("ids above 2^53 survive exactly (no double round-trip)") {
    // consecutive longs beyond double precision: a Double-keyed buffer
    // would collapse/corrupt them; exact ids must come back out
    val base = (1L << 60) + 1L
    val df = (0L until 100L).map(i => (base + i, 1.0)).toDF("id", "w")
    val got = sample(df.repartition(16), 100)
    assert(got.toSet == (0L until 100L).map(base + _).toSet)
    // forces serialize/deserialize via multi-partition merge with odd ids
    val two = sample(df.repartition(32), 2)
    assert(two.forall(id => id >= base && id < base + 100L))
    assert(two.distinct.length == 2)
  }

  test("overwhelming weight is always selected; selection tracks weight") {
    val df = ((0L until 1000L).map(i => (i, 1.0)) :+ (9999L, 1e9))
      .toDF("id", "w")
    assert(sample(df, 10).contains(9999L))
    // items weighted 100x are strongly over-represented among winners
    val skewed = (0L until 2000L).map(i => (i, if (i < 100) 100.0 else 1.0))
      .toDF("id", "w")
    val got = sample(skewed, 50)
    val heavyHits = got.count(_ < 100L)
    assert(heavyHits > 25, s"expected heavy-weight dominance, got $heavyHits/50")
  }
}

class KmvSketchSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("exact below k; within 1/sqrt(k) error band above; null-safe") {
    val few = (0 until 100).map(i => s"v${i % 37}").toDF("v")
    val exactSmall = few.select(
      call_function("graft_kmv_distinct", col("v"), lit(256)).as("est"))
      .collect()(0).getLong(0)
    assert(exactSmall == 37, "below k the sketch IS the exact count")

    val many = (0 until 200000).map(i => s"item-${i % 50000}").toDF("v")
    val est = many.select(
      call_function("graft_kmv_distinct", col("v"), lit(256)).as("est"))
      .collect()(0).getLong(0)
    assert(math.abs(est - 50000.0) / 50000.0 < 0.20, s"estimate $est vs 50000")

    val withNulls = Seq(Some("a"), None, Some("b"), None, Some("a")).toDF("v")
    assert(withNulls.select(call_function("graft_kmv_distinct", col("v"), lit(16)))
      .collect()(0).getLong(0) == 2)
  }

  test("deterministic under any partitioning (merge is order-insensitive)") {
    val df = (0 until 60000).map(i => (i % 7L, s"u${i % 9000}")).toDF("g", "v")
    def run(parts: Int) = df.repartition(parts)
      .groupBy(col("g"))
      .agg(call_function("graft_kmv_distinct", col("v"), lit(128)).as("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(run(1) == run(32))
  }

  test("tracks exact count distinct on real data (grouped)") {
    val docs = Tables.load(spark, sf, "documents")
    val got = docs.groupBy(col("lang"))
      .agg(
        call_function("graft_kmv_distinct", col("text"), lit(128)).as("est"),
        countDistinct(col("text")).as("exact"))
      .collect()
    got.foreach { r =>
      val est = r.getLong(1); val exact = r.getLong(2)
      assert(math.abs(est - exact.toDouble) / math.max(exact, 1L) < 0.25,
        s"lang=${r.getString(0)}: $est vs $exact")
    }
  }
}

class SketchStateSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions.{call_function, posexplode}

  // the sketch-cube contract: states computed per shard, merged later,
  // must answer like the direct aggregate over the union
  test("kmv state/merge over shards equals the direct estimate (both regimes)") {
    val df = (0 until 60000).map(i => (i % 8, s"u${i % 9000}")).toDF("shard", "v")
    def direct(k: Int) = df
      .select(call_function("graft_kmv_distinct", col("v"), lit(k)))
      .collect()(0).getLong(0)
    def viaStates(k: Int) = df
      .groupBy(col("shard"))
      .agg(call_function("graft_kmv_state", col("v"), lit(k)).as("st"))
      .select(call_function("graft_kmv_merge", col("st"), lit(k)))
      .collect()(0).getLong(0)
    // exact regime AND estimator regime: KMV's merge is order-insensitive,
    // so shard-then-merge is indistinguishable from one pass
    assert(viaStates(16384) == direct(16384), "exact regime")
    assert(viaStates(256) == direct(256), "estimator regime")
  }

  test("quantile state/merge over shards equals the direct sketch (exact regime)") {
    val df = (0 until 3000).map(i => (i % 5, ((i * 2654435761L) % 977).toDouble))
      .toDF("shard", "v")
    val direct = df
      .select(call_function("graft_quantile_sketch", col("v"), lit(0.5), lit(4096)))
      .collect()(0).getDouble(0)
    val merged = df
      .groupBy(col("shard"))
      .agg(call_function("graft_quantile_state", col("v"), lit(4096)).as("st"))
      .select(call_function("graft_quantile_merge", col("st"), lit(0.5), lit(4096)))
      .collect()(0).getDouble(0)
    assert(merged == direct)
  }

  test("heavy-hitters state/merge over shards equals the direct sketch (exact regime)") {
    val df = (0 until 5000).map(i => (i % 8, s"tok${i % 37}")).toDF("shard", "v")
    def top(d: org.apache.spark.sql.DataFrame) = d
      .select(posexplode(col("hh")).as(Seq("i", "s")))
      .select(col("s.token"), col("s.cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val direct = top(df.agg(
      call_function("graft_heavy_hitters", col("v"), lit(10), lit(64)).as("hh")))
    val merged = top(df
      .groupBy(col("shard"))
      .agg(call_function("graft_hh_state", col("v"), lit(64)).as("st"))
      .agg(call_function("graft_hh_merge", col("st"), lit(10), lit(64)).as("hh")))
    assert(merged == direct)
  }
}

class PcaSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions.col
  import graft.operators.Similarity

  private lazy val embs = Tables.load(spark, sf, "embeddings")
  private lazy val vecs = embs.select(col("embedding")).collect()
    .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  /** Driver-side centered covariance for comparison. */
  private def centeredCov(rows: Array[Array[Double]]): Array[Array[Double]] = {
    val n = rows.length
    val d = rows.head.length
    val mu = Array.tabulate(d)(i => rows.map(_(i)).sum / n)
    Array.tabulate(d, d)((i, j) =>
      rows.map(v => (v(i) - mu(i)) * (v(j) - mu(j))).sum / n)
  }

  test("fit is deterministic and components are orthonormal") {
    val m1 = Similarity.fitPca(embs, dim = 64, k = 8)
    val m2 = Similarity.fitPca(embs, dim = 64, k = 8)
    assert(m1.means.toSeq == m2.means.toSeq)
    assert(m1.components.map(_.toSeq).toSeq == m2.components.map(_.toSeq).toSeq)
    assert(m1.eigenvalues.toSeq == m2.eigenvalues.toSeq)
    // orthonormal rows: W · Wᵀ = I
    for (a <- m1.components; b <- m1.components) {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val want = if (a eq b) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"WWᵀ entry $d vs $want")
    }
    // explained variance comes out ordered
    assert(m1.eigenvalues.zip(m1.eigenvalues.tail).forall { case (a, b) => a >= b })
  }

  test("projection diagonalizes the covariance; whitening makes it identity") {
    val k = 6
    val model = Similarity.fitPca(embs, dim = 64, k = k)
    val proj = vecs.map(v => model.components.map(w =>
      w.indices.map(i => (v(i) - model.means(i)) * w(i)).sum))
    val pc = centeredCov(proj)
    for (i <- 0 until k; j <- 0 until k) {
      if (i == j)
        assert(math.abs(pc(i)(i) - model.eigenvalues(i)) < 1e-6,
          s"diag $i: ${pc(i)(i)} vs λ=${model.eigenvalues(i)}")
      else assert(math.abs(pc(i)(j)) < 1e-7, s"off-diag ($i,$j): ${pc(i)(j)}")
    }
    val white = Similarity.fitPca(embs, dim = 64, k = k, whiten = true)
    val wproj = vecs.map(v => white.components.map(w =>
      w.indices.map(i => (v(i) - white.means(i)) * w(i)).sum))
    val wc = centeredCov(wproj)
    for (i <- 0 until k; j <- 0 until k) {
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(wc(i)(j) - want) < 1e-6, s"whitened ($i,$j): ${wc(i)(j)}")
    }
  }

  test("fitPca rejects empty, mis-dimensioned, and ragged input with clear messages") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val eEmpty = intercept[IllegalArgumentException] {
      Similarity.fitPca(empty, dim = 64, k = 4)
    }
    assert(eEmpty.getMessage.contains("no embedding values"))
    // dim larger than the data's width → named missing dimensions
    val eMissing = intercept[IllegalArgumentException] {
      Similarity.fitPca(embs, dim = 80, k = 4)
    }
    assert(eMissing.getMessage.contains("missing"))
    // dim smaller than the data's width → named over-range dimensions
    val eOver = intercept[IllegalArgumentException] {
      Similarity.fitPca(embs, dim = 32, k = 4)
    }
    assert(eOver.getMessage.contains("dimensions up to"))
    // ragged rows covering all dims → named ragged failure
    val ragged = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f, 3.0f)),
      (3L, Seq(2.0f, 1.0f, 4.0f))).toDF("vec_id", "embedding")
    val eRagged = intercept[IllegalArgumentException] {
      Similarity.fitPca(ragged, dim = 3, k = 2)
    }
    assert(eRagged.getMessage.contains("ragged"))
  }

  test("sampled fit: cap >= corpus is bit-identical to full; below-cap is deterministic") {
    // cap above the corpus (500 vectors): the hash-prefix sample IS the
    // corpus, so the model must equal the uncapped fit bit-for-bit
    val full = Similarity.fitPca(embs, dim = 64, k = 6, whiten = true,
      fitCap = Int.MaxValue)
    val capped = Similarity.fitPca(embs, dim = 64, k = 6, whiten = true)
    assert(capped.means.toSeq == full.means.toSeq)
    assert(capped.components.map(_.toSeq).toSeq == full.components.map(_.toSeq).toSeq)
    assert(capped.eigenvalues.toSeq == full.eigenvalues.toSeq)
    // cap below the corpus: same model from any partitioning (the sample
    // is a deterministic hash prefix, not partition-order-dependent) …
    val s1 = Similarity.fitPca(embs.repartition(7), dim = 64, k = 6, fitCap = 100)
    val s2 = Similarity.fitPca(embs.repartition(3), dim = 64, k = 6, fitCap = 100)
    assert(s1.means.toSeq == s2.means.toSeq)
    assert(s1.components.map(_.toSeq).toSeq == s2.components.map(_.toSeq).toSeq)
    assert(s1.eigenvalues.toSeq == s2.eigenvalues.toSeq)
    // … and the cap visibly engaged (a 100-vector sample of 500 shifts
    // the estimated means)
    assert(s1.means.toSeq != full.means.toSeq)
  }

  test("column projection matches the driver fold bit-for-bit") {
    val model = Similarity.fitPca(embs, dim = 64, k = 4, whiten = true)
    val got = embs.limit(25)
      .select(col("vec_id"), Similarity.pcaProject(col("embedding"), model).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val raw = embs.limit(25).select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    raw.foreach { case (id, emb) =>
      val want = model.components.map { w =>
        // mirror the kernel exactly: left-to-right fold of x·w, then one
        // subtraction of the precomputed mean offset
        var acc = 0.0
        var i = 0
        while (i < w.length) { acc += emb(i).toDouble * w(i); i += 1 }
        var c = 0.0
        i = 0
        while (i < w.length) { c += model.means(i) * w(i); i += 1 }
        acc - c
      }.toSeq
      assert(got(id) == want, s"vec $id: ${got(id)} vs $want")
    }
  }
}

class HeavyHittersSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions.posexplode

  private def run(df: org.apache.spark.sql.DataFrame, k: Int, cap: Int) = df
    .select(call_function("graft_heavy_hitters", col("v"), lit(k), lit(cap)).as("hh"))
    .select(posexplode(col("hh")).as(Seq("i", "s")))
    .select(col("s.token"), col("s.cnt"))
    .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("exact regime: counts equal groupBy, deterministic under partitioning") {
    val data = (0 until 5000).map(i => s"tok${i % 37}")
    val want = data.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy(t => (-t._2, t._1)).take(10)
    Seq(1, 13).foreach { parts =>
      val got = run(data.toDF("v").repartition(parts), 10, 64)
      assert(got == want, s"parts=$parts: $got vs $want")
    }
  }

  test("sketchy regime: one-sided overestimate, true heavy hitter survives") {
    // zipf-ish stream: one dominant token + a long tail wider than the
    // buffer; SpaceSaving guarantees est >= true and the dominant token
    // cannot be evicted
    val data = (0 until 20000).flatMap { i =>
      Seq("dominant") ++ (if (i % 2 == 0) Seq(s"tail${i % 3000}") else Nil)
    }
    val trueCounts = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = run(data.toDF("v").repartition(7), 5, 64)
    assert(got.head._1 == "dominant", s"dominant token must rank first: $got")
    got.foreach { case (tok, est) =>
      assert(est >= trueCounts.getOrElse(tok, 0L),
        s"SpaceSaving must never undercount: $tok est=$est true=${trueCounts.get(tok)}")
      assert(est <= trueCounts.getOrElse(tok, 0L) + data.size.toLong / 64 + 1,
        s"overestimate beyond the n/capacity bound: $tok est=$est")
    }
  }

  test("matches the exact t8 top-tokens path on real data") {
    val got = SparkEntry.queries("k3_heavy_hitters")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val want = SparkEntry.queries("t8_top_tokens")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == want.toSeq)
  }
}

class QuantileSketchSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def disc(xs: Seq[Double], q: Double): Double = {
    val s = xs.sorted
    var cum = 0L
    val target = q * s.length
    s.find { _ => cum += 1; cum >= target }.getOrElse(s.last)
  }

  test("exact regime: equals percentile_disc for every q, any partitioning") {
    val vals = (0 until 3000).map(i => ((i * 2654435761L) % 977).toDouble)
    val df = vals.toDF("v")
    Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0).foreach { q =>
      val want = disc(vals, q)
      Seq(1, 17).foreach { parts =>
        val got = df.repartition(parts)
          .select(call_function("graft_quantile_sketch", col("v"), lit(q), lit(4096)))
          .collect()(0).getDouble(0)
        assert(got == want, s"q=$q parts=$parts: $got vs $want")
      }
    }
  }

  test("sketchy regime: rank error bounded, state stays bounded") {
    // 200k values through a 512-capacity sketch — far past the exact
    // regime; the returned element's TRUE rank must sit near q·n
    val n = 200000
    val vals = (0 until n).map(i => ((i * 40503L) % 99991).toDouble)
    val sorted = vals.sorted
    val df = vals.toDF("v")
    Seq(0.25, 0.5, 0.75).foreach { q =>
      val got = df
        .select(call_function("graft_quantile_sketch", col("v"), lit(q), lit(512)))
        .collect()(0).getDouble(0)
      // rank of the returned value (first occurrence)
      val rank = sorted.indexWhere(_ >= got).toDouble / n
      assert(math.abs(rank - q) < 0.05,
        s"q=$q: returned value at rank $rank (off by ${math.abs(rank - q)})")
    }
  }

  test("grouped quartiles match exact percentile_disc at gate capacity") {
    val docs = Tables.load(spark, sf, "documents")
    Tables.registerAll(spark, sf)
    val got = spark.sql(
      """SELECT lang,
        |  graft_quantile_sketch(length(text), 0.5, 4096) AS s50,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY length(text)) AS DOUBLE) AS e50
        |FROM documents GROUP BY lang""".stripMargin).collect()
    got.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"lang=${r.getString(0)}: sketch ${r.getDouble(1)} vs exact ${r.get(2)}")
    }
  }

  test("null inputs are skipped; empty group yields null") {
    val withNulls = Seq(Some(1.0), None, Some(3.0), None).toDF("v")
    assert(withNulls
      .select(call_function("graft_quantile_sketch", col("v"), lit(0.5), lit(64)))
      .collect()(0).getDouble(0) == 1.0)
    val empty = Seq.empty[Double].toDF("v")
    assert(empty
      .select(call_function("graft_quantile_sketch", col("v"), lit(0.5), lit(64)))
      .collect()(0).isNullAt(0))
  }
}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Unit coverage for the codegen'd vector expressions: value correctness,
  * bit-identity with the composable Spark form (the property the DuckDB
  * oracle gate relies on), float/double input handling, and null safety.
  */
class VectorExprSpec extends AnyFunSuite {
  import TestSpark._

  private def composableCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def d(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), _ + _)
    d(a, b) / (sqrt(d(a, a)) * sqrt(d(b, b)))
  }

  test("dot and cosine compute known values") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      Similarity.dot(col("a"), col("b")).as("d"),
      Similarity.cosine(col("a"), col("a")).as("self")).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("fused cosine is bit-identical to the composable form on real embeddings") {
    val e = Tables.load(spark, sf, "embeddings").limit(50)
    val v = e.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val l = v.alias("l"); val r = v.alias("r")
    val both = l.join(r, col("l.vec_id") < col("r.vec_id"))
      .select(
        Similarity.cosine(col("l.v"), col("r.v")).as("fused"),
        composableCosine(col("l.v"), col("r.v")).as("composed"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { row =>
      assert(row.getDouble(0) == row.getDouble(1),
        s"fused ${row.getDouble(0)} != composed ${row.getDouble(1)}")
    }
  }

  test("float arrays widen per element — same result as pre-cast doubles") {
    val e = Tables.load(spark, sf, "embeddings").limit(20)
    val rows = e.select(
      Similarity.cosine(col("embedding"), col("embedding")).as("raw"),
      Similarity.cosine(
        transform(col("embedding"), x => x.cast("double")),
        transform(col("embedding"), x => x.cast("double"))).as("cast"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null inputs yield null, not a crash") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]]))
      .toDF("a", "b")
    val r = df.select(Similarity.cosine(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("SQL text path reaches the registered function") {
    import spark.implicits._
    Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val r = spark.sql("select graft_cosine(a, b) as c, graft_dot(a, a) as d from vecs").head()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 1.0)
  }
}

class GramMomentsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.functions.{explode, posexplode, count, sum}
  import org.apache.spark.sql.DataFrame

  private def fused(e: DataFrame, dim: Int) =
    e.agg(call_function("graft_gram_moments", col("embedding"), lit(dim)).as("g"))
      .select(explode(col("g")).as("r"))
      .select(col("r.i"), col("r.j"), col("r.n"),
        col("r.sxy").cast("double").as("sxy"),
        col("r.sx").cast("double").as("sx"),
        col("r.sy").cast("double").as("sy"))
      .orderBy(col("i"), col("j"))
      .collect().map(r =>
        (r.getInt(0), r.getInt(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq

  /** The composable decimal-routed form the aggregate replaces — the
    * bit-for-bit ground truth.
    */
  private def composable(e: DataFrame, dim: Int) = {
    val x = e.select(col("embedding"),
      posexplode(col("embedding")).as(Seq("i", "vf")))
    val pairs = x
      .select(col("i"), col("vf").cast("double").as("vi"),
        posexplode(col("embedding")).as(Seq("j", "wf")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        sum((col("vi") * col("wf").cast("double")).cast("decimal(28,12)"))
          .cast("double").as("sxy"))
    val dims = x.groupBy(col("i"))
      .agg(sum(col("vf").cast("double").cast("decimal(28,12)"))
        .cast("double").as("s"))
    pairs
      .join(dims.toDF("i", "sx"), Seq("i"))
      .join(dims.toDF("j", "sy"), Seq("j"))
      .select(col("i"), col("j"), col("n"), col("sxy"), col("sx"), col("sy"))
      .orderBy(col("i"), col("j"))
      .collect().map(r =>
        (r.getInt(0), r.getInt(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
  }

  test("fused gram moments equal the decimal explode/groupBy form on real data") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    assert(fused(e, 64) == composable(e, 64))
  }

  test("partition-invariant (merge path exercised)") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    assert(fused(e.repartition(13), 64) == fused(e.repartition(1), 64))
  }

  test("long-lane overflow folds into the BigInteger lane exactly") {
    // values of 1e3 make each product's scale-12 unscaled term 1e18:
    // two rows already wrap a signed long, so the sum is only right if
    // the overflow lane engages — and it must still match the decimal
    // groupBy ground truth bit-for-bit
    val e = (0 until 40).map(_ => Tuple1(Array(1e3f, -1e3f)))
      .toDF("embedding")
    assert(fused(e, 2) == composable(e, 2))
  }

  test("null, wrong-length, and null-element rows are skipped whole") {
    val rows = Seq(
      Row(Seq(1.0f, 2.0f)),
      Row(null),
      Row(Seq(1.0f)),
      Row(Seq(3.0f, null)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = true))))
    val e = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val got = fused(e, 2)
    assert(got.forall(_._3 == 1L), s"only the clean row counts: $got")
    assert(got.map(t => (t._1, t._2, t._4)) ==
      Seq((0, 0, 1.0), (0, 1, 2.0), (1, 1, 4.0)))
  }
}

/** Differential pins for the round-12 exactness contracts: the decimal
  * size-ratio prefilter vs exact rational arithmetic, and the
  * graft_gram_moments decimal replica vs Spark's own Cast — over dense
  * boundary grids rather than one corpus, so the contracts hold by
  * construction, not by data luck.
  */
class DecimalExactnessSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions.{explode, sum, count}

  test("sizeRatioAtLeast equals exact rational min/max >= t on a dense grid") {
    // every (a, b) in [1, 200]^2 at the thresholds the operators use —
    // includes every exact-integer t*max boundary (the class the double
    // form got wrong: double(0.8)*5 = 4.000000000000000222 rejected 4/5)
    for (t <- Seq(0.7, 0.8, 0.9, 0.95, 0.98)) {
      val td = java.math.BigDecimal.valueOf(t)
      val rows = for (a <- 1 to 200; b <- a to 200) yield (a.toLong, b.toLong)
      val got = rows.toDF("a", "b")
        .filter(graft.operators.Dedup.sizeRatioAtLeast(col("a"), col("b"), t))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = rows.filter { case (a, b) =>
        // min/max >= t  ⟺  min*10^scale >= t_unscaled*max, all integers
        java.math.BigDecimal.valueOf(a).compareTo(
          td.multiply(java.math.BigDecimal.valueOf(b))) >= 0
      }.toSet
      assert(got == want,
        s"t=$t: spark-only=${(got -- want).take(3)} exact-only=${(want -- got).take(3)}")
    }
  }

  test("gram-moment terms equal Spark's own cast(x as decimal(28,12)) sums") {
    // random magnitudes across the float exponent range (incl. exact-half
    // decimal boundaries via scaled integers): the aggregate's
    // BigDecimal.valueOf+HALF_UP replica must reproduce sum(cast(...))
    // for 1-dim vectors, where sxy = sum(cast(v*v)) and sx = sum(cast(v))
    val rnd = new scala.util.Random(7)
    val vals = (0 until 4000).map { i =>
      if (i % 4 == 0) (rnd.nextInt(2000001) - 1000000).toFloat / 1000f // dense decimal grid
      else (rnd.nextFloat() - 0.5f) * math.pow(2.0, rnd.nextInt(24) - 12).toFloat
    }
    val e = vals.map(v => Tuple1(Array(v))).toDF("embedding")
    val got = e.agg(call_function("graft_gram_moments",
        col("embedding"), lit(1)).as("g"))
      .select(explode(col("g")).as("r"))
      .select(col("r.sxy"), col("r.sx"))
      .collect().map(r => (r.getDecimal(0), r.getDecimal(1))).head
    val want = e.select(col("embedding")(0).cast("double").as("v"))
      .agg(sum((col("v") * col("v")).cast("decimal(28,12)")).as("sxy"),
        sum(col("v").cast("decimal(28,12)")).as("sx"))
      .collect().map(r => (r.getDecimal(0), r.getDecimal(1))).head
    assert(got._1.compareTo(want._1) == 0, s"sxy ${got._1} != ${want._1}")
    assert(got._2.compareTo(want._2) == 0, s"sx ${got._2} != ${want._2}")
  }
}
