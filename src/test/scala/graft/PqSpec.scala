package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Product quantization (`Similarity.fitPq` / `pqEncode`). */
class PqSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def corpus(n: Int, dim: Int, parts: Int) =
    (0 until n).map { i =>
      (i.toLong, (0 until dim).map(d => ((i * 31 + d * 7) % 97) / 97.0f))
    }.toDF("vec_id", "embedding").repartition(parts)

  test("codes are deterministic under any partitioning and in [1, k]") {
    val m = 4; val k = 8
    val a = corpus(500, 16, 1)
    val b = corpus(500, 16, 32)
    val model = Similarity.fitPq(a, dim = 16, m = m, k = k, iters = 2)
    val modelB = Similarity.fitPq(b, dim = 16, m = m, k = k, iters = 2)
    // fit must not depend on partitioning (hash-prefix sample + decimal sums)
    assert(model == modelB, "fitted codebooks must be partition-invariant")
    def codes(df: org.apache.spark.sql.DataFrame) =
      Similarity.pqEncode(df, model).collect()
        .map(r => r.getLong(0) -> (1 until 1 + m).map(r.getInt)).toMap
    val ca = codes(a)
    val cb = codes(b)
    assert(ca == cb, "encoding must be partition-invariant")
    assert(ca.values.flatten.forall(c => c >= 1 && c <= k))
    ca.values.transpose.zipWithIndex.foreach { case (sub, i) =>
      assert(sub.toSet.size > 1, s"subspace $i collapsed to one code")
    }
  }

  test("a vector equal to a codebook centroid encodes to that centroid") {
    val model = Similarity.fitPq(corpus(300, 16, 8), dim = 16, m = 2, k = 4, iters = 2)
    // take each centroid of subspace 0 paired with centroid 1 of subspace 1
    val probes = model.books(0).map { case (cid, c) =>
      (cid.toLong, (c ++ model.books(1).head._2).map(_.toFloat))
    }.toDF("vec_id", "embedding")
    val got = Similarity.pqEncode(probes, model).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { case (cid, code) =>
      assert(code == cid.toInt,
        s"centroid $cid must be its own nearest code, got $code")
    }
  }

  test("adc top-k stays within the query's cluster on separated data") {
    // two well-separated clusters: codes differ across clusters, so every
    // approximate neighbor of a cluster-A query must be a cluster-A member
    val rows = (0 until 400).map { i =>
      val base = if (i < 200) 0.0f else 10.0f
      (i.toLong, (0 until 16).map(d => base + ((i * 13 + d) % 7) * 0.01f))
    }.toDF("vec_id", "embedding").repartition(16)
    val model = Similarity.fitPq(rows, dim = 16, m = 4, k = 8, iters = 2)
    val codes = Similarity.pqEncode(rows, model)
    val got = Similarity.pqAdcTopK(
      rows.filter(col("vec_id") < 5), codes, model, k = 10).collect()
    assert(got.length == 50)
    got.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(1))
      assert(n < 200, s"query $q (cluster A) got cross-cluster neighbor $n")
      assert(n != q, "self must be excluded")
    }
    // determinism under partitioning
    val again = Similarity.pqAdcTopK(
      rows.repartition(1).filter(col("vec_id") < 5),
      Similarity.pqEncode(rows.repartition(1), model), model, k = 10).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq.sorted ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq.sorted)
  }

  test("ivf-pq with nprobe = nlist equals plain ADC exactly") {
    // full probe ⇒ the candidate set is the whole corpus, so the
    // composed IVF-PQ ranking must reproduce pqAdcTopK bit-for-bit —
    // centroid assignment, probe ranking, the candidate equi join, and
    // the LUT sum all sit on the checked path (the a2p discipline)
    val c = corpus(400, 16, 8)
    val queries = c.filter(col("vec_id") < 3)
    val model = Similarity.fitPq(c, dim = 16, m = 2, k = 4, iters = 2)
    val cents = Similarity.lloydCentroids(c, nlist = 4, iters = 1)
    val full = Similarity.ivfPqTopK(cents, c, queries, model,
        k = 8, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    val adc = Similarity.pqAdcTopK(queries, Similarity.pqEncode(c, model),
        model, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    assert(full == adc,
      "nprobe = nlist must reduce IVF-PQ to the exhaustive ADC ranking")
    assert(full.nonEmpty)
  }

  test("ivf-pq pruned probe returns a subset of candidates' adc scores") {
    // with nprobe < nlist every returned neighbor must carry the SAME
    // adist the exhaustive ADC assigns it (pruning changes the candidate
    // set, never a surviving score)
    val c = corpus(400, 16, 8)
    val queries = c.filter(col("vec_id") < 3)
    val model = Similarity.fitPq(c, dim = 16, m = 2, k = 4, iters = 2)
    val cents = Similarity.lloydCentroids(c, nlist = 4, iters = 1)
    val pruned = Similarity.ivfPqTopK(cents, c, queries, model,
        k = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val adcAll = Similarity.pqAdcTopK(queries, Similarity.pqEncode(c, model),
        model, k = 400)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pruned.nonEmpty)
    pruned.foreach { case (key, d) =>
      assert(adcAll(key) == d,
        s"pruning must preserve the ADC score for $key")
    }
  }

  test("adc rerank: true-cosine re-ranking of the ADC shortlist, driver-replayed") {
    val c = corpus(400, 16, 8)
    val model = Similarity.fitPq(c, dim = 16, m = 2, k = 8, iters = 2)
    val codes = Similarity.pqEncode(c, model)
    val queries = c.filter(col("vec_id") < 4)
    val got = Similarity
      .adcRerankTopK(c, codes, model, queries, shortlist = 12, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.length == 4 * 5)
    // the served set is exactly the top-5 BY TRUE COSINE of the ADC
    // shortlist — replay both stages on the driver
    val shortMap = Similarity.pqAdcTopK(queries, codes, model, 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val vecs = c.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      def d(x: Seq[Double], y: Seq[Double]) =
        x.zip(y).foldLeft(0.0) { case (s, (p, q)) => s + p * q }
      d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
    }
    got.groupBy(_._1).foreach { case (q, rows) =>
      val want = shortMap(q).toSeq
        .map(n => (n, cos(vecs(q), vecs(n))))
        .sortBy { case (n, s) => (-s, n) }.take(5)
      val gotQ = rows.sortBy(_._4).map(r => (r._2, r._3)).toSeq
      assert(gotQ.map(_._1) == want.map(_._1),
        s"query $q: rerank order must be true-cosine over the shortlist")
      // shortlist membership: rerank can only serve shortlisted ids
      assert(gotQ.map(_._1).toSet.subsetOf(shortMap(q)))
    }
    val e = intercept[IllegalArgumentException] {
      Similarity.adcRerankTopK(c, codes, model, queries, shortlist = 3, k = 5)
    }
    assert(e.getMessage.contains("shortlist >= k"))
  }

  /** Eight tight clusters with ORTHOGONAL directions (cluster c lives
    * on dims [2c, 2c+2)) — the cosine coarse quantizer separates them,
    * and with only k = 2 codes per subspace flat PQ cannot cover 8
    * cluster patterns while the residuals are all near-zero noise.
    */
  private def clustered(n: Int, dim: Int) =
    (0 until n).map { i =>
      val c = i % 8
      (i.toLong,
        (0 until dim).map { d =>
          val noise = ((i * 7 + d * 3) % 13) / 13000.0f
          if (d == 2 * c || d == 2 * c + 1)
            1.0f + ((i * 13 + d * 5) % 17) / 1700.0f
          else noise
        })
    }.toDF("vec_id", "embedding")

  test("residual PQ quantizes clustered data with lower distortion than flat") {
    import org.apache.spark.sql.functions._
    val dim = 16; val m = 4; val k = 2
    val data = clustered(400, dim)
    val cents = Similarity.lloydCentroids(data, nlist = 8, iters = 3)
    val flat = Similarity.fitPq(data, dim, m, k, iters = 2)
    val resid = Similarity.fitResidualPq(data, cents, dim, m, k, iters = 2)
    // mean squared reconstruction error, computed driver-side from the
    // persisted-model shapes (the distortion the spec pins)
    def mse(model: Similarity.PqModel,
        frame: org.apache.spark.sql.DataFrame): Double = {
      val books = model.books
      val rows = frame.select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("v"))
        .collect().map(r => r.getSeq[Double](1))
      rows.map { v =>
        (0 until model.m).map { sub =>
          val block = v.slice(sub * model.dsub, (sub + 1) * model.dsub)
          books(sub).map { case (_, c) =>
            block.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
          }.min
        }.sum
      }.sum / rows.length
    }
    val flatMse = mse(flat, data)
    val centArr = cents.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1): Seq[Double])).toSeq
    val residFrame = Similarity.residualVectors(data, centArr)
      .select(col("vec_id"), col("embedding"))
    val residMse = mse(resid, residFrame)
    assert(residMse < flatMse / 4,
      s"residual distortion $residMse must undercut flat $flatMse")
  }

  test("residual ivf-pq serving: deterministic, k rows per query, self excluded") {
    import org.apache.spark.sql.functions._
    val dim = 16; val m = 4; val k = 2
    val data = clustered(160, dim)
    val cents = Similarity.lloydCentroids(data, nlist = 8, iters = 3)
    val model = Similarity.fitResidualPq(data, cents, dim, m, k, iters = 2)
    val queries = data.filter(col("vec_id") < 3)
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.ivfPqResidualTopK(cents, df, queries, model,
          k = 5, nprobe = 8)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val a = run(data)
    val b = run(data.repartition(13))
    assert(a == b, "serving must be partition-invariant bit-for-bit")
    assert(a.length == 15, "5 neighbors for each of 3 queries")
    assert(a.forall(r => r(1) != r(0)), "a query never returns itself")
    // nprobe = nlist(8) probes everything: adist is the TRUE quantized
    // distance, so the nearest neighbor of a query must share its
    // (orthogonal-direction) cluster
    a.filter(_(3) == 1).foreach { r =>
      val q = r(0).asInstanceOf[Long]; val n = r(1).asInstanceOf[Long]
      assert((q % 8) == (n % 8), s"rank-1 neighbor of $q crossed clusters: $n")
    }
  }

  /** UNBALANCED variance: four independent high-variance dimensions
    * all land in flat PQ's FIRST subspace (one codebook quantizing a
    * 4-D cloud, three codebooks wasted on noise); OPQ's balanced
    * eigen-permutation spreads them one per subspace, so each codebook
    * quantizes an essentially 1-D manifold — the regime Ge et al.'s
    * parametric solution is built for.
    */
  private def correlated(n: Int, dim: Int) = {
    val primes = Seq(3, 7, 11, 13)
    (0 until n).map { i =>
      (i.toLong, (0 until dim).map { d =>
        if (d < 4) ((i * primes(d)) % 16) / 2.0f
        else ((i * 7 + d * 3) % 11) / 1100.0f
      })
    }.toDF("vec_id", "embedding")
  }

  test("OPQ: rotation is a balanced permutation of the eigenbasis") {
    val dim = 16; val m = 4
    val data = correlated(300, dim)
    val model = Similarity.fitOpqParametric(data, dim, m, k = 4, iters = 2)
    assert(model.rotation.length == dim)
    assert(model.rotation.forall(_._1.length == dim))
    // component rows are unit vectors (orthonormal eigenbasis rows)
    model.rotation.foreach { case (w, _) =>
      val n2 = w.map(x => x * x).sum
      assert(math.abs(n2 - 1.0) < 1e-8, s"component norm² $n2")
    }
  }

  test("OPQ quantizes cross-subspace correlation with lower distortion than PQ") {
    import org.apache.spark.sql.functions._
    val dim = 16; val m = 4; val k = 4
    val data = correlated(400, dim)
    val flat = Similarity.fitPq(data, dim, m, k, iters = 2)
    val opq = Similarity.fitOpqParametric(data, dim, m, k, iters = 2)
    def mse(model: Similarity.PqModel,
        frame: org.apache.spark.sql.DataFrame): Double = {
      val rows = frame.select(
          transform(col("embedding"), _.cast("double")).as("v"))
        .collect().map(_.getSeq[Double](0))
      rows.map { v =>
        (0 until model.m).map { sub =>
          val block = v.slice(sub * model.dsub, (sub + 1) * model.dsub)
          model.books(sub).map { case (_, c) =>
            block.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
          }.min
        }.sum
      }.sum / rows.length
    }
    val flatMse = mse(flat, data)
    val rotated = data.select(col("vec_id"),
      Similarity.opqRotate(col("embedding"), opq).as("embedding"))
    val opqMse = mse(opq.pq, rotated)
    assert(opqMse < flatMse / 2,
      s"OPQ distortion $opqMse must undercut flat $flatMse")
  }

  test("OPQ ADC serving: deterministic and adist-faithful under rotation") {
    import org.apache.spark.sql.functions._
    val dim = 16; val m = 4; val k = 4
    val data = correlated(200, dim)
    val model = Similarity.fitOpqParametric(data, dim, m, k, iters = 2)
    val queries = data.filter(col("vec_id") < 3)
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.opqAdcTopK(df, queries, model, k = 5)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val a = run(data)
    assert(a.length == 15 && a.forall(r => r(1) != r(0)))
    assert(a == run(data.repartition(11)),
      "rotated serving must be partition-invariant bit-for-bit")
  }

  /** Clustered AND unbalanced: coarse cluster offsets live one-per-dim
    * in the LAST subspace's dims, while the within-cluster variance
    * concentrates — with distinct per-dim magnitudes — in flat PQ's
    * FIRST subspace, so residual-alone PQ spends one k=2 codebook on a
    * 4-D residual cloud and wastes the rest on noise; the balanced
    * eigen-permutation spreads those directions one per subspace — the
    * regime where the OPQ and IVFADC distortion wins STACK.
    */
  private def clusteredUnbalanced(n: Int, dim: Int) =
    (0 until n).map { i =>
      val c = i % 4
      (i.toLong, (0 until dim).map { d =>
        val noise = ((i * 7 + d * 3) % 13) / 13000.0f
        val offset = if (d == 12 + c) 10.0f else 0.0f
        val within =
          if (d < 4) ((i * 13 + d * 5 + c) % 17) / 1.7f * (4 - d) / 4.0f
          else 0.0f
        offset + within + noise
      })
    }.toDF("vec_id", "embedding")

  test("OPQ+IVF+PQ: composed stack undercuts residual-alone on unbalanced clusters") {
    import org.apache.spark.sql.functions._
    val dim = 16; val m = 4; val k = 2
    val data = clusteredUnbalanced(400, dim)
    def mse(model: Similarity.PqModel,
        frame: org.apache.spark.sql.DataFrame): Double = {
      val rows = frame.select(
          transform(col("embedding"), _.cast("double")).as("v"))
        .collect().map(_.getSeq[Double](0))
      rows.map { v =>
        (0 until model.m).map { sub =>
          val block = v.slice(sub * model.dsub, (sub + 1) * model.dsub)
          model.books(sub).map { case (_, c) =>
            block.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
          }.min
        }.sum
      }.sum / rows.length
    }
    def centArr(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1): Seq[Double])).toSeq
    // residual-alone (a11): coarse + residual codebooks in RAW space
    val centsRaw = Similarity.lloydCentroids(data, nlist = 4, iters = 3)
    val residAlone = Similarity.fitResidualPq(data, centsRaw, dim, m, k,
      iters = 2)
    val residMse = mse(residAlone,
      Similarity.residualVectors(data, centArr(centsRaw))
        .select(col("vec_id"), col("embedding")))
    // composed (a13): rotate, coarse-assign and fit residual books in
    // the ROTATED space (rotation is orthogonal + shift, so rotated-
    // space reconstruction MSE is raw-space MSE — comparable directly)
    val rot = Similarity.fitOpqRotation(data, dim, m)
    val rdata = Similarity.rotateFrame(data, rot)
    val centsRot = Similarity.lloydCentroids(rdata, nlist = 4, iters = 3)
    val composed = Similarity.fitResidualPq(rdata, centsRot, dim, m, k,
      iters = 2)
    val composedMse = mse(composed,
      Similarity.residualVectors(rdata, centArr(centsRot))
        .select(col("vec_id"), col("embedding")))
    assert(composedMse < residMse,
      s"composed distortion $composedMse must undercut residual-alone $residMse")
    // and the composed serving face is partition-invariant, k rows per
    // query, self-excluded (the a11 serving contract under rotation)
    val queries = data.filter(col("vec_id") < 3)
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.opqIvfPqResidualTopK(centsRot, df, queries, rot,
          composed, k = 5, nprobe = 4)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val a = run(data)
    assert(a.length == 15 && a.forall(r => r(1) != r(0)))
    assert(a == run(data.repartition(11)),
      "rotated residual serving must be partition-invariant bit-for-bit")
  }

  test("PQ partial refit: planted stale subspace refits alone; healthy books bit-identical") {
    import org.apache.spark.sql.functions._
    val dim = 16; val m = 4; val k = 2
    val base = clustered(300, dim)
    val model = Similarity.fitPq(base, dim, m, k, iters = 2)
    // planted drift: warp ONLY subspace 0's dims far out of range
    val drop = clustered(80, dim)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => when(i < 4, x * lit(3.0) + lit(2.0)).otherwise(x))
          .as("embedding"))
    val refit = Similarity.pqPartialRefit(model, base, drop,
      mseRatio = 4.0, iters = 2)
    val rows = refit.collect().map(r => (r.getInt(0), r.getInt(1),
      r.getSeq[Double](2).toSeq, r.getBoolean(3)))
    assert(rows.length == m * k)
    val staleSubs = rows.filter(_._4).map(_._1).toSet
    assert(staleSubs == Set(0), s"only subspace 0 may refit: $staleSubs")
    // healthy books pass through bit-identical
    (1 until m).foreach { sub =>
      val got = rows.filter(_._1 == sub).sortBy(_._2)
        .map(r => (r._2, r._3)).toSeq
      assert(got == model.books(sub).map { case (id, c) => (id, c.toSeq) },
        s"healthy subspace $sub must pass through untouched")
    }
    // no drift ⇒ all rows pass through refit = false (serve on)
    val calm = Similarity.pqPartialRefit(model, base,
      clustered(80, dim).select((col("vec_id") + 1000L).as("vec_id"),
        col("embedding")), mseRatio = 4.0, iters = 2)
    assert(calm.filter(col("refit")).count() == 0L)
    // re-encode containment: healthy subspaces' codes unchanged, and
    // the map-only pass is partition-invariant
    val vecs = base.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .unionByName(drop)
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.pqReencodeAfterRefit(model, refit, df)
        .orderBy("vec_id", "sub").collect().map(_.toSeq).toSeq
    val enc = run(vecs)
    assert(enc == run(vecs.repartition(9)))
    enc.foreach { r =>
      val sub = r(1).asInstanceOf[Int]
      if (sub != 0) assert(r(2) == r(3),
        s"healthy subspace $sub must keep its code: $r")
    }
    // the stale subspace's refit is LIVE: warped drop blocks move code
    assert(enc.exists { r =>
      r(0).asInstanceOf[Long] >= 1000L && r(1).asInstanceOf[Int] == 0 &&
        r(2) != r(3)
    }, "the refit subspace must actually re-code the drifted blocks")
  }

  test("invalid shapes are rejected") {
    val df = corpus(10, 16, 1)
    intercept[IllegalArgumentException] {
      Similarity.fitPq(df, dim = 16, m = 3, k = 4, iters = 0) // 16 % 3 != 0
    }
    intercept[IllegalArgumentException] {
      Similarity.fitPq(df, dim = 16, m = 2, k = 300, iters = 0) // k > 256
    }
  }
}
