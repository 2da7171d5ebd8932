package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear-probe fitting: the classifier-based quality-filter pattern
  * (fastText-style) with the model fit done in-engine, closed-form.
  *
  * `fitRidge` solves the ridge normal equations `(XᵀX + λI) w = Xᵀy`
  * over a `(features: array<double>, label: double)` frame. The Gram
  * matrix and moment vector are ONE distributed aggregate each with
  * decimal-routed product sums (the v3 covariance discipline), so the
  * fitted weights are bit-identical on any partitioning; the `dim²`
  * driver solve is Gaussian elimination with partial pivoting —
  * deterministic double math, the Jacobi-eigensolver discipline.
  *
  * Scale posture: the hot pass is O(n·dim²) map-side work collapsing
  * into dim(dim+1)/2 shuffle rows per partition; `fitCap` applies the
  * hash-prefix-sample bound (the Lloyd/PCA `fitCap` discipline) so the
  * fit pass is corpus-size-independent when capped. Scoring is a
  * map-only dot product against literal weights — no join, no shuffle,
  * and exactly replayable by an external engine from the persisted
  * model (model-as-data, the v4p fold discipline).
  *
  * The reference engine has no learned-filter surface; this extends the
  * pipeline the way sketches and ANN do (SURVEY.md §8.2).
  */
object Probe {

  /** Default fit-pass cap, matching the PCA sampled-fit bound. */
  val FitCap: Int = 65536

  /** Fitted ridge model: O(dim) driver state (the Lloyd-centroid /
    * BPE-table discipline). `nFit` is the number of rows the fit saw.
    */
  final case class LinearModel(
      weights: Array[Double], lambda: Double, nFit: Long) {
    def dim: Int = weights.length
  }

  /** Closed-form ridge regression on `(featuresCol, labelCol)`.
    * Features must be non-null arrays of exactly `dim` doubles with no
    * null elements; include a constant-1 slot for an intercept. Labels
    * must be non-null (a null label would silently drop from the moment
    * sums but not the Gram counts — the ragged check rejects the
    * resulting mismatch only when an entire row is null, so feed clean
    * labels).
    */
  def fitRidge(
      xy: DataFrame,
      dim: Int,
      lambda: Double = 1e-3,
      fitCap: Int = FitCap,
      featuresCol: String = "features",
      labelCol: String = "label",
      idCol: String = "doc_id"): LinearModel = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(lambda >= 0.0, s"lambda must be >= 0, got $lambda")
    require(fitCap >= 2, s"fitCap must be >= 2, got $fitCap")
    val fit =
      if (fitCap == Int.MaxValue) xy
      else {
        require(xy.columns.contains(idCol),
          s"fitRidge: sampled fit orders by id column '$idCol', not present " +
            s"in [${xy.columns.mkString(", ")}] — pass idCol or " +
            "fitCap=Int.MaxValue")
        // TakeOrderedAndProject: per-partition top-n, no global sort
        xy.orderBy(xxhash64(col(idCol)), col(idCol)).limit(fitCap)
      }
    val x = fit.select(col(featuresCol).as("features"),
      col(labelCol).cast("double").as("label"),
      posexplode(col(featuresCol)).as(Seq("i", "vf")))
    val gram = x
      .select(col("i"), col("vf").cast("double").as("vi"), col("label"),
        posexplode(col("features")).as(Seq("j", "wf")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(
        count(lit(1)).as("n"),
        sum((col("vi") * col("wf").cast("double")).cast("decimal(28,12)"))
          .cast("double").as("sxy"))
      .collect()
    val moments = x.groupBy(col("i"))
      .agg(sum((col("vf").cast("double") * col("label")).cast("decimal(28,12)"))
        .cast("double").as("sxy"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    require(gram.nonEmpty,
      "fitRidge: no feature values to fit on — the corpus (or fit sample) " +
        "is empty, or every feature array is NULL/empty")
    val over = gram.iterator.map(_.getInt(1)).filter(_ >= dim).toSeq
    require(over.isEmpty,
      s"fitRidge: features carry dimensions up to ${over.max} but dim=$dim " +
        "— pass the true feature width")
    val missing = (0 until dim).filterNot(moments.contains)
    require(missing.isEmpty,
      s"fitRidge: features cover ${moments.size} of dim=$dim dimensions " +
        s"(missing: ${missing.take(8).mkString(", ")}" +
        s"${if (missing.length > 8) ", …" else ""})")
    val pairCounts = gram.map(_.getLong(2)).distinct
    require(pairCounts.length == 1,
      "fitRidge: ragged feature lengths — every row must have exactly " +
        s"dim=$dim values (saw per-pair counts " +
        s"${pairCounts.sorted.take(4).mkString(", ")}…)")
    val a = Array.ofDim[Double](dim, dim)
    gram.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1); val s = r.getDouble(3)
      a(i)(j) = s; a(j)(i) = s
    }
    (0 until dim).foreach(i => a(i)(i) += lambda)
    val b = Array.tabulate(dim)(moments)
    LinearModel(solve(a, b), lambda, pairCounts.head)
  }

  /** Logistic-regression probe fit by IRLS (iteratively reweighted
    * least squares — `iters` damped-free Newton steps on the
    * L2-regularized logistic loss): the ACTUAL loss behind fastText-
    * style quality filters, where [[fitRidge]] is the squared-loss
    * shortcut. Per step: margins and sigmoids evaluate row-local
    * against the CURRENT weights (literals — no join), the weighted
    * Gram `XᵀRX` (R = diag(p(1−p))) and gradient `Xᵀ(y − p) − λw`
    * collapse in ONE distributed aggregate each with decimal-routed
    * product sums (per-row doubles are partition-independent, so the
    * decimal sums make the whole fit bit-identical on any
    * partitioning — the fitRidge discipline), and the `dim²` Newton
    * system solves on the driver. The capped fit sample persists
    * across steps (the trainer-fit-cost posture: `iters` small
    * aggregates over ≤ fitCap rows, corpus-size-independent).
    *
    * Thresholding the returned margin ≡ thresholding the probability
    * (sigmoid is monotone), so scoring needs no transcendental and the
    * model-as-data oracle replays it exactly like the ridge probe's.
    */
  def fitLogistic(
      xy: DataFrame,
      dim: Int,
      lambda: Double = 1e-3,
      iters: Int = 3,
      fitCap: Int = FitCap,
      featuresCol: String = "features",
      labelCol: String = "label",
      idCol: String = "doc_id"): LinearModel = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(lambda > 0.0,
      s"lambda must be > 0 for IRLS (the Newton system needs the ridge " +
        s"term when a step separates the sample), got $lambda")
    require(iters >= 1 && iters <= 16, s"iters must be in [1, 16], got $iters")
    require(fitCap >= 2, s"fitCap must be >= 2, got $fitCap")
    val fitRaw =
      if (fitCap == Int.MaxValue) xy
      else {
        require(xy.columns.contains(idCol),
          s"fitLogistic: sampled fit orders by id column '$idCol', not " +
            s"present in [${xy.columns.mkString(", ")}] — pass idCol or " +
            "fitCap=Int.MaxValue")
        xy.orderBy(xxhash64(col(idCol)), col(idCol)).limit(fitCap)
      }
    val fit = fitRaw.select(col(featuresCol).as("features"),
      col(labelCol).cast("double").as("label")).persist()
    try {
      var w = Array.fill(dim)(0.0)
      var n = 0L
      (1 to iters).foreach { _ =>
        val m = w.zipWithIndex.map { case (wi, i) =>
          (element_at(col("features"), i + 1).cast("double") * lit(wi))
            .cast("decimal(28,12)")
        }.reduce(_ + _).cast("double")
        val p = lit(1.0) / (lit(1.0) + exp(-m))
        val x = fit.select(col("features"), col("label"), p.as("p"),
          (p * (lit(1.0) - p)).as("r"),
          posexplode(col("features")).as(Seq("i", "vf")))
        val gram = x
          .select(col("i"), col("vf").cast("double").as("vi"), col("r"),
            posexplode(col("features")).as(Seq("j", "wf")))
          .filter(col("j") >= col("i"))
          .groupBy(col("i"), col("j"))
          .agg(count(lit(1)).as("n"),
            sum((col("vi") * col("wf").cast("double") * col("r"))
              .cast("decimal(28,12)")).cast("double").as("s"))
          .collect()
        val grad = x.groupBy(col("i"))
          .agg(sum((col("vf").cast("double") * (col("label") - col("p")))
            .cast("decimal(28,12)")).cast("double").as("g"))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
        require(gram.nonEmpty,
          "fitLogistic: no feature values to fit on — the corpus (or fit " +
            "sample) is empty, or every feature array is NULL/empty")
        val over = gram.iterator.map(_.getInt(1)).filter(_ >= dim).toSeq
        require(over.isEmpty,
          s"fitLogistic: features carry dimensions up to ${over.max} but " +
            s"dim=$dim — pass the true feature width")
        val missing = (0 until dim).filterNot(grad.contains)
        require(missing.isEmpty,
          s"fitLogistic: features cover ${grad.size} of dim=$dim dimensions")
        val a = Array.ofDim[Double](dim, dim)
        gram.foreach { r =>
          val i = r.getInt(0); val j = r.getInt(1); val s = r.getDouble(3)
          a(i)(j) = s; a(j)(i) = s
        }
        (0 until dim).foreach(i => a(i)(i) += lambda)
        val b = Array.tabulate(dim)(i => grad(i) - lambda * w(i))
        val delta = solve(a, b)
        w = w.zip(delta).map { case (wi, di) => wi + di }
        n = gram.map(_.getLong(2)).max
      }
      LinearModel(w, lambda, n)
    } finally fit.unpersist()
  }

  /** In-place-free Gaussian elimination with partial pivoting (first
    * max pivot on ties — deterministic). Rejects singular systems.
    */
  private[graft] def solve(
      a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val m = Array.tabulate(n)(i => a0(i) :+ b0(i))
    (0 until n).foreach { c =>
      val p = (c until n).maxBy(r => math.abs(m(r)(c)))
      require(math.abs(m(p)(c)) > 0.0,
        "fitRidge: singular normal equations — features are linearly " +
          "dependent; raise lambda or drop a feature")
      val t = m(c); m(c) = m(p); m(p) = t
      ((c + 1) until n).foreach { r =>
        val f = m(r)(c) / m(c)(c)
        (c to n).foreach(k => m(r)(k) -= f * m(c)(k))
      }
    }
    val w = new Array[Double](n)
    ((n - 1) to 0 by -1).foreach { r =>
      var s = m(r)(n)
      ((r + 1) until n).foreach(k => s -= m(r)(k) * w(k))
      w(r) = s / m(r)(r)
    }
    w
  }

  /** Map-only margin `w·x`, decimal-routed per term so the sum is
    * order-insensitive and exactly replayable from the persisted
    * weights: `Σ_i CAST(x_i · w_i AS DECIMAL(28,12))`, cast back to
    * double. Weights fold in as literals — no join, no shuffle.
    */
  def margin(features: Column, model: LinearModel): Column = {
    val terms = model.weights.zipWithIndex.map { case (w, i) =>
      (element_at(features, i + 1).cast("double") * lit(w))
        .cast("decimal(28,12)")
    }
    terms.reduce(_ + _).cast("double")
  }
}
