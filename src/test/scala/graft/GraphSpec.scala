package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Graph}

/** Graph operators vs driver-side reference replays on planted graphs.
  * The planted shapes pin the algorithms themselves (orientation,
  * wedge enumeration, damping arithmetic); the partition-invariance
  * tests pin the decimal-routed determinism the oracle gate relies on.
  */
class GraphSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def pairsDf(edges: Seq[(Long, Long)]): DataFrame =
    edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("doc_a", "doc_b")

  private def verticesDf(n: Int): DataFrame =
    (0L until n.toLong).toDF("doc_id")

  private def triCounts(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCounts(verticesDf(n), pairsDf(edges))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Driver-side brute force: every id triple, adjacency-set test. */
  private def bruteTriangles(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val tris = for {
      a <- 0L until n.toLong
      b <- (a + 1) until n.toLong if adj((a, b))
      c <- (b + 1) until n.toLong if adj((b, c)) && adj((a, c))
    } yield (a, b, c)
    val base = (0L until n.toLong).map(_ -> 0L).toMap
    tris.foldLeft(base) { case (m, (a, b, c)) =>
      m + (a -> (m(a) + 1)) + (b -> (m(b) + 1)) + (c -> (m(c) + 1))
    }
  }

  test("triangles: K4 — every vertex is in 3 of the 4 triangles") {
    val k4 = for { a <- 0L to 3L; b <- (a + 1) to 3L } yield (a, b)
    val got = triCounts(4, k4)
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("triangles: a path has none; an appended isolated vertex counts 0") {
    val got = triCounts(4, Seq((0L, 1L), (1L, 2L)))
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("triangles: hub-heavy random graph equals brute force") {
    val rnd = new scala.util.Random(7)
    val n = 30
    // hub vertex 0 attaches to everything; random tail among the rest
    val hub = (1L until n.toLong).map(v => (0L, v))
    val tail = (for (_ <- 1 to 120) yield {
      val a = 1 + rnd.nextInt(n - 1); val b = 1 + rnd.nextInt(n - 1)
      (a.toLong, b.toLong)
    }).filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val edges = hub ++ tail
    assert(triCounts(n, edges) == bruteTriangles(n, edges))
    Dedup.unpersistAll()
  }

  test("triangles: partition-invariant") {
    val rnd = new scala.util.Random(11)
    val edges = (for (_ <- 1 to 60) yield {
      val a = rnd.nextInt(15); val b = rnd.nextInt(15)
      (a.toLong, b.toLong)
    }).filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val one = Graph.triangleCounts(
        verticesDf(15).repartition(1), pairsDf(edges).repartition(1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val many = Graph.triangleCounts(
        verticesDf(15).repartition(13), pairsDf(edges).repartition(13))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(one == many)
    Dedup.unpersistAll()
  }

  /** Driver replay of the exact operator arithmetic: decimal-routed
    * contribution sums (BigDecimal, 18-scale half-up like Spark's
    * decimal cast), double divisions in the same spots.
    */
  private def refPageRank(n: Int, edges: Seq[(Long, Long)], iters: Int,
      damping: Double): Map[Long, Double] = {
    val out = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = out.groupBy(_._1).map { case (v, es) => v -> es.size }
    var r = (0L until n.toLong).map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val contrib = out.groupBy(_._2).map { case (dst, es) =>
        val s = es.map { case (src, _) =>
          BigDecimal(r(src) / deg(src))
            .setScale(18, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        dst -> s.toDouble
      }
      r = (0L until n.toLong).map { v =>
        v -> ((1.0 - damping) / n + damping * contrib.getOrElse(v, 0.0))
      }.toMap
    }
    r
  }

  private def runPageRank(n: Int, edges: Seq[(Long, Long)], iters: Int,
      damping: Double = 0.85): Map[Long, Double] =
    Graph.pageRank(verticesDf(n), pairsDf(edges), iters, damping)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("pagerank: 4-cycle stays uniform at 1/n every iteration") {
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L))
    val got = runPageRank(4, cycle, iters = 3)
    got.values.foreach(v => assert(math.abs(v - 0.25) < 1e-15))
  }

  test("pagerank: star + isolated vertex matches the driver replay bit-for-bit") {
    // hub 0 with leaves 1..4; vertex 5 isolated (teleport mass only)
    val star = (1L to 4L).map(v => (0L, v))
    val got = runPageRank(6, star, iters = 3)
    val want = refPageRank(6, star, iters = 3, damping = 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (v, x) => assert(x == want(v), s"vertex $v") }
    assert(got(0L) > got(1L) && got(1L) > got(5L))
  }

  test("pagerank: partition-invariant (decimal-routed sums)") {
    val rnd = new scala.util.Random(3)
    val edges = (for (_ <- 1 to 50) yield {
      val a = rnd.nextInt(12); val b = rnd.nextInt(12)
      (a.toLong, b.toLong)
    }).filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val one = Graph.pageRank(
        verticesDf(12).repartition(1), pairsDf(edges).repartition(1), 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val many = Graph.pageRank(
        verticesDf(12).repartition(11), pairsDf(edges).repartition(11), 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(one == many)
  }

  test("weighted pagerank: uniform weights reduce bit-for-bit to unweighted") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 2L), (3L, 4L))
    val verts = verticesDf(5)
    val wp = pairsDf(edges).withColumn("score", lit(1.0))
    val got = Graph.weightedPageRank(verts, wp, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Graph.pageRank(verts, pairsDf(edges), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want, "w = 1 must reproduce the binary walk exactly")
  }

  test("weighted pagerank: the heavy edge pulls rank; partition-invariant") {
    // star: center 0, spokes 1..4; spoke 1's edge carries 10x weight —
    // the center's mass flows to it proportionally
    val wp = Seq((0L, 1L, 10.0), (0L, 2L, 1.0), (0L, 3L, 1.0), (0L, 4L, 1.0))
      .toDF("doc_a", "doc_b", "score")
    val verts = verticesDf(5)
    val got = Graph.weightedPageRank(verts, wp, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(2L) && got(2L) == got(3L) && got(3L) == got(4L),
      got.toString)
    // and the heavy spoke's pull is visible, not epsilon
    assert(got(1L) > 2 * got(2L), got.toString)
    val again = Graph.weightedPageRank(verts.repartition(7),
        wp.repartition(3), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == again, "decimal-routed rounds must be partition-invariant")
  }

  test("weighted pagerank: null/zero/negative/NaN weights fail loudly") {
    val verts = verticesDf(3)
    def run(w: java.lang.Double): Unit = {
      val wp = Seq((0L, 1L, w), (1L, 2L, java.lang.Double.valueOf(1.0)))
        .toDF("doc_a", "doc_b", "score")
      Graph.weightedPageRank(verts, wp, iters = 1).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    for (bad <- Seq(null: java.lang.Double, java.lang.Double.valueOf(0.0),
        java.lang.Double.valueOf(-2.0),
        java.lang.Double.valueOf(Double.NaN))) {
      val e = intercept[Exception] { run(bad) }
      assert(chain(e).exists(_.contains("weightedPageRank")),
        s"weight $bad must raise the weight-validity error, got: $e")
    }
  }

  test("harmonic exact: path + clique + isolated vertex, hand-computed ppm") {
    // path 0-1-2-3-4, clique {10,11,12}, isolated 20
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L))
    val verts = (Seq(0L, 1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L)).toDF("doc_id")
    val got = Graph.harmonicCentralityExact(verts, pairsDf(edges),
        maxDist = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // path end 0: d = 1,2,3,4 → 1000000 + 500000 + 333333 + 250000
    assert(got(0L) == ((4L, 2083333L)))
    // path middle 2: d = 1 to {1,3}, d = 2 to {0,4}
    assert(got(2L) == ((4L, 3000000L)))
    // node 1: d=1 to {0,2}, d=2 to {3}, d=3 to {4}
    assert(got(1L) == ((4L, 2833333L)))
    // clique members: two neighbors at d = 1
    Seq(10L, 11L, 12L).foreach(v => assert(got(v) == ((2L, 2000000L))))
    // isolated: nothing reached
    assert(got(20L) == ((0L, 0L)))
    Dedup.unpersistAll()
  }

  test("harmonic exact: distance cap excludes the far tail") {
    // path 0-1-2-3-4-5: at maxDist 2, node 0 sees only {1, 2}
    val edges = (0L until 5L).map(i => (i, i + 1))
    val got = Graph.harmonicCentralityExact(
        (0L to 5L).toDF("doc_id"), pairsDf(edges), maxDist = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got(0L) == ((2L, 1500000L)))
    assert(got(2L) == ((4L, 3000000L)))
    Dedup.unpersistAll()
  }

  test("hyperball: estimates track the exact ball and harmonic score") {
    // two 24-cliques bridged by one edge — big enough for the m = 1024
    // register estimate (~3% σ) to land inside a 15% band per node
    val cliqueA = for (i <- 0L until 24L; j <- (i + 1) until 24L) yield (i, j)
    val cliqueB = for (i <- 100L until 124L; j <- (i + 1) until 124L)
      yield (i, j)
    val edges = cliqueA ++ cliqueB ++ Seq((0L, 100L))
    val verts = ((0L until 24L) ++ (100L until 124L)).toDF("doc_id")
    val exact = Graph.harmonicCentralityExact(verts, pairsDf(edges),
        maxDist = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val est = Graph.harmonicCentralityHll(verts, pairsDf(edges),
        maxDist = 3, m = 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    exact.foreach { case (v, ppm) =>
      val want = ppm / 1e6
      val got = est(v)
      assert(math.abs(got - want) <= 0.15 * want,
        s"node $v: est $got vs exact $want")
    }
    Dedup.unpersistAll()
  }

  test("hyperball digests: partition-invariant, monotone, round-0 seeds") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val verts = (0L to 4L).toDF("doc_id")
    val a = Graph.hyperBallDigests(verts, pairsDf(edges), maxDist = 3,
        m = 64).orderBy("doc_id", "t")
      .collect().map(_.toSeq).toSeq
    Dedup.unpersistAll()
    val b = Graph.hyperBallDigests(verts.repartition(7),
        pairsDf(edges).repartition(5), maxDist = 3, m = 64)
      .orderBy("doc_id", "t")
      .collect().map(_.toSeq).toSeq
    assert(a == b, "register digests must be partition-invariant")
    // round 0 is the single-element seed: exactly one nonzero register
    a.filter(_(1) == 0).foreach(r => assert(r(3) == 1L, r.toString))
    // merging only raises registers: reg_sum monotone in t per vertex
    a.groupBy(_.head).foreach { case (_, rows) =>
      val sums = rows.sortBy(_(1).asInstanceOf[Int]).map(_(2).asInstanceOf[Long])
      assert(sums == sums.sorted, s"reg_sum must be monotone: $sums")
    }
    Dedup.unpersistAll()
  }

  test("pagerank: rejects bad iteration and damping arguments") {
    val v = verticesDf(2); val p = pairsDf(Seq((0L, 1L)))
    intercept[IllegalArgumentException](Graph.pageRank(v, p, 0))
    intercept[IllegalArgumentException](Graph.pageRank(v, p, 1, damping = 1.0))
    intercept[IllegalArgumentException](
      Graph.pageRankConverged(v, p, tol = -1.0))
    intercept[IllegalArgumentException](
      Graph.pageRankConverged(v, p, tol = 0.1, maxIters = 0))
  }

  test("pagerank: dangling redistribution conserves total rank at exactly 1") {
    // directed path 0→1→2 (2 is a sink) plus isolated vertex 3 — both
    // hold dangling mass every round
    val p = Seq((0L, 1L), (1L, 2L)).toDF("doc_a", "doc_b")
    def total(dangling: Boolean): Double =
      Graph.pageRank(verticesDf(4), p, iters = 5,
          symmetrize = false, dangling = dangling)
        .agg(sum(col("r"))).head().getDouble(0)
    assert(math.abs(total(dangling = true) - 1.0) < 1e-9,
      "with redistribution the rank vector must stay a distribution")
    assert(total(dangling = false) < 1.0 - 1e-6,
      "without redistribution sink+isolated mass must leak (the documented simplified form)")
  }

  test("pagerank fixpoint: fixed-round loop equals the unrolled form bit-for-bit") {
    val rnd = new scala.util.Random(5)
    val edges = (for (_ <- 1 to 40) yield {
      val a = rnd.nextInt(10); val b = rnd.nextInt(10)
      (a.toLong, b.toLong)
    }).filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    try {
      val loop = Graph.pageRankConverged(verticesDf(10), pairsDf(edges),
          tol = 0.0, maxIters = 3, symmetrize = false, dangling = true)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      val unrolled = Graph.pageRank(verticesDf(10), pairsDf(edges),
          iters = 3, symmetrize = false, dangling = true)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      assert(loop == unrolled,
        "checkpointed loop rounds must replay the unrolled arithmetic exactly")
    } finally Dedup.unpersistAll()
  }

  test("pagerank fixpoint: 30 forced rounds run with per-round release") {
    // tol = 0 forces every round; each superseded round's checkpoint is
    // released as soon as its delta is read — a mis-ordered release
    // would surface as a missing-checkpoint-block failure here, and a
    // missing release would pin 30 rank frames
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (1L, 3L))
      .toDF("doc_a", "doc_b")
    try {
      val (ranks, rounds, _) = Graph.pageRankConvergedWithStats(
        verticesDf(5), pairs, tol = 0.0, maxIters = 30, dangling = true)
      assert(rounds == 30)
      val total = ranks.agg(sum(col("r"))).head().getDouble(0)
      assert(math.abs(total - 1.0) < 1e-9)
    } finally Dedup.unpersistAll()
  }

  test("pagerank fixpoint: converges under tol before maxIters, mass conserved") {
    val rnd = new scala.util.Random(9)
    val edges = (for (_ <- 1 to 60) yield {
      val a = rnd.nextInt(14); val b = rnd.nextInt(14)
      (a.toLong, b.toLong)
    }).filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    try {
      val (ranks, rounds, lastDelta) = Graph.pageRankConvergedWithStats(
        verticesDf(14), pairsDf(edges), tol = 1e-7, maxIters = 100,
        symmetrize = true, dangling = true)
      assert(rounds < 100, s"must converge before maxIters, ran $rounds")
      assert(rounds > 1, "a nontrivial graph needs more than one round")
      assert(lastDelta <= 1e-7, s"loop must stop at the tol, delta=$lastDelta")
      val total = ranks.agg(sum(col("r"))).head().getDouble(0)
      assert(math.abs(total - 1.0) < 1e-9, s"mass must be conserved, got $total")
    } finally Dedup.unpersistAll()
  }

  private def runLabelProp(n: Int, edges: Seq[(Long, Long)],
      seeds: Seq[(Long, String)], iters: Int): Map[Long, Option[String]] =
    Graph.labelPropagate(verticesDf(n), pairsDf(edges),
        seeds.toDF("doc_id", "label"), iters)
      .collect().map(r =>
        r.getLong(0) -> Option(r.getString(1))).toMap

  test("label prop: two seeded chains converge to their cluster labels") {
    // 0(A)-1-2   3-4-5(B): two chains, seeds at the far ends
    val edges = Seq((0L, 1L), (1L, 2L), (3L, 4L), (4L, 5L))
    val seeds = Seq((0L, "A"), (5L, "B"))
    val got = runLabelProp(6, edges, seeds, iters = 2)
    assert(got == Map(
      0L -> Some("A"), 1L -> Some("A"), 2L -> Some("A"),
      3L -> Some("B"), 4L -> Some("B"), 5L -> Some("B")))
  }

  test("label prop: one round only reaches direct neighbors") {
    val edges = Seq((0L, 1L), (1L, 2L))
    val got = runLabelProp(3, edges, Seq((0L, "A")), iters = 1)
    assert(got == Map(0L -> Some("A"), 1L -> Some("A"), 2L -> None))
  }

  test("label prop: seeds are clamped; plurality wins, ties break to the smaller label") {
    // vertex 3 sees two B-neighbors and one A-neighbor → B;
    // vertex 4 sees one A and one B → tie → A; seed 0 keeps A even
    // though every neighbor says B
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (5L, 3L),
      (0L, 4L), (1L, 4L))
    val seeds = Seq((0L, "A"), (1L, "B"), (2L, "B"), (5L, "A"))
    val got = runLabelProp(6, edges, seeds, iters = 1)
    assert(got(3L).contains("B"))
    assert(got(4L).contains("A"))
    assert(got(0L).contains("A"))
  }

  test("label prop: partition-invariant") {
    val rnd = new scala.util.Random(5)
    val edges = (for (_ <- 1 to 40) yield {
      val a = rnd.nextInt(12); val b = rnd.nextInt(12)
      (a.toLong, b.toLong)
    }).filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val seeds = Seq((0L, "X"), (7L, "Y"))
    val one = Graph.labelPropagate(verticesDf(12).repartition(1),
        pairsDf(edges).repartition(1), seeds.toDF("doc_id", "label"), 2)
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
      .sortBy(_._1).toSeq
    val many = Graph.labelPropagate(verticesDf(12).repartition(7),
        pairsDf(edges).repartition(7), seeds.toDF("doc_id", "label"), 2)
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
      .sortBy(_._1).toSeq
    assert(one == many)
  }

  test("personalized pagerank: mass stays in the seed's component") {
    // two disconnected 3-cliques; seed in the first — the second
    // component's rank must be exactly 0 every round
    val c1 = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    val c2 = Seq((3L, 4L), (4L, 5L), (3L, 5L))
    val seeds = Seq(0L).toDF("doc_id")
    val got = Graph.personalizedPageRank(verticesDf(6), pairsDf(c1 ++ c2),
        seeds, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((3L to 5L).forall(v => got(v) == 0.0),
      s"unreachable component must hold zero mass: $got")
    assert(got(0L) > got(1L) && got(1L) == got(2L),
      s"seed outranks its symmetric neighbors: $got")
    val total = got.values.sum
    assert(math.abs(total - 1.0) < 1e-9,
      s"no dangling nodes => mass conserved: $total")
  }

  test("personalized pagerank: uniform seeds over ALL vertices equals global pagerank") {
    val rnd = new scala.util.Random(11)
    val edges = (for (_ <- 1 to 40) yield {
      val a = rnd.nextInt(10); val b = rnd.nextInt(10)
      (a.toLong, b.toLong)
    }).filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    // every vertex has an edge with high probability under this seed;
    // make it certain by adding a ring
    val ring = (0L until 10L).map(i => (i, (i + 1) % 10))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val all = (edges ++ ring).distinct
    val seeds = (0L until 10L).toDF("doc_id")
    val ppr = Graph.personalizedPageRank(verticesDf(10), pairsDf(all),
        seeds, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pr = Graph.pageRank(verticesDf(10), pairsDf(all), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (0L until 10L).foreach { v =>
      assert(math.abs(ppr(v) - pr(v)) < 1e-12,
        s"uniform teleport must reduce to global pagerank at $v: ${ppr(v)} vs ${pr(v)}")
    }
  }

  test("personalized pagerank: rejects bad arguments") {
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(verticesDf(2), pairsDf(Seq((0L, 1L))),
        Seq(0L).toDF("doc_id"), iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(verticesDf(2), pairsDf(Seq((0L, 1L))),
        Seq(0L).toDF("doc_id"), iters = 1, damping = 1.5)
    }
  }

  private def runKCore(n: Int, edges: Seq[(Long, Long)], k: Int,
      rounds: Int): Map[Long, (Boolean, Long)] =
    Graph.kCore(verticesDf(n), pairsDf(edges), k, rounds)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2)))
      .toMap

  test("kcore: K4 with a pendant chain — the clique survives k=2, the chain peels") {
    // 0-1-2-3 clique, chain 3-4-5 hanging off it
    val k4 = for { a <- 0L to 3L; b <- (a + 1) to 3L } yield (a, b)
    val got = runKCore(6, k4 ++ Seq((3L, 4L), (4L, 5L)), k = 2, rounds = 3)
    // chain tip 5 (deg 1) peels round 1; 4 drops to deg 1 and peels
    // round 2; the K4 keeps degree 3 throughout
    assert((0L to 3L).forall(v => got(v) == (true, 3L)))
    assert(got(4L) == (false, 0L) && got(5L) == (false, 0L))
  }

  test("kcore: one round only peels the current degree-deficient frontier") {
    // path 0-1-2-3-4: k=2 peels endpoints round 1, then 1 and 3, then 2
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val r1 = runKCore(5, path, k = 2, rounds = 1)
    assert(r1(0L)._1 == false && r1(4L)._1 == false)
    assert(r1(1L)._1 && r1(2L)._1 && r1(3L)._1)
    // after round 1 the surviving path 1-2-3 has endpoint degrees 1
    val r2 = runKCore(5, path, k = 2, rounds = 2)
    assert(r2(1L)._1 == false && r2(3L)._1 == false && r2(2L)._1)
    val r3 = runKCore(5, path, k = 2, rounds = 3)
    assert(r3.values.forall(!_._1))
  }

  test("kcore: isolated vertices report not-in-core with degree 0") {
    val got = runKCore(4, Seq((0L, 1L)), k = 1, rounds = 2)
    assert(got(2L) == (false, 0L) && got(3L) == (false, 0L))
    assert(got(0L) == (true, 1L) && got(1L) == (true, 1L))
  }

  test("kcore: partition-invariant") {
    val rnd = new scala.util.Random(9)
    val edges = (for (_ <- 1 to 60) yield {
      val a = rnd.nextInt(14); val b = rnd.nextInt(14)
      (a.toLong, b.toLong)
    }).filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val one = Graph.kCore(verticesDf(14).repartition(1),
        pairsDf(edges).repartition(1), 3, 3)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val many = Graph.kCore(verticesDf(14).repartition(7),
        pairsDf(edges).repartition(7), 3, 3)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(one == many)
  }

  test("kcore: rejects bad arguments") {
    intercept[IllegalArgumentException] {
      Graph.kCore(verticesDf(2), pairsDf(Seq((0L, 1L))), 0, 3)
    }
    intercept[IllegalArgumentException] {
      Graph.kCore(verticesDf(2), pairsDf(Seq((0L, 1L))), 2, 0)
    }
  }

  private def runKTruss(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): Map[(Long, Long), Long] =
    Graph.kTruss(pairsDf(edges), k, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap

  test("ktruss: K4 with a pendant triangle — the clique is the 4-truss") {
    // 0-1-2-3 clique plus triangle 3-4-5: every K4 edge closes 2
    // triangles, the pendant triangle's edges close only 1
    val k4 = for { a <- 0L to 3L; b <- (a + 1) to 3L } yield (a, b)
    val tri = Seq((3L, 4L), (3L, 5L), (4L, 5L))
    val got = runKTruss(k4 ++ tri, k = 4, rounds = 2)
    assert(got.keySet == k4.toSet, s"only the K4 edges survive: $got")
    assert(got.values.forall(_ == 2L), "each K4 edge sits in 2 triangles")
    // at k=3 everything with one triangle survives
    val loose = runKTruss(k4 ++ tri, k = 3, rounds = 2)
    assert(loose.keySet == (k4 ++ tri).toSet)
  }

  test("ktruss: one round only peels the current support-deficient edges") {
    // two triangles sharing edge (1,2), plus a tail edge: the shared
    // edge has support 2, the wing edges 1, the tail 0
    val g = Seq((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val r1 = runKTruss(g, k = 4, rounds = 1)
    // round 1 peels wings (support 1) and the tail; (1,2) had support 2
    assert(r1.keySet == Set((1L, 2L)))
    // round 2 recomputes: (1,2) alone closes no triangle — gone
    val r2 = runKTruss(g, k = 4, rounds = 2)
    assert(r2.isEmpty)
  }

  test("ktruss: partition-invariant") {
    val rnd = new scala.util.Random(11)
    val edges = (for (_ <- 1 to 80) yield {
      val a = rnd.nextInt(12); val b = rnd.nextInt(12)
      (a.toLong, b.toLong)
    }).filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val one = Graph.kTruss(pairsDf(edges).repartition(1), 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val many = Graph.kTruss(pairsDf(edges).repartition(7), 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(one == many)
  }

  test("ktruss: rejects bad arguments") {
    intercept[IllegalArgumentException] {
      Graph.kTruss(pairsDf(Seq((0L, 1L))), 2, 2)
    }
    intercept[IllegalArgumentException] {
      Graph.kTruss(pairsDf(Seq((0L, 1L))), 3, 0)
    }
  }

  // ---- HITS ---------------------------------------------------------------

  /** Driver-side replay of the unnormalized alternation: with h₀ = 1,
    * iterate a(v) = Σ_{u→v} h(u) then h(u) = Σ_{u→v} a(v).
    */
  private def bruteHits(n: Int, edges: Seq[(Long, Long)],
      iters: Int): Map[Long, (Long, Long)] = {
    var hub = (0L until n.toLong).map(_ -> 1L).toMap
    var auth = Map.empty[Long, Long].withDefaultValue(0L)
    (1 to iters).foreach { _ =>
      auth = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => hub.getOrElse(e._1, 0L)).sum
      }.withDefaultValue(0L)
      hub = edges.groupBy(_._1).map { case (u, es) =>
        u -> es.map(e => auth(e._2)).sum
      }.withDefaultValue(0L)
    }
    (0L until n.toLong)
      .map(v => v -> (auth(v), hub.getOrElse(v, 0L))).toMap
  }

  private def hitsMap(n: Int, edges: Seq[(Long, Long)],
      iters: Int): Map[Long, (Long, Long)] =
    Graph.hits(verticesDf(n), pairsDf(edges), iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("hits: out-star — the center is the only hub, leaves the authorities") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val got = hitsMap(4, star, iters = 2)
    // a1 = indegree (1 per leaf); h1(0) = 3; a2(leaf) = 3; h2(0) = 9
    assert(got == Map(0L -> (0L, 9L), 1L -> (3L, 0L),
      2L -> (3L, 0L), 3L -> (3L, 0L)))
  }

  test("hits: random graph equals the driver replay; isolated vertex is 0/0") {
    val rnd = new scala.util.Random(5)
    val edges = (0 until 300).map { _ =>
      val a = rnd.nextInt(30).toLong
      val b = rnd.nextInt(30).toLong
      (math.min(a, b), math.max(a, b) + 1) // keep a < b, vertex 31+ unused
    }.distinct
    val got = hitsMap(33, edges, iters = 2)
    assert(got == bruteHits(33, edges, iters = 2))
    assert(got(32L) == (0L, 0L), "vertex with no edges scores 0/0")
  }

  test("hits: partition-invariant (exact integer sums)") {
    val rnd = new scala.util.Random(9)
    val edges = (0 until 200).map { _ =>
      val a = rnd.nextInt(25).toLong
      (a, a + 1 + rnd.nextInt(5).toLong)
    }.distinct
    val one = hitsMap(31, edges, iters = 3)
    val many = Graph.hits(verticesDf(31), pairsDf(edges).repartition(11),
        iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(one == many)
  }

  test("hits: rejects out-of-range iteration counts") {
    intercept[IllegalArgumentException] {
      Graph.hits(verticesDf(2), pairsDf(Seq((0L, 1L))), iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.hits(verticesDf(2), pairsDf(Seq((0L, 1L))), iters = 5)
    }
  }

  test("hits: rejects a graph whose in/out-degree product wraps int64 scores") {
    // complete bipartite 234 sources × 236 sinks: imax·omax = 55224 >
    // 55108 = maxSafeHitsProduct(4), and actual scores reach
    // (234·236)^4 ≈ 9.3e18 > 2^63-1 — the silent-wrap regime the LAZY
    // guard must reject. Plan construction is side-effect-free; the
    // failure fires at EXECUTION.
    val doomed = Graph.hits(verticesDf(470),
      pairsDf(for (u <- 0L until 234L; v <- 234L until 470L) yield (u, v)),
      iters = 4)
    val ex = intercept[Exception] { doomed.collect() }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("overflows int64")),
      s"expected the lazy overflow guard to fire, got: ${chain(ex)}")
  }

  test("hits: the guard survives an auth-only projection (column pruning)") {
    // a caller projecting just (doc_id, auth) lets Catalyst prune the
    // hub column; the guard must ride BOTH outputs or pruning drops the
    // raise_error branch and auth (bounded by imax·(imax·omax)^(iters-1),
    // which also wraps past the boundary) silently corrupts
    val doomed = Graph.hits(verticesDf(470),
      pairsDf(for (u <- 0L until 234L; v <- 234L until 470L) yield (u, v)),
      iters = 4)
      .select(col("doc_id"), col("auth"))
    val ex = intercept[Exception] { doomed.collect() }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("overflows int64")),
      s"expected the guard to fire on the auth-only projection, got: ${chain(ex)}")
  }

  test("hits: admits graphs exactly up to the tight product boundary") {
    // 234 × 235 bipartite sits ON the safe side (54990 ≤ 55108) with
    // h₄(source) = (234·235)^4 ≈ 9.14e18 — within 1% of Long.MaxValue,
    // so the admission is as tight as int64 allows
    val ok = Graph.hits(verticesDf(469),
      pairsDf(for (u <- 0L until 234L; v <- 234L until 469L) yield (u, v)),
      iters = 4)
    assert(ok.filter(col("doc_id") === 0L).head().getLong(2)
        == 3023900100L * 3023900100L,
      "h4(source) = (KL)^4 on complete bipartite K×L")
    // the old max-TOTAL-degree bound falsely rejected hub-heavy graphs:
    // a 235-leaf out-star is linear in degree (h4(center) = 235^4) and
    // must be admitted at 4 rounds under the directional product bound
    val star = (1L to 235L).map(i => (0L, i))
    val hub = Graph.hits(verticesDf(236), pairsDf(star), iters = 4)
    assert(hub.filter(col("doc_id") === 0L).head().getLong(2) == 3049800625L,
      "h4(center) = d^4 on an out-star")
  }

  test("hits: the safe product boundary is BigInt-exact per round count") {
    assert(Graph.maxSafeHitsProduct(4) == 55108L)
    assert(Graph.maxSafeHitsProduct(3) == 2097151L)
    assert(Graph.maxSafeHitsProduct(2) == 3037000499L)
    assert(Graph.maxSafeHitsProduct(1) == Long.MaxValue)
    for (it <- 1 to 4) {
      val p = Graph.maxSafeHitsProduct(it)
      assert(BigInt(p).pow(it) <= BigInt(Long.MaxValue))
      if (p < Long.MaxValue)
        assert(BigInt(p + 1).pow(it) > BigInt(Long.MaxValue))
    }
  }

  /** Driver-side replay of the singleton local move: for each vertex,
    * the (2m − deg_u·deg_v)-best neighbor with smallest-id tie-break.
    */
  private def louvainBrute(n: Int,
      edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = und.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val m = edges.size.toLong
    (0L until n.toLong).map { v =>
      val nbrs = und.collect { case (a, u) if a == v => u }
      if (nbrs.isEmpty) v -> (v, 0L)
      else {
        val scored = nbrs.map(u => (2 * m - deg(v) * deg(u), u))
        val (bs, bu) = scored.maxBy { case (s, u) => (s, -u) }
        if (bs > 0) v -> (bu, bs) else v -> (v, 0L)
      }
    }.toMap
  }

  private def louvainMap(n: Int,
      edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Graph.louvainMove(verticesDf(n), pairsDf(edges))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("louvain move: two triangles with a bridge — low-degree partners win") {
    // m = 7; inside each triangle the degree-2 vertices pick each other
    // (score 14−4=10) over the degree-3 bridge endpoint (14−6=8)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (3L, 4L), (3L, 5L), (4L, 5L), (2L, 3L))
    val got = louvainMap(6, edges)
    assert(got(0L) == (1L, 10L) && got(1L) == (0L, 10L))
    assert(got(4L) == (5L, 10L) && got(5L) == (4L, 10L))
    assert(got == louvainBrute(6, edges))
  }

  test("louvain move: dense hub pair — the hub-hub merge is negative") {
    // two hubs joined to each other and to every leaf: m = 9, hub
    // degree 5, leaf degree 2. hub↔hub scores 18 − 25 = −7 (the only
    // negative option), hub↔leaf 18 − 10 = 8 — so hubs merge DOWN into
    // leaves, never with each other, and leaves tie-break to hub 0.
    val hubs = Seq((0L, 1L))
    val leaves = (2L to 5L).flatMap(l => Seq((0L, l), (1L, l)))
    val got = louvainMap(6, hubs ++ leaves)
    assert(got == louvainBrute(6, hubs ++ leaves))
    assert(got(2L) == (0L, 8L) && got(0L)._1 >= 2L)
  }

  test("louvain move: isolated vertex stays its own community at gain 0") {
    val got = louvainMap(4, Seq((0L, 1L)))
    assert(got(2L) == (2L, 0L) && got(3L) == (3L, 0L))
    // the only edge joins two degree-1 vertices: score 2·1 − 1 = 1 > 0
    assert(got(0L) == (1L, 1L) && got(1L) == (0L, 1L))
  }

  test("louvain move: random graph equals the driver replay; partition-invariant") {
    val rnd = new scala.util.Random(17)
    val edges = (0 until 160).map { _ =>
      val a = rnd.nextInt(22).toLong
      (a, a + 1 + rnd.nextInt(6).toLong)
    }.distinct
    val want = louvainBrute(28, edges)
    assert(louvainMap(28, edges) == want)
    val many = Graph.louvainMove(verticesDf(28), pairsDf(edges).repartition(13))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(many == want)
  }

  /** Driver replay of the full multi-level mutual-matching Louvain:
    * per level, coarse weights + community degrees from the ORIGINAL
    * edges through the label map, exact BigInt ΔQ numerators, struct-min
    * ties, mutual-positive merges only. Returns (final labels, per-level
    * (lvl, n_comms, l_in, q_ppm) rows).
    */
  private def bruteLouvainLevels(n: Int, edges: Seq[(Long, Long)],
      levels: Int, moves: Int = 1): (Map[Long, Long], Seq[(Long, Long, Long, Long)]) = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = und.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      .withDefaultValue(0L)
    val m = edges.size.toLong
    var lab: Map[Long, Long] = (0L until n.toLong).map(v => v -> v).toMap
    def summary(lvl: Long): (Long, Long, Long, Long) = {
      val dsum = lab.toSeq.groupBy(_._2).view
        .mapValues(_.map(x => deg(x._1)).sum).toMap
      val lin = edges.filter(e => lab(e._1) == lab(e._2))
        .groupBy(e => lab(e._1)).view.mapValues(_.size.toLong).toMap
        .withDefaultValue(0L)
      val q = dsum.toSeq.map { case (c, d) =>
        (1000000L * lin(c)) / m - (1000000L * d * d) / (4 * m * m)
      }.sum
      (lvl, dsum.size.toLong, lin.values.sum, q)
    }
    val out = scala.collection.mutable.ArrayBuffer(summary(0L))
    (1 to levels).foreach { l =>
      var move = 0
      var converged = false
      while (move < moves && !converged) {
        val dsum = lab.toSeq.groupBy(_._2).view
          .mapValues(_.map(x => deg(x._1)).sum).toMap
        val ce = edges.map(e => (lab(e._1), lab(e._2)))
          .filter(p => p._1 != p._2)
          .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val dir = ce.toSeq.flatMap { case ((x, y), w) =>
          Seq((x, y, w), (y, x, w)) }
        val best = dir.map { case (a, b, w) =>
          (a, b, BigInt(2) * m * w - BigInt(dsum(a)) * dsum(b)) }
          .groupBy(_._1).view
          .mapValues(ss => ss.map(s => (s._3, s._2)).minBy(t => (-t._1, t._2)))
          .toMap
        val mut = best.collect {
          case (a, (s, b)) if s > 0 && best.get(b).exists(_._2 == a) =>
            a -> math.min(a, b)
        }
        if (mut.isEmpty) converged = true
        else lab = lab.view.mapValues(c => mut.getOrElse(c, c)).toMap
        move += 1
      }
      out += summary(l.toLong)
    }
    (lab, out.toSeq)
  }

  test("louvain levels: planted two cliques merge to two communities") {
    // K4 + K4 with one bridge (3,4): mutual-best matching doubles the
    // communities per level, fully recovering each clique by level 3
    val k4a = for (i <- 0L to 3L; j <- i + 1 to 3L) yield (i, j)
    val k4b = for (i <- 4L to 7L; j <- i + 1 to 7L) yield (i, j)
    val edges = (k4a ++ k4b :+ (3L, 4L)).toSeq
    val lab = Graph.louvainCommunities(verticesDf(8), pairsDf(edges), levels = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 3L).map(lab).toSet.size == 1, s"clique 1 split: $lab")
    assert((4L to 7L).map(lab).toSet.size == 1, s"clique 2 split: $lab")
    assert(lab(0L) != lab(4L), s"cliques merged across the bridge: $lab")
    val (wantLab, wantSum) = bruteLouvainLevels(8, edges, levels = 3)
    assert(lab == wantLab)
    val sums = Graph.louvainLevels(verticesDf(8), pairsDf(edges), levels = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(sums.toSeq == wantSum)
    // disjoint positive merges sum their ΔQ: Q never decreases per level
    assert(sums.map(_._4).sliding(2).forall(w => w(1) >= w(0)))
  }

  test("louvain multi-move: round 2 closes a round-1 mutual-match blind spot") {
    // two triangles {1,2,3} {4,5,6} bridged by 3-4: round 1 pairs
    // (1,2) and (5,6) mutually (score 10 beats 8), leaving 3 pointing
    // at {1,2} and 4 at {5,6} — NOT mutual that round. Round 2's coarse
    // graph makes ({1,2},{3}) and ({4},{5,6}) mutual (2·7·2 − 4·3 = 16
    // > 0), recovering both triangles — the exact blind spot Blondel's
    // move-to-convergence closes and one match per level leaves open.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val verts = verticesDf(7).filter(col("doc_id") >= 1)
    def labs(moves: Int): Map[Long, Long] =
      Graph.louvainCommunities(verts, pairsDf(edges), levels = 1,
        movesPerLevel = moves)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val one = labs(1)
    assert(one(1L) == one(2L) && one(3L) != one(1L),
      s"single move must leave vertex 3 unmatched: $one")
    val two = labs(2)
    assert(Set(1L, 2L, 3L).map(two).size == 1, s"triangle A split: $two")
    assert(Set(4L, 5L, 6L).map(two).size == 1, s"triangle B split: $two")
    assert(two(1L) != two(4L), s"bridged triangles must not merge: $two")
    // the level is converged after move 2 (the bridge merge has ΔQ =
    // 2·7·1 − 7·7 < 0): a third move is a no-op — the early stop and
    // the fixed unroll agree
    assert(labs(3) == two, "converged level must be move-idempotent")
    // and the driver replay agrees with the cluster path at every moves
    for (mv <- 1 to 3)
      assert(labs(mv) == bruteLouvainLevels(7, edges, levels = 1, moves = mv)
        ._1.filter(_._1 >= 1L), s"driver replay diverged at moves=$mv")
  }

  test("louvain levels: planted hierarchy — per-level modularity never decreases") {
    // the matching-per-level semantics, pinned formally: 4 planted
    // triangles, pairs of triangles tied into two super-clusters by a
    // 4-edge parallel bundle each (heavy enough that the merge has
    // ΔQ > 0), one weak edge across the super-clusters. The matching
    // recovers the hierarchy in 3 levels (12 → 6 → 4 → 2 communities)
    // and level 4 is a no-op (the across-tie merge has ΔQ < 0);
    // because every accepted merge is a DISJOINT pair with exact
    // ΔQ > 0, the reported q_ppm is non-decreasing at EVERY level —
    // the formal guarantee the single-match-per-level design trades
    // Blondel's inner move-to-convergence loop for.
    def tri(a: Long, b: Long, c: Long) = Seq((a, b), (a, c), (b, c))
    val edges = tri(0L, 1L, 2L) ++ tri(3L, 4L, 5L) ++
      tri(6L, 7L, 8L) ++ tri(9L, 10L, 11L) ++
      Seq.fill(4)((2L, 5L)) ++ Seq.fill(4)((8L, 11L)) :+ (2L -> 8L)
    val (wantLab, wantSum) = bruteLouvainLevels(12, edges, levels = 4)
    val lab = Graph.louvainCommunities(verticesDf(12), pairsDf(edges), levels = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab == wantLab)
    assert((0L to 5L).map(lab).toSet.size == 1, s"super-cluster A split: $lab")
    assert((6L to 11L).map(lab).toSet.size == 1, s"super-cluster B split: $lab")
    assert(lab(0L) != lab(6L), s"super-clusters merged across the weak tie: $lab")
    val sums = Graph.louvainLevels(verticesDf(12), pairsDf(edges), levels = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(sums.toSeq == wantSum)
    assert(sums.map(_._2).toSeq == Seq(12L, 6L, 4L, 2L, 2L),
      s"expected 12 -> 6 -> 4 -> 2 -> 2 communities, got ${sums.map(_._2).toSeq}")
    assert(sums.map(_._4).sliding(2).forall(w => w(1) >= w(0)),
      s"q_ppm decreased across a level: ${sums.map(_._4).toSeq}")
  }

  test("louvain levels: random graph equals the driver replay; partition-invariant") {
    val rnd = new scala.util.Random(23)
    val edges = (0 until 140).map { _ =>
      val a = rnd.nextInt(20).toLong
      (a, a + 1 + rnd.nextInt(5).toLong)
    }.distinct
    val (wantLab, wantSum) = bruteLouvainLevels(26, edges, levels = 2)
    val lab = Graph.louvainCommunities(verticesDf(26), pairsDf(edges), levels = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab == wantLab)
    val sums = Graph.louvainLevels(
        verticesDf(26), pairsDf(edges).repartition(9), levels = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(sums.toSeq == wantSum)
  }
}
