package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over an undirected edge list — the two
  * primitives a document-similarity graph needs at corpus scale:
  * PageRank (hub/centrality scoring) and per-vertex triangle counting
  * (local clustering density). Both take the canonical pair form
  * `(doc_a, doc_b)` with `doc_a < doc_b`, one row per undirected edge
  * (the shape `Pipeline.tfidfPairs` and the near-dup pair generators
  * emit).
  *
  * Scale posture:
  *  - PageRank: each iteration is one shuffle on the source id (the
  *    edges ⋈ ranks join) plus a map-combinable per-target sum. The
  *    vertex count (1 row) is broadcast; the degree frame is
  *    vertex-cardinality and therefore joined PLAIN — it co-partitions
  *    with the edges ⋈ ranks exchange on `doc_a` for free, and the
  *    plan survives billion-vertex graphs where a broadcast hint would
  *    OOM the driver. Deep fixpoints should persist /
  *    checkpoint per round (the `Dedup.connectedComponents` lineage
  *    discipline); the shallow unrolled form here leaves lineage alone
  *    so the whole computation stays replayable by the oracle.
  *  - Triangles: compact-forward — orient each edge from its
  *    (degree, id)-smaller endpoint, so every triangle is enumerated
  *    exactly once at its lowest-rank vertex and the wedge join's
  *    fan-out per vertex is O(√m) even on hub-heavy graphs.
  *
  * Reference analogue: the reference engine has no graph operators;
  * this extends the pipeline surface the way sketches and ANN do
  * (see SURVEY.md §8.2).
  */
object Graph {

  /** One damped PageRank round: edges ⋈ ranks (one shuffle on the
    * source id) + decimal-routed per-target sum, optionally plus the
    * dangling-mass term (sum of rank held by out-degree-0 vertices,
    * computed with an anti join against `deg` — a ONE-ROW frame, the
    * only thing broadcast besides `n1`).
    */
  private def pageRankStep(vertices: DataFrame, edges: DataFrame,
      deg: DataFrame, n1: DataFrame, ranks: DataFrame, damping: Double,
      dangling: Boolean): DataFrame = {
    val sums = edges
      .join(ranks, edges("doc_a") === ranks("doc_id"))
      .join(deg, Seq("doc_a"))
      .select(col("doc_b"),
        (col("r") / col("deg")).cast("decimal(28,18)").as("c"))
      .groupBy(col("doc_b"))
      .agg(sum(col("c")).cast("double").as("m"))
    val base =
      if (!dangling) vertices.crossJoin(broadcast(n1))
      else {
        val dm = ranks
          .join(deg, ranks("doc_id") === deg("doc_a"), "left_anti")
          .agg(coalesce(sum(col("r").cast("decimal(28,18)")),
            lit(0).cast("decimal(28,18)")).cast("double").as("dm"))
        vertices.crossJoin(broadcast(n1)).crossJoin(broadcast(dm))
      }
    val mass =
      if (dangling) coalesce(col("m"), lit(0.0)) + col("dm") / col("n")
      else coalesce(col("m"), lit(0.0))
    base.join(sums, base("doc_id") === sums("doc_b"), "left")
      .select(base("doc_id"),
        (lit(1.0 - damping) / col("n") + lit(damping) * mass).as("r"))
  }

  /** The `(doc_a, doc_b)` pair list as the edge frame PageRank walks:
    * symmetrized (each undirected pair becomes two directed edges) or
    * taken as-is (directed, so high-id vertices can be genuine sinks).
    */
  private def edgeFrame(pairs: DataFrame, symmetrize: Boolean): DataFrame = {
    val p = pairs.select(col("doc_a"), col("doc_b"))
    if (symmetrize)
      p.union(p.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    else p
  }

  /** [[edgeFrame]] persisted PRE-PARTITIONED on the round-join key
    * (`doc_a`) — the iterative-walk storage posture (r17): every
    * rank/label iteration joins edges on `doc_a`, and a cache without
    * a known partitioning re-exchanges the EDGE side — the
    * corpus-sized side at 100 TB — once per round. Hash-partitioning
    * BEFORE the persist makes the cached scan report
    * hashpartitioning(doc_a, P), so every round's join plans zero
    * exchange on the edge side and only the vertex-sized rank/label
    * vector shuffles per iteration (the Pregel edge-placement
    * argument, in DataFrame form). The partition count is pinned to
    * the session's shuffle parallelism so AQE cannot re-coalesce the
    * cached layout out from under the per-round joins. Per-source
    * degree aggregates over the same frame combine on the cached
    * partitioning too (zero-exchange groupBy(doc_a)).
    */
  private def partitionedEdges(pairs: DataFrame,
      symmetrize: Boolean): DataFrame = {
    val spark = pairs.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val df = edgeFrame(pairs, symmetrize).repartition(parts, col("doc_a"))
    // the cache must compile NON-adaptively: Spark 4 plans cached
    // relations under AQE regardless of
    // canChangeCachedPlanOutputPartitioning, and an adaptive cached
    // plan reports UnknownPartitioning until materialized — every
    // round's join would then re-insert the edge-side exchange this
    // layout exists to remove. cacheQuery compiles the cached plan
    // EAGERLY at persist, so an AQE-off compile pins the static
    // hashpartitioning(doc_a, parts) the per-round joins plan against;
    // the subtree being de-adaptived is one repartition over a scan —
    // nothing AQE could improve. The OUTER queries stay adaptive.
    //
    // The compile runs under an ISOLATED session (r18): the former
    // session-global AQE toggle silently de-adaptived any query a
    // concurrent thread (a streaming microbatch's foreachBatch) compiled
    // during the persist window, and the restore left an explicit
    // override behind. `newSession` shares the SparkContext AND the
    // CacheManager — a persist compiled there serves this session's
    // consumers by canonical-plan substitution — but owns a private
    // SQLConf, so the toggle is invisible to every other thread. Runtime
    // confs are mirrored first (newSession starts from SparkConf
    // defaults, which would miss e.g. a test's shuffle-partition
    // override); static/immutable entries are skipped. The plan crosses
    // sessions via a global temp view (session temp views don't).
    val fresh = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      try fresh.conf.set(k, v)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    fresh.conf.set("spark.sql.adaptive.enabled", "false")
    val view = "graft_edges_stage_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    df.createOrReplaceGlobalTempView(view)
    val gdb = spark.conf.get("spark.sql.globalTempDatabase", "global_temp")
    // The returned frame is DELIBERATELY the fresh-session one, so
    // every query built on it — the pageRank/Louvain rounds, the degree
    // aggregates — compiles NON-adaptively too (r18-advice option B,
    // adopted after measuring option A): handing back the
    // original-session `df` keeps the caller's adaptive SQLConf, but an
    // outer query compiled under AQE sees the cached relation as
    // UnknownPartitioning until materialized and re-inserts the
    // edge-side exchange in every per-round join — measured 2× on g13
    // (steady 6.7 → 12.1 s) and g9 (2.1 → 4.7 s first). The graph
    // rounds are exactly the plans the static layout exists for;
    // nothing in them benefits from AQE (tiny coarse frames, fixed
    // 32-partition shuffles), so the non-adaptive compile is the
    // intended semantics, not a leak. Queries NOT built from this
    // frame are unaffected — the toggle lives in the private session.
    try Dedup.persistPublic(fresh.table(s"$gdb.$view"))
    finally spark.catalog.dropGlobalTempView(view)
  }

  /** PageRank with `iters` unrolled damped iterations. Returns
    * `(doc_id, r)` for every vertex in `vertices` (isolated vertices
    * converge to the teleport mass `(1-damping)/n` when `dangling` is
    * off).
    *
    * Determinism: neighbor contributions are cast to `decimal(28,18)`
    * before the per-target sum, so accumulation is order-insensitive
    * and the result is bit-identical on any partitioning — replayable
    * exactly by an unrolled SQL oracle.
    *
    * `dangling = true` adds the standard dangling-mass redistribution:
    * each round the rank held by out-degree-0 vertices (a decimal-
    * routed one-row sum) is spread uniformly, so total rank is
    * conserved at exactly 1 even on directed graphs with sinks
    * (`symmetrize = false`). The default (off) is the simplified form
    * the g1 oracle replays: with a symmetric edge list every vertex
    * with an edge has out-degree > 0, and only isolated-vertex teleport
    * mass leaks.
    */
  def pageRank(vertices: DataFrame, pairs: DataFrame, iters: Int,
      damping: Double = 0.85, symmetrize: Boolean = true,
      dangling: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // with the dangling term each unrolled step references the previous
    // rank frame TWICE (the edge join and the dangling anti-join sum),
    // so the un-truncated logical plan DOUBLES per iteration — 2^iters
    // analysis blowup. Shallow unrolls stay replayable by a SQL oracle;
    // anything deeper belongs on the checkpointed loop.
    require(!dangling || iters <= 8,
      s"unrolled dangling PageRank doubles its plan per round — use " +
        s"pageRankConverged for $iters iterations")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    val edges = partitionedEdges(pairs, symmetrize)
    // zero-exchange over the cached layout, persisted because every
    // unrolled round references it
    val deg = Dedup.persistPublic(
      edges.groupBy(col("doc_a")).agg(count(lit(1)).as("deg")))
    val n1 = vertices.agg(count(lit(1)).as("n"))
    var ranks = vertices.crossJoin(broadcast(n1))
      .select(col("doc_id"), (lit(1.0) / col("n")).as("r"))
    (1 to iters).foreach { _ =>
      ranks = pageRankStep(vertices, edges, deg, n1, ranks, damping, dangling)
    }
    ranks
  }

  /** Deep-fixpoint PageRank: iterate until the L1 rank delta falls at
    * or below `tol` (or `maxIters` rounds), truncating lineage every
    * round via the d8 checkpoint discipline (`Dedup.truncatePublic` —
    * eager localCheckpoint, or reliable checkpoints when
    * `spark.graft.checkpointDir` is set), so a real corpus can run 20+
    * rounds without lineage blowup. The edge and degree frames are
    * persisted once and reused by every round; release everything with
    * `Dedup.unpersistAll()` after materializing the result.
    *
    * The convergence check is one extra join + one-row aggregate per
    * round on the already-checkpointed rank frames — O(V) work, no
    * driver-side data beyond the single delta value. Per-round results
    * are bit-exact on any partitioning (decimal-routed sums), so a
    * fixed-round run (`tol = 0, maxIters = k`) replays exactly in an
    * unrolled SQL oracle — the g9 gate.
    */
  def pageRankConverged(vertices: DataFrame, pairs: DataFrame,
      tol: Double, maxIters: Int = 50, damping: Double = 0.85,
      symmetrize: Boolean = true, dangling: Boolean = true): DataFrame =
    pageRankConvergedWithStats(vertices, pairs, tol, maxIters, damping,
      symmetrize, dangling)._1

  /** [[pageRankConverged]] plus `(rounds run, last L1 delta)` — the
    * observability a convergence caller needs (and the spec asserts).
    */
  def pageRankConvergedWithStats(vertices: DataFrame, pairs: DataFrame,
      tol: Double, maxIters: Int = 50, damping: Double = 0.85,
      symmetrize: Boolean = true,
      dangling: Boolean = true): (DataFrame, Int, Double) = {
    require(tol >= 0.0, s"tol must be >= 0, got $tol")
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    val edges = partitionedEdges(pairs, symmetrize)
    val deg = Dedup.persistPublic(
      edges.groupBy(col("doc_a")).agg(count(lit(1)).as("deg")))
    // vertices and the N count feed EVERY round's separate job — persist
    // both so a derived vertex frame (e.g. the TVF's distinct-endpoints
    // union) is not re-scanned and re-shuffled once per round
    val verts = Dedup.persistPublic(vertices.select(col("doc_id")))
    val n1 = Dedup.persistPublic(verts.agg(count(lit(1)).as("n")))
    var ranks = Dedup.truncatePublic(verts.crossJoin(broadcast(n1))
      .select(col("doc_id"), (lit(1.0) / col("n")).as("r")))
    var it = 0
    var delta = Double.MaxValue
    while (it < maxIters && delta > tol) {
      val next = Dedup.truncatePublic(
        pageRankStep(verts, edges, deg, n1, ranks, damping, dangling))
      val d = ranks.as("o")
        .join(next.as("nw"), col("o.doc_id") === col("nw.doc_id"))
        .agg(coalesce(sum(abs(col("nw.r") - col("o.r"))
          .cast("decimal(28,18)")), lit(0).cast("decimal(28,18)"))
          .cast("double"))
        .head().getDouble(0)
      delta = d
      // the superseded round is never read again — release its
      // checkpoint blocks NOW, so a 50-round fixpoint pins at most two
      // rank frames instead of all fifty. (localCheckpoint mode only:
      // under `spark.graft.checkpointDir` the reliable-checkpoint files
      // are owned by that job-scoped directory — per-round release is a
      // deliberate no-op there, and the caller deletes the directory
      // when the job ends.)
      Dedup.releasePublic(ranks)
      ranks = next
      it += 1
    }
    (ranks, it, delta)
  }

  /** Per-vertex triangle counts. Returns `(doc_id, n_triangles)` for
    * every vertex in `vertices` (0 for triangle-free vertices). Exact
    * integers — bit-exact on any partitioning by construction.
    *
    * The oriented edge frame is consumed by the wedge self-join (twice)
    * and the closure join, so it is persisted via the [[Dedup]]
    * lifecycle (release with `Dedup.unpersistAll()`).
    */
  def triangleCounts(vertices: DataFrame, pairs: DataFrame): DataFrame = {
    val p = pairs.select(col("doc_a"), col("doc_b"))
    val und = p.union(
      p.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val deg = und.groupBy(col("doc_a")).agg(count(lit(1)).as("deg"))
      .withColumnRenamed("doc_a", "v")
    // deg is vertex-cardinality — joined PLAIN, never broadcast: on a
    // billion-vertex similarity graph a forced broadcast would exceed
    // any driver budget. The equi join exchanges on the same key the
    // wedge join needs anyway.
    val rk = deg
    val d0 = und
      .join(rk, und("doc_a") === rk("v")).drop("v")
      .withColumnRenamed("deg", "sdeg")
      .join(rk, und("doc_b") === rk("v")).drop("v")
      .withColumnRenamed("deg", "ddeg")
    val directed = Dedup.persistPublic(d0.filter(
        col("sdeg") < col("ddeg") ||
        (col("sdeg") === col("ddeg") && col("doc_a") < col("doc_b")))
      .select(col("doc_a").as("src"), col("doc_b").as("dst"),
        col("ddeg")))
    val wedges = directed.as("w1")
      .join(directed.as("w2"), col("w1.src") === col("w2.src") &&
        (col("w1.ddeg") < col("w2.ddeg") ||
         (col("w1.ddeg") === col("w2.ddeg") &&
          col("w1.dst") < col("w2.dst"))))
      .select(col("w1.src").as("u"), col("w1.dst").as("v"),
        col("w2.dst").as("w"))
    val tri = wedges.join(directed,
        wedges("v") === directed("src") && wedges("w") === directed("dst"))
      .select(col("u"), col("v"), col("w"))
    val perDoc = tri.select(col("u").as("doc_id"))
      .union(tri.select(col("v").as("doc_id")))
      .union(tri.select(col("w").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_triangles"))
    vertices.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** Semi-supervised label propagation: `seeds` is `(doc_id, label)`
    * for the labeled subset; each round every still-unlabeled vertex
    * adopts the plurality label among its ALREADY-labeled neighbors
    * (ties by smallest label — a total, replayable order), and newly
    * labeled vertices propagate in later rounds. Seeds are clamped.
    * Returns `(doc_id, label)` with NULL for vertices no labeled
    * neighbor ever reached.
    *
    * Each round is one shuffle (edges ⋈ labels on the source id) plus
    * one exact-count aggregate; the argmax is `min(struct(-cnt,
    * label))` — no window, no per-vertex sort. Counts are exact longs,
    * labels compare bytewise: the whole fixpoint replays exactly in an
    * unrolled SQL oracle. Deep fixpoints should persist per round (the
    * d8 discipline); callers pass small `iters`.
    */
  def labelPropagate(vertices: DataFrame, pairs: DataFrame,
      seeds: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val edges = partitionedEdges(pairs, symmetrize = true)
    var labels = vertices
      .join(seeds.select(col("doc_id"), col("label")), Seq("doc_id"), "left")
    (1 to iters).foreach { _ =>
      val votes = edges
        .join(labels.filter(col("label").isNotNull),
          edges("doc_a") === labels("doc_id"))
        .groupBy(col("doc_b"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val winner = votes
        .groupBy(col("doc_b"))
        .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l")))
          .as("w"))
        .select(col("doc_b").as("doc_id"),
          col("w").getField("l").as("new_label"))
      labels = labels.join(winner, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("label"), col("new_label")).as("label"))
    }
    labels
  }

  /** Personalized PageRank: [[pageRank]] with the teleport mass
    * concentrated on `seeds` instead of spread uniformly — the
    * seed-relative relevance ranking behind "more docs like this set"
    * retrieval expansion and seed-based corpus slicing. Rank starts
    * uniform over the seed set; each damped iteration teleports
    * `(1−damping)/|seeds|` back to every seed (0 elsewhere), so mass
    * stays concentrated around the seeds' neighborhood. Same
    * distributed shape and determinism discipline as [[pageRank]]:
    * one shuffle per round on the source id, decimal-routed
    * contributions, degree joined plain (vertex-cardinality — never
    * broadcast), replayable by an unrolled SQL oracle.
    */
  def personalizedPageRank(vertices: DataFrame, pairs: DataFrame,
      seeds: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    val edges = partitionedEdges(pairs, symmetrize = true)
    val deg = Dedup.persistPublic(
      edges.groupBy(col("doc_a")).agg(count(lit(1)).as("deg")))
    val seedSet = seeds.select(col("doc_id")).distinct()
    // the seed set is small by contract (it is the user's query); an
    // empty one would silently return all-zero ranks (t = 0 everywhere
    // fixes at 0), and a seed id absent from `vertices` would inflate
    // n_seeds while contributing no teleport mass — both are caller
    // bugs, surfaced here instead of as a zero/deflated "ranking"
    require(!seedSet.isEmpty, "personalizedPageRank: seed set is empty")
    require(seedSet.join(vertices.select(col("doc_id")), Seq("doc_id"),
        "left_anti").isEmpty,
      "personalizedPageRank: some seed ids are not in `vertices`")
    val ns = seedSet.agg(count(lit(1)).as("n_seeds"))
    val teleport = vertices
      .join(seedSet.withColumn("is_seed", lit(1)), Seq("doc_id"), "left")
      .crossJoin(broadcast(ns))
      .select(col("doc_id"),
        when(col("is_seed").isNotNull, lit(1.0) / col("n_seeds"))
          .otherwise(lit(0.0)).as("t"))
    var ranks = teleport.select(col("doc_id"), col("t").as("r"))
    (1 to iters).foreach { _ =>
      val sums = edges
        .join(ranks, edges("doc_a") === ranks("doc_id"))
        .join(deg, Seq("doc_a"))
        .select(col("doc_b"),
          (col("r") / col("deg")).cast("decimal(28,18)").as("c"))
        .groupBy(col("doc_b"))
        .agg(sum(col("c")).cast("double").as("m"))
      ranks = teleport
        .join(sums, teleport("doc_id") === sums("doc_b"), "left")
        .select(teleport("doc_id"),
          (lit(1.0 - damping) * col("t")
            + lit(damping) * coalesce(col("m"), lit(0.0))).as("r"))
    }
    ranks
  }

  /** Louvain-style greedy merge round (Blondel et al. 2008's local move
    * from the all-singletons start): each vertex joins the neighbor
    * whose pairwise merge yields the largest positive modularity delta.
    * For two singletons u, v with one edge, ΔQ = (2m − deg_u·deg_v)/2m²
    * — sign and argmax depend only on the INTEGER numerator, so the
    * whole round is exact BIGINT arithmetic (ties → smallest neighbor
    * id via struct-min, the [[labelPropagate]] discipline), synchronous
    * and replayable by a SQL oracle. Returns `(doc_id, comm, gain_num)`
    * for every vertex — `comm = doc_id` and `gain_num = 0` when no
    * neighbor merge is positive (or the vertex is isolated).
    *
    * Scale posture: one degree shuffle + one edge⋈degree shuffle + one
    * struct-min aggregate; only the 1-row edge count broadcasts — no
    * vertex-cardinality frame anywhere (the [[pageRank]] discipline).
    */
  def louvainMove(vertices: DataFrame, pairs: DataFrame): DataFrame = {
    val p = pairs.select(col("doc_a"), col("doc_b"))
    val und = p.union(
      p.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val deg = und.groupBy(col("doc_a")).agg(count(lit(1)).as("deg"))
    val m1 = p.agg(count(lit(1)).as("m"))
    val scores = und
      .join(deg.toDF("doc_a", "dv"), Seq("doc_a"))
      .join(deg.toDF("doc_b", "du"), Seq("doc_b"))
      .crossJoin(broadcast(m1))
      .select(col("doc_a").as("v"), col("doc_b").as("u"),
        (lit(2) * col("m") - col("dv") * col("du")).as("score"))
    val best = scores.groupBy(col("v"))
      .agg(min(struct((-col("score")).as("ns"), col("u").as("u"))).as("w"))
      .select(col("v").as("doc_id"),
        (-col("w.ns")).as("bs"), col("w.u").as("bu"))
    vertices.select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("bs") > 0, col("bu")).otherwise(col("doc_id")).as("comm"),
        greatest(coalesce(col("bs"), lit(0L)), lit(0L)).as("gain_num"))
  }

  /** Multi-level Louvain (Blondel et al. 2008's pipeline shape:
    * local move → coarsen → repeat), made synchronous-deterministic:
    * each level applies [[louvainMove]]'s pairwise-ΔQ scoring to the
    * CURRENT super-vertex graph and accepts exactly the MUTUAL best
    * pairs with positive gain — the matching-based agglomeration of
    * multilevel graph partitioning (Karypis & Kumar SC'95's heavy-edge
    * matching, scored by modularity delta instead of raw weight).
    * Mutual acceptance is what makes the synchronous round a valid
    * partition update: g11's raw move can propose a→b while b→c
    * (labels that name no consistent community), whereas a matching is
    * conflict-free by construction, every accepted merge has
    * ΔQ = (2m·w_AB − D_A·D_B)/2m² > 0, and disjoint merges make the
    * level's total ΔQ exactly the sum of the accepted pairs' — so the
    * reported modularity is NON-DECREASING per level and the whole
    * fixpoint stays BIGINT-exact and SQL-replayable (struct-min ties →
    * smallest partner id, the [[labelPropagate]] discipline). `levels`
    * is a fixed unrolled bound (the g1/g4 discipline): a level with no
    * positive mutual pair is a no-op, so reaching the true fixpoint
    * early just repeats the final partition.
    *
    * `movesPerLevel` is the bounded MULTI-MOVE inner loop — Blondel's
    * move-to-convergence in the matching formulation: each level
    * repeats the mutual-match round until no positive-gain pair is
    * accepted (early stop) or the cap is hit, so one-round blind spots
    * (A's best is B while B's best is C — not mutual THIS round,
    * resolvable after (B,C) merges) close within the level. The default
    * 1 keeps the single-match historical behavior; a no-op extra round
    * recomputes identical labels, so a fixed-unroll SQL replay is
    * value-identical to the early-stopping loop.
    *
    * Coarsening sums parallel edges (w_AB = cross-community edge count)
    * and community degrees (D_A = Σ member original degree), both
    * recomputed from the ORIGINAL edge list through the level's label
    * map — self-loop bookkeeping never enters, and the per-level
    * modularity report is literally g7's formula grouped by the level's
    * labels. Score products route through decimal(38,0) (the t19
    * headroom discipline: 2m·w and D_A·D_B exceed int64 past ~1.5e9
    * edges); the REPORT keeps g7's int64 ppm arithmetic and inherits
    * its documented D_c < 3e6 headroom bound.
    *
    * Scale posture: per level, one label⋈edge map (two equi joins on
    * vertex id), one map-combinable weight aggregate over coarse pairs,
    * one COARSE-frame degree rollup (no per-level vertex-cardinality
    * join — [[commDegreesFromCoarse]]), one struct-min argmax, one
    * self-join of the (coarse-cardinality) best table — no
    * vertex-cardinality broadcast
    * anywhere (only the 1-row edge count), labels lineage-truncated per
    * level so the iterative plan never compounds (the d8 discipline),
    * the level's coarse frames persisted and shared between the match
    * round and the modularity report.
    */
  def louvainLevels(vertices: DataFrame, pairs: DataFrame,
      levels: Int, movesPerLevel: Int = 1): DataFrame =
    louvainRun(vertices, pairs, levels, movesPerLevel)._2

  /** Final `(doc_id, comm)` labels after [[louvainLevels]]' merges —
    * the assignment consumers join on (the spec-side surface for
    * planted-community recovery).
    */
  def louvainCommunities(vertices: DataFrame, pairs: DataFrame,
      levels: Int, movesPerLevel: Int = 1): DataFrame =
    louvainRun(vertices, pairs, levels, movesPerLevel)._1

  private def louvainRun(vertices: DataFrame, pairs: DataFrame,
      levels: Int, movesPerLevel: Int): (DataFrame, DataFrame) = {
    require(levels >= 1 && levels <= 4,
      s"unrolled multi-level Louvain is capped at 4 levels, got $levels")
    // the bounded MULTI-MOVE inner loop (Blondel's move-to-convergence,
    // matching-formulated): each level repeats the mutual-match round up
    // to `movesPerLevel` times, stopping EARLY when a round accepts no
    // positive-gain pair — a one-round graph (A's best is B while B's
    // best is C) resolves in later rounds after (B,C) merges. The cap
    // keeps the unroll bounded and the SQL replay finite; the early
    // stop is pure economy — a converged round recomputes identical
    // labels, so fixed unconditional unrolling (what the oracle does)
    // is value-identical.
    require(movesPerLevel >= 1 && movesPerLevel <= 4,
      s"moves per level capped at 4 (bounded unroll), got $movesPerLevel")
    val p = pairs.select(col("doc_a"), col("doc_b"))
    val m1 = p.agg(count(lit(1)).as("m"))
    var labels = vertices.select(col("doc_id"), col("doc_id").as("comm"))
    // per label state, ONE labels⋈edges map + ONE coarse aggregate
    // serves ALL three consumers: the x≠y slice is the match round's
    // cross-community weights, the x=y slice is the report's
    // within-community edge count, and the per-endpoint w rollup is the
    // community degree sum ([[commDegreesFromCoarse]]) — each move pays
    // the two label⋈edge equi joins exactly once; no per-level
    // vertex-cardinality join remains. The SINGLETON start needs no
    // label join at all (comm = doc_id — the map is the identity), so
    // the one O(edges) aggregate of the whole run is a plain
    // normalize-endpoints groupBy, value-identical to
    // coarsePairWeights(identity, p) without its two edge-sized joins.
    var agg = Dedup.persistPublic(
      p.select(least(col("doc_a"), col("doc_b")).as("x"),
          greatest(col("doc_a"), col("doc_b")).as("y"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("w")))
    var dC = Dedup.persistPublic(commDegreesFromCoarse(labels, agg))
    var out = louvainLevelSummary(agg, dC, m1, 0)
    (1 to levels).foreach { l =>
      var move = 0
      var converged = false
      while (move < movesPerLevel && !converged) {
        // the accepted-pair frame feeds BOTH the convergence probe and
        // the label update — persist it (coarse-cardinality, cheap) so
        // the score/argmax/self-join pipeline runs once per move, not
        // twice
        val merged = Dedup.persistPublic(
          louvainMergeParts(labels, agg, dC, m1)._1)
        val next = applyMerge(labels, merged)
        // convergence probe: one job over the (coarse-cardinality,
        // persisted) mutual-pair frame — O(communities), not
        // O(corpus); a level at its match fixpoint skips its remaining
        // moves AND the label/coarse rebuilds they would re-run
        if (merged.isEmpty) converged = true
        else {
          // labels must TRUNCATE (d8/g9's per-round eager checkpoint),
          // not just persist: the merge references the previous state
          // ~13× (two label⋈edge maps, the degree rollup, the best-table
          // self-join), so a persist-only chain grows the PLAN TREE 13×
          // per move — renderable at move 1, OOM by move 3. Eager rounds
          // make this a construction-runs-jobs operator like g9's
          // fixpoint: it is kept out of the plan-rendering specs (its
          // round unit is pinned instead), and a 100 TB run pays one
          // bounded job per move.
          labels = Dedup.truncatePublic(next)
          // the next coarse frame FOLDS the previous one through the
          // accepted-pair map instead of re-scanning the original edge
          // list: every edge sits in exactly one (x, y, w) row, and
          // remapping that row's endpoints then re-normalizing min/max
          // lands it on the same coarse pair a direct rebuild would —
          // so each move costs O(coarse graph), and only move 0 (the
          // singleton start, before the loop) pays the O(edges) scan.
          // TRUNCATED, not just persisted: the fold chains agg on agg
          // and the merge/degree consumers reference each agg ~4×, so a
          // persist-only chain multiplies the PLAN TREE per move (the
          // labels lesson again — AQE's explainString OOMs by move 4)
          agg = Dedup.truncatePublic(coarsenAgg(agg, merged))
          dC = Dedup.persistPublic(commDegreesFromCoarse(labels, agg))
        }
        move += 1
      }
      out = out.union(louvainLevelSummary(agg, dC, m1, l))
    }
    (labels.orderBy(col("doc_id")), out.orderBy(col("lvl")))
  }

  /** Coarse pair weights under `labels`: `(x=min(ca,cb), y=max(ca,cb),
    * w=edge count)` over the ORIGINAL edges mapped through the label
    * pair of equi joins. Cross-community rows (x≠y) feed the matching,
    * within-community rows (x=y) feed the modularity report.
    */
  private def coarsePairWeights(labels: DataFrame, p: DataFrame): DataFrame =
    p.join(labels.toDF("doc_a", "ca"), Seq("doc_a"))
      .join(labels.toDF("doc_b", "cb"), Seq("doc_b"))
      .select(least(col("ca"), col("cb")).as("x"),
        greatest(col("ca"), col("cb")).as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("w"))

  /** Fold a coarse `(x, y, w)` frame through an accepted-pair map
    * `(oldc, newc)`: remap both endpoints (communities that did not
    * merge pass through), re-normalize min/max, and re-aggregate —
    * VALUE-IDENTICAL to recomputing [[coarsePairWeights]] from the
    * original edges under the updated labels (each edge lives in
    * exactly one coarse row; remapping the row's endpoint SET equals
    * remapping the edge's), at O(coarse graph) instead of O(edges) per
    * move.
    */
  private def coarsenAgg(agg: DataFrame, merged: DataFrame): DataFrame =
    agg
      .join(merged.toDF("oldx", "newx"), col("x") === col("oldx"), "left")
      .join(merged.toDF("oldy", "newy"), col("y") === col("oldy"), "left")
      .select(
        least(coalesce(col("newx"), col("x")),
          coalesce(col("newy"), col("y"))).as("cx"),
        greatest(coalesce(col("newx"), col("x")),
          coalesce(col("newy"), col("y"))).as("cy"),
        col("w"))
      .groupBy(col("cx").as("x"), col("cy").as("y"))
      .agg(sum(col("w")).as("w"))

  /** Community degree sums under `labels` from the persisted vertex
    * degree table (left join keeps edge-less vertices as d=0 singleton
    * communities — they count in n_comms). Spec-facing via
    * [[louvainMatchRound]]; [[louvainRun]] derives the identical values
    * from the level's coarse frame instead ([[commDegreesFromCoarse]]).
    */
  private def commDegrees(labels: DataFrame, degV: DataFrame): DataFrame =
    labels.join(degV, labels("doc_id") === degV("v"), "left")
      .groupBy(col("comm"))
      .agg(sum(coalesce(col("deg"), lit(0L))).as("d"))

  /** Community degree sums derived from the level's COARSE `(x, y, w)`
    * frame instead of a per-level vertex⋈vertex join: every original
    * edge contributes one endpoint to each side's community, so
    * D_c = Σ_{x=c} w + Σ_{y=c} w (an x=y row lands in both unions —
    * 2w, both endpoints inside c). Identical values to [[commDegrees]]
    * (D_c = Σ member original degree = the count of edge endpoints in
    * c); the cost drops to one rollup over the already-persisted
    * coarse frame plus one label aggregate. Edge-less vertices form
    * zero-degree singleton communities that never reach the coarse
    * frame — the distinct-label left join restores them as d=0 rows so
    * n_comms still counts every community.
    */
  private def commDegreesFromCoarse(labels: DataFrame,
      agg: DataFrame): DataFrame = {
    val ends = agg.select(col("x").as("comm"), col("w"))
      .union(agg.select(col("y").as("comm"), col("w")))
      .groupBy(col("comm")).agg(sum(col("w")).as("de"))
    labels.select(col("comm")).distinct()
      .join(ends, Seq("comm"), "left")
      .select(col("comm"), coalesce(col("de"), lit(0L)).as("d"))
  }

  /** One mutual-best matching round over the coarse graph induced by
    * `labels`: returns the updated `(doc_id, comm)` map. Kept as the
    * spec-facing single-round surface; [[louvainRun]] goes through
    * [[louvainMergeFrom]] with the level's shared frames instead.
    */
  private[graft] def louvainMatchRound(labels: DataFrame, p: DataFrame,
      degV: DataFrame, m1: DataFrame): DataFrame =
    louvainMergeFrom(labels, coarsePairWeights(labels, p),
      commDegrees(labels, degV), m1)

  private def louvainMergeFrom(labels: DataFrame, agg: DataFrame,
      dC: DataFrame, m1: DataFrame): DataFrame =
    louvainMergeParts(labels, agg, dC, m1)._2

  /** The match round split into its accepted-pair set and the updated
    * label map — the pair set drives [[louvainRun]]'s per-level
    * convergence probe (empty ⇒ the level is at its match fixpoint).
    */
  private def louvainMergeParts(labels: DataFrame, agg: DataFrame,
      dC: DataFrame, m1: DataFrame): (DataFrame, DataFrame) = {
    val ce = agg.filter(col("x") =!= col("y"))
    val dir = ce.select(col("x").as("a"), col("y").as("b"), col("w"))
      .union(ce.select(col("y").as("a"), col("x").as("b"), col("w")))
    val sc = dir
      .join(dC.toDF("a", "da"), Seq("a"))
      .join(dC.toDF("b", "db"), Seq("b"))
      .crossJoin(broadcast(m1))
      .select(col("a"), col("b"),
        (lit(2) * col("m").cast("decimal(38,0)") * col("w")
          - col("da").cast("decimal(38,0)") * col("db")).as("score"))
    val best = sc.groupBy(col("a"))
      .agg(min(struct((-col("score")).as("ns"), col("b").as("u"))).as("bw"))
      .select(col("a"), (-col("bw.ns")).as("bs"), col("bw.u").as("bu"))
    val merged = best.as("l").join(best.as("r"),
        col("l.bu") === col("r.a") && col("r.bu") === col("l.a")
          && col("l.bs") > 0)
      .select(col("l.a").as("oldc"),
        least(col("l.a"), col("l.bu")).as("newc"))
    (merged, applyMerge(labels, merged))
  }

  /** Apply an accepted-pair map `(oldc, newc)` to a label frame. */
  private def applyMerge(labels: DataFrame, merged: DataFrame): DataFrame =
    labels.join(merged, labels("comm") === merged("oldc"), "left")
      .select(col("doc_id"),
        coalesce(col("newc"), col("comm")).as("comm"))

  /** g7's per-community modularity terms from the level's shared coarse
    * frames, rolled up to one exact row: `(lvl, n_comms, l_in, q_ppm)`
    * with q_ppm = Σ_c [(1e6·L_c) div m − (1e6·D_c²) div 4m²] — integer
    * division per community, then summed, so a SQL oracle replays the
    * identical rounding.
    */
  private def louvainLevelSummary(agg: DataFrame, dC: DataFrame,
      m1: DataFrame, level: Int): DataFrame = {
    val lIn = agg.filter(col("x") === col("y"))
      .select(col("x").as("comm"), col("w").as("l_in"))
    dC.toDF("comm", "d_sum").join(lIn, Seq("comm"), "left")
      .crossJoin(broadcast(m1))
      .select(coalesce(col("l_in"), lit(0L)).as("l_in"),
        col("d_sum"), col("m"))
      .select(col("l_in"),
        (expr("(1000000 * l_in) div m")
          - expr("(1000000 * d_sum * d_sum) div (4 * m * m)"))
          .as("q_term_ppm"))
      .agg(count(lit(1)).as("n_comms"), sum(col("l_in")).as("l_in"),
        sum(col("q_term_ppm")).as("q_ppm"))
      .select(lit(level.toLong).as("lvl"), col("n_comms"),
        col("l_in"), col("q_ppm"))
  }

  /** k-core decomposition, `rounds` unrolled peel iterations: each round
    * drops every vertex whose degree in the SURVIVING subgraph is below
    * `k`, then restricts the edge set to survivor×survivor. Returns
    * `(doc_id, in_core, core_deg)` for every vertex — `in_core` marks
    * round-`rounds` survivors, `core_deg` is the vertex's degree among
    * them (0 for peeled vertices). The dense-community extractor for a
    * similarity graph: a document inside a k-core sits in a mutually
    * similar cluster no single pair score can certify.
    *
    * Scale posture: each round is one map-combinable degree aggregate
    * plus two equi semi-joins of the edge list against the (small,
    * shrinking) survivor set — never a cartesian, never a window. The
    * edge frame is persisted per round so the iterative self-join does
    * not double its lineage (the `Dedup.connectedComponents`
    * checkpoint discipline); fixed shallow rounds keep the whole peel
    * replayable by an unrolled SQL oracle. Exact integer degrees —
    * bit-exact by construction.
    */
  def kCore(vertices: DataFrame, pairs: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val p = pairs.select(col("doc_a"), col("doc_b"))
    var edges = p.union(
      p.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    var alive: DataFrame = null
    (1 to rounds).foreach { _ =>
      val (a, e) = kCorePeel(edges, k)
      alive = a
      edges = graft.operators.Dedup.persistPublic(e)
    }
    val coreDeg = edges.groupBy(col("doc_a")).agg(count(lit(1)).as("cd"))
    vertices
      .join(alive, vertices("doc_id") === alive("v"), "left")
      .join(coreDeg, vertices("doc_id") === coreDeg("doc_a"), "left")
      .select(col("doc_id"),
        col("v").isNotNull.as("in_core"),
        coalesce(col("cd"), lit(0L)).as("core_deg"))
  }

  /** One k-core peel round — the repeated unit [[kCore]] persists per
    * iteration: one map-combinable degree aggregate, then the edge list
    * restricted to survivor×survivor via two left-semi equi joins.
    * Returns `(survivors, restricted edges)`. Factored out so the golden
    * plan can pin the round's shape on a cache-independent input (the
    * `d8_cc_round` discipline — the full query's plan text depends on
    * what the JVM's cache manager has already registered).
    */
  private[graft] def kCorePeel(edges: DataFrame, k: Int): (DataFrame, DataFrame) = {
    val deg = edges.groupBy(col("doc_a")).agg(count(lit(1)).as("deg"))
    val alive = deg.filter(col("deg") >= k).select(col("doc_a").as("v"))
    val restricted = edges
      .join(alive, edges("doc_a") === alive("v"), "left_semi")
      .join(alive, edges("doc_b") === alive("v"), "left_semi")
    (alive, restricted)
  }

  /** k-truss decomposition (Cohen 2008): keep edges supported by at
    * least k−2 triangles, recompute support on the restricted graph,
    * repeat. Where k-core finds vertices with many neighbors, k-truss
    * finds edges whose ENDPOINT NEIGHBORHOODS overlap — the stronger
    * cohesion signal (every truss edge sits in k−2 closed wedges), the
    * community-backbone extractor over the t14 similarity graph.
    *
    * `pairs` must be canonical `(doc_a < doc_b)`. Fixed `rounds` (the
    * g1/g4 unrolled-fixpoint discipline) so the DuckDB oracle replays
    * the identical prefix; each round persists its surviving edge set
    * (the d8 lineage discipline). Returns the edges alive after the
    * last round with that round's support.
    *
    * Scale: triangle enumeration here orients by id (smallest vertex
    * anchors the wedge), adequate because the t14 df band caps degrees;
    * a hub-heavy graph would swap in [[triangleCounts]]'s
    * degree-ordered compact-forward orientation — same join shape.
    */
  def kTruss(pairs: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 3, s"k must be >= 3, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var edges = Dedup.persistPublic(
      pairs.select(col("doc_a"), col("doc_b")))
    var sup: DataFrame = null
    (1 to rounds).foreach { _ =>
      sup = trussSupport(edges)
      edges = Dedup.persistPublic(
        sup.filter(col("support") >= k - 2)
          .select(col("doc_a"), col("doc_b")))
    }
    sup.filter(col("support") >= k - 2)
  }

  /** One support round — the repeated unit [[kTruss]] persists per
    * iteration: triangles from two wedge equi joins (anchor = smallest
    * vertex, closure probed with a left-semi), each triangle credited
    * to its three canonical edges, one map-combinable count, and a
    * left join restoring support-0 edges. Factored out so the golden
    * plan pins the round's shape cache-independently (the
    * `d8_cc_round` / `g4_kcore_round` discipline).
    */
  private[graft] def trussSupport(edges: DataFrame): DataFrame = {
    val tri = edges.as("e1")
      .join(edges.as("e2"),
        col("e1.doc_a") === col("e2.doc_a") &&
          col("e1.doc_b") < col("e2.doc_b"))
      .select(col("e1.doc_a").as("u"), col("e1.doc_b").as("v"),
        col("e2.doc_b").as("w"))
      .join(edges.as("e3"),
        col("v") === col("e3.doc_a") && col("w") === col("e3.doc_b"),
        "left_semi")
    val contrib = tri.select(col("u").as("doc_a"), col("v").as("doc_b"))
      .union(tri.select(col("u").as("doc_a"), col("w").as("doc_b")))
      .union(tri.select(col("v").as("doc_a"), col("w").as("doc_b")))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("support"))
    edges.join(contrib, Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"),
        coalesce(col("support"), lit(0L)).as("support"))
  }

  /** HITS hubs/authorities (Kleinberg JACM'99) over the DIRECTED pair
    * list `doc_a → doc_b` — the two-sided centrality PageRank's single
    * score can't express: a hub points AT many good authorities, an
    * authority is pointed at BY many good hubs. On a similarity/citation
    * graph this separates "survey/template docs that reference
    * everything" (hubs) from "docs everything references" (authorities).
    *
    * Kept UNNORMALIZED and integer-exact: with h₀ = 1, every round is
    * a = Aᵀh then h = A·a — two map-combinable BIGINT sums per round,
    * one shuffle each (by target, then by source); the usual per-round
    * L2 normalization only rescales, so the RANKING is identical and
    * the whole fixpoint replays bit-for-bit in a SQL oracle with no
    * transcendentals. Scores are bounded by (inmax·outmax)^iters —
    * with h₀ = 1, a_k ≤ inmax·max(h_{k−1}) and h_k ≤ outmax·max(a_k),
    * so each FULL round multiplies the bound by inmax·outmax (and
    * a_iters ≤ inmax·(inmax·outmax)^(iters−1) ≤ the same bound once
    * any edge exists) — and Spark's non-ANSI sum would WRAP silently
    * past int64, corrupting the ranking with no error. The
    * precondition is therefore enforced LAZILY: the plan folds one
    * O(E) in/out-degree aggregate (same cost as half a round) into the
    * FINAL output's 1-row broadcast and `raise_error`s at EXECUTION
    * time when inmax·outmax exceeds the largest product whose
    * iters-th power fits int64 — plan construction stays
    * side-effect-free (no driver-blocking job paid for a query that is
    * never run), the guard rides the OUTPUT (never hub₀'s iterated
    * lineage, where the final plan's two references to the auth
    * subtree re-evaluated it per branch — a measured ~8× regression),
    * and the exactness of the boundary is preserved by precomputing
    * the largest safe product in BigInt driver-side so the runtime
    * check is a single codegen'd compare (decimal product: inmax and
    * outmax are each ≤ E, so their int64 product could itself wrap).
    * The bound is TIGHT in the directional maxima — a star that fans
    * OUT 10⁶ edges from one hub is admitted (its scores stay linear in
    * degree) where the old max-total-degree bound rejected it; graphs
    * over the boundary need fewer rounds, a degree cap upstream (the
    * t14 df-band discipline), or a normalized floating-point variant;
    * normalize downstream if absolute values matter.
    *
    * Scale posture: the g1 discipline — no vertex-cardinality frame is
    * ever broadcast; both joins exchange on the edge endpoint they
    * aggregate by, and callers should persist `pairs` so the edge frame
    * builds once (every round scans it twice).
    */
  /** Largest degree product P = inmax·outmax with P^iters ≤
    * Long.MaxValue — the exact int64-safety boundary for unnormalized
    * integer HITS, computed in BigInt so there is no float log slop at
    * the edge (55108 at 4 rounds, 2097151 at 3, 3037000499 at 2,
    * Long.MaxValue at 1).
    */
  private[graft] def maxSafeHitsProduct(iters: Int): Long = {
    val cap = BigInt(Long.MaxValue)
    var lo = 1L
    var hi = Long.MaxValue
    while (lo < hi) {
      val mid = lo + (hi - lo + 1) / 2
      if (BigInt(mid).pow(iters) <= cap) lo = mid else hi = mid - 1
    }
    lo
  }

  def hits(vertices: DataFrame, pairs: DataFrame, iters: Int = 2): DataFrame = {
    require(iters >= 1 && iters <= 4,
      s"exact integer HITS is capped at 4 rounds (score overflow), got $iters")
    // persisted DIRECTED and partitioned on doc_a (both per-round joins
    // and the guard read it; the auth half-round joins on doc_a and
    // skips its exchange — the hub half-round joins on doc_b and pays
    // one vertex-sized shuffle, HITS' alternating-key price). NOT the
    // bare (doc_a, doc_b) select: caching that canonical form would sit
    // INSIDE the g1-family's partitionedEdges subtree and defeat the
    // outer cache's top-down plan substitution (the r17 nested-cache
    // lesson)
    val edges = partitionedEdges(pairs, symmetrize = false)
    // overflow guard, LAZY and attached to the FINAL output (see the
    // operator doc): scores reach (inmax·outmax)^iters in the worst
    // case and the BIGINT sums below wrap silently past int64. The
    // largest safe product is exact BigInt arithmetic driver-side (a
    // pure function of `iters`, no data touched); the runtime check is
    // one decimal compare on a 1-row global aggregate whose broadcast
    // builds — and raises — before any result row is emitted.
    val safeProd = maxSafeHitsProduct(iters)
    val guard = broadcast(
      edges.select(col("doc_a").as("v"), lit(1L).as("od"), lit(0L).as("id"))
        .union(
          edges.select(col("doc_b").as("v"), lit(0L).as("od"), lit(1L).as("id")))
        .groupBy(col("v"))
        .agg(sum(col("od")).as("odeg"), sum(col("id")).as("ideg"))
        .agg(coalesce(max(col("odeg")), lit(0L)).as("omax"),
          coalesce(max(col("ideg")), lit(0L)).as("imax"))
        .select(when(
            col("imax").cast("decimal(19,0)")
              * col("omax").cast("decimal(19,0)") > lit(safeProd),
            raise_error(format_string(
              "exact integer HITS overflows int64: max in-degree %d x " +
                s"max out-degree %d at $iters round(s) bounds scores by " +
                s"their product^$iters > 2^63-1 — lower iters, cap " +
                "degrees upstream, or normalize",
              col("imax"), col("omax"))))
          .otherwise(lit(1L)).as("g")))
    var hub: DataFrame = vertices.select(col("doc_id"))
      .withColumn("h", lit(1L))
    var auth: DataFrame = null
    (1 to iters).foreach { _ =>
      auth = edges.join(hub, edges("doc_a") === hub("doc_id"))
        .groupBy(col("doc_b")).agg(sum(col("h")).as("a"))
        .select(col("doc_b").as("doc_id"), col("a"))
      hub = edges.join(auth, edges("doc_b") === auth("doc_id"))
        .groupBy(col("doc_a")).agg(sum(col("a")).as("h"))
        .select(col("doc_a").as("doc_id"), col("h"))
    }
    // g (always 1) multiplies into BOTH output columns so column
    // pruning can never drop the raise_error branch — a caller
    // projecting only (doc_id, auth) must still evaluate the guard
    // (auth is bounded by imax·(imax·omax)^(iters-1), which also wraps
    // past the boundary); values and schema unchanged
    vertices.select(col("doc_id"))
      .join(auth, Seq("doc_id"), "left")
      .join(hub, Seq("doc_id"), "left")
      .crossJoin(guard)
      .select(col("doc_id"),
        (coalesce(col("a"), lit(0L)) * col("g")).as("auth"),
        (coalesce(col("h"), lit(0L)) * col("g")).as("hub"))
  }

  /** WEIGHTED PageRank over a scored pair list — centrality where an
    * edge's pull is its SIMILARITY, not its existence (the natural
    * reading on the t14 tf-idf graph: a document tied to hubs by
    * near-duplicate-strength edges outranks one tied by single shared
    * bigrams, which binary [[pageRank]] cannot distinguish). The walk
    * follows `w(v,u)/s(v)` with `s(v) = Σ_u w(v,u)` the out-strength:
    * per round ONE edges ⋈ ranks shuffle + one map-combinable
    * per-target sum, the strength frame joined PLAIN (vertex-
    * cardinality, co-partitioned — the g1 no-broadcast discipline).
    * Contributions route through decimal(28,18) (each term ≤ r(v) ≤ 1
    * since the w/s row-weights sum to 1), so rounds are bit-exact on
    * any partitioning and the unrolled SQL oracle replays them;
    * uniform weights reduce BIT-FOR-BIT to [[pageRank]] (spec-pinned —
    * w = 1 makes s the degree and r·w/s ≡ r/deg). Simplified dangling
    * treatment matches g1's (documented).
    */
  def weightedPageRank(vertices: DataFrame, pairs: DataFrame, iters: Int,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 8,
      s"unrolled weighted PageRank: iters must be in [1, 8], got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    // Weight validity is enforced IN the plan (map-side, codegen'd
    // compare per edge — the hits() lazy-guard discipline): a null
    // weight would contribute null and silently DROP from the sum, a
    // zero/negative weight breaks the row-stochastic w/s normalization
    // (s could be 0 or negative), and NaN poisons every rank it
    // touches — all three must fail loudly like the iters/damping
    // requires, not corrupt the walk.
    val p = pairs.select(col("doc_a"), col("doc_b"),
      when(col("score").isNull || !(col("score") > lit(0)) ||
          col("score").cast("double").isNaN,
        raise_error(format_string(
          "weightedPageRank: edge (%s, %s) carries weight %s — edge " +
            "weights must be non-null, positive, finite numbers (the " +
            "w/s row-stochastic normalization is undefined otherwise)",
          col("doc_a"), col("doc_b"), col("score"))))
        .otherwise(col("score")).as("w"))
    val edges0 = p.union(p.select(col("doc_b").as("doc_a"),
      col("doc_a").as("doc_b"), col("w")))
    val strength = edges0.groupBy(col("doc_a"))
      .agg(sum(col("w").cast("decimal(28,12)")).cast("double").as("s"))
    val edges = edges0.join(strength, Seq("doc_a"))
    val n1 = vertices.agg(count(lit(1)).as("n"))
    var ranks = vertices.crossJoin(broadcast(n1))
      .select(col("doc_id"), (lit(1.0) / col("n")).as("r"))
    (1 to iters).foreach { _ =>
      val sums = edges
        .join(ranks, edges("doc_a") === ranks("doc_id"))
        .select(col("doc_b"),
          (col("r") * col("w") / col("s")).cast("decimal(28,18)").as("c"))
        .groupBy(col("doc_b"))
        .agg(sum(col("c")).cast("double").as("m"))
      val base = vertices.crossJoin(broadcast(n1))
      ranks = base.join(sums, base("doc_id") === sums("doc_b"), "left")
        .select(base("doc_id"),
          (lit(1.0 - damping) / col("n") +
            lit(damping) * coalesce(col("m"), lit(0.0))).as("r"))
    }
    ranks
  }

  /** EXACT bounded-radius harmonic centrality — the ground truth the
    * HyperBall sketch ([[harmonicCentralityHll]]) approximates:
    * `H(v) = Σ_{u ≠ v, d(v,u) <= maxDist} 1/d(v,u)`, reported in exact
    * ppm (`1000000 div d` per reached vertex — integers end to end, so
    * the DuckDB recursive-BFS oracle replays it bit-for-bit; Boldi &
    * Vigna 2014 motivate harmonic over closeness exactly because
    * unreachable pairs contribute 0, which a distance cap preserves).
    * Per round: one frontier ⋈ edges shuffle + one min-distance
    * aggregate, lineage truncated per round (the g9 discipline). The
    * distance table is O(V · reach) rows — tractable on near-dup/
    * similarity graphs whose components are small, and the reason the
    * SKETCH form exists for the 100 TB web graph where reach explodes.
    */
  def harmonicCentralityExact(vertices: DataFrame, pairs: DataFrame,
      maxDist: Int = 4): DataFrame = {
    require(maxDist >= 1 && maxDist <= 8,
      s"maxDist must be in [1, 8], got $maxDist")
    val edges = partitionedEdges(pairs, symmetrize = true)
    var dist = vertices.select(col("doc_id").as("v"),
      col("doc_id").as("u"), lit(0).as("d"))
    (1 to maxDist).foreach { t =>
      val step = dist.filter(col("d") === t - 1).as("p")
        .join(edges.as("e"), col("p.u") === col("e.doc_a"))
        .select(col("p.v").as("v"), col("e.doc_b").as("u"),
          lit(t).as("d"))
      dist = Dedup.truncatePublic(dist.union(step)
        .groupBy(col("v"), col("u")).agg(min(col("d")).as("d")))
    }
    val scores = dist.filter(col("d") > 0)
      .groupBy(col("v"))
      .agg(count(lit(1)).as("n_reach"),
        sum(expr("1000000 div d")).as("harmonic_ppm"))
    vertices.select(col("doc_id"))
      .join(scores, col("doc_id") === col("v"), "left")
      .select(col("doc_id"),
        coalesce(col("n_reach"), lit(0L)).as("n_reach"),
        coalesce(col("harmonic_ppm"), lit(0L)).as("harmonic_ppm"))
  }

  /** HyperBall (Boldi & Vigna WSDM'13): neighborhood-function and
    * harmonic-centrality ESTIMATION by HLL-sketch propagation — the
    * centrality that actually runs on a 100 TB-scale graph, where the
    * exact form's O(V · reach) distance table is impossible. Every
    * vertex carries an m-register HLL sketch of its ball `B(v, t)`;
    * one round is sketch_{t+1}(v) = merge(sketch_t(v), sketch_t(w) for
    * every neighbor w) — ONE edges ⋈ states shuffle plus one
    * register-max aggregate on fixed-width binary states
    * (`graft_hll_merge` — max per register is associative/commutative,
    * so the propagation is bit-deterministic on any partitioning,
    * which is what lets the g15 gate pin the REGISTER states against a
    * DuckDB replay while the float estimator on top stays spec-gated —
    * the k8 discipline). Returns per vertex the estimated reach and
    * `H(v) ≈ Σ_t (|B(v,t)| − |B(v,t−1)|)/t`, per-term clamped at 0
    * (register estimates are monotone in t by construction, but the
    * bias correction is not — the clamp keeps a shrinking correction
    * from paying negative mass).
    */
  def harmonicCentralityHll(vertices: DataFrame, pairs: DataFrame,
      maxDist: Int = 4, m: Int = 256): DataFrame = {
    val states = hyperBallStates(vertices, pairs, maxDist, m)
    val ests = states.select(col("v"), col("t"),
      call_function("graft_hll_estimate", col("st")).as("est"))
    val deltas = ests.as("c").join(ests.as("p"),
        col("c.v") === col("p.v") && col("c.t") === col("p.t") + 1)
      .select(col("c.v").as("v"), col("c.t").as("t"),
        greatest(lit(0.0), col("c.est") - col("p.est")).as("delta"))
    val h = deltas
      .groupBy(col("v"))
      .agg(sum((col("delta") / col("t").cast("double"))
        .cast("decimal(28,12)")).cast("double").as("harmonic_est"))
    val reach = ests.filter(col("t") === maxDist)
      .select(col("v"), col("est").as("n_ball_est"))
    vertices.select(col("doc_id"))
      .join(h, col("doc_id") === col("v"), "left").drop("v")
      .join(reach, col("doc_id") === col("v"), "left").drop("v")
      .select(col("doc_id"),
        coalesce(col("harmonic_est"), lit(0.0)).as("harmonic_est"),
        coalesce(col("n_ball_est"), lit(0.0)).as("n_ball_est"))
  }

  /** The HyperBall propagation itself: per vertex and round
    * `t ∈ [0, maxDist]`, the HLL register state of the ball sketch —
    * `(v, t, st)`. Shared by the estimator ([[harmonicCentralityHll]])
    * and the register-level gate digests ([[hyperBallDigests]]).
    * Per-round lineage truncation (trainer-loop discipline); release
    * scratch with `Dedup.unpersistAll()`.
    */
  def hyperBallStates(vertices: DataFrame, pairs: DataFrame,
      maxDist: Int, m: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 8,
      s"maxDist must be in [1, 8], got $maxDist")
    require(m >= 16 && m <= (1 << 16), s"m must be in [16, 65536], got $m")
    val edges = partitionedEdges(pairs, symmetrize = true)
    // graft_hll_state is an AGGREGATE (the k8 shape) — seed each
    // vertex's singleton sketch through a one-row-per-group aggregate
    var st = vertices.select(col("doc_id").as("v"))
      .groupBy(col("v"))
      .agg(call_function("graft_hll_state",
        col("v").cast("string"), lit(m)).as("st"))
    var out = st.select(col("v"), lit(0).as("t"), col("st"))
    (1 to maxDist).foreach { t =>
      val nbr = st.as("s").join(edges.as("e"), col("s.v") === col("e.doc_a"))
        .select(col("e.doc_b").as("v"), col("s.st").as("st"))
      st = Dedup.truncatePublic(st.union(nbr)
        .groupBy(col("v"))
        .agg(call_function("graft_hll_merge", col("st"), lit(m)).as("st")))
      out = out.union(st.select(col("v"), lit(t).as("t"), col("st")))
    }
    out
  }

  /** Integer register digests of the HyperBall propagation — the
    * oracle-gated face (the k8 discipline: sketch STATE is exact
    * integers and replays in SQL; the float estimator never enters an
    * oracle): per `(doc_id, t)`, the sum of the m registers and the
    * count of non-zero registers after round t.
    */
  def hyperBallDigests(vertices: DataFrame, pairs: DataFrame,
      maxDist: Int = 4, m: Int = 64): DataFrame =
    hyperBallStates(vertices, pairs, maxDist, m)
      .select(col("v").as("doc_id"), col("t"),
        call_function("graft_hll_registers", col("st")).as("regs"))
      .select(col("doc_id"), col("t"),
        expr("aggregate(regs, 0L, (a, x) -> a + x)").as("reg_sum"),
        size(filter(col("regs"), x => x > 0)).cast("long")
          .as("reg_nonzero"))
}
