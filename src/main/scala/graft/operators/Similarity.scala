package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths with one output contract (query_id, neighbor_id, sim, rank):
  *  - [[bruteForceTopK]]: exact baseline. The query set is broadcast, the
  *    corpus is scanned once, per-query top-k via window rank. Cost is
  *    O(|corpus| × |queries|) — fine for small query batches at any corpus
  *    size because the corpus side stays partition-parallel with no shuffle
  *    until the (tiny) top-k aggregation.
  *  - [[ivfTopK]]: IVF-style scale path. A deterministic centroid set
  *    partitions the corpus into `nlist` cells (one narrow shuffle, done
  *    once and reusable); queries probe only the `nprobe` nearest cells,
  *    cutting the scan by ~nlist/nprobe. Recall < 1.0 by construction —
  *    SimilaritySpec measures it against the brute-force baseline.
  *
  * All arithmetic is double-precision, strictly left-to-right `aggregate`
  * folds, so scores are bit-reproducible across engines and partitionings.
  */
object Similarity {

  /** Dot product of two float/double-array columns — the codegen'd
    * [[graft.functions.DotProduct]] expression (strict sequential fold,
    * single pass, no intermediate arrays).
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Cosine similarity — [[graft.functions.CosineSimilarity]]: dot and both
    * norms fused into one codegen'd pass. Bit-identical to the composable
    * `aggregate(zip_with(...))/(sqrt·sqrt)` form (same left-to-right
    * accumulation order), ~3× fewer array walks and zero allocation.
    */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Exact top-k neighbors for each query vector (self-matches excluded).
    * `queries` and `corpus` both need (vec_id, embedding).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    // raw float arrays go straight into the fused cosine expression —
    // per-element float→double widening is exact, and skipping the
    // asDouble transform avoids materializing a second copy of the corpus
    val q = broadcast(queries.select(
      col("vec_id").as("query_id"), col("embedding").as("qv")))
    val c = corpus.select(
      col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("sim"))
    // bounded-heap per-key top-k (graft.plans.TopKPerKey): same semantics
    // as row_number-over-window + filter, but never sorts the full scored
    // set per query — the difference between O(n log k) and a spilling
    // O(n log n) sort when the corpus side is 100 TB
    graft.plans.TopKPerKey(scored,
      Seq(col("query_id")), Seq(col("sim").desc, col("neighbor_id").asc), k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Radius (range) retrieval: every corpus vector within cosine ≥ `tau`
    * of each query — the serving primitive top-k can't express (near-dup
    * candidate pulls, dedup-aware retrieval filters, recall-safe ANN
    * ground truth). Same posture as [[bruteForceTopK]] minus the heap:
    * queries broadcast, ONE corpus pass through the fused cosine kernel,
    * a codegen'd filter at the radius — output bounded by `tau`, not by
    * a count, so no ranking stage exists at all. The low-`tau` scale
    * path is [[ivfTopKWith]]'s cell pruning with radius-aware bounds.
    *
    * Self-matches are excluded by `vec_id` equality (the
    * [[bruteForceTopK]] convention) — callers probing a corpus with a
    * DISTINCT query relation whose id space overlaps it must re-key one
    * side first, or colliding ids read as self-pairs and drop. NULL
    * `vec_id` rows never match anything (null-unsafe comparison), the
    * id-column contract every a-family operator assumes.
    */
  def radiusSearch(corpus: DataFrame, queries: DataFrame,
      tau: Double): DataFrame = {
    require(tau >= -1.0 && tau <= 1.0,
      s"radiusSearch: tau is a cosine bound in [-1, 1], got $tau")
    val q = broadcast(queries.select(
      col("vec_id").as("query_id"), col("embedding").as("qv")))
    corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("sim"))
      .filter(col("sim") >= tau)
  }

  /** Deterministic centroid choice: a hash-ordered pseudo-random sample of
    * `nlist` corpus vectors. Stands in for a k-means fit; the IVF plumbing
    * (assignment, probe-side pruning) is identical either way, and
    * determinism is what the correctness gate needs. `orderBy(...).limit`
    * compiles to TakeOrderedAndProject — per-partition top-n, no global
    * sort — so this scales to any corpus size; the window ranks only the
    * already-limited nlist rows.
    */
  def deterministicCentroids(corpus: DataFrame, nlist: Int): DataFrame = {
    val sample = corpus
      .select(col("vec_id"), asDouble(col("embedding")).as("centroid"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nlist)
    sample
      .withColumn("centroid_id", row_number().over(Window.orderBy(col("vec_id"))))
      .select(col("centroid_id"), col("centroid"))
  }

  /** Lloyd (k-means) refinement of the hash-sampled seed: each iteration
    * assigns the fit sample (hash-prefix of the corpus, ≤ [[LloydFitCap]]
    * vectors — the whole corpus below the cap) to its nearest current
    * centroid (cosine, ties on centroid_id) in ONE distributed map-only
    * pass, then recomputes cell means with decimal-summed per-dimension
    * aggregates —
    * the d7 centroid discipline, partitioning-independent. The nlist×dim
    * centroid table round-trips through the driver between iterations:
    * centroid state is O(nlist·dim) by contract (the Spark MLlib KMeans
    * discipline), and materializing it keeps each iteration exactly one
    * corpus pass — a lazy chain would re-run every round once per
    * downstream consumer of the centroid frame. Deterministic end-to-end:
    * hash-ordered seed, id-tiebroken assignment, order-insensitive decimal
    * sums. Cells left empty by an iteration keep their previous centroid,
    * so nlist never shrinks.
    */
  def lloydCentroids(corpus: DataFrame, nlist: Int, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    centroidArray(corpus, nlist, iters).toDF("centroid_id", "centroid")
  }

  /** Nearest-centroid id (1-based) against DRIVER-RESIDENT centroids as a
    * single narrow projection: an array of fused-cosine expressions over
    * literal centroid vectors, argmax via array_position (first max ⇒
    * smallest centroid_id on ties — deterministic). This is the assignment
    * step with NO join and NO shuffle: at 100 TB the alternative
    * (broadcast-join corpus × nlist then aggregate the scored pairs back
    * per vector) pushes every vector through a hash aggregate; this is a
    * map-only pass.
    */
  private[graft] def nearestCellExpr(vec: Column, cents: Seq[(Int, Seq[Double])]): Column = {
    val cs = array(cents.map { case (_, c) => cosine(vec, typedLit(c)) }: _*)
    array_position(cs, array_max(cs)).cast("int")
  }

  /** L2 twin of [[nearestCellExpr]] (argMIN of squared distance) for
    * unnormalized subspace blocks (PQ codebooks). Scores drop the
    * per-row ‖v‖² constant: ‖v−c‖² − ‖v‖² = ‖c‖² − 2⟨v,c⟩, with ‖c‖²
    * precomputed driver-side as the same strict left-to-right fold the
    * oracle's `list_dot_product(c,c)` performs — every score is
    * bit-reproducible in SQL, and first-min `array_position` ties to the
    * smallest centroid_id exactly like the oracle's
    * `ORDER BY s, centroid_id`.
    */
  private[graft] def nearestCellL2Expr(vec: Column, cents: Seq[(Int, Seq[Double])]): Column = {
    val ss = array(cents.map { case (_, c) =>
      var cc = 0.0
      var i = 0
      while (i < c.length) { cc += c(i) * c(i); i += 1 }
      lit(cc) - lit(2.0) * dot(vec, typedLit(c))
    }: _*)
    array_position(ss, array_min(ss)).cast("int")
  }

  /** Cap on the number of vectors the Lloyd fit aggregates per iteration.
    * The fit is an ESTIMATION step — centroid quality converges with the
    * sample, not the corpus — so fitting on a deterministic hash-prefix
    * sample bounds the k-means cost at O(fitCap · nlist · iters) for ANY
    * corpus size (the standard sketch: at 100 TB you never Lloyd the full
    * corpus; assignment stays a full-corpus map-only pass either way).
    * The hash-ordered prefix is the same ordering that seeds
    * [[deterministicCentroids]], so at or below the cap the sample IS the
    * corpus and results are unchanged.
    */
  val LloydFitCap = 8192

  private def centroidArray(
      corpus: DataFrame, nlist: Int, iters: Int,
      metric: String = "cosine"): Seq[(Int, Seq[Double])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    if (iters <= 0)
      return deterministicCentroids(corpus, nlist)
        .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    // orderBy(...).limit compiles to TakeOrderedAndProject (per-partition
    // top-n, no global sort); persisted because each iteration is one action
    val fit = corpus
      .select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(LloydFitCap)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the seed is the first nlist rows of the SAME hash ordering, so it is
    // read off the persisted sample — the corpus is scanned exactly once
    // for the whole fit, not once more for seeding
    var cents: Seq[(Int, Seq[Double])] =
      deterministicCentroids(fit, nlist)
        .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    var i = 0
    while (i < iters) {
      val means = fit
        .select((if (metric == "l2") nearestCellL2Expr(col("embedding"), cents)
          else nearestCellExpr(col("embedding"), cents)).as("cell"),
          posexplode(asDouble(col("embedding"))).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg((sum(col("x").cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))
        .as[(Int, Seq[Double])].collect().toMap
      // cells left empty keep their previous centroid: nlist never shrinks
      cents = cents.map { case (id, c) => (id, means.getOrElse(id, c)) }
      i += 1
    }
    fit.unpersist()
    cents
  }

  /** IVF ANN: assign corpus vectors to nearest centroid, probe the
    * `nprobe` nearest cells per query. `lloydIters` k-means rounds refine
    * the hash-sampled seed centroids (0 = raw seed) — refined cells track
    * the data distribution, so recall at a given nprobe/nlist no longer
    * depends on sample luck.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      nlist: Int = 16,
      nprobe: Int = 4,
      lloydIters: Int = 2): DataFrame =
    ivfTopKWith(
      centroidArray(corpus, nlist, math.max(0, lloydIters)),
      corpus, queries, k, nprobe)

  /** Persist a fitted centroid table. The centroids ARE the whole IVF
    * "index": cell membership is recomputed as a map-only projection at
    * query time (see [[ivfTopK]]), so the durable state is just
    * O(nlist·dim) parquet — fit once on a corpus snapshot, then serve any
    * number of query batches (and any corpus delta) against it without
    * refitting. Columns: (centroid_id int, centroid array<double>).
    */
  def saveIvfIndex(centroids: DataFrame, path: String): Unit =
    centroids.select(col("centroid_id").cast("int"), col("centroid"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  def loadIvfIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** IVF search against a PREFITTED centroid table (from
    * [[lloydCentroids]] or [[loadIvfIndex]]) — the serving path where the
    * fit is amortized across query batches.
    */
  def ivfTopKWith(
      centroids: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      nprobe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // centroid state is O(nlist·dim) by contract — driver-resident so the
    // assignment projection can inline the vectors as literals
    val centArr = centroids.select(col("centroid_id").cast("int"), col("centroid"))
      .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    ivfTopKWith(centArr, corpus, queries, k, nprobe)
  }

  private def ivfTopKWith(
      centArr: Seq[(Int, Seq[Double])],
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nprobe: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = broadcast(centArr.toDF("centroid_id", "centroid"))

    // corpus→cell assignment: one NARROW projection against the literal
    // centroids (see nearestCellExpr) — the corpus is never joined,
    // aggregated, or shuffled to learn its cell
    val c = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .withColumn("cell", nearestCellExpr(col("cv"), centArr))

    // query→nprobe cells: the query set is small by contract, a window over
    // it is negligible
    val qScored = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .join(cents)
      .select(col("query_id"), col("qv"), col("centroid_id"),
        cosine(col("qv"), col("centroid")).as("csim"))
    val q = graft.plans.TopKPerKey(qScored,
        Seq(col("query_id")), Seq(col("csim").desc, col("centroid_id").asc),
        nprobe, rankName = "crank")
      .select(col("query_id"), col("qv"), col("centroid_id").as("cell"))

    // probe: equi-join on cell — the pruning step that replaces a full
    // scan. No pair-dedup aggregate is needed (or present): every corpus
    // vector lives in EXACTLY ONE cell (nearestCellExpr is a total-order
    // argmin) and TopKPerKey emits distinct (query, cell) rows, so a
    // (query, neighbor) pair can only arrive once — an agg here would
    // add a full candidate-set shuffle to the serving path for nothing.
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("sim"))
    graft.plans.TopKPerKey(scored,
      Seq(col("query_id")), Seq(col("sim").desc, col("neighbor_id").asc), k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-pruned radius retrieval — [[radiusSearch]]'s scale path for
    * selective `tau`: candidates come only from each query's `nprobe`
    * nearest cells (the a2 probe shape — corpus cell assignment stays a
    * map-only projection against literal centroids), then the exact
    * codegen'd filter at the radius. Approximate like every
    * nprobe < nlist IVF search — a qualifying neighbor whose cell is
    * not probed is missed; at nprobe = nlist the candidate set is the
    * full corpus and the result equals [[radiusSearch]] EXACTLY (the
    * a2p full-probe gate shape). Self-pair and NULL-id semantics follow
    * [[radiusSearch]].
    */
  def ivfRadius(
      corpus: DataFrame,
      queries: DataFrame,
      tau: Double,
      nlist: Int = 16,
      nprobe: Int = 4,
      lloydIters: Int = 2): DataFrame =
    ivfRadiusWith(centroidArray(corpus, nlist, math.max(0, lloydIters)),
      corpus, queries, tau, nprobe)

  /** [[ivfRadius]] against a PREFITTED centroid table (from
    * [[lloydCentroids]] or [[loadIvfIndex]]) — the serving path where
    * the fit is amortized across query batches (the [[ivfTopKWith]]
    * discipline).
    */
  def ivfRadiusWith(
      centroids: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      tau: Double,
      nprobe: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centArr = centroids.select(col("centroid_id").cast("int"), col("centroid"))
      .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    ivfRadiusWith(centArr, corpus, queries, tau, nprobe)
  }

  private def ivfRadiusWith(
      centArr: Seq[(Int, Seq[Double])],
      corpus: DataFrame,
      queries: DataFrame,
      tau: Double,
      nprobe: Int): DataFrame = {
    require(tau >= -1.0 && tau <= 1.0,
      s"ivfRadius: tau is a cosine bound in [-1, 1], got $tau")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = broadcast(centArr.toDF("centroid_id", "centroid"))
    val c = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .withColumn("cell", nearestCellExpr(col("cv"), centArr))
    val qScored = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .join(cents)
      .select(col("query_id"), col("qv"), col("centroid_id"),
        cosine(col("qv"), col("centroid")).as("csim"))
    val q = graft.plans.TopKPerKey(qScored,
        Seq(col("query_id")), Seq(col("csim").desc, col("centroid_id").asc),
        nprobe, rankName = "crank")
      .select(col("query_id"), col("qv"), col("centroid_id").as("cell"))
    // single-cell assignment + distinct probed cells ⇒ each (query,
    // neighbor) pair arrives exactly once (see ivfTopKWith) — the radius
    // path stays one map-side filter with NO extra exchange.
    c.join(broadcast(q), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("sim"))
      .filter(col("sim") >= tau)
  }

  /** SemDeDup-shaped semantic dedup: Lloyd centroids partition the
    * embedding space, each vector joins its nearest cell in a MAP-ONLY
    * projection (no join/shuffle to learn the cell — the IVF assignment
    * discipline), and exact cosine runs only WITHIN a cell. At scale
    * `nlist` grows with the corpus so cells stay bounded, and `maxCell`
    * hard-bounds the pair stage regardless (vectors in oversize cells
    * keep rep = self — the d6 cap contract). Output: (vec_id, cell, rep)
    * with rep = min vec_id among the vector's within-cell neighbors at
    * cosine ≥ `tau` (self if none).
    *
    * `saveCellsPath` persists the fitted cell table (centroids-as-data)
    * so an external engine — or a later serving run — can replay the
    * assignment and pair predicate from the identical doubles.
    */
  def semanticDedup(
      embs: DataFrame,
      nlist: Int = 16,
      lloydIters: Int = 2,
      tau: Double = 0.95,
      maxCell: Int = 4096,
      saveCellsPath: Option[String] = None): DataFrame = {
    val cents = lloydCentroids(
      embs.select(col("vec_id"), col("embedding")), nlist, lloydIters)
    saveCellsPath.foreach(saveIvfIndex(cents, _))
    semanticDedupWith(cents, embs, tau, maxCell)
  }

  /** Semantic dedup against a PREFITTED cell table (from
    * [[lloydCentroids]] or [[loadIvfIndex]]) — the serving path that
    * mirrors [[ivfTopKWith]]: fit once on a corpus snapshot, persist the
    * O(nlist·dim) cell parquet, then any later run (or JVM) replays the
    * map-only assignment and within-cell pair predicate from the
    * identical doubles without refitting.
    */
  def semanticDedupWith(
      cells: DataFrame,
      embs: DataFrame,
      tau: Double = 0.95,
      maxCell: Int = 4096): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val centArr = cells.select(col("centroid_id").cast("int"), col("centroid"))
      .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    val v = embs.select(col("vec_id"), col("embedding"))
      .withColumn("cell", nearestCellExpr(col("embedding"), centArr))
    val bw = Window.partitionBy(col("cell"))
    val bounded = v.withColumn("bsz", count(lit(1)).over(bw))
      .filter(col("bsz") <= maxCell)
      .drop("bsz")
    val l = bounded.alias("l")
    val r = bounded.alias("r")
    val pairs = l.join(r,
        col("l.cell") === col("r.cell") && col("l.vec_id") < col("r.vec_id"))
      .filter(cosine(col("l.embedding"), col("r.embedding")) >= tau)
      .select(col("l.vec_id").as("i"), col("r.vec_id").as("j"))
    v.join(pairs, v("vec_id") === pairs("j"), "left")
      .groupBy(v("vec_id"), v("cell"))
      .agg(coalesce(min(col("i")), first(v("vec_id"))).as("rep"))
      .select(col("vec_id"), col("cell"), col("rep"))
      .orderBy(col("vec_id"))
  }

  /** kNN majority-vote labeling (the v6 query's operator form, one
    * definition for the query, the spec, and the `graft_knn_label`
    * TVF): each query takes the modal label of its k nearest corpus
    * neighbors by cosine, ties to the smaller label — a total order,
    * so the vote is deterministic. Composes the gate-checked
    * brute-force top-k with a per-key vote aggregate; the winner is
    * selected by TopKPerKey k=1, not a window, so no per-query sort
    * materializes at any corpus size. `corpus` must carry
    * (vec_id, embedding, label). Output (query_id, pred_label, votes).
    */
  def knnLabel(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val knn = bruteForceTopK(corpus, queries, k = k)
    val lbl = corpus.select(col("vec_id").as("neighbor_id"), col("label"))
    val votes = knn.join(lbl, Seq("neighbor_id"))
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    graft.plans.TopKPerKey(votes, Seq(col("query_id")),
        Seq(col("votes").desc, col("label").asc), 1)
      .select(col("query_id"), col("label").as("pred_label"), col("votes"))
  }

  // ---- Incremental index maintenance ------------------------------------

  /** Map-only cell assignment of `vectors` against a PREFITTED centroid
    * table — the APPEND half of incremental IVF maintenance: a new
    * crawl drop joins the index by assignment alone (no refit, no
    * shuffle, no job against the already-indexed base), so the
    * persisted index artifact (centroids + assignment parquet) grows
    * append-only between refits. Identical argmax/tie semantics to the
    * fit-time assignment ([[nearestCellExpr]]: first max ⇒ smallest
    * centroid_id), so appending a drop yields bit-for-bit what a full
    * re-assignment of base ∪ drop would emit for those rows — the
    * invariant the append contract rests on, pinned in SimilaritySpec.
    */
  def ivfAssign(cells: DataFrame, vectors: DataFrame): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val centArr = cells.select(col("centroid_id").cast("int"), col("centroid"))
      .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    vectors.select(col("vec_id"), col("embedding"))
      .withColumn("cell", nearestCellExpr(col("embedding"), centArr))
      .select(col("vec_id"), col("cell"))
  }

  /** TAKEDOWN on the IVF member table — remove revoked vectors from the
    * persisted `(vec_id, cell)` assignment relation: ONE anti equi join
    * on `vec_id`, no corpus read, centroids untouched. Bit-identical to
    * re-assigning the surviving corpus against the SAME persisted
    * centroids ([[ivfAssign]] is per-row — one vector's cell never
    * depends on another's; IndexDeleteSpec pins the equality). Centroid
    * REFIT after heavy deletion is a separate, drift-gated maintenance
    * decision — the [[ivfMaintain]]/[[ivfPartialRefit]] channel, exactly
    * as for appends (the frozen-index contract: a9/d19).
    */
  def ivfMembersDelete(members: DataFrame, revoked: DataFrame): DataFrame =
    members.join(revoked.select(col("vec_id")), Seq("vec_id"), "left_anti")

  /** MERGE a drop into the IVF member table — the a9 append written to
    * the persisted store: the drop assigns against the FROZEN centroids
    * ([[ivfAssign]]'s map-only projection) and unions in; bit-identical
    * to re-assigning base ∪ drop for disjoint vec_ids (assignment is
    * per-row). Centroid refit under drift stays the
    * [[ivfPartialRefit]] channel.
    */
  def ivfMembersMerge(cells: DataFrame, members: DataFrame,
      drop: DataFrame): DataFrame =
    members.unionByName(ivfAssign(cells, drop))

  /** Per-cell drift of an incoming drop against the PERSISTED
    * centroids — v8's centroid-drift measure turned into index
    * maintenance: for every index cell, the cosine between the stored
    * centroid and the decimal-summed mean of the drop members assigned
    * to it (the d7/v8 partitioning-independent mean discipline; all
    * double products route through decimal(28,12) so the doubles
    * replay exactly in SQL). A LOW cosine means the vectors now
    * landing in the cell no longer look like the centroid that claims
    * them — the refit signal. Output `(cell, n_new, cos)` for every
    * cell; `n_new = 0, cos` null where the drop left the cell empty.
    * One map-only assignment pass + O(nlist·dim) aggregates.
    */
  def ivfDrift(cells: DataFrame, drop: DataFrame): DataFrame = {
    val spark = drop.sparkSession
    import spark.implicits._
    val centArr = cells.select(col("centroid_id").cast("int"), col("centroid"))
      .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    val assigned = drop.select(col("vec_id"), col("embedding"))
      .withColumn("cell", nearestCellExpr(col("embedding"), centArr))
    val mu = assigned
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"))
      .agg(
        (sum(col("x").cast("double").cast("decimal(28,12)")).cast("double")
          / count(lit(1))).as("mu"),
        count(lit(1)).as("n"))
    val ce = cells.select(col("centroid_id").cast("int").as("cell"),
      posexplode(col("centroid")).as(Seq("pos", "c")))
    val drift = mu.join(ce, Seq("cell", "pos"))
      .groupBy(col("cell"))
      .agg(max(col("n")).as("n_new"),
        sum((col("mu") * col("c")).cast("decimal(28,12)"))
          .cast("double").as("dot"),
        sum((col("mu") * col("mu")).cast("decimal(28,12)"))
          .cast("double").as("mm"),
        sum((col("c") * col("c")).cast("decimal(28,12)"))
          .cast("double").as("cc"))
      .select(col("cell"), col("n_new"),
        (col("dot") / (sqrt(col("mm")) * sqrt(col("cc")))).as("cos"))
    cells.select(col("centroid_id").cast("int").as("cell"))
      .join(drift, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("n_new"), lit(0L)).as("n_new"),
        col("cos"))
  }

  /** Drift-triggered refit monitor: keep serving the persisted index
    * while the drop still tracks the fitted distribution; refit on
    * base ∪ drop when any populated cell's drift cosine falls below
    * `minCos`. Returns `(cells', refitted)` — unchanged centroids and
    * `false` when the index survives. This is a MAINTENANCE job (runs
    * once per ingested drop, not per query), so the O(nlist) decision
    * aggregate is a deliberate driver action — unlike the lazy hits
    * guard, it gates a side-effecting refit, not a query plan.
    */
  def ivfMaintain(cells: DataFrame, corpus: DataFrame, drop: DataFrame,
      nlist: Int, iters: Int = 2, minCos: Double = 0.98)
      : (DataFrame, Boolean) = {
    val worst = ivfDrift(cells, drop)
      .filter(col("n_new") > 0)
      .agg(coalesce(min(col("cos")), lit(1.0)).as("w"))
      .head().getDouble(0)
    if (worst < minCos)
      (lloydCentroids(
        corpus.select(col("vec_id"), col("embedding"))
          .union(drop.select(col("vec_id"), col("embedding"))),
        nlist, iters), true)
    else (cells, false)
  }

  /** Drift-triggered PARTIAL refit — the maintenance action
    * [[ivfMaintain]]'s full refit is too blunt for: when a drop's drift
    * signal ([[ivfDrift]] — the a9 measure) condemns only a FEW cells,
    * re-Lloyd just those. Cells whose drift cosine against the drop
    * mean falls below `minCos` (and that the drop actually touched) are
    * AFFECTED; their replacement centroids come from one Lloyd fit of
    * k = |affected| centroids over the hash-prefix sample of the
    * base ∪ drop vectors currently ASSIGNED to the affected cells (a
    * map-only filter against the frozen centroids — the fit never sees
    * the healthy cells' vectors and costs O(LloydFitCap · k · iters)
    * regardless of corpus size). Healthy centroids pass through
    * UNTOUCHED, which is what preserves every healthy cell's serving
    * behavior bit-for-bit (spec-pinned) — a full refit would move all
    * nlist centroids and invalidate the whole member table.
    *
    * Output: the new centroid table `(centroid_id, centroid, refit)` —
    * same ids, affected rows replaced and flagged. New centroid i (in
    * fit order) takes the i-th affected id (both sorted — a
    * deterministic relabeling); a fit yielding fewer centroids than
    * affected cells (degenerate tiny sample) leaves the tail's old
    * centroids in place, the lloydCentroids empty-cell contract. No
    * drifted cell ⇒ all rows pass through with `refit = false` (serve
    * on — the [[ivfMaintain]] decision shape).
    *
    * The O(nlist) drift decision is a deliberate driver action, exactly
    * like [[ivfMaintain]]: this is a per-drop MAINTENANCE job gating a
    * side-effecting refit, not a query plan.
    */
  def ivfPartialRefit(cells: DataFrame, corpus: DataFrame, drop: DataFrame,
      minCos: Double = 0.98, iters: Int = 2): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val centArr = cells.select(col("centroid_id").cast("int"), col("centroid"))
      .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    val affected = ivfDrift(cells, drop)
      .filter(col("n_new") > 0 && col("cos") < minCos)
      .select(col("cell")).as[Int].collect().toSeq.sorted
    if (affected.isEmpty)
      return centArr.map { case (id, c) => (id, c, false) }
        .toDF("centroid_id", "centroid", "refit")
    val sample = corpus.select(col("vec_id"), col("embedding"))
      .unionByName(drop.select(col("vec_id"), col("embedding")))
      .filter(nearestCellExpr(col("embedding"), centArr)
        .isin(affected.map(Int.box): _*))
    val fitted = lloydCentroids(sample, nlist = affected.size, iters)
      .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
      .map(_._2)
    val newById = affected.zip(fitted).toMap
    centArr.map { case (id, c) =>
      newById.get(id) match {
        case Some(nc) => (id, nc, true)
        case None => (id, c, false)
      }
    }.toDF("centroid_id", "centroid", "refit")
  }

  /** The reassignment half of [[ivfPartialRefit]] — ONE map-only pass,
    * gated on cell id: each vector's FROZEN cell computes against the
    * old centroids (the same narrow projection as [[ivfAssign]]); a
    * vector whose frozen cell was refit re-scores against ONLY the
    * refit centroids and moves to the best of them (containment: the
    * healthy cells' membership is untouched, so their serving behavior
    * is bit-identical — the property that makes the refit PARTIAL); a
    * vector in a healthy cell keeps its assignment unread. Output
    * `(vec_id, old_cell, cell)`. No join, no shuffle — at 100 TB this
    * is the same single-pass cost as the original assignment, paid only
    * once per refit.
    */
  def ivfReassignAfterRefit(oldCells: DataFrame, refitCells: DataFrame,
      vectors: DataFrame): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val oldArr = oldCells.select(col("centroid_id").cast("int"), col("centroid"))
      .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    val refitArr = refitCells
      .filter(col("refit"))
      .select(col("centroid_id").cast("int"), col("centroid"))
      .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    val base = vectors.select(col("vec_id"), col("embedding"))
      .withColumn("old_cell", nearestCellExpr(col("embedding"), oldArr))
    if (refitArr.isEmpty)
      return base.select(col("vec_id"), col("old_cell"),
        col("old_cell").as("cell"))
    val refitIds = refitArr.map(_._1)
    // nearestCellExpr returns the 1-based POSITION in the given list;
    // over the refit SUBSET that position remaps through the sorted id
    // array (first-max tie ⇒ smallest position ⇒ smallest id, the
    // ivfAssign determinism contract)
    val newCell = element_at(typedLit(refitIds),
      nearestCellExpr(col("embedding"), refitArr))
    base.select(col("vec_id"), col("old_cell"),
      when(col("old_cell").isin(refitIds.map(Int.box): _*), newCell)
        .otherwise(col("old_cell")).as("cell"))
  }

  /** Drift-triggered PARTIAL PQ codebook refit — [[ivfPartialRefit]]'s
    * discipline moved to the quantizer, the action v12's distortion
    * monitor could only signal: a subspace is STALE when the arriving
    * drop's reconstruction MSE against its codebook exceeds
    * `mseRatio` × the base corpus's (both via [[pqDistortion]]'s exact
    * decimal-routed SSE — a subspace whose codebook still fits the
    * drop has ratio ≈ 1); ONLY stale subspaces re-fit, on the
    * hash-prefix-capped sample of the base ∪ drop SLICED blocks (the
    * [[fitPq]] machinery with m = 1 — the fit never reads healthy
    * subspaces' dims and costs O(LloydFitCap·k·iters) regardless of
    * corpus size). Healthy codebooks pass through BIT-IDENTICAL, which
    * preserves every untouched subspace's codes and ADC behavior
    * exactly (spec-pinned) — a full refit would invalidate all m code
    * columns corpus-wide.
    *
    * Output: the persistable codebook table `(sub, centroid_id,
    * centroid, refit)` — same shape the pq_model parquet serves, with
    * affected books replaced and flagged; no stale subspace ⇒ all rows
    * pass through `refit = false` (serve on — the [[ivfMaintain]]
    * decision shape). The O(m) drift decision is a deliberate driver
    * action: a per-drop MAINTENANCE job gating a side-effecting refit,
    * not a query plan.
    */
  def pqPartialRefit(model: PqModel, corpus: DataFrame, drop: DataFrame,
      mseRatio: Double = 4.0, iters: Int = 2): DataFrame = {
    require(mseRatio > 0.0, s"mseRatio must be positive, got $mseRatio")
    val spark = corpus.sparkSession
    import spark.implicits._
    val centRows = for {
      (book, sub) <- model.books.zipWithIndex
      (cid, c) <- book
    } yield (sub, cid, c)
    val cents = centRows.toDF("sub", "code", "centroid")
    def mseBySub(df: DataFrame): Map[Int, Double] =
      pqDistortion(df, model, cents)
        .select(col("sub").cast("int"), col("mse"))
        .as[(Int, Double)].collect().toMap
    val baseMse = mseBySub(corpus)
    val dropMse = mseBySub(drop)
    val stale = (0 until model.m).filter { sub =>
      val b = baseMse.getOrElse(sub, 0.0)
      val d = dropMse.getOrElse(sub, 0.0)
      // a perfectly-quantized base (b = 0) with any drop error is the
      // extreme of the same drift; otherwise the ratio test
      if (b == 0.0) d > 0.0 else d > mseRatio * b
    }.toSet
    val all = corpus.select(col("vec_id"), col("embedding"))
      .unionByName(drop.select(col("vec_id"), col("embedding")))
    val refitBooks: Map[Int, Seq[(Int, Seq[Double])]] = stale.map { sub =>
      val sliced = all.select(col("vec_id"),
        slice(asDouble(col("embedding")), sub * model.dsub + 1, model.dsub)
          .as("embedding"))
      sub -> fitPq(sliced, model.dsub, m = 1, k = model.books(sub).size,
        iters = iters).books.head
    }.toMap
    val out = for {
      (book, sub) <- model.books.zipWithIndex
      (cid, c) <- refitBooks.getOrElse(sub, book)
    } yield (sub, cid, c, stale.contains(sub))
    out.toDF("sub", "centroid_id", "centroid", "refit")
  }

  /** The re-encode half of [[pqPartialRefit]] — ONE map-only pass,
    * gated per subspace (the [[ivfReassignAfterRefit]] shape): every
    * block's OLD code computes against the old books; a block whose
    * subspace was refit re-scores against ONLY its refit book (the
    * old-code expression is never re-evaluated for healthy subspaces —
    * their codes are bit-identical by construction, the containment
    * the spec pins). Output `(vec_id, sub, old_code, code)` — long
    * form, m rows per vector; no join, no shuffle, the same
    * single-pass cost as the original encode, paid once per refit.
    */
  def pqReencodeAfterRefit(oldModel: PqModel, refitTable: DataFrame,
      vectors: DataFrame): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val refitRows = refitTable
      .select(col("sub").cast("int"), col("centroid_id").cast("int"),
        col("centroid"), col("refit"))
      .as[(Int, Int, Seq[Double], Boolean)].collect().toSeq
    val staleSubs = refitRows.filter(_._4).map(_._1).toSet
    val newBooks: Map[Int, Seq[(Int, Seq[Double])]] = refitRows
      .filter(r => staleSubs.contains(r._1))
      .groupBy(_._1)
      .map { case (sub, rs) =>
        sub -> rs.sortBy(_._2).map(r => (r._2, r._3))
      }
    val m = oldModel.m
    val dsub = oldModel.dsub
    def block(sub: Int): Column =
      slice(asDouble(col("embedding")), sub * dsub + 1, dsub)
    // the argmins live in their OWN Project (the pqSubspaceErrors / v12
    // discipline): inside the posexplode's element list they compile
    // into the Generate's doConsume, which whole-stage codegen cannot
    // method-split — up to 2m fused argmins there blow the JVM's 64 KB
    // method limit and the re-encode pass silently drops to interpreted
    // eval. A Project splits per-expression; the Generate then carries
    // only column refs.
    val codeCols = (0 until m).flatMap { sub =>
      val newC =
        if (staleSubs.contains(sub))
          nearestCellL2Expr(block(sub), newBooks(sub))
        else lit(null).cast("int")
      Seq(nearestCellL2Expr(block(sub), oldModel.books(sub)).as(s"oldc$sub"),
        newC.as(s"newc$sub"))
    }
    val pairCols = (0 until m).map { sub =>
      struct(col(s"oldc$sub").as("oldc"), col(s"newc$sub").as("newc"))
    }
    vectors
      .select(col("vec_id") +: codeCols: _*)
      .select(col("vec_id"), posexplode(array(pairCols: _*))
        .as(Seq("sub", "cc")))
      .select(col("vec_id"), col("sub"), col("cc.oldc").as("old_code"),
        coalesce(col("cc.newc"), col("cc.oldc")).as("code"))
  }

  // ---- Product quantization ---------------------------------------------

  /** Fitted PQ codebooks: `m` subspaces of `dsub` dims, each with its own
    * L2-Lloyd centroid list. O(m·k·dsub) driver state — the
    * Lloyd-centroid / BPE-table discipline.
    */
  final case class PqModel(m: Int, dsub: Int, books: Seq[Seq[(Int, Seq[Double])]])

  /** Product-quantization fit [Jégou et al., TPAMI'11]: split the `dim`
    * dimensions into `m` contiguous subspaces and Lloyd-fit `k` centroids
    * per subspace (L2 metric — blocks are unnormalized) on the capped
    * hash-prefix sample. Vectors then compress from dim·4 bytes to m
    * single-byte codes (k ≤ 256) — the codebook an ANN serving tier pairs
    * with the IVF index. Each subspace fit reuses the [[lloydCentroids]]
    * machinery on the SLICED block, so cost is bounded at
    * O(fitCap · k · iters · m) for any corpus size.
    */
  def fitPq(corpus: DataFrame, dim: Int, m: Int, k: Int, iters: Int): PqModel = {
    require(m >= 1 && dim % m == 0,
      s"dim=$dim must split evenly into m=$m subspaces")
    require(k >= 1 && k <= 256, s"k=$k codes must fit one byte")
    val spark = corpus.sparkSession
    import spark.implicits._
    val dsub = dim / m
    // ONE shared hash-prefix sample for all m subspace fits (slicing
    // commutes with sampling, so each book is bit-identical to the
    // per-subspace-sampled form this replaces — but the corpus is
    // scanned once, not m times, and the whole fit is O(m + iters)
    // driver-synchronized jobs instead of O(m · iters))
    val fit = corpus
      .select(col("vec_id"), asDouble(col("embedding")).as("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(LloydFitCap)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // all m seed books from ONE collect: the first k sample rows in hash
    // order, ids ranked by vec_id, sliced per subspace driver-side —
    // exactly what deterministicCentroids(slicedFit, k) computes per
    // subspace (slicing preserves vec_id and the hash order), in 1 job
    // instead of m
    val seedRows = fit
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(k)
      .as[(Long, Seq[Double])].collect().toSeq
      .sortBy(_._1).zipWithIndex
      .map { case ((_, v), i) => (i + 1, v) }
    var books: Seq[Seq[(Int, Seq[Double])]] = (0 until m).map { sub =>
      seedRows.map { case (id, v) =>
        (id, v.slice(sub * dsub, (sub + 1) * dsub))
      }
    }
    var i = 0
    while (i < iters) {
      // one pass per iteration over the persisted sample covering ALL
      // subspaces: each row explodes into its m (sub, cell, block)
      // assignments against that subspace's current literal codebook;
      // per-(sub, cell, pos) decimal means are order-insensitive, so
      // the fused job reproduces the sequential fit bit-for-bit.
      // The argmins live in their OWN Project (the pqSubspaceErrors /
      // v12 discipline): inside the explode's element list they compile
      // into the Generate's doConsume, which whole-stage codegen cannot
      // method-split — m fused argmins there blow the JVM's 64 KB
      // method limit and the whole fit stage silently drops to
      // interpreted eval (measured: the janino compile fails AFTER
      // emitting ~12k lines, once per iteration per model — the opq/pq
      // fit channel paid 100+ s of driver compile-and-fail).
      val cellCols = (0 until m).map { sub =>
        nearestCellL2Expr(
          slice(col("embedding"), sub * dsub + 1, dsub), books(sub))
          .as(s"cell$sub")
      }
      val perSub = (0 until m).map { sub =>
        struct(lit(sub).as("sub"), col(s"cell$sub").as("cell"),
          slice(col("embedding"), sub * dsub + 1, dsub).as("block"))
      }
      val means = fit.select(col("embedding") +: cellCols: _*)
        .select(explode(array(perSub: _*)).as("e"))
        .select(col("e.sub").as("sub"), col("e.cell").as("cell"),
          posexplode(col("e.block")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("cell"), col("pos"))
        .agg((sum(col("x").cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("mn"))
        .groupBy(col("sub"), col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
          s => s.getField("mn")).as("centroid"))
        .as[(Int, Int, Seq[Double])].collect()
        .groupBy(_._1).map { case (sub, rows) =>
          sub -> rows.map(t => t._2 -> t._3).toMap
        }
      books = books.zipWithIndex.map { case (book, sub) =>
        book.map { case (id, c) =>
          (id, means.get(sub).flatMap(_.get(id)).getOrElse(c))
        }
      }
      i += 1
    }
    fit.unpersist()
    PqModel(m, dsub, books)
  }

  /** PQ encoding: per subspace, the 1-based id of the L2-nearest codebook
    * centroid — `m` narrow [[nearestCellL2Expr]] projections, one map-only
    * pass, no join and no shuffle (the assignment discipline). Output:
    * (vec_id, c0..c{m-1}).
    */
  def pqEncode(corpus: DataFrame, model: PqModel): DataFrame = {
    val codeCols = model.books.zipWithIndex.map { case (cents, sub) =>
      nearestCellL2Expr(
        slice(asDouble(col("embedding")), sub * model.dsub + 1, model.dsub),
        cents).as(s"c$sub")
    }
    corpus.select(col("vec_id") +: codeCols: _*)
  }

  /** Per-(subspace, vector) PQ reconstruction error `(sub, err)` in ONE
    * fused map-only corpus pass: the code assignment (the same
    * [[nearestCellL2Expr]] projections [[pqEncode]] uses) and the block
    * slice ride the same row, so no codes⋈vectors self-join exists —
    * which is also what lets a STREAMING source run the identical chain
    * (a stream cannot self-join on vec_id). `cells` is the persisted
    * codebook relation `(sub, code, centroid)` — O(m·k), broadcast; the
    * error routes through the engine-shared identity
    * ‖b−c‖² = b·b − 2·b·c + c·c (three fused graft_dot folds, the a3/a4
    * discipline, so DuckDB replays the doubles bit-for-bit).
    */
  def pqSubspaceErrors(corpus: DataFrame, model: PqModel,
      cells: DataFrame): DataFrame = {
    // the argmin projections live in their OWN Project, a3's shape: an
    // expensive expression inside a Generate's element list lands in
    // the explode's doConsume, which whole-stage codegen cannot
    // method-split — 8 fused argmins there blew the JVM's 64 KB method
    // limit and the stage silently fell back to interpreted eval. A
    // Project splits per-expression; the Generate then carries only
    // column refs and cheap slices.
    val codeCols = (0 until model.m).map { sub =>
      nearestCellL2Expr(
        slice(col("v"), sub * model.dsub + 1, model.dsub),
        model.books(sub)).as(s"code$sub")
    }
    val perSub = (0 until model.m).map { sub =>
      struct(lit(sub).as("sub"), col(s"code$sub").as("code"),
        slice(col("v"), sub * model.dsub + 1, model.dsub).as("b"))
    }
    corpus
      .select(col("embedding").cast("array<double>").as("v"))
      .select(col("v") +: codeCols: _*)
      .select(explode(array(perSub: _*)).as("e"))
      .select(col("e.sub").as("sub"), col("e.code").as("code"),
        col("e.b").as("b"))
      .join(broadcast(cells.select(col("sub"), col("code"), col("centroid"))),
        Seq("sub", "code"))
      .select(col("sub"),
        (dot(col("b"), col("b"))
          - lit(2) * dot(col("b"), col("centroid"))
          + dot(col("centroid"), col("centroid"))).as("err"))
  }

  /** Per-subspace PQ codebook health `(sub, n_vecs, sse, mse)` — the
    * reconstruction-error monitor behind every quantized serving tier
    * (the PQ analogue of [[ivfDrift]]; a subspace whose MSE drifts up
    * after an ingest is a stale codebook). One fused error pass
    * ([[pqSubspaceErrors]]) + one map-combinable decimal-routed
    * aggregate; output O(m) rows at any corpus size. The v12 serving
    * query and the `EventsStream.pqDistortionStream` continuous twin
    * both sit on [[pqSubspaceErrors]], so streaming ≡ batch reduces to
    * the decimal-sum replay.
    */
  def pqDistortion(corpus: DataFrame, model: PqModel,
      cells: DataFrame): DataFrame =
    pqSubspaceErrors(corpus, model, cells)
      .groupBy(col("sub"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("err").cast("decimal(28,12)")).cast("double").as("sse"))
      .withColumn("mse", col("sse") / col("n_vecs"))

  /** PQ asymmetric-distance top-k (ADC serving): for each query, the k
    * corpus vectors with the smallest code-approximated L2 distance,
    * computed WITHOUT touching corpus vectors — only their m one-byte
    * codes. The per-query lookup table (m·k entries: ‖c‖² − 2⟨q_block,c⟩,
    * the per-query-constant-dropped ‖q_block − c‖²) is built driver-side
    * from the bounded query batch and broadcast; scoring is one equi join
    * on (sub, code) plus a decimal-routed sum per (query, vec) — order-
    * insensitive, so the gate is exact — and winners come from the
    * bounded-heap [[graft.plans.TopKPerKey]], never a full sort. At
    * 100 TB this is the PQ serving contract: the scan reads m bytes per
    * vector instead of dim·4.
    */
  /** Per-query ADC lookup table: for every (query, subspace, code) the
    * per-query-constant-dropped ‖q_block − c‖² = ‖c‖² − 2⟨q_block, c⟩,
    * with both terms the same strict left-to-right fold the oracle's
    * `list_dot_product` performs. O(\|queries\|·m·k) driver rows — the
    * bounded-query-batch contract shared by [[pqAdcTopK]] and
    * [[ivfPqTopK]].
    */
  private def adcLut(
      queries: DataFrame, model: PqModel): Seq[(Long, Int, Int, Double)] = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qs = queries
      .select(col("vec_id"), asDouble(col("embedding")))
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    for {
      (qid, qv) <- qs
      (book, sub) <- model.books.zipWithIndex
      (cid, c) <- book
    } yield {
      var cc = 0.0
      var i = 0
      while (i < c.length) { cc += c(i) * c(i); i += 1 }
      var dp = 0.0
      i = 0
      while (i < c.length) { dp += qv(sub * model.dsub + i) * c(i); i += 1 }
      (qid, sub, cid, cc - 2.0 * dp)
    }
  }

  def pqAdcTopK(
      queries: DataFrame,
      codes: DataFrame,
      model: PqModel,
      k: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val lut = adcLut(queries, model)
    val long = codes.select(col("vec_id"), posexplode(
      array((0 until model.m).map(i => col(s"c$i")): _*)).as(Seq("sub", "code")))
    val scored = long
      .join(broadcast(lut.toDF("query_id", "sub", "code", "s")), Seq("sub", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("s").cast("decimal(28,12)")).cast("double").as("adist"))
    graft.plans.TopKPerKey(scored,
        Seq(col("query_id")), Seq(col("adist").asc, col("vec_id").asc), k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("adist"), col("rank"))
  }

  /** Two-stage retrieval: ADC shortlist + exact re-rank (the FAISS
    * "refine" deployment shape, IndexRefineFlat): the compressed m-byte
    * codes propose `shortlist` candidates per query through
    * [[pqAdcTopK]]'s LUT join + bounded heap, then the TRUE cosine on
    * the shortlist members' FULL vectors re-ranks to the served top
    * `k`. This is how production ANN spends its IO budget: the
    * quantized scan touches m bytes/vector corpus-wide, and full
    * vectors are read for only |queries|·shortlist rows — the
    * candidate and query frames are both bounded, so they BROADCAST
    * onto one corpus scan (no corpus shuffle, no self-join).
    *
    * Exactness: the shortlist is deterministic (decimal-routed adist,
    * ties to the smaller vec_id — the a4 gate), and the re-rank runs
    * the fused a1-gated cosine kernel with the (sim desc, neighbor_id
    * asc) total order — so the whole composition hash-gates end to end
    * GIVEN the persisted codebooks, unlike recall-bet ANN. Re-ranking
    * can only surface true neighbors the quantizer already shortlisted;
    * recall vs exact top-k stays spec-measured (the a2 discipline).
    */
  def adcRerankTopK(corpus: DataFrame, codes: DataFrame, model: PqModel,
      queries: DataFrame, shortlist: Int = 25, k: Int = 5): DataFrame = {
    require(k >= 1 && shortlist >= k,
      s"need shortlist >= k >= 1, got shortlist=$shortlist k=$k")
    val cand = pqAdcTopK(queries, codes, model, shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"))
    val scored = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
      .join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("nv")).as("sim"))
    graft.plans.TopKPerKey(scored, Seq(col("query_id")),
        Seq(col("sim").desc, col("neighbor_id").asc), k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Parametric OPQ state: the PERMUTED rotation rows `(w_r, c_r)` in
    * output-dimension order (component vector + precomputed mean
    * offset — the v4p model-as-data shape) plus the PQ codebooks fitted
    * in the rotated space. O(dim² + m·k·dsub) driver state.
    */
  final case class OpqModel(
      rotation: Seq[(Seq[Double], Double)], pq: PqModel)

  /** Parametric Optimized Product Quantization [Ge et al., CVPR'13
    * §4, OPQ_P]: rotate by the full PCA eigenbasis, then PERMUTE the
    * eigen-dimensions into `m` buckets balancing the per-bucket
    * eigenvalue log-products (the paper's closed-form solution under
    * the Gaussian assumption — variance spread ACROSS subspaces is
    * what plain PQ cannot exploit, because each codebook only sees its
    * own slice), then fit the PQ codebooks in the rotated space. The
    * rotation is orthogonal plus a mean shift, so L2 distances are
    * PRESERVED — ADC in the rotated space ranks exactly like ADC on
    * the originals would with a better quantizer. Fit = one [[fitPca]]
    * (sample-capped covariance + Jacobi) + a deterministic O(dim log
    * dim) driver assignment + one [[fitPq]] on the map-only rotated
    * frame; serving reuses the a4 machinery verbatim on rotated
    * columns (the projection is the fused v4p dot kernel — codegen'd,
    * zero shuffle).
    */
  def fitOpqParametric(embs: DataFrame, dim: Int, m: Int, k: Int,
      iters: Int, fitCap: Int = PcaFitCap): OpqModel = {
    val rows = fitOpqRotation(embs, dim, m, fitCap)
    OpqModel(rows, fitPq(rotateFrame(embs, rows), dim, m, k, iters))
  }

  /** The rotation half of [[fitOpqParametric]] alone — the permuted
    * eigenbasis rows `(w_r, c_r)`, exposed so the OPQ+IVF+PQ stack
    * (a13) can fit its coarse quantizer and residual codebooks in the
    * SAME rotated space the a12 flat form uses (the FAISS
    * OPQ-pretransform posture: one rotation trained on the raw corpus,
    * shared by every index built behind it).
    */
  def fitOpqRotation(embs: DataFrame, dim: Int, m: Int,
      fitCap: Int = PcaFitCap): Seq[(Seq[Double], Double)] = {
    require(m >= 1 && dim % m == 0,
      s"dim=$dim must split evenly into m=$m subspaces")
    val pca = fitPca(embs, dim, k = dim, whiten = false, fitCap = fitCap)
    val dsub = dim / m
    // greedy balance: largest eigenvalue first, into the non-full
    // bucket with the smallest log-product (ties to the lower index) —
    // deterministic, and the classic 2-approximation to the balanced
    // partition the paper's Gaussian bound wants
    val order = pca.eigenvalues.zipWithIndex.sortBy { case (ev, i) =>
      (-ev, i)
    }
    val logs = Array.fill(m)(0.0)
    val buckets = Array.fill(m)(Vector.empty[Int])
    order.foreach { case (ev, i) =>
      val b = (0 until m).filter(buckets(_).size < dsub)
        .minBy(j => (logs(j), j))
      logs(b) += math.log(math.max(ev, java.lang.Double.MIN_NORMAL))
      buckets(b) = buckets(b) :+ i
    }
    buckets.toSeq.flatten.map { r =>
      val w = pca.components(r)
      var c = 0.0
      var i = 0
      while (i < w.length) { c += pca.means(i) * w(i); i += 1 }
      (w.toSeq, c)
    }
  }

  /** Map-only whole-frame OPQ rotation — `(vec_id, embedding)` with
    * the embedding pushed through [[opqRotate]]'s fused dot kernels;
    * the projection every stage of the rotated stack (coarse fit,
    * residual fit, serving) shares.
    */
  def rotateFrame(df: DataFrame,
      rotation: Seq[(Seq[Double], Double)]): DataFrame =
    df.select(col("vec_id"),
      rotateRows(col("embedding"), rotation).as("embedding"))

  private def rotateRows(emb: Column,
      rows: Seq[(Seq[Double], Double)]): Column =
    array(rows.map { case (w, c) => dot(emb, typedLit(w)) - lit(c) }: _*)

  /** Map-only OPQ rotation: the permuted PCA projection as an array
    * column — `rotated[r] = x·w_r − c_r`, every coordinate through the
    * fused v4p dot kernel, bit-replayable from the persisted rotation
    * rows.
    */
  def opqRotate(emb: Column, model: OpqModel): Column =
    rotateRows(emb, model.rotation)

  /** ADC top-k in the OPQ-rotated space — [[pqAdcTopK]] verbatim over
    * the rotated corpus codes and rotated queries (rotation preserves
    * L2, so adist ranks the TRUE distances under the better
    * quantizer). Hash-gates end to end from the persisted rotation +
    * codebook parquets.
    */
  def opqAdcTopK(corpus: DataFrame, queries: DataFrame, model: OpqModel,
      k: Int): DataFrame = {
    val rc = corpus.select(col("vec_id"),
      opqRotate(col("embedding"), model).as("embedding"))
    val rq = queries.select(col("vec_id"),
      opqRotate(col("embedding"), model).as("embedding"))
    pqAdcTopK(rq, pqEncode(rc, model.pq), model.pq, k)
  }

  /** Coarse-residual frame [Jégou et al., TPAMI'11 §IV-A]: each vector
    * minus its assigned coarse centroid, plus the assignment —
    * `(vec_id, cell, embedding = v − c_cell)` in ONE map-only
    * projection (argmax + element_at + zip_with against literal
    * centroids — no join, no shuffle, the assignment discipline).
    * Residuals carry far less energy than raw vectors (the coarse
    * quantizer already explains the cluster structure), which is why
    * PQ codebooks trained on them quantize with lower distortion at
    * the same bit budget — the actual IVFADC design.
    */
  def residualVectors(corpus: DataFrame,
      cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val ids = cents.map(_._1)
    val vecs = cents.map(_._2)
    // STAGED projections: the coarse argmax is referenced twice (cell
    // + residual) and lambda-bearing expressions are excluded from
    // codegen CSE, so inlining would evaluate the nlist-fold argmax
    // per reference; a non-cheap alias referenced more than once also
    // blocks CollapseProject, so each stage's work runs ONCE per row.
    corpus
      .select(col("vec_id"), asDouble(col("embedding")).as("v"),
        nearestCellExpr(col("embedding"), cents).as("cpos"))
      .select(col("vec_id"),
        element_at(typedLit(ids), col("cpos")).as("cell"),
        zip_with(col("v"), element_at(typedLit(vecs), col("cpos")),
          (x, c) => x - c).as("embedding"))
  }

  /** PQ codebooks trained on the COARSE RESIDUALS (the IVFADC fit):
    * [[fitPq]] over [[residualVectors]] — same sample cap, same
    * per-subspace Lloyd machinery, same O(fitCap·k·iters·m) bound; the
    * residual projection is map-only so the fit pass cost is
    * unchanged.
    */
  def fitResidualPq(corpus: DataFrame, centroids: DataFrame,
      dim: Int, m: Int, k: Int, iters: Int): PqModel = {
    val centArr = collectCentroids(centroids)
    fitPq(residualVectors(corpus, centArr)
      .select(col("vec_id"), col("embedding")), dim, m, k, iters)
  }

  /** Per-(query, cell, subspace, code) ADC lookup table for the
    * RESIDUAL form: the query's residual against EVERY cell's centroid
    * scores each codeword — `s = c·c − 2·(q − c_cell)_sub·c` (the b·b
    * term is per-(query, cell) constant; dropping it preserves both
    * the per-cell ranking and, because ‖q − c_cell‖² is itself part of
    * the true distance, the CROSS-cell ranking needs it back — so it
    * is ADDED BACK per cell, making adist comparable across probed
    * cells, which flat-PQ ADC never has to worry about). Driver-side
    * deterministic double loops over the bounded query set (the adcLut
    * discipline); |q|·nlist·m·k rows, broadcast.
    */
  private def residualAdcLut(queries: DataFrame,
      cents: Seq[(Int, Seq[Double])],
      model: PqModel): Seq[(Long, Int, Int, Int, Double)] = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qs = queries
      .select(col("vec_id"), asDouble(col("embedding")))
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    for {
      (qid, qv) <- qs
      (cellId, cv) <- cents
      (book, sub) <- model.books.zipWithIndex
      (cid, c) <- book
    } yield {
      var cc = 0.0
      var i = 0
      while (i < c.length) { cc += c(i) * c(i); i += 1 }
      var dp = 0.0
      i = 0
      while (i < c.length) {
        val j = sub * model.dsub + i
        dp += (qv(j) - cv(j)) * c(i)
        i += 1
      }
      // residual-energy term: Σ_sub over this subspace's slice of
      // ‖q − c_cell‖² — added per (sub) so the per-code s values sum to
      // ‖q − c_cell‖² + Σ (c·c − 2·r·c) = the true quantized distance
      var rr = 0.0
      i = 0
      while (i < c.length) {
        val j = sub * model.dsub + i
        val r = qv(j) - cv(j)
        rr += r * r
        i += 1
      }
      (qid, cellId, sub, cid, rr + cc - 2.0 * dp)
    }
  }

  private def collectCentroids(
      centroids: DataFrame): Seq[(Int, Seq[Double])] = {
    val spark = centroids.sparkSession
    import spark.implicits._
    centroids.select(col("centroid_id").cast("int"), col("centroid"))
      .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
  }

  /** IVFADC proper [Jégou et al., TPAMI'11 §IV-A] — [[ivfPqTopK]] with
    * the codes on COARSE RESIDUALS: the corpus-side projection computes
    * cell AND m residual codes in one map-only pass; the LUT is per
    * (query, cell) because the query's residual differs per probed
    * cell (the asymmetric distance includes the cell's own offset —
    * `adist = ‖q − c_cell‖² + Σ_sub (c·c − 2·r·c)`, the true quantized
    * distance, comparable ACROSS cells). Same shuffle shape as the
    * flat form — candidates by one equi join on the cell against the
    * broadcast probe set, scoring by a broadcast LUT join, winners
    * from the bounded heap — at strictly lower quantization
    * distortion for the same m (spec-pinned). Hash-gates end to end
    * given the persisted centroid + residual-codebook tables.
    */
  def ivfPqResidualTopK(
      centroids: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      model: PqModel,
      k: Int,
      nprobe: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centArr = collectCentroids(centroids)
    // the residual frame stages its projections (residualVectors) so
    // the coarse argmax and the zip_with subtraction each run ONCE per
    // row — inlined, the m code columns would re-evaluate both per
    // subspace (lambda-bearing exprs are excluded from codegen CSE;
    // the non-cheap multi-referenced aliases also block
    // CollapseProject, keeping the stages separate)
    val rvFrame = residualVectors(corpus, centArr)
    val codeCols = model.books.zipWithIndex.map { case (cents, sub) =>
      nearestCellL2Expr(
        slice(col("embedding"), sub * model.dsub + 1, model.dsub), cents)
        .as(s"c$sub")
    }
    val coded = rvFrame.select(
      Seq(col("vec_id"), col("cell")) ++ codeCols: _*)
    val cents = broadcast(centArr.toDF("centroid_id", "centroid"))
    val qScored = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .join(cents)
      .select(col("query_id"), col("centroid_id"),
        cosine(col("qv"), col("centroid")).as("csim"))
    val qcells = graft.plans.TopKPerKey(qScored,
        Seq(col("query_id")), Seq(col("csim").desc, col("centroid_id").asc),
        nprobe, rankName = "crank")
      .select(col("query_id"), col("centroid_id").as("cell"))
    val cand = coded.join(broadcast(qcells), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
    val long = cand.select(col("query_id"), col("vec_id"), col("cell"),
      posexplode(array((0 until model.m).map(i => col(s"c$i")): _*))
        .as(Seq("sub", "code")))
    val scored = long
      .join(broadcast(residualAdcLut(queries, centArr, model)
          .toDF("query_id", "cell", "sub", "code", "s")),
        Seq("query_id", "cell", "sub", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("s").cast("decimal(28,12)")).cast("double").as("adist"))
    graft.plans.TopKPerKey(scored,
        Seq(col("query_id")), Seq(col("adist").asc, col("vec_id").asc), k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("adist"), col("rank"))
  }

  /** OPQ-rotated residual IVF-PQ — the production FAISS
    * `OPQ_m,PCA + IVF_nlist + PQ_m` stack, composed from the repo's two
    * halves (a12's parametric rotation, a11's residual machinery):
    * rotate by the permuted eigenbasis, coarse-assign IN THE ROTATED
    * SPACE, quantize rotated coarse residuals, serve rotated ADC. The
    * rotation is orthogonal + mean shift, so L2 is preserved and the
    * a11 per-(query, cell) residual LUT — including the cross-cell
    * residual-energy term — carries over VERBATIM; the composition is
    * [[ivfPqResidualTopK]] on [[rotateFrame]]'d corpus and queries
    * against centroids/codebooks fitted in the same rotated space.
    * Variance balanced ACROSS subspaces (rotation) on residuals that
    * carry less energy (coarse quantizer): both distortion wins stack
    * (PqSpec pins composed < residual-alone on planted
    * unbalanced-variance clusters). Hash-gates end to end from the
    * persisted rotation + rotated-centroid + residual-codebook
    * parquets; same shuffle shape as a6/a11 — the rotation adds one
    * map-only projection, nothing to the exchange plan.
    */
  def opqIvfPqResidualTopK(
      centroids: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      rotation: Seq[(Seq[Double], Double)],
      model: PqModel,
      k: Int,
      nprobe: Int): DataFrame =
    ivfPqResidualTopK(centroids, rotateFrame(corpus, rotation),
      rotateFrame(queries, rotation), model, k, nprobe)

  /** IVF-PQ composed serving [Jégou et al., TPAMI'11 §IV] — the
    * standard large-scale ANN deployment shape: the coarse quantizer
    * prunes the corpus to the query's `nprobe` nearest cells, and only
    * the CANDIDATES' m-byte codes are scored (asymmetric distance) —
    * the scan cost at 100 TB is nprobe/nlist of the corpus × m bytes
    * per vector, with neither full vectors nor non-candidate codes ever
    * touched. ONE map-only projection computes each corpus vector's
    * coarse cell AND its m codes (no join, no shuffle — the assignment
    * discipline); candidates come from an equi join on the cell against
    * the broadcast probe set; scoring is the a4 LUT join + decimal-
    * routed sum; winners from the bounded heap.
    *
    * Exactness: cell assignment, codes, and LUT all reuse the
    * oracle-replayable kernels (fused cosine, L2 argmin over persisted
    * codebooks), so the whole composition hash-gates — unlike a2's
    * pruned probe, whose recall is spec-measured, the IVF-PQ answer is
    * deterministic GIVEN the persisted centroid + codebook tables.
    */
  def ivfPqTopK(
      centroids: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      model: PqModel,
      k: Int,
      nprobe: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centArr = centroids
      .select(col("centroid_id").cast("int"), col("centroid"))
      .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    val ids = centArr.map(_._1)
    // ONE narrow projection: coarse cell + all m codes; the corpus is
    // read once and never shuffled to learn either. element_at maps the
    // argmax POSITION back to the stored centroid_id so the probe join
    // key is id-stable even if ids are not 1..nlist.
    val codeCols = model.books.zipWithIndex.map { case (cents, sub) =>
      nearestCellL2Expr(
        slice(asDouble(col("embedding")), sub * model.dsub + 1, model.dsub),
        cents).as(s"c$sub")
    }
    val coded = corpus.select(
      Seq(col("vec_id"),
        element_at(typedLit(ids),
          nearestCellExpr(col("embedding"), centArr)).as("cell")) ++
        codeCols: _*)
    // query → nprobe cells (a tiny frame: |queries| × nlist)
    val cents = broadcast(centArr.toDF("centroid_id", "centroid"))
    val qScored = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .join(cents)
      .select(col("query_id"), col("centroid_id"),
        cosine(col("qv"), col("centroid")).as("csim"))
    val qcells = graft.plans.TopKPerKey(qScored,
        Seq(col("query_id")), Seq(col("csim").desc, col("centroid_id").asc),
        nprobe, rankName = "crank")
      .select(col("query_id"), col("centroid_id").as("cell"))
    val cand = coded.join(broadcast(qcells), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
    val long = cand.select(col("query_id"), col("vec_id"), posexplode(
      array((0 until model.m).map(i => col(s"c$i")): _*)).as(Seq("sub", "code")))
    val scored = long
      .join(broadcast(adcLut(queries, model)
        .toDF("query_id", "sub", "code", "s")), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("s").cast("decimal(28,12)")).cast("double").as("adist"))
    graft.plans.TopKPerKey(scored,
        Seq(col("query_id")), Seq(col("adist").asc, col("vec_id").asc), k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("adist"), col("rank"))
  }

  // ---- PCA / whitening ---------------------------------------------------

  /** Fitted PCA state: per-dimension means, top-k principal components as
    * ROWS (already 1/√λ-scaled when whitened), and their eigenvalues.
    * O(k·dim) driver state — the Lloyd-centroid / BPE-table discipline.
    */
  final case class PcaModel(
      means: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double])

  /** Cap on the number of vectors the PCA fit aggregates, mirroring
    * [[LloydFitCap]]: the covariance is an ESTIMATION of the corpus
    * second moments — it converges with the sample, not the corpus — so
    * fitting on a deterministic hash-prefix sample bounds the one
    * O(n·d²) stage in the library at O(fitCap·d²) for ANY corpus size.
    * At or below the cap the sample IS the corpus (the same
    * `orderBy(xxhash64).limit` prefix that seeds the Lloyd fit), so
    * results are bit-identical to an uncapped fit; the projection stays a
    * full-corpus map-only pass either way.
    */
  val PcaFitCap = 8192

  /** One-pass covariance fit + driver-side eigendecomposition.
    *
    * The DISTRIBUTED stage is the v3 covariance shape: the d² pair
    * expansion collapses into a map-side partial aggregate, d(d+1)/2
    * decimal-summed rows per partition shuffle, and the driver collects
    * O(d²) numbers — corpus-size-independent, like the Lloyd fit. The
    * eigendecomposition is cyclic Jacobi with a FIXED sweep order, ties
    * broken by index and signs pinned (largest-|component| positive), so
    * the same corpus fits the same model bit-for-bit on any partitioning
    * (the covariance doubles are decimal-routed; Jacobi is a fixed
    * sequence of IEEE ops). `whiten` scales each component by 1/√λ so the
    * projected data has identity covariance — the PCA-whitening step
    * embedding pipelines run before clustering/ANN.
    *
    * The fit input is the first `fitCap` vectors of the deterministic
    * hash ordering on `idCol` (see [[PcaFitCap]]); pass
    * `fitCap = Int.MaxValue` to force a full-corpus fit.
    */
  def fitPca(
      embs: DataFrame,
      dim: Int,
      k: Int,
      whiten: Boolean = false,
      fitCap: Int = PcaFitCap,
      idCol: String = "vec_id"): PcaModel = {
    require(k >= 1 && k <= dim, s"need 1 <= k <= dim, got k=$k dim=$dim")
    require(fitCap >= 2, s"fitCap must be >= 2, got $fitCap")
    val fit =
      if (fitCap == Int.MaxValue) embs
      else {
        require(embs.columns.contains(idCol),
          s"fitPca: sampled fit orders by id column '$idCol', not present in " +
            s"[${embs.columns.mkString(", ")}] — pass idCol or fitCap=Int.MaxValue")
        // TakeOrderedAndProject: per-partition top-n, no global sort
        embs.orderBy(xxhash64(col(idCol)), col(idCol)).limit(fitCap)
      }
    // hot O(n·d²) pair pass carries one decimal sum; the O(n·d) per-dim
    // sums come from a separate cheap aggregate (the v3 cost shape)
    val x = fit.select(col("embedding"),
      posexplode(col("embedding")).as(Seq("i", "vf")))
    val stats = x
      .select(col("i"), col("vf").cast("double").as("vi"),
        posexplode(col("embedding")).as(Seq("j", "wf")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(
        count(lit(1)).as("n"),
        sum((col("vi") * col("wf").cast("double")).cast("decimal(28,12)"))
          .cast("double").as("sxy"))
      .collect()
    val dimSums = x.groupBy(col("i"))
      .agg(sum(col("vf").cast("double").cast("decimal(28,12)"))
        .cast("double").as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    require(stats.nonEmpty,
      "fitPca: no embedding values to fit on — the corpus (or fit sample) " +
        "is empty, or every embedding is NULL/empty")
    val over = stats.iterator.map(_.getInt(1)).filter(_ >= dim).toSeq
    require(over.isEmpty,
      s"fitPca: embeddings carry dimensions up to ${over.max} but dim=$dim " +
        "— pass the true embedding width")
    val missing = (0 until dim).filterNot(dimSums.contains)
    require(missing.isEmpty,
      s"fitPca: embeddings cover ${dimSums.size} of dim=$dim dimensions " +
        s"(missing: ${missing.take(8).mkString(", ")}${if (missing.length > 8) ", …" else ""})")
    val pairCounts = stats.map(_.getLong(2)).distinct
    require(pairCounts.length == 1,
      "fitPca: ragged embedding lengths — every vector must have exactly " +
        s"dim=$dim values (saw per-pair counts ${pairCounts.sorted.take(4).mkString(", ")}…)")
    val n = pairCounts.head.toDouble
    val cov = Array.ofDim[Double](dim, dim)
    val means = Array.tabulate(dim)(i => dimSums(i) / n)
    stats.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      val c = r.getDouble(3) / n - means(i) * means(j)
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (eigVals, eigVecs) = jacobiEigen(cov)
    // order by eigenvalue desc, index asc on ties; pin each sign so the
    // largest-|entry| coordinate (first on ties) is positive
    val order = eigVals.indices.sortBy(i => (-eigVals(i), i)).take(k)
    val comps = order.map { c =>
      val v = Array.tabulate(dim)(r => eigVecs(r)(c))
      val m = v.indices.maxBy(i => (math.abs(v(i)), -i))
      val sign = if (v(m) < 0) -1.0 else 1.0
      val scale = if (whiten) sign / math.sqrt(math.max(eigVals(c), 1e-12))
                  else sign
      v.map(_ * scale)
    }.toArray
    PcaModel(means, comps, order.map(eigVals).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: fixed (p, q)
    * sweep order, rotations applied until the off-diagonal mass is below
    * tolerance. Returns (eigenvalues, eigenvector COLUMNS). Deterministic:
    * no pivot search, no randomness — a fixed sequence of IEEE doubles.
    */
  private[operators] def jacobiEigen(
      a0: Array[Array[Double]],
      maxSweeps: Int = 64,
      tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > tol) {
      off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < n) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < n) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      var i = 0
      while (i < n - 1) {
        var j = i + 1
        while (j < n) { off += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Map-only projection of the embedding column onto a fitted model:
    * component r of the output is dot(x − μ, w_r) = graft_dot(x, w_r) − c_r
    * with c_r = dot(μ, w_r) folded into a literal driver-side — one fused
    * codegen'd kernel pass per component, nothing shuffles, and the fold
    * order matches a driver recompute bit-for-bit (the d5p property).
    */
  def pcaProject(emb: Column, model: PcaModel): Column = {
    val comps = model.components.map { w =>
      var c = 0.0
      var i = 0
      while (i < w.length) { c += model.means(i) * w(i); i += 1 }
      dot(emb, typedLit(w.toSeq)) - lit(c)
    }
    array(comps.toIndexedSeq: _*)
  }
}
