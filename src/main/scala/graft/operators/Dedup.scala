package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines.
  *
  * Shared output contract: every variant returns one row per input document
  * with a `rep` column — the smallest doc_id among the document's near-dup
  * neighborhood (single hop, including itself). `rep == doc_id` means the
  * document is kept; `rep < doc_id` means it deduplicates onto `rep`.
  * Single-hop (not full connected components) keeps the operator a bounded
  * number of shuffles — at 100 TB an iterative CC would be its own job;
  * single-hop is the standard first-pass dedup contract.
  *
  * Scale design notes, per variant:
  *  - exact: one hash-aggregate shuffle on the full text (map-side partial
  *    aggregation applies; no pairwise anything).
  *  - minhash-LSH: candidates come only from band-bucket joins — the
  *    classic shingle→minhash→band→self-join-on-band pipeline. Pair
  *    verification re-checks true Jaccard, so bucket collisions cost time,
  *    never correctness. No O(n²) stage anywhere.
  *  - simhash: 64-bit signature, banded into 16-bit keys (4 bands ⇒ any
  *    pair with hamming ≤ 3 shares ≥ 1 band), verified by exact hamming.
  *  - ngram-jaccard: exact set Jaccard inside explicit blocking keys; the
  *    blocking column bounds the quadratic term to within-block.
  *  - embedding cosine: random-hyperplane LSH buckets then exact cosine
  *    verify, mirroring the text pipeline in vector space.
  *
  * Cross-cutting performance decisions (these are what make the family run
  * at 100 TB, measured at sf0.1 in BENCH):
  *  - Signatures are computed ONCE into a persisted frame before any
  *    self-join. Without this, Spark recomputes the signature expression on
  *    both sides of the band join and again for verification — a 4-6×
  *    blowup. On a cluster the persist becomes a checkpoint/shuffle reuse;
  *    the plan shape is identical. Lifecycle: every persisted frame is
  *    tracked, and [[unpersistAll]] releases them — call it once the
  *    result is materialized. Dataset caches are CacheManager-held (not
  *    GC-reclaimed), so without the hook repeated dedup calls in one
  *    session would accumulate cache without bound.
  *  - Shingles/tokens are hashed to 64-bit longs at extraction
  *    ([[graft.functions.TextFunctions.hashedShingleSet]]); all set
  *    arithmetic downstream (minhash, intersection) runs on fixed-width
  *    longs, never re-hashing or comparing strings.
  *  - Jaccard verification prefilters candidate pairs on set sizes:
  *    J(A,B) ≥ t  ⇒  min(|A|,|B|) ≥ t·max(|A|,|B|). The size check is free
  *    (two ints) and exact — it never changes the result, only skips the
  *    array intersection for pairs that cannot pass.
  *  - |A∪B| is computed as |A|+|B|−|A∩B| (sets are distinct by
  *    construction), halving the array work per surviving pair.
  */
object Dedup {

  /** Signature/prefix frames persisted by dedup calls, released by
    * [[unpersistAll]]. A queue (not a field per call) because the operators
    * are static functions — callers own the lifecycle boundary.
    */
  private val cachedFrames = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** Exact size-ratio necessary condition `min(a,b)/max(a,b) >= t`:
    * the double form `least >= lit(t) * greatest` overshoots whenever
    * t·max is an exact integer (double(0.8)·5 = 4.000000000000000222
    * rejects a verify-passing J = 4/5 pair that the quadratic oracle
    * emits). Routing t through its shortest-decimal rendering
    * (BigDecimal.valueOf) and multiplying in DECIMAL keeps the prefilter
    * a true superset of the verify for any realistic set size.
    */
  private[graft] def sizeRatioAtLeast(a: Column, b: Column,
      t: Double): Column =
    least(a, b) >= lit(java.math.BigDecimal.valueOf(t)) * greatest(a, b)

  /** Active [[releaseScope]] buffers for THIS thread (operator
    * construction is single-threaded, so a thread-local is exact):
    * frames persisted / checkpoint RDDs pinned while a scope is open
    * register here INSTEAD of the global queues, and the scope
    * releases them when it closes.
    */
  private val scopeLocal = new ThreadLocal[List[
    (java.util.ArrayList[DataFrame],
      java.util.ArrayList[org.apache.spark.rdd.RDD[_]])]] {
    override def initialValue() = Nil
  }

  /** Scoped release — the per-batch lifecycle hook the STREAMING twins
    * need (r16 ADVICE): the index-maintenance operators persist /
    * localCheckpoint internal frames, and a long-running stream calling
    * one per microbatch would otherwise accumulate executor storage
    * without bound, while [[unpersistAll]] is global and would
    * invalidate concurrent work's checkpointed plans. Everything
    * persisted or checkpoint-pinned by dedup-family operators DURING
    * `body` (on this thread) is released when the scope closes —
    * nothing else is touched.
    *
    * CONTRACT: `body` must MATERIALIZE every result it keeps (write,
    * collect, or the sink's own action) before returning —
    * checkpoint-truncated plans cannot recompute after their blocks are
    * released, and cached plans would silently recompute. Scopes nest
    * (each releases only its own frames); operators called OUTSIDE any
    * scope keep the global [[unpersistAll]] lifecycle unchanged.
    */
  def releaseScope[T](body: => T): T = {
    val bufs = (new java.util.ArrayList[DataFrame](),
      new java.util.ArrayList[org.apache.spark.rdd.RDD[_]]())
    scopeLocal.set(bufs :: scopeLocal.get())
    try body
    finally {
      scopeLocal.set(scopeLocal.get().tail)
      bufs._1.forEach(df => df.unpersist(blocking = false))
      bufs._2.forEach(rdd => rdd.unpersist(blocking = false))
    }
  }

  private def persistTracked(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    scopeLocal.get() match {
      case (frames, _) :: _ => frames.add(p)
      case Nil => cachedFrames.add(p)
    }
    p
  }

  /** Tracked persist for callers composing dedup stages (e.g. the d8
    * query's fingerprint map) — released by [[unpersistAll]] like the
    * operator-internal frames.
    */
  def persistPublic(df: DataFrame): DataFrame = persistTracked(df)

  /** Tracked lineage truncation for external iterative callers (the
    * graph fixpoints) — eager localCheckpoint, or reliable checkpoints
    * when `spark.graft.checkpointDir` is set; checkpoint blocks are
    * released by [[unpersistAll]] like the operator-internal frames.
    */
  def truncatePublic(df: DataFrame): DataFrame = truncateLineage(df)

  /** Release one SPECIFIC truncated frame's checkpoint blocks (the
    * iterative-loop discipline: a superseded round's ranks are never
    * read again — holding all rounds until [[unpersistAll]] costs
    * O(rounds × frame) executor storage). No-op for frames that were
    * reliably checkpointed to `spark.graft.checkpointDir` (those files
    * are owned by the directory) or never truncated.
    */
  def releasePublic(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        if (checkpointRdds.remove(l.rdd)) l.rdd.unpersist(false)
      case _ => ()
    }

  /** RDDs pinned by eager localCheckpoints ([[localCheckpointTracked]]);
    * checkpoint blocks are NOT CacheManager-managed, so df.unpersist can't
    * release them — the underlying RDD handle can.
    */
  private val checkpointRdds =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]

  private def localCheckpointTracked(df: DataFrame): DataFrame = {
    // LAZY (r18): the plan is truncated at CREATION either way (the
    // LogicalRDD exists immediately — downstream references embed an
    // RDD scan, never the subtree, so the 2 GB-plan hazard stays
    // closed), but eager mode ran one standalone job per truncated
    // frame — the lifecycle ops truncate 6-8 delta frames per call and
    // paid ~0.3 s of job latency EACH on delta-sized data. Lazy mode
    // fuses materialization into the first consumer job (Spark's
    // LocalRDDCheckpointData then completes any missing partitions
    // immediately after it), and the release discipline is unchanged:
    // every releasePublic call site releases a frame only after an
    // action has materialized its successor.
    val out = df.localCheckpoint(false)
    out.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        scopeLocal.get() match {
          case (_, rdds) :: _ => rdds.add(l.rdd)
          case Nil => checkpointRdds.add(l.rdd)
        }
      case _ => ()
    }
    out
  }

  /** Lineage truncation for iterative rounds. Default: eager
    * localCheckpoint — fastest, but its blocks live on executors and are
    * NOT fault-tolerant: losing one executor mid-closure loses blocks the
    * lineage can no longer recompute, killing the whole iterative job.
    * When `spark.graft.checkpointDir` is set, rounds write RELIABLE
    * checkpoints to that (HDFS/object-store) directory instead — the
    * setting an hours-long 100 TB closure on a real cluster needs.
    * Reliable checkpoint files are owned by the directory, not by
    * [[unpersistAll]]: point it at a job-scoped temp path and delete it
    * when the job ends.
    */
  private def truncateLineage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("spark.graft.checkpointDir").filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => localCheckpointTracked(df)
    }
  }

  /** Release every signature/prefix frame cached — and every checkpoint
    * RDD pinned — by dedup calls so far. Safe once the caller has
    * materialized its results; Spark recomputes if a plan is re-executed
    * later (checkpointed plans cannot recompute, so callers must not
    * re-execute a dedup result DataFrame after calling this).
    */
  def unpersistAll(): Unit = {
    releaseCaches()
    var rdd = checkpointRdds.poll()
    while (rdd != null) { rdd.unpersist(blocking = false); rdd = checkpointRdds.poll() }
  }

  /** Release only the PERSISTED (cache) frames — never checkpoint
    * blocks. Always safe: a released cache recomputes if its plan
    * re-executes, whereas a localCheckpoint-truncated plan has no
    * lineage to recompute from — releasing its blocks would break any
    * still-registered lazy plan over it (a CTAS/view holding a
    * fixpoint result). The `graft_release` SQL statement calls this.
    */
  def releaseCaches(): Unit = {
    var df = cachedFrames.poll()
    while (df != null) { df.unpersist(blocking = false); df = cachedFrames.poll() }
  }

  /** A frame is CHEAP TO RE-SCAN when it is only column pruning /
    * filtering / aliasing over one MATERIALIZED leaf — a parquet store
    * scan, a catalog table, an in-memory relation, a checkpoint RDD:
    * re-executing it per consumer costs a map-side scan of bytes that
    * already exist, while persisting it copies the whole relation
    * (the components store's `toks` evidence included — index-sized)
    * into executor cache on every lifecycle pass. The lifecycle ops
    * use this to persist multi-consumer frames ONLY when they are
    * genuinely computed (the inline-build TVF path), never when the
    * caller hands them a persisted store (the x22/x25/x26 posture).
    */
  private def cheapRescan(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, SubqueryAlias}
    df.queryExecution.analyzed.find {
      case _: Project | _: Filter | _: SubqueryAlias => false
      case p => p.children.nonEmpty // any other non-leaf operator is real work
    }.isEmpty
  }

  /** [[persistTracked]] unless the frame is a [[cheapRescan]] over a
    * materialized store.
    */
  private[operators] def persistIfComputed(df: DataFrame): DataFrame =
    if (cheapRescan(df)) df else persistTracked(df)

  /** Exact dedup: group identical text.
    * Reference analogue: SELECT-DISTINCT-as-groupby (sqlrs plans DISTINCT as
    * group-by-all-columns, /root/reference/src/planner/select.rs:29-32);
    * here the group key is the document body — by 128-bit fingerprint.
    *
    * Scale shape: the shuffle key is `md5(text)` (32 hex chars), never the
    * raw document body — at 100 TB the standard plan's group+join-back on
    * full text would carry every body through TWO wide stages. A window
    * over the fingerprint does it in ONE shuffle of (doc_id, fp) pairs,
    * with no join back at all. md5's 128 bits make collisions vanishingly
    * unlikely at any corpus size (64-bit keys would birthday-collide at
    * ~billions of docs). NULL text ⇒ NULL fingerprint, and a window
    * partitions all NULLs together — same one-group semantics as SQL
    * GROUP BY.
    */
  def exact(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    docs
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .select(
        col("doc_id"),
        min(col("doc_id")).over(w).as("rep"),
        count(lit(1)).over(w).as("n_copies"))
  }

  /** Drop (band, bucket) groups larger than `maxBucket` rows before a
    * bucket self-join. A single degenerate band key — a near-constant
    * signature region on adversarial data — otherwise produces a
    * quadratic O(n²) stage that no verification can pay for at 100 TB.
    * The cap bounds any bucket's pair count at maxBucket²/2. Recall cost
    * is confined to pairs whose EVERY shared bucket is oversize — and a
    * clique that large is identical-or-near-identical text, which the
    * exact-dedup pass (d1) already collapses. The count is a window over
    * the same key the join shuffles on, so the partitioning is reused —
    * no extra exchange.
    */
  private def capBuckets(
      banded: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame = {
    if (maxBucket <= 0) banded
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*)
      banded
        .withColumn("__bsz", count(lit(1)).over(w))
        .filter(col("__bsz") <= maxBucket)
        .drop("__bsz")
    }
  }

  /** Per-band bucket hashes for an array signature column: element `b` is
    * `xxhash64(sig[b·rows+1 .. b·rows+rows], seed = b)`. Shared by the
    * batch self-join ([[bandPairs]]) and the streaming stream-vs-corpus
    * path ([[minhashIndex]] / `EventsStream.nearDupPairsStream`) so both
    * sides of an incremental dedup bucket IDENTICALLY.
    */
  /** Rows per band = numHashes / bands, with the divisibility enforced:
    * silent integer truncation (numHashes=32, bands=5 → 6-row bands
    * covering 30 of 32 hashes) would change recall with no error — and,
    * worse, an index and a probe built with DIFFERENT truncated
    * bandings would join garbage buckets. Every banding caller routes
    * through here so index and probe can never disagree.
    */
  private[graft] def bandRows(numHashes: Int, bands: Int, op: String): Int = {
    require(bands >= 1 && numHashes >= 1,
      s"$op: numHashes and bands must be >= 1, got $numHashes/$bands")
    require(numHashes % bands == 0,
      s"$op: numHashes ($numHashes) must be divisible by bands ($bands) — " +
        s"truncated bands would silently cover only " +
        s"${numHashes / bands * bands} of $numHashes hashes")
    numHashes / bands
  }

  private[graft] def bandBuckets(sig: Column, bands: Int, rows: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(slice(sig, b * rows + 1, lit(rows)), b))

  /** Pairs (i < j) whose signatures collide in at least one LSH band.
    * `sig` must be an array column; `bands` buckets of `rows` elements.
    * Callers pass a persisted frame so the two join sides scan the cached
    * signatures instead of recomputing them.
    */
  private def bandPairs(
      withSig: DataFrame, idCol: String, bands: Int, rows: Int,
      maxBucket: Int): DataFrame = {
    val banded = capBuckets(
      withSig.select(
        col(idCol),
        posexplode(bandBuckets(col("sig"), bands, rows))
          .as(Seq("band", "bucket"))),
      Seq("band", "bucket"), maxBucket)
    val l = banded.alias("l")
    val r = banded.alias("r")
    // no distinct(): a pair colliding in several bands appears several
    // times, but downstream min/`rep` aggregation is duplicate-insensitive
    // and verification is a cheap codegen'd merge — cheaper than another
    // full shuffle here
    l.join(r,
        col(s"l.band") === col(s"r.band") &&
          col(s"l.bucket") === col(s"r.bucket") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("i"), col(s"r.$idCol").as("j"))
  }

  /** Opt-in transitive closure over a near-dup pair set: every document
    * gets the MINIMUM doc_id of its whole connected component, not just
    * its one-hop neighborhood (the default contract — see the object doc).
    * A ~ B ~ C with A !~ C then collapses all three onto A.
    *
    * Algorithm: label propagation fused with pointer jumping — each round
    * takes the min label over neighbors, then follows the label one hop
    * (label(x) ← label(label(x))). The jump doubles effective path length
    * per round, so a chain of length L collapses in O(log L) rounds, and
    * each round is two shuffles on id keys. Rounds stop early at a
    * fixpoint; `maxIters` bounds the worst case (a bound the caller sees:
    * components with diameter > 2^maxIters may stay split — log-depth
    * makes that astronomically unlikely on real dup graphs).
    */
  def connectedComponents(
      docs: DataFrame, pairs0: DataFrame, maxIters: Int = 10): DataFrame = {
    // the pair set is typically the output of an expensive similarity
    // join; it feeds BOTH the edge list and the initial labels, so persist
    // it once instead of re-running the verify join per consumer
    val pairs = persistTracked(pairs0)
    // symmetric edge list; self-loops harmless (min with self is identity)
    val edges = pairs.select(col("i").as("u"), col("j").as("v"))
      .union(pairs.select(col("j").as("u"), col("i").as("v")))
      .transform(persistTracked)
    // Iterative self-joins DOUBLE the logical plan per round (the pointer
    // jump references `labels` twice), so lineage must be TRUNCATED each
    // iteration, not merely cached: with persist alone the plan tree is
    // 2^rounds copies of the base plan and Spark OOMs just rendering it.
    // localCheckpoint(eager) materializes executor-side and replaces the
    // plan with an RDD scan — the standard iterative-algorithm discipline
    // (or a reliable checkpoint when spark.graft.checkpointDir is set, see
    // truncateLineage).
    var labels = truncateLineage(
      attachRep(docs, pairs).select(col("doc_id"), col("rep")))
    // superseded rounds free their checkpoint blocks immediately — at most
    // two label copies are pinned at any time, and the final one is
    // released by unpersistAll()
    var iters = 0
    var converged = false
    while (iters < maxIters && !converged) {
      val next = truncateLineage(ccRound(labels, edges))
      converged = next.filter(col("rep") =!= col("prev_rep")).isEmpty
      releasePublic(labels) // next is materialized; the old round is dead
      labels = next.select(col("doc_id"), col("rep"))
      iters += 1
    }
    labels
  }

  /** One label-propagation + pointer-jump round over `labels`
    * (doc_id, rep) and the symmetric `edges` (u, v) — the repeated unit of
    * [[connectedComponents]], extracted so its plan shape can be
    * golden-pinned: two shuffles on id keys (the neighbor-min aggregate
    * and the jump self-join), nothing proportional to round count.
    * Emits (doc_id, rep, prev_rep); prev_rep rides along so convergence
    * is a filter on the checkpointed frame, not another join job.
    */
  private[graft] def ccRound(labels: DataFrame, edges: DataFrame): DataFrame = {
    // min label among neighbors
    val nbr = edges.join(labels.toDF("nid", "nrep"), col("v") === col("nid"))
      .groupBy(col("u")).agg(min(col("nrep")).as("nbr_rep"))
    val stepped = labels.join(nbr, labels("doc_id") === nbr("u"), "left")
      .select(labels("doc_id"),
        least(labels("rep"), coalesce(col("nbr_rep"), labels("rep"))).as("rep"),
        labels("rep").as("prev_rep"))
    // pointer jump: follow the label one hop (labels' domain is closed —
    // every rep is itself a doc_id — so a left join only guards NULLs)
    stepped.join(stepped.toDF("pid", "prep", "pprev"),
        col("rep") === col("pid"), "left")
      .select(stepped("doc_id"), coalesce(col("prep"), stepped("rep")).as("rep"),
        stepped("prev_rep"))
  }

  /** Attach `rep` = min(smaller-id neighbor, self) to every doc. */
  private def attachRep(docs: DataFrame, pairs: DataFrame): DataFrame =
    docs
      .join(pairs, docs("doc_id") === pairs("j"), "left")
      .groupBy(docs("doc_id"))
      .agg(coalesce(min(col("i")), first(docs("doc_id"))).as("rep"))
      .select(col("doc_id"), col("rep"))

  /** Serve [[ngramJaccard]]'s per-doc keep/rep verdicts from an
    * already-VERIFIED pair set (typically a materialized pair store —
    * the tfidfPairsShared discipline applied to the PPJoin family):
    * the expensive prefix-filter + exact-verify subtree runs once per
    * corpus snapshot at store-build time, and every consumer of the
    * same (n, threshold, blocking) pair universe reads the persisted
    * edges instead of re-verifying. Duplicate pair rows are tolerated
    * (the rep aggregation is duplicate-insensitive, the
    * [[ngramJaccardPairs]] multi-emit contract).
    */
  def ngramJaccardFromPairs(docs: DataFrame, pairs: DataFrame): DataFrame =
    attachRep(docs, pairs)

  /** MinHash + LSH near-dup: shingle → k-minhash → band-bucket join →
    * exact Jaccard verification on the (hashed) shingle sets.
    *
    * Documents with an empty shingle set are excluded from banding: they
    * can never verify (J needs a non-empty union) and — crucially at scale
    * — they would all share one signature and form a single quadratic
    * skew bucket. They come back with rep = self via [[attachRep]]'s left
    * join.
    */
  def minhashLsh(
      docs: DataFrame,
      shingleLen: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.8,
      maxBandBucket: Int = 10000): DataFrame =
    attachRep(docs,
      minhashLshPairs(docs, shingleLen, numHashes, bands, threshold, maxBandBucket))

  /** The verified (i < j) duplicate-pair set behind [[minhashLsh]] — every
    * emitted pair passed the EXACT Jaccard check at `threshold` (LSH only
    * proposes candidates), so the output is sound by construction; the
    * driver's d3p gate re-derives the predicate in DuckDB over the raw
    * text to hold the whole pipeline to that contract.
    */
  def minhashLshPairs(
      docs: DataFrame,
      shingleLen: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.8,
      maxBandBucket: Int = 10000): DataFrame = {
    val rows = bandRows(numHashes, bands, "minhashLshPairs")
    // graft_shingle_hashes / graft_minhash are native codegen'd expressions
    // (one imperative pass per document, no intermediate arrays) — the
    // composable HOF pipeline they replace measured 10 s at sf0.1 alone
    val withSig = docs
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", col("text"), lit(shingleLen)).as("hs"))
      .withColumn("n", size(col("hs")))
      .filter(col("n") > 0)
      .withColumn("sig", call_function("graft_minhash", col("hs"), lit(numHashes)))
      .transform(persistTracked)

    val candidates =
      bandPairs(withSig.select(col("doc_id"), col("sig")), "doc_id", bands, rows,
        maxBandBucket)

    // verify true Jaccard on the hashed shingle sets (LSH gives candidates
    // only): size-ratio prefilter, then |A∩B| / (|A|+|B|−|A∩B|)
    val sets = withSig.select(col("doc_id"), col("hs"), col("n"))
    val verified = candidates
      .join(sets.toDF("i", "si", "ni"), Seq("i"))
      .join(sets.toDF("j", "sj", "nj"), Seq("j"))
      .filter(sizeRatioAtLeast(col("ni"), col("nj"), threshold))
      .withColumn("inter",
        call_function("graft_intersect_size", col("si"), col("sj")).cast("double"))
      .withColumn("uni", col("ni").cast("double") + col("nj").cast("double") - col("inter"))
      .filter(col("uni") > 0 && col("inter") / col("uni") >= threshold)
      .select(col("i"), col("j"))
    verified
  }

  /** Static-side LSH index for INCREMENTAL near-dup (new data vs existing
    * corpus — `EventsStream.nearDupPairsStream` joins a document stream
    * against it): one row per (band, bucket) per corpus document, the
    * hashed shingle set riding along so the exact-Jaccard verification can
    * run inside the same microbatch. Build once per corpus snapshot and
    * persist or write to parquet — it is a plain DataFrame, so the index
    * survives as a table and serves any number of streaming jobs.
    * Degenerate buckets are capped at build time (the batch skew
    * discipline); arriving documents probe at most `maxBandBucket` corpus
    * rows per band.
    */
  def minhashIndex(
      corpus: DataFrame,
      shingleLen: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      maxBandBucket: Int = 10000): DataFrame = {
    val rows = bandRows(numHashes, bands, "minhashIndex")
    val withSig = corpus
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", col("text"), lit(shingleLen)).as("hs"))
      .withColumn("n", size(col("hs")))
      .filter(col("n") > 0)
      .withColumn("sig", call_function("graft_minhash", col("hs"), lit(numHashes)))
    capBuckets(
      withSig.select(
        col("doc_id"), col("hs"), col("n"),
        posexplode(bandBuckets(col("sig"), bands, rows))
          .as(Seq("band", "bucket"))),
      Seq("band", "bucket"), maxBandBucket)
  }

  /** Serve-time skew cap for a persisted [[minhashIndex]]: drop
    * (band, bucket) groups larger than `maxBucket` before the probe
    * join — [[capBuckets]]' quadratic-stage guard applied when the
    * index is READ rather than when it is written. Persisting the
    * UNCAPPED rows and capping at serve time costs the degenerate
    * buckets' storage (bounded — they are by definition few keys) and
    * buys the delete path exactness: after [[minhashIndexDelete]]
    * removes revoked documents, a bucket that was over the cap can
    * fall UNDER it, and its surviving rows — never discarded — start
    * serving again, precisely what a from-scratch rebuild would do.
    * The count is a window over the same (band, bucket) key the probe
    * join shuffles on, so the partitioning is reused — no extra
    * exchange.
    */
  def minhashIndexCap(index: DataFrame, maxBucket: Int = 10000): DataFrame =
    capBuckets(index, Seq("band", "bucket"), maxBucket)

  /** TAKEDOWN on the MinHash band index: every index row belongs to
    * exactly one document, so removal is ONE anti equi join on
    * `doc_id` — no corpus read, no signature recompute. Bit-identical
    * to `minhashIndex(survivors, maxBandBucket = 0)` row-for-row
    * (signatures are per-document), and identical THROUGH the serve
    * cap ([[minhashIndexCap]]) because the uncapped store retains
    * over-cap buckets' rows for the cap to re-admit (IndexDeleteSpec
    * pins both). `revoked` is a `(doc_id)` relation.
    */
  def minhashIndexDelete(index: DataFrame, revoked: DataFrame): DataFrame =
    index.join(revoked.select(col("doc_id")), Seq("doc_id"), "left_anti")

  /** Incremental MinHash-LSH dedup — the daily-crawl flow in the SHINGLE
    * domain (the word-level twin is [[incrementalDedup]]): for each PROBE
    * document, does it near-duplicate anything in the BASE corpus at
    * shingle Jaccard ≥ `num/den`? The base side is a PREBUILT
    * [[minhashIndex]] (one row per (band, bucket) per corpus doc, hashed
    * shingle set riding along) — built once per base snapshot, persisted
    * as a table, probed by any number of drops; the base corpus never
    * self-joins and never reshuffles. The probe side computes signatures
    * map-side, candidates come from ONE equi join on (band, bucket), and
    * every emitted duplicate passed the EXACT integer Jaccard check
    * (LSH only proposes): den·|A∩B| ≥ num·|A∪B| — the [[incrementalDedup]]
    * rational-threshold discipline, no floats anywhere. Candidate pairs
    * colliding in several bands are deduped BEFORE the intersection runs,
    * so the O(|A|+|B|) verify happens once per pair.
    *
    * Returns one row per probe doc: `(doc_id, n_dups, first_dup (-1 when
    * none), is_new)` — the [[incrementalDedup]] output contract.
    * Probe docs with an empty shingle set are trivially new. Self-pairs
    * (a probe id also present in the index) are excluded, the
    * `nearDupPairsStream` convention.
    *
    * Scale posture: index build is the one O(base) job (skew capped at
    * `maxBandBucket` build time); serving shuffles ∝ drop size + matched
    * postings. Recall is the standard LSH band bet — the same
    * (bands, rows) family the batch d3 gate pins corpus-wide.
    */
  def incrementalMinhash(index: DataFrame, probe: DataFrame,
      shingleLen: Int = 3, numHashes: Int = 32, bands: Int = 8,
      num: Int = 4, den: Int = 5): DataFrame = {
    require(num >= 1 && den >= 1 && num <= den,
      s"incrementalMinhash: threshold num/den must be a fraction in " +
        s"(0, 1], got $num/$den")
    val rows = bandRows(numHashes, bands, "incrementalMinhash")
    val probeBands = probe
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", col("text"), lit(shingleLen)).as("ps"))
      .withColumn("pn", size(col("ps")))
      .filter(col("pn") > 0)
      .withColumn("sig", call_function("graft_minhash", col("ps"), lit(numHashes)))
      .select(col("doc_id").as("pid"), col("ps"), col("pn"),
        posexplode(bandBuckets(col("sig"), bands, rows))
          .as(Seq("band", "bucket")))
    val idx = index.select(col("doc_id").as("bid"), col("hs").as("bs"),
      col("n").as("bn"), col("band"), col("bucket"))
    val verified = probeBands.join(idx, Seq("band", "bucket"))
      .filter(col("pid") =!= col("bid"))
      // size-ratio prefilter (J ≤ min/max), integer-exact like the verify
      .filter(lit(den) * least(col("bn"), col("pn")) >=
        lit(num) * greatest(col("bn"), col("pn")))
      // all rows of a (pid, bid) pair carry identical sets once band and
      // bucket are projected away — collapse the multi-band collisions
      // before paying the intersection
      .select(col("pid"), col("bid"), col("ps"), col("pn"),
        col("bs"), col("bn"))
      .dropDuplicates(Seq("pid", "bid"))
      .withColumn("inter",
        call_function("graft_intersect_size", col("bs"), col("ps")).cast("long"))
      .filter(lit(den) * col("inter") >=
        lit(num) * (col("bn").cast("long") + col("pn").cast("long") - col("inter")))
      .select(col("pid"), col("bid"))
    val dups = verified.groupBy(col("pid"))
      .agg(count(lit(1)).as("nd"), min(col("bid")).as("fd"))
    val roster = probe.select(col("doc_id"))
    roster.join(dups, roster("doc_id") === dups("pid"), "left")
      .select(col("doc_id"),
        coalesce(col("nd"), lit(0L)).as("n_dups"),
        coalesce(col("fd"), lit(-1L)).as("first_dup"),
        col("pid").isNull.as("is_new"))
  }

  /** Connected near-dup components over the exact ngram-Jaccard pair
    * set — one row per document with its component representative
    * `(doc_id, rep)`. The shared engine behind d8 (the raw component
    * map), d12 (keep-best canonicalization), the x20/x21 governance
    * closures, and the `graft_components` SQL TVF. `docs` must carry
    * `(doc_id, lang, text)`.
    *
    * Exact duplicates collapse to a per-(lang, md5) clique
    * representative BEFORE pair generation — an m-copy template would
    * otherwise inject m·(m−1)/2 identical-score edges into the pair
    * stage (the d8 edge-blowup note); semantics-preserving because
    * identical text has identical similarity to everything. Empty token
    * sets stay singletons (Jaccard undefined). Pairs are blocked by
    * language and prefix-filtered ([[ngramJaccardPairs]] — candidate
    * generation is an equi join on a bounded block key, never
    * all-pairs); the closure is [[connectedComponents]]' checkpointed
    * min-label propagation.
    */
  def nearDupComponents(docs: DataFrame, n: Int = 1,
      threshold: Double = 0.95, maxIters: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("fp"))
    val withRep0 = docs
      .select(col("doc_id"), col("lang"), col("text"),
        md5(col("text")).as("fp"),
        size(graft.functions.TextFunctions.tokenSet(col("text"))).as("tsz"))
      .withColumn("rep0",
        when(col("tsz") > 0, min(col("doc_id")).over(w))
          .otherwise(col("doc_id")))
    val reps = withRep0.filter(col("doc_id") === col("rep0"))
      .select(col("doc_id"), col("lang"), col("text"))
    val cc = connectedComponents(reps,
      ngramJaccardPairs(reps, n = n, threshold = threshold,
        blockCols = Seq(col("lang"))), maxIters = maxIters)
    // the rep0 map is consumed here AND feeds reps above — persist so
    // the fingerprint window does not recompute for the final rejoin
    val rep0Map = persistPublic(withRep0.select(col("doc_id"), col("rep0")))
    rep0Map
      .join(cc.toDF("rid", "rep"), col("rep0") === col("rid"))
      .select(col("doc_id"), col("rep"))
  }

  /** TAKEDOWN on the near-dup COMPONENT map — the graph store's delete
    * path, and the one where deletion can SPLIT what it touches: pull
    * a revoked document out of an A~B~C chain and the survivors may no
    * longer be connected. Component-LOCAL re-closure makes the repair
    * exact without a corpus rebuild: near-dup edges exist only WITHIN
    * original components (removing documents removes edges, never adds
    * them), so components holding no revoked member pass through
    * UNTOUCHED (same members ⇒ same pairs ⇒ same min-label rep), and
    * the survivors of affected components re-run
    * [[nearDupComponents]] over THEIR text alone — pair generation,
    * clique collapse, and the min-label closure all confined to the
    * affected membership. Bit-identical to
    * `nearDupComponents(survivors)` (IndexDeleteSpec pins it, with a
    * planted chain-split), at cost ∝ affected components' text plus
    * two index-sized joins — never the corpus.
    *
    * `components` is the persisted `(doc_id, rep)` map; `docs` the
    * corpus it was built from (the affected members' bodies are
    * fetched by one semi join — pass the bucketed scan at corpus
    * scale); `revoked` a `(doc_id)` relation ⊆ the map's documents.
    */
  def componentsDelete(components: DataFrame, docs: DataFrame,
      revoked: DataFrame, n: Int = 1, threshold: Double = 0.95,
      maxIters: Int = 8): DataFrame = {
    val rev = revoked.select(col("doc_id"))
    val aff = components.join(rev, Seq("doc_id"), "left_semi")
      .select(col("rep")).distinct()
    val untouched = components.join(aff, Seq("rep"), "left_anti")
      .select(col("doc_id"), col("rep"))
    val members = components.join(aff, Seq("rep"), "left_semi")
      .join(rev, Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
    val mdocs = docs.join(members, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("lang"), col("text"))
    untouched.unionByName(
      nearDupComponents(mdocs, n = n, threshold = threshold,
        maxIters = maxIters))
  }

  // ---- the COMPONENTS STORE: the near-dup graph as the eighth ----------
  // ---- persisted lifecycle index (build / probe / delete / merge) ------

  /** Canonical empty-marker columns for the two row kinds of the
    * components store (see [[componentsIndex]]): a member row carries
    * the clique/closure columns and a null `dst`; an edge row carries
    * only its endpoints.
    */
  private def nullLong(name: String): Column =
    lit(null).cast("bigint").as(name)

  /** The store's canonical column order — Seq-based using-column joins
    * move the key to the front, so every store-shaped output re-selects
    * through this.
    */
  private val storeCols: Seq[Column] = Seq(col("doc_id"), col("rep0"),
    col("rep"), col("lang"), col("fp"), col("tsz"), col("dst"), col("toks"))

  /** The persisted NEAR-DUP COMPONENT STORE — the d8 closure plus the
    * evidence that produced it, as one relation, so takedown can
    * re-close from SURVIVING EDGES instead of re-shingling text (the
    * r15 `componentsDelete` re-ran pair generation over affected
    * components' bodies — correct, but a revocation touching the giant
    * component every web corpus has re-shingled that whole component;
    * this store makes the repair index-only). Two row kinds:
    *
    *  - MEMBER rows `(doc_id, rep0, rep, lang, fp, tsz, dst = null,
    *    toks)` — one per corpus document: its exact-duplicate clique
    *    representative `rep0` (min doc_id over the `(lang, fp =
    *    md5(text))` clique for token-bearing docs, self for empty
    *    ones — [[nearDupComponents]]' collapse), its closed component
    *    label `rep`, and — ONLY on the clique rep's own row — `toks`,
    *    the clique's hashed shingle set ([[ngramJaccardPairs]]'
    *    exact-verification evidence, what lets [[componentsIndexMerge]]
    *    verify new cross pairs without re-reading base text).
    *  - EDGE rows `(doc_id = u, dst = v)` — the VERIFIED rep-level
    *    near-dup pairs (i < j), exactly the edge set the closure ran
    *    on. Rep-level, never doc-level: inside an m-clique of exact
    *    duplicates a doc-level edge list would be quadratic.
    *
    * The member projection `(doc_id, rep)` is bit-identical to
    * [[nearDupComponents]] (same computation, spec-pinned) — serving
    * consumers read it through [[componentsFromIndex]].
    *
    * Scale shape: one corpus pass (the d8 build cost — this store
    * REPLACES cc_components rather than sitting beside it); the store
    * itself is index-sized (members ∝ docs as fixed-width rows plus
    * one hashed token array per distinct text, edges ∝ verified
    * pairs). Lifecycle cost after the build is the point:
    * [[componentsIndexDelete]] ∝ takedown set + affected components'
    * EDGES, [[componentsIndexMerge]] ∝ drop + matched postings —
    * corpus text is never re-read.
    */
  /** `verifiedPairs`, when supplied, must be the DISTINCT verified
    * (i < j, J ≥ threshold, same-block) pair set of [[ngramJaccardPairs]]
    * computed over EXACTLY `docs`' rows at the same (n, threshold,
    * blocking) — e.g. the corpus's materialized pair store. Pair
    * membership is decided independently per pair (the df-ordered prefix
    * filter is pruning-only — exact recall under any consistent global
    * order), so restricting the full-corpus set to rep endpoints is
    * bit-identical to running the PPJoin over the reps alone
    * (spec-pinned) — and the store build then skips its own PPJoin, the
    * single most expensive subtree of the fit channel.
    */
  def componentsIndex(docs: DataFrame, n: Int = 1,
      threshold: Double = 0.95, maxIters: Int = 8,
      verifiedPairs: Option[DataFrame] = None): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("fp"))
    val withRep0 = docs
      .select(col("doc_id"), col("lang"), col("text"),
        md5(col("text")).as("fp"),
        size(graft.functions.TextFunctions.tokenSet(col("text"))).as("tsz"))
      .withColumn("rep0",
        when(col("tsz") > 0, min(col("doc_id")).over(w))
          .otherwise(col("doc_id")))
    // ONLY the slim projection persists (the nearDupComponents rep0Map
    // discipline — caching the text-bearing frame would pin a
    // corpus-sized cache at 100 TB); the reps branch re-derives its
    // window pass over the raw scan instead
    val memberBase = persistTracked(withRep0
      .select(col("doc_id"), col("rep0"), col("lang"), col("fp"), col("tsz")))
    val reps = withRep0.filter(col("doc_id") === col("rep0"))
      .select(col("doc_id"), col("lang"), col("text"), col("tsz"))
    // distinct: candidate generation emits one row per shared prefix
    // token — closure is duplicate-insensitive, a persisted EDGE STORE
    // is not
    val pairs = persistTracked(verifiedPairs match {
      case Some(vp) =>
        // rep-endpoint restriction of the full-corpus verified set (see
        // the Scaladoc contract); the supplied store is already distinct
        val repIds = reps.select(col("doc_id"))
        vp.select(col("i"), col("j"))
          .join(repIds.toDF("i"), Seq("i"), "left_semi")
          .join(repIds.toDF("j"), Seq("j"), "left_semi")
      case None => ngramJaccardPairs(
        reps.select(col("doc_id"), col("lang"), col("text")),
        n = n, threshold = threshold, blockCols = Seq(col("lang"))).distinct()
    })
    val cc = connectedComponents(
      reps.select(col("doc_id")), pairs, maxIters = maxIters)
    val repToks = reps.filter(col("tsz") > 0)
      .select(col("doc_id").as("tk_id"),
        call_function("graft_shingle_hashes", col("text"), lit(n)).as("tk"))
    val memberRows = memberBase
      .join(cc.toDF("rid", "rep"), col("rep0") === col("rid"))
      .join(repToks, col("doc_id") === col("tk_id"), "left")
      .select(col("doc_id"), col("rep0"), col("rep"), col("lang"),
        col("fp"), col("tsz"), nullLong("dst"), col("tk").as("toks"))
    val edgeRows = pairs.select(col("i").as("doc_id"), nullLong("rep0"),
      nullLong("rep"), lit(null).cast("string").as("lang"),
      lit(null).cast("string").as("fp"), lit(null).cast("int").as("tsz"),
      col("j").as("dst"), lit(null).cast("array<bigint>").as("toks"))
    memberRows.unionByName(edgeRows)
  }

  /** The serving projection of [[componentsIndex]]: the `(doc_id, rep)`
    * component map d8/d12/x20 consume — bit-identical to
    * [[nearDupComponents]] over the corpus the store was built from.
    */
  def componentsFromIndex(store: DataFrame): DataFrame =
    store.filter(col("dst").isNull).select(col("doc_id"), col("rep"))

  /** TAKEDOWN on the components store, INDEX-ONLY — the repair
    * [[componentsDelete]] did by re-shingling affected components'
    * text, done from the store's own edges instead: near-dup edges
    * exist only WITHIN components and deletion only REMOVES evidence,
    * so components holding no revoked member pass through bit-identical
    * (members, edges, labels all untouched), and an affected
    * component's repair is pure graph surgery —
    *
    *  1. CLIQUE repair: a revoked doc leaves its exact-duplicate
    *     clique; if the clique REP was revoked, the min surviving
    *     member becomes the new rep (its text is identical, so every
    *     edge and the stored shingle set transfer EXACTLY — no
    *     re-verification is even possible to get wrong); a clique with
    *     no survivors dies with its edges.
    *  2. EDGE repair: endpoints relabel through the clique map; edges
    *     touching dead cliques drop; orientation re-canonicalizes
    *     (i < j — relabeling can reorder two cliques' rep ids).
    *  3. RE-CLOSURE: min-label propagation ([[connectedComponents]])
    *     over the affected components' SURVIVING reps and edges alone —
    *     the one step where deletion can SPLIT what it touched.
    *
    * Bit-identical to `componentsIndex(survivors)` (IndexDeleteSpec
    * pins it, planted chain-split included) at cost ∝ takedown set +
    * affected components' edge lists — never corpus text, which is
    * what retires the r15 giant-component re-shingle hazard.
    */
  /** Fail fast with a store-shaped message when a caller points a
    * non-store relation at the components lifecycle (the analysis
    * error a missing `fp`/`toks` column produces otherwise names an
    * internal join, not the caller's mistake).
    */
  private def requireComponentsStore(store: DataFrame, op: String): Unit = {
    val need = Seq("doc_id", "rep0", "rep", "lang", "fp", "tsz", "dst", "toks")
    val have = store.columns.toSet
    val missing = need.filterNot(have)
    require(missing.isEmpty,
      s"$op: the index relation is not a components store (build one " +
        s"with componentsIndex / graft_components_index) — missing " +
        s"column(s) ${missing.mkString(", ")}")
  }

  def componentsIndexDelete(store: DataFrame, revoked: DataFrame,
      maxIters: Int = 8): DataFrame = {
    requireComponentsStore(store, "componentsIndexDelete")
    val rev = revoked.select(col("doc_id")).distinct()
    val members = store.filter(col("dst").isNull).transform(persistIfComputed)
    val edges = store.filter(col("dst").isNotNull)
      .select(col("doc_id").as("u"), col("dst").as("v"))
    // affected components (delta-sized): those holding a revoked member
    // Delta frames are lineage-TRUNCATED, not merely persisted (the
    // connectedComponents discipline): every downstream reference to a
    // frame embeds a full COPY of its logical subtree, and the
    // lifecycle ops compose (delete over merge over build in one SQL
    // statement) — without truncation the tree multiplies per level
    // (measured: a 2 GB plan string on the engine's nested-TVF
    // roundtrip). Each truncated frame is takedown/affected-sized,
    // never the corpus.
    val affComps = truncateLineage(members.join(rev, Seq("doc_id"), "left_semi")
      .select(col("rep")).distinct())
    val untouched = members.join(affComps, Seq("rep"), "left_anti")
      .select(storeCols: _*)
    val affMembers = truncateLineage(
      members.join(affComps, Seq("rep"), "left_semi")
        .select(storeCols: _*))
    val affSurv = affMembers.join(rev, Seq("doc_id"), "left_anti")
    // clique repair: new rep0 = min SURVIVING member per (lang, fp)
    // clique (token-bearing docs; empty-token docs stay self-cliques)
    val newRep0 = affSurv.filter(col("tsz") > 0)
      .groupBy(col("lang"), col("fp")).agg(min(col("doc_id")).as("nrep0"))
    // old→new rep relabel map, over affected cliques only; a null nrep0
    // marks a clique with no survivors (its edges die)
    val repRelabel = truncateLineage(affMembers.filter(col("tsz") > 0)
      .groupBy(col("lang"), col("fp")).agg(min(col("rep0")).as("orep"))
      .join(newRep0, Seq("lang", "fp"), "left")
      .select(col("orep"), col("nrep0")))
    // the clique's stored shingle evidence rides on the OLD rep's row
    // (which may itself be revoked) — identical text makes the transfer
    // to the new rep exact by construction
    val cliqueToks = affMembers
      .filter(col("doc_id") === col("rep0") && col("tsz") > 0)
      .select(col("lang").as("tl"), col("fp").as("tf"), col("toks").as("ctoks"))
    // edge repair: affected components' edges relabel through the map
    // (edges only ever connect token-bearing reps, so both endpoints
    // resolve); dead-clique edges drop; orientation re-canonicalizes
    val affOldReps = affMembers.filter(col("doc_id") === col("rep0"))
      .select(col("doc_id").as("u"))
    val affEdges = edges.join(affOldReps, Seq("u"), "left_semi")
    val untouchedEdges = edges.join(affOldReps, Seq("u"), "left_anti")
    val newEdges = truncateLineage(affEdges
      .join(repRelabel.toDF("u", "nu"), Seq("u"))
      .join(repRelabel.toDF("v", "nv"), Seq("v"))
      .filter(col("nu").isNotNull && col("nv").isNotNull)
      .select(least(col("nu"), col("nv")).as("i"),
        greatest(col("nu"), col("nv")).as("j")))
    // re-closure over the affected components' surviving reps + edges
    val survM = affSurv
      .join(newRep0, Seq("lang", "fp"), "left")
      .select(col("doc_id"),
        when(col("tsz") > 0, col("nrep0")).otherwise(col("doc_id"))
          .as("rep0"),
        col("lang"), col("fp"), col("tsz"))
    val newReps = survM.select(col("rep0").as("doc_id")).distinct()
    val cc = connectedComponents(newReps, newEdges, maxIters = maxIters)
    val repairedMembers = survM
      .join(cc.toDF("rid", "rep"), col("rep0") === col("rid"))
      .join(cliqueToks,
        col("lang") === col("tl") && col("fp") === col("tf"), "left")
      .select(col("doc_id"), col("rep0"), col("rep"), col("lang"),
        col("fp"), col("tsz"), nullLong("dst"),
        when(col("doc_id") === col("rep0") && col("tsz") > 0,
          col("ctoks")).as("toks"))
    val edgeRows = untouchedEdges.select(col("u").as("i"), col("v").as("j"))
      .unionByName(newEdges)
      .select(col("i").as("doc_id"), nullLong("rep0"), nullLong("rep"),
        lit(null).cast("string").as("lang"),
        lit(null).cast("string").as("fp"), lit(null).cast("int").as("tsz"),
        col("j").as("dst"), lit(null).cast("array<bigint>").as("toks"))
    untouched.unionByName(repairedMembers).unionByName(edgeRows)
  }

  /** COMPACTION on the components store — the append half of
    * [[componentsIndexDelete]] (disjoint-doc_id snapshot contract, the
    * d25 discipline): fold an arriving drop into the persisted graph
    * WITHOUT re-reading base text. The index-only insight: old reps'
    * texts are unchanged, so their pairwise similarity is unchanged —
    * the base edge set is already COMPLETE for old×old, and the only
    * pair generation the merge owes is new×new and new×old.
    *
    *  1. CLIQUE matching: drop docs collapse to `(lang, fp)` cliques;
    *     a clique matching a base clique JOINS it (identical text —
    *     the store's `fp` column exists for exactly this probe). A
    *     drop doc with an id below the base rep takes over as rep —
    *     pure relabeling, since identical text transfers every edge
    *     and the shingle evidence exactly.
    *  2. PAIR generation: new×new runs the standard two-sided PPJoin
    *     over the drop reps' text ([[ngramJaccardPairs]]); new×old
    *     uses the ONE-SIDED prefix filter (J(A,B) ≥ t ⇒ A's
    *     (|A|−⌈t·|A|⌉+1)-prefix under ANY total order intersects B —
    *     the [[containmentPairs]] probe shape): drop-side rarest-first
    *     prefixes (base-df order for selectivity; correctness is
    *     order-independent) probe the base-rep postings EXPLODED FROM
    *     THE STORE'S OWN `toks` evidence, semi-join-pruned to prefix
    *     tokens, and exact hashed-set Jaccard on (drop toks, stored
    *     toks) decides. Base text never read.
    *  3. RE-CLOSURE: components touched by a relabel or a new cross
    *     pair — plus all new cliques — re-close over their (relabeled)
    *     stored edges plus the new pairs; untouched components pass
    *     through bit-identical, and a matched clique in an untouched
    *     component just gains member rows under its existing labels.
    *
    * Bit-identical to `componentsIndex(base ∪ drop)` (spec-pinned,
    * including the comp-bridging and rep-takeover cases), and the
    * lifecycle roundtrips: `componentsIndexDelete(merge(idx, drop),
    * drop) ≡ idx`. Cost ∝ drop + prefix-matched postings + affected
    * components' edges; the store's one full-relation pass (the
    * postings explode) is index-sized and map-side.
    */
  /** The `(bid, blang, bsz, p)` posting rows of a components store's
    * rep evidence — exactly what [[componentsIndexMerge]]'s new×old
    * probe explodes per call. Deterministic per store snapshot, so the
    * fit channel can MATERIALIZE it (bucketed by `p`) and hand it back
    * via `basePostings`: the merge then plans zero index-sized work —
    * cost ∝ drop + matched postings, the full pin discipline.
    */
  def componentsPostings(store: DataFrame): DataFrame = {
    requireComponentsStore(store, "componentsPostings")
    store.filter(col("dst").isNull)
      .filter(col("doc_id") === col("rep0") && col("tsz") > 0)
      .select(col("doc_id").as("bid"), col("lang").as("blang"),
        size(col("toks")).as("bsz"), explode(col("toks")).as("p"))
  }

  /** Per-token document frequency over [[componentsPostings]] — the
    * rarest-first prefix-ordering table. Pure selectivity heuristic
    * (the one-sided prefix bound holds under ANY total order), so a
    * caller-staged copy only changes candidate counts, never pairs.
    */
  def componentsDf(postings: DataFrame): DataFrame =
    postings.groupBy(col("p")).agg(count(lit(1)).as("df"))

  def componentsIndexMerge(store: DataFrame, drop: DataFrame, n: Int = 1,
      threshold: Double = 0.95, maxIters: Int = 8,
      basePostings: Option[DataFrame] = None,
      baseDf: Option[DataFrame] = None): DataFrame = {
    requireComponentsStore(store, "componentsIndexMerge")
    val members = store.filter(col("dst").isNull).transform(persistIfComputed)
    val edges = store.filter(col("dst").isNotNull)
      .select(col("doc_id").as("u"), col("dst").as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("fp"))
    val dropAug = drop
      .select(col("doc_id"), col("lang"), col("text"),
        md5(col("text")).as("fp"),
        size(graft.functions.TextFunctions.tokenSet(col("text"))).as("tsz"))
      .withColumn("dmin",
        when(col("tsz") > 0, min(col("doc_id")).over(w))
          .otherwise(col("doc_id")))
      .transform(persistTracked)
    // base cliques (token-bearing): rep0 is constant per clique, rep is
    // the clique's component label
    val baseCliques = members.filter(col("tsz") > 0)
      .groupBy(col("lang"), col("fp"))
      .agg(min(col("rep0")).as("brep0"), min(col("rep")).as("brep"))
    // Drop-derived delta frames are lineage-TRUNCATED (see
    // componentsIndexDelete's note): the lifecycle ops compose, and
    // every downstream reference would otherwise copy the whole
    // upstream subtree into the plan. Each is drop-sized.
    val dropCliques = truncateLineage(dropAug.filter(col("tsz") > 0)
      .select(col("lang"), col("fp"), col("dmin")).distinct()
      .join(baseCliques, Seq("lang", "fp"), "left")
      .withColumn("nrep0",
        least(col("dmin"), coalesce(col("brep0"), col("dmin")))))
    // rep takeover map: matched cliques whose min moved below the base rep
    val rl = dropCliques
      .filter(col("brep0").isNotNull && col("nrep0") =!= col("brep0"))
      .select(col("brep0").as("orep"), col("nrep0"))
    // genuinely NEW rep vertices: unmatched drop cliques' reps
    val newCliques = dropCliques.filter(col("brep0").isNull)
      .select(col("lang"), col("fp"), col("nrep0"))
    val newRepDocs = truncateLineage(dropAug
      .join(newCliques, Seq("lang", "fp"), "left_semi")
      .filter(col("doc_id") === col("dmin"))
      .select(col("doc_id"), col("lang"), col("text")))
    // new×new: the standard two-sided PPJoin over drop-rep text
    // (distinct — the build's edge-store discipline)
    val nnPairs = truncateLineage(ngramJaccardPairs(newRepDocs, n = n,
      threshold = threshold, blockCols = Seq(col("lang"))).distinct())
    // new×old: one-sided prefix probe of the store's own evidence
    val newToks = truncateLineage(newRepDocs
      .select(col("doc_id"),  col("lang"),
        call_function("graft_shingle_hashes", col("text"), lit(n)).as("toks"))
      .withColumn("sz", size(col("toks"))))
    val baseReps = members
      .filter(col("doc_id") === col("rep0") && col("tsz") > 0)
      .select(col("doc_id").as("bid"), col("lang").as("blang"),
        col("toks").as("btoks"), size(col("toks")).as("bsz"))
      .transform(persistIfComputed)
    // the new×old probe side: caller-staged (the pin store posture —
    // zero index-sized work in the merge) or exploded from the store's
    // own evidence inline (the TVF path)
    val basePost = basePostings.getOrElse(
      baseReps.select(col("bid"), col("blang"), col("bsz"),
        explode(col("btoks")).as("p")))
    val dfTab = baseDf.getOrElse(componentsDf(basePost))
    val wN = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("p"))
    val newPrefix = newToks
      // exact-decimal ceiling — the ngramJaccardPairs plen note
      .withColumn("plen",
        col("sz") - ceil(lit(java.math.BigDecimal.valueOf(threshold))
          * col("sz")).cast("int") + 1)
      .select(col("doc_id"), col("lang"), col("sz"), col("plen"),
        explode(col("toks")).as("p"))
      .join(dfTab, Seq("p"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("rk", row_number().over(wN))
      .filter(col("rk") <= col("plen"))
      .select(col("doc_id"), col("lang"), col("sz"), col("p"))
      .transform(truncateLineage)
    // postings-side pruning (the containmentPairs discipline): only
    // tokens appearing in some drop prefix can seed a candidate
    val prefToks = newPrefix.select(col("lang").as("blang"), col("p")).distinct()
    val prunedPost = basePost.join(prefToks, Seq("blang", "p"), "left_semi")
    val cand = newPrefix.join(prunedPost,
        newPrefix("lang") === prunedPost("blang") &&
          newPrefix("p") === prunedPost("p") &&
          sizeRatioAtLeast(col("sz"), col("bsz"), threshold))
      .select(col("doc_id").as("nid"), col("bid")).distinct()
    val noPairs = cand
      .join(newToks.select(col("doc_id").as("nid"), col("toks").as("ntoks"),
        col("sz").as("nsz")), Seq("nid"))
      .join(baseReps.select(col("bid"), col("btoks"), col("bsz")), Seq("bid"))
      .withColumn("inter", call_function("graft_intersect_size",
        col("ntoks"), col("btoks")).cast("double"))
      .withColumn("uni",
        col("nsz").cast("double") + col("bsz").cast("double") - col("inter"))
      .filter(col("uni") > 0 && col("inter") / col("uni") >= threshold)
      .select(col("nid"), col("bid"))
      .transform(truncateLineage)
    // affected components: a rep takeover or a new cross edge touches them
    val affComps = truncateLineage(dropCliques
      .filter(col("brep0").isNotNull && col("nrep0") =!= col("brep0"))
      .select(col("brep").as("rep"))
      .union(noPairs.select(col("bid").as("doc_id"))
        .join(members.select(col("doc_id"), col("rep")), Seq("doc_id"))
        .select(col("rep")))
      .distinct())
    val untouched = members.join(affComps, Seq("rep"), "left_anti")
      .select(storeCols: _*)
    // old edges split by component; affected ones relabel through the map
    val repComp = members.filter(col("doc_id") === col("rep0"))
      .select(col("doc_id").as("u"), col("rep"))
    val affOldRepIds = repComp.join(affComps, Seq("rep"), "left_semi")
      .select(col("u"))
    val affE = edges.join(affOldRepIds, Seq("u"), "left_semi")
    val keepE = edges.join(affOldRepIds, Seq("u"), "left_anti")
    val affERl = affE
      .join(rl.toDF("u", "nu"), Seq("u"), "left")
      .join(rl.toDF("v", "nv"), Seq("v"), "left")
      .select(least(coalesce(col("nu"), col("u")),
          coalesce(col("nv"), col("v"))).as("i"),
        greatest(coalesce(col("nu"), col("u")),
          coalesce(col("nv"), col("v"))).as("j"))
    val noPairsRl = noPairs
      .join(rl.toDF("bid", "nb"), Seq("bid"), "left")
      .select(least(col("nid"), coalesce(col("nb"), col("bid"))).as("i"),
        greatest(col("nid"), coalesce(col("nb"), col("bid"))).as("j"))
    val ccEdges = persistTracked(
      affERl.unionByName(nnPairs.select(col("i"), col("j")))
        .unionByName(noPairsRl))
    // re-closure vertices: affected comps' reps (post-takeover) + new reps
    val affOldM = members.join(affComps, Seq("rep"), "left_semi")
      .join(rl.toDF("rep0", "nr"), Seq("rep0"), "left")
      .select(col("doc_id"),
        coalesce(col("nr"), col("rep0")).as("rep0"),
        col("lang"), col("fp"), col("tsz"), col("toks"))
      .transform(persistTracked)
    val ccVerts = affOldM.select(col("rep0").as("doc_id"))
      .union(newCliques.select(col("nrep0").as("doc_id"))).distinct()
    val cc = connectedComponents(ccVerts, ccEdges, maxIters = maxIters)
      .toDF("rid", "crep")
    // old member rows of affected comps: relabeled rep0, re-closed rep;
    // a taken-over rep's row is no longer the clique rep — its toks
    // move to the drop-side takeover row (identical text, exact)
    val affMembersOut = affOldM
      .join(cc, col("rep0") === col("rid"))
      .select(col("doc_id"), col("rep0"), col("crep").as("rep"),
        col("lang"), col("fp"), col("tsz"), nullLong("dst"),
        when(col("doc_id") === col("rep0"), col("toks")).as("toks"))
    // drop member rows: clique labels via the (lang, fp) probe; comp
    // label from the closure when their comp was re-closed, the stored
    // label when they joined an untouched component, self for
    // empty-token singletons
    val dropM = dropAug
      .join(dropCliques.select(col("lang"), col("fp"), col("nrep0"),
        col("brep")), Seq("lang", "fp"), "left")
      .select(col("doc_id"), col("lang"), col("fp"), col("tsz"),
        col("text"),
        when(col("tsz") > 0, col("nrep0")).otherwise(col("doc_id"))
          .as("rep0"),
        col("brep"))
    val dropMembersOut = dropM
      .join(cc, col("rep0") === col("rid"), "left")
      .select(col("doc_id"), col("rep0"),
        coalesce(col("crep"), col("brep"), col("doc_id")).as("rep"),
        col("lang"), col("fp"), col("tsz"), nullLong("dst"),
        when(col("doc_id") === col("rep0") && col("tsz") > 0,
          call_function("graft_shingle_hashes", col("text"), lit(n)))
          .as("toks"))
    val edgeRows = keepE.select(col("u").as("i"), col("v").as("j"))
      .unionByName(ccEdges)
      .select(col("i").as("doc_id"), nullLong("rep0"), nullLong("rep"),
        lit(null).cast("string").as("lang"),
        lit(null).cast("string").as("fp"), lit(null).cast("int").as("tsz"),
        col("j").as("dst"), lit(null).cast("array<bigint>").as("toks"))
    untouched.unionByName(affMembersOut).unionByName(dropMembersOut)
      .unionByName(edgeRows)
  }

  /** Duplicated-span EXCISION — the span-granular REWRITE behind Lee et
    * al. ACL'22's ExactSubstr dedup (the scoring half is d10): every
    * token position covered by an `n`-token span occurring in MORE THAN
    * ONE document is removed and the document is kept, stripping
    * boilerplate/template text that whole-document dedup cannot see.
    * Documented divergence from the paper's keep-one-occurrence rule:
    * ALL occurrences excise — cross-document boilerplate has no
    * canonical owner, keep-one needs a global occurrence order, and for
    * template text removing every copy is the curation intent.
    *
    * Output: `(doc_id, n_tokens, n_removed, clean_text)` — one row per
    * input document, `clean_text` the surviving tokens in order.
    *
    * Scale shape: span candidates are xxhash64'd MAP-SIDE so the
    * doc-frequency aggregate and the qualify re-join shuffle fixed-width
    * longs, never span text (the d1/d10 bodies-never-move discipline);
    * covered positions collapse to a per-doc int array; the rebuild is a
    * codegen'd order-preserving indexed filter, map-side. The one join
    * that touches bodies — cover map back to documents — shuffles ONLY
    * the cover side when `docs` carries a doc_id-co-partitioned layout
    * (the bucketed-corpus posture, `Bucketing`/`bucketedDocsShared`);
    * callers rewriting at corpus scale should pass the bucketed scan,
    * which is exactly what d20 does (plan-asserted: text never enters a
    * shuffle). Hash collisions would excise an innocent span; the d20
    * oracle recomputes on raw span strings, so collision-freedom on the
    * corpus is part of the gate (d10's discipline).
    */
  def spanExcise(docs: DataFrame, n: Int = 8,
      textCol: String = "text"): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    val toks = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col(textCol)).as("toks"))
    // persisted (Dedup lifecycle): feeds the df aggregate AND the
    // qualify join — without it the tokenize+shingle+hash pass that
    // dominates the cost runs twice
    val g = persistPublic(toks.filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.wordShingles(col("toks"), n)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        xxhash64(col("col")).as("gh")))
    val dupSpans = g.groupBy(col("gh"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("gh"))
    val covers = g.join(dupSpans, Seq("gh"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + n - 1)).as("i"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("i")).as("cov"))
    toks.join(covers.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        filter(col("toks"), (_, i) => !coalesce(
          array_contains(col("cov"), i + 1), lit(false))).as("kept"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - size(col("kept"))).cast("long").as("n_removed"),
        array_join(col("kept"), " ").as("clean_text"))
  }

  /** CHARACTER-granular duplicated-span excision — [[spanExcise]] at
    * Lee et al. ACL'22's actual granularity: the paper removes
    * duplicated substrings of >= 50 CHARACTERS, not token windows, so
    * duplication that straddles token boundaries or lives inside long
    * tokens (URLs, code, CJK text with no whitespace) is visible here
    * and invisible to d20/d21. Every character position covered by an
    * `n`-char window (of the LOWERCASED text, the engine's clean-text
    * contract) occurring in MORE THAN ONE document excises; the union
    * of qualifying n-windows is exactly the paper's maximal duplicated
    * substring (the d21 window-fidelity property, restated in the
    * character domain). Output `(doc_id, n_chars, n_removed,
    * clean_text)`.
    *
    * Same machinery and 100 TB posture as [[spanExcise]] — windows
    * xxhash64 map-side (substring enumeration; bodies never shuffle),
    * ONE doc-frequency aggregate on the hash, per-doc int cover
    * arrays, codegen'd indexed rebuild over the per-code-point array
    * (`regexp_extract_all('(?s).')` — dot-matches-newline so the char
    * array is exactly `length(t)` long on both engines; surrogate
    * pairs stay fused, the u7 discipline). Candidate volume is
    * ~mean-token-length× d20's (one window per CHARACTER position):
    * the price of the finer granularity, still fixed-width rows on a
    * bounded key — no all-pairs stage, no suffix array to build or
    * shard.
    */
  def spanExciseChars(docs: DataFrame, n: Int = 40,
      textCol: String = "text"): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    val base = docs.select(col("doc_id"), lower(col(textCol)).as("t"))
    val g = persistPublic(charWindowHashes(docs, n, textCol))
    val dupSpans = g.groupBy(col("gh"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("gh"))
    val covers = g.join(dupSpans, Seq("gh"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + n - 1)).as("i"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("i")).as("cov"))
    rebuildExcisedChars(base, covers)
  }

  /** Shared char-domain rebuild: drop every 0-based position in the
    * per-doc `cov` int array from `base(doc_id, t)` — the d24 indexed
    * filter over the per-code-point array (`(?s).` so newlines count
    * and the array is exactly `length(t)` long; surrogates stay
    * fused). Used by [[spanExciseChars]] and the char-level
    * decontamination surgery ([[Decontaminate.charOverlapExcise]]).
    *
    * EVERY cover join-back in this file carries a `shuffle_hash` hint
    * on the cover side (r19, found by the sf10 decade): Catalyst's
    * size-only estimator prices the `collect_set` aggregate at the
    * array type's DEFAULT width, so the covers frame — whose real rows
    * are per-doc position arrays ∝ document length — estimates under
    * the broadcast threshold and the planner silently BROADCASTS it.
    * At sf0.1 that fits and even flatters the bench; at sf10 the build
    * side is 12 GiB and the job dies on Spark's 8 GiB broadcast cap —
    * and at 100 TB it would be catastrophic long before that. The hint
    * pins the documented plan: covers shuffle on doc_id (the only
    * exchange when the corpus side is bucketed), hash-built per
    * partition, never driver-collected.
    */
  private[operators] def rebuildExcisedChars(base: DataFrame,
      covers: DataFrame): DataFrame =
    base.join(covers.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        length(col("t")).cast("long").as("n_chars"),
        filter(expr("regexp_extract_all(t, '(?s).', 0)"), (_, i) =>
          !coalesce(array_contains(col("cov"), i), lit(false))).as("kept"))
      .select(col("doc_id"), col("n_chars"),
        (col("n_chars") - size(col("kept"))).cast("long").as("n_removed"),
        array_join(col("kept"), "").as("clean_text"))

  /** KEEP-ONE duplicated-span dedup — Lee et al. ACL'22's actual
    * ExactSubstr rule, where [[spanExcise]] is the stricter
    * template-removal variant: every `n`-token span occurring MORE THAN
    * ONCE in the corpus (any repeat, INCLUDING within one document —
    * count(*), not distinct-doc count) keeps exactly its CANONICAL
    * occurrence — the (doc_id, pos)-minimum, a deterministic global
    * order both engines share — and every other occurrence's positions
    * excise. The corpus retains one copy of every repeated passage
    * instead of losing it everywhere (the paper's "remove all but one").
    *
    * Overlap semantics (documented): covers are the UNION of non-keeper
    * occurrence positions, so a keeper occurrence can still lose
    * positions to a DIFFERENT span's non-keeper occurrence overlapping
    * it — the span-cover composition rule, same as [[spanExcise]]/c10.
    *
    * Output and scale shape are [[spanExcise]]'s: `(doc_id, n_tokens,
    * n_removed, clean_text)`; spans hash map-side (xxhash64 — bodies
    * never move), the keeper election is ONE struct-min aggregate on
    * the hashed key, covers are per-doc int arrays, and the join-back
    * exchanges only the cover side when `docs` is doc_id-bucketed (the
    * d20 posture — pass the bucketed scan at corpus scale).
    */
  def spanExciseKeepOne(docs: DataFrame, n: Int = 8,
      textCol: String = "text"): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    val toks = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col(textCol)).as("toks"))
    val g = persistPublic(toks.filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.wordShingles(col("toks"), n)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        xxhash64(col("col")).as("gh")))
    // keeper election: min (doc_id, pos) per duplicated span — one
    // map-combinable struct-min over the hashed key
    val dup = g.groupBy(col("gh"))
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("pos"))).as("keep"))
      .filter(col("cnt") > 1)
      .select(col("gh"), col("keep"))
    val covers = g.join(dup, Seq("gh"))
      .filter(!(col("doc_id") === col("keep.doc_id")
        && col("pos") === col("keep.pos")))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + n - 1)).as("i"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("i")).as("cov"))
    toks.join(covers.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        filter(col("toks"), (_, i) => !coalesce(
          array_contains(col("cov"), i + 1), lit(false))).as("kept"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - size(col("kept"))).cast("long").as("n_removed"),
        array_join(col("kept"), " ").as("clean_text"))
  }

  /** INCREMENTAL span excision — the daily-crawl form of
    * [[spanExciseKeepOne]]: an arriving drop is excised against a BASE
    * corpus's persisted span-hash index (every position of a drop
    * document covered by an n-token span the base already contains is
    * removed; the base's copy is the canonical occurrence, so this is
    * the keep-one rule with the base as keeper). Within-drop
    * duplication is deliberately out of scope here (documented
    * divergence — handled at ingest by the composed
    * [[spanExciseAgainstIndexKeepOne]] (d22c) or at compaction by
    * [[spanExciseKeepOne]]); the per-document decision depends ONLY on the
    * static index, which is what makes the flow stateless and gives it
    * a zero-state streaming twin (`EventsStream.spanExciseStream`).
    *
    * `spanIndex` carries one `gh` column — the base's DISTINCT xxhash64
    * span hashes, built once per snapshot (the mh_index/tfidf_pairs
    * materialized-index lifecycle). Scale shape: drop spans hash
    * map-side, the probe is ONE left-semi equi join on the hash (only
    * (doc_id, pos, gh) rows shuffle — bodies never move), covers are
    * per-doc int arrays, the rebuild is the shared order-preserving
    * indexed filter.
    */
  def spanExciseAgainstIndex(drop: DataFrame, spanIndex: DataFrame,
      n: Int = 8, textCol: String = "text"): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    val toks = drop.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col(textCol)).as("toks"))
    val g = toks.filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.wordShingles(col("toks"), n)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        xxhash64(col("col")).as("gh"))
    val covers = g.join(spanIndex.select(col("gh")), Seq("gh"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + n - 1)).as("i"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("i")).as("cov"))
    toks.join(covers.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        filter(col("toks"), (_, i) => !coalesce(
          array_contains(col("cov"), i + 1), lit(false))).as("kept"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - size(col("kept"))).cast("long").as("n_removed"),
        array_join(col("kept"), " ").as("clean_text"))
  }

  /** Build the Bloom prefilter [[spanExciseAgainstIndexBloom]] probes —
    * one aggregate over the persisted span-hash index. Production
    * builds this ONCE per index snapshot and persists/memoizes it
    * alongside the index (the materialized-index lifecycle — see
    * `Pipeline.spanBloomShared`): the build is an eager Spark action,
    * so it must not hide inside a serving operator's construction.
    * `expectedSpans <= 0` derives the capacity from the index itself
    * (one count) instead of guessing — an undersized filter silently
    * degrades fpp and with it the whole point of the prefilter.
    */
  def spanIndexBloom(spanIndex: DataFrame, expectedSpans: Long = 0L,
      fpp: Double = 0.01): graft.functions.SerializableBloom = {
    val idx = spanIndex.select(col("gh"))
    val cap = if (expectedSpans > 0) expectedSpans
      else math.max(1L, idx.count())
    graft.functions.SerializableBloom.from(
      idx.stat.bloomFilter("gh", cap, fpp))
  }

  /** [[spanExciseAgainstIndex]] with a BLOOM prefilter on the probe —
    * same output bit-for-bit (false positives die in the exact
    * left-semi verify; the c3 `ngramOverlapBloom` discipline), sized
    * for the 100 TB regime where the interesting drop is mostly CLEAN:
    * the broadcast bloom (~1.2 bytes/span-hash at 1% fpp) rejects
    * non-matching spans MAP-SIDE, so the verify shuffle carries only
    * probable hits (~hit-rate + 1% of drop spans) instead of every span
    * of every arriving document. `bloom` is the PREBUILT filter for the
    * index snapshot ([[spanIndexBloom]] — built once, persisted/memoized
    * beside the index): taking it as an argument keeps this operator's
    * construction lazy (no hidden index scan when a plan is merely
    * rendered) and keeps the one-build-per-snapshot cost out of every
    * serving call.
    */
  def spanExciseAgainstIndexBloom(drop: DataFrame, spanIndex: DataFrame,
      bloom: graft.functions.SerializableBloom,
      n: Int = 8, textCol: String = "text"): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    import org.apache.spark.sql.GraftSqlBridge
    import graft.functions.BloomContains
    val idx = spanIndex.select(col("gh"))
    val probe = GraftSqlBridge.column(
      BloomContains(GraftSqlBridge.expressionNoSpark(col("gh")), bloom))
    val toks = drop.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col(textCol)).as("toks"))
    val g = toks.filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.wordShingles(col("toks"), n)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        xxhash64(col("col")).as("gh"))
      .filter(probe) // map-side: only probable hits reach the shuffle
    val covers = g.join(idx, Seq("gh"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + n - 1)).as("i"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("i")).as("cov"))
    toks.join(covers.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        filter(col("toks"), (_, i) => !coalesce(
          array_contains(col("cov"), i + 1), lit(false))).as("kept"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - size(col("kept"))).cast("long").as("n_removed"),
        array_join(col("kept"), " ").as("clean_text"))
  }

  /** [[spanExciseAgainstIndex]] COMPOSED with within-drop keep-one — the
    * d22c rule closing d22's documented divergence (two copies of a new
    * passage arriving in the SAME drop both survived to compaction): a
    * drop position excises when its span is in the BASE index (the base
    * is keeper — every drop occurrence goes), OR when the span is NOT
    * in the base but occurs MORE THAN ONCE within the drop
    * ([[spanExciseKeepOne]]'s count(*) rule over the drop alone) and
    * this occurrence is not the drop-internal canonical
    * (doc_id, pos)-minimum. Equivalent to running keep-one over
    * base ∪ drop restricted to drop rows whenever the index is the
    * base's span set — without ever touching base bodies.
    *
    * Scale shape: ONE left join against the index (the membership flag
    * replaces d22's semi probe — unique `gh` by the
    * [[spanIndexCounted]] contract), ONE struct-min keeper election
    * over the drop's non-base spans (map-combinable, keyed on the
    * hash), the shared int-cover aggregate and indexed-filter rebuild.
    * Everything is keyed on `gh`/`doc_id` — bodies never shuffle.
    *
    * Streaming: the within-drop half is per-BATCH by construction (two
    * copies in different microbatches cannot see each other — the
    * documented streaming divergence, pinned by spec): the continuous
    * twin applies the composed rule inside each arriving batch and
    * equals this operator batch-for-batch; cumulative equality with
    * one big batch holds exactly when duplicate copies co-arrive.
    */
  def spanExciseAgainstIndexKeepOne(drop: DataFrame, spanIndex: DataFrame,
      n: Int = 8, textCol: String = "text"): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    val toks = drop.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col(textCol)).as("toks"))
    // persisted (Dedup lifecycle): feeds the keeper election AND the
    // cover union — the tokenize+shingle+hash+probe pass runs once
    val g = persistPublic(toks.filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.wordShingles(col("toks"), n)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        xxhash64(col("col")).as("gh"))
      .join(spanIndex.select(col("gh"), lit(1).as("inb")),
        Seq("gh"), "left"))
    val baseCov = g.filter(col("inb").isNotNull)
      .select(col("doc_id"), col("pos"))
    val dupInDrop = g.filter(col("inb").isNull)
      .groupBy(col("gh"))
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("pos"))).as("keep"))
      .filter(col("cnt") > 1)
      .select(col("gh"), col("keep"))
    val dropCov = g.filter(col("inb").isNull)
      .join(dupInDrop, Seq("gh"))
      .filter(!(col("doc_id") === col("keep.doc_id")
        && col("pos") === col("keep.pos")))
      .select(col("doc_id"), col("pos"))
    val covers = baseCov.unionByName(dropCov)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + n - 1)).as("i"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("i")).as("cov"))
    toks.join(covers.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        filter(col("toks"), (_, i) => !coalesce(
          array_contains(col("cov"), i + 1), lit(false))).as("kept"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - size(col("kept"))).cast("long").as("n_removed"),
        array_join(col("kept"), " ").as("clean_text"))
  }

  /** Per-document char-window hash frame `(doc_id, pos, gh)` over the
    * LOWERCASED text (0-based char positions, xxhash64 of each n-char
    * window) — the shared map-side stage of the d24/d27 char family.
    * Bodies never shuffle; only these fixed-width rows do.
    */
  private def charWindowHashes(docs: DataFrame, n: Int,
      textCol: String): DataFrame =
    docs.select(col("doc_id"), lower(col(textCol)).as("t"))
      .filter(length(col("t")) >= n)
      .select(col("doc_id"),
        explode(sequence(lit(0), length(col("t")) - n)).as("pos"), col("t"))
      .select(col("doc_id"), col("pos"),
        xxhash64(expr(s"substring(t, pos + 1, $n)")).as("gh"))

  /** The delete-capable CHAR-window index — [[spanIndexCounted]] at
    * d24's granularity: one row per distinct n-char window hash with
    * its document frequency `(gh, nd)`. Same counted-rows contract:
    * probes project `gh`, the count makes takedown
    * ([[spanIndexCharsDelete]]) and compaction
    * ([[spanIndexCharsMerge]]) possible without a rebuild.
    */
  def spanIndexCountedChars(base: DataFrame, n: Int = 40,
      textCol: String = "text"): DataFrame = {
    require(n >= 2, s"window length must be >= 2, got $n")
    charWindowHashes(base, n, textCol)
      .select(col("doc_id"), col("gh")).distinct()
      .groupBy(col("gh")).agg(count(lit(1)).as("nd"))
  }

  /** Takedown on the char-window index — [[spanIndexDelete]]'s delta
    * arithmetic at char granularity: decrements from the revoked docs'
    * own windows, hashes reaching nd = 0 drop. Bit-identical to
    * `spanIndexCountedChars(survivors)` (spec-pinned); cost ∝ revoked
    * text, never the corpus.
    */
  def spanIndexCharsDelete(index: DataFrame, revoked: DataFrame,
      n: Int = 40, textCol: String = "text"): DataFrame = {
    require(n >= 2, s"window length must be >= 2, got $n")
    val delta = charWindowHashes(revoked, n, textCol)
      .select(col("doc_id"), col("gh")).distinct()
      .groupBy(col("gh")).agg(count(lit(1)).as("rc"))
    index.join(delta, Seq("gh"), "left")
      .select(col("gh"),
        (col("nd") - coalesce(col("rc"), lit(0L))).as("nd"))
      .filter(col("nd") > 0)
  }

  /** Compaction on the char-window index — [[spanIndexMerge]]'s
    * full-outer fold at char granularity; bit-identical to rebuilding
    * over base ∪ drop for disjoint doc_ids, and
    * `delete(merge(idx, drop), drop) ≡ idx` roundtrips (spec-pinned).
    */
  def spanIndexCharsMerge(index: DataFrame, drop: DataFrame,
      n: Int = 40, textCol: String = "text"): DataFrame = {
    require(n >= 2, s"window length must be >= 2, got $n")
    val delta = charWindowHashes(drop, n, textCol)
      .select(col("doc_id"), col("gh")).distinct()
      .groupBy(col("gh")).agg(count(lit(1)).as("dc"))
    index.join(delta, Seq("gh"), "full_outer")
      .select(col("gh"),
        (coalesce(col("nd"), lit(0L)) + coalesce(col("dc"), lit(0L)))
          .as("nd"))
  }

  /** INCREMENTAL char-window excision — the daily-crawl form of
    * [[spanExciseChars]] (exactly [[spanExciseAgainstIndex]]'s rule at
    * d24's granularity): every char position of an arriving drop
    * document covered by an n-char window the BASE index already holds
    * is removed — the base's copy is canonical, so this is keep-one
    * with the base as keeper. The per-document decision reads only the
    * static index, so the flow is stateless and has a zero-state
    * streaming twin (`EventsStream.charExciseStream`); within-drop
    * duplication is out of scope here exactly as in d22 (handled at
    * compaction by [[spanExciseChars]] over the merged corpus).
    * One left-semi equi join on the hash; the rebuild is the shared
    * d24 per-code-point indexed filter.
    */
  def spanExciseCharsAgainstIndex(drop: DataFrame, charIndex: DataFrame,
      n: Int = 40, textCol: String = "text"): DataFrame = {
    require(n >= 2, s"window length must be >= 2, got $n")
    val covers = charWindowHashes(drop, n, textCol)
      .join(charIndex.select(col("gh")), Seq("gh"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + n - 1)).as("i"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("i")).as("cov"))
    rebuildExcisedChars(
      drop.select(col("doc_id"), lower(col(textCol)).as("t")), covers)
  }

  /** The base-snapshot span-hash index [[spanExciseAgainstIndex]]
    * probes: one row per DISTINCT n-token span hash in `base`. Persist
    * the result per corpus snapshot (the minhashIndex discipline).
    */
  def spanIndex(base: DataFrame, n: Int = 8,
      textCol: String = "text"): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    base.select(explode(graft.functions.TextFunctions.wordShingles(
        graft.functions.TextFunctions.tokens(col(textCol)), n)).as("s"))
      .select(xxhash64(col("s")).as("gh"))
      .distinct()
  }

  /** The DELETE-CAPABLE form of [[spanIndex]]: one row per distinct
    * span hash with its document frequency — `(gh, nd)`, nd = how many
    * base documents contain the span. Serving probes project `gh` and
    * see exactly [[spanIndex]]'s distinct-hash relation (the grouping
    * key is unique), but the count is what makes TAKEDOWN possible
    * without a rebuild: [[spanIndexDelete]] decrements `nd` by each
    * revoked document's contribution and drops hashes that reach zero —
    * a distinct-only index cannot know whether a surviving document
    * still holds the span. Same build shape (map-side xxhash64, one
    * groupBy on the hash — bodies never shuffle), one long column wider.
    */
  def spanIndexCounted(base: DataFrame, n: Int = 8,
      textCol: String = "text"): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    base.select(col("doc_id"), explode(
        graft.functions.TextFunctions.wordShingles(
          graft.functions.TextFunctions.tokens(col(textCol)), n)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("gh"))
      .distinct()
      .groupBy(col("gh"))
      .agg(count(lit(1)).as("nd"))
  }

  /** TAKEDOWN on the span-hash index — the compliance half of the
    * incremental lifecycle (d22/`spanExciseStream` only ever APPEND
    * probes; a revoked-document request must REMOVE the document's
    * contribution without rebuilding over the surviving corpus): given
    * the COUNTED index ([[spanIndexCounted]]) and the revoked documents
    * themselves (`doc_id`, text — a takedown set is tiny and its bodies
    * are at hand), recompute ONLY the revoked documents' distinct span
    * hashes, decrement each hash's document frequency, and drop hashes
    * whose count reaches zero. Bit-identical to
    * `spanIndexCounted(survivors)` — pinned by IndexDeleteSpec and
    * gated end-to-end by d23's oracle (DuckDB rebuilds from the
    * surviving corpus's raw span STRINGS; Spark runs the delta
    * arithmetic on the stale hashed index).
    *
    * Scale shape: the per-hash delta aggregates over the REVOKED set
    * only (O(revoked text), map-side hashed); the merge is one equi
    * join on `gh` against the index — the index never rebuilds and the
    * surviving corpus is never read. `revoked` must be the revoked
    * subset of the SAME base snapshot the index was built from (text
    * included); revoking a document twice is a caller error the counts
    * would silently absorb, so dedup the request set first.
    */
  def spanIndexDelete(index: DataFrame, revoked: DataFrame, n: Int = 8,
      textCol: String = "text"): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    val delta = revoked.select(col("doc_id"), explode(
        graft.functions.TextFunctions.wordShingles(
          graft.functions.TextFunctions.tokens(col(textCol)), n)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("gh"))
      .distinct()
      .groupBy(col("gh"))
      .agg(count(lit(1)).as("rc"))
    index.join(delta, Seq("gh"), "left")
      .select(col("gh"),
        (col("nd") - coalesce(col("rc"), lit(0L))).as("nd"))
      .filter(col("nd") > 0)
  }

  /** MERGE a drop INTO the counted span-hash index — the compaction
    * half of the store lifecycle ([[spanIndexDelete]] is the takedown
    * half; d22/d22c only PROBE the index, they never advance it):
    * per-hash document-frequency deltas aggregate over the DROP alone
    * (map-side hashed — the delete path's delta shape with the sign
    * flipped) and one full-outer merge on `gh` sums the counts.
    * Bit-identical to `spanIndexCounted(base ∪ drop)` when the drop's
    * doc_ids are disjoint from the base's (the snapshot contract;
    * IndexDeleteSpec pins the equality AND the roundtrip
    * `delete(merge(idx, drop), drop) ≡ idx`). Merge cost ∝ drop text +
    * one index-keyed join — the base corpus is never read.
    */
  def spanIndexMerge(index: DataFrame, drop: DataFrame, n: Int = 8,
      textCol: String = "text"): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    val delta = drop.select(col("doc_id"), explode(
        graft.functions.TextFunctions.wordShingles(
          graft.functions.TextFunctions.tokens(col(textCol)), n)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("gh"))
      .distinct()
      .groupBy(col("gh"))
      .agg(count(lit(1)).as("dd"))
    index.join(delta, Seq("gh"), "full_outer")
      .select(col("gh"),
        (coalesce(col("nd"), lit(0L)) + coalesce(col("dd"), lit(0L)))
          .as("nd"))
  }

  /** MERGE a drop INTO the full tf-idf postings index — the compaction
    * half of [[postingsDelete]]: the drop's tf rows append, every
    * touched gram's df rises by the drop's per-gram doc count, and
    * n_docs rises by the drop size — all computed from the drop and
    * the index alone (the base corpus is never read; the one
    * index-wide aggregate is the O(1)-per-row-group `max` of the
    * constant n_docs column, null ⇒ 0 so merging into an EMPTY index
    * bootstraps it). Bit-identical to `tfidfPostingsFull(base ∪ drop)`
    * for disjoint doc_ids — band migrations included, since the store
    * is unbanded and [[postingsBand]] re-derives (IndexDeleteSpec pins
    * the equality and the delete-roundtrip identity).
    */
  def postingsMerge(full: DataFrame, drop: DataFrame,
      textCol: String = "text"): DataFrame = {
    val dtf = drop.select(col("doc_id"), explode(
        graft.functions.TextFunctions.wordShingles(
          graft.functions.TextFunctions.tokens(col(textCol)), 2)).as("gram"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("tf"))
    val delta = dtf.groupBy(col("gram")).agg(count(lit(1)).as("dd"))
    val nDrop = drop.agg(count(lit(1)).as("__n_drop"))
    val n0 = full.agg(coalesce(max(col("n_docs")), lit(0L)).as("__n0"))
    val oldDf = full.select(col("gram"), col("df")).distinct()
    val updatedOld = full.join(delta, Seq("gram"), "left")
      .select(col("gram"), col("doc_id"), col("tf"),
        (col("df") + coalesce(col("dd"), lit(0L))).as("df"))
    val fresh = dtf.join(delta, Seq("gram"))
      .join(oldDf.select(col("gram"), col("df").as("df0")),
        Seq("gram"), "left")
      .select(col("gram"), col("doc_id"), col("tf"),
        (coalesce(col("df0"), lit(0L)) + col("dd")).as("df"))
    updatedOld.unionByName(fresh)
      .crossJoin(broadcast(nDrop))
      .crossJoin(broadcast(n0))
      .select(col("gram"), col("doc_id"), col("tf"), col("df"),
        (col("__n0") + col("__n_drop")).as("n_docs"))
  }

  /** MERGE a drop into the UNCAPPED MinHash band index — compaction for
    * [[minhashIndexDelete]]'s store: signatures are per-document, so
    * the merge is the drop's own (uncapped) index rows unioned in;
    * bit-identical to `minhashIndex(base ∪ drop, maxBandBucket = 0)`
    * for disjoint doc_ids, and the serve cap ([[minhashIndexCap]])
    * re-derives — a bucket pushed OVER the cap by the merge stops
    * serving, exactly as a rebuild would decide.
    */
  def minhashIndexMerge(index: DataFrame, drop: DataFrame,
      shingleLen: Int = 3, numHashes: Int = 32,
      bands: Int = 8): DataFrame =
    index.unionByName(minhashIndex(drop, shingleLen, numHashes, bands,
      maxBandBucket = 0))

  /** MERGE a drop into the streaming prefix index
    * ([[incrementalIndex]]): the drop's postings compute under the
    * drop's OWN df order and union in — like [[prefixIndexDelete]],
    * the merged bytes drift from a rebuild (df orders differ) but the
    * index stays VALID (each document's prefix length depends only on
    * its own size, selected under A consistent order), so candidates
    * remain a superset and served answers equal the rebuilt index's —
    * the d19 frozen-index contract, same as the delete side.
    */
  def prefixIndexMerge(index: DataFrame, drop: DataFrame,
      num: Int = 4, den: Int = 5,
      blockCols: Seq[Column] = Seq(col("lang"))): DataFrame =
    index.unionByName(incrementalIndex(drop, num, den, blockCols))

  /** INCREMENTAL tf-idf pair maintenance — ONE definition shared by the
    * g14 batch query and the streaming twin
    * (`EventsStream.incrementalPairsStream`), the shardManifest
    * discipline: a drop's weighted-overlap edges INTO the base computed
    * against the persisted base POSTINGS index `(gram, doc_id, tf, w)`
    * (base df band, base n_docs/df weights) without re-running the
    * base×base build. Drop tf computes per (doc, gram) from the drop
    * alone; ONE gram-keyed equi join probes the df-banded postings
    * (df ≤ band bound ⇒ candidate fan-out ∝ drop size); per-pair terms
    * replay t14's exact multiplication order and the sum decimal-routes
    * — bit-identical to the slice of a full rebuild that touches the
    * drop, under the FROZEN-INDEX approximation (drop grams weight by
    * the base's df/N; df drift and drop×drop edges accrue to the next
    * refit — the a9/d19 contract). Output: `(base_id, drop_id,
    * n_shared, score)`.
    */
  /** The FULL (unbanded) tf-idf postings index —
    * `(gram, doc_id, tf, df, n_docs)`, one row per (doc, 2-gram), df
    * over ALL grams, n_docs riding as a constant column (not derivable
    * from the rows: docs too short to post any gram still count).
    * This is the persisted store ([[postingsBand]] serves the banded
    * view; [[postingsDelete]] runs takedowns on it). Build shape: one
    * tf aggregate + one df aggregate + a broadcast 1-row count.
    */
  def tfidfPostingsFull(docs: DataFrame,
      textCol: String = "text"): DataFrame = {
    val tf = docs.select(col("doc_id"), explode(
        graft.functions.TextFunctions.wordShingles(
          graft.functions.TextFunctions.tokens(col(textCol)), 2)).as("gram"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, Seq("gram"))
      .crossJoin(broadcast(n))
      .select(col("gram"), col("doc_id"), col("tf"), col("df"),
        col("n_docs"))
  }

  /** Serve-time df band over a FULL postings index
    * (`(gram, doc_id, tf, df, n_docs)` — the unbanded inverted index
    * the storage layer persists): keep grams with df in
    * [`minDf`, `maxDf`] and weight them n_docs/df — the
    * `(gram, doc_id, tf, w)` relation [[incrementalTfidfPairs]] probes.
    * Banding at SERVE time (one codegen'd filter+projection over the
    * scan — no shuffle) instead of build time is what makes the index
    * delete-capable: after [[postingsDelete]] shifts df, a gram that
    * fell INTO the band serves correctly because its rows were never
    * discarded.
    */
  def postingsBand(full: DataFrame, minDf: Int = 2,
      maxDf: Int = 25): DataFrame =
    full.filter(col("df").between(minDf, maxDf))
      .select(col("gram"), col("doc_id"), col("tf"),
        (col("n_docs").cast("double") / col("df")).as("w"))

  /** TAKEDOWN on the tf-idf postings index — remove a revoked document
    * set's contribution from the persisted FULL index
    * (`(gram, doc_id, tf, df, n_docs)`) without reading the surviving
    * corpus: the revoked rows themselves carry every (gram, doc)
    * posting being withdrawn, so the per-gram df delta is ONE aggregate
    * over exactly those rows, n_docs drops by the revoked-document
    * count (aggregated from the request relation, NOT derived from the
    * index: documents too short to post any gram still count toward
    * n_docs, so the index alone cannot know it — which is why the
    * request must list every revoked base doc, posting or not), and
    * the merge is one equi join on `gram`. Grams whose df reaches zero
    * vanish with their last posting. Bit-identical to rebuilding the
    * full index over the surviving corpus (IndexDeleteSpec), and
    * end-to-end through the serve band DuckDB re-derives from raw text
    * (the d23b gate).
    *
    * `revoked` is a `(doc_id)` relation of revoked BASE documents —
    * distinct ids, each a member of the index's base snapshot (a doc
    * revoked twice would double-decrement; a non-member would
    * under-count n_docs).
    */
  def postingsDelete(full: DataFrame, revoked: DataFrame): DataFrame = {
    val ids = revoked.select(col("doc_id"))
    val gone = full.join(ids, Seq("doc_id"), "left_semi")
      .groupBy(col("gram")).agg(count(lit(1)).as("rc"))
    val nRev = ids.agg(count(lit(1)).as("__n_rev"))
    full.join(ids, Seq("doc_id"), "left_anti")
      .join(gone, Seq("gram"), "left")
      .crossJoin(broadcast(nRev))
      .select(col("gram"), col("doc_id"), col("tf"),
        (col("df") - coalesce(col("rc"), lit(0L))).as("df"),
        (col("n_docs") - col("__n_rev")).as("n_docs"))
      .filter(col("df") > 0)
  }

  def incrementalTfidfPairs(drop: DataFrame, postings: DataFrame,
      textCol: String = "text"): DataFrame = {
    val dropTf = drop
      .select(col("doc_id").as("drop_id"), explode(
        graft.functions.TextFunctions.wordShingles(
          graft.functions.TextFunctions.tokens(col(textCol)), 2)).as("gram"))
      .groupBy(col("drop_id"), col("gram"))
      .agg(count(lit(1)).as("tf_d"))
    postings.join(dropTf, Seq("gram"))
      .select(col("doc_id").as("base_id"), col("drop_id"),
        (((col("tf") * col("tf_d")).cast("double") * col("w")) * col("w"))
          .cast("decimal(28,12)").as("term"))
      .groupBy(col("base_id"), col("drop_id"))
      .agg(count(lit(1)).as("n_shared"),
        sum(col("term")).cast("double").as("score"))
  }

  /** License/restrictiveness propagation across near-dup components —
    * the compliance rule of training-data curation: a copy of a
    * restrictively-licensed document is just as restricted, so the MOST
    * restrictive class inside a connected component governs every
    * member. `comp` is a (doc_id, rep) component map (typically the
    * persisted [[connectedComponents]] closure), `docs` carries the
    * columns `rank` reads (a license-registry lookup in production);
    * output is one row per doc: `(doc_id, rep, own_rank, comp_rank,
    * n_members, upgraded)`. One equi join + one map-combinable
    * groupBy(rep) max + one join back — no window, no
    * vertex-cardinality broadcast; the governance twin of the d12
    * quality-keeper canonicalization.
    */
  def licensePropagation(comp: DataFrame, docs: DataFrame,
      rank: Column): DataFrame = {
    val ranked = comp.join(docs, Seq("doc_id"))
      .select(col("doc_id"), col("rep"), rank.cast("int").as("own_rank"))
    val compMax = ranked.groupBy(col("rep"))
      .agg(max(col("own_rank")).as("comp_rank"),
        count(lit(1)).as("n_members"))
    ranked.join(compMax, Seq("rep"))
      .select(col("doc_id"), col("rep"), col("own_rank"),
        col("comp_rank"), col("n_members"),
        (col("comp_rank") > col("own_rank")).as("upgraded"))
  }

  /** NEAR-dup leakage across dataset-split boundaries — the
    * eval-integrity check exact-fingerprint flags cannot see: a
    * paraphrased copy of a training document sitting in val/test
    * inflates every benchmark it touches. `comp` is a (doc_id, rep)
    * component map (the persisted [[connectedComponents]] closure),
    * `split` a (doc_id, split) assignment (s3's md5 buckets, or any
    * deterministic labeling); a component whose members land in more
    * than one split is leaky and EVERY member is flagged — train-side
    * copies tell the curator what to drop, eval-side copies what is
    * compromised. One groupBy(rep) distinct-split count (the split
    * domain is tiny, so per-group state is bounded) + one join back —
    * no window, no vertex-cardinality broadcast.
    */
  def crossSplitLeakage(comp: DataFrame, split: DataFrame): DataFrame = {
    val joined = comp.join(split, Seq("doc_id"))
    val per = joined.groupBy(col("rep"))
      .agg(countDistinct(col("split")).as("n_splits"),
        count(lit(1)).as("n_members"))
    joined.join(per, Seq("rep"))
      .select(col("doc_id"), col("rep"), col("split"),
        col("n_members"), col("n_splits"),
        (col("n_splits") > 1).as("leaky"))
  }

  /** SimHash near-dup: 64-bit signature, 16-bit band blocking, exact
    * hamming-distance verification.
    */
  def simhash(
      docs: DataFrame, maxHamming: Int = 3, maxBandBucket: Int = 0): DataFrame =
    attachRep(docs, simhashPairs(docs, maxHamming, maxBandBucket))

  /** The verified (i < j) pair set behind [[simhash]]: 64-bit signatures
    * from the codegen'd `graft_simhash`, banded and hamming-verified by
    * [[simhashPairsFromSig]].
    */
  def simhashPairs(
      docs: DataFrame, maxHamming: Int = 3, maxBandBucket: Int = 0): DataFrame =
    // graft_simhash fuses tokenize→hash→64-bit vote into one codegen'd
    // pass per document: no explode, no 64-column aggregate, no shuffle
    simhashPairsFromSig(
      docs.select(col("doc_id"), call_function("graft_simhash", col("text")).as("sig")),
      maxHamming, maxBandBucket)

  /** Band-block + exact-hamming-verify over ANY precomputed 64-bit
    * signature column (doc_id, sig). With 4 bands of 16 bits, recall for
    * hamming <= `maxHamming` <= 3 is EXACT by pigeonhole: 3 differing bits
    * cannot touch all 4 bands, so every qualifying pair shares at least one
    * intact band. Exposed separately so alternative signature functions
    * (e.g. the portable md5-bit signature behind the d4p oracle gate) reuse
    * the identical banding/verification machinery.
    */
  def simhashPairsFromSig(
      sigs: DataFrame, maxHamming: Int = 3, maxBandBucket: Int = 0): DataFrame = {
    require(maxHamming < 4, "4 bands of 16 bits guarantee recall only for hamming <= 3")
    // maxBandBucket is OPT-IN here (0 = off), unlike minhashLsh: capping a
    // simhash band silently voids the hamming<=3 recall guarantee above,
    // and unlike minhash mega-buckets the dropped docs are not necessarily
    // exact duplicates that d1 would catch. Enable it knowingly on
    // adversarial corpora.
    val withSig = persistTracked(sigs)
    val banded = capBuckets(
      withSig.select(
        col("doc_id"), col("sig"),
        posexplode(simhashBands(col("sig"), 4)).as(Seq("band", "bucket"))),
      Seq("band", "bucket"), maxBandBucket)
    val l = banded.alias("l")
    val r = banded.alias("r")
    l.join(r,
        col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.doc_id") < col("r.doc_id"))
      .filter(hamming64(col("l.sig"), col("r.sig")) <= maxHamming)
      .select(col("l.doc_id").as("i"), col("r.doc_id").as("j"))
    // NOTE: a pair sharing several intact bands appears once per band —
    // duplicate-insensitive consumers (attachRep's min) take it as-is;
    // pair-set consumers (the d4p gate) distinct() at their boundary
  }

  /** Incremental snapshot-probe dedup — the daily-crawl flow: for each
    * PROBE document, does it near-duplicate anything in the BASE corpus
    * at word-level Jaccard ≥ `num/den`? [[ngramJaccardPairs]]'s PPJoin
    * machinery made ASYMMETRIC: df-ordered prefixes are built per side
    * and only base-prefix × probe-prefix pairs are candidates — the
    * base never self-joins (at 100 TB the base's prefix index builds
    * once and persists; the daily drop probes it).
    *
    * INTEGER-exact throughout, which is why the threshold is a rational
    * `num/den` rather than a double: the overlap bound is
    * ceil(num·sz/den) = (num·sz + den − 1) div den — a double
    * ceil(t·sz) overshoots whenever t·sz is an unrepresentable exact
    * multiple (e.g. 0.8·10) and silently shortens the prefix below the
    * PPJoin-safe bound — and the verify is den·|A∩B| ≥ num·|A∪B|, no
    * floats anywhere.
    *
    * Returns one row per probe doc: `(doc_id, n_dups, first_dup
    * (-1 when none), is_new)`. Token-less probe docs are trivially new.
    * Scratch frames are [[persistPublic]]-tracked — release with
    * [[unpersistAll]].
    */
  def incrementalDedup(base: DataFrame, probe: DataFrame,
      num: Int = 4, den: Int = 5,
      blockCols: Seq[Column] = Seq(col("lang")),
      shingleLen: Int = 1): DataFrame = {
    require(num >= 1 && den >= 1 && num <= den,
      s"incrementalDedup: threshold num/den must be a fraction in (0, 1], " +
        s"got $num/$den")
    require(shingleLen >= 1, s"shingleLen must be >= 1, got $shingleLen")
    // shingleLen = 1 is the word-Jaccard contract (d17); larger values
    // run the SAME exact prefix-filter machinery in the n-shingle
    // domain — the EXACT-recall twin of [[incrementalMinhash]]'s LSH
    // probe (prefix filtering is pure pruning, so the verified result
    // is the full exact answer, which is what lets a quadratic SQL
    // oracle pin it structurally — the d19p gate discipline)
    def toks(docs: DataFrame, side: String) = docs
      .select(col("doc_id"), struct(blockCols: _*).as("block"),
        call_function("graft_shingle_hashes", col("text"), lit(shingleLen))
          .as("toks"))
      .withColumn("sz", size(col("toks")))
      .filter(col("sz") > 0)
      .withColumn("plen",
        col("sz") - expr(s"($num * sz + ${den - 1}) div $den") + 1)
      .withColumn("side", lit(side))
    val both = persistPublic(
      toks(base, "b").unionByName(toks(probe, "p")))
    val dfTab = both.select(explode(col("toks")).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("side")).orderBy(col("df"), col("p"))
    val prefixes = persistPublic(both
      .select(col("doc_id"), col("side"), col("block"), col("plen"),
        col("sz"), explode(col("toks")).as("p"))
      .join(dfTab, Seq("p"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("plen"))
      .select(col("doc_id"), col("side"), col("block"), col("p"),
        col("sz")))
    val cand = prefixes.filter(col("side") === "b")
        .select(col("doc_id").as("bid"), col("block"), col("p"),
          col("sz").as("bn"))
      .join(prefixes.filter(col("side") === "p")
          .select(col("doc_id").as("did"), col("block").as("dblock"),
            col("p").as("p2"), col("sz").as("dn")),
        col("block") === col("dblock") && col("p") === col("p2") &&
          lit(den) * least(col("bn"), col("dn")) >=
            lit(num) * greatest(col("bn"), col("dn")))
      .select(col("bid"), col("did")).distinct()
    val sets = both.select(col("doc_id"), col("side"), col("toks"))
    val dups = cand
      .join(sets.filter(col("side") === "b")
        .select(col("doc_id").as("bid"), col("toks").as("bt")), Seq("bid"))
      .join(sets.filter(col("side") === "p")
        .select(col("doc_id").as("did"), col("toks").as("dt")), Seq("did"))
      .withColumn("inter",
        call_function("graft_intersect_size", col("bt"), col("dt"))
          .cast("long"))
      .filter(lit(den) * col("inter") >=
        lit(num) * (size(col("bt")) + size(col("dt")) - col("inter")))
      .groupBy(col("did"))
      .agg(count(lit(1)).as("n_dups"), min(col("bid")).as("first_dup"))
    probe.select(col("doc_id"))
      .join(dups, col("doc_id") === col("did"), "left")
      .select(col("doc_id"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        coalesce(col("first_dup"), lit(-1L)).as("first_dup"),
        col("did").isNull.as("is_new"))
  }

  /** Static base-side prefix index for STREAMING incremental dedup
    * (`EventsStream.incrementalDedupStream` probes it): one row per
    * df-ordered prefix token per base document — `(block, p, bid, bt,
    * bn)` — the base doc's full token set riding along so the exact
    * Jaccard verify runs inside the same microbatch (the
    * [[minhashIndex]] contract). df is computed over the BASE alone:
    * prefix filtering needs only a CONSISTENT total token order, not
    * the probe's df (which hasn't arrived yet) — and the probe side
    * compensates by probing with its FULL token set. One-sided prefix
    * principle: J(A,B) ≥ num/den forces |A∩B| ≥ ceil(num·|A|/den),
    * and an intersection that large cannot avoid A's
    * (|A| − ceil(num·|A|/den) + 1)-prefix, whose tokens B (probed
    * whole) then contains. Candidates are therefore a superset of the
    * two-sided batch machinery's, and the verified result is IDENTICAL
    * to [[incrementalDedup]]'s. Build once per base snapshot and
    * persist or write to parquet — a plain DataFrame, so one index
    * serves any number of streaming jobs. `maxTokenPosting > 0` drops
    * prefix postings hotter than the cap (the [[minhashIndex]] skew
    * trade — approximate; df-ascending prefixes already bias postings
    * cold, so the cap only fires on degenerate token distributions).
    */
  def incrementalIndex(base: DataFrame, num: Int = 4, den: Int = 5,
      blockCols: Seq[Column] = Seq(col("lang")),
      maxTokenPosting: Int = 0): DataFrame = {
    require(num >= 1 && den >= 1 && num <= den,
      s"incrementalIndex: threshold num/den must be a fraction in (0, 1], " +
        s"got $num/$den")
    val toks = base
      .select(col("doc_id").as("bid"), struct(blockCols: _*).as("block"),
        call_function("graft_shingle_hashes", col("text"), lit(1)).as("bt"))
      .withColumn("bn", size(col("bt")))
      .filter(col("bn") > 0)
      .withColumn("plen",
        col("bn") - expr(s"($num * bn + ${den - 1}) div $den") + 1)
    val dfTab = toks.select(explode(col("bt")).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bid")).orderBy(col("df"), col("p"))
    capBuckets(
      toks
        .select(col("bid"), col("block"), col("plen"), col("bt"), col("bn"),
          explode(col("bt")).as("p"))
        .join(dfTab, Seq("p"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= col("plen"))
        .select(col("block"), col("p"), col("bid"), col("bt"), col("bn")),
      Seq("block", "p"), maxTokenPosting)
  }

  /** TAKEDOWN on the streaming prefix index ([[incrementalIndex]]):
    * every posting row belongs to exactly one base document, so removal
    * is ONE anti equi join on `bid`. The deleted index is NOT
    * byte-identical to `incrementalIndex(survivors)` — df shifts with
    * the deletion, and a rebuild would order prefixes under the NEW df —
    * but it remains a VALID prefix index for the same threshold: the
    * one-sided prefix guarantee needs only SOME consistent total token
    * order, and the frozen (stale-df) order is one. Surviving documents
    * keep prefixes at least as long as a rebuild would assign (plen
    * depends only on the doc's own size), so candidates stay a superset
    * and the exact verify makes the PROBE OUTPUT identical to serving
    * the rebuilt index — the equality IndexDeleteSpec pins (the d19
    * frozen-index contract: index bytes drift, served answers do not).
    */
  def prefixIndexDelete(index: DataFrame, revoked: DataFrame): DataFrame =
    index.join(revoked.select(col("doc_id").as("bid")), Seq("bid"), "left_anti")

  /** Exact n-gram (word) Jaccard dedup inside blocking keys, with
    * PPJoin-style prefix filtering (Xiao et al., "Efficient Similarity
    * Joins for Near Duplicate Detection", WWW'08): J(A,B) ≥ t implies
    * |A∩B| ≥ ⌈t·|A|⌉, and any two sets with overlap ≥ o must share an
    * element among the (|X|−o+1) smallest elements of each (global hash
    * order). So candidates are generated ONLY from docs sharing a prefix
    * element — never the full within-block cross product — and every
    * candidate is then verified with the exact Jaccard. Pure pruning:
    * the result is identical to the naive quadratic join.
    */
  def ngramJaccard(
      docs: DataFrame,
      n: Int = 1,
      threshold: Double = 0.95,
      blockCols: Seq[Column] = Seq(col("lang"))): DataFrame =
    attachRep(docs, ngramJaccardPairs(docs, n, threshold, blockCols))

  /** The verified (i < j) duplicate-pair set behind [[ngramJaccard]] —
    * exposed so [[connectedComponents]] can close over the same edges.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      n: Int = 1,
      threshold: Double = 0.95,
      blockCols: Seq[Column] = Seq(col("lang"))): DataFrame = {
    val toks = docs
      .select(
        col("doc_id"),
        struct(blockCols: _*).as("block"),
        call_function("graft_shingle_hashes", col("text"), lit(n)).as("toks"))
      .withColumn("sz", size(col("toks")))
      // prefix length |A| − ⌈t·|A|⌉ + 1 (≥ the minimal safe length).
      // The ceiling is taken over an EXACT DECIMAL product: in doubles,
      // t·sz overshoots whenever t·sz is an exact integer (0.95·20 =
      // 19.000000000000004 → ceil 20), silently shortening the prefix
      // BELOW the safe bound — and the quadratic oracle would then
      // catch the one missed boundary pair as a gate failure. The
      // shortest-decimal rendering of the double (BigDecimal.valueOf)
      // recovers the caller's intended rational exactly.
      .withColumn("plen",
        col("sz") - ceil(lit(java.math.BigDecimal.valueOf(threshold))
          * col("sz")).cast("int") + 1)
      .transform(persistTracked)

    // The global element order for prefixes is (document frequency, hash)
    // ascending — prefixes hold each doc's RAREST elements, so candidate
    // buckets stay tiny. Ordering by raw hash would put globally-common
    // tokens into prefixes and regenerate the quadratic blowup (measured:
    // 2.6M candidate pairs by hash order vs ~thousands by df order at
    // sf0.1). The df table has one row per distinct shingle — word-vocab
    // sized for n=1 but corpus-sized for larger n — so the join strategy
    // is left to Catalyst/AQE (it broadcasts when the table is actually
    // small); the per-doc rank is a window over (doc_id), one narrow
    // shuffle.
    val dfTab = toks
      .select(explode(col("toks")).as("p"))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("p"))
    val prefixes = toks
      .select(col("doc_id"), col("block"), col("plen"), col("sz"),
        explode(col("toks")).as("p"))
      .join(dfTab, Seq("p"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("plen"))
      .select(col("doc_id"), col("block"), col("p"), col("sz"))
      .transform(persistTracked)
    val l = prefixes.alias("l")
    val r = prefixes.alias("r")
    // the size-ratio necessary condition sits IN the join so incompatible
    // pairs die during the probe — exact pruning, identical final result
    val candidates = l.join(r,
        col("l.block") === col("r.block") && col("l.p") === col("r.p") &&
          col("l.doc_id") < col("r.doc_id") &&
          sizeRatioAtLeast(col("l.sz"), col("r.sz"), threshold))
      .select(col("l.doc_id").as("i"), col("r.doc_id").as("j"))

    val sets = toks.select(col("doc_id"), col("toks"), col("sz"))
    val pairs = candidates
      .join(sets.toDF("i", "ti", "ni"), Seq("i"))
      .join(sets.toDF("j", "tj", "nj"), Seq("j"))
      .filter(sizeRatioAtLeast(col("ni"), col("nj"), threshold))
      .withColumn("inter",
        call_function("graft_intersect_size", col("ti"), col("tj")).cast("double"))
      .withColumn("uni",
        col("ni").cast("double") + col("nj").cast("double") - col("inter"))
      .filter(col("uni") > 0 && col("inter") / col("uni") >= threshold)
      .select(col("i"), col("j"))
    pairs
  }

  /** Near-SUPERSET detection: pairs where containment
    * C(A→B) = |A∩B| / |A| ≥ `threshold` — the quote-expansion /
    * boilerplate-wrapper duplicates symmetric Jaccard structurally
    * misses (a 50-token quote inside a 500-token page has J ≈ 0.1 but
    * C = 1.0). Asymmetric prefix filter: only the CONTAINED side keeps
    * a (1−t)·|A|+1 rarest-first prefix (df-ordered, the
    * [[ngramJaccardPairs]] discipline — C ≥ t means at most (1−t)·|A|
    * of A's elements miss B, so a longer prefix must intersect); the
    * container side must be probeable on ANY of its tokens (any one can
    * be the contained doc's rare one), but only tokens that occur in
    * SOME doc's prefix can ever match — so the posting frame is
    * semi-join-pruned to the distinct prefix-token set before the
    * candidate join. Candidates are an EQUI join on (block, token);
    * exact containment decides. Direction
    * is canonical — (sub, super) with |A| < |B|, ties by id — so each
    * pair appears once.
    *
    * Output: (sub_id, super_id, containment).
    */
  def containmentPairs(
      docs: DataFrame,
      n: Int = 1,
      threshold: Double = 0.9,
      blockCols: Seq[Column] = Seq(col("lang"))): DataFrame = {
    val toks = docs
      .select(
        col("doc_id"),
        struct(blockCols: _*).as("block"),
        call_function("graft_shingle_hashes", col("text"), lit(n)).as("toks"))
      .withColumn("sz", size(col("toks")))
      .filter(col("sz") > 0)
      .transform(persistTracked)
    val dfTab = toks
      .select(explode(col("toks")).as("p"))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("p"))
    val prefixes = toks
      .select(col("doc_id"), col("block"), col("sz"),
        // exact-decimal ceiling — see ngramJaccardPairs' plen note (the
        // double form under-lengthens the prefix at t·sz boundaries)
        (col("sz") - ceil(lit(java.math.BigDecimal.valueOf(threshold))
          * col("sz")).cast("int") + 1).as("plen"),
        explode(col("toks")).as("p"))
      .join(dfTab, Seq("p"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("plen"))
      .select(col("doc_id"), col("block"), col("p"), col("sz"))
      .transform(persistTracked) // consumed by the probe AND the pruning semi-join
    // Postings-side pruning: the container side would otherwise explode
    // EVERY token into the candidate join; only tokens appearing in some
    // doc's rarest-first prefix can ever match a probe. The left-semi
    // join against the distinct prefix-token set shares the candidate
    // join's (block, p) keys, so what shuffles into the pair-generating
    // join is O(prefix tokens), not O(total tokens) — and a high-df token
    // with a huge posting list dies here instead of fanning out below.
    val prefixToks = prefixes.select(col("block"), col("p")).distinct()
    val postings = toks
      .select(col("doc_id"), col("block"), col("sz"), explode(col("toks")).as("p"))
      .join(prefixToks, Seq("block", "p"), "left_semi")
    val candidates = prefixes.alias("l").join(postings.alias("r"),
        col("l.block") === col("r.block") && col("l.p") === col("r.p") &&
          (col("l.sz") < col("r.sz") ||
            (col("l.sz") === col("r.sz") && col("l.doc_id") < col("r.doc_id"))))
      .select(col("l.doc_id").as("i"), col("r.doc_id").as("j"))
      .distinct()
    val sets = toks.select(col("doc_id"), col("toks"), col("sz"))
    candidates
      .join(sets.toDF("i", "ti", "ni"), Seq("i"))
      .join(sets.toDF("j", "tj", "nj"), Seq("j"))
      .withColumn("inter",
        call_function("graft_intersect_size", col("ti"), col("tj")).cast("double"))
      .filter(col("inter") / col("ni") >= threshold)
      .select(col("i").as("sub_id"), col("j").as("super_id"),
        (col("inter") / col("ni")).as("containment"))
  }

  /** Embedding near-dup: random-hyperplane LSH buckets → exact cosine
    * verification at `threshold`. Hyperplanes are seed-fixed literals, so
    * bucketing is deterministic across runs and cluster layouts.
    */
  def embeddingCosine(
      embs: DataFrame,
      dim: Int = 64,
      planes: Int = 12,
      threshold: Double = 0.95,
      maxBandBucket: Int = 0): DataFrame = {
    val pairs = embeddingCosinePairs(embs, dim, planes, threshold, maxBandBucket)
    embs
      .join(pairs, embs("vec_id") === pairs("j"), "left")
      .groupBy(embs("vec_id"))
      .agg(coalesce(min(col("i")), first(embs("vec_id"))).as("rep"))
      .select(col("vec_id"), col("rep"))
  }

  /** The verified (i < j) pair set behind [[embeddingCosine]] — every pair
    * shares a hyperplane-sign bucket AND passed the exact cosine check at
    * `threshold` (sound by construction; the d5p gate re-derives the
    * cosine predicate in DuckDB over the flagged pairs).
    */
  def embeddingCosinePairs(
      embs: DataFrame,
      dim: Int = 64,
      planes: Int = 12,
      threshold: Double = 0.95,
      // OPT-IN (0 = off): the hyperplane bucket is the ONLY candidate
      // source here, and embeddings have no exact-dedup fallback — a
      // default cap would silently drop true duplicates in dense regions
      maxBandBucket: Int = 0): DataFrame = {
    val rnd = new scala.util.Random(42)
    val hyper: Seq[Seq[Double]] =
      Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
    val vecD = transform(col("embedding"), x => x.cast("double"))
    // LSH key: sign pattern over `planes` fixed hyperplanes. The dot goes
    // through the fused codegen'd graft_dot kernel (one pass, no
    // intermediate arrays) instead of interpreted aggregate/zip_with
    // lambdas; graft_dot widens float elements exactly and folds strict
    // left-to-right from 0.0, so the sign — and therefore the bucketing —
    // is bit-identical to the composable form it replaces.
    val sigBits = hyper.zipWithIndex.map { case (h, i) =>
      when(call_function("graft_dot", col("embedding"), typedLit(h)) > 0,
        shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    val withKey = capBuckets(
      embs.select(
        col("vec_id"),
        vecD.as("v"),
        sigBits.reduce((a, b) => a.bitwiseOR(b)).as("bucket")),
      Seq("bucket"), maxBandBucket)
      .transform(persistTracked)

    val l = withKey.alias("l")
    val r = withKey.alias("r")
    l.join(r,
        col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
      .filter(Similarity.cosine(col("l.v"), col("r.v")) >= threshold)
      .select(col("l.vec_id").as("i"), col("r.vec_id").as("j"))
  }

  /** Sorted-neighborhood blocking (Hernández & Stolfo's merge/purge):
    * sort documents by a cheap 4-token prefix key inside
    * (lang, first-token) blocks, compare each doc only with its next
    * `window − 1` sort neighbors, keep pairs whose exact token-set
    * Jaccard (scaled ppm, one integer division) clears `minJaccPpm`.
    * Expects columns (doc_id, lang, text); returns
    * (a, b, inter, uni, jacc_ppm).
    *
    * Scale shape: candidate count is ≤ window−1 rows per document BY
    * CONSTRUCTION at any corpus size — the linear-candidate alternative
    * to LSH when near-dups share openings (template families, versioned
    * docs). The neighbor window is PARTITIONED by block; a global sort
    * would funnel the corpus through one task.
    */
  def sortedNeighborhoodPairs(docs: DataFrame, window: Int = 3,
      minJaccPpm: Long = 500000L): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val base = docs
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("lang"),
        element_at(col("toks"), 1).as("block"),
        array_join(slice(col("toks"), 1, 4), " ").as("key"),
        array_distinct(col("toks")).as("ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("block"))
      .orderBy(col("key"), col("doc_id"))
    val withN = (1 until window).foldLeft(base) { (acc, i) =>
      acc.withColumn(s"b$i", lead(col("doc_id"), i).over(w))
        .withColumn(s"t$i", lead(col("ts"), i).over(w))
    }
    val cand = (1 until window).map { i =>
      withN.select(col("doc_id").as("a"), col("ts"),
        col(s"b$i").as("b"), col(s"t$i").as("tb"))
    }.reduce(_.union(_))
      .filter(col("b").isNotNull)
      .select(col("a"), col("b"),
        size(array_intersect(col("ts"), col("tb"))).cast("long").as("inter"),
        (size(col("ts")) + size(col("tb"))
          - size(array_intersect(col("ts"), col("tb"))))
          .cast("long").as("uni"))
    cand
      .select(col("a"), col("b"), col("inter"), col("uni"),
        expr("(inter * 1000000) div uni").as("jacc_ppm"))
      .filter(col("jacc_ppm") >= minJaccPpm)
  }

  /** Winnowing fingerprint selection (Schleimer-Wilkerson-Aiken,
    * SIGMOD'03): md5 token-3-gram hashes, a w=4 sliding window keeps
    * the minimum hash per window with a rightmost-min tie-break —
    * plain winnowing, NOT the paper's "robust" refinement (which also
    * prefers re-selecting the previous window's minimum on ties to
    * lower fingerprint density below the ~2/(w+1) expectation).
    * Selections are deduped. ONE window pass
    * PARTITIONED by doc (a doc's grams fit one task at any corpus
    * size); md5 is the cross-engine hash and `min(struct(fp, −pos))`
    * the shared total order, so the index replays exactly in SQL.
    * Returns `(doc_id, fp_pos, fp)` — the persistable local
    * fingerprint index (the d15 gate surface).
    */
  def winnowFingerprints(docs: DataFrame): DataFrame = {
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, 3)
    val toks = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    val kg = toks.filter(size(col("toks")) >= 6) // k + w - 1
      .select(col("doc_id"), (size(col("toks")) - 2).as("n_kg"),
        posexplode(graft.functions.TextFunctions.wordShingles(col("toks"), 3)))
      .select(col("doc_id"), col("n_kg"), (col("pos") + 1).as("pos"),
        md5(col("col")).as("fp"))
    kg.withColumn("sel",
        min(struct(col("fp"), (-col("pos")).as("np"))).over(wnd))
      .filter(col("pos") <= col("n_kg") - 3) // full windows only
      .select(col("doc_id"), (-col("sel.np")).as("fp_pos"),
        col("sel.fp").as("fp"))
      .distinct()
  }

  /** Near-dup candidate pairs from shared winnowing fingerprints — the
    * serving query over [[winnowFingerprints]]' index: postings
    * (fingerprint → docs) are DF-CAPPED (fingerprints shared by more
    * than `maxDf` docs are boilerplate and dropped — the d13/t13
    * posting-cap discipline that bounds join fan-out at any corpus
    * size), pairs from the capped equi self-join, kept when they share
    * at least `minShared` selected fingerprints. By the winnowing
    * guarantee a shared run of ≥ w+k−1 tokens forces ≥ 1 shared
    * fingerprint, so recall on long verbatim overlaps is structural,
    * not probabilistic.
    */
  def winnowPairs(docs: DataFrame, maxDf: Int = 20,
      minShared: Long = 2L): DataFrame = {
    require(maxDf >= 2, s"maxDf must be >= 2, got $maxDf")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val fps = winnowFingerprints(docs)
      .select(col("doc_id"), col("fp")).distinct()
    val keep = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("fp"))
    val posting = fps.join(keep, Seq("fp"), "left_semi")
    posting.as("x").join(posting.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
