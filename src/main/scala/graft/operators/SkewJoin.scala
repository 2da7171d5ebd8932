package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skew that AQE cannot fix.
  *
  * Spark's AQE skew-join splits oversized SHUFFLE partitions at runtime and
  * is the first line of defense (enabled session-wide, see
  * [[graft.GraftSession]]). It does not help when the skew is in the KEYS
  * themselves inside a single task's hash table — a handful of hot keys
  * (the empty document, a boilerplate fingerprint, a null-ish sentinel)
  * each matching millions of rows on both sides. Salting fixes that shape
  * explicitly: the big side appends a uniform salt in [0, saltFactor) to
  * the key, the small side is replicated once per salt value, and the join
  * runs on (key, salt) — every hot key fans out over `saltFactor`
  * partitions instead of serializing on one straggler task.
  *
  * Cost model: the small side is materialized `saltFactor`× (explode over
  * a literal range — no shuffle of its own, it re-shuffles with the join),
  * so keep `saltFactor` ≲ 32 and the small side genuinely small. The big
  * side's salt is `pmod(xxhash64(monotonically_increasing_id()), n)` —
  * deterministic per row *within a run* and uniform, which is all the join
  * needs (row→salt assignment never affects the result set, only the
  * partition a row lands in; no RNG, no partition-index dependence in the
  * OUTPUT).
  *
  * Inner and left-outer joins are supported — the replicated-right shapes
  * where salting is sound: every left row holds exactly one salt, and all
  * right copies carry every salt, so per-row match sets are identical to
  * the unsalted join's.
  *
  * Caveat: `big` and `small` must not share lineage (a self-join) — the
  * `salted(k) === replicated(k)` condition would then trip Spark's
  * ambiguous self-join attribute resolution. Alias/deduplicate one side
  * first (e.g. re-read the table, or `small.select(...)` fresh columns).
  */
object SkewJoin {

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "salted join needs at least one key")
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "left" || jt == "leftouter",
      s"salting is sound for inner/left joins of a replicated right side, not $joinType")
    // withColumn would silently REPLACE a pre-existing __salt, changing the
    // caller's data — refuse instead
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    val cond = (keys.map(k => salted(k) === replicated(k)) :+
      (salted("__salt") === replicated("__salt"))).reduce(_ && _)
    val joined = salted.join(replicated, cond, joinType)
    // drop the salt and the right side's duplicate key columns — same
    // output columns as big.join(small, keys, joinType)
    val rightCols = small.columns.filterNot(keys.contains)
    joined.select(
      keys.map(salted(_)) ++
        big.columns.filterNot(keys.contains).map(salted(_)) ++
        rightCols.map(replicated(_)): _*)
  }

  /** The `n` most frequent key tuples of `df` — the profiling pass the
    * hybrid router needs. One map-combined count aggregate, then the
    * global-top-n form of [[graft.plans.TopKPerKey]] (bounded heap, no
    * full sort of the key space), so the pass is one shuffle of (key,
    * count) partials regardless of key cardinality. Ties on count break
    * by the key values for determinism.
    */
  def hotKeyProfile(df: DataFrame, keys: Seq[String], n: Int = 16): Seq[Seq[Any]] = {
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__cnt"))
    graft.plans.TopKPerKey(counts, Seq.empty,
        col("__cnt").desc +: keys.map(col(_).asc), n)
      .select(keys.map(col): _*)
      .collect().map(_.toSeq).toSeq
  }

  /** Hybrid skew join: rows with a profiled hot key get a uniform salt in
    * [0, saltFactor), the long tail gets salt 0, and the small side is the
    * union of per-salt hot-key replicas and single salt-0 tail rows — all
    * computed as ONE conditional projection per input, so the big side is
    * scanned exactly once (the round-5 shape filtered the big side twice,
    * doubling the dominant cost of a 100 TB fact scan). The result equals
    * `big.join(small, keys, joinType)` row-for-row; only the physical
    * distribution changes — hot keys fan out over `saltFactor` tasks
    * instead of serializing on one straggler, and tail keys join their
    * single salt-0 replica as before.
    *
    * Match-exactness: a hot big row (salt s) meets exactly the one replica
    * of each matching small row carrying salt s; a tail big row (salt 0)
    * meets exactly the one salt-0 copy of each matching small row. Hot and
    * tail key sets are disjoint by construction, so no row matches both
    * branches of the small side.
    *
    * The profile pass is one bounded-heap aggregate over the big side
    * ([[hotKeyProfile]]); pass `hotKeys` explicitly to skip it (e.g. when
    * profiled on a sample or reused across runs) — `Some(Seq.empty)`
    * degenerates to the plain join.
    */
  def hybridJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      hotKeys: Option[Seq[Seq[Any]]] = None,
      saltFactor: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "hybrid join needs at least one key")
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "left" || jt == "leftouter",
      s"salting is sound for inner/left joins of a replicated right side, not $joinType")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    val hot = hotKeys.getOrElse(hotKeyProfile(big, keys))
    if (hot.isEmpty) big.join(small, keys, joinType)
    else {
      val salted = big.withColumn("__salt",
        when(isHot(keys.map(big(_)), hot),
            pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)))
          .otherwise(lit(0L)).cast("int"))
      val replicated = small.withColumn("__salt",
        explode(when(isHot(keys.map(small(_)), hot),
            sequence(lit(0), lit(saltFactor - 1)))
          .otherwise(array(lit(0)))))
      val cond = (keys.map(k => salted(k) === replicated(k)) :+
        (salted("__salt") === replicated("__salt"))).reduce(_ && _)
      val joined = salted.join(replicated, cond, joinType)
      val rightCols = small.columns.filterNot(keys.contains)
      joined.select(
        keys.map(salted(_)) ++
          big.columns.filterNot(keys.contains).map(salted(_)) ++
          rightCols.map(replicated(_)): _*)
    }
  }

  /** Column expression flagging rows whose key falls in `hotKeys` — for the
    * hybrid plan: route hot keys through [[saltedJoin]] and the long tail
    * through a plain (or broadcast) join, then union. Hot keys usually come
    * from a cheap `df.groupBy(keys).count().orderBy(desc("count")).limit(n)`
    * profiling pass over a sample.
    */
  def isHot(keys: Seq[Column], hotKeys: Seq[Seq[Any]]): Column =
    if (hotKeys.isEmpty) lit(false)
    else hotKeys.map { vals =>
      require(vals.length == keys.length, "each hot key needs one value per key column")
      keys.zip(vals).map { case (k, v) => k <=> lit(v) }.reduce(_ && _)
    }.reduce(_ || _)
}
