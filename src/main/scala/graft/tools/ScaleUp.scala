package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SF-1 scale rehearsal data generator (r17 verdict task): replicate
  * the driver's sf0.1 testdata `reps`× into a larger dataset with the
  * same schemas and slice conventions, so the bench can measure how
  * every plan SCALES rather than how it performs at one size. The
  * reference ships SF-1 generation targets its suite never runs at
  * that scale (/root/reference/Makefile:63-92); this is the Spark-side
  * equivalent, derived from the driver's own parquet rather than a
  * second generator.
  *
  * Replication rules (all deterministic):
  *  - `region`/`nation` copy once — TPC-H scaling holds the small
  *    dimensions fixed; every other table's nation references stay
  *    valid.
  *  - fact/dim keys shift by `i * 10_800_000` per replica `i`, the
  *    SAME constant on both sides of every foreign key (orderkey,
  *    custkey, partkey, suppkey, event/user ids, doc_id, vec_id), so
  *    join cardinalities scale exactly linearly. The offset is
  *    divisible by 4, 10, 25, AND 360, so every doc_id/vec_id
  *    mod-slice convention in the suite — %25 snapshots/drops, %10
  *    takedowns, %4 vector slices, and the %360 ingest-day phase
  *    behind the retention/x27 expiry — replicates each slice
  *    EXACTLY, not just proportionally (r18: the former 10_000_000 is
  *    not divisible by 360, so each replica's ingest-day phase
  *    rotated and the expiry slice drifted per replica).
  *  - document text maps every token through a replica-specific
  *    bijection (`tok` -> `r<i>_tok`, applied in EVERY replica so the
  *    mapping is collision-proof and all replicas share one length
  *    profile): in-replica duplicate/span/secret structure is
  *    preserved EXACTLY while replica vocabularies stay disjoint — pair generators see 10 independent shards and their
  *    work grows linearly, which is the property that makes
  *    super-linear wall growth attributable to the PLAN instead of to
  *    a quadratic blow-up planted by the data itself. (Vocabulary
  *    growing with corpus size is also the realistic Heaps'-law
  *    direction.)
  *  - embeddings perturb per (replica, component) with ±0.22 integer
  *    lattice noise: replicas of one vector land at cosine ~0.9,
  *    below every near-dup threshold in the suite, so ANN/dedup pair
  *    counts also scale linearly.
  *  - events keep their timestamps (10× density in the same window —
  *    the realistic direction for a busier day) under shifted user
  *    ids, so per-user session/window structure replicates exactly.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/sf1"
    val reps = if (args.length > 2) args(2).toInt else 10
    val spark = graft.GraftSession.build(appName = "graft-scaleup")
    // CHAINING (r19, the sf10 decade): a second ScaleUp pass over an
    // already-scaled dir MUST use a larger offset — reusing the default
    // lands replica (i, j) ids at base + Off·(i+j), colliding every
    // anti-diagonal (three copies of one doc_id at i+j=2, triangular
    // multiplicity instead of 10× distinct docs). Pass an offset ≥
    // 10× the default for the second decade (its multiples keep every
    // mod-slice divisibility below); token prefixes compose
    // (`r<j>_r<i>_tok`), so replica vocabularies stay disjoint.
    val Off = if (args.length > 3) args(3).toLong
      else 10800000L // lcm-friendly: % 4, 10, 25, 360 all zero
    require(Off % 1800 == 0, // lcm(4, 10, 20, 25, 360)
      s"offset must preserve the %4/%10/%20/%25/%360 slice conventions, got $Off")

    def raw(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"scaleup: wrote $name")
    }

    def shifted(df: DataFrame, keys: Seq[String])(
        extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until reps).map { i =>
        val s = keys.foldLeft(df)((acc, k) =>
          acc.withColumn(k, col(k) + lit(Off * i)))
        extra(s, i)
      }.reduce(_ unionByName _)

    write("region", raw("region"))
    write("nation", raw("nation"))
    write("customer", shifted(raw("customer"), Seq("c_custkey"))())
    write("supplier", shifted(raw("supplier"), Seq("s_suppkey"))())
    write("part", shifted(raw("part"), Seq("p_partkey"))())
    write("orders", shifted(raw("orders"), Seq("o_orderkey", "o_custkey"))())
    write("lineitem", shifted(raw("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey"))())
    write("events", shifted(raw("events"), Seq("event_id", "user_id"))())
    // collision-proof replica vocabularies (r18, ADVICE): every token is
    // PREFIXED with `r<i>_` in EVERY replica, replica 0 included. The
    // former suffix mapping (`tok` -> `tokr<i>`, replica 0 untouched)
    // could alias an original token already ending in `r<digit>` with
    // another token's replica image, and replicas i>0 carried longer
    // texts than replica 0 — char-window (n=40) work grew slightly
    // super-linearly against the "in-replica structure preserved
    // exactly" claim. A uniform prefix keeps the 10 vocabularies
    // disjoint by construction and every replica's text the same
    // length, so cross-replica comparisons stay exactly linear.
    write("documents", shifted(raw("documents"), Seq("doc_id")) { (d, i) =>
      d.withColumn("text",
        regexp_replace(col("text"), "(\\S+)", s"r${i}_$$1"))
    })
    write("embeddings", shifted(raw("embeddings"), Seq("vec_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding", expr(
        s"transform(embedding, (x, j) -> cast(x + 0.02 * " +
          s"(((j * 31 + vec_id * 7 + $i) % 23) - 11) as float))"))
    })
    spark.stop()
  }
}
