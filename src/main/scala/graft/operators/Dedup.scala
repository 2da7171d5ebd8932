package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  */
object Dedup {

  /** Exact dedup: group identical normalized text.
    * Reference analogue: SELECT-DISTINCT-as-groupby (sqlrs plans DISTINCT as
    * group-by-all-columns, /root/reference/src/planner/select.rs:29-32);
    * here the group key is the document body.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("n_copies"))
      .join(docs.select(col("doc_id"), col("text")), Seq("text"))
      .select(col("doc_id"), col("rep"), col("n_copies"))

  /** Pairs (i < j) whose signatures collide in at least one LSH band.
    * `sig` must be an array column; `bands` buckets of `rows` elements.
    */
  private def bandPairs(
      withSig: DataFrame, idCol: String, bands: Int, rows: Int): DataFrame = {
    val banded = withSig.select(
      col(idCol),
      posexplode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b)))
        .as(Seq("band", "bucket")))
    val l = banded.alias("l")
    val r = banded.alias("r")
    l.join(r,
        col(s"l.band") === col(s"r.band") &&
          col(s"l.bucket") === col(s"r.bucket") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("i"), col(s"r.$idCol").as("j"))
      .distinct()
  }

  /** Attach `rep` = min(smaller-id neighbor, self) to every doc. */
  private def attachRep(docs: DataFrame, pairs: DataFrame): DataFrame =
    docs
      .join(pairs, docs("doc_id") === pairs("j"), "left")
      .groupBy(docs("doc_id"))
      .agg(coalesce(min(col("i")), first(docs("doc_id"))).as("rep"))
      .select(col("doc_id"), col("rep"))

  /** MinHash + LSH near-dup: shingle → k-minhash → band-bucket join →
    * exact Jaccard verification on the shingle sets.
    */
  def minhashLsh(
      docs: DataFrame,
      shingleLen: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.8): DataFrame = {
    val rows = numHashes / bands
    val withSets = docs.select(
      col("doc_id"),
      array_distinct(wordShingles(tokens(col("text")), shingleLen)).as("shingles"))
    val withSig = withSets.select(
      col("doc_id"),
      col("shingles"),
      minhashSignature(col("shingles"), numHashes).as("sig"))

    val candidates = bandPairs(withSig.select(col("doc_id"), col("sig")), "doc_id", bands, rows)

    // verify true Jaccard on the shingle sets (LSH gives candidates only)
    val sets = withSets.select(col("doc_id"), col("shingles"))
    val verified = candidates
      .join(sets.withColumnRenamed("doc_id", "i").withColumnRenamed("shingles", "si"), Seq("i"))
      .join(sets.withColumnRenamed("doc_id", "j").withColumnRenamed("shingles", "sj"), Seq("j"))
      .withColumn("inter", size(array_intersect(col("si"), col("sj"))).cast("double"))
      .withColumn("uni", size(array_union(col("si"), col("sj"))).cast("double"))
      .filter(col("uni") > 0 && col("inter") / col("uni") >= threshold)
      .select(col("i"), col("j"))

    attachRep(docs, verified)
  }

  /** SimHash near-dup: 64-bit signature, 16-bit band blocking, exact
    * hamming-distance verification.
    */
  def simhash(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4, "4 bands of 16 bits guarantee recall only for hamming <= 3")
    val withSig = docs.select(
      col("doc_id"), simhash64(tokens(col("text"))).as("sig"))
    val banded = withSig.select(
      col("doc_id"), col("sig"),
      posexplode(simhashBands(col("sig"), 4)).as(Seq("band", "bucket")))
    val l = banded.alias("l")
    val r = banded.alias("r")
    val pairs = l.join(r,
        col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.doc_id") < col("r.doc_id"))
      .filter(hamming64(col("l.sig"), col("r.sig")) <= maxHamming)
      .select(col("l.doc_id").as("i"), col("r.doc_id").as("j"))
      .distinct()
    attachRep(docs, pairs)
  }

  /** Exact n-gram (word) Jaccard dedup inside blocking keys. `blockCols`
    * bounds the quadratic pair term; at scale use a coarse content key
    * (e.g. language + length bucket) — exactly what this defaults to.
    */
  def ngramJaccard(
      docs: DataFrame,
      n: Int = 1,
      threshold: Double = 0.95,
      blockCols: Seq[Column] = Seq(col("lang"))): DataFrame = {
    val toks = docs.select(
      col("doc_id"),
      struct(blockCols: _*).as("block"),
      array_distinct(wordShingles(tokens(col("text")), n)).as("toks"))
    val l = toks.alias("l")
    val r = toks.alias("r")
    val pairs = l.join(r,
        col("l.block") === col("r.block") && col("l.doc_id") < col("r.doc_id"))
      .withColumn("inter", size(array_intersect(col("l.toks"), col("r.toks"))).cast("double"))
      .withColumn("uni", size(array_union(col("l.toks"), col("r.toks"))).cast("double"))
      .filter(col("uni") > 0 && col("inter") / col("uni") >= threshold)
      .select(col("l.doc_id").as("i"), col("r.doc_id").as("j"))
    attachRep(docs, pairs)
  }

  /** Embedding near-dup: random-hyperplane LSH buckets → exact cosine
    * verification at `threshold`. Hyperplanes are seed-fixed literals, so
    * bucketing is deterministic across runs and cluster layouts.
    */
  def embeddingCosine(
      embs: DataFrame,
      dim: Int = 64,
      planes: Int = 12,
      threshold: Double = 0.95): DataFrame = {
    val rnd = new scala.util.Random(42)
    val hyper: Seq[Seq[Double]] =
      Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
    val vecD = transform(col("embedding"), x => x.cast("double"))
    // LSH key: sign pattern over `planes` fixed hyperplanes
    val sigBits = hyper.zipWithIndex.map { case (h, i) =>
      val w = array(h.map(lit): _*)
      when(aggregate(zip_with(vecD, w, (a, b) => a * b), lit(0.0), _ + _) > 0,
        shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    val withKey = embs.select(
      col("vec_id"),
      vecD.as("v"),
      sigBits.reduce((a, b) => a.bitwiseOR(b)).as("bucket"))

    val l = withKey.alias("l")
    val r = withKey.alias("r")
    val pairs = l.join(r,
        col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
      .filter(Similarity.cosine(col("l.v"), col("r.v")) >= threshold)
      .select(col("l.vec_id").as("i"), col("r.vec_id").as("j"))

    embs
      .join(pairs, embs("vec_id") === pairs("j"), "left")
      .groupBy(embs("vec_id"))
      .agg(coalesce(min(col("i")), first(embs("vec_id"))).as("rep"))
      .select(col("vec_id"), col("rep"))
  }
}
