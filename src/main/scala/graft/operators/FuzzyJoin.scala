package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) self-join via deletion-neighborhood blocking —
  * the SymSpell / FastSS family (Bocek et al., "Fast Similarity Search in
  * Large Dictionaries", 2007). The reference engine has no fuzzy-match
  * surface at all; this is a training-data-pipeline extension for typo-level
  * record linkage (near-identical titles, URLs, names).
  *
  * Blocking principle: for strings a, b with levenshtein(a, b) ≤ τ, the
  * deletion neighborhoods D≤τ(a) and D≤τ(b) intersect, where D≤τ(s) is s
  * plus every string reachable by deleting up to τ characters. (Each unit
  * edit either deletes — landing in the other's neighborhood — or
  * substitutes/inserts, whose effect a deletion on the other side cancels.)
  * So joining on exploded neighborhood keys is LOSSLESS: every true pair is
  * a candidate, and an exact `levenshtein` verify removes false positives —
  * collisions cost time, never correctness (the d3/d5 LSH discipline).
  *
  * Scale shape: key explosion is O(len^τ) rows per string — linear in the
  * corpus for fixed τ — followed by ONE equi-shuffle on the key and one
  * aggregate to dedup candidate pairs. No all-pairs stage, no cross join.
  * A length prefilter (|len(a)−len(b)| ≤ τ, a necessary condition) rides
  * the join as a residual predicate, cutting verify work for free. Hot
  * keys (many strings sharing a deletion variant) concentrate pairs the
  * same way LSH buckets do; `maxBucket` applies the
  * [[Dedup]] bucket-cap discipline when a corpus has degenerate
  * near-constant strings.
  */
object FuzzyJoin {

  /** Deletion-neighborhood keys for `col`, distances 0..maxDist, distinct.
    * Built from Spark array HOFs so the whole key generation stays inside
    * one projection (no UDF, no driver round-trip); strings here are short
    * blocking keys (callers pass prefixes/titles, not documents).
    */
  private def neighborhoodExpr(col: String, maxDist: Int): String = {
    // del1(v): all single-deletions of lambda/column expression v, with
    // distinct lambda variable names per nesting level (Spark requirement)
    def del1(v: String, lvl: Int): String = {
      val i = s"i$lvl"
      s"""CASE WHEN length($v) >= 1
         |  THEN transform(sequence(1, length($v)),
         |    $i -> concat(substring($v, 1, $i - 1),
         |                 substring($v, $i + 1, length($v))))
         |  ELSE array() END""".stripMargin
    }
    maxDist match {
      case 1 =>
        s"array_distinct(concat(array($col), ${del1(col, 1)}))"
      case 2 =>
        s"""array_distinct(concat(
           |  array($col),
           |  ${del1(col, 1)},
           |  flatten(transform(${del1(col, 1)}, d -> ${del1("d", 2)}))))""".stripMargin
    }
  }

  /** All pairs (id_a < id_b) whose `keyCol` strings are within levenshtein
    * distance `maxDist`. Returns (id_a, id_b, dist). `maxDist` ∈ {1, 2} —
    * the neighborhood grows O(len^τ), and beyond 2 deletion blocking stops
    * paying (use [[Dedup.minhashLsh]] for looser similarity).
    * `maxBucket > 0` drops blocking keys shared by more than that many
    * rows (bounded recall cost, bounded pair count — see [[Dedup]]).
    */
  def editDistanceJoin(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      maxDist: Int,
      maxBucket: Int = 0): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"fuzzyJoin: maxDist must be 1 or 2, got $maxDist")
    val exploded = df
      .select(col(idCol).as("__fid"), col(keyCol).as("__fs"),
        explode(expr(neighborhoodExpr(keyCol, maxDist))).as("__fbk"))
    val blocked =
      if (maxBucket > 0) {
        val keep = exploded.groupBy(col("__fbk"))
          .agg(count(lit(1)).as("__fn"))
          .filter(col("__fn") <= maxBucket)
          .select(col("__fbk"))
        exploded.join(keep, "__fbk")
      } else exploded
    val l = blocked.select(col("__fbk"), col("__fid").as("id_a"), col("__fs").as("__sa"))
    val r = blocked.select(col("__fbk"), col("__fid").as("id_b"), col("__fs").as("__sb"))
    l.join(r,
        l("__fbk") === r("__fbk") && col("id_a") < col("id_b") &&
          abs(length(col("__sa")) - length(col("__sb"))) <= maxDist)
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("__sa")).as("__sa"), first(col("__sb")).as("__sb"))
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Driver-side unit-cost levenshtein — the spec's brute-force twin. */
  private[graft] def levenshteinRef(a: String, b: String): Int = {
    val prev = Array.range(0, b.length + 1)
    var i = 1
    while (i <= a.length) {
      var diag = prev(0)
      prev(0) = i
      var j = 1
      while (j <= b.length) {
        val t = prev(j)
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        prev(j) = math.min(math.min(prev(j) + 1, prev(j - 1) + 1), diag + cost)
        diag = t
        j += 1
      }
      i += 1
    }
    prev(b.length)
  }
}
