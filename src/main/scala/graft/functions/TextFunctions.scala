package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines.
  *
  * Everything here is composed from `org.apache.spark.sql.functions._` so it
  * stays inside whole-stage codegen — no UDFs, no serialization cliffs, and
  * every expression is distributable over any partitioning of the input.
  * That is the property that lets these run over 100 TB: they are pure
  * per-row column expressions with no shuffle of their own.
  */
object TextFunctions {

  /** Lowercased whitespace tokens, empties dropped. The whitespace class
    * is RE2's `\s` = [ \t\n\f\r] (NOT Java's, which adds \x0B) so the
    * DuckDB oracles' `string_split_regex(..., '\s+')` tokenizes
    * identically.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[ \t\n\f\r]+"), t => length(t) > 0)

  /** Distinct token set (for Jaccard-style set similarity). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** `n`-word shingles: ["a b c", "b c d", ...]. Empty when fewer than n
    * tokens. 1-based `slice`; `sequence(0, size-n)` enumerates start offsets.
    */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** MinHash signature: k minimums of per-seed xxhash64 over the shingle
    * set. One pass over the shingles per seed, all inside codegen. Seeded
    * hashing uses xxhash64(shingle, seed_i) — deterministic across runs,
    * partitions, and cluster sizes.
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      i => coalesce(array_min(transform(shingles, s => xxhash64(s, i))),
        lit(Long.MaxValue)))

  /** Distinct shingle set pre-hashed to 64-bit longs — the composable twin
    * of the fused `graft_shingle_hashes` kernel (PipelineSpec pins their
    * agreement; sort this one before comparing, the kernel emits sorted).
    * Hashing each shingle string ONCE and doing all downstream set work on
    * fixed-width longs is the scale path. xxhash64 collisions (~2^-64 per
    * pair) are negligible against LSH noise.
    */
  def hashedShingleSet(text: Column, n: Int): Column =
    array_distinct(transform(wordShingles(tokens(text), n), s => xxhash64(s)))

  /** 64-bit SimHash over a token array: per bit, sum +1/-1 votes weighted by
    * token hash bits; the sign of each counter becomes the output bit.
    * Result is a Long whose hamming distance approximates cosine distance
    * of the bag-of-words vectors.
    */
  def simhash64(toks: Column): Column = {
    // counters: array of 64 longs, one per bit position
    val counters = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) =>
        zip_with(
          acc,
          transform(
            sequence(lit(0), lit(63)),
            i => when(call_function("shiftright", xxhash64(t), i).bitwiseAND(1) === 1, 1L)
              .otherwise(-1L)),
          (a, b) => a + b))
    // fold the 64 signs back into one long
    aggregate(
      zip_with(
        counters,
        sequence(lit(0), lit(63)),
        (c, i) => when(c > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L),
      (acc, bit) => acc.bitwiseOR(bit))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Split a 64-bit signature into `bands` equal bit-bands (for LSH
    * blocking on near-identical signatures: hamming ≤ d pairs must agree on
    * at least one band when bands > d).
    */
  def simhashBands(sig: Column, bands: Int): Column = {
    val width = 64 / bands
    transform(
      sequence(lit(0), lit(bands - 1)),
      i => call_function("shiftright", sig, i * lit(width))
        .bitwiseAND(lit((1L << width) - 1)))
  }

  // ---- document statistics -------------------------------------------

  def tokenCount(text: Column): Column = size(tokens(text))

  def uniqueTokenCount(text: Column): Column = size(tokenSet(text))

  def charCount(text: Column): Column = length(text)

  /** Mean token length, 0.0 for empty docs; decimal-rounded so the value is
    * reproducible across engines.
    */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      round(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          size(toks).cast("double"),
        6))
  }

  /** Ratio of tokens found in `words`, rounded for reproducibility. */
  def wordSetRatio(text: Column, words: Seq[String]): Column = {
    val toks = tokens(text)
    val set = array(words.map(lit): _*)
    when(size(toks) === 0, lit(0.0)).otherwise(
      round(
        size(filter(toks, t => array_contains(set, t))).cast("double") /
          size(toks).cast("double"),
        6))
  }

  val englishStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  def stopwordRatio(text: Column): Column = wordSetRatio(text, englishStopwords)

  /** Ratio of non-alphanumeric, non-space chars — a punctuation/noise
    * signal used by quality filters (C4/Gopher-style).
    */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      round(
        (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 \t\n\f\r]", "")))
          .cast("double") / length(text).cast("double"),
        6))

  /** Composite quality score in [0,1]: length band + stopword presence +
    * low punctuation + token diversity. A deterministic, explainable stand-in
    * for learned quality classifiers; each term is itself a useful filter.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val lenOk = when(nTok >= 10 && nTok <= 1000, 0.25).otherwise(0.0)
    val stopOk = when(stopwordRatio(text) > 0.01, 0.25).otherwise(0.0)
    val punctOk = when(punctRatio(text) < 0.2, 0.25).otherwise(0.0)
    val diversity = when(nTok === 0, 0.0).otherwise(
      round(least(size(array_distinct(toks)).cast("double") / nTok, lit(1.0)) * 0.25, 6))
    round(lenOk + stopOk + punctOk + diversity, 6)
  }

  // ---- language identification (n-gram / stopword heuristic) ----------

  /** Marker words per language. With real multilingual text these would be
    * the top character n-grams per language; the heuristic structure
    * (score per language → argmax with deterministic tie-break) is the part
    * that matters at scale — one pass, no shuffle.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "es", "y"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Best-scoring language code, 'und' when nothing matches. Ties break on
    * language code order (deterministic).
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val langs = langMarkers.toSeq.sortBy(_._1)
    // array_max over (score, priority, lang) structs: highest score wins,
    // ties resolve to the alphabetically-smallest code via inverted priority
    val scored = langs.zipWithIndex.map { case ((lang, words), idx) =>
      val set = array(words.map(lit): _*)
      struct(
        size(filter(toks, t => array_contains(set, t))).as("score"),
        lit(langs.size - 1 - idx).as("pri"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  // ---- fingerprinting --------------------------------------------------

  /** Stable whole-document fingerprint over normalized text. */
  def docFingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** Winnowing-style rolling fingerprints: hash every `w`-token window,
    * keep the distinct set. Robust to local edits — shared windows survive.
    */
  def rollingFingerprints(text: Column, w: Int): Column =
    array_distinct(transform(wordShingles(tokens(text), w), s => xxhash64(s)))

  // ---- repetition / splitting ------------------------------------------

  /** Longest run of equal adjacent elements in a pre-sorted string array —
    * i.e. the max multiplicity of any element — via a one-pass
    * `functions.aggregate` fold (struct accumulator: previous element,
    * current run, best run). Stays inside codegen-friendly array kernels:
    * no explode, no shuffle. 0 for an empty array.
    */
  def maxRunLength(sortedArr: Column): Column =
    aggregate(
      sortedArr,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Deterministic 0..255 bucket from the md5 of a stable key — the
    * content-independent hash a pipeline splits train/val/test on.
    * Reproducible across engines, runs, partitionings, and cluster sizes
    * (md5 is specified byte-for-byte; no RNG, no partition index). The
    * DuckDB twin is `strpos('0123456789abcdef', ...)` arithmetic over the
    * same two hex chars.
    */
  def md5Bucket(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 2), 16, 10)
      .cast("int")

  // ---- PII scrubbing -----------------------------------------------------

  /** Email-address shape: local-part @ dotted domain with an alpha TLD.
    * Deliberately plain (no lookarounds, no unicode classes) so the same
    * pattern string behaves identically under Java regex and RE2.
    */
  val EmailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"

  /** Phone-number shape: optional +, then 8+ of digits/separators ending
    * in a digit — loose on purpose (scrubbing favors recall; a few
    * over-masked number runs are the accepted cost).
    */
  val PhonePattern: String =
    "\\+?[0-9][0-9() .\\-]{6,}[0-9]"

  /** Redact emails and phone-like runs with typed placeholders — the cheap
    * regex scrub pass a corpus gets before leaving the pipeline. Pure
    * per-row codegen'd `regexp_replace`, no shuffle; emails first so a
    * digit-bearing local part isn't half-eaten by the phone pass.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Count of email / phone matches (for audit dashboards and
    * filter-vs-redact decisions). */
  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0)))

  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhonePattern), lit(0)))
}
