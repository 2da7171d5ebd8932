package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Privacy

/** Frequency-gated secret scrub: planted rare/shared secrets pin the
  * k-anonymity gate (rare redacts, shared survives, the boundary sits
  * exactly at k), the rewrite is order-preserving, and the incremental
  * form combines base-index and within-drop evidence.
  */
class PrivacySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def scrubMap(rows: Seq[(Long, String)], k: Int = 3) =
    Privacy.secretScrub(rows.toDF("doc_id", "text"), k = k)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap

  test("rare secret redacts, shared secret survives at k = 3") {
    // pin1111 in 3 docs (df = 3, not < 3 → survives); each key is unique
    val docs = Seq(
      (1L, "pin1111 key0001 alpha"),
      (2L, "pin1111 key0002 beta"),
      (3L, "pin1111 key0003 gamma"),
      (4L, "no digits here at all"))
    val got = scrubMap(docs)
    assert(got(1L) == ((3L, 1L, 1L, "pin1111 <secret> alpha")))
    assert(got(2L) == ((3L, 1L, 1L, "pin1111 <secret> beta")))
    assert(got(3L) == ((3L, 1L, 1L, "pin1111 <secret> gamma")))
    assert(got(4L) == ((5L, 0L, 0L, "no digits here at all")))
  }

  test("frequency boundary: df = k - 1 redacts, df = k survives") {
    // code2222 in exactly 2 docs (< 3 → redacted), code3333 in 3 (kept)
    val docs = Seq(
      (1L, "code2222 code3333"),
      (2L, "code2222 code3333"),
      (3L, "code3333 filler"))
    val got = scrubMap(docs)
    assert(got(1L) == ((2L, 1L, 1L, "<secret> code3333")))
    assert(got(2L) == ((2L, 1L, 1L, "<secret> code3333")))
    assert(got(3L) == ((2L, 0L, 0L, "code3333 filler")))
  }

  test("every occurrence of a rare token masks; counts are per-occurrence") {
    val docs = Seq(
      (1L, "key9999 mid key9999 end key9999"),
      (2L, "plain text row"))
    val got = scrubMap(docs)
    // one distinct secret, three occurrences, order preserved
    assert(got(1L) ==
      ((5L, 1L, 3L, "<secret> mid <secret> end <secret>")))
    assert(got(2L) == ((3L, 0L, 0L, "plain text row")))
  }

  test("within-doc repetition counts one document toward the gate") {
    // tok7777 appears 3 times but only in 2 docs → df = 2 < 3 → redacted
    val docs = Seq(
      (1L, "tok7777 tok7777 a"),
      (2L, "tok7777 b"),
      (3L, "c d"))
    val got = scrubMap(docs)
    assert(got(1L)._3 == 2L)
    assert(got(2L)._3 == 1L)
  }

  test("digit run below minDigitRun is never a candidate") {
    val docs = Seq((1L, "a123 b123 unique999x"), (2L, "x y"))
    // 3-digit runs are not candidates at minDigitRun = 4
    val got = scrubMap(docs)
    assert(got(1L) == ((3L, 0L, 0L, "a123 b123 unique999x")))
  }

  test("incremental: base evidence + drop evidence combine against k") {
    val base = Seq(
      (10L, "seen4444 once"),
      (11L, "seen4444 twice"),
      (12L, "other text")).toDF("doc_id", "text")
    val idx = Privacy.secretFrequencies(base) // seen4444 → nd = 2
    val drop = Seq(
      (1L, "seen4444 rides base evidence"),   // 2 + 1 = 3 → survives
      (2L, "fresh5555 everywhere"),           // 0 + 2 = 2 → redacted
      (3L, "fresh5555 again")).toDF("doc_id", "text")
    val got = Privacy.secretScrubAgainstIndex(drop, idx, k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(got(1L) == "seen4444 rides base evidence")
    assert(got(2L) == "<secret> everywhere")
    assert(got(3L) == "<secret> again")
  }

  test("incremental over an empty index is the pure within-drop gate") {
    val empty = Privacy.secretFrequencies(
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
    val drop = Seq(
      (1L, "solo6666 x"),
      (2L, "duo7777 y"),
      (3L, "duo7777 z")).toDF("doc_id", "text")
    val got = Privacy.secretScrubAgainstIndex(drop, empty, k = 2)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(got(1L) == "<secret> x")   // df 1 < 2
    assert(got(2L) == "duo7777 y")    // df 2 → survives
    assert(got(3L) == "duo7777 z")
  }

  private def freqRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("tok").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  test("secret-index lifecycle: delete ≡ rebuild, merge ≡ rebuild, roundtrip") {
    val base = Seq(
      (1L, "pin1111 key0001 a"),
      (2L, "pin1111 key0002 b"),
      (3L, "pin1111 c")).toDF("doc_id", "text")
    val drop = Seq(
      (10L, "pin1111 key0010 fresh"),
      (11L, "new9999 row")).toDF("doc_id", "text")
    val idx = Privacy.secretFrequencies(base)
    // merge ≡ rebuild over base ∪ drop (disjoint doc_ids)
    val merged = Privacy.secretIndexMerge(idx, drop)
    assert(freqRows(merged) ==
      freqRows(Privacy.secretFrequencies(base.unionByName(drop))))
    // delete ≡ rebuild over the survivors; a token whose only holders
    // are revoked DROPS (nd = 0)
    val revoked = base.filter(col("doc_id") === 1L)
    val deleted = Privacy.secretIndexDelete(idx, revoked)
    assert(freqRows(deleted) ==
      freqRows(Privacy.secretFrequencies(base.filter(col("doc_id") =!= 1L))))
    assert(!freqRows(deleted).exists(_._1 == "key0001"),
      "a token held only by the revoked doc must drop from the index")
    // lifecycle roundtrip: delete(merge(idx, drop), drop) ≡ idx
    assert(freqRows(Privacy.secretIndexDelete(merged, drop)) == freqRows(idx))
    // bootstrap: merging into an empty index builds it from scratch
    val empty = Privacy.secretFrequencies(
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
    assert(freqRows(Privacy.secretIndexMerge(empty, base)) == freqRows(idx))
  }

  test("takedown tightens the gate: post-delete scrub redacts at least as much") {
    // pin5555 held by exactly k = 3 base docs survives the incremental
    // gate; revoking one holder drops it under k and the SAME drop now
    // redacts it — takedown can only tighten a privacy gate
    val base = Seq(
      (1L, "pin5555 a"), (2L, "pin5555 b"), (3L, "pin5555 c"))
      .toDF("doc_id", "text")
    val idx = Privacy.secretFrequencies(base)
    val drop = Seq((10L, "pin5555 probe")).toDF("doc_id", "text")
    val before = Privacy.secretScrubAgainstIndex(drop, idx, k = 4)
      .collect().map(r => r.getString(4)).head
    assert(before == "pin5555 probe") // 3 + 1 >= 4 → survives
    val shrunk = Privacy.secretIndexDelete(idx,
      base.filter(col("doc_id") === 3L))
    val after = Privacy.secretScrubAgainstIndex(drop, shrunk, k = 4)
      .collect().map(r => r.getString(4)).head
    assert(after == "<secret> probe") // 2 + 1 < 4 → redacts
  }

  private def retentionFixture = {
    // asOf = 100; policy: web keeps 30 days, books keeps 90, feed has
    // NO policy row (never expires)
    val docs = Seq(
      (1L, "web", 50L, "old web doc one"),     // age 50 >= 30 → expired
      (2L, "web", 71L, "fresh web doc"),       // age 29 < 30 → kept
      (3L, "web", 70L, "boundary web doc"),    // age 30 == 30 → expired
      (4L, "books", 5L, "old book"),           // age 95 >= 90 → expired
      (5L, "books", 20L, "kept book"),         // age 80 < 90 → kept
      (6L, "feed", 0L, "ancient feed item"))   // no policy → kept
      .toDF("doc_id", "source", "ingest_day", "text")
    val policy = Seq(("web", 30L), ("books", 90L))
      .toDF("source", "retention_days")
    (docs, policy)
  }

  test("retention expiry: policy boundary, missing policy never expires") {
    val (docs, policy) = retentionFixture
    val exp = Privacy.retentionExpiry(docs, policy, asOfDay = 100L)
      .select("doc_id", "age_days", "retention_days")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(exp.toSeq == Seq((1L, 50L, 30L), (3L, 30L, 30L), (4L, 95L, 90L)))
  }

  test("retention sweep report: counts, ppm, oldest surviving day") {
    val (docs, policy) = retentionFixture
    val got = Privacy.retentionSweep(docs, policy, asOfDay = 100L)
      .orderBy("source").collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
    assert(got.toSeq == Seq(
      ("books", 90L, 2L, 1L, 500000L, 20L),
      ("feed", -1L, 1L, 0L, 0L, 0L),
      ("web", 30L, 3L, 2L, 666666L, 71L)))
  }

  test("retention expiry feeds the takedown: delete ≡ rebuild on survivors") {
    import graft.operators.Dedup
    val (docs, policy) = retentionFixture
    // give the span machinery real n-token spans
    val wide = docs.select(col("doc_id"), col("source"), col("ingest_day"),
      concat_ws(" ", col("text"), col("text"), col("text")).as("text"))
    val expired = Privacy.retentionExpiry(wide, policy, asOfDay = 100L)
    val survivors = wide.join(expired.select("doc_id"),
      Seq("doc_id"), "left_anti")
    val full = Dedup.spanIndexCounted(wide, n = 3)
    val spanRows = (df: org.apache.spark.sql.DataFrame) =>
      df.orderBy("gh").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(spanRows(Dedup.spanIndexDelete(full, expired, n = 3)) ==
      spanRows(Dedup.spanIndexCounted(survivors, n = 3)))
    Dedup.unpersistAll()
  }

  test("full-corpus scrub ≡ incremental against the corpus's own index") {
    val docs = Seq(
      (1L, "pin0001 key000000000001 alpha 2024"),
      (2L, "pin0001 key000000000002 beta 2024"),
      (3L, "pin0001 key000000000003 gamma 2024"),
      (4L, "word row no digits")).toDF("doc_id", "text")
    // base nd already counts each doc once; drop re-probes the same docs,
    // so combined evidence = 2 * nd — gate at 2k reproduces the k gate
    val full = Privacy.secretScrub(docs, k = 3).orderBy("doc_id").collect()
    val inc = Privacy.secretScrubAgainstIndex(
        docs, Privacy.secretFrequencies(docs), k = 6)
      .orderBy("doc_id").collect()
    assert(full.toSeq == inc.toSeq)
  }
}
