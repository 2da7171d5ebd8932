package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}
import graft.streaming.EventsStream

/** The d23 index-lifecycle contract: for every persisted serving index,
  * the DELETE path (delta arithmetic on the stale index, cost
  * proportional to the takedown set) must reproduce a from-scratch
  * rebuild on the surviving corpus — bit-identical index content for
  * the stores that promise it (span, postings, minhash, ivf members),
  * identical SERVED ANSWERS for the one that promises output equality
  * under a frozen token order (the streaming prefix index). Planted
  * cases cover the regimes a random corpus may miss: a span losing one
  * of two holders vs all holders, a gram falling INTO the serve band
  * after deletion, a skew-capped bucket falling back UNDER the cap, a
  * revoked gram-less document shifting n_docs.
  */
class IndexDeleteSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def spanRows(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("char-window index lifecycle: delete/merge equal rebuilds, roundtrip, probe") {
    val run = "0123456789abcdefghijklmnopqrstuvwxyz-end" // 40 chars
    val base = Seq(
      (1L, s"alpha $run beta"),
      (2L, s"gamma $run delta"),
      (3L, "completely unrelated base document text here padded out")
    ).toDF("doc_id", "text")
    val drop = Seq(
      (100L, s"leading words $run trailing words"),   // base-held → excises
      (101L, "fresh drop content with no overlap at all against anyone")
    ).toDF("doc_id", "text")
    val idx = Dedup.spanIndexCountedChars(base, n = 40)
    // delete ≡ rebuild on survivors; sole-holder hashes vanish
    val rev = base.filter(col("doc_id") === 1L)
    assert(spanRows(Dedup.spanIndexCharsDelete(idx, rev, n = 40)) ==
      spanRows(Dedup.spanIndexCountedChars(
        base.filter(col("doc_id") =!= 1L), n = 40)))
    // merge ≡ rebuild on base ∪ drop; the lifecycle roundtrips
    val merged = Dedup.spanIndexCharsMerge(idx, drop, n = 40)
    assert(spanRows(merged) ==
      spanRows(Dedup.spanIndexCountedChars(base.unionByName(drop), n = 40)))
    assert(spanRows(Dedup.spanIndexCharsDelete(merged, drop, n = 40)) ==
      spanRows(idx))
    // the incremental probe: base-held windows excise from the drop
    // (the shared flanking spaces extend the cover — the d24 maximal-
    // run property at the index boundary), fresh content passes
    val got = Dedup.spanExciseCharsAgainstIndex(drop, idx, n = 40)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getString(3)))).toMap
    assert(got(100L)._1 == 42L, got(100L).toString)
    assert(got(100L)._2 == "leading wordstrailing words")
    assert(got(101L) ==
      ((0L, "fresh drop content with no overlap at all against anyone")))
    Dedup.unpersistAll()
  }

  test("span index delete equals rebuild: planted holder regimes") {
    val span8 = "w1 w2 w3 w4 w5 w6 w7 w8"
    val docs = Seq(
      (1L, s"$span8 tail one"), // shares span8 with 2 and 3
      (2L, s"$span8 tail two more"),
      (3L, span8), // exactly one span
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"), // spans unique to doc 4
      (5L, "too short"), // no spans at all
      (6L, s"r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8")
    ).toDF("doc_id", "text")
    val full = Dedup.spanIndexCounted(docs, n = 8)
    // regime 1: one of three holders revoked — shared hashes survive
    // with nd decremented; doc-4-unique hashes vanish with doc 4
    val rev1 = docs.filter(col("doc_id").isin(2L, 4L))
    val surv1 = docs.filter(!col("doc_id").isin(2L, 4L))
    assert(spanRows(Dedup.spanIndexDelete(full, rev1, n = 8)) ==
      spanRows(Dedup.spanIndexCounted(surv1, n = 8)))
    // regime 2: EVERY holder of the shared span revoked — the hash
    // must leave the index entirely (nd reaches zero)
    val rev2 = docs.filter(col("doc_id").isin(1L, 2L, 3L))
    val surv2 = docs.filter(!col("doc_id").isin(1L, 2L, 3L))
    val del2 = Dedup.spanIndexDelete(full, rev2, n = 8)
    assert(spanRows(del2) == spanRows(Dedup.spanIndexCounted(surv2, n = 8)))
    // regime 3: a doc repeating its own span counts ONCE (nd is a
    // document frequency) — deleting it removes exactly one
    val rev3 = docs.filter(col("doc_id") === 6L)
    val surv3 = docs.filter(col("doc_id") =!= 6L)
    assert(spanRows(Dedup.spanIndexDelete(full, rev3, n = 8)) ==
      spanRows(Dedup.spanIndexCounted(surv3, n = 8)))
    // revoking everything empties the index
    assert(Dedup.spanIndexDelete(full, docs, n = 8).count() == 0L)
  }

  test("span index delete equals rebuild on the corpus, bit-for-bit") {
    val d = Tables.load(spark, sf, "documents")
    val base = d.filter(col("doc_id") % 4 =!= 0)
    val revoked = base.filter(col("doc_id") % 10 === 1)
    val survivors = base.filter(col("doc_id") % 10 =!= 1)
    val deleted = Dedup.spanIndexDelete(
      Dedup.spanIndexCounted(base), revoked)
    assert(spanRows(deleted) == spanRows(Dedup.spanIndexCounted(survivors)))
  }

  private def postingRows(df: DataFrame): Set[(String, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet

  private def bandedRows(df: DataFrame): Set[(String, Long, Long, Double)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSet

  test("postings delete equals rebuild: band fall-in and n_docs shift") {
    val docs = Seq(
      (1L, "x y p q"), // grams: "x y", "y p", "p q"
      (2L, "x y p q"),
      (3L, "x y solo3"),
      (7L, "solo") // one token: posts NOTHING but counts toward n_docs
    ).toDF("doc_id", "text")
    val full = Dedup.tfidfPostingsFull(docs)
    // serve band [2, 2]: gram "x y" (df 3) is OUT of band before the
    // delete; revoking doc 3 drops it to df 2 — IN band, and its
    // never-discarded rows must serve. Revoking doc 7 (gram-less)
    // shifts ONLY n_docs, i.e. every served weight.
    val revoked = docs.filter(col("doc_id").isin(3L, 7L)).select(col("doc_id"))
    val survivors = docs.filter(!col("doc_id").isin(3L, 7L))
    val deleted = Dedup.postingsDelete(full, revoked)
    val rebuilt = Dedup.tfidfPostingsFull(survivors)
    assert(postingRows(deleted) == postingRows(rebuilt),
      "full-index delete must be bit-identical to the rebuild")
    assert(bandedRows(Dedup.postingsBand(deleted, 2, 2)) ==
      bandedRows(Dedup.postingsBand(rebuilt, 2, 2)),
      "the served band must re-admit grams whose df fell into range")
    // the fall-in actually happened (the planted case is live)
    assert(Dedup.postingsBand(deleted, 2, 2).filter(col("gram") === "x y")
      .count() == 2L, "gram 'x y' must serve after falling into the band")
    assert(Dedup.postingsBand(full, 2, 2).filter(col("gram") === "x y")
      .count() == 0L, "gram 'x y' must NOT serve before the delete")
    // a gram losing its last posting leaves the full index
    val allGone = Dedup.postingsDelete(full, docs.select(col("doc_id")))
    assert(allGone.count() == 0L)
  }

  test("postings delete equals rebuild on the corpus, bit-for-bit") {
    val d = Tables.load(spark, sf, "documents")
    val base = d.filter(col("doc_id") % 4 =!= 0)
    val revoked = base.filter(col("doc_id") % 10 === 1).select(col("doc_id"))
    val survivors = base.filter(col("doc_id") % 10 =!= 1)
    val deleted = Dedup.postingsDelete(Dedup.tfidfPostingsFull(base), revoked)
    val rebuilt = Dedup.tfidfPostingsFull(survivors)
    assert(postingRows(deleted) == postingRows(rebuilt))
    assert(bandedRows(Dedup.postingsBand(deleted)) ==
      bandedRows(Dedup.postingsBand(rebuilt)))
  }

  private def mhRows(df: DataFrame): Set[(Long, Int, Long, Int)] =
    df.select(col("doc_id"), col("band"), col("bucket"), col("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3))).toSet

  test("minhash delete equals rebuild through the serve cap (fall-in)") {
    val dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, dup), (2L, dup), (3L, dup), // identical: every bucket holds 3
      (4L, "totally different words that bucket on their own somewhere")
    ).toDF("doc_id", "text")
    val full = Dedup.minhashIndex(docs, maxBandBucket = 0)
    // cap 2: the triplicate's buckets are capped OUT of serving. After
    // revoking doc 3 they hold 2 rows — the cap must re-admit them,
    // which only works because the store kept the over-cap rows.
    assert(Dedup.minhashIndexCap(full, maxBucket = 2)
      .filter(col("doc_id").isin(1L, 2L, 3L)).count() == 0L,
      "planted case: the triplicate must be capped out before the delete")
    val revoked = Seq(3L).toDF("doc_id")
    val deleted = Dedup.minhashIndexDelete(full, revoked)
    val rebuilt = Dedup.minhashIndex(
      docs.filter(col("doc_id") =!= 3L), maxBandBucket = 0)
    assert(mhRows(deleted) == mhRows(rebuilt),
      "uncapped delete must be bit-identical to the uncapped rebuild")
    assert(mhRows(Dedup.minhashIndexCap(deleted, maxBucket = 2)) ==
      mhRows(Dedup.minhashIndexCap(rebuilt, maxBucket = 2)),
      "the serve cap must re-admit buckets that fell under it")
    assert(Dedup.minhashIndexCap(deleted, maxBucket = 2)
      .filter(col("doc_id").isin(1L, 2L)).count() > 0L,
      "the surviving duplicates must serve again after the delete")
  }

  test("minhash delete equals rebuild on the corpus; probe answers match") {
    val d = Tables.load(spark, sf, "documents")
    val base = d.filter(col("doc_id") % 4 =!= 0)
    val revoked = base.filter(col("doc_id") % 10 === 1).select(col("doc_id"))
    val survivors = base.filter(col("doc_id") % 10 =!= 1)
    val deleted = Dedup.minhashIndexDelete(
      Dedup.minhashIndex(base, maxBandBucket = 0), revoked)
    val rebuilt = Dedup.minhashIndex(survivors, maxBandBucket = 0)
    assert(mhRows(deleted) == mhRows(rebuilt))
    // end-to-end: the d19 probe over the deleted index answers exactly
    // as over the rebuilt index
    val probe = d.filter(col("doc_id") % 4 === 0)
    def answers(idx: DataFrame): Seq[(Long, Long, Long, Boolean)] =
      Dedup.incrementalMinhash(Dedup.minhashIndexCap(idx), probe)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSeq.sortBy(_._1)
    assert(answers(deleted) == answers(rebuilt))
  }

  test("ivf member delete equals re-assigning the survivors") {
    val e = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cells = Similarity.lloydCentroids(e, nlist = 8, iters = 1)
    val members = Similarity.ivfAssign(cells, e)
    val revoked = e.filter(col("vec_id") % 10 === 1).select(col("vec_id"))
    val deleted = Similarity.ivfMembersDelete(members, revoked)
    val rebuilt = Similarity.ivfAssign(
      cells, e.filter(col("vec_id") % 10 =!= 1))
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows(deleted) == rows(rebuilt))
  }

  test("prefix index delete: served answers equal the rebuilt index's") {
    // the prefix index's BYTES legitimately drift from a rebuild (df
    // shifts and a rebuild re-orders prefixes) — the contract is
    // OUTPUT equality: candidates from the frozen-order index are a
    // superset and the exact verify decides, so the distinct verified
    // pair set matches serving the rebuilt index AND the batch
    // operator over the survivors.
    val d = Tables.load(spark, sf, "documents")
    val base = d.filter(col("doc_id") % 4 =!= 0)
    val revoked = base.filter(col("doc_id") % 10 === 1).select(col("doc_id"))
    val survivors = base.filter(col("doc_id") % 10 =!= 1)
    val probe = d.filter(col("doc_id") % 4 === 0)
    val deleted = Dedup.prefixIndexDelete(Dedup.incrementalIndex(base), revoked)
    val rebuilt = Dedup.incrementalIndex(survivors)
    def pairs(idx: DataFrame): Set[(Long, Long)] =
      EventsStream.incrementalDedupStream(probe, idx)
        .select(col("doc_id"), col("base_id")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pairs(deleted)
    assert(got == pairs(rebuilt),
      "deleted-index serving must answer exactly as the rebuilt index")
    val batch = Dedup.incrementalDedup(survivors, probe)
      .filter(col("n_dups") > 0).select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    assert(got.map(_._1) == batch,
      "flagged probes must match the batch operator over the survivors")
  }

  test("span index merge equals rebuild; delete roundtrips it away") {
    val d = Tables.load(spark, sf, "documents")
    val base = d.filter(col("doc_id") % 4 =!= 0)
    val older = base.filter(col("doc_id") % 10 =!= 3)
    val drop = base.filter(col("doc_id") % 10 === 3)
    val idx = Dedup.spanIndexCounted(older)
    val merged = Dedup.spanIndexMerge(idx, drop)
    assert(spanRows(merged) == spanRows(Dedup.spanIndexCounted(base)),
      "merge must be bit-identical to rebuilding over base ∪ drop")
    // the lifecycle roundtrip: revoking the just-merged drop restores
    // the original index exactly
    assert(spanRows(Dedup.spanIndexDelete(merged, drop)) == spanRows(idx),
      "delete(merge(idx, drop), drop) must equal idx")
    // bootstrap: merging into an EMPTY index builds it from scratch
    val empty = idx.filter(lit(false))
    assert(spanRows(Dedup.spanIndexMerge(empty, drop)) ==
      spanRows(Dedup.spanIndexCounted(drop)))
  }

  test("postings merge equals rebuild incl. band moves; delete roundtrips") {
    val docs = Seq(
      (1L, "x y p q"),
      (2L, "x y p q"),
      (7L, "solo") // gram-less: must still bump n_docs on merge
    ).toDF("doc_id", "text")
    val drop = Seq(
      (3L, "x y fresh gram"), // pushes "x y" df 2 -> 3: OUT of a [2,2] band
      (8L, "also")            // gram-less drop doc
    ).toDF("doc_id", "text")
    val merged = Dedup.postingsMerge(Dedup.tfidfPostingsFull(docs), drop)
    val rebuilt = Dedup.tfidfPostingsFull(docs.unionByName(drop))
    assert(postingRows(merged) == postingRows(rebuilt),
      "merge must be bit-identical to the rebuild over base ∪ drop")
    assert(bandedRows(Dedup.postingsBand(merged, 2, 2)) ==
      bandedRows(Dedup.postingsBand(rebuilt, 2, 2)),
      "band migrations in BOTH directions must serve identically")
    // the planted out-migration is live
    assert(Dedup.postingsBand(merged, 2, 2).filter(col("gram") === "x y")
      .count() == 0L, "'x y' must leave the [2,2] band after the merge")
    // roundtrip: revoking the merged drop restores the original store
    assert(postingRows(Dedup.postingsDelete(merged,
        drop.select(col("doc_id")))) ==
      postingRows(Dedup.tfidfPostingsFull(docs)))
    // bootstrap from empty
    val empty = Dedup.tfidfPostingsFull(docs).filter(lit(false))
    assert(postingRows(Dedup.postingsMerge(empty, drop)) ==
      postingRows(Dedup.tfidfPostingsFull(drop)))
    // corpus-level merge ≡ rebuild
    val d = Tables.load(spark, sf, "documents")
    val base = d.filter(col("doc_id") % 4 =!= 0)
    val cm = Dedup.postingsMerge(
      Dedup.tfidfPostingsFull(base.filter(col("doc_id") % 10 =!= 3)),
      base.filter(col("doc_id") % 10 === 3))
    assert(postingRows(cm) == postingRows(Dedup.tfidfPostingsFull(base)))
  }

  test("components delete: revoking a chain's middle splits it; rest untouched") {
    // A~B~C at 0.95 word-Jaccard (A and C each differ from B by one
    // token, from each other by two) — revoking B must SPLIT the
    // survivors into singletons; the unrelated D~E pair must pass
    // through byte-identical without its text ever being re-read
    // semantically (the component-local property).
    val ts = (1 to 40).map(i => s"tok$i")
    val b = ts.mkString(" ")
    val a = (ts.dropRight(1) :+ "xx").mkString(" ")
    val c = (ts.take(38) ++ Seq("yy", ts.last)).mkString(" ")
    val docs = Seq(
      (1L, a, "en"), (2L, b, "en"), (3L, c, "en"),
      (10L, "totally separate pair of documents one", "en"),
      (11L, "totally separate pair of documents one", "en"),
      (20L, "a singleton nothing like anything else here", "en"))
      .toDF("doc_id", "text", "lang")
    val comp = Dedup.nearDupComponents(docs)
    // sanity: the chain IS one component pre-delete
    val pre = comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pre(1L) == 1L && pre(2L) == 1L && pre(3L) == 1L, pre.toString)
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val revoked = Seq(2L).toDF("doc_id")
    val got = rows(Dedup.componentsDelete(comp, docs, revoked))
    val survivors = docs.filter(col("doc_id") =!= 2L)
    assert(got == rows(Dedup.nearDupComponents(survivors)),
      "splice must equal the full rebuild over the survivors")
    // the split is live: A and C are singletons now
    val after = got.toMap
    assert(after(1L) == 1L && after(3L) == 3L,
      s"revoking the chain's middle must split it: $after")
    assert(after(10L) == 10L && after(11L) == 10L && after(20L) == 20L)
    // a revocation that does NOT disconnect keeps the component merged
    val got2 = rows(Dedup.componentsDelete(comp, docs,
      Seq(3L).toDF("doc_id")))
    assert(got2 == rows(Dedup.nearDupComponents(
      docs.filter(col("doc_id") =!= 3L))))
    assert(got2.toMap.apply(2L) == 1L, s"A~B must stay merged: $got2")
    // corpus-level splice ≡ rebuild
    val d = Tables.load(spark, sf, "documents")
    val rev = d.filter(col("doc_id") % 10 === 1).select(col("doc_id"))
    assert(rows(Dedup.componentsDelete(
        Dedup.nearDupComponents(d), d, rev)) ==
      rows(Dedup.nearDupComponents(d.filter(col("doc_id") % 10 =!= 1))))
    Dedup.unpersistAll()
  }

  private def compStoreRows(df: DataFrame): Set[(Long, Option[Long],
      Option[Long], Option[String], Option[String], Option[Int],
      Option[Long], Option[Seq[Long]])] =
    df.collect().map { r =>
      def l(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      def s(i: Int) = if (r.isNullAt(i)) None else Some(r.getString(i))
      def ii(i: Int) = if (r.isNullAt(i)) None else Some(r.getInt(i))
      def a(i: Int) =
        if (r.isNullAt(i)) None else Some(r.getSeq[Long](i).toSeq)
      (r.getLong(0), l(1), l(2), s(3), s(4), ii(5), l(6), a(7))
    }.toSet

  test("components store: build subsumes the closure; delete is index-only ≡ rebuild") {
    val ts = (1 to 40).map(i => s"tok$i")
    val tA = ts.mkString(" ")                                // clique text
    val tA1 = (ts.dropRight(1) :+ "xx").mkString(" ")        // ~A
    val chB = (100 to 139).map(i => s"w$i").mkString(" ")
    val chA = ((100 to 138).map(i => s"w$i") :+ "aa").mkString(" ")
    val chC = ("cc" +: (101 to 139).map(i => s"w$i")).mkString(" ")
    val docs = Seq(
      (1L, tA, "en"), (2L, tA, "en"), (3L, tA, "en"),        // clique rep 1
      (4L, tA1, "en"),                                       // edge (1,4)
      (100L, chA, "en"), (101L, chB, "en"), (102L, chC, "en"), // chain
      (200L, "an untouched pair of identical documents", "en"),
      (201L, "an untouched pair of identical documents", "en"),
      (300L, "", "en"))                                      // empty-token
      .toDF("doc_id", "text", "lang")
    val store = Dedup.componentsIndex(docs)
    // the member projection IS the d8 closure
    def mapRows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mapRows(Dedup.componentsFromIndex(store)) ==
      mapRows(Dedup.nearDupComponents(docs)))
    // rep takeover: revoking the clique REP relabels 2 as rep, moves
    // the stored shingle evidence, and relabels the (1,4) edge — the
    // whole store (members, edges, toks) equals the rebuild
    def del(rev: Seq[Long]) = Dedup.componentsIndexDelete(store,
      rev.toDF("doc_id"))
    def rebuild(rev: Seq[Long]) = Dedup.componentsIndex(
      docs.filter(!col("doc_id").isInCollection(rev)))
    assert(compStoreRows(del(Seq(1L))) == compStoreRows(rebuild(Seq(1L))))
    // clique death: revoking every identical holder drops the clique
    // and its edge; 4 becomes a singleton
    val dead = del(Seq(1L, 2L, 3L))
    assert(compStoreRows(dead) == compStoreRows(rebuild(Seq(1L, 2L, 3L))))
    assert(Dedup.componentsFromIndex(dead).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap.apply(4L) == 4L)
    // chain split: revoking the middle disconnects the ends
    val split = del(Seq(101L))
    assert(compStoreRows(split) == compStoreRows(rebuild(Seq(101L))))
    val sm = Dedup.componentsFromIndex(split).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sm(100L) == 100L && sm(102L) == 102L,
      s"revoking the chain's middle must split it: $sm")
    assert(sm(200L) == 200L && sm(201L) == 200L && sm(300L) == 300L)
    // verifiedPairs path (r20): the build fed the corpus's full verified
    // pair set (what the materialized pair store holds) must be
    // BIT-IDENTICAL to the self-computed build — pair membership is
    // per-pair (prefix pruning is recall-exact under any consistent
    // global order), so restricting the full-corpus set to rep
    // endpoints equals running the PPJoin over reps alone. This is the
    // contract componentsIndexShared's store-fed fit relies on.
    val fullPairs = Dedup.ngramJaccardPairs(docs,
      n = 1, threshold = 0.95, blockCols = Seq(col("lang"))).distinct()
    assert(compStoreRows(Dedup.componentsIndex(docs,
        verifiedPairs = Some(fullPairs))) == compStoreRows(store),
      "store-fed componentsIndex must equal the self-computed build")
    Dedup.unpersistAll()
  }

  test("components store merge: takeover, bridge, new cliques ≡ rebuild; roundtrip") {
    val ts = (1 to 40).map(i => s"tok$i")
    val t1 = ts.mkString(" ")
    val t1v = (ts.dropRight(1) :+ "xx").mkString(" ")          // ~t1
    val t4 = (200 to 239).map(i => s"u$i").mkString(" ")       // bridge hub
    val t2 = ("qq" +: (201 to 239).map(i => s"u$i")).mkString(" ") // ~t4
    val t3 = ((200 to 238).map(i => s"u$i") :+ "rr").mkString(" ") // ~t4, !~t2
    val tn = (300 to 339).map(i => s"v$i").mkString(" ")
    val tnv = ((300 to 338).map(i => s"v$i") :+ "zz").mkString(" ")
    val base = Seq(
      (10L, t1, "en"), (11L, t1, "en"),   // clique rep 10
      (12L, t1v, "en"),                   // edge (10,12), comp 10
      (20L, t2, "en"), (21L, t2, "en"),   // clique rep 20, comp 20
      (30L, t3, "en"),                    // singleton comp 30
      (35L, "a base singleton unlike everything", "en"))
      .toDF("doc_id", "text", "lang")
    val drop = Seq(
      (5L, t1, "en"),    // joins clique {10,11} and TAKES OVER (5 < 10)
      (40L, t4, "en"),   // bridges comps 20 and 30 (near-dup of both)
      (50L, "fresh unrelated drop content entirely new", "en"),
      (51L, tn, "en"), (52L, tn, "en"),   // new clique rep 51
      (53L, tnv, "en"),                   // new×new edge (51,53)
      (60L, "", "en"))                    // empty-token singleton
      .toDF("doc_id", "text", "lang")
    val store = Dedup.componentsIndex(base)
    val merged = Dedup.componentsIndexMerge(store, drop)
    val rebuilt = Dedup.componentsIndex(base.unionByName(drop))
    assert(compStoreRows(merged) == compStoreRows(rebuilt))
    // caller-staged probe side (the x26 pin posture): pre-derived
    // postings + df tables must leave the merge bit-identical — df is
    // a selectivity heuristic, the pair SET may not depend on it
    val post = Dedup.componentsPostings(store)
    val mergedStaged = Dedup.componentsIndexMerge(store, drop,
      basePostings = Some(post), baseDf = Some(Dedup.componentsDf(post)))
    assert(compStoreRows(mergedStaged) == compStoreRows(rebuilt),
      "staged-postings merge must equal the inline merge and the rebuild")
    // the takeover and the bridge are live in the served map
    val m = Dedup.componentsFromIndex(merged).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(10L) == 5L && m(11L) == 5L && m(12L) == 5L && m(5L) == 5L,
      s"drop doc 5 must take over its clique's component: $m")
    assert(m(20L) == 20L && m(30L) == 20L && m(40L) == 20L,
      s"doc 40 must bridge components 20 and 30: $m")
    assert(m(51L) == 51L && m(52L) == 51L && m(53L) == 51L && m(50L) == 50L)
    assert(m(35L) == 35L && m(60L) == 60L)
    // lifecycle roundtrip: revoking the merged drop restores the store
    assert(compStoreRows(Dedup.componentsIndexDelete(merged,
        drop.select(col("doc_id")))) == compStoreRows(store))
    // bootstrap: merging into an empty store ≡ building from the drop
    assert(compStoreRows(Dedup.componentsIndexMerge(
        store.filter(lit(false)), drop)) ==
      compStoreRows(Dedup.componentsIndex(drop)))
    Dedup.unpersistAll()
  }

  test("components store at corpus scale: delete/merge equal rebuilds on sf docs") {
    // the store is exercised PARQUET-BACKED — the serving posture
    // (componentsIndexShared materializes it once per snapshot), and
    // the shape that keeps the lifecycle plans store-rooted instead of
    // dragging the whole build DAG into every delete/merge reference
    val d = Tables.load(spark, sf, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("graft_comp").toString
    def mat(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$tmp/$name")
      Dedup.unpersistAll()
      spark.read.parquet(s"$tmp/$name")
    }
    val store = mat(Dedup.componentsIndex(d), "full")
    val rev = d.filter(col("doc_id") % 10 === 1).select(col("doc_id"))
    val delRebuild = mat(
      Dedup.componentsIndex(d.filter(col("doc_id") % 10 =!= 1)), "surv")
    assert(compStoreRows(Dedup.componentsIndexDelete(store, rev)) ==
      compStoreRows(delRebuild))
    Dedup.unpersistAll()
    val older = mat(
      Dedup.componentsIndex(d.filter(col("doc_id") % 10 =!= 3)), "older")
    val mg = Dedup.componentsIndexMerge(
      older, d.filter(col("doc_id") % 10 === 3))
    assert(compStoreRows(mg) == compStoreRows(store))
    Dedup.unpersistAll()
  }

  test("curriculum ranking store: merge exact, delete is the rebuild's prefix, roundtrip") {
    import graft.operators.Curriculum
    val k = 5
    def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "source")
    // source a straddles k (8 docs > 5), b fits, drop adds to a and
    // bootstraps c
    val base = (1L to 8L).map(i => (i, "a")) ++
      (101L to 103L).map(i => (i, "b"))
    val drop = (201L to 203L).map(i => (i, "a")) :+ ((301L, "c"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    val idx = Curriculum.curriculumIndex(docs(base), k)
    val merged = Curriculum.curriculumIndexMerge(idx, docs(drop), k)
    // merge ≡ rebuild on the union, counts included (source a's count
    // is 11 though only 5 rank — the heap-prefix property)
    assert(rows(merged) ==
      rows(Curriculum.curriculumIndex(docs(base ++ drop), k)))
    assert(merged.filter(col("source") === "a")
      .select(col("n_src")).distinct().collect().map(_.getLong(0)).toSeq
      == Seq(11L))
    // roundtrip: revoking exactly the merged drop restores counts
    // exactly and rows as a per-source PREFIX of the original store —
    // source a's drop arrivals displaced two old rows out of the
    // saturated top-k (gone until a rebuild, the documented tail);
    // source b (never touched) roundtrips bit-exactly, c vanishes
    val rt = Curriculum.curriculumIndexDelete(merged, docs(drop))
    def bySource(df: org.apache.spark.sql.DataFrame, src: String) =
      df.filter(col("source") === src).orderBy(col("rank")).collect()
        .map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSeq
    assert(bySource(rt, "b") == bySource(idx, "b"))
    assert(rt.filter(col("source") === "c").count() == 0L)
    val rtA = bySource(rt, "a")
    assert(rtA == bySource(idx, "a").take(rtA.length) && rtA.nonEmpty,
      s"roundtrip must be idx's prefix: $rtA vs ${bySource(idx, "a")}")
    // delete = the rebuild's PREFIX per source: revoke two of a's
    // ranked docs + all of b — a's survivors re-rank in place and
    // match the rebuild rank-for-rank over the surviving length; b
    // drops entirely (count 0); a's count decrements by the FULL
    // revoked count (ranked or not)
    val aTop = merged.filter(col("source") === "a")
      .orderBy(col("rank")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    val revoked = docs(Seq((aTop.head, "a"), (aTop(2), "a")) ++
      (101L to 103L).map(i => (i, "b")))
    val del = Curriculum.curriculumIndexDelete(merged, revoked)
    assert(del.filter(col("source") === "b").count() == 0L)
    val survA = del.filter(col("source") === "a").orderBy(col("rank"))
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSeq
    val rebuiltA = Curriculum.curriculumIndex(
        docs((base ++ drop).filterNot(r =>
          r._1 == aTop.head || r._1 == aTop(2))), k)
      .filter(col("source") === "a").orderBy(col("rank"))
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSeq
    assert(survA == rebuiltA.take(survA.length),
      s"delete must be the rebuild's prefix: $survA vs $rebuiltA")
    assert(survA.forall(_._3 == 9L), s"a's count must drop 11 -> 9: $survA")
    // the rebuild promotes one below-k doc into rank 4..5 — the
    // documented not-re-admitted tail the prefix contract allows
    assert(rebuiltA.length == k && survA.length == 3)
    graft.operators.Dedup.unpersistAll()
  }

  test("minhash/prefix/ivf merges equal their rebuilds (cap out-migration live)") {
    val dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val base = Seq((1L, dup), (2L, dup)).toDF("doc_id", "text")
    val drop = Seq((3L, dup)).toDF("doc_id", "text")
    val merged = Dedup.minhashIndexMerge(
      Dedup.minhashIndex(base, maxBandBucket = 0), drop)
    val rebuilt = Dedup.minhashIndex(base.unionByName(drop),
      maxBandBucket = 0)
    assert(mhRows(merged) == mhRows(rebuilt))
    // the merge pushes the duplicate buckets OVER cap 2: they must stop
    // serving, exactly as a rebuild decides
    assert(Dedup.minhashIndexCap(Dedup.minhashIndex(base,
      maxBandBucket = 0), maxBucket = 2).count() > 0L)
    assert(mhRows(Dedup.minhashIndexCap(merged, maxBucket = 2)) ==
      mhRows(Dedup.minhashIndexCap(rebuilt, maxBucket = 2)))
    assert(Dedup.minhashIndexCap(merged, maxBucket = 2).count() == 0L,
      "the planted cap out-migration must be live")
    // roundtrip
    assert(mhRows(Dedup.minhashIndexDelete(merged,
      drop.select(col("doc_id")))) == mhRows(
      Dedup.minhashIndex(base, maxBandBucket = 0)))
    // prefix merge: served answers equal the rebuilt index's
    val d = Tables.load(spark, sf, "documents")
    val cbase = d.filter(col("doc_id") % 4 =!= 0)
    val older = cbase.filter(col("doc_id") % 10 =!= 3)
    val cdrop = cbase.filter(col("doc_id") % 10 === 3)
    val probe = d.filter(col("doc_id") % 4 === 0)
    def pairs(idx: DataFrame): Set[(Long, Long)] =
      EventsStream.incrementalDedupStream(probe, idx)
        .select(col("doc_id"), col("base_id")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(Dedup.prefixIndexMerge(
        Dedup.incrementalIndex(older), cdrop)) ==
      pairs(Dedup.incrementalIndex(cbase)),
      "merged prefix index must serve exactly as the rebuilt index")
    // ivf member merge ≡ re-assignment of base ∪ drop
    val e = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cells = Similarity.lloydCentroids(e, nlist = 8, iters = 1)
    val eb = e.filter(col("vec_id") % 4 =!= 0)
    val ed = e.filter(col("vec_id") % 4 === 0)
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows(Similarity.ivfMembersMerge(cells,
        Similarity.ivfAssign(cells, eb), ed)) ==
      rows(Similarity.ivfAssign(cells, e)))
  }

  test("streaming twins stay green against the shrunk (deleted) base") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val header = "all rights reserved contact the site admin team"
    val base = Seq(
      (100L, s"$header plus some base only tail words"),
      (101L, "revoked boilerplate r1 r2 r3 r4 r5 r6 r7 r8 only here"))
      .toDF("doc_id", "text")
    val revoked = base.filter(col("doc_id") === 101L)
    val index = Dedup.spanIndexDelete(
      Dedup.spanIndexCounted(base, n = 8), revoked, n = 8)
    // a doc matching ONLY the revoked base doc's spans must now pass
    // through untouched; header contamination still excises
    val b1 = Seq(
      (0L, s"$header alpha beta"),
      (1L, "revoked boilerplate r1 r2 r3 r4 r5 r6 r7 r8 probe tail"))
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, String)]
    val q = EventsStream.spanExciseStream(
        in.toDF().toDF("doc_id", "text"), index, n = 8) { batch =>
      got ++= batch.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    }
    in.addData(b1: _*)
    q.processAllAvailable()
    q.stop()
    val byId = got.map(r => r._1 -> r._4).toMap
    assert(byId(0L) == "alpha beta",
      s"surviving-base spans must still excise: $byId")
    assert(byId(1L) ==
      "revoked boilerplate r1 r2 r3 r4 r5 r6 r7 r8 probe tail",
      s"revoked-base spans must no longer excise: $byId")
    // and the stream equals the batch operator over the SAME shrunk index
    val batchGot = Dedup.spanExciseAgainstIndex(
        b1.toDF("doc_id", "text"), index, n = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq.sortBy(_._1)
    assert(got.sortBy(_._1).toSeq == batchGot)
  }

  test("incremental pairs stream serves the deleted postings exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Seq(
      (100L, "fast scan joins rows"),
      (101L, "fast scan joins tables"),
      (102L, "fast scan beats slow scan"))
      .toDF("doc_id", "text")
    val revoked = Seq(102L).toDF("doc_id")
    val deleted = Dedup.postingsBand(
      Dedup.postingsDelete(Dedup.tfidfPostingsFull(base), revoked))
    val rebuilt = Dedup.postingsBand(
      Dedup.tfidfPostingsFull(base.filter(col("doc_id") =!= 102L)))
    assert(bandedRows(deleted) == bandedRows(rebuilt))
    val b1 = Seq((0L, "fast scan joins everywhere"))
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Double)]
    val q = EventsStream.incrementalPairsStream(
        in.toDF().toDF("doc_id", "text"), deleted) { batch =>
      got ++= batch.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    }
    in.addData(b1: _*)
    q.processAllAvailable()
    q.stop()
    val batchGot = Dedup.incrementalTfidfPairs(
        b1.toDF("doc_id", "text"), rebuilt)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(got.sortBy(t => (t._1, t._2)).toSeq == batchGot,
      "stream over deleted postings must equal batch over rebuilt postings")
    assert(!got.exists(_._1 == 102L),
      s"the revoked base doc must gain no new edges: $got")
  }

  test("curriculum delete with overflow buffer: delete equals the rebuild EXACTLY; exhaustion raises") {
    import graft.operators.Curriculum
    val k = 5
    val pad = 3
    def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "source")
    // source a saturates k AND the buffer (12 > k + pad = 8); b fits
    val base = (1L to 12L).map(i => (i, "a")) ++
      (101L to 103L).map(i => (i, "b"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    val idx = Curriculum.curriculumIndex(docs(base), k)
    val over = Curriculum.curriculumOverflow(docs(base), k, pad)
    assert(over.filter(col("source") === "a").count() == pad.toLong &&
      over.filter(col("source") === "b").count() == 0L,
      "overflow holds exactly the (k, k+pad] rows of saturated sources")
    val aTop = idx.filter(col("source") === "a").orderBy(col("rank"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    // revoke exactly `pad` of a's RANKED rows: the buffer refills the
    // trimmed tail, so delete == rebuild in FULL (no prefix qualifier —
    // the r17 below-k divergence this buffer closes)
    val rev1 = docs(aTop.take(pad).map((_, "a")))
    val del1 = Curriculum.curriculumIndexDelete(idx, rev1, Some(over), k)
    val rebuilt1 = Curriculum.curriculumIndex(
      docs(base.filterNot(r => aTop.take(pad).contains(r._1))), k)
    assert(rows(del1) == rows(rebuilt1),
      "delete with overflow must equal the rebuild exactly")
    // revoking only UNSTORED mass never exhausts: counts decrement,
    // rankings untouched, still rebuild-exact
    val unstored = base.map(_._1).filterNot(aTop.contains)
      .filterNot(d => over.collect().map(_.getLong(1)).contains(d))
      .filter(_ <= 12L).take(2)
    val rev2 = docs(unstored.map((_, "a")))
    val del2 = Curriculum.curriculumIndexDelete(idx, rev2, Some(over), k)
    val rebuilt2 = Curriculum.curriculumIndex(
      docs(base.filterNot(r => unstored.contains(r._1))), k)
    assert(rows(del2) == rows(rebuilt2))
    // NEGATIVE: pad+1 stored revocations exhaust the buffer — the plan
    // must RAISE (a rebuild-now signal), never silently serve short
    val rev3 = docs(aTop.take(pad + 1).map((_, "a")))
    val ex = intercept[Throwable] {
      Curriculum.curriculumIndexDelete(idx, rev3, Some(over), k).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else (Option(t.getMessage).getOrElse("") + "\n" +
        chain(t.getCause))
    assert(chain(ex).contains("overflow buffer exhausted"),
      s"expected the exhaustion assert, got: ${chain(ex)}")
    // the r18-ADVICE scenario verbatim (r19 verdict task 7): an exhausted
    // delete consumed under a pushed-down WHERE must STILL raise. A lazy
    // in-plan gate dies exactly here — the filter pushes through the
    // zero-row guard branch, constant-folds on its literal-null columns,
    // and prunes the assert subtree — so this spec pins the eager-action
    // form: the raise happens at call time, before any consumer predicate
    // can shape the plan.
    val exFiltered = intercept[Throwable] {
      Curriculum.curriculumIndexDelete(idx, rev3, Some(over), k)
        .filter(col("source") === "b" && col("rank") <= 2).count()
    }
    assert(chain(exFiltered).contains("overflow buffer exhausted"),
      s"a filtered select must not outlive the gate: ${chain(exFiltered)}")
    // a FILTERED consumer over a valid buffered delete stays exact —
    // the r18-advice scenario: a predicate pushed into the returned
    // plan used to be able to prune a lazy in-plan gate; with the
    // eager gate the plan carries no guard to prune
    val filt1 = del1.filter(col("source") === "a" && col("rank") <= 2)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    val filtRebuilt = rebuilt1.filter(col("source") === "a" && col("rank") <= 2)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    assert(filt1 == filtRebuilt,
      "filtered consumption of the buffered delete must match the rebuild")
    // TOTAL exhaustion: the ONLY source loses every stored row, so the
    // kept frame itself is empty — the gate must still raise (it is
    // evaluated eagerly at call time, before any consumer can shape
    // the plan), never return an empty ranking while n_src_after > 0
    val solo = docs((1L to 12L).map(i => (i, "a")))
    val soloIdx = Curriculum.curriculumIndex(solo, k)
    val soloOver = Curriculum.curriculumOverflow(solo, k, pad)
    val soloTop = soloIdx.orderBy(col("rank")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    val overIds = soloOver.collect().map(_.getLong(1)).toSeq
    val revAll = docs((soloTop ++ overIds).map((_, "a")))
    val ex2 = intercept[Throwable] {
      Curriculum.curriculumIndexDelete(soloIdx, revAll, Some(soloOver), k)
        .collect()
    }
    assert(chain(ex2).contains("overflow buffer exhausted"),
      s"total exhaustion must raise, not serve empty: ${chain(ex2)}")
    graft.operators.Dedup.unpersistAll()
  }

  test("curriculum overflow merges with the index: buffered delete stays exact across a compaction") {
    // the merge convention's tenth artifact (r18 verdict task 6): a
    // compaction must REFILL the buffer so delete-after-merge is still
    // the exact rebuild — merging only the index would leave the next
    // buffered delete exact against the pre-merge snapshot
    import graft.operators.Curriculum
    val k = 5
    val pad = 3
    def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "source")
    val base = (1L to 10L).map(i => (i, "a")) ++
      (101L to 104L).map(i => (i, "b"))
    val drop = (11L to 16L).map(i => (i, "a")) ++
      (105L to 107L).map(i => (i, "b"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val idx = Curriculum.curriculumIndex(docs(base), k)
    val over = Curriculum.curriculumOverflow(docs(base), k, pad)
    // merged buffer == the buffer a rebuild on the union would persist
    val mergedOver = Curriculum.curriculumOverflowMerge(
      idx, over, docs(drop), k, pad)
    val rebuiltOver = Curriculum.curriculumOverflow(docs(base ++ drop), k, pad)
    assert(rows(mergedOver) == rows(rebuiltOver),
      "overflow merge must equal the rebuilt buffer exactly")
    val mergedIdx = Curriculum.curriculumIndexMerge(idx, docs(drop), k)
    // delete-after-merge WITH the merged buffer == rebuild on survivors
    val unionTop = mergedIdx.filter(col("source") === "a")
      .orderBy(col("rank")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    val rev = docs(unionTop.take(pad).map((_, "a")))
    val del = Curriculum.curriculumIndexDelete(
      mergedIdx, rev, Some(mergedOver), k)
    val rebuilt = Curriculum.curriculumIndex(
      docs((base ++ drop).filterNot(r => unionTop.take(pad).contains(r._1))), k)
    def full(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(full(del) == full(rebuilt),
      "buffered delete after a compaction must equal the rebuild exactly")
    graft.operators.Dedup.unpersistAll()
  }

  test("x22/x24 are exact thin views of the unified x25 audit") {
    // one convention, one set of stores: the historical keys must be
    // row-for-row the store-subset projection of the full artifact
    val dir = "/root/testdata/sf0.001"
    def rows(name: String, dropParams: Boolean) = {
      val df0 = SparkEntry.queries(name)(spark, dir)
      val df = if (dropParams) df0.drop("params") else df0
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).map(k => k._1 -> k).toMap
    }
    val full = rows("x25_takedown_audit_full", dropParams = true)
    val x22 = rows("x22_takedown_audit", dropParams = false)
    val x24 = rows("x24_takedown_audit_ext", dropParams = false)
    assert(x22.keySet == Set("span_index", "tfidf_postings", "mh_index",
      "components"))
    assert(x24.keySet == Set("charspan_index", "secrets_index",
      "ivf_members"))
    (x22 ++ x24).foreach { case (s, row) =>
      assert(full(s) == row, s"store $s diverges from the x25 artifact")
    }
    graft.operators.Dedup.unpersistAll()
  }
}
