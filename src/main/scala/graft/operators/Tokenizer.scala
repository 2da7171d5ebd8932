package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer-vocabulary induction over a corpus — the step that turns
  * raw training text into the merge table a subword tokenizer runs on.
  *
  * Scale shape (the k-means/LloydFit discipline): the DISTRIBUTED stage is
  * one word-frequency aggregation — `explode(split) → groupBy(word) →
  * count`, map-combinable, the only pass over the corpus. The merge loop
  * then runs DRIVER-SIDE over the compact (word, count) table: classic BPE
  * needs only word frequencies, never the corpus again, and a word vocab
  * is bounded (≲ millions) regardless of corpus size — `fitCap` keeps the
  * driver table to the most frequent words, which is where all the merge
  * mass lives. This is how production tokenizer trainers work too: corpus
  * → word counts (distributed) → merges (local).
  *
  * Determinism: ties on pair frequency break lexicographically, word
  * selection ties break lexicographically — same corpus, same merges, on
  * any partitioning or cluster size.
  */
object Tokenizer {

  /** End-of-word sentinel (kept off the corpus alphabet: documents are
    * whitespace-tokenized words, `</w>` cannot appear inside one).
    */
  val EndOfWord = "</w>"

  /** SentencePiece-style unigram-LM tokenizer trainer (Kudo ACL'18's
    * pipeline shape: substring-seeded vocabulary → E-step best
    * segmentation under the current piece scores → M-step re-score and
    * prune), made INTEGER-EXACT and SQL-replayable end to end — the
    * u3 discipline applied to the unigram model:
    *
    *  - Scores are BIT LENGTHS, not log probs: a piece with seed mass
    *    S_p costs `(bits(N) − bits(S_p))·1024 + 1` per use (bits =
    *    `length(bin(x))` — the engine-shared exact integer log2 the p5
    *    query already relies on; +1 charges each piece so the DP
    *    minimizes (surprisal, piece count) lexicographically, the 1024
    *    scale keeping the two orthogonal for words ≤ 1024 pieces).
    *    Doubles' libm `ln` is NOT cross-engine exact; `bin` is.
    *  - The E-step Viterbi is RELATIONAL: min-plus rounds over the
    *    (word, pos) DAG — `maxWordLen` unrolled join+struct-min rounds
    *    (the g13 level pattern), each state carrying (cost, path) with
    *    the path string as the total tie-break, so the argmin
    *    segmentation is unique and both engines agree byte-for-byte.
    *    Distributed throughout: the piece table joins by piece (one
    *    shuffle), never rides the driver.
    *  - The M-step keeps every single character (coverage) plus the
    *    `vocabTarget` best multi-character pieces by (usage, piece) —
    *    a TakeOrdered limit, deterministic.
    *
    * Trained at the DISTINCT-WORD level (the u4 oracle discipline):
    * `fitCap` most frequent words, usage weighted by word count. Words
    * longer than `maxWordLen` chars or containing U+001F (the path
    * delimiter) are excluded from the trainer table — the documented
    * corpus contract, mirrored in the oracle. Output: the pruned vocab
    * `(piece, n_uses)` (Viterbi-weighted occurrences; kept single
    * chars may carry 0).
    */
  def unigramLm(
      docs: DataFrame,
      textCol: String = "text",
      fitCap: Int = 65536,
      maxWordLen: Int = 12,
      maxPieceLen: Int = 4,
      seedCap: Int = 4096,
      vocabTarget: Int = 2048): DataFrame = {
    require(maxWordLen >= 1 && maxWordLen <= 32,
      s"maxWordLen must be in [1, 32], got $maxWordLen")
    require(maxPieceLen >= 1 && maxPieceLen <= maxWordLen,
      s"maxPieceLen must be in [1, maxWordLen], got $maxPieceLen")
    val us = String.valueOf(31.toChar)
    val wt = Dedup.persistPublic(
      wordCounts(docs, textCol, fitCap)
        .filter(length(col("word")) <= maxWordLen &&
          !col("word").contains(us)))
    // every substring occurrence of length 1..maxPieceLen, weighted by
    // the word's corpus count — the seed mass
    val spans = Dedup.persistPublic(wt
      .select(col("word"), col("cnt"),
        explode(sequence(lit(0), length(col("word")) - 1)).as("j"))
      .select(col("word"), col("cnt"), col("j"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("j")))).as("l"))
      .select(col("word"), col("cnt"), col("j"), col("l"),
        expr("substring(word, j + 1, l)").as("piece")))
    val seed = spans.groupBy(col("piece")).agg(sum(col("cnt")).as("s"))
    // coverage: all single chars survive seeding; multi-char pieces cap
    // at the seedCap best by (mass, piece) — TakeOrdered, deterministic
    val vocab0 = Dedup.persistPublic(
      seed.filter(length(col("piece")) === 1).union(
        seed.filter(length(col("piece")) > 1)
          .orderBy(col("s").desc, col("piece")).limit(seedCap)))
    val n1 = vocab0.agg(sum(col("s")).as("n"))
    val edges = Dedup.persistPublic(spans
      .join(vocab0.select(col("piece"), col("s")), Seq("piece"))
      .crossJoin(broadcast(n1))
      .select(col("word"), col("j"), (col("j") + col("l")).as("k"),
        col("piece"),
        ((length(bin(col("n"))) - length(bin(col("s"))))
          .cast("long") * 1024L + 1L).as("w")))
    // relational Viterbi: maxWordLen min-plus rounds; each state is the
    // best (cost, path) for (word, pos), path = US-delimited pieces.
    // Each round references the previous round TWICE (stutter union +
    // extension join), so the logical plan would double per round —
    // localCheckpoint truncates the lineage each round (the
    // connectedComponents/g9 fixpoint discipline; this is a TRAINER, so
    // eager per-round jobs are fit cost, not query cost, and the state
    // is O(fitCap·maxWordLen) rows regardless of corpus size).
    var dist = wt.select(col("word"), lit(0).as("pos"),
      lit(0L).as("cost"), lit("").as("path"))
    (1 to maxWordLen).foreach { _ =>
      val step = dist.as("d").join(edges.as("e"),
          col("d.word") === col("e.word") && col("d.pos") === col("e.j"))
        .select(col("d.word").as("word"), col("e.k").as("pos"),
          (col("d.cost") + col("e.w")).as("cost"),
          concat(col("d.path"), lit(us), col("e.piece")).as("path"))
      dist = dist.union(step)
        .groupBy(col("word"), col("pos"))
        .agg(min(struct(col("cost"), col("path"))).as("b"))
        .select(col("word"), col("pos"),
          col("b.cost").as("cost"), col("b.path").as("path"))
        .localCheckpoint()
    }
    val best = dist.join(wt, Seq("word"))
      .filter(col("pos") === length(col("word")))
    val usage = best
      .select(col("cnt"),
        explode(filter(split(col("path"), us),
          (x: Column) => length(x) > 0)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("n_uses"))
    // M-step prune: single chars always kept (coverage for the next
    // round / unseen words), multi-char pieces keep the vocabTarget
    // best by Viterbi usage — again a TakeOrdered limit
    val chars = vocab0.filter(length(col("piece")) === 1)
      .join(usage, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("n_uses"), lit(0L)).as("n_uses"))
    val multi = usage.filter(length(col("piece")) > 1)
      .orderBy(col("n_uses").desc, col("piece")).limit(vocabTarget)
    chars.union(multi).orderBy(col("piece"))
  }

  /** Learn `numMerges` BPE merge rules from the corpus. Returns the rules
    * in application order, each a pair of adjacent symbols to fuse.
    */
  def learnBpeMerges(
      docs: DataFrame,
      textCol: String = "text",
      numMerges: Int = 64,
      fitCap: Int = 65536): Seq[(String, String)] = {
    val counts = wordCounts(docs, textCol, fitCap)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    learnFromCounts(counts, numMerges)
  }

  /** The distributed stage: (word, count) for the `fitCap` most frequent
    * words (ties on count break lexicographically so the cap is
    * deterministic). One shuffle keyed on the word.
    */
  def wordCounts(docs: DataFrame, textCol: String, fitCap: Int): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), "[ \t\n\f\r]+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(fitCap)

  /** Cap-free fully-DISTRIBUTED merge learning — [[learnBpeMerges]]'
    * twin for corpora whose word vocabulary outgrows any driver
    * `fitCap`: the frequency table never leaves the cluster. Per round:
    * one map-combinable pair-count aggregate over the O(vocab)
    * (word, freq, symbols) table (the corpus itself is scanned ONCE,
    * for word counts), a ONE-ROW argmax (`orderBy(cnt desc, a, b)
    * .limit(1)` — TakeOrderedAndProject, per-partition top-1, never a
    * global sort) broadcast back, and a map-only left-to-right
    * non-overlapping fold applying the merge inside each word's symbol
    * array — a codegen'd `aggregate` HOF over a unit-separator (0x1F) delimited
    * accumulator, no UDF. Same semantics as the driver loop: `</w>`
    * sentinel appended, count ties break on the (a, b) pair
    * lexicographically, so BOTH trainers learn the identical merge
    * sequence on the same corpus (caveat: words containing U+001F — the
    * accumulator delimiter — are excluded here and in the oracle; the
    * driver loop would include them). Exact long counts + deterministic
    * fold = bit-exact on any partitioning, SQL-replayable.
    *
    * Returns one row per round: `(round, a, b, cnt, n_syms)` with
    * `n_syms` the corpus symbol count AFTER the round's merge — the
    * compression trace a tokenizer-training run monitors. The evolving
    * symbol table is persisted per round ([[Dedup.persistPublic]];
    * release with `Dedup.unpersistAll()`).
    */
  def distributedMergeRounds(docs: DataFrame, textCol: String = "text",
      rounds: Int = 2): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val us = String.valueOf(31.toChar)
    // words carrying the U+001F accumulator delimiter are excluded (the
    // documented corpus contract — mirrored in the oracle): the fold's
    // delimited accumulator cannot represent them, and silently learning
    // from a corrupted symbolization would be worse than skipping the
    // (pathological) word. `(?s).` so EVERY code point symbolizes — Java's
    // bare '.' skips U+0085/U+2028/U+2029, which RE2 and the driver
    // trainer's codePointSymbols both keep.
    val wf = docs
      .select(explode(
        graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .filter(!col("w").contains(us))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    val syms0 = wf.select(col("w"), col("f"),
      concat(expr("regexp_extract_all(w, '(?s).', 0)"),
        array(lit(EndOfWord))).as("syms"))
    mergeRoundsFrom(syms0, rounds)
  }

  /** BYTE-LEVEL cap-free distributed merge learning —
    * [[distributedMergeRounds]] with the symbol domain swapped to
    * remapped UTF-8 bytes (u10's domain; u11's trainer): the
    * symbolization is composable built-ins only — `encode(w, 'UTF-8')`,
    * per-index 1-byte `substring`, `conv(hex(b), 16, 10)` for the byte
    * value, `element_at` into the 256-entry [[ByteRemap]] literal — so
    * the whole round stays codegen'd SQL with zero custom expressions
    * and the oracle replays it with the same arithmetic. NO U+001F word
    * exclusion is needed (unlike the code-point form): remapped byte
    * symbols are printable by construction, so the fold's chr(31)
    * accumulator delimiter can never collide with corpus content — the
    * byte domain's robustness argument, visible right here. Learns the
    * same merges as [[learnByteBpeMerges]] on any corpus the driver cap
    * doesn't bind (spec-pinned), and the identical sequence as the
    * code-point trainers on printable-ASCII corpora.
    */
  def distributedByteMergeRounds(docs: DataFrame, textCol: String = "text",
      rounds: Int = 2): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val wf = docs
      .select(explode(
        graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    val remap = typedLit(ByteRemap.toSeq)
    val syms0 = wf.select(col("w"), col("f"),
      concat(
        transform(sequence(lit(1), octet_length(col("w"))),
          i => element_at(remap,
            conv(hex(encode(col("w"), "UTF-8").substr(i, lit(1))),
              16, 10).cast("int") + 1)),
        array(lit(EndOfWord))).as("syms"))
    mergeRoundsFrom(syms0, rounds)
  }

  /** The shared per-round merge loop over a symbolized word-frequency
    * frame `(w, f, syms)`: pair counts, one-row argmax, HOF fold —
    * see [[distributedMergeRounds]] for the semantics and scale notes.
    */
  private def mergeRoundsFrom(syms0: DataFrame, rounds: Int): DataFrame = {
    val us = String.valueOf(31.toChar)
    var syms = Dedup.persistPublic(syms0)
    val perRound = (1 to rounds).map { r =>
      val pc = syms
        .select(col("f"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("f")).as("cnt"))
      val top = pc.orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1)
      val merged = syms.crossJoin(broadcast(top))
        .select(col("w"), col("f"), col("a"), col("b"), col("cnt"),
          split(aggregate(
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            element_at(col("syms"), 1),
            (acc, x) => when(
              (acc === col("a") || acc.endsWith(concat(lit(us), col("a"))))
                && x === col("b"),
              concat(acc, col("b")))
              .otherwise(concat(acc, lit(us), x))), us).as("syms"))
      syms = Dedup.persistPublic(
        merged.select(col("w"), col("f"), col("syms")))
      // a/b/cnt are constant (one-row top) — the group collapses to the
      // round's summary row while n_syms sums the post-merge table
      merged.groupBy(col("a"), col("b"), col("cnt"))
        .agg(sum(col("f") * size(col("syms"))).as("n_syms"))
        .select(lit(r).as("round"), col("a"), col("b"), col("cnt"),
          col("n_syms"))
    }
    perRound.reduce(_.unionByName(_)).orderBy(col("round"))
  }

  /** GPT-2's byte→printable-character remap (Radford et al. 2019,
    * `encoder.py bytes_to_unicode` — public): the 188 bytes that are
    * printable-and-not-space in Latin-1 (33..126, 161..172, 174..255)
    * map to THEMSELVES as one-character strings; the other 68 (controls,
    * space, 127..160, 173) map to U+0100.. in byte order. Every byte
    * symbol is exactly one visible code point, so merge tables stay
    * printable strings and the SQL oracle can carry them as literals —
    * the reason production byte-level tokenizers use this remap too.
    */
  val ByteRemap: Array[String] = {
    val printable =
      ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    Array.tabulate(256) { b =>
      if (printable(b)) new String(Character.toChars(b))
      else { val s = new String(Character.toChars(256 + n)); n += 1; s }
    }
  }

  /** One symbol per UTF-8 BYTE of the word, each remapped through
    * [[ByteRemap]] — the GPT-2/LLaMA-class byte-level symbol domain. On
    * printable ASCII (33..126, which whitespace-tokenized words mostly
    * are) this is identical to [[codePointSymbols]] because those bytes
    * remap to themselves; a non-ASCII code point splits into its 2-4
    * UTF-8 bytes (é → "Ã","©"), which is exactly the coverage argument
    * for byte-level BPE — 256 base symbols reach EVERY string, where a
    * code-point alphabet needs an open-ended vocabulary.
    */
  def byteSymbols(w: String): Vector[String] = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < bytes.length) { out += ByteRemap(bytes(i) & 0xff); i += 1 }
    out.result()
  }

  /** One symbol per Unicode CODE POINT (not UTF-16 unit), so non-BMP
    * characters — emoji, CJK extensions — stay whole instead of splitting
    * into lone surrogates that `UTF8String.fromString` would mangle into
    * replacement characters. For BMP-only text this is identical to a
    * per-char split.
    */
  private[operators] def codePointSymbols(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** BYTE-LEVEL merge learning — [[learnBpeMerges]] with the symbol
    * domain swapped to [[byteSymbols]] (the GPT-2/LLaMA-class trainer
    * shape): same distributed word-count stage, same driver merge loop,
    * same deterministic tie-breaks, so on a printable-ASCII corpus it
    * learns the IDENTICAL merge sequence (byte symbols ≡ code points
    * there — spec-pinned); on non-ASCII corpora the rules are over
    * UTF-8 bytes, closing over every string with 256 base symbols.
    */
  def learnByteBpeMerges(
      docs: DataFrame,
      textCol: String = "text",
      numMerges: Int = 64,
      fitCap: Int = 65536): Seq[(String, String)] = {
    val counts = wordCounts(docs, textCol, fitCap)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    learnFromCounts(counts, numMerges, byteSymbols)
  }

  /** Driver-side merge loop over the compact frequency table — pure
    * function of the counts, no Spark. `symbolize` picks the base
    * alphabet: code points (default, the u3/u4 domain) or
    * [[byteSymbols]] (the u10 byte-level domain).
    */
  def learnFromCounts(
      wordCounts: Seq[(String, Long)], numMerges: Int,
      symbolize: String => Vector[String] = codePointSymbols): Seq[(String, String)] = {
    // each word as its symbol sequence: base symbols + </w>
    var words: Seq[(Vector[String], Long)] = wordCounts.map { case (w, c) =>
      (symbolize(w) :+ EndOfWord, c)
    }
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val pairCounts = new java.util.HashMap[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          pairCounts.merge((syms(j), syms(j + 1)), c, (a, b) => a + b)
          j += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // max count, ties lexicographic — deterministic
        var best: ((String, String), Long) = null
        pairCounts.forEach { (p, c) =>
          if (best == null || c > best._2 ||
            (c == best._2 && pairLt(p, best._1))) best = (p, c)
        }
        val (a, b) = best._1
        merges += ((a, b))
        words = words.map { case (syms, c) => (mergePair(syms, a, b), c) }
        i += 1
      }
    }
    merges.result()
  }

  private def pairLt(x: (String, String), y: (String, String)): Boolean =
    x._1 < y._1 || (x._1 == y._1 && x._2 < y._2)

  private def mergePair(
      syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
        out += (a + b); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Segment one word with a learned merge table. Semantics are standard
    * BPE inference — rules applied in learned order — but the algorithm is
    * the rank-greedy priority-queue merge production trainers use:
    * repeatedly fuse the adjacent pair with the LOWEST merge rank
    * (leftmost first on ties), O(|word| log |word|) INDEPENDENT of the
    * merge-table size, vs the naive per-rule rescan's O(numMerges·|word|)
    * which melts at a production 32k–100k-rule table. Equivalent to
    * sequential application because a merge only creates pairs involving
    * the NEW symbol, whose rules were necessarily learned later (higher
    * rank) — so rank order IS application order. The `</w>` sentinel is
    * stripped from the output symbols.
    */
  def segmentWord(word: String, merges: Seq[(String, String)]): Seq[String] =
    segmentWord(word, new BpeMergeTable(merges))

  /** Hot-path form: the rank lookup is prebuilt once per task (the
    * [[BpeSegment]] reference object), not once per word.
    */
  def segmentWord(word: String, table: BpeMergeTable): Seq[String] =
    segmentBase(codePointSymbols(word) :+ EndOfWord, table)

  /** BYTE-LEVEL segmentation of one word: the same rank-greedy PQ merge
    * over [[byteSymbols]] instead of code points — [[segmentWord]]'s
    * u10 twin. The rank-greedy ≡ sequential equivalence argument is
    * symbol-domain-agnostic (a merge only creates pairs involving the
    * NEW symbol, whose rules were learned later), so it holds here
    * unchanged; on printable-ASCII words the two segmenters agree
    * symbol-for-symbol under the same table (spec-pinned).
    */
  def byteSegmentWord(word: String, table: BpeMergeTable): Seq[String] =
    segmentBase(byteSymbols(word) :+ EndOfWord, table)

  /** Convenience form building the rank table per call (tests/driver). */
  def byteSegmentWord(word: String, merges: Seq[(String, String)]): Seq[String] =
    byteSegmentWord(word, new BpeMergeTable(merges))

  private def segmentBase(base: Vector[String], table: BpeMergeTable): Seq[String] = {
    val n = base.length
    val sym = base.toArray
    // doubly-linked live list over the original positions; a merged symbol
    // keeps its LEFT constituent's position, so position order stays the
    // left-to-right scan order sequential application uses
    val nxt = Array.tabulate(n)(_ + 1)
    val prv = Array.tabulate(n)(_ - 1)
    val alive = Array.fill(n)(true)

    // min-heap on (rank, leftPos); scala's PQ is a max-heap, so reverse
    val ord = Ordering.by[(Int, Int, String, String), (Int, Int)](c => (c._1, c._2)).reverse
    val pq = scala.collection.mutable.PriorityQueue.empty[(Int, Int, String, String)](ord)
    def push(i: Int): Unit = {
      val j = nxt(i)
      if (j < n) {
        val r = table.rank(sym(i), sym(j))
        if (r != Int.MaxValue) pq.enqueue((r, i, sym(i), sym(j)))
      }
    }
    var i0 = 0
    while (i0 < n - 1) { push(i0); i0 += 1 }

    while (pq.nonEmpty) {
      val (_, i, a, b) = pq.dequeue()
      // stale-entry check: both endpoints must still be live, adjacent,
      // and carry the symbols the entry was enqueued with
      if (alive(i) && sym(i) == a) {
        val j = nxt(i)
        if (j < n && alive(j) && sym(j) == b) {
          sym(i) = a + b
          alive(j) = false
          nxt(i) = nxt(j)
          if (nxt(j) < n) prv(nxt(j)) = i
          if (prv(i) >= 0) push(prv(i))
          push(i)
        }
      }
    }

    val out = Vector.newBuilder[String]
    var k = 0
    while (k < n) {
      if (alive(k)) {
        val s = sym(k).replace(EndOfWord, "")
        if (s.nonEmpty) out += s
      }
      k += 1
    }
    out.result()
  }

  /** The naive per-rule rescan the PQ form replaces — kept (test-only) as
    * the differential oracle for [[segmentWord]]'s equivalence property.
    */
  private[graft] def segmentWordSequential(
      word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = codePointSymbols(word) :+ EndOfWord
    merges.foreach { case (a, b) => syms = mergePair(syms, a, b) }
    syms.map(s => s.replace(EndOfWord, "")).filter(_.nonEmpty)
  }

  /** [[segmentWordSequential]] over the byte symbol domain — the
    * differential oracle for [[byteSegmentWord]].
    */
  private[graft] def byteSegmentWordSequential(
      word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = byteSymbols(word) :+ EndOfWord
    merges.foreach { case (a, b) => syms = mergePair(syms, a, b) }
    syms.map(s => s.replace(EndOfWord, "")).filter(_.nonEmpty)
  }

  /** Whole-document segmentation for the imperative kernel: lowercased
    * whitespace words, each segmented with the merge table, concatenated.
    * Called from [[BpeSegment]]'s generated code — one pass per document,
    * merge table resolved once per task via a codegen reference object.
    */
  def bpeSegment(
      text: org.apache.spark.unsafe.types.UTF8String,
      table: BpeMergeTable): org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = text.toLowerCase.toString.split("[ \t\n\f\r]+").filter(_.nonEmpty)
    val out = Vector.newBuilder[org.apache.spark.unsafe.types.UTF8String]
    words.foreach { w =>
      segmentWord(w, table).foreach(s =>
        out += org.apache.spark.unsafe.types.UTF8String.fromString(s))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.result().toArray[Any])
  }

  /** Column form: `graft`-style codegen'd expression over a learned merge
    * table — `Tokenizer.segment(col("text"), merges)` yields the subword
    * array. The table rides along as a plan reference object (O(numMerges)
    * driver state, the Lloyd-centroid discipline), so the corpus side is a
    * map-only fused pass — no join, no HOF interpretation.
    */
  def segment(text: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(BpeSegment(
      GraftSqlBridge.expressionNoSpark(text), merges))
  }

  /** Whole-document BYTE-LEVEL segmentation for the imperative kernel:
    * lowercased whitespace words, each byte-segmented with the merge
    * table, concatenated — [[bpeSegment]]'s u10 twin, called from
    * [[ByteBpeSegment]]'s generated code.
    */
  def byteBpeSegment(
      text: org.apache.spark.unsafe.types.UTF8String,
      table: BpeMergeTable): org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = text.toLowerCase.toString.split("[ \t\n\f\r]+").filter(_.nonEmpty)
    val out = Vector.newBuilder[org.apache.spark.unsafe.types.UTF8String]
    words.foreach { w =>
      byteSegmentWord(w, table).foreach(s =>
        out += org.apache.spark.unsafe.types.UTF8String.fromString(s))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.result().toArray[Any])
  }

  /** Column form of the BYTE-LEVEL segmenter — `Tokenizer.byteSegment(
    * col("text"), merges)` yields the byte-symbol subword array under a
    * fixed merge table; same fused map-only scale shape as [[segment]].
    */
  def byteSegment(text: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(ByteBpeSegment(
      GraftSqlBridge.expressionNoSpark(text), merges))
  }

  /** Serving-side word-length contract shared with [[unigramLm]]'s
    * trainer: words longer than this many code points skip the Viterbi
    * and fall back to one-piece-per-character segmentation (the SQL
    * oracle replays the DP with exactly this many unrolled min-plus
    * rounds, so the cut keeps both engines total AND identical).
    */
  val UnigramMaxWordLen = 12

  /** Unigram-LM Viterbi segmentation of one word under a fixed piece
    * table — the serving half of [[unigramLm]], [[segmentWord]]'s
    * analogue for the unigram model. Semantics (mirrored byte-for-byte
    * by the u7 oracle's unrolled relational DP):
    *
    *  - the word is a sequence of CODE POINTS (a non-BMP char is one
    *    symbol, never a lone surrogate — DuckDB `length`/`substring`
    *    count code points too);
    *  - every single code point is always segmentable at
    *    `table.charCost` (full coverage — no word is unreachable);
    *    explicit pieces (1..[[UnigramPieceTable.maxPieceLen]] symbols)
    *    cost their table entry, single-symbol entries taking the MIN of
    *    the two;
    *  - the DP minimizes (total cost, US-delimited path) — the same
    *    (cost, path)-lexicographic struct-min as the trainer, so the
    *    argmin segmentation is unique cross-engine. Appending the same
    *    ` piece` suffix preserves path order because the
    *    delimiter sorts below every corpus character — the property
    *    that makes keep-only-the-best-per-position DP valid under the
    *    lexicographic tie-break;
    *  - words longer than [[UnigramMaxWordLen]] code points return one
    *    piece per code point (the documented long-tail fallback).
    *
    * With every table cost ≡ 1 (mod 1024) the piece COUNT of any
    * min-cost path is `cost mod 1024` for words ≤ 12 pieces — counts
    * are tie-invariant by construction.
    */
  def unigramSegmentWord(word: String, table: UnigramPieceTable): Seq[String] = {
    val cps = codePoints(word)
    val n = cps.length
    if (n == 0) return Nil
    if (n > UnigramMaxWordLen) return cps.toSeq
    val INF = Long.MaxValue / 4
    val cost = Array.fill(n + 1)(INF)
    val path = Array.fill(n + 1)("")
    cost(0) = 0L
    var i = 0
    while (i < n) {
      if (cost(i) < INF) {
        val sb = new java.lang.StringBuilder
        var l = 1
        val lMax = math.min(table.maxPieceLen, n - i)
        while (l <= lMax) {
          sb.append(cps(i + l - 1))
          val piece = sb.toString
          val c = table.cost(piece)
          if (c < INF) {
            val cand = cost(i) + c
            val candPath = path(i) + "" + piece
            val j = i + l
            if (cand < cost(j) ||
                (cand == cost(j) && candPath.compareTo(path(j)) < 0)) {
              cost(j) = cand
              path(j) = candPath
            }
          }
          l += 1
        }
      }
      i += 1
    }
    path(n).split('').filter(_.nonEmpty).toSeq
  }

  /** Split a string into whole code points (surrogate pairs stay fused). */
  private def codePoints(s: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      out += s.substring(i, i + w)
      i += w
    }
    out.result()
  }

  /** Whole-document unigram segmentation for the imperative kernel:
    * lowercased whitespace words, each Viterbi-segmented with the piece
    * table, concatenated. Called from [[UnigramSegment]]'s generated
    * code — one pass per document, the table resolved once per task via
    * a codegen reference object.
    */
  def unigramSegmentDoc(
      text: org.apache.spark.unsafe.types.UTF8String,
      table: UnigramPieceTable): org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = text.toLowerCase.toString.split("[ \t\n\f\r]+").filter(_.nonEmpty)
    val out = Vector.newBuilder[org.apache.spark.unsafe.types.UTF8String]
    words.foreach { w =>
      unigramSegmentWord(w, table).foreach(s =>
        out += org.apache.spark.unsafe.types.UTF8String.fromString(s))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.result().toArray[Any])
  }

  /** Column form: `Tokenizer.unigramSegment(col("text"), pieces,
    * charCost)` yields the unigram-LM subword array under a FIXED piece
    * table (the u4 fixed-merge-table discipline applied to the unigram
    * model). The table rides as a codegen reference object — O(vocab)
    * driver state, one map-only fused corpus pass, no join/shuffle/
    * vocabulary exchange.
    */
  def unigramSegment(
      text: Column, pieces: Seq[(String, Long)], charCost: Long): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(UnigramSegment(
      GraftSqlBridge.expressionNoSpark(text), pieces, charCost))
  }

  /** One EM re-estimation round for the unigram-LM tokenizer (Kudo
    * ACL'18's iterate step, hard/Viterbi-EM form) — the loop [[unigramLm]]
    * seeds: E-step = Viterbi-segment the corpus under the CURRENT piece
    * table (the [[unigramSegment]] serving expression — one map-only
    * fused corpus pass, the model rides as a codegen reference object)
    * and count per-piece usage; M-step = re-estimate every used piece's
    * cost from its usage share in the engine-shared exact bit-length
    * metric, `(bits(N) − bits(n_uses))·1024 + 1` with `N` the total
    * piece count (the u6 cost discipline — `bin()` is exact on both
    * engines, libm ln is not). Pieces the Viterbi never uses DROP (the
    * EM prune — their posterior mass is zero under the hard E-step);
    * totality of the NEXT round is the serving expression's charCost
    * fallback, so iterating is just feeding the output back in. The
    * only corpus-sized stage is the one aggregate; the M-step runs on
    * the O(vocab) frame (whole-frame window over a provably tiny
    * frame).
    *
    * Returns `(piece, n_uses, cost)` — the re-estimated model, the
    * same shape [[unigramSegment]] consumes.
    */
  def unigramEmStep(
      docs: DataFrame,
      pieces: Seq[(String, Long)],
      charCost: Long = 6145L,
      textCol: String = "text"): DataFrame = {
    val wnd = org.apache.spark.sql.expressions.Window.partitionBy()
    docs
      .select(explode(unigramSegment(col(textCol), pieces, charCost))
        .as("piece"))
      .groupBy(col("piece")).agg(count(lit(1)).as("n_uses"))
      .withColumn("n", sum(col("n_uses")).over(wnd))
      .select(col("piece"), col("n_uses"),
        ((length(bin(col("n"))) - length(bin(col("n_uses"))))
          .cast("long") * 1024L + 1L).as("cost"))
  }

  /** Unigram EM to CONVERGENCE (u14) — [[unigramEmStep]] looped with
    * the pageRankConverged converge-or-maxIters discipline: iterate
    * the hard-EM round until the MODEL (the sorted `(piece, cost)`
    * relation — everything segmentation depends on) reaches a
    * fixpoint, or `maxIters` rounds have run. Fixpoint detection is
    * exact and free: each round's O(vocab) model must be collected
    * anyway (the next E-step ships it as a codegen reference object —
    * the u4/u7 fixed-table discipline), so the loop state lives on
    * the DRIVER and no lineage ever accumulates — this loop needs no
    * checkpoints, unlike the rank fixpoints whose state is a
    * vertex-cardinality frame. A stable model also fixes `n_uses`
    * (same model ⇒ same Viterbi ⇒ same counts), so the last executed
    * round's stats ARE the fixpoint's.
    *
    * `runToFixpoint = false` forces exactly `maxIters` rounds — the
    * deterministic fixed-round form the hash gate runs (the g9
    * tol-zero discipline; the oracle unrolls the relational Viterbi
    * once per round). Monotone structure (spec-pinned): the
    * MULTI-CHAR piece set can only SHRINK round over round (unused
    * pieces drop; segmentation only ever uses model pieces), while
    * single-char fallbacks may ENTER with their usage — char
    * coverage, the Kudo discipline — so the vocab is bounded by the
    * shrinking multi-char set plus the corpus's finite alphabet.
    *
    * Per round: one fused map-only corpus pass + one corpus-sized
    * aggregate (the [[unigramEmStep]] shape) + one O(vocab) collect.
    */
  def unigramEmConverged(docs: DataFrame, pieces: Seq[(String, Long)],
      charCost: Long = 6145L, maxIters: Int = 8,
      runToFixpoint: Boolean = true, textCol: String = "text"): DataFrame =
    unigramEmConvergedWithStats(docs, pieces, charCost, maxIters,
      runToFixpoint, textCol)._1

  /** [[unigramEmConverged]] plus `(rounds run, converged)` — the
    * observability a convergence caller needs (and the spec asserts).
    */
  def unigramEmConvergedWithStats(docs: DataFrame,
      pieces: Seq[(String, Long)], charCost: Long = 6145L,
      maxIters: Int = 8, runToFixpoint: Boolean = true,
      textCol: String = "text"): (DataFrame, Int, Boolean) = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    val spark = docs.sparkSession
    import spark.implicits._
    var cur = pieces.sortBy(_._1)
    var lastRows: Seq[(String, Long, Long)] = Seq.empty
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      lastRows = unigramEmStep(docs, cur, charCost, textCol)
        .select(col("piece"), col("n_uses"), col("cost"))
        .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
      val next = lastRows.map(r => (r._1, r._3))
      if (runToFixpoint && next == cur) converged = true
      cur = next
      it += 1
    }
    (lastRows.toDF("piece", "n_uses", "cost"), it, converged)
  }
}

/** Prebuilt rank lookup for a merge table: pair → index in learned order.
  * Built once per task (ships as a codegen reference object) so the per-word
  * segmenter does O(1) rank probes instead of re-deriving anything. The map
  * is transient-lazy: only the rule Seq serializes with the plan.
  */
final class BpeMergeTable(val merges: Seq[(String, String)]) extends Serializable {
  @transient private lazy val ranks: java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case (p, i) =>
      // first occurrence wins — matches sequential application order
      if (!m.containsKey(p)) m.put(p, i)
    }
    m
  }

  /** Merge rank of the pair, or Int.MaxValue when it is not a rule. */
  def rank(a: String, b: String): Int = {
    val r = ranks.get((a, b))
    if (r == null) Int.MaxValue else r.intValue()
  }
}

/** `BpeSegment(text, merges)` → array<string>: subword segmentation with a
  * learned merge table; see [[Tokenizer.bpeSegment]].
  */
case class BpeSegment(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    merges: Seq[(String, String)])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe segmentation requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val table = new BpeMergeTable(merges)

  override def nullSafeEval(input: Any): Any =
    Tokenizer.bpeSegment(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeMergeTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.operators.Tokenizer.bpeSegment($c, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): BpeSegment =
    copy(child = newChild)
}

/** `ByteBpeSegment(text, merges)` → array<string>: BYTE-LEVEL subword
  * segmentation with a learned merge table over the GPT-2 remapped byte
  * alphabet; see [[Tokenizer.byteBpeSegment]].
  */
case class ByteBpeSegment(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    merges: Seq[(String, String)])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"byte-level bpe segmentation requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val table = new BpeMergeTable(merges)

  override def nullSafeEval(input: Any): Any =
    Tokenizer.byteBpeSegment(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpeTable", table,
      classOf[BpeMergeTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.operators.Tokenizer.byteBpeSegment($c, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): ByteBpeSegment =
    copy(child = newChild)
}

/** Fixed unigram piece table for serving: piece → per-use cost, plus the
  * always-available single-code-point fallback cost (full coverage — any
  * character segments at `charCost` even when it is not an explicit
  * entry). Built once per task (ships as a codegen reference object);
  * the map is transient-lazy so only the piece Seq serializes with the
  * plan — the BpeMergeTable discipline.
  */
final class UnigramPieceTable(
    val pieces: Seq[(String, Long)], val charCost: Long) extends Serializable {
  require(charCost > 0, s"charCost must be positive, got $charCost")

  /** Longest explicit piece, in code points — bounds the DP fan-in. */
  @transient lazy val maxPieceLen: Int =
    pieces.foldLeft(1) { case (m, (p, _)) =>
      math.max(m, p.codePointCount(0, p.length)) }

  @transient private lazy val costs: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
    pieces.foreach { case (p, c) =>
      require(c > 0, s"piece cost must be positive: ($p, $c)")
      val prev = m.get(p)
      // duplicate entries keep the cheapest — deterministic
      if (prev == null || c < prev.longValue()) m.put(p, c)
    }
    m
  }

  /** Cost of using `piece`, or Long.MaxValue/4 when unavailable. A
    * single code point is always available at min(entry, charCost).
    */
  def cost(piece: String): Long = {
    val e = costs.get(piece)
    val explicit =
      if (e == null) Long.MaxValue / 4 else e.longValue()
    if (piece.codePointCount(0, piece.length) == 1) math.min(explicit, charCost)
    else explicit
  }
}

/** `UnigramSegment(text, pieces, charCost)` → array<string>: unigram-LM
  * Viterbi segmentation under a fixed piece table; see
  * [[Tokenizer.unigramSegment]].
  */
case class UnigramSegment(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    pieces: Seq[(String, Long)],
    charCost: Long)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram segmentation requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val table = new UnigramPieceTable(pieces, charCost)

  override def nullSafeEval(input: Any): Any =
    Tokenizer.unigramSegmentDoc(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramPieceTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.operators.Tokenizer.unigramSegmentDoc($c, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): UnigramSegment =
    copy(child = newChild)
}
