package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Imperative kernels behind the graft text expressions.
  *
  * The composable `transform(sequence(...), i => xxhash64(concat_ws(" ",
  * slice(toks, i, n))))` pipeline is correct but runs OUTSIDE whole-stage
  * codegen (higher-order functions are interpreted) and allocates a token
  * slice + joined string per shingle — measured 4-10 s per 5000-doc stage at
  * sf0.1, the single largest cost in the dedup family. These kernels do one
  * pass per document with no intermediate arrays; the expressions below call
  * them from generated code so the surrounding operators stay fused.
  *
  * Hashing is seeded xxHash64 over UTF-8 bytes (the same XXH64 primitive
  * Spark's `xxhash64` uses), so values are deterministic across runs,
  * partitions, and cluster layouts.
  */
object TextHashing {

  /** ASCII whitespace, exactly RE2's `\s` = [ \t\n\f\r] — the class the
    * DuckDB oracles tokenize on and the composable form
    * (`split(lower(text), "[ \t\n\f\r]+")`) shares. Java's `\s` ALSO
    * includes `\x0B` (vertical tab) and Character.isWhitespace is broader
    * still (unicode spaces); either would silently diverge from the oracle
    * on documents containing those characters.
    */
  @inline private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** 64-bit average hash (aHash) over the CODE POINTS of `text` — the
    * perceptual fingerprint for payloads whose sample stream is the
    * string itself (the GRFT synthetic media contract; on real images
    * the same grid runs over pixel lumas). Exact integer rule so the
    * oracle replays it: blockLen = max(n/64, 1), the first
    * min(n, 64·blockLen) code points partition into 64 blocks, bit_j =
    * 1 iff 64·blockSum_j > totalSum. Returns [hi, lo]: two longs each
    * carrying 32 bits (never bit 63 — both stay positive, so DuckDB's
    * BIGINT shift arithmetic reproduces them exactly).
    */
  def aHash64(text: UTF8String): ArrayData = {
    val str = text.toString
    val n = str.codePointCount(0, str.length)
    if (n == 0) return ArrayData.toArrayData(Array(0L, 0L))
    val blockLen = math.max(n / 64, 1)
    val used = math.min(n, 64 * blockLen)
    val sums = new Array[Long](64)
    var total = 0L
    var i = 0      // code-point index
    var ci = 0     // char (UTF-16 unit) index
    while (i < used) {
      val cp = str.codePointAt(ci)
      val j = i / blockLen
      sums(j) += cp
      total += cp
      ci += Character.charCount(cp)
      i += 1
    }
    var hi = 0L
    var lo = 0L
    var j = 0
    while (j < 64) {
      if (sums(j) * 64 > total) {
        if (j < 32) hi |= (1L << j) else lo |= (1L << (j - 32))
      }
      j += 1
    }
    ArrayData.toArrayData(Array(hi, lo))
  }

  /** Distinct xxhash64 values of the `n`-token shingles of `text`
    * (lowercased, whitespace-tokenized), SORTED ascending — sorted output
    * lets downstream set intersection run as an O(n+m) merge
    * ([[intersectSize]]) instead of a hash probe per element.
    * Single pass: token boundaries found by scanning, each shingle hashed
    * by walking its n tokens (single space separator between them, matching
    * `concat_ws(" ", ...)`), no slice/join allocations.
    */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    // token boundaries (start, end) pairs
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isSpace(s.charAt(i))) i += 1
      if (i < len) {
        starts.add(i)
        while (i < len && !isSpace(s.charAt(i))) i += 1
        ends.add(i)
      }
    }
    val nTok = starts.size()
    if (nTok < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](nTok - n + 1)
    val seen = new java.util.HashSet[java.lang.Long]()
    var k = 0
    val sb = new java.lang.StringBuilder()
    var w = 0
    while (w <= nTok - n) {
      sb.setLength(0)
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        sb.append(s, starts.get(w + t), ends.get(w + t))
        t += 1
      }
      val bytes = UTF8String.fromString(sb.toString).getBytes
      val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      if (seen.add(h)) { out(k) = h; k += 1 }
      w += 1
    }
    val trimmed = java.util.Arrays.copyOf(out, k)
    java.util.Arrays.sort(trimmed)
    new GenericArrayData(trimmed)
  }

  /** 64-bit SimHash of `text` (lowercased, whitespace-tokenized, every
    * token occurrence votes): bit b of the result is set when more token
    * hashes have bit b set than not. Token hashing is xxHash64 seed 42 —
    * bit-identical to the composable `xxhash64(token)` form, fused into one
    * pass with a 64-counter array instead of an explode + 64-column
    * aggregate + join-back (3 fewer stages, no shuffle).
    */
  def simhash(text: UTF8String): Long = {
    val s = text.toLowerCase.toString
    val counters = new Array[Int](64)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isSpace(s.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isSpace(s.charAt(i))) i += 1
        val bytes = UTF8String.fromString(s.substring(start, i)).getBytes
        val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** PORTABLE 64-bit SimHash over DISTINCT tokens with md5-derived bit
    * votes — the oracle-recomputable twin of [[simhash]]. Where [[simhash]]
    * uses xxHash64 (which DuckDB cannot evaluate), this variant derives
    * each token's 64 bits from its md5 HEX STRING, a primitive both
    * engines share: bit b of the token hash is bit (b mod 4) of the value
    * of hex character b/4 (0-based) of md5(token). The d4p oracle rebuilds
    * the identical signature in SQL (strpos over '0123456789abcdef' +
    * shifts) and recomputes the full hamming-<=3 pair set, which the
    * 16-bit-band blocking is guaranteed to equal by pigeonhole — a
    * hash-equality gate on the whole banding/verification machinery.
    * Tokens are DISTINCT (not per-occurrence votes) so the SQL twin is a
    * plain list_distinct, and zero-token documents yield signature 0 —
    * callers exclude them (the oracle has no row to exclude).
    */
  def simhashMd5(text: UTF8String): Long = {
    val s = text.toLowerCase.toString
    val seen = new java.util.HashSet[String]()
    val counters = new Array[Int](64)
    val md = md5Digest.get()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isSpace(s.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isSpace(s.charAt(i))) i += 1
        val tok = s.substring(start, i)
        if (seen.add(tok)) {
          md.reset()
          val digest = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var b = 0
          while (b < 64) {
            val nib = b >> 2 // hex-char index: byte nib/2, high nibble when even
            val byteV = digest(nib >> 1) & 0xFF
            val v = if ((nib & 1) == 0) (byteV >> 4) & 0xF else byteV & 0xF
            if (((v >> (b & 3)) & 1) == 1) counters(b) += 1 else counters(b) -= 1
            b += 1
          }
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** |A ∩ B| for two ascending-sorted long arrays: one merge walk, no
    * allocation. Replaces `size(array_intersect(...))`, which builds a hash
    * set and an output array per pair — at millions of candidate pairs the
    * interpreted version dominated the dedup profile.
    */
  def intersectSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  private val stopwords: java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for").foreach(s.add)
    s
  }

  /** (language code, marker set) in code order — ties in marker count
    * resolve to the first (alphabetically smallest) entry.
    */
  private val langMarkers: Array[(String, java.util.Set[String])] =
    Array(
      "de" -> Seq("der", "die", "das", "und", "ist"),
      "en" -> Seq("the", "a", "of", "and", "is"),
      "es" -> Seq("el", "los", "las", "es", "y"),
      "fr" -> Seq("le", "la", "les", "et", "est"),
      "zh" -> Seq("的", "是", "了", "在", "我"))
      .map { case (l, ws) =>
        val s = new java.util.HashSet[String]()
        ws.foreach(s.add)
        (l, s: java.util.Set[String])
      }

  /** Spark `round(x, 6)`: HALF_UP over the double's shortest decimal form. */
  @inline private def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** All per-document text statistics in ONE pass, replicating the
    * composable forms bit-for-bit (they are oracle-verified against DuckDB):
    * token/char counts and mean token length (t1), stopword/punctuation
    * ratios and the composite quality score (t2), marker-based language id
    * (t3). The composable pipeline re-tokenizes per metric through
    * interpreted higher-order functions — measured ~1.5 s per query at
    * sf0.1; this kernel is one tokenization and one char scan per document.
    *
    * Row layout: (n_tokens, n_unique, n_chars, mean_tok_len, stop_ratio,
    * punct_ratio, quality, lang).
    */
  def textStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val original = text.toString
    val s = text.toLowerCase.toString
    val len = s.length
    // one token scan over the lowercased text
    var nTok = 0
    var sumTokLen = 0L
    var nStop = 0
    val uniq = new java.util.HashSet[String]()
    val langScores = new Array[Int](langMarkers.length)
    var i = 0
    while (i < len) {
      while (i < len && isSpace(s.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isSpace(s.charAt(i))) i += 1
        val tok = s.substring(start, i)
        nTok += 1
        sumTokLen += tok.codePointCount(0, tok.length)
        uniq.add(tok)
        if (stopwords.contains(tok)) nStop += 1
        var l = 0
        while (l < langMarkers.length) {
          if (langMarkers(l)._2.contains(tok)) langScores(l) += 1
          l += 1
        }
      }
    }
    // one code-point scan over the ORIGINAL text for the punctuation ratio
    // (the composable form runs regexp_replace(text, "[^a-zA-Z0-9\\s]", "")
    // on the un-lowercased text)
    var nChars = 0
    var nPunct = 0
    var j = 0
    val olen = original.length
    while (j < olen) {
      val cp = original.codePointAt(j)
      nChars += 1
      val keep = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
        (cp >= '0' && cp <= '9') || (cp < 128 && isSpace(cp.toChar))
      if (!keep) nPunct += 1
      j += Character.charCount(cp)
    }

    val nTokD = nTok.toDouble
    val meanTokLen = if (nTok == 0) 0.0 else round6(sumTokLen.toDouble / nTokD)
    val stopRatio = if (nTok == 0) 0.0 else round6(nStop.toDouble / nTokD)
    val punctRatio = if (nChars == 0) 0.0 else round6(nPunct.toDouble / nChars.toDouble)
    val lenOk = if (nTokD >= 10 && nTokD <= 1000) 0.25 else 0.0
    val stopOk = if (stopRatio > 0.01) 0.25 else 0.0
    val punctOk = if (punctRatio < 0.2) 0.25 else 0.0
    val diversity =
      if (nTok == 0) 0.0
      else round6(math.min(uniq.size.toDouble / nTokD, 1.0) * 0.25)
    val quality = round6(lenOk + stopOk + punctOk + diversity)

    var bestScore = 0; var bestIdx = -1
    var l = 0
    while (l < langScores.length) {
      if (langScores(l) > bestScore) { bestScore = langScores(l); bestIdx = l }
      l += 1
    }
    val lang = if (bestIdx < 0) "und" else langMarkers(bestIdx)._1

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTok, uniq.size, nChars, meanTokLen, stopRatio, punctRatio,
        quality, UTF8String.fromString(lang)))
  }

  /** Whitespace-normalized lowercase text: tokens joined with single
    * spaces — the string `concat_ws(" ", tokens(text))` builds through
    * three interpreted array ops; used for whole-document fingerprints.
    */
  def normText(text: UTF8String): UTF8String = {
    val s = text.toLowerCase.toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val len = s.length
    var first = true
    while (i < len) {
      while (i < len && isSpace(s.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isSpace(s.charAt(i))) i += 1
        if (!first) sb.append(' ')
        sb.append(s, start, i)
        first = false
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** k-seed minhash over an array of element hashes: for seed i, the min of
    * xxHash64(h, seed=i) over the elements; Long.MaxValue on empty input.
    * 8-byte re-hashing only — the strings were hashed once upstream.
    */
  def minhash(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val h = XXH64.hashLong(hashes.getLong(j), i.toLong)
        if (h < m) m = h
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Gopher-style repetition signals in ONE pass: raw single-space tokens
    * (empties kept — `split(text, ' ')` / DuckDB `string_split` semantics,
    * NOT the whitespace-collapsing [[textStats]] tokenizer), token and
    * adjacent-bigram multiplicity maxima via open hashing, duplicate-bigram
    * count as (bigrams − distinct). Fractions are a SINGLE division of
    * exact integer counts — bit-identical to the DuckDB oracle's
    * unnest→GROUP BY recompute. Bigram fractions are NULL for documents
    * with fewer than two tokens (the oracle's LEFT JOIN shape).
    *
    * The composable array form (split → array_sort → aggregate fold) is
    * spec-pinned to agree ([[TextFunctions.maxRunLength]]); it runs
    * interpreted (higher-order functions) and re-tokenizes per signal —
    * measured ~2.5 s per 5000-doc pass at sf0.1 vs one scan here.
    *
    * Row layout: (n_tokens, top_token_frac, dup_bigram_frac,
    * top_bigram_frac).
    */
  def repetitionStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val counts = new java.util.HashMap[String, Integer](n * 2)
    var top = 0
    var i = 0
    while (i < n) {
      val c = counts.merge(toks(i), 1, (a: Integer, b: Integer) => a + b)
      if (c > top) top = c
      i += 1
    }
    val nb = n - 1
    val out = new Array[Any](4)
    out(0) = n.toLong
    out(1) = top.toDouble / n
    if (nb > 0) {
      val bcounts = new java.util.HashMap[String, Integer](nb * 2)
      var btop = 0
      i = 0
      while (i < nb) {
        val c = bcounts.merge(toks(i) + " " + toks(i + 1), 1,
          (a: Integer, b: Integer) => a + b)
        if (c > btop) btop = c
        i += 1
      }
      out(2) = (nb - bcounts.size).toDouble / nb
      out(3) = btop.toDouble / nb
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }
}

/** `graft_shingle_hashes(text, n)` → array<bigint>: distinct hashed
  * n-token shingles; see [[TextHashing.shingleHashes]].
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes requires (string, positive int literal), got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextHashing.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashing.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `graft_minhash(hashes, k)` → array<bigint> of k per-seed minima;
  * see [[TextHashing.minhash]].
  */
case class MinhashSignature(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires (array<bigint>, positive int literal), got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextHashing.minhash(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashing.minhash($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

/** `graft_ahash(text)` → array<bigint> [hi, lo] 64-bit average hash;
  * see [[TextHashing.aHash64]].
  */
case class AHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ahash requires string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextHashing.aHash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.aHash64($c)")

  override protected def withNewChildInternal(newChild: Expression): AHash64 =
    copy(child = newChild)
}

/** `graft_text_stats(text)` → struct of per-document statistics;
  * see [[TextHashing.textStats]].
  */
case class TextStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_text_stats requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = TextStats.schema

  override def nullSafeEval(input: Any): Any =
    TextHashing.textStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.textStats($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_unique", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("mean_tok_len", DoubleType, nullable = false),
    StructField("stop_ratio", DoubleType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false),
    StructField("lang", StringType, nullable = false)))
}

/** `graft_rep_stats(text)` → struct of repetition signals;
  * see [[TextHashing.repetitionStats]].
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rep_stats requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = RepetitionStats.schema

  override def nullSafeEval(input: Any): Any =
    TextHashing.repetitionStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.repetitionStats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("top_token_frac", DoubleType, nullable = false),
    StructField("dup_bigram_frac", DoubleType, nullable = true),
    StructField("top_bigram_frac", DoubleType, nullable = true)))
}

/** `graft_norm_text(text)` → string: lowercased, whitespace-normalized
  * text; see [[TextHashing.normText]].
  */
case class NormText(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_norm_text requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextHashing.normText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.normText($c)")

  override protected def withNewChildInternal(newChild: Expression): NormText =
    copy(child = newChild)
}

/** `graft_simhash(text)` → bigint: fused 64-bit SimHash;
  * see [[TextHashing.simhash]].
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextHashing.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `graft_simhash_md5(text)` → bigint: portable (DuckDB-recomputable)
  * SimHash over distinct tokens; see [[TextHashing.simhashMd5]].
  */
case class SimHashMd5(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_md5 requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextHashing.simhashMd5(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.simhashMd5($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)
}

/** `graft_intersect_size(a, b)` → int: sorted-merge set intersection size;
  * see [[TextHashing.intersectSize]]. Both inputs must be ascending-sorted
  * array<bigint> (as produced by [[ShingleHashes]]).
  */
case class IntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  private def ok(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_intersect_size requires array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashing.intersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHashing.intersectSize($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectSize =
    copy(left = l, right = r)
}

/** Registers the text expressions as SQL-callable functions. The int
  * parameter must be a foldable literal (it shapes the output, like a
  * window size).
  */
object TextExprFunctions {
  private[functions] def intArg(e: Expression, fn: String): Int = e match {
    case lit if lit.foldable =>
      lit.eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"$fn: expected integer literal, got $other")
      }
    case _ => throw new IllegalArgumentException(s"$fn: size argument must be a literal")
  }

  private[functions] def doubleArg(e: Expression, fn: String): Double = e match {
    case lit if lit.foldable =>
      lit.eval(null) match {
        case d: Double => d
        case f: Float => f.toDouble
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case i: Int => i.toDouble
        case l: Long => l.toDouble
        case other => throw new IllegalArgumentException(
          s"$fn: expected numeric literal, got $other")
      }
    case _ => throw new IllegalArgumentException(s"$fn: argument must be a literal")
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_shingle_hashes",
      exprs => ShingleHashes(exprs(0), intArg(exprs(1), "graft_shingle_hashes")), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash",
      exprs => MinhashSignature(exprs(0), intArg(exprs(1), "graft_minhash")), "built-in")
    reg.createOrReplaceTempFunction("graft_intersect_size",
      exprs => IntersectSize(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash",
      exprs => SimHash64(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash_md5",
      exprs => SimHashMd5(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_text_stats",
      exprs => TextStats(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_rep_stats",
      exprs => RepetitionStats(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_norm_text",
      exprs => NormText(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_ahash",
      exprs => AHash64(exprs(0)), "built-in")
  }
}
