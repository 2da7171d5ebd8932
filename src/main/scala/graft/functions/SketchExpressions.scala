package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Bounded buffer of the k smallest DISTINCT hash values, kept in
  * sign-flipped form so signed ordering equals unsigned hash ordering.
  * This is the whole sketch state: ~8k bytes regardless of input size.
  */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()

  def add(flipped: Long): Unit = {
    if (set.size < k) set.add(flipped)
    else if (flipped < set.last) {
      if (set.add(flipped)) set.pollLast()
    }
  }

  def merge(other: KmvBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) add(it.next())
  }

  /** True distinct count while < k values were kept (nothing was ever
    * evicted ⇒ the set IS the distinct hash set); the (k−1)/U(k)
    * KMV estimator beyond that.
    */
  def estimate: Long =
    if (set.size < k) set.size.toLong
    else {
      // values are stored sign-flipped: unflipped unsigned position is
      // flipped + 2^63, as a fraction of the 2^64 hash space
      val kthFraction =
        (set.last.toDouble + 9.223372036854776E18) / 1.8446744073709552E19
      math.round((k - 1).toDouble / kthFraction)
    }
}

/** `graft_kmv_distinct(col, k)` → bigint: KMV (k-minimum-values) distinct
  * count sketch [Bar-Yossef et al., RANDOM'02]. Hash every value once
  * (xxHash64), keep the k smallest distinct hashes; the k-th smallest
  * order statistic estimates the distinct count with ~1/√k relative
  * error. The buffer is a fixed ~8k-byte set with an associative merge —
  * the shape that aggregates 100 TB with map-side partial state and one
  * tiny shuffle row per partition, where exact count(DISTINCT) shuffles
  * every distinct value. Deterministic: the same inputs give the same
  * estimate under ANY partitioning (hashes are fixed-seed, the merge is
  * order-insensitive) — spec-pinned, since the correctness gate hashes
  * results.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k >= 2) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_kmv_distinct needs k >= 2, got $k")

  override def children: Seq[Expression] = child :: Nil

  override def dataType: DataType = LongType

  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    // evaluate the child ONCE and hash the value directly — the same
    // per-value primitive the XxHash64 expression applies, without a
    // second child evaluation for the null check
    val v = child.eval(input)
    if (v != null) {
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(v, child.dataType, 42L)
      buf.add(h ^ Long.MinValue)
    }
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: KmvBuffer): Any = buf.estimate

  override def serialize(buf: KmvBuffer): Array[Byte] = KmvCodec.write(buf)

  override def deserialize(bytes: Array[Byte]): KmvBuffer = KmvCodec.read(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): KmvDistinct =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_kmv_distinct"
}

/** Byte image of a [[KmvBuffer]] — the aggregate's shuffle format AND the
  * persistable state column emitted by `graft_kmv_state` (see the
  * state/merge pair below).
  */
object KmvCodec {
  def write(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.set.size * 8)
    bb.putInt(buf.k).putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  def read(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.set.add(bb.getLong); i += 1 }
    buf
  }
}

/** Bounded buffer of the k best (key, id) pairs under the TOTAL order
  * (key desc, id asc), min-heap ordered so the worst retained pair is
  * evictable in O(log k). The id tiebreak matters: extreme weights
  * saturate u^(1/w) keys to the same double (≈1.0 for huge w), and
  * without a total order the winner among equal keys would depend on
  * heap arrival order — i.e. on partitioning.
  */
final class ReservoirBuffer(val k: Int) {
  // (key, id) kept as their native types — routing the bigint id through a
  // Double would silently corrupt ids above 2^53
  final class Entry(val key: Double, val id: Long)

  // worst first: smaller key, then LARGER id
  val heap = new java.util.PriorityQueue[Entry](
    math.max(1, k),
    new java.util.Comparator[Entry] {
      override def compare(a: Entry, b: Entry): Int = {
        val c = java.lang.Double.compare(a.key, b.key)
        if (c != 0) c else java.lang.Long.compare(b.id, a.id)
      }
    })

  private def beatsWorst(key: Double, id: Long): Boolean = {
    val worst = heap.peek()
    key > worst.key || (key == worst.key && id < worst.id)
  }

  def add(key: Double, id: Long): Unit = {
    if (heap.size < k) heap.add(new Entry(key, id))
    else if (beatsWorst(key, id)) {
      heap.poll()
      heap.add(new Entry(key, id))
    }
  }

  def merge(other: ReservoirBuffer): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) { val e = it.next(); add(e.key, e.id) }
  }

  /** Selected ids in (key desc, id asc) order. */
  def result: Array[Long] = {
    val arr = heap.toArray(Array.empty[Entry])
    arr.sortBy(e => (-e.key, e.id)).map(_.id)
  }
}

/** `graft_weighted_sample(id, weight, k)` → array<bigint>: deterministic
  * weighted sampling without replacement (Efraimidis & Spirakis, A-Res,
  * IPL 2006): each item gets key u^(1/w) with u a hash-derived uniform in
  * (0,1); the k largest keys are the sample. Because u comes from
  * xxHash64(id) — not a RNG — the result is identical under ANY
  * partitioning and across runs: the data-mixing primitive (sample docs
  * proportional to quality/temperature) that normally needs a global sort,
  * done in one aggregate with a k-row buffer and an associative merge.
  */
case class WeightedSample(
    idExpr: Expression,
    weightExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ReservoirBuffer] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1) TypeCheckResult.TypeCheckFailure(s"k must be >= 1, got $k")
    else if (idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"id must be bigint, got ${idExpr.dataType.simpleString}")
    else if (weightExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"weight must be double, got ${weightExpr.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = idExpr :: weightExpr :: Nil

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): ReservoirBuffer = new ReservoirBuffer(k)

  override def update(buf: ReservoirBuffer, input: InternalRow): ReservoirBuffer = {
    val idv = idExpr.eval(input)
    val wv = weightExpr.eval(input)
    if (idv != null && wv != null) {
      val w = wv.asInstanceOf[Double]
      if (w > 0 && !w.isNaN) {
        val id = idv.asInstanceOf[Long]
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(id, LongType, 42L)
        // unsigned hash → uniform in (0,1), never exactly 0 or 1
        val u = ((h ^ Long.MinValue).toDouble + 9.223372036854776E18 + 0.5) /
          1.8446744073709552E19
        buf.add(math.pow(u, 1.0 / w), id)
      }
    }
    buf
  }

  override def merge(buf: ReservoirBuffer, other: ReservoirBuffer): ReservoirBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: ReservoirBuffer): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.result)

  override def serialize(buf: ReservoirBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.heap.size * 16)
    bb.putInt(buf.k).putInt(buf.heap.size)
    val it = buf.heap.iterator()
    while (it.hasNext) { val e = it.next(); bb.putDouble(e.key).putLong(e.id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ReservoirBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new ReservoirBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.add(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): WeightedSample =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): WeightedSample =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WeightedSample =
    copy(idExpr = newChildren(0), weightExpr = newChildren(1))

  override def prettyName: String = "graft_weighted_sample"
}

/** Multi-level MRL-style quantile buffer [Manku, Rajagopalan, Lindsay,
  * SIGMOD'98]: level i holds values of weight 2^i; when a level overflows
  * `capacity` it is sorted and every second element (odd positions) is
  * promoted to the next level at doubled weight — a DETERMINISTIC collapse
  * (no coin flip), so the same inputs in the same merge order give the
  * same sketch. While total count ≤ capacity nothing ever compacts and the
  * buffer IS the value multiset — the exact regime the correctness gate
  * runs in (k1's KMV discipline); beyond it, rank error grows
  * ~ (n/capacity)·log(n/capacity) and the answer may depend on merge
  * order, the same contract as Spark's own approx_percentile.
  */
final class QuantileBuffer(val capacity: Int) {
  import scala.collection.mutable.ArrayBuffer
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(new ArrayBuffer[Double]())
  var count: Long = 0L

  def add(v: Double): Unit = { levels(0) += v; count += 1; compact(0) }

  private def compact(i: Int): Unit = {
    if (levels(i).length > capacity) {
      val sorted = levels(i).sorted
      if (i + 1 >= levels.length) levels += new ArrayBuffer[Double]()
      var j = 1
      while (j < sorted.length) { levels(i + 1) += sorted(j); j += 2 }
      levels(i).clear()
      compact(i + 1)
    }
  }

  def merge(other: QuantileBuffer): Unit = {
    var i = 0
    while (i < other.levels.length) {
      if (i >= levels.length) levels += new ArrayBuffer[Double]()
      levels(i) ++= other.levels(i)
      i += 1
    }
    count += other.count
    var j = 0
    while (j < levels.length) { compact(j); j += 1 }
  }

  /** percentile_disc semantics: the smallest value whose cumulative weight
    * reaches q × total weight (≡ q × count in the exact regime, where
    * every weight is 1 — matching DuckDB's quantile_disc bit-for-bit).
    */
  def quantile(q: Double): Any = {
    if (count == 0L) return null
    val entries = new ArrayBuffer[(Double, Long)]()
    var total = 0L
    var i = 0
    while (i < levels.length) {
      val w = 1L << i
      levels(i).foreach { v => entries += ((v, w)); total += w }
      i += 1
    }
    val sorted = entries.sortBy(_._1)
    val target = q * total
    var cum = 0L
    var k = 0
    while (k < sorted.length) {
      cum += sorted(k)._2
      if (cum >= target) return sorted(k)._1
      k += 1
    }
    sorted(sorted.length - 1)._1
  }
}

/** Byte image of a [[QuantileBuffer]] — shuffle format and persistable
  * state (`graft_quantile_state`).
  */
object QuantileCodec {
  def write(buf: QuantileBuffer): Array[Byte] = {
    val n = buf.levels.map(_.length).sum
    val bb = ByteBuffer.allocate(4 + 8 + 4 + buf.levels.length * 4 + n * 8)
    bb.putInt(buf.capacity).putLong(buf.count).putInt(buf.levels.length)
    buf.levels.foreach { lvl =>
      bb.putInt(lvl.length)
      lvl.foreach(bb.putDouble)
    }
    bb.array()
  }

  def read(bytes: Array[Byte]): QuantileBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new QuantileBuffer(bb.getInt)
    buf.count = bb.getLong
    val nLevels = bb.getInt
    var i = 0
    while (i < nLevels) {
      if (i >= buf.levels.length)
        buf.levels += new scala.collection.mutable.ArrayBuffer[Double]()
      val len = bb.getInt
      var j = 0
      while (j < len) { buf.levels(i) += bb.getDouble; j += 1 }
      i += 1
    }
    buf
  }
}

/** `graft_quantile_sketch(x, q, capacity)` → double: mergeable quantile
  * aggregate over a bounded [[QuantileBuffer]]. The 100 TB replacement for
  * exact `percentile_disc`, which must SORT every group: this keeps
  * O(capacity · log(n/capacity)) values per group with map-side partials
  * and an associative merge, so per-group state is bounded at any corpus
  * size. Exact (and gate-checkable against DuckDB `quantile_disc`) while
  * group size ≤ capacity; bounded rank error beyond.
  */
case class QuantileSketch(
    child: Expression,
    q: Double,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileBuffer] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"graft_quantile_sketch needs a numeric input, got ${child.dataType.simpleString}")
    else if (q < 0.0 || q > 1.0)
      TypeCheckResult.TypeCheckFailure(s"quantile must be in [0, 1], got $q")
    else if (capacity < 8)
      TypeCheckResult.TypeCheckFailure(s"capacity must be >= 8, got $capacity")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = child :: Nil

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def createAggregationBuffer(): QuantileBuffer = new QuantileBuffer(capacity)

  override def update(buf: QuantileBuffer, input: InternalRow): QuantileBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case n: java.lang.Number => n.doubleValue()
      case other => other.toString.toDouble
    })
    buf
  }

  override def merge(buf: QuantileBuffer, other: QuantileBuffer): QuantileBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: QuantileBuffer): Any = buf.quantile(q)

  override def serialize(buf: QuantileBuffer): Array[Byte] = QuantileCodec.write(buf)

  override def deserialize(bytes: Array[Byte]): QuantileBuffer = QuantileCodec.read(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): QuantileSketch =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketch =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_quantile_sketch"
}

/** SpaceSaving heavy-hitters state [Metwally, Agrawal, El Abbadi,
  * ICDT'05]: at most `capacity` (token → count, err) entries. A new token
  * arriving at a full buffer evicts the minimum-count entry and inherits
  * its count as both base and error — the classic one-sided overestimate
  * (true ≤ est ≤ true + n/capacity). Merging sums counts of the union and
  * prunes back to capacity keeping the largest (mergeable-summaries
  * result: the ε-bound adds). While a group's DISTINCT tokens fit in
  * capacity nothing evicts, every err is 0, counts are exact under any
  * partitioning — the gate regime. All tie-breaks are lexicographic so
  * eviction and pruning are deterministic.
  */
final class HeavyHittersBuffer(val capacity: Int) {
  // token -> [count, err]
  val counts = new java.util.HashMap[String, Array[Long]]()

  def add(tok: String, inc: Long, err: Long): Unit = {
    val cur = counts.get(tok)
    if (cur != null) { cur(0) += inc; cur(1) += err }
    else if (counts.size < capacity) counts.put(tok, Array(inc, err))
    else {
      // evict the (count asc, token DESC) minimum — deterministic
      var minTok: String = null
      var minCnt = Long.MaxValue
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue()(0)
        if (minTok == null || c < minCnt ||
            (c == minCnt && e.getKey.compareTo(minTok) > 0)) {
          minCnt = c; minTok = e.getKey
        }
      }
      counts.remove(minTok)
      counts.put(tok, Array(minCnt + inc, minCnt + err))
    }
  }

  def merge(other: HeavyHittersBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      if (cur != null) { cur(0) += e.getValue()(0); cur(1) += e.getValue()(1) }
      else counts.put(e.getKey, Array(e.getValue()(0), e.getValue()(1)))
    }
    if (counts.size > capacity) {
      // prune to the `capacity` largest (count desc, token asc)
      val keep = top(capacity)
      val keepSet = new java.util.HashSet[String]()
      keep.foreach(t => keepSet.add(t._1))
      val rm = counts.keySet().iterator()
      while (rm.hasNext) { if (!keepSet.contains(rm.next())) rm.remove() }
    }
  }

  /** The k largest entries as (token, count), ordered (count desc,
    * token asc).
    */
  def top(k: Int): Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue()(0)); i += 1 }
    arr.sortBy(t => (-t._2, t._1)).take(k)
  }
}

/** Byte image of a [[HeavyHittersBuffer]] — shuffle format and persistable
  * state (`graft_hh_state`).
  */
object HhCodec {
  def write(buf: HeavyHittersBuffer): Array[Byte] = {
    var bytes = 8
    val it0 = buf.counts.entrySet().iterator()
    val entries = new scala.collection.mutable.ArrayBuffer[(Array[Byte], Long, Long)]()
    while (it0.hasNext) {
      val e = it0.next()
      val tb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      entries += ((tb, e.getValue()(0), e.getValue()(1)))
      bytes += 4 + tb.length + 16
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.capacity).putInt(entries.length)
    entries.foreach { case (tb, c, er) =>
      bb.putInt(tb.length); bb.put(tb); bb.putLong(c); bb.putLong(er)
    }
    bb.array()
  }

  def read(bytes: Array[Byte]): HeavyHittersBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new HeavyHittersBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val tb = new Array[Byte](bb.getInt)
      bb.get(tb)
      buf.counts.put(
        new String(tb, java.nio.charset.StandardCharsets.UTF_8),
        Array(bb.getLong, bb.getLong))
      i += 1
    }
    buf
  }
}

/** `graft_heavy_hitters(tok, k, capacity)` → array<struct<token, cnt>>:
  * top-k frequent values through a bounded SpaceSaving buffer. The scale
  * path for per-group vocabulary stats: the exact form (t8) must shuffle
  * every distinct (group, token) count; this keeps O(capacity) state per
  * group with map-side partials, so only small buffers cross the wire no
  * matter how large the vocabulary grows. Exact — and oracle-checked —
  * while distinct tokens per group ≤ capacity.
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHittersBuffer] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_heavy_hitters needs a string input, got ${child.dataType.simpleString}")
    else if (k < 1 || capacity < k)
      TypeCheckResult.TypeCheckFailure(
        s"need 1 <= k <= capacity, got k=$k capacity=$capacity")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = child :: Nil

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): HeavyHittersBuffer =
    new HeavyHittersBuffer(capacity)

  override def update(buf: HeavyHittersBuffer, input: InternalRow): HeavyHittersBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString, 1L, 0L)
    buf
  }

  override def merge(buf: HeavyHittersBuffer, other: HeavyHittersBuffer): HeavyHittersBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: HeavyHittersBuffer): Any = {
    val rows: Array[Any] = buf.top(k).map { case (tok, cnt) =>
      InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(tok), cnt)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override def serialize(buf: HeavyHittersBuffer): Array[Byte] = HhCodec.write(buf)

  override def deserialize(bytes: Array[Byte]): HeavyHittersBuffer = HhCodec.read(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): HeavyHitters =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_heavy_hitters"
}

/** Serializable carrier for a prebuilt Bloom filter: only the byte image
  * rides with the plan (Spark's `BloomFilterImpl` serializes via its own
  * `writeTo` format, which is stable across JVMs); the probe object is
  * rebuilt lazily once per executor JVM, the [[graft.operators.BpeMergeTable]]
  * discipline.
  */
final class SerializableBloom(val bytes: Array[Byte]) extends Serializable {
  @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  def mightContain(v: Long): Boolean = bloom.mightContainLong(v)
}

object SerializableBloom {
  def from(bloom: org.apache.spark.util.sketch.BloomFilter): SerializableBloom = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    new SerializableBloom(out.toByteArray)
  }
}

/** `BloomContains(hash)` → boolean: membership probe of a prebuilt Bloom
  * filter over 64-bit hashes. One-sided by construction — false positives
  * only — so it is a PREFILTER: callers must re-verify survivors against
  * the exact set. Codegen'd; the filter ships once per plan, not per row.
  */
case class BloomContains(
    child: Expression,
    bloom: SerializableBloom)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom probe requires a bigint hash input, got ${child.dataType.simpleString}")

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any =
    bloom.mightContain(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[SerializableBloom].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_contains"
}

/** Sketch-STATE persistence — the "sketch cube" pattern.
  *
  * `graft_*_state(x, capacity)` aggregates a group into the sketch's raw
  * byte image; `graft_*_merge(state, ...)` aggregates stored states back
  * into a combined answer. Compute states once per shard/day/partition and
  * persist them as a tiny binary column: any later rollup (a month, one
  * language, everything) is a merge over the state TABLE — the corpus is
  * never rescanned. This is the production shape for recurring corpus
  * stats at 100 TB: the daily pass is map-combinable and bounded, and
  * every downstream report is O(states), not O(rows). In each sketch's
  * exact regime the merged answer equals the direct aggregate exactly
  * (spec- and gate-pinned); beyond it, the sketch's usual error contract
  * applies.
  */
case class KmvState(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k >= 2) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_kmv_state needs k >= 2, got $k")

  override def children: Seq[Expression] = child :: Nil
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(v, child.dataType, 42L)
      buf.add(h ^ Long.MinValue)
    }
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = { buf.merge(other); buf }
  override def eval(buf: KmvBuffer): Any = KmvCodec.write(buf)
  override def serialize(buf: KmvBuffer): Array[Byte] = KmvCodec.write(buf)
  override def deserialize(bytes: Array[Byte]): KmvBuffer = KmvCodec.read(bytes)
  override def withNewMutableAggBufferOffset(offset: Int): KmvState =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvState =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvState = copy(child = newChildren.head)
  override def prettyName: String = "graft_kmv_state"
}

/** `graft_kmv_merge(state, k)` → bigint: distinct estimate over stored
  * KMV states. Merge is order-insensitive, so any grouping of states
  * gives the same answer.
  */
case class KmvMerge(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_merge needs a binary state input, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = child :: Nil
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.merge(KmvCodec.read(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = { buf.merge(other); buf }
  override def eval(buf: KmvBuffer): Any = buf.estimate
  override def serialize(buf: KmvBuffer): Array[Byte] = KmvCodec.write(buf)
  override def deserialize(bytes: Array[Byte]): KmvBuffer = KmvCodec.read(bytes)
  override def withNewMutableAggBufferOffset(offset: Int): KmvMerge =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvMerge =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMerge = copy(child = newChildren.head)
  override def prettyName: String = "graft_kmv_merge"
}

/** KMV set algebra over two stored states [Beyer et al., SIGMOD'07]:
  * `graft_kmv_union(a, b)` / `graft_kmv_intersect(a, b)` → bigint.
  *
  * The k smallest hashes of A and of B determine the k smallest hashes of
  * A∪B (merge) and a uniform sample of it, so BOTH estimates come from the
  * two ~8 KB states alone — no revisit of either input set. Union is the
  * standard KMV estimate on the merged state. Intersection counts the
  * common hashes below the merged state's k-th order statistic τ (each
  * hash < τ is a uniform coin flip for membership in A∩B):
  * ρ = |A∩B ∩ [0,τ)| / k, est = round(ρ · est(A∪B)).
  *
  * Exact regime (the gate discipline): while the merged state holds fewer
  * than k hashes nothing was ever evicted from either side, so the sets
  * ARE the distinct hash sets and both results are exact counts — the k5
  * gate pins this against DuckDB's exact set SQL. Deterministic at any
  * size: fixed-seed hashes, order-insensitive merge.
  *
  * Evaluated once per GROUP (states are aggregate outputs), never per
  * input row, so interpreted eval is off every hot path.
  */
case class KmvSetEstimate(
    left: Expression,
    right: Expression,
    intersect: Boolean)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private def name: String =
    if (intersect) "graft_kmv_intersect" else "graft_kmv_union"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name needs two binary KMV states, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val bufA = KmvCodec.read(a.asInstanceOf[Array[Byte]])
    val bufB = KmvCodec.read(b.asInstanceOf[Array[Byte]])
    require(bufA.k == bufB.k,
      s"$name: states have different capacities (${bufA.k} vs ${bufB.k})")
    val merged = new KmvBuffer(bufA.k)
    merged.merge(bufA)
    merged.merge(bufB)
    val unionEst = merged.estimate
    if (!intersect) unionEst
    else if (merged.set.size < merged.k) {
      // exact regime: no eviction anywhere ⇒ sets are complete
      var n = 0L
      val it = bufA.set.iterator()
      while (it.hasNext) if (bufB.set.contains(it.next())) n += 1
      n
    } else {
      // τ-threshold sample: common hashes strictly below the merged k-th
      val tau = merged.set.last
      var n = 0
      val it = bufA.set.iterator()
      var h = 0L
      var continue = true
      while (continue && it.hasNext) {
        h = it.next()
        if (h >= tau) continue = false
        else if (bufB.set.contains(h)) n += 1
      }
      math.round(n.toDouble / merged.k * unionEst)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvSetEstimate =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = name
}

/** `graft_quantile_state(x, capacity)` → binary (see the sketch-cube note
  * on [[KmvState]]).
  */
case class QuantileState(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileBuffer] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"graft_quantile_state needs a numeric input, got ${child.dataType.simpleString}")
    else if (capacity < 8)
      TypeCheckResult.TypeCheckFailure(s"capacity must be >= 8, got $capacity")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = child :: Nil
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): QuantileBuffer = new QuantileBuffer(capacity)

  override def update(buf: QuantileBuffer, input: InternalRow): QuantileBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case n: java.lang.Number => n.doubleValue()
      case other => other.toString.toDouble
    })
    buf
  }

  override def merge(buf: QuantileBuffer, other: QuantileBuffer): QuantileBuffer = {
    buf.merge(other); buf
  }
  override def eval(buf: QuantileBuffer): Any = QuantileCodec.write(buf)
  override def serialize(buf: QuantileBuffer): Array[Byte] = QuantileCodec.write(buf)
  override def deserialize(bytes: Array[Byte]): QuantileBuffer = QuantileCodec.read(bytes)
  override def withNewMutableAggBufferOffset(offset: Int): QuantileState =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantileState =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileState = copy(child = newChildren.head)
  override def prettyName: String = "graft_quantile_state"
}

/** `graft_quantile_merge(state, q, capacity)` → double: quantile over
  * stored quantile-sketch states.
  */
case class QuantileMerge(
    child: Expression,
    q: Double,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileBuffer] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_quantile_merge needs a binary state input, got ${child.dataType.simpleString}")
    else if (q < 0.0 || q > 1.0)
      TypeCheckResult.TypeCheckFailure(s"quantile must be in [0, 1], got $q")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = child :: Nil
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def createAggregationBuffer(): QuantileBuffer = new QuantileBuffer(capacity)

  override def update(buf: QuantileBuffer, input: InternalRow): QuantileBuffer = {
    val v = child.eval(input)
    if (v != null) buf.merge(QuantileCodec.read(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: QuantileBuffer, other: QuantileBuffer): QuantileBuffer = {
    buf.merge(other); buf
  }
  override def eval(buf: QuantileBuffer): Any = buf.quantile(q)
  override def serialize(buf: QuantileBuffer): Array[Byte] = QuantileCodec.write(buf)
  override def deserialize(bytes: Array[Byte]): QuantileBuffer = QuantileCodec.read(bytes)
  override def withNewMutableAggBufferOffset(offset: Int): QuantileMerge =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantileMerge =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileMerge = copy(child = newChildren.head)
  override def prettyName: String = "graft_quantile_merge"
}

/** `graft_hh_state(tok, capacity)` → binary (see the sketch-cube note on
  * [[KmvState]]).
  */
case class HeavyHittersState(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHittersBuffer] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_hh_state needs a string input, got ${child.dataType.simpleString}")
    else if (capacity < 1)
      TypeCheckResult.TypeCheckFailure(s"capacity must be >= 1, got $capacity")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = child :: Nil
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): HeavyHittersBuffer =
    new HeavyHittersBuffer(capacity)

  override def update(buf: HeavyHittersBuffer, input: InternalRow): HeavyHittersBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString, 1L, 0L)
    buf
  }

  override def merge(buf: HeavyHittersBuffer, other: HeavyHittersBuffer): HeavyHittersBuffer = {
    buf.merge(other); buf
  }
  override def eval(buf: HeavyHittersBuffer): Any = HhCodec.write(buf)
  override def serialize(buf: HeavyHittersBuffer): Array[Byte] = HhCodec.write(buf)
  override def deserialize(bytes: Array[Byte]): HeavyHittersBuffer = HhCodec.read(bytes)
  override def withNewMutableAggBufferOffset(offset: Int): HeavyHittersState =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHittersState =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersState = copy(child = newChildren.head)
  override def prettyName: String = "graft_hh_state"
}

/** `graft_hh_merge(state, k, capacity)` → array<struct<token, cnt>>:
  * top-k over stored SpaceSaving states.
  */
case class HeavyHittersMerge(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHittersBuffer] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_hh_merge needs a binary state input, got ${child.dataType.simpleString}")
    else if (k < 1 || capacity < k)
      TypeCheckResult.TypeCheckFailure(
        s"need 1 <= k <= capacity, got k=$k capacity=$capacity")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = child :: Nil

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def createAggregationBuffer(): HeavyHittersBuffer =
    new HeavyHittersBuffer(capacity)

  override def update(buf: HeavyHittersBuffer, input: InternalRow): HeavyHittersBuffer = {
    val v = child.eval(input)
    if (v != null) buf.merge(HhCodec.read(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: HeavyHittersBuffer, other: HeavyHittersBuffer): HeavyHittersBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: HeavyHittersBuffer): Any = {
    val rows: Array[Any] = buf.top(k).map { case (tok, cnt) =>
      InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(tok), cnt)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override def serialize(buf: HeavyHittersBuffer): Array[Byte] = HhCodec.write(buf)
  override def deserialize(bytes: Array[Byte]): HeavyHittersBuffer = HhCodec.read(bytes)
  override def withNewMutableAggBufferOffset(offset: Int): HeavyHittersMerge =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHittersMerge =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersMerge = copy(child = newChildren.head)
  override def prettyName: String = "graft_hh_merge"
}

/** Count-Min sketch [Cormode & Muthukrishnan, J.Alg 2005]: a depth×width
  * integer counter grid; every key increments one counter per depth row
  * (an independent hash each), and a point query reads the MINIMUM of its
  * depth counters — an overestimate by at most the colliding mass, never
  * an underestimate. depth·width·8 bytes total, element-wise mergeable, so
  * per-shard states roll up like the other sketch cubes (k4 discipline).
  *
  * The hash is the first 8 md5 hex chars of `"<depth>:<key>"` mod width —
  * deliberately SQL-recomputable (the proven md5-bucket trick), so the k6
  * gate replays the ENTIRE sketch — collisions included — as exact
  * integer math in DuckDB and hash-compares estimates bit-for-bit. That
  * makes the gate exact at ANY width; collisions don't weaken it, they
  * exercise the min-over-depths path.
  */
object CmsHash {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Bucket of `key` in depth row `d`: first 8 lowercase-hex chars of
    * md5(s"$d:$key") parsed base-16, mod width. All values fit in a
    * non-negative int (< 2^32 / width bound after mod).
    */
  def bucket(d: Int, key: String, width: Int): Int = {
    val digest = md.get()
    digest.reset()
    val bytes = digest.digest(s"$d:$key".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 4 bytes == first 8 hex chars
    val v = ((bytes(0) & 0xFFL) << 24) | ((bytes(1) & 0xFFL) << 16) |
      ((bytes(2) & 0xFFL) << 8) | (bytes(3) & 0xFFL)
    (v % width).toInt
  }
}

final class CmsBuffer(val depth: Int, val width: Int) {
  val counters: Array[Long] = new Array[Long](depth * width)

  def add(key: String, inc: Long): Unit = {
    var d = 0
    while (d < depth) {
      counters(d * width + CmsHash.bucket(d, key, width)) += inc
      d += 1
    }
  }

  def merge(other: CmsBuffer): Unit = {
    require(other.depth == depth && other.width == width,
      s"CMS shape mismatch: ${depth}x$width vs ${other.depth}x${other.width}")
    var i = 0
    while (i < counters.length) { counters(i) += other.counters(i); i += 1 }
  }

  def estimate(key: String): Long = {
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = counters(d * width + CmsHash.bucket(d, key, width))
      if (c < best) best = c
      d += 1
    }
    best
  }

  /** Inner-product estimate [AMS-style]: min over depth rows of the
    * bucket-wise counter product — an upper bound on Σ_k f_A(k)·f_B(k),
    * the equi-join cardinality of the two sketched multisets.
    */
  def innerProduct(other: CmsBuffer): Long = {
    require(other.depth == depth && other.width == width,
      s"CMS shape mismatch: ${depth}x$width vs ${other.depth}x${other.width}")
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      var s = 0L
      var b = 0
      while (b < width) {
        s += counters(d * width + b) * other.counters(d * width + b)
        b += 1
      }
      if (s < best) best = s
      d += 1
    }
    best
  }
}

object CmsCodec {
  def write(buf: CmsBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buf.counters.length * 8)
    bb.putInt(buf.depth).putInt(buf.width)
    buf.counters.foreach(bb.putLong)
    bb.array()
  }

  def read(bytes: Array[Byte]): CmsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val depth = bb.getInt
    val width = bb.getInt
    val buf = new CmsBuffer(depth, width)
    var i = 0
    while (i < buf.counters.length) { buf.counters(i) = bb.getLong; i += 1 }
    buf
  }
}

/** `graft_cms_state(key, depth, width)` → binary: Count-Min counter grid
  * over the group's keys, one increment per row.
  */
case class CmsState(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_cms_state needs a string input, got ${child.dataType.simpleString}")
    else if (depth < 1 || width < 1)
      TypeCheckResult.TypeCheckFailure(
        s"need depth >= 1 and width >= 1, got depth=$depth width=$width")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = child :: Nil
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(depth, width)

  override def update(buf: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString, 1L)
    buf
  }

  override def merge(buf: CmsBuffer, other: CmsBuffer): CmsBuffer = { buf.merge(other); buf }
  override def eval(buf: CmsBuffer): Any = CmsCodec.write(buf)
  override def serialize(buf: CmsBuffer): Array[Byte] = CmsCodec.write(buf)
  override def deserialize(bytes: Array[Byte]): CmsBuffer = CmsCodec.read(bytes)
  override def withNewMutableAggBufferOffset(offset: Int): CmsState =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsState =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsState = copy(child = newChildren.head)
  override def prettyName: String = "graft_cms_state"
}

/** `graft_cms_merge(state, depth, width)` → binary: element-wise sum of
  * stored CMS states. Order-insensitive; the merged grid is bit-identical
  * to the grid a single pass over the union would build.
  */
case class CmsMerge(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_cms_merge needs a binary state input, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = child :: Nil
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(depth, width)

  override def update(buf: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) buf.merge(CmsCodec.read(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: CmsBuffer, other: CmsBuffer): CmsBuffer = { buf.merge(other); buf }
  override def eval(buf: CmsBuffer): Any = CmsCodec.write(buf)
  override def serialize(buf: CmsBuffer): Array[Byte] = CmsCodec.write(buf)
  override def deserialize(bytes: Array[Byte]): CmsBuffer = CmsCodec.read(bytes)
  override def withNewMutableAggBufferOffset(offset: Int): CmsMerge =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsMerge =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsMerge = copy(child = newChildren.head)
  override def prettyName: String = "graft_cms_merge"
}

/** `graft_cms_query(state, key)` → bigint: point-frequency estimate (min
  * over depth rows). Parses the state per call — the intended shape is a
  * tiny key set probed against a broadcast one-row state (or a stored
  * state table), never a per-corpus-row probe.
  */
case class CmsQuery(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cms_query needs (binary state, string key), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(state: Any, key: Any): Any =
    CmsCodec.read(state.asInstanceOf[Array[Byte]]).estimate(key.toString)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsQuery =
    copy(left = l, right = r)
}

/** `graft_cms_inner(state_a, state_b)` → bigint: equi-join cardinality
  * estimate from two CMS states alone (min over depths of the bucket-wise
  * counter dot product) — the AMS inner-product estimator. Never an
  * underestimate; the two inputs never meet. The shape a cost-based
  * planner wants at 100 TB: per-table states are tiny, persisted, and the
  * estimate is O(depth·width), independent of either table.
  */
case class CmsInner(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cms_inner needs two binary states, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    CmsCodec.read(a.asInstanceOf[Array[Byte]])
      .innerProduct(CmsCodec.read(b.asInstanceOf[Array[Byte]]))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsInner =
    copy(left = l, right = r)
}


/** HyperLogLog [Flajolet et al., AofA'07] with deliberately
  * SQL-recomputable hashing (the CmsHash/md5 discipline): for a key k,
  * bucket = first 8 md5 hex chars (as unsigned) mod m, and the register
  * candidate is rank = 33 − bitlen(second 8 hex chars) — so the WHOLE
  * register table, the actual sketch state, replays as integer SQL in
  * DuckDB (`33 - length(format('{:b}', w))`) and the k8 gate is exact at
  * any m. bitlen(0) is defined as 1 (rank 32) on both engines. The
  * float estimator on top is property-gated (error band vs exact
  * distinct), not oracled — transcendentals don't cross engines.
  */
object HllHash {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** (bucket, rank) of `key`: md5 bytes 0–3 pick the bucket (mod m),
    * bytes 4–7 give rank = 33 − bitlen ∈ [1, 32].
    */
  def bucketRank(key: String, m: Int): (Int, Int) = {
    val digest = md.get()
    digest.reset()
    val bytes = digest.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v1 = ((bytes(0) & 0xFFL) << 24) | ((bytes(1) & 0xFFL) << 16) |
      ((bytes(2) & 0xFFL) << 8) | (bytes(3) & 0xFFL)
    val v2 = ((bytes(4) & 0xFFL) << 24) | ((bytes(5) & 0xFFL) << 16) |
      ((bytes(6) & 0xFFL) << 8) | (bytes(7) & 0xFFL)
    val bitlen = if (v2 == 0L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(v2)
    ((v1 % m).toInt, 33 - bitlen)
  }
}

/** m byte registers — the whole HLL state. Mergeable by element-wise max
  * (order-insensitive, idempotent: re-adding a key is a no-op), so the
  * map-side partial IS the sketch and re-aggregation across shards never
  * double-counts — the k4 cube persistence contract.
  */
final class HllBuffer(val m: Int) {
  val registers: Array[Byte] = new Array[Byte](m)

  def add(key: String): Unit = {
    val (b, r) = HllHash.bucketRank(key, m)
    if (r > registers(b)) registers(b) = r.toByte
  }

  def merge(other: HllBuffer): Unit = {
    require(other.m == m, s"HLL size mismatch: $m vs ${other.m}")
    var i = 0
    while (i < m) {
      if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
      i += 1
    }
  }

  /** Standard HLL estimator with the small-range linear-counting switch
    * (Flajolet et al. §4): raw = α_m·m²/Σ2^−reg; below 2.5·m with empty
    * registers, m·ln(m/V) instead.
    */
  def estimate: Double = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.pow(2.0, -registers(i).toDouble)
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m.toDouble * m.toDouble / sum
    if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
    else raw
  }
}

object HllCodec {
  def write(buf: HllBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.m)
    bb.putInt(buf.m).put(buf.registers)
    bb.array()
  }

  def read(bytes: Array[Byte]): HllBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val buf = new HllBuffer(m)
    bb.get(buf.registers)
    buf
  }
}

/** `graft_hll_state(key, m)` → binary: HLL register image over the
  * group's keys. O(m) bytes per group at any cardinality — the
  * distinct-count sketch whose per-group state is FIXED-SIZE (KMV's
  * TreeSet costs ~16 bytes/entry up to k; these are m one-byte
  * registers), which is what a per-(group × partition) shuffle wants
  * when groups are many.
  */
case class HllState(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"graft_hll_state needs a string input, got ${child.dataType.simpleString}")
    else if (m <= 0 || m > (1 << 20)) TypeCheckResult.TypeCheckFailure(
      s"graft_hll_state needs 0 < m <= ${1 << 20} registers, got $m")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(m)

  override def update(buf: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(buf: HllBuffer, other: HllBuffer): HllBuffer = { buf.merge(other); buf }
  override def eval(buf: HllBuffer): Any = HllCodec.write(buf)
  override def serialize(buf: HllBuffer): Array[Byte] = HllCodec.write(buf)
  override def deserialize(bytes: Array[Byte]): HllBuffer = HllCodec.read(bytes)
  override def withNewMutableAggBufferOffset(offset: Int): HllState =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllState =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllState = copy(child = newChildren.head)
  override def prettyName: String = "graft_hll_state"
}

/** `graft_hll_merge(state, m)` → binary: element-wise max of stored HLL
  * states — order-insensitive and idempotent, so the merged image is
  * bit-identical to a single pass over the union (the k4 rollup
  * contract, spec-asserted).
  */
case class HllMerge(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType) TypeCheckResult.TypeCheckFailure(
      s"graft_hll_merge needs a binary state input, got ${child.dataType.simpleString}")
    else if (m <= 0 || m > (1 << 20)) TypeCheckResult.TypeCheckFailure(
      s"graft_hll_merge needs 0 < m <= ${1 << 20} registers, got $m")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(m)

  override def update(buf: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.merge(HllCodec.read(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: HllBuffer, other: HllBuffer): HllBuffer = { buf.merge(other); buf }
  override def eval(buf: HllBuffer): Any = HllCodec.write(buf)
  override def serialize(buf: HllBuffer): Array[Byte] = HllCodec.write(buf)
  override def deserialize(bytes: Array[Byte]): HllBuffer = HllCodec.read(bytes)
  override def withNewMutableAggBufferOffset(offset: Int): HllMerge =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllMerge =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllMerge = copy(child = newChildren.head)
  override def prettyName: String = "graft_hll_merge"
}

/** `graft_hll_registers(state)` → array<int>: the decoded register
  * image. This is the gate surface — registers are integers all the way
  * down, so DuckDB replays the whole table exactly (the k6 grid
  * discipline); the float estimator never enters the oracle.
  */
case class HllRegisters(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hll_registers needs a binary state, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(state: Any): Any = {
    val buf = HllCodec.read(state.asInstanceOf[Array[Byte]])
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      buf.registers.map(_.toInt))
  }

  override protected def withNewChildInternal(newChild: Expression): HllRegisters =
    copy(child = newChild)
}

/** `graft_hll_estimate(state)` → double: the HLL cardinality estimate
  * (α_m bias correction + linear-counting small-range switch).
  */
case class HllEstimate(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hll_estimate needs a binary state, got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(state: Any): Any =
    HllCodec.read(state.asInstanceOf[Array[Byte]]).estimate

  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}

/** Exact-replayable Bloom filter state: k = 3 probe positions per key,
  * each parsed from a disjoint 8-hex-char slice of md5(key) mod m — the
  * SAME arithmetic DuckDB computes as
  * `CAST('0x' || substr(md5(key), 8i+1, 8) AS BIGINT) % m`, so the set
  * bit positions (and therefore the whole filter image) replay exactly
  * in an oracle, unlike Spark's built-in `BloomFilterImpl` (c3's
  * prefilter, whose murmur layout is JVM-private). Fixed m-bit state
  * per group, bit-OR merge — idempotent, order-insensitive, the
  * membership-shard primitive of the k4/k8 sketch-cube family.
  */
final class BloomBuffer(val m: Int) {
  val bits: Array[Byte] = new Array[Byte]((m + 7) / 8)

  def add(key: String): Unit = {
    val hex = BloomHash.md5Hex(key)
    var i = 0
    while (i < 3) {
      val v = java.lang.Long.parseLong(hex.substring(8 * i, 8 * i + 8), 16)
      val p = (v % m).toInt
      bits(p >> 3) = (bits(p >> 3) | (1 << (p & 7))).toByte
      i += 1
    }
  }

  def merge(other: BloomBuffer): Unit = {
    require(other.m == m, s"Bloom size mismatch: $m vs ${other.m}")
    var i = 0
    while (i < bits.length) {
      bits(i) = (bits(i) | other.bits(i)).toByte
      i += 1
    }
  }

  /** Sorted set-bit positions — the oracle surface. */
  def positions: Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var p = 0
    while (p < m) {
      if ((bits(p >> 3) & (1 << (p & 7))) != 0) out += p
      p += 1
    }
    out.toArray
  }
}

object BloomHash {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Lowercase 32-char md5 hex of the UTF-8 bytes — ≡ `md5(col)` in both
    * Spark and DuckDB.
    */
  def md5Hex(key: String): String = {
    val digest = md.get()
    digest.reset()
    val bytes = digest.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < bytes.length) {
      sb.append(Character.forDigit((bytes(i) >> 4) & 0xF, 16))
      sb.append(Character.forDigit(bytes(i) & 0xF, 16))
      i += 1
    }
    sb.toString
  }
}

object BloomCodec {
  def write(buf: BloomBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.bits.length)
    bb.putInt(buf.m).put(buf.bits)
    bb.array()
  }

  def read(bytes: Array[Byte]): BloomBuffer = {
    // Defensive decode: state columns travel as opaque binary, so a
    // truncated/foreign value must fail with a named error, not a
    // BufferUnderflow / NegativeArraySize / %-by-zero surprise.
    if (bytes == null || bytes.length < 4)
      throw new IllegalArgumentException(
        s"corrupt graft_bloom state: ${if (bytes == null) "null" else s"${bytes.length}-byte"} " +
          "value is shorter than the 4-byte m header")
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt
    if (m < 8 || m > (1 << 24))
      throw new IllegalArgumentException(
        s"corrupt graft_bloom state: m = $m outside [8, ${1 << 24}]")
    val expected = 4 + (m + 7) / 8
    if (bytes.length != expected)
      throw new IllegalArgumentException(
        s"corrupt graft_bloom state: m = $m implies $expected bytes, got ${bytes.length}")
    val buf = new BloomBuffer(m)
    bb.get(buf.bits)
    buf
  }
}

/** `graft_bloom_state(key, m)` → binary: m-bit Bloom image over the
  * group's keys (k = 3 md5-slice probes). O(m/8) bytes per group at any
  * cardinality.
  */
case class BloomState(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuffer] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_state needs a string input, got ${child.dataType.simpleString}")
    else if (m < 8 || m > (1 << 24)) TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_state needs 8 <= m <= ${1 << 24} bits, got $m")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomBuffer = new BloomBuffer(m)

  override def update(buf: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(buf: BloomBuffer, other: BloomBuffer): BloomBuffer = {
    buf.merge(other); buf
  }
  override def eval(buf: BloomBuffer): Any = BloomCodec.write(buf)
  override def serialize(buf: BloomBuffer): Array[Byte] = BloomCodec.write(buf)
  override def deserialize(bytes: Array[Byte]): BloomBuffer = BloomCodec.read(bytes)
  override def withNewMutableAggBufferOffset(offset: Int): BloomState =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomState =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomState = copy(child = newChildren.head)
  override def prettyName: String = "graft_bloom_state"
}

/** `graft_bloom_merge(state, m)` → binary: bit-OR of stored Bloom
  * images — order-insensitive and idempotent (the k4/k8 rollup
  * contract).
  */
case class BloomMerge(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuffer] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType) TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_merge needs a binary state input, got ${child.dataType.simpleString}")
    else if (m < 8 || m > (1 << 24)) TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_merge needs 8 <= m <= ${1 << 24} bits, got $m")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomBuffer = new BloomBuffer(m)

  override def update(buf: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v != null) buf.merge(BloomCodec.read(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: BloomBuffer, other: BloomBuffer): BloomBuffer = {
    buf.merge(other); buf
  }
  override def eval(buf: BloomBuffer): Any = BloomCodec.write(buf)
  override def serialize(buf: BloomBuffer): Array[Byte] = BloomCodec.write(buf)
  override def deserialize(bytes: Array[Byte]): BloomBuffer = BloomCodec.read(bytes)
  override def withNewMutableAggBufferOffset(offset: Int): BloomMerge =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomMerge =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomMerge = copy(child = newChildren.head)
  override def prettyName: String = "graft_bloom_merge"
}

/** `graft_bloom_positions(state)` → array<int>: sorted set-bit
  * positions — the gate surface (integers all the way down; DuckDB
  * recomputes each member's 3 probe positions directly).
  */
case class BloomPositions(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_positions needs a binary state, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(state: Any): Any = {
    val buf = BloomCodec.read(state.asInstanceOf[Array[Byte]])
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf.positions)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomPositions =
    copy(child = newChild)
}

/** `graft_bloom_contains(state, key)` → boolean: membership probe — all
  * 3 md5-slice positions set. The serving-side expression of the
  * persisted membership shard.
  */
case class BloomProbeContains(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_bloom_contains needs (binary state, string key), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = BooleanType

  override def nullSafeEval(state: Any, key: Any): Any = {
    val buf = BloomCodec.read(state.asInstanceOf[Array[Byte]])
    val hex = BloomHash.md5Hex(key.toString)
    var i = 0
    var ok = true
    while (i < 3 && ok) {
      val v = java.lang.Long.parseLong(hex.substring(8 * i, 8 * i + 8), 16)
      val p = (v % buf.m).toInt
      ok = (buf.bits(p >> 3) & (1 << (p & 7))) != 0
      i += 1
    }
    ok
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbeContains =
    copy(left = newLeft, right = newRight)
}

object SketchFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kmv_distinct",
      exprs => KmvDistinct(
        exprs(0), TextExprFunctions.intArg(exprs(1), "graft_kmv_distinct"))
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kmv_state",
      exprs => KmvState(
        exprs(0), TextExprFunctions.intArg(exprs(1), "graft_kmv_state"))
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kmv_merge",
      exprs => KmvMerge(
        exprs(0), TextExprFunctions.intArg(exprs(1), "graft_kmv_merge"))
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_quantile_state",
      exprs => QuantileState(
        exprs(0), TextExprFunctions.intArg(exprs(1), "graft_quantile_state"))
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_quantile_merge",
      exprs => QuantileMerge(
        exprs(0),
        TextExprFunctions.doubleArg(exprs(1), "graft_quantile_merge"),
        TextExprFunctions.intArg(exprs(2), "graft_quantile_merge"))
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_state",
      exprs => CmsState(
        exprs(0),
        TextExprFunctions.intArg(exprs(1), "graft_cms_state"),
        TextExprFunctions.intArg(exprs(2), "graft_cms_state"))
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_merge",
      exprs => CmsMerge(
        exprs(0),
        TextExprFunctions.intArg(exprs(1), "graft_cms_merge"),
        TextExprFunctions.intArg(exprs(2), "graft_cms_merge"))
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_query",
      exprs => CmsQuery(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_inner",
      exprs => CmsInner(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hh_state",
      exprs => HeavyHittersState(
        exprs(0), TextExprFunctions.intArg(exprs(1), "graft_hh_state"))
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hh_merge",
      exprs => HeavyHittersMerge(
        exprs(0),
        TextExprFunctions.intArg(exprs(1), "graft_hh_merge"),
        TextExprFunctions.intArg(exprs(2), "graft_hh_merge"))
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_heavy_hitters",
      exprs => HeavyHitters(
        exprs(0),
        TextExprFunctions.intArg(exprs(1), "graft_heavy_hitters"),
        TextExprFunctions.intArg(exprs(2), "graft_heavy_hitters"))
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_quantile_sketch",
      exprs => QuantileSketch(
        exprs(0),
        TextExprFunctions.doubleArg(exprs(1), "graft_quantile_sketch"),
        TextExprFunctions.intArg(exprs(2), "graft_quantile_sketch"))
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_weighted_sample",
      exprs => WeightedSample(
        exprs(0), exprs(1), TextExprFunctions.intArg(exprs(2), "graft_weighted_sample"))
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll_state",
      exprs => HllState(
        exprs(0), TextExprFunctions.intArg(exprs(1), "graft_hll_state"))
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll_merge",
      exprs => HllMerge(
        exprs(0), TextExprFunctions.intArg(exprs(1), "graft_hll_merge"))
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll_registers",
      exprs => HllRegisters(exprs(0)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll_estimate",
      exprs => HllEstimate(exprs(0)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_state",
      exprs => BloomState(
        exprs(0), TextExprFunctions.intArg(exprs(1), "graft_bloom_state"))
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_merge",
      exprs => BloomMerge(
        exprs(0), TextExprFunctions.intArg(exprs(1), "graft_bloom_merge"))
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_positions",
      exprs => BloomPositions(exprs(0)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains",
      exprs => BloomProbeContains(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kmv_union",
      exprs => KmvSetEstimate(exprs(0), exprs(1), intersect = false),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kmv_intersect",
      exprs => KmvSetEstimate(exprs(0), exprs(1), intersect = true),
      "built-in")
  }
}
