package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path.
  *
  * The composable form of cosine similarity —
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_) / (sqrt(...) * sqrt(...))` —
  * walks each array three times and materializes three intermediate arrays
  * per pair. In the ANN and embedding-dedup operators this expression sits
  * inside an O(candidate-pairs) join, so it dominates the profile; at 100 TB
  * the difference between one fused pass and three allocating passes is the
  * job. These expressions are single-pass, allocation-free, and codegen'd
  * (`doGenCode`), so they inline into the surrounding WholeStageCodegen.
  *
  * Accumulation is strict left-to-right in doubles — bit-identical to the
  * reference composable form and to DuckDB's `list_dot_product`, which the
  * oracle gate depends on. Float inputs widen per-element (exact).
  */
abstract class VectorFold extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Fold step over (i, aVal, bVal) → updates accumulators; scala impl. */
  protected def eval(a: ArrayData, b: ArrayData, aT: DataType, bT: DataType): Double

  protected def get(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    eval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemType(left), elemType(right))

  /** Generated per-element accessor. */
  protected def genGet(arr: String, i: String, t: DataType): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }
}

/** dot(a, b): Σ a_i * b_i over the common prefix length. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {

  override protected def eval(a: ArrayData, b: ArrayData, aT: DataType, bT: DataType): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += get(a, i, aT) * get(b, i, bT); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${genGet(a, i, elemType(left))} * ${genGet(b, i, elemType(right))};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot/(‖a‖·‖b‖), all three sums in ONE pass. NaN when either
  * norm is zero (same as the composable form's 0/0).
  */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorFold {

  override protected def eval(a: ArrayData, b: ArrayData, aT: DataType, bT: DataType): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, i, aT); val y = get(b, i, bT)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${genGet(a, i, elemType(left))};
         |  double $y = ${genGet(b, i, elemType(right))};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Session registration: exposes the expressions as SQL-callable functions
  * (`graft_dot`, `graft_cosine`) so both the Column API (via
  * `call_function`) and `spark.sql` text reach the codegen'd path.
  */
/** Exact second-moment accumulator for [[GramMoments]]: per slot, the
  * running sum of scale-12 UNSCALED decimal values — a long fast path
  * plus a lazily-allocated BigInteger overflow lane, so the state stays
  * (dim + dim·(dim+1)/2) longs on realistic data but cannot wrap on a
  * 100 TB partition (the t19 headroom discipline made structural).
  * Slots [0, dim) hold Σ decimal₁₂(vᵢ); slots [dim, …) the upper
  * triangle Σ decimal₁₂(vᵢ·vⱼ) in (i, j ≥ i) row-major order.
  */
final class GramBuffer(val dim: Int) {
  val cells: Int = dim * (dim + 1) / 2
  var n: Long = 0L
  val lo = new Array[Long](dim + cells)
  var big: Array[java.math.BigInteger] = null

  private def bigLane(): Array[java.math.BigInteger] = {
    if (big == null)
      big = Array.fill(dim + cells)(java.math.BigInteger.ZERO)
    big
  }

  def addLong(idx: Int, v: Long): Unit = {
    val cur = lo(idx)
    val s = cur + v
    if (((cur ^ s) & (v ^ s)) < 0) { // two's-complement overflow
      val b = bigLane()
      b(idx) = b(idx).add(java.math.BigInteger.valueOf(cur))
      lo(idx) = v
    } else lo(idx) = s
  }

  def addBig(idx: Int, v: java.math.BigInteger): Unit = {
    val b = bigLane()
    b(idx) = b(idx).add(v)
  }

  def totalAt(idx: Int): java.math.BigInteger = {
    val l = java.math.BigInteger.valueOf(lo(idx))
    if (big == null) l else big(idx).add(l)
  }

  def merge(o: GramBuffer): Unit = {
    n += o.n
    var i = 0
    while (i < lo.length) {
      addLong(i, o.lo(i))
      if (o.big != null && o.big(i).signum != 0) addBig(i, o.big(i))
      i += 1
    }
  }
}

/** `graft_gram_moments(vec, dim)` → one array of
  * `(i, j, n, sxy, sx, sy)` structs over the upper triangle (i ≤ j) —
  * the v3 second-moment pass FUSED into a single aggregate. The
  * composable form (double posexplode → filter → 2080-group hash
  * aggregate) materializes dim² rows per vector before aggregating; at
  * 1e9 vectors that is 4e12 exploded rows fed one at a time through
  * group lookup. This aggregate walks each vector once, updating a
  * primitive triangle in place; only the O(dim²) state crosses the
  * shuffle.
  *
  * EXACTNESS contract: each term replicates Spark's
  * `cast(x as decimal(28,12))` bit-for-bit —
  * `BigDecimal.valueOf` (the shortest-decimal rendering `Cast` uses,
  * via `Decimal(BigDecimal(d))`) then `setScale(12, HALF_UP)` — and
  * sums the unscaled values exactly, so the emitted decimal(38,12)
  * equals `sum(cast(vi*vj as decimal(28,12)))` on any partitioning.
  * Inputs must keep |x| below decimal(28,12)'s 1e16 integral bound
  * (the Cast contract); rows whose array is null, wrong-length, or
  * carries a null element are skipped whole.
  */
case class GramMoments(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[GramBuffer] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) if dim >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_moments needs array<float>/array<double> and dim >= 1")
  }

  override def children: Seq[Expression] = child :: Nil

  private val struct = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sxy", DecimalType(38, 12), nullable = false),
    StructField("sx", DecimalType(38, 12), nullable = false),
    StructField("sy", DecimalType(38, 12), nullable = false)))

  override def dataType: DataType = ArrayType(struct, containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): GramBuffer = new GramBuffer(dim)

  /** Replicates Cast(double → decimal(28,12)): shortest-decimal
    * rendering, then HALF_UP at scale 12; returned as the unscaled
    * integer. The long fast path covers |x| < ~9e5; larger magnitudes
    * take the BigInteger lane.
    */
  private def add12(buf: GramBuffer, idx: Int, d: Double): Unit = {
    val u = java.math.BigDecimal.valueOf(d)
      .setScale(12, java.math.RoundingMode.HALF_UP).unscaledValue()
    if (u.bitLength() <= 62) buf.addLong(idx, u.longValue())
    else buf.addBig(idx, u)
  }

  private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == dim) {
        val xs = new Array[Double](dim)
        var k = 0
        var ok = true
        while (k < dim && ok) {
          if (arr.isNullAt(k)) ok = false
          else {
            xs(k) =
              if (elemIsFloat) arr.getFloat(k).toDouble else arr.getDouble(k)
            k += 1
          }
        }
        if (ok) {
          buf.n += 1
          var i = 0
          var cell = dim
          while (i < dim) {
            val vi = xs(i)
            add12(buf, i, vi)
            var j = i
            while (j < dim) {
              add12(buf, cell, vi * xs(j))
              cell += 1
              j += 1
            }
            i += 1
          }
        }
      }
    }
    buf
  }

  override def merge(buf: GramBuffer, other: GramBuffer): GramBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: GramBuffer): Any = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    def dec(idx: Int): Decimal =
      Decimal(new java.math.BigDecimal(buf.totalAt(idx), 12), 38, 12)
    val rows = new Array[Any](buf.cells)
    var i = 0
    var cell = dim
    var out = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        rows(out) = new GenericInternalRow(Array[Any](
          i, j, buf.n, dec(cell), dec(i), dec(j)))
        out += 1; cell += 1; j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override def serialize(buf: GramBuffer): Array[Byte] = {
    val bigBytes: Array[Array[Byte]] =
      if (buf.big == null) null else buf.big.map(_.toByteArray)
    val bigLen = if (bigBytes == null) 0
      else bigBytes.map(_.length + 4).sum
    val bb = java.nio.ByteBuffer.allocate(
      4 + 8 + 1 + buf.lo.length * 8 + bigLen)
    bb.putInt(buf.dim).putLong(buf.n)
    bb.put(if (bigBytes == null) 0.toByte else 1.toByte)
    buf.lo.foreach(bb.putLong)
    if (bigBytes != null) bigBytes.foreach { b =>
      bb.putInt(b.length); bb.put(b)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new GramBuffer(bb.getInt)
    buf.n = bb.getLong
    val hasBig = bb.get() == 1.toByte
    var i = 0
    while (i < buf.lo.length) { buf.lo(i) = bb.getLong; i += 1 }
    if (hasBig) {
      buf.big = new Array[java.math.BigInteger](buf.lo.length)
      i = 0
      while (i < buf.lo.length) {
        val len = bb.getInt
        val b = new Array[Byte](len)
        bb.get(b)
        buf.big(i) = new java.math.BigInteger(b)
        i += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): GramMoments =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): GramMoments =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMoments =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_gram_moments"
}

object VectorFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_cosine",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_gram_moments",
      exprs => GramMoments(
        exprs(0), TextExprFunctions.intArg(exprs(1), "graft_gram_moments"))
        .toAggregateExpression(),
      "built-in")
  }
}
