package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
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
object VectorFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_cosine",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
  }
}
