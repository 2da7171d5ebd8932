package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) curve kernel for multi-dimensional data layout.
  *
  * The reference engine is single-file and has no storage-layout notion;
  * this exists for the cluster execution model. At 100 TB a parquet scan
  * filtered on TWO dimensions (e.g. `part` range AND `supplier` range)
  * skips row groups only if the file sort order correlates with BOTH
  * columns — a lexicographic sort clusters only the leading key. The
  * Morton curve interleaves the bits of both keys, so a range-partitioned,
  * z-sorted layout keeps both dimensions locally clustered and the
  * min/max row-group statistics prune on either predicate.
  *
  * Kernel contract: take the LOW 16 bits of each input (callers bucket or
  * truncate wider domains first — layout only needs coarse locality, not
  * full key fidelity), interleave into a 32-bit value with `a` in the even
  * bit positions and `b` in the odd ones. Returned as long for painless
  * SQL math on both Spark and the DuckDB oracle side.
  */
object ZOrderKernel {

  /** Morton-interleave the low 16 bits of `a` (even positions) and `b`
    * (odd positions) into a non-negative 32-bit value.
    *
    * Bit-twiddling spread: classic "interleave by binary magic numbers"
    * (public-domain Stanford bit hacks collection) — spreads a 16-bit
    * value to even bit positions in O(log w) shifts rather than a 16-step
    * loop, keeping the generated code branch-free.
    */
  def interleave16(a: Long, b: Long): Long =
    spread16(a & 0xFFFFL) | (spread16(b & 0xFFFFL) << 1)

  @inline private def spread16(v: Long): Long = {
    var x = v
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }
}

/** `graft_zorder(a, b)` → bigint: Morton interleave of the low 16 bits of
  * two integral columns; see [[ZOrderKernel.interleave16]]. Codegen'd so a
  * z-sorted write stays inside whole-stage codegen.
  */
case class ZOrderInterleave(left: Expression, right: Expression)
    extends BinaryExpression {
  private def ok(t: DataType): Boolean = t match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder requires integral inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKernel.interleave16(toLong(a), toLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderKernel.interleave16((long)($a), (long)($b))")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrderInterleave =
    copy(left = l, right = r)

  override def prettyName: String = "graft_zorder"
}

object LayoutExprFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_zorder",
      exprs => ZOrderInterleave(exprs(0), exprs(1)), "built-in")
  }

  /** Range-partition `df` on the z-value of (`c1`, `c2`) into `numFiles`
    * output partitions and sort each partition by it, so a subsequent
    * parquet write yields files whose row-group min/max statistics are
    * tight on BOTH dimensions. One range exchange (sampled bounds — no
    * driver collect of data), then a local sort: the standard
    * write-amplification-free z-layout.
    */
  def zorderLayout(df: DataFrame, c1: Column, c2: Column, numFiles: Int): DataFrame = {
    val z = call_function("graft_zorder", c1, c2).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
