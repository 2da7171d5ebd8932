package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, Expression,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Per-key top-k selection as a first-class operator.
  *
  * The DataFrame-only expression of "k best rows per key" is
  * `row_number().over(Window.partitionBy(keys).orderBy(ord)) <= k`, which
  * SORTS every key's entire row set just to keep k of them: at 100 TB with
  * millions of rows per key that sort (plus its spill) dominates the stage.
  * This operator keeps a size-k bounded heap per key instead — O(n log k)
  * compares, O(keys·k) memory, no sort, no spill — the same plan shape
  * Catalyst itself picks for GLOBAL top-k (`TakeOrderedAndProject`) but
  * per key, which Spark has no built-in operator for. This is the (c) path
  * of the extension ladder: a genuine whole-operator gap, so it gets a
  * LogicalPlan + SparkStrategy + SparkPlan, injected via
  * [[org.apache.spark.sql.SparkSessionExtensions]] (see
  * [[graft.GraftSession]]).
  *
  * Semantics match `row_number`: ranks are 1..k in `order` sort order,
  * dense and unique per key, so callers MUST pass a total order (add a
  * tiebreak column) for deterministic output — identical to the discipline
  * the window form already needs under the oracle gate.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan)
  extends UnaryNode {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Physical bounded-heap implementation. Requires clustering on `keys`
  * (EnsureRequirements inserts the hash exchange); inside each partition a
  * hash map of per-key heaps holds at most k rows per key — the memory
  * bound is (keys in partition) × k rows, the direct analogue of hash
  * aggregation state (and like pre-spill hash agg it assumes k is small;
  * k-sized heaps are the contract of a top-k operator, not a limit of this
  * implementation).
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) AllTuples :: Nil else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val fullOutput = output
    child.execute().mapPartitions({ iter0 =>
      // no contract guarantees the child emits UnsafeRow — normalize via an
      // identity projection (a no-op copy for rows that already are unsafe)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val iter = iter0.map {
        case u: UnsafeRow => u
        case r => toUnsafe(r)
      }
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val baseOrd =
        org.apache.spark.sql.catalyst.expressions.RowOrdering.create(
          sortOrder.toSeq, childOutput)
      val ord = new Ordering[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = baseOrd.compare(a, b)
      }
      // heap head = WORST retained row (max under the sort order); a new
      // row replaces it when it sorts strictly earlier
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { u =>
        val key = keyProj(u)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](ord)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) heap.enqueue(u.copy())
        else if (ord.compare(u, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(u.copy())
        }
      }
      val resultProj = UnsafeProjection.create(fullOutput, fullOutput)
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      heaps.iterator.flatMap { case (_, heap) =>
        // dequeueAll yields descending (worst first) — reverse for rank 1..n
        val rows = heap.dequeueAll.reverseIterator
        var rank = 0
        rows.map { r =>
          rank += 1
          rankRow.update(0, rank)
          resultProj(joined(r, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node 1:1 to the exec. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rankAttr, child) =>
      TopKPerKeyExec(keys, order, k, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Column-API entry point. */
object TopKPerKey {

  /** k best rows per `keys` group under `order` (pass `col.desc` /
    * `col.asc`; bare columns default ascending), with a 1-based `rankName`
    * column appended — drop-in for the window row_number + filter idiom,
    * minus the per-key sort. Pass a TOTAL order for deterministic results.
    */
  def apply(
      df: DataFrame,
      keys: Seq[Column],
      order: Seq[Column],
      k: Int,
      rankName: String = "rank"): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val spark = df.sparkSession
    val sortOrder = order.map(c => GraftSqlBridge.expression(spark, c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    val node = TopKPerKeyNode(
      keys.map(c => GraftSqlBridge.expression(spark, c)), sortOrder, k, rankAttr,
      df.queryExecution.analyzed)
    GraftSqlBridge.ofRows(spark, node)
  }
}
