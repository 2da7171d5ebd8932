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
  AllTuples, ClusteredDistribution, Distribution, Partitioning,
  UnspecifiedDistribution}
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

/** Physical bounded-heap implementation, planned as a two-phase pair the
  * way hash aggregation is:
  *
  *   TopKPerKeyExec(partial) → Exchange(keys) → TopKPerKeyExec(final)
  *
  * Per-key top-k is a semigroup (the top-k of a union is the top-k of the
  * per-part top-ks), so the PARTIAL phase runs the same bounded heap over
  * each INPUT partition before any exchange, shrinking shuffle input to at
  * most k rows per (partition × key) and — critically at 100 TB — capping
  * the skewed-key hot spot: the final task for a dominant key receives
  * ≤ k·numInputPartitions rows instead of the key's entire row set. The
  * partial phase requires no distribution and emits retained rows WITHOUT
  * ranks; the FINAL phase requires clustering on `keys` (EnsureRequirements
  * inserts the hash exchange) and assigns ranks 1..k.
  *
  * Inside each partition a hash map of per-key heaps holds at most k rows
  * per key — the memory bound is (keys in partition) × k rows, the direct
  * analogue of hash aggregation state.
  *
  * Like Spark's own hash aggregate, the hash path cannot spill — so when a
  * partition's key count exceeds `spark.graft.topk.maxHeapKeys` (default
  * 262144) the operator degrades to SORT-based evaluation for that
  * partition: all retained rows plus the rest of the input go through a
  * spillable [[org.apache.spark.sql.execution.UnsafeExternalRowSorter]]
  * ordered by (keys asc, order), and one linear sweep emits rank ≤ k per
  * key group. Rows already evicted from a heap lost to k better rows of
  * the same key, so dropping them before the sort is exact. The fallback
  * is O(n log n) with disk spill instead of O(n log k) in memory — the
  * hash-agg-falls-back-to-sort-agg discipline, which makes unbounded key
  * cardinality a slowdown, never an OOM.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan,
    partial: Boolean = false)
  extends UnaryExecNode {

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def producedAttributes: AttributeSet =
    if (partial) AttributeSet.empty else AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val fullOutput = output
    val isPartial = partial
    val maxHeapKeys =
      conf.getConfString("spark.graft.topk.maxHeapKeys", "262144").toInt
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
      val resultProj = UnsafeProjection.create(fullOutput, fullOutput)
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow

      // heap head = WORST retained row (max under the sort order); a new
      // row replaces it when it sorts strictly earlier
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      var sorter: org.apache.spark.sql.execution.UnsafeExternalRowSorter = null
      while (iter.hasNext && sorter == null) {
        val u = iter.next()
        val key = keyProj(u)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < limit) heap.enqueue(u.copy())
            else if (ord.compare(u, heap.head) < 0) {
              heap.dequeue()
              heap.enqueue(u.copy())
            }
          case None if heaps.size < maxHeapKeys =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](ord)
            heaps.put(key.copy(), h)
            h.enqueue(u.copy())
          case None =>
            // key-cardinality bound hit: degrade to the spillable sort path.
            // Heap-retained rows are a sound subset (every evicted row lost
            // to k better same-key rows), so re-sorting (retained ∪ rest of
            // input) is exact.
            sorter = TopKPerKeyExec.createSorter(childOutput, keyExprs, sortOrder)
            heaps.valuesIterator.foreach(_.foreach(sorter.insertRow))
            heaps.clear()
            sorter.insertRow(u)
        }
      }

      if (sorter == null) {
        if (isPartial) {
          // partial phase: emit the retained rows unranked — ranks are
          // assigned once, after the exchange, by the final phase
          heaps.iterator.flatMap { case (_, heap) => heap.iterator }
        } else {
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
        }
      } else {
        while (iter.hasNext) sorter.insertRow(iter.next())
        // rows arrive grouped by key (sorted keys-asc) and ordered within
        // each group; one sweep emits rank 1..k per group and skips the rest
        var prevKey: UnsafeRow = null
        var rank = 0
        sorter.sort().flatMap { row =>
          val u = row.asInstanceOf[UnsafeRow]
          val key = keyProj(u)
          if (prevKey == null || key != prevKey) { prevKey = key.copy(); rank = 0 }
          rank += 1
          if (rank <= limit) {
            if (isPartial) Some(u)
            else {
              rankRow.update(0, rank)
              Some(resultProj(joined(u, rankRow)))
            }
          } else None
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {

  /** Spillable sorter for the fallback path, ordered (keys asc, then the
    * caller's order) so key groups are contiguous and internally ranked.
    * A constant sort prefix routes every comparison through the full row
    * ordering — the fallback is a safety valve, not the hot path.
    */
  private[plans] def createSorter(
      childOutput: Seq[Attribute],
      keyExprs: Seq[Expression],
      order: Seq[SortOrder]): org.apache.spark.sql.execution.UnsafeExternalRowSorter = {
    import org.apache.spark.sql.execution.UnsafeExternalRowSorter
    val groupOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering.create(
      keyExprs.map(SortOrder(_, Ascending)) ++ order, childOutput)
    val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
      private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
      override def computePrefix(row: InternalRow)
          : UnsafeExternalRowSorter.PrefixComputer.Prefix = {
        p.value = 0L; p.isNull = false; p
      }
    }
    UnsafeExternalRowSorter.create(
      org.apache.spark.sql.catalyst.types.DataTypeUtils.fromAttributes(childOutput),
      groupOrd,
      org.apache.spark.util.collection.unsafe.sort.PrefixComparators.LONG,
      prefixComputer,
      org.apache.spark.SparkEnv.get.memoryManager.pageSizeBytes,
      false)
  }
}

/** Planner strategy: the logical node becomes the two-phase physical pair
  * (partial → final); EnsureRequirements inserts the hash exchange between
  * them because only the final phase declares a clustering requirement.
  * If the child is already clustered on `keys` no exchange appears and the
  * partial pass is a cheap same-partition pre-filter.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rankAttr, child) =>
      val pre = TopKPerKeyExec(keys, order, k, rankAttr, planLater(child),
        partial = true)
      TopKPerKeyExec(keys, order, k, rankAttr, pre) :: Nil
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
