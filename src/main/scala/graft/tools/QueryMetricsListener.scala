package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-interval executor-metric accumulator for the bench artifact.
  *
  * The r19 driver channel collapsed (631 s wall, 6.2× the CPU of the
  * identical local[8] run, GC flat) and the artifact could not adjudicate
  * WHY: the bench recorded wall/cpu/gc but no memory-pressure signals, so
  * "spill/recompute churn" stayed a hypothesis. This listener closes that
  * gap (r19 verdict task 1c): every query line now carries the task-level
  * spill bytes, the peak per-task execution memory, task counts/failures,
  * and the BlockManager storage level at query end — the signals that
  * separate "the query computed more" from "the JVM was drowning".
  *
  * Events post asynchronously on the listener bus; [[snapshot]] waits for
  * the bus to drain (bounded) by polling the task counter until it is
  * stable, so per-query attribution is exact on a quiet JVM and at worst
  * off by a straggling event under pathological load — the totals are
  * always exact.
  */
class QueryMetricsListener extends SparkListener {
  private val memSpill = new AtomicLong(0L)
  private val diskSpill = new AtomicLong(0L)
  private val peakExec = new AtomicLong(0L)
  private val runTimeMs = new AtomicLong(0L)
  private val tasks = new AtomicInteger(0)
  private val taskFailures = new AtomicInteger(0)

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      memSpill.addAndGet(m.memoryBytesSpilled)
      diskSpill.addAndGet(m.diskBytesSpilled)
      runTimeMs.addAndGet(m.executorRunTime)
      var cur = peakExec.get()
      while (m.peakExecutionMemory > cur &&
        !peakExec.compareAndSet(cur, m.peakExecutionMemory)) cur = peakExec.get()
    }
    tasks.incrementAndGet()
    te.reason match {
      case org.apache.spark.Success => ()
      case _ => taskFailures.incrementAndGet()
    }
  }

  /** Cumulative counters: (memSpill, diskSpill, peakExec, runTimeMs,
    * tasks, failures). Callers delta two snapshots to attribute an
    * interval; peakExec is a high-water mark, not deltable — report the
    * raw value per interval by resetting it via [[resetPeak]].
    */
  def snapshot(sc: SparkContext): (Long, Long, Long, Long, Int, Int) = {
    // bounded drain: tasks of a completed action have all ENDED, but their
    // listener events may still be in flight on the bus — poll until the
    // counter is stable twice 10 ms apart (worst case 200 ms, never hangs)
    var last = -1L
    var spins = 0
    while (spins < 20 && tasks.get() != last) {
      last = tasks.get()
      Thread.sleep(10)
      spins += 1
    }
    (memSpill.get(), diskSpill.get(), peakExec.get(), runTimeMs.get(),
      tasks.get(), taskFailures.get())
  }

  def resetPeak(): Unit = peakExec.set(0L)

  /** BlockManager storage bytes currently used across the (local-mode
    * single) executor — the pass-accumulation signal: storage that GROWS
    * across queries that each released their own caches is leaked blocks
    * (broadcasts waiting for a GC, untracked persists), and it is exactly
    * the state whose eviction churn the r19 collapse is attributed to.
    */
  def storageUsed(sc: SparkContext): Long =
    sc.getExecutorMemoryStatus.values.map { case (max, free) => max - free }.sum
}
