package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

object BenchSubset {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(appName = "graft-bench-subset")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES",
      "q1_agg,q26_avg,q23_rollup,t3_langid,t1_text_stats,t9_repetition,e4_sessionize,e5_asof_join,d7_label_centroids").split(",")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      graft.operators.Dedup.unpersistAll()
      (System.nanoTime() - t0) / 1e9
    }
    run(names.head) // warmup
    names.foreach { n => println(f"[subset] $n%-28s ${run(n)}%8.2f s") }
    spark.stop()
  }
}
