package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Ad-hoc profiler for the dedup pipelines (not part of the engine surface;
  * used to attribute bench time while tuning). Run:
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.Probe"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(appName = "graft-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val docs = Tables.load(spark, dir, "documents")
    docs.write.format("noop").mode("overwrite").save() // warm parquet/JIT
    t("d3 minhashLsh") {
      Dedup.minhashLsh(docs).write.format("noop").mode("overwrite").save()
    }
    t("d2 ngramJaccard") {
      Dedup.ngramJaccard(docs).write.format("noop").mode("overwrite").save()
    }
    t("d4 simhash") {
      Dedup.simhash(docs).write.format("noop").mode("overwrite").save()
    }
    t("d1 exact") {
      Dedup.exact(docs).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
