package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

import graft.{GraftSession, SparkEntry}

/** Dump `.explain("formatted")` for a set of SparkEntry queries — the
  * plan-evidence channel of the optimization rounds (plans/rNN/). Run:
  *
  *   sbt "runMain graft.tools.ExplainDump plans/r19 _before q1_agg,x26_..."
  *
  * Args: outDir, suffix, comma-separated query names (empty/absent ⇒ all).
  * Construction-runs-jobs queries (iterative fixpoints) execute their
  * eager rounds during plan construction — the dump reflects the final
  * serving plan, which is the part the shape claims are about.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r19")
    val suffix = if (args.length > 1) args(1) else "_before"
    val names = if (args.length > 2 && args(2).nonEmpty)
      args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    else SparkEntry.queries.keys.toSeq.sorted
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build(appName = "graft-explain")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n"))
      try {
        val plan = fn(spark, dir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/$n$suffix.txt"), plan)
        println(s"[explain] wrote $outDir/$n$suffix.txt")
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[explain] $n failed: ${e.getMessage}")
      } finally graft.operators.Dedup.unpersistAll()
    }
    spark.stop()
  }
}
