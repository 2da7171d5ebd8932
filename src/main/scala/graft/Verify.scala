package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.build(
      master = s"local[$cpus]",
      appName = "graft-verify",
      shufflePartitions = cpus.toInt)
    // data-derived width, same derivation as the bench (bucketed stores
    // are written at this width; the oracle reads the same bytes)
    Tables.applySessionWidth(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    // local-iteration filter: SPARK_GRAFT_VERIFY_QUERIES=q1_agg,v4p_...
    // runs only those queries (the driver leaves it unset → full dump)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // release this query's signature caches before the next one runs
      graft.operators.Dedup.unpersistAll()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // model-as-data oracles (v4p): the SQL references small parquet model
    // tables the queries just wrote; substitute the sf-specific dir so
    // the driver's DuckDB reads the same model this run fitted
    val modelsDir = Tables.modelsDir(sfDir)
    val oracles = only match {
      case Some(names) => SparkEntry.oracleSql.filter(kv => names(kv._1))
      case None => SparkEntry.oracleSql
    }
    val json = oracles
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace("__GRAFT_MODELS__", modelsDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
