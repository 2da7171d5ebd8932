package graft

import scala.io.StdIn

import graft.engine.GraftEngine

/** Interactive REPL over [[graft.engine.GraftEngine]] — the moral
  * equivalent of the reference's rustyline CLI
  * (/root/reference/src/cli.rs:13-60): meta commands `\dt` (show tables),
  * `\load csv <name> <path>`, `\explain <sql>` (cli.rs:136-165,
  * db.rs:34-55), everything else routed to the engine, per-statement
  * wall-clock printed like cli.rs:25-45.
  *
  * Run: sbt "runMain graft.Cli" (reads statements from stdin, `exit` or
  * EOF quits).
  */
object Cli {

  /** Execute one REPL line against the engine; returns the rendered
    * output (testable — main() only adds the loop and timing).
    */
  def execute(engine: GraftEngine, line0: String): String = {
    val line = line0.trim
    if (line.isEmpty) ""
    else if (line == "\\dt")
      engine.showTables().collect()
        .map(r => s"${r.getString(0)}.${r.getString(1)}").mkString("\n")
    else if (line.startsWith("\\load csv ")) {
      val parts = line.stripPrefix("\\load csv ").trim.split("\\s+", 2)
      require(parts.length == 2, """usage: \load csv <name> <path>""")
      engine.createCsvTable(parts(0), parts(1))
      s"loaded table ${parts(0)}"
    } else if (line.startsWith("\\load parquet ")) {
      val parts = line.stripPrefix("\\load parquet ").trim.split("\\s+", 2)
      require(parts.length == 2, """usage: \load parquet <name> <path>""")
      engine.createParquetTable(parts(0), parts(1))
      s"loaded table ${parts(0)}"
    } else if (line.startsWith("\\explain "))
      engine.explain(line.stripPrefix("\\explain "))
    else render(engine.run(line))
  }

  /** Plain fixed-order rendering: header line then one row per line,
    * NULLs as the reference displays them.
    */
  private def render(df: org.apache.spark.sql.DataFrame): String = {
    val header = df.columns.mkString(" | ")
    val rows = df.collect().map(_.toSeq.map {
      case null => "NULL"
      case v => v.toString
    }.mkString(" | "))
    (header +: rows).mkString("\n")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(appName = "graft-cli")
    val engine = new GraftEngine(spark)
    println("graft SQL shell — \\dt, \\load csv|parquet <name> <path>, \\explain <sql>, exit")
    var line = StdIn.readLine("graft> ")
    while (line != null && line.trim != "exit" && line.trim != "quit") {
      val t0 = System.nanoTime()
      try {
        val out = execute(engine, line)
        if (out.nonEmpty) println(out)
        println(f"(${(System.nanoTime() - t0) / 1e9}%.3f s)")
      } catch {
        case e: Exception => println(s"error: ${e.getMessage}")
      }
      line = StdIn.readLine("graft> ")
    }
    spark.stop()
  }
}
