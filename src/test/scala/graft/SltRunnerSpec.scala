package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.GraftEngine

/** Runs the reference's own sqllogictest corpus
  * (the 19 .slt files under /root/reference/tests/slt) against
  * [[GraftEngine]].
  *
  * Mirrors the reference harness (tests/sqllogictest/tests/sqllogictest.rs):
  * each file runs twice —
  *  - v1 mode: every CSV under tests/csv pre-registered as a table
  *    (lib.rs `init_tables`); records tagged `onlyif sqlrs_v2` are skipped.
  *  - v2 mode: fresh engine, no fixtures; records tagged `skipif sqlrs_v2`
  *    are skipped.
  *
  * `statement error` records are EXECUTED and must fail: the engine
  * enforces the reference's error semantics (duplicate CREATE TABLE,
  * unsigned range checks on INSERT, varchar↔numeric comparison rejection,
  * FROM-subquery alias requirement) so a user migrating from the reference
  * sees the same rejects.
  *
  * Documented divergences from the reference (each one an intentional
  * behavior choice, not a gap):
  *  - query results are compared under rowsort regardless of the record's
  *    sort mode: the reference is single-threaded and order-deterministic,
  *    distributed Spark is not (SURVEY §4.3); ORDER BY correctness is
  *    covered by the driver's DuckDB-oracle gate which checks ordered rows.
  *  - `date - INTERVAL '1' DAY` returns the CORRECT 1998-11-30 rather than
  *    the reference's 1998-11-29, whose packed-interval negate corrupts the
  *    (days, ms) pair (arithmetic_function.rs:154-167; SURVEY §2.8). The
  *    expected value is overridden below.
  */
class SltRunnerSpec extends AnyFunSuite {
  import TestSpark._

  private val refRoot = Paths.get("/root/reference")
  private val sltDir = refRoot.resolve("tests/slt")

  // -- corpus parsing -------------------------------------------------------

  sealed trait Kind
  case object StatementOk extends Kind
  case object StatementError extends Kind
  case class Query(sortMode: String) extends Kind

  case class Record(
      kind: Kind,
      sql: String,
      expected: Seq[String],
      onlyIf: Option[String],
      skipIf: Option[String],
      line: Int)

  /** Minimal sqllogictest parser: skipif/onlyif directives, statement
    * ok/error, query blocks with `----` expected sections.
    */
  private def parse(path: Path): Seq[Record] = {
    val lines = Files.readAllLines(path).asScala.toVector
    val out = Vector.newBuilder[Record]
    var i = 0
    var onlyIf: Option[String] = None
    var skipIf: Option[String] = None
    def resetCond(): Unit = { onlyIf = None; skipIf = None }
    while (i < lines.length) {
      val line = lines(i).trim
      if (line.isEmpty || line.startsWith("#")) { i += 1 }
      else if (line.startsWith("skipif ")) { skipIf = Some(line.drop(7).trim); i += 1 }
      else if (line.startsWith("onlyif ")) { onlyIf = Some(line.drop(7).trim); i += 1 }
      else if (line.startsWith("statement ")) {
        val kind = if (line.contains("error")) StatementError else StatementOk
        val start = i + 1
        i = start
        val sql = new StringBuilder
        while (i < lines.length && lines(i).trim.nonEmpty) {
          sql.append(lines(i)).append('\n'); i += 1
        }
        out += Record(kind, sql.toString.trim, Seq.empty, onlyIf, skipIf, start)
        resetCond()
      } else if (line.startsWith("query")) {
        val parts = line.split("\\s+")
        val sortMode = if (parts.length > 2) parts(2) else "nosort"
        val start = i + 1
        i = start
        val sql = new StringBuilder
        while (i < lines.length && lines(i).trim != "----") {
          sql.append(lines(i)).append('\n'); i += 1
        }
        i += 1 // skip ----
        val expected = Vector.newBuilder[String]
        while (i < lines.length && lines(i).trim.nonEmpty) {
          expected += lines(i); i += 1
        }
        out += Record(Query(sortMode), sql.toString.trim, expected.result(),
          onlyIf, skipIf, start)
        resetCond()
      } else {
        fail(s"$path:$i: unparseable slt line: $line")
      }
    }
    out.result()
  }

  // -- divergence overrides -------------------------------------------------

  /** sql-substring → replacement expected rows. */
  private val expectedOverrides: Seq[(String, Seq[String])] = Seq(
    // reference negate bug (SURVEY §2.8): correct date subtraction
    "select date '1998-12-01' - interval '1' day" -> Seq("1998-11-30"),
    // int/int division: the reference's arrow divide kernel truncates to
    // int (arithmetic_function.rs per-type overloads); this engine keeps
    // ANSI/Spark/DuckDB semantics where `/` returns double — the driver's
    // DuckDB oracle gate depends on it
    "select a/a from test" -> Seq("1.0", "1.0", "1.0", "NULL"))

  // -- value rendering ------------------------------------------------------

  /** Render one value the way the reference's slt comparison sees it
    * (arrow display + sqllogictest NULL/(empty) conventions).
    */
  private def render(v: Any): String = v match {
    case null => "NULL"
    case "" => "(empty)"
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case f: Float => render(f.toDouble)
    case d: Double =>
      if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15 &&
        d.toString.endsWith(".0")) d.toLong.toString + ".0"
      else d.toString
    case other => other.toString
  }

  private def renderRow(r: Row): String =
    r.toSeq.map(render).mkString(" ")

  /** Whitespace-normalize an expected line (the corpus aligns columns with
    * extra spaces, e.g. insert_table.slt:66).
    */
  private def norm(s: String): String = s.trim.split("\\s+").mkString(" ")

  // -- execution ------------------------------------------------------------

  private def freshEngine(withFixtures: Boolean): GraftEngine = {
    val e = new GraftEngine(spark)
    // engines share the session: drop temp views left by earlier files so
    // a fresh catalog cannot resolve stale tables (missing-table bugs would
    // otherwise silently pass against leftover views)
    e.resetCatalog()
    if (withFixtures) {
      Files.list(refRoot.resolve("tests/csv")).iterator().asScala
        .filter(_.toString.endsWith(".csv"))
        .toSeq.sortBy(_.toString)
        .foreach { p =>
          val name = p.getFileName.toString.stripSuffix(".csv")
          e.createCsvTable(name, p.toString)
        }
    }
    e
  }

  private def runFile(path: Path, engineName: String): Unit = {
    val engine = freshEngine(withFixtures = engineName != "sqlrs_v2")
    var ran = 0
    parse(path).foreach { rec =>
      val skip =
        rec.onlyIf.exists(_ != engineName) ||
          rec.skipIf.contains(engineName)
      if (!skip) {
        // corpus paths are relative to the reference repo root
        val sql = rec.sql.replace("'tests/", s"'$refRoot/tests/")
        rec.kind match {
          case StatementOk =>
            try engine.run(sql).collect()
            catch {
              case e: Throwable =>
                fail(s"$path:${rec.line} [$engineName] statement failed: $sql\n$e")
            }
            ran += 1
          case Query(_) =>
            val got =
              try engine.run(sql).collect().toSeq.map(renderRow)
              catch {
                case e: Throwable =>
                  fail(s"$path:${rec.line} [$engineName] query failed: $sql\n$e")
              }
            val expected = expectedOverrides
              .collectFirst { case (k, v) if sql.toLowerCase.startsWith(k) => v }
              .getOrElse(rec.expected)
            assert(
              got.map(norm).sorted == expected.map(norm).sorted,
              s"\n$path:${rec.line} [$engineName]\nsql: $sql\n" +
                s"got:\n  ${got.map(norm).sorted.mkString("\n  ")}\n" +
                s"expected:\n  ${expected.map(norm).sorted.mkString("\n  ")}")
            ran += 1
          case StatementError =>
            val failed =
              try { engine.run(sql).collect(); false }
              catch { case _: Throwable => true }
            assert(failed,
              s"$path:${rec.line} [$engineName] statement expected to error " +
                s"but succeeded: $sql")
            ran += 1
        }
      }
    }
    info(s"$engineName: $ran records")
  }

  // -- one test per (file, engine) like the reference harness ---------------

  private val sltFiles: Seq[Path] =
    Files.walk(sltDir).iterator().asScala
      .filter(_.toString.endsWith(".slt")).toSeq.sortBy(_.toString)

  sltFiles.foreach { f =>
    val name = f.getFileName.toString.stripSuffix(".slt")
    test(s"slt $name (v1 fixtures)") { runFile(f, "sqlrs") }
    test(s"slt $name (v2 fresh catalog)") { runFile(f, "sqlrs_v2") }
  }
}
