package graft.engine

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The sqlrs-compatible engine surface: an embedded SQL session over Spark.
  *
  * Mirrors the reference's two entry points — v1 `Database::run`
  * (/root/reference/src/db.rs:107) and v2 `ClientContext::query`
  * (/root/reference/src/main_entry/client_context.rs:76) — as one `run(sql)`
  * on top of `spark.sql`, plus the statement surface Spark temp views don't
  * give us directly:
  *
  *  - CREATE TABLE (explicit columns, incl. UNSIGNED widening per SURVEY
  *    §1.2) and CTAS (bind_create.rs:13-51)
  *  - INSERT INTO ... VALUES / SELECT with column reorder + implicit cast
  *    (bind_insert.rs:1-111); temp views are immutable so inserts
  *    union-and-replace the view (the reference's LocalStorage append,
  *    local_storage.rs:100-125, is likewise an in-memory table swap)
  *  - COPY t FROM 'f.csv' (DELIMITER, HEADER) — rewritten to INSERT INTO t
  *    SELECT * FROM read_csv(...), reproducing the reference's SQL-to-SQL
  *    rewrite (bind_copy.rs:10-35)
  *  - read_csv('path', header=>..., delim=>...) table function
  *    (read_csv.rs:17-42) and bare `FROM 'file.csv'` auto-binding
  *    (bind_base_table_ref.rs:98-118)
  *  - SHOW TABLES / DESCRIBE / EXPLAIN pragmas and the sqlrs_tables() /
  *    sqlrs_columns() introspection TVFs (sqlrs_tables.rs, sqlrs_columns.rs)
  *  - select-list aliases usable in WHERE (bind_select_node.rs:98-131) via
  *    an analysis-failure-driven rewrite
  *
  * Every SELECT still goes through Catalyst untouched — the engine adds
  * statement routing, never its own execution path, so plans stay fully
  * optimizable and distributed.
  */
class GraftEngine(val spark: SparkSession) {

  /** name → current DataFrame; the catalog (reference: TableCatalog,
    * src/catalog/mod.rs:36-43). Temp views mirror every entry so SQL sees
    * them.
    */
  private val tables = mutable.LinkedHashMap.empty[String, DataFrame]

  /** INSERTs per table since creation; drives the plan-lineage collapse in
    * [[insertInto]].
    */
  private val insertCounts = mutable.Map.empty[String, Int]
  private val CollapseEvery = 32

  private def register(name: String, df: DataFrame): Unit = {
    tables(name.toLowerCase) = df
    df.createOrReplaceTempView(name.toLowerCase)
  }

  def table(name: String): DataFrame = tables(name.toLowerCase)
  def tableNames: Seq[String] = tables.keys.toSeq

  /** Drop every temp view in the session and clear this engine's catalog.
    * Engines share one SparkSession; without this, a "fresh" engine still
    * resolves temp views registered by earlier engines through spark.sql —
    * fresh-catalog semantics (the reference's per-Database isolation,
    * src/db.rs:107) need an explicit sweep.
    */
  def resetCatalog(): Unit = {
    spark.catalog.listTables().collect()
      .filter(_.isTemporary)
      .foreach(t => spark.catalog.dropTempView(t.name))
    tables.clear()
    insertCounts.clear()
  }

  // ---- sources ----------------------------------------------------------

  /** CSV file → named table. Column names lowercased like the reference's
    * inference (src/storage/csv.rs:148).
    */
  def createCsvTable(name: String, path: String): Unit = {
    val df = readCsv(path, header = true, delim = ",")
    register(name, df)
  }

  /** read_csv(path, header=>, delim=>) parity (read_csv.rs:31-42). */
  def readCsv(path: String, header: Boolean, delim: String): DataFrame = {
    val df = spark.read
      .option("header", header.toString)
      .option("inferSchema", "true")
      .option("delimiter", delim)
      .csv(path)
    val renamed = if (header) {
      df.toDF(df.columns.map(_.toLowerCase): _*)
    } else {
      // reference names headerless columns column_1.. (Arrow convention);
      // Spark uses _c0.. — rename to match
      df.toDF(df.columns.indices.map(i => s"column_${i + 1}"): _*)
    }
    // Arrow's CSV reader (reference src/storage/csv.rs) parses an empty
    // cell in a string column as "" — Spark parses NULL. Align with the
    // reference (golden: tests/slt/select.slt renders `(empty)`, not NULL).
    renamed.select(renamed.schema.fields.map { f =>
      if (f.dataType == StringType)
        coalesce(col(s"`${f.name}`"), lit("")).as(f.name)
      else col(s"`${f.name}`")
    }.toIndexedSeq: _*)
  }

  /** Parquet file → named table (extension beyond the reference's
    * CSV-only sources — the training-pipeline tables are parquet, and a
    * columnar source is what a 100 TB scan actually reads; pushdown and
    * pruning reach the parquet footer where CSV cannot).
    */
  def createParquetTable(name: String, path: String): Unit =
    register(name, readParquet(path))

  /** `read_parquet(path)` TVF body: lowercase column names like the CSV
    * inference path; parquet carries real NULLs and its own schema, so no
    * empty-string coalescing and no inference options apply.
    */
  def readParquet(path: String): DataFrame = {
    val df = spark.read.parquet(path)
    df.toDF(df.columns.map(_.toLowerCase): _*)
  }

  /** `read_json(path)` TVF body (extension — JSON lines, the log/event
    * interchange format a pipeline ingests before columnarizing):
    * schema inferred per Spark's JSONL reader, column names lowercased
    * like the CSV/parquet paths. Real NULLs, no coalescing.
    */
  def readJson(path: String): DataFrame = {
    val df = spark.read.json(path)
    df.toDF(df.columns.map(_.toLowerCase): _*)
  }

  /** `COPY <table | (subquery)> TO 'path' (opts)` — the write sink
    * (extension: the reference REJECTS copy-to, bind_copy.rs:77-79; an
    * engine without a sink can't feed a pipeline). Spark-native semantics:
    * the target is a DIRECTORY of part files — the only layout that works
    * when 1000 executors write 100 TB — with options for the knobs that
    * matter at scale:
    *   FORMAT csv|parquet        (default: by path extension, else parquet)
    *   HEADER false              (csv; default true, mirroring COPY FROM)
    *   DELIMITER 'c'             (csv; default ',')
    *   PARTITION_BY (col, ...)   (hive-style subdirectories — partition
    *                              pruning for every downstream reader)
    *   SORT_BY (col, ...)        (range-partition + sort before writing:
    *                              tight, pairwise-disjoint file/row-group
    *                              min/max stats, so downstream range
    *                              predicates skip whole files)
    *   MAX_RECORDS_PER_FILE n    (bounds file size so a skewed partition
    *                              never produces one giant file)
    * Overwrites like the reference's CSV-writing kin (DuckDB COPY TO).
    */
  /** COPY ... TO routing. The `TO` keyword is located mask-aware at paren
    * depth 0 outside string literals, so a subquery source containing the
    * text `to '` (in a literal or nested select) can never mis-split the
    * statement the way a lazy regex would.
    */
  private def runCopyTo(sql: String): DataFrame = {
    val copyPos = topLevelKeyword(sql, "copy", 0).getOrElse(
      throw new IllegalArgumentException(s"not a COPY statement: $sql"))
    val toPos = topLevelKeyword(sql, "to", copyPos + 4).getOrElse(
      throw new IllegalArgumentException(s"unsupported COPY statement: $sql"))
    val src = sql.substring(copyPos + 4, toPos).trim
    val TailRe = """(?s)\s*'([^']+)'\s*(?:\((.*)\))?\s*""".r
    sql.substring(toPos + 2) match {
      case TailRe(path, opts) =>
        copyTo(src, path, Option(opts).getOrElse("")); emptyOk
      case _ => throw new IllegalArgumentException(
        s"COPY TO expects 'path' (options): $sql")
    }
  }

  def copyTo(src: String, path: String, opts: String): Unit = {
    var df =
      if (src.trim.startsWith("(") && src.trim.endsWith(")"))
        runSelect(src.trim.stripPrefix("(").stripSuffix(")"))
      else runSelect(s"select * from ${src.trim}")
    // BUCKET_BY (col, ...) [BUCKETS n] [BUCKET_TABLE name]: the bucketed
    // co-located-join layout (operators.Bucketing) through the SQL front
    // door. A bucketed write is a catalog table by construction (the scan
    // must report the bucket distribution to drop join exchanges), so it
    // registers `name` (default: the path's last segment, sanitized) in
    // the session catalog with data at `path`, parquet only, and owns the
    // layout outright — SORT_BY (buckets sort by their keys already) and
    // PARTITION_BY don't compose with it here and error instead of
    // silently interacting.
    val bucketBy = """(?i)bucket_by\s*\(([^)]*)\)""".r.findFirstMatchIn(opts)
    bucketBy.foreach { m =>
      val keys = m.group(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      require(keys.nonEmpty, "COPY TO: BUCKET_BY names no columns")
      for (bad <- Seq("sort_by", "partition_by"))
        require(!s"(?i)$bad".r.findFirstIn(opts).isDefined,
          s"COPY TO: BUCKET_BY does not combine with ${bad.toUpperCase} " +
            "(buckets are parquet, sorted by their keys)")
      // the FORMAT value is PARSED, not substring-matched: a literal
      // "format csv" guard let `FORMAT  CSV` (extra whitespace) or
      // `format 'csv'` slip through and silently write parquet buckets,
      // dropping the user's format with no error
      """(?i)format\s+'?(\w+)'?""".r.findFirstMatchIn(opts).foreach { f =>
        require(f.group(1).equalsIgnoreCase("parquet"),
          s"COPY TO: BUCKET_BY does not combine with FORMAT " +
            s"${f.group(1).toUpperCase} (buckets are parquet, sorted by " +
            "their keys)")
      }
      val buckets = """(?i)buckets\s+(\d+)""".r.findFirstMatchIn(opts)
        .map(_.group(1).toInt).getOrElse(8)
      require(buckets >= 1 && buckets <= 100000,
        s"COPY TO: BUCKETS must be in [1, 100000], got $buckets")
      val tname = """(?i)bucket_table\s+(\w+)""".r.findFirstMatchIn(opts)
        .map(_.group(1).toLowerCase)
        .getOrElse(path.split('/').filter(_.nonEmpty).lastOption
          .map(_.replaceAll("[^A-Za-z0-9_]", "_").toLowerCase)
          .getOrElse(throw new IllegalArgumentException(
            s"COPY TO: cannot derive a bucket table name from '$path' — " +
              "pass BUCKET_TABLE name")))
      graft.operators.Bucketing.writeBucketed(df, tname, path, buckets, keys)
    }
    if (bucketBy.isDefined) return
    """(?i)sort_by\s*\(([^)]*)\)""".r.findFirstMatchIn(opts).foreach { m =>
      val cols = m.group(1).split(",").map(c => col(c.trim)).toIndexedSeq
      // explicit partition count: a user-specified repartition is final
      // (AQE would otherwise coalesce small range partitions back into
      // one file, defeating the layout)
      val n = spark.sessionState.conf.numShufflePartitions
      df = df.repartitionByRange(n, cols: _*).sortWithinPartitions(cols: _*)
    }
    val lower = path.toLowerCase
    val fmt = """(?i)format\s+(\w+)""".r.findFirstMatchIn(opts)
      .map(_.group(1).toLowerCase)
      .getOrElse(
        if (lower.endsWith(".csv")) "csv"
        else if (lower.endsWith(".parquet")) "parquet"
        else "parquet")
    var w = df.write.mode("overwrite")
    """(?i)partition_by\s*\(([^)]*)\)""".r.findFirstMatchIn(opts).foreach { m =>
      w = w.partitionBy(m.group(1).split(",").map(_.trim).filter(_.nonEmpty).toIndexedSeq: _*)
    }
    """(?i)max_records_per_file\s+(\d+)""".r.findFirstMatchIn(opts).foreach { m =>
      w = w.option("maxRecordsPerFile", m.group(1))
    }
    fmt match {
      case "csv" =>
        val delim = """(?i)delimiter\s+'([^']+)'""".r
          .findFirstMatchIn(opts).map(_.group(1)).getOrElse(",")
        val header = """(?i)header\s+false""".r.findFirstIn(opts).isEmpty
        w.option("header", header.toString).option("delimiter", delim).csv(path)
      case "parquet" => w.parquet(path)
      case "json" => w.json(path)
      case other => throw new IllegalArgumentException(
        s"unsupported COPY TO format: $other (csv|parquet|json)")
    }
  }

  /** In-memory table from explicit rows (tests / VALUES). */
  def createTable(name: String, schema: StructType, rows: Seq[Row] = Seq.empty): Unit =
    register(name, spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema))

  // ---- statement router ---------------------------------------------------

  private val CreateTableRe =
    """(?is)\s*create\s+table\s+(\w+)\s*\((.+)\)\s*""".r
  private val CtasRe =
    """(?is)\s*create\s+table\s+(\w+)\s+as\s+(select\b.*)""".r
  private val InsertValuesRe =
    """(?is)\s*insert\s+into\s+(\w+)\s*(\(([^)]*)\))?\s*(values\b.*)""".r
  private val InsertSelectRe =
    """(?is)\s*insert\s+into\s+(\w+)\s*(\(([^)]*)\))?\s*(select\b.*)""".r
  private val CopyRe =
    """(?is)\s*copy\s+(\w+)\s+from\s+'([^']+)'\s*(?:\((.*)\))?\s*""".r
  private val CopyAnyRe = """(?is)\s*copy\s+.*""".r
  private val ShowTablesRe = """(?is)\s*show\s+tables\s*""".r
  private val GraftReleaseRe = """(?is)\s*graft_release\s*(?:\(\s*\))?\s*""".r
  private val DescribeRe = """(?is)\s*describe\s+(\w+)\s*""".r
  private val ExplainRe = """(?is)\s*explain\s+(.*)""".r
  private val ReadCsvCallRe =
    """(?i)read_csv\s*\(\s*'([^']+)'\s*(?:,\s*([^)]*))?\)""".r
  private val BareCsvFromRe = """(?i)(from\s+)'([^']+\.csv)'""".r
  private val ReadParquetCallRe =
    """(?i)read_parquet\s*\(\s*'([^']+)'\s*\)""".r
  private val BareParquetFromRe = """(?i)(from\s+)'([^']+\.parquet)'""".r
  private val ReadJsonCallRe =
    """(?i)read_json\s*\(\s*'([^']+)'\s*\)""".r
  private val BareJsonFromRe = """(?i)(from\s+)'([^']+\.jsonl?)'""".r
  private val GraftTvfRe =
    """(?i)\bgraft_(topk|dedup_pairs|decontaminate|pagerank|hits|bpe_merges|radius|louvain_levels|louvain|incremental_dedup|incremental_minhash|knn_label|semantic_decon|asof|unigram_lm|unigram_encode|ivf_append|components_index|components|license_propagation|split_leakage|span_excise|index_delete|index_merge|components_delete|byte_bpe_merges|byte_encode|secret_scrub_incremental|secret_scrub|secret_frequencies|retention_expiry|unigram_em|hyperball|harmonic|takedown_audit|curriculum_delete_buffered)\s*\(([^()]*)\)""".r
  private val OffsetLimitRe = """(?is)\boffset\s+(\d+)\s+limit\s+(\d+)""".r
  private val SqlrsTablesCallRe = """(?i)sqlrs_tables\s*\(\s*\)""".r
  private val SqlrsColumnsCallRe = """(?i)sqlrs_columns\s*\(\s*\)""".r

  /** Execute one or more `;`-separated statements; returns the LAST
    * statement's DataFrame (DDL/DML return an empty result, like the
    * reference's ok-statements). The reference's v2 entry loops over every
    * parsed statement in the input (client_context.rs:76-97), so pasting
    * `create ...; insert ...;` into the CLI must work — the split is
    * string-literal-aware, so a `;` inside '...' never splits.
    */
  def run(sql0: String): DataFrame = {
    val stmts = splitStatements(sql0)
    if (stmts.isEmpty) emptyOk
    else stmts.map(runStatement).last
  }

  /** Per-character "active code" mask: false inside single-quoted string
    * literals (backslash and doubled-quote escapes), backtick-quoted
    * identifiers, `--` line comments, and block comments. Every
    * statement-text scanner below consults this ONE automaton instead of
    * tracking literal state itself, so escape rules cannot drift between
    * scanners (a `;` in a comment must not split a statement exactly like
    * a `;` in a string must not).
    */
  /** One-entry memo: statement routing calls the scanners up to ~12 times
    * on the SAME string reference (clause seeks in the alias rewrite), so
    * reference-equality caching removes the redundant rescans. The engine
    * is single-threaded per instance (like the mutable catalog map).
    */
  private var maskMemo: (String, Array[Boolean]) = ("", Array.empty)

  private def codeMask(s: String): Array[Boolean] = {
    if (maskMemo._1 eq s) maskMemo._2
    else { val m = computeCodeMask(s); maskMemo = (s, m); m }
  }

  private def computeCodeMask(s: String): Array[Boolean] = {
    val n = s.length
    val mask = new Array[Boolean](n) // default false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\'') {
        i += 1
        var closed = false
        while (i < n && !closed) {
          val d = s.charAt(i)
          if (d == '\\' && i + 1 < n) i += 2
          else if (d == '\'' && i + 1 < n && s.charAt(i + 1) == '\'') i += 2
          else if (d == '\'') { i += 1; closed = true }
          else i += 1
        }
      } else if (c == '`') {
        i += 1
        while (i < n && s.charAt(i) != '`') i += 1
        if (i < n) i += 1
      } else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
      } else {
        mask(i) = true
        i += 1
      }
    }
    mask
  }

  /** Split a multi-statement block on active-code semicolons; drops empty
    * fragments (so a single trailing `;` is a no-op, not an empty
    * statement). Comments and quoted text travel with their statement.
    */
  private[graft] def splitStatements(sql: String): Seq[String] = {
    val mask = codeMask(sql)
    val out = Vector.newBuilder[String]
    // a statement starts at its first ACTIVE non-whitespace char: leading
    // comments are routing noise (`-- note\ninsert …` must route as an
    // INSERT); a fragment that is pure comment is no statement at all
    def emit(start: Int, end: Int): Unit = {
      var s = start
      while (s < end && !(mask(s) && !sql.charAt(s).isWhitespace)) s += 1
      val stmt = sql.substring(s, end).trim
      if (stmt.nonEmpty) out += stmt
    }
    var start = 0
    var i = 0
    while (i < sql.length) {
      if (mask(i) && sql.charAt(i) == ';') { emit(start, i); start = i + 1 }
      i += 1
    }
    emit(start, sql.length)
    out.result()
  }

  private def runStatement(sql: String): DataFrame = sql match {
    case GraftReleaseRe() =>
      // the SQL-surface release path for serving-TVF scratch state: the
      // dedup/BPE TVFs pin tracked persisted frames per call (the caches
      // their plans reuse WITHIN one execution), and a long-lived session
      // would otherwise accumulate them without bound. Releases CACHES
      // only — always safe, Spark recomputes a released cache if a plan
      // re-executes. Checkpoint blocks are deliberately NOT released: a
      // checkpointed plan has no lineage to recompute from, so releasing
      // them would break a still-registered view/CTAS over a fixpoint
      // result.
      graft.operators.Dedup.releaseCaches()
      emptyOk
    case ShowTablesRe() => showTables()
    case DescribeRe(t) => describe(t)
    case ExplainRe(q) => explainDf(q)
    case CtasRe(name, select) =>
      requireNotExists(name)
      register(name, runSelect(select)); emptyOk
    case CreateTableRe(name, cols) =>
      requireNotExists(name)
      createTable(name, parseSchema(cols)); emptyOk
    case CopyRe(t, path, opts) =>
      // the reference rewrites COPY to INSERT..SELECT over read_csv
      // (bind_copy.rs:10-35); same rewrite here. Header defaults to true
      // like read_csv (tests/slt/csv/csv.slt: state1.csv's header row is
      // skipped without any HEADER option); `HEADER false` disables.
      val o = Option(opts).getOrElse("")
      if (path.toLowerCase.endsWith(".parquet")) {
        // columnar twin of the rewrite (extension; COPY in the reference
        // is CSV-only) — same INSERT..SELECT shape over read_parquet
        insertInto(t, None, readParquet(path))
      } else {
        val delim = """(?i)delimiter\s+'([^']+)'""".r
          .findFirstMatchIn(o).map(_.group(1)).getOrElse(",")
        val header = """(?i)header\s+false""".r.findFirstIn(o).isEmpty
        insertInto(t, None, readCsv(path, header, delim))
      }
      emptyOk
    case CopyAnyRe() => runCopyTo(sql) // COPY FROM already matched above
    case InsertValuesRe(t, _, colList, values) =>
      insertInto(t, Option(colList), spark.sql(s"select * from $values"))
      emptyOk
    case InsertSelectRe(t, _, colList, select) =>
      insertInto(t, Option(colList), runSelect(select)); emptyOk
    case _ => runSelect(sql)
  }

  /** SELECT path: TVF/bare-CSV rewrites, catalog refresh for the
    * introspection views, then Catalyst; alias-in-WHERE repair on
    * unresolved-column failures.
    */
  private def runSelect(sql0: String): DataFrame = {
    var sql = sql0
    requireFromSubqueryAlias(sql)
    // sqlparser-rs accepts OFFSET before LIMIT (tests/slt/order.slt:2);
    // Spark's parser requires LIMIT first — swap the clause order
    // (mask-aware like every other rewrite: the phrase inside a string
    // literal must not be reordered)
    sql = maskedReplace(sql, OffsetLimitRe) { m =>
      s"limit ${m.group(2)} offset ${m.group(1)}"
    }
    if (sql.toLowerCase.contains("sqlrs_tables") ||
      sql.toLowerCase.contains("sqlrs_columns")) {
      sqlrsTables().createOrReplaceTempView("sqlrs_tables")
      sqlrsColumns().createOrReplaceTempView("sqlrs_columns")
      sql = maskedReplace(sql, SqlrsTablesCallRe)(_ => "sqlrs_tables")
      sql = maskedReplace(sql, SqlrsColumnsCallRe)(_ => "sqlrs_columns")
    }
    // read_csv('p', named=>args) table function → materialized temp view
    var idx = 0
    // per-call scratch views (__read_*/__graft_*): tracked and dropped
    // once the statement's DataFrame is analyzed — spark.sql resolves
    // and INLINES temp views at analysis time, so the result does not
    // reference them afterwards, and a long-lived serving session must
    // not accumulate one stale view (pinning its eagerly-resolved
    // DataFrame) per TVF call. The bare-FROM stem views stay: their
    // names are user-facing (qualified references bind to them).
    val scratchViews = Seq.newBuilder[String]
    sql = maskedReplace(sql, ReadCsvCallRe) { m =>
      val path = m.group(1)
      val opts = Option(m.group(2)).getOrElse("")
      val header = """(?i)header\s*=>\s*true""".r.findFirstIn(opts).isDefined ||
        !opts.toLowerCase.contains("header")
      val delim = """(?i)delim\s*=>\s*'([^']+)'""".r
        .findFirstMatchIn(opts).map(_.group(1)).getOrElse(",")
      idx += 1
      val view = s"__read_csv_$idx"
      readCsv(path, header, delim).createOrReplaceTempView(view)
      scratchViews += view
      view
    }
    // bare `FROM 'file.csv'` auto-binds to read_csv (defaults: header on).
    // The relation is named after the file stem so qualified references
    // work — `select t1.a from 'tests/csv/t1.csv'` binds t1 to the file
    // (bind_base_table_ref.rs:98-118 does the same).
    sql = maskedReplace(sql, BareCsvFromRe) { m =>
      val stem = m.group(2).split("/").last.stripSuffix(".csv")
        .replaceAll("[^A-Za-z0-9_]", "_")
      val view = if (stem.headOption.exists(c => c.isLetter || c == '_')) stem
        else s"csv_$stem"
      readCsv(m.group(2), header = true, delim = ",").createOrReplaceTempView(view)
      m.group(1) + view
    }
    // read_parquet('p') TVF and bare `FROM 'file.parquet'` — the columnar
    // twin of the CSV surface above (extension; the reference is CSV-only)
    sql = maskedReplace(sql, ReadParquetCallRe) { m =>
      idx += 1
      val view = s"__read_parquet_$idx"
      readParquet(m.group(1)).createOrReplaceTempView(view)
      scratchViews += view
      view
    }
    sql = maskedReplace(sql, BareParquetFromRe) { m =>
      val stem = m.group(2).split("/").last.stripSuffix(".parquet")
        .replaceAll("[^A-Za-z0-9_]", "_")
      val view = if (stem.headOption.exists(c => c.isLetter || c == '_')) stem
        else s"parquet_$stem"
      readParquet(m.group(2)).createOrReplaceTempView(view)
      m.group(1) + view
    }
    // read_json('p') TVF and bare `FROM 'file.json[l]'` — the log/event
    // ingest surface (extension; same rewrite shape as csv/parquet)
    sql = maskedReplace(sql, ReadJsonCallRe) { m =>
      idx += 1
      val view = s"__read_json_$idx"
      readJson(m.group(1)).createOrReplaceTempView(view)
      scratchViews += view
      view
    }
    sql = maskedReplace(sql, BareJsonFromRe) { m =>
      val stem = m.group(2).split("/").last
        .stripSuffix(".jsonl").stripSuffix(".json")
        .replaceAll("[^A-Za-z0-9_]", "_")
      val view = if (stem.headOption.exists(c => c.isLetter || c == '_')) stem
        else s"json_$stem"
      readJson(m.group(2)).createOrReplaceTempView(view)
      m.group(1) + view
    }
    // graft_* serving TVFs — the top extension operators surfaced through
    // the SQL front door the way read_csv/read_parquet are (the reference
    // is a SQL engine, client_context.rs:76 — a serving operator you can't
    // reach from SQL isn't part of its user surface). Same rewrite shape:
    // the call materializes as a temp view over the operator's DataFrame.
    // ACTIVE-CODE ONLY: graftTvf eagerly resolves tables/paths, so a TVF
    // mention inside a string literal or comment must pass through
    // untouched instead of erroring on (or corrupting into) a view name.
    // FIXPOINT: TVF calls COMPOSE — graft_license_propagation(
    // graft_components(docs), docs, rank => r) — and the argument regex
    // is paren-free, so an outer call only becomes matchable after the
    // pass that rewrites its inner call into a view name; loop until no
    // call rewrites (bounded: every pass consumes ≥ 1 call or stops).
    var tvfPrev: String = null
    while (tvfPrev != sql) {
      tvfPrev = sql
      sql = maskedReplace(sql, GraftTvfRe) { m =>
        idx += 1
        val view = s"__graft_${m.group(1).toLowerCase}_$idx"
        graftTvf(m.group(1), m.group(2)).createOrReplaceTempView(view)
        scratchViews += view
        view
      }
    }
    val df =
      try spark.sql(sql)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("UNRESOLVED_COLUMN") =>
          rewriteAliasInWhere(sql).map(spark.sql).getOrElse(throw e)
      }
      finally scratchViews.result().foreach(spark.catalog.dropTempView)
    rejectVarcharNumericComparison(df)
    df
  }

  /** Literal/comment-safe regex rewrite: the replacement applies only to
    * matches STARTING in active code (per [[codeMask]]) — a TVF call or
    * file path mentioned inside a string literal or a comment passes
    * through verbatim instead of being eagerly resolved or corrupted
    * into a view name. Every source rewrite in [[runSelect]] goes
    * through this one helper so literal-safety cannot drift per rewrite.
    */
  private def maskedReplace(sql: String, re: scala.util.matching.Regex)(
      f: scala.util.matching.Regex.Match => String): String = {
    val mask = codeMask(sql)
    re.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(
        if (m.start < mask.length && !mask(m.start)) m.matched else f(m)))
  }

  /** One graft_* serving-TVF call → the operator's DataFrame.
    * Relation arguments are either a single-quoted parquet path
    * (`'/data/docs.parquet'`) or a bare table/view name from this
    * engine's catalog; scalar options use the `name => value` TVF
    * convention read_csv already follows.
    *
    *  - `graft_topk(corpus, queries, k => 10)` — exact cosine top-k
    *    over (vec_id, embedding) relations → (query_id, neighbor_id,
    *    sim, rank), served by the bounded-heap TopKPerKey operator.
    *  - `graft_dedup_pairs(docs, threshold => 0.8)` — MinHash-LSH
    *    near-duplicate pairs over (doc_id, text), exact-Jaccard
    *    verified → (i, j).
    *  - `graft_decontaminate(corpus, eval, n => 8)` — eval-set n-gram
    *    contamination flags over (doc_id, text) → (doc_id, n_shared).
    *  - `graft_pagerank(pairs, iters => 3, damping => 0.85,
    *    dangling => false)` — PageRank over a (doc_a, doc_b) pair
    *    relation; vertices are the pairs' distinct endpoints →
    *    (doc_id, r).
    *  - `graft_hits(pairs, iters => 2)` — integer-exact unnormalized
    *    HITS over a directed (doc_a, doc_b) pair relation; vertices are
    *    the pairs' distinct endpoints → (doc_id, auth, hub).
    *  - `graft_bpe_merges(docs, rounds => 2)` — distributed BPE merge
    *    learning over (doc_id, text) → (round, a, b, cnt, n_syms).
    *  - `graft_radius(corpus, queries, tau => 0.3)` — radius (range)
    *    retrieval over (vec_id, embedding) relations: every corpus
    *    vector within cosine ≥ tau of each query → (query_id,
    *    neighbor_id, sim); no heap — the output is radius-bounded.
    *    Self-pairs (equal vec_id) are excluded, the graft_topk
    *    convention — re-key one side when probing with a distinct
    *    query relation whose id space overlaps the corpus.
    *  - `graft_louvain(pairs)` — one Louvain-style greedy merge round
    *    over a (doc_a, doc_b) pair relation; vertices are the pairs'
    *    distinct endpoints → (doc_id, comm, gain_num).
    *  - `graft_louvain_levels(pairs, levels => 2)` — FULL multi-level
    *    Louvain over a (doc_a, doc_b) pair relation: per-level mutual
    *    best-pair coarsening with the exact integer ΔQ score →
    *    (lvl, n_comms, l_in, q_ppm), one row per level including the
    *    all-singletons level 0. Runs its per-level checkpoint rounds
    *    when executed (the g9 fixpoint posture); levels is capped at 4
    *    by the operator.
    *  - `graft_incremental_dedup(base, probe, num => 4, den => 5)` —
    *    snapshot-probe dedup over (doc_id, text, lang) relations: per
    *    probe doc, how many base docs it near-duplicates at word
    *    Jaccard ≥ num/den → (doc_id, n_dups, first_dup, is_new); the
    *    base never self-joins.
    *  - `graft_incremental_minhash(base, probe, num => 4, den => 5)` —
    *    the same snapshot-probe contract in the SHINGLE domain over
    *    (doc_id, text) relations: a MinHash band index is built from
    *    the base (persist the base index via the Scala
    *    `Dedup.minhashIndex` for repeated serving), the probe joins it
    *    on (band, bucket), and the exact integer verify decides →
    *    (doc_id, n_dups, first_dup, is_new).
    *  - `graft_unigram_lm(docs, vocab => 2048)` — SentencePiece-style
    *    unigram-LM tokenizer TRAINING over a (doc_id, text) relation
    *    (Kudo ACL'18, the u6 operator): substring-seeded vocabulary,
    *    relational Viterbi E-step, usage-pruned M-step → (piece,
    *    n_uses), single chars always kept. Runs its per-round
    *    checkpoint jobs when executed (the louvain_levels posture —
    *    a trainer, not a serving query).
    *  - `graft_byte_bpe_merges(docs, rounds => 2)` — distributed
    *    BYTE-level BPE merge learning over a (doc_id, text) relation
    *    (the u11 operator: GPT-2 byte→printable remap, per-round
    *    pair-count aggregate + one-row argmax + fold) →
    *    (round, a, b, cnt, n_syms). Runs its per-round persisted jobs
    *    when executed (a trainer, not a serving query).
    *  - `graft_byte_encode(docs, merges)` — byte-level BPE APPLICATION
    *    (the u10 operator): rank-greedy segment every doc under the
    *    FIXED (round, a, b) merge relation (round = BPE rank) →
    *    (doc_id, n_words, n_bytes, n_subwords, spw_ppm, bps_ppm); the
    *    table collects driver-side (bounded), the corpus pass is
    *    map-only. Composes: graft_byte_encode(docs,
    *    graft_byte_bpe_merges(docs, rounds => 3)).
    *  - `graft_unigram_encode(docs, pieces, char_cost => 6145)` —
    *    unigram-LM tokenizer APPLICATION (the u7 operator): Viterbi-
    *    segment every doc of a (doc_id, text) relation under the FIXED
    *    piece table given by the (piece, cost) relation, single
    *    characters always available at char_cost → (doc_id, n_words,
    *    n_pieces, ppw_ppm); docs with no words are omitted. The piece
    *    table collects driver-side (bounded — the codegen reference-
    *    object discipline), so the corpus pass is map-only.
    *  - `graft_components(docs, n => 1, threshold => 0.95)` — the d8
    *    near-dup closure as a front door: exact-duplicate clique
    *    collapse, exact n-gram-Jaccard pairs within a language, min-label
    *    connected components; returns `(doc_id, rep)` — the component
    *    map the governance TVFs consume.
    *  - `graft_license_propagation(comp, docs, rank => class_col)` —
    *    most-restrictive-class-governs over components: `(doc_id, rep,
    *    own_rank, comp_rank, n_members, upgraded)`.
    *  - `graft_split_leakage(comp, split)` — near-dup components
    *    straddling train/val/test: every member of a multi-split
    *    component is flagged.
    *  - `graft_span_excise(docs, n => 8, keep_one => false)` —
    *    duplicated-span surgery: cross-document n-token spans excise
    *    from every document (keep_one => true keeps the canonical
    *    (doc_id, pos)-minimum occurrence — the ACL'22 all-but-one
    *    rule); documents are KEPT, returning `(doc_id, n_tokens,
    *    n_removed, clean_text)`.
    *  - `graft_index_delete(index, revoked, kind => 'span', n => 8)` —
    *    TAKEDOWN across the persisted serving indexes (the d23
    *    compliance family): removes a revoked-document set's
    *    contribution from a persisted index relation without a
    *    rebuild. kind: 'span' (counted span-hash index; revoked
    *    carries doc_id + text), 'postings' (unbanded tf-idf postings),
    *    'minhash' (uncapped band index), 'prefix' (streaming prefix
    *    index), 'ivf' (member table keyed by vec_id), 'secrets' (the
    *    t27 candidate-frequency index; revoked carries doc_id + text,
    *    run => the digit-run length), 'components' (the near-dup graph
    *    store from graft_components_index; revoked is (doc_id) —
    *    clique relabel + edge splice + affected-component re-closure,
    *    all index-only), 'curriculum' (the s16 ranking store; revoked
    *    carries (doc_id, source) — anti join + in-place re-rank +
    *    count decrement, rank-for-rank the rebuild's prefix). Delete
    *    cost is proportional to the takedown set, never the corpus.
    *  - `graft_components_index(docs, n => 1, threshold => 0.95)` —
    *    the d26 near-dup graph STORE build: member rows `(doc_id,
    *    rep0, rep, lang, fp, tsz, toks)` (the clique map, the closed
    *    component label, and the rep's hashed shingle evidence) plus
    *    edge rows `(doc_id, dst)` (the verified rep-level pairs). The
    *    serving map is `... WHERE dst IS NULL` → (doc_id, rep); the
    *    store feeds graft_index_delete/merge kind => 'components'.
    *  - `graft_components_delete(components, docs, revoked, n => 1,
    *    threshold => 0.95)` — takedown on the near-dup component map:
    *    untouched components pass through, affected components'
    *    survivors re-close component-locally (splits included) —
    *    bit-identical to rebuilding the closure over the survivors.
    *  - `graft_index_merge(index, drop, kind => 'span', n => 8)` —
    *    COMPACTION, the append half of graft_index_delete: folds an
    *    arriving drop's contribution into a persisted index (kind
    *    'span', 'postings', 'minhash', 'prefix', 'secrets',
    *    'charspan', or 'components') by delta arithmetic or per-doc
    *    row union — the base corpus is never re-read, and the result
    *    is bit-identical to rebuilding over base ∪ drop (disjoint
    *    doc_ids; 'prefix' promises served-answer equality under its
    *    frozen df order, the d19 contract; 'components' verifies only
    *    NEW cross pairs — drop carries doc_id + lang + text, and
    *    n/threshold are its shingle knobs; 'curriculum' re-heaps index
    *    rows ∪ the drop's hashed rows — k is the ranking depth, and
    *    merging into an EMPTY store relation bootstraps it, the SQL
    *    build path). IVF member appends go through graft_ivf_append.
    *  - `graft_secret_scrub(docs, k => 3, run => 4)` — frequency-gated
    *    secret redaction (the t27 k-anonymity scrub): digit-run tokens
    *    in fewer than k distinct documents corpus-wide mask as
    *    `<secret>`; returns `(doc_id, n_tokens, n_secrets, n_redacted,
    *    clean_text)`. `graft_secret_frequencies(docs, run => 4)` emits
    *    the persisted (tok, nd) candidate index, and
    *    `graft_secret_scrub_incremental(drop, index, k => 3, run => 4)`
    *    scrubs an arriving drop against it, combining base and
    *    within-drop evidence against k — the calls compose through the
    *    TVF fixpoint.
    *  - `graft_retention_expiry(docs, policy, as_of => 359)` — the
    *    scheduled delete's input (the x23 retention family): rows of
    *    docs (which must carry `source` and `ingest_day`) whose age at
    *    as_of reached their source's `retention_days` in the policy
    *    relation, annotated with `age_days`/`retention_days`; a source
    *    with no policy row never expires. The output is the
    *    revoked-set shape graft_index_delete / graft_components_delete
    *    consume — scheduled and request-driven deletion share one
    *    lifecycle.
    *  - `graft_takedown_audit(docs, revoked, members, revoked_vecs,
    *    n => 8, run => 4)` — the unified EIGHT-store takedown audit
    *    (x25): one `(store, n_before, n_after, n_changed)` row per
    *    lifecycle index (span, charspan, postings, minhash, prefix,
    *    secrets, components, ivf_members), every number from the
    *    delete paths on the stale stores. `revoked` takes full doc
    *    rows — `graft_retention_expiry`'s output feeds it directly,
    *    closing the retention → takedown → audit loop in one SQL
    *    statement.
    *  - `graft_unigram_em(docs, pieces, char_cost => 6145)` — one
    *    unigram-LM EM re-estimation round (u13) under the fixed
    *    `(piece, cost)` relation; returns `(piece, n_uses, cost)`,
    *    itself a valid pieces relation, so the call self-composes and
    *    feeds graft_unigram_encode directly.
    *  - `graft_hyperball(pairs, dist => 4, m => 256)` — HyperBall
    *    harmonic-centrality/ball-size estimation over the pair
    *    relation's endpoints (g15's serving face);
    *    `graft_harmonic(pairs, dist => 4)` is the exact integer-ppm
    *    ground truth (g15p) for graphs whose reach allows it.
    *  - `graft_ivf_append(index, drop)` — incremental IVF maintenance
    *    (the a9 operator): assign-only append of a (vec_id, embedding)
    *    drop against a PERSISTED (centroid_id, centroid) index
    *    relation → per cell (cell, n_new, cos), where cos is the
    *    drift cosine between the stored centroid and the drop members'
    *    mean (null when the drop left the cell empty). Map-only
    *    assignment; no job ever touches the base corpus.
    *
    * Lifecycle: the dedup/BPE operators persist tracked scratch frames
    * their plans reuse within one execution; a long-lived serving
    * session should issue the `graft_release` statement between serving
    * batches to release them (Spark recomputes if a released plan is
    * re-executed, so it is always safe).
    */
  /** Option keys each graft_* TVF accepts — an unknown key is a caller
    * typo (`treshold => 0.9`) and must error, not silently default.
    */
  private val GraftTvfOptions: Map[String, Set[String]] = Map(
    "topk" -> Set("k"),
    "dedup_pairs" -> Set("threshold"),
    "decontaminate" -> Set("n"),
    "pagerank" -> Set("iters", "damping", "dangling"),
    "hits" -> Set("iters"),
    "bpe_merges" -> Set("rounds"),
    "radius" -> Set("tau"),
    "louvain" -> Set.empty,
    "louvain_levels" -> Set("levels", "moves"),
    "incremental_dedup" -> Set("num", "den"),
    "incremental_minhash" -> Set("num", "den"),
    "knn_label" -> Set("k"),
    "semantic_decon" -> Set("tau"),
    "asof" -> Set("key", "ord", "payload", "forward"),
    "unigram_lm" -> Set("vocab"),
    "unigram_encode" -> Set("char_cost"),
    "ivf_append" -> Set.empty,
    "components" -> Set("n", "threshold"),
    "components_index" -> Set("n", "threshold"),
    "license_propagation" -> Set("rank"),
    "split_leakage" -> Set.empty,
    "span_excise" -> Set("n", "keep_one"),
    "index_delete" -> Set("kind", "n", "run"),
    "index_merge" -> Set("kind", "n", "run", "threshold", "k"),
    "components_delete" -> Set("n", "threshold"),
    "byte_bpe_merges" -> Set("rounds"),
    "byte_encode" -> Set.empty,
    "secret_scrub" -> Set("k", "run"),
    "secret_frequencies" -> Set("run"),
    "secret_scrub_incremental" -> Set("k", "run"),
    "retention_expiry" -> Set("as_of"),
    "unigram_em" -> Set("char_cost"),
    "hyperball" -> Set("dist", "m"),
    "harmonic" -> Set("dist"),
    "takedown_audit" -> Set("n", "run"),
    "curriculum_delete_buffered" -> Set("k"))

  /** Per-KIND option subsets for the kind-dispatched lifecycle TVFs
    * (graft_index_delete / graft_index_merge): the TVF-level option set
    * is the union over kinds, so a kind-mismatched option (`n => 8`
    * with kind => 'secrets', `run => 5` with kind => 'span') would
    * otherwise be accepted and silently IGNORED — the default applies
    * and the caller's typo is masked. Validated after kind resolution,
    * before dispatch; an unknown kind falls through to the dispatch
    * error (which names the valid kinds).
    */
  private val IndexKindOptions: Map[String, Set[String]] = Map(
    "span" -> Set("n"),
    "charspan" -> Set("n"),
    "secrets" -> Set("run"),
    "postings" -> Set.empty,
    "minhash" -> Set.empty,
    "prefix" -> Set.empty,
    "ivf" -> Set.empty)

  private def requireKindOptions(
      fn: String, kind: String, given: Set[String]): Unit = {
    // 'components' is the one kind whose delete and merge halves differ:
    // delete is pure index arithmetic (no options), merge verifies new
    // cross pairs and owns the shingle/threshold knobs
    val allowedOpt = kind match {
      case "components" =>
        Some(if (fn == "index_merge") Set("n", "threshold") else Set.empty[String])
      case "curriculum" =>
        Some(if (fn == "index_merge") Set("k") else Set.empty[String])
      case k => IndexKindOptions.get(k)
    }
    allowedOpt.foreach { allowed =>
      val bad = given - "kind" -- allowed
      require(bad.isEmpty,
        s"graft_$fn: option(s) ${bad.toSeq.sorted.mkString(", ")} do not " +
          s"apply to kind '$kind'" + (if (allowed.isEmpty) ""
          else s" (accepted for '$kind': ${allowed.toSeq.sorted.mkString(", ")})"))
    }
  }

  /** Positional (relation) arguments each TVF requires, by name — checked
    * BEFORE any relation resolves, so a missing argument errors as an
    * argument-count problem, not as a failed path/table lookup.
    */
  private val GraftTvfRelations: Map[String, Seq[String]] = Map(
    "topk" -> Seq("corpus", "queries"),
    "dedup_pairs" -> Seq("docs"),
    "decontaminate" -> Seq("corpus", "eval"),
    "pagerank" -> Seq("pairs"),
    "hits" -> Seq("pairs"),
    "bpe_merges" -> Seq("docs"),
    "radius" -> Seq("corpus", "queries"),
    "louvain" -> Seq("pairs"),
    "louvain_levels" -> Seq("pairs"),
    "incremental_dedup" -> Seq("base", "probe"),
    "incremental_minhash" -> Seq("base", "probe"),
    "knn_label" -> Seq("corpus", "queries"),
    "semantic_decon" -> Seq("corpus", "eval"),
    "asof" -> Seq("left", "right"),
    "unigram_lm" -> Seq("docs"),
    "unigram_encode" -> Seq("docs", "pieces"),
    "ivf_append" -> Seq("index", "drop"),
    "components" -> Seq("docs"),
    "components_index" -> Seq("docs"),
    "license_propagation" -> Seq("comp", "docs"),
    "split_leakage" -> Seq("comp", "split"),
    "span_excise" -> Seq("docs"),
    "index_delete" -> Seq("index", "revoked"),
    "index_merge" -> Seq("index", "drop"),
    "components_delete" -> Seq("components", "docs", "revoked"),
    "byte_bpe_merges" -> Seq("docs"),
    "byte_encode" -> Seq("docs", "merges"),
    "secret_scrub" -> Seq("docs"),
    "secret_frequencies" -> Seq("docs"),
    "secret_scrub_incremental" -> Seq("drop", "index"),
    "retention_expiry" -> Seq("docs", "policy"),
    "unigram_em" -> Seq("docs", "pieces"),
    "hyperball" -> Seq("pairs"),
    "harmonic" -> Seq("pairs"),
    "takedown_audit" -> Seq("docs", "revoked", "members", "revoked_vecs"),
    "curriculum_delete_buffered" -> Seq("index", "revoked", "overflow"))

  /** Split a TVF argument list on top-level commas only — a comma inside
    * a quoted path (`'a,b.parquet'`) is part of the argument.
    */
  private def splitTvfArgs(argStr: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    argStr.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case ',' if !inQuote => out += cur.toString; cur.clear()
      case c => cur += c
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def graftTvf(fn: String, argStr: String): DataFrame = {
    val args = splitTvfArgs(argStr)
    val (pos, namedRaw) = args.partition(!_.contains("=>"))
    val namedPairs = namedRaw.map { a =>
      val Array(k, v) = a.split("=>", 2).map(_.trim)
      k.toLowerCase -> v
    }
    val named = namedPairs.toMap
    require(named.size == namedPairs.size,
      s"graft_${fn.toLowerCase}: duplicate option(s) " +
        namedPairs.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
          .mkString(", "))
    val allowed = GraftTvfOptions(fn.toLowerCase)
    val unknown = named.keySet -- allowed
    require(unknown.isEmpty,
      s"graft_${fn.toLowerCase}: unknown option(s) ${unknown.mkString(", ")}; " +
        s"accepted: ${allowed.toSeq.sorted.mkString(", ")}")
    val wantRels = GraftTvfRelations(fn.toLowerCase)
    require(pos.length == wantRels.length,
      s"graft_${fn.toLowerCase} needs ${wantRels.length} relation argument(s) " +
        s"(${wantRels.mkString(", ")} — each a quoted parquet path or a " +
        s"table name), got ${pos.length}")
    def rel(i: Int): DataFrame = {
      val a = pos(i) // arity was checked against GraftTvfRelations above
      if (a.length >= 2 && a.startsWith("'") && a.endsWith("'"))
        readParquet(a.substring(1, a.length - 1))
      else spark.table(a.toLowerCase)
    }
    def badValue(key: String, v: String, want: String): Nothing =
      throw new IllegalArgumentException(
        s"graft_${fn.toLowerCase}: option $key needs $want, got '$v'")
    def intOpt(key: String, default: Int): Int = {
      val v = named.get(key).map { raw =>
        try raw.toInt catch { case _: NumberFormatException =>
          badValue(key, raw, "an integer") }
      }.getOrElse(default)
      require(v >= 1, s"graft_${fn.toLowerCase}: $key must be >= 1, got $v")
      v
    }
    def doubleOpt(key: String, default: Double): Double =
      named.get(key).map { raw =>
        try raw.toDouble catch { case _: NumberFormatException =>
          badValue(key, raw, "a number") }
      }.getOrElse(default)
    def boolOpt(key: String): Boolean =
      named.get(key).exists { raw =>
        try raw.toBoolean catch { case _: IllegalArgumentException =>
          badValue(key, raw, "true or false") }
      }
    // column-name options (the asof posture): consumed through the
    // DataFrame API (col(...)), never re-parsed as SQL text; quotes
    // around single names are optional
    def strOpt(key: String): String = {
      val raw = named.getOrElse(key, throw new IllegalArgumentException(
        s"graft_${fn.toLowerCase}: option $key is required (a column name)"))
      val v =
        if (raw.length >= 2 && raw.startsWith("'") && raw.endsWith("'"))
          raw.substring(1, raw.length - 1)
        else raw
      require(v.nonEmpty, s"graft_${fn.toLowerCase}: option $key is empty")
      v
    }
    // graph TVFs share one vertex convention: the pair table's distinct
    // endpoints (a TVF has one relation argument; isolated vertices are
    // out of its view)
    def endpointVerts(pairs: DataFrame): DataFrame =
      pairs.select(col("doc_a").as("doc_id"))
        .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    // options parse BEFORE relations resolve in every branch, so a bad
    // option value reads as an option error even when a relation is also
    // missing
    fn.toLowerCase match {
      case "topk" =>
        val k = intOpt("k", 10)
        graft.operators.Similarity.bruteForceTopK(rel(0), rel(1), k = k)
      case "dedup_pairs" =>
        val threshold = doubleOpt("threshold", 0.8)
        require(threshold > 0.0 && threshold <= 1.0,
          s"graft_dedup_pairs: threshold must be in (0,1], got $threshold")
        graft.operators.Dedup.minhashLshPairs(rel(0), threshold = threshold)
      case "decontaminate" =>
        val n = intOpt("n", 8)
        graft.operators.Decontaminate.ngramOverlap(rel(0), rel(1), n = n)
      case "pagerank" =>
        // Served through the LAZY unrolled form so the rewrite itself
        // (and EXPLAIN over it) runs zero jobs; iters is therefore
        // CAPPED — the unrolled plan grows linearly per round (and would
        // double per round with dangling, capped tighter by the operator
        // itself). Deep fixpoints belong on the Scala
        // `Graph.pageRankConverged` API, whose checkpointed rounds the
        // g9 gate pins bit-equal to this form.
        val iters = intOpt("iters", 3)
        val damping = doubleOpt("damping", 0.85)
        val dangling = boolOpt("dangling")
        val cap = if (dangling) 8 else 20
        require(iters <= cap,
          s"graft_pagerank: iters > $cap unrolls too deep a plan — use " +
            "Graph.pageRankConverged for deep fixpoints")
        val pairs = rel(0)
        graft.operators.Graph.pageRank(endpointVerts(pairs), pairs,
          iters = iters, damping = damping, dangling = dangling)
      case "hits" =>
        // Graph.hits itself caps iters at 4 (the int64 score-overflow
        // bound), so the TVF only floors it.
        val iters = intOpt("iters", 2)
        val pairs = rel(0)
        graft.operators.Graph.hits(endpointVerts(pairs), pairs,
          iters = iters)
      case "bpe_merges" =>
        val rounds = intOpt("rounds", 2)
        graft.operators.Tokenizer.distributedMergeRounds(rel(0),
          rounds = rounds)
      case "byte_bpe_merges" =>
        // u11's distributed BYTE-level trainer (GPT-2 remap symbols —
        // Radford et al. 2019): per-round pair-count aggregate, one-row
        // argmax, HOF fold. Runs its per-round persisted jobs when
        // executed (the louvain_levels trainer posture). Output
        // (round, a, b, cnt, n_syms) — feed it straight into
        // graft_byte_encode (the TVF fixpoint composes the calls).
        val rounds = intOpt("rounds", 2)
        graft.operators.Tokenizer.distributedByteMergeRounds(rel(0),
          rounds = rounds)
      case "byte_encode" =>
        // u10's byte-level BPE APPLICATION: segment every doc of a
        // (doc_id, text) relation under the FIXED merge table given by
        // the (round, a, b) relation — merge ORDER is the round column
        // (BPE ranks are positional). The table ships as a codegen
        // reference object (the unigram_encode bounded-collect
        // discipline); the corpus pass is map-only. Output mirrors the
        // u10 gate: (doc_id, n_words, n_bytes, n_subwords, spw_ppm,
        // bps_ppm), docs with no words omitted.
        val docs = rel(0)
        val mergeRows = rel(1)
          .select(col("round").cast("long").as("round"),
            col("a").cast("string"), col("b").cast("string"))
          .where(col("round").isNotNull && col("a").isNotNull
            && col("b").isNotNull)
          // exact duplicate rows collapse harmlessly; what must NOT
          // pass is two DIFFERENT merges sharing one round — ranks are
          // positional, so they'd apply in plan-dependent order (the
          // unigram_encode min-cost discipline, applied to merges:
          // the shipped model must be a deterministic function of the
          // relation, and an ambiguous one is a caller error)
          .distinct()
          .orderBy(col("round"))
          .limit(65537).collect()
        require(mergeRows.length <= 65536,
          "graft_byte_encode: merges relation exceeds 65536 rows — " +
            "a merge table is model state, not a corpus")
        val dupRounds = mergeRows.groupBy(_.getLong(0))
          .collect { case (r, g) if g.length > 1 => r }.toSeq.sorted
        require(dupRounds.isEmpty,
          "graft_byte_encode: merge rounds must be unique (BPE ranks " +
            "are positional) — conflicting merges at round(s) " +
            dupRounds.take(5).mkString(", "))
        val merges = mergeRows.map(r => (r.getString(1), r.getString(2))).toSeq
        val toks = graft.functions.TextFunctions.tokens(col("text"))
        docs.select(col("doc_id"),
            size(toks).cast("long").as("n_words"),
            aggregate(toks, lit(0L), (acc, x) => acc + octet_length(x))
              .as("n_bytes"),
            size(graft.operators.Tokenizer.byteSegment(col("text"), merges))
              .cast("long").as("n_subwords"))
          .filter(col("n_words") > 0)
          .withColumn("spw_ppm", expr("(1000000 * n_subwords) div n_words"))
          .withColumn("bps_ppm", expr("(1000000 * n_bytes) div n_subwords"))
      case "secret_scrub" =>
        // t27's frequency-gated secret redaction (k-anonymity scrub):
        // digit-run tokens rarer than k distinct docs corpus-wide mask
        // as <secret>; frequent codes survive. run = minimum digit-run
        // length that makes a token a candidate.
        val k = intOpt("k", 3)
        val run = intOpt("run", 4)
        graft.operators.Privacy.secretScrub(rel(0), k = k, minDigitRun = run)
      case "secret_frequencies" =>
        // the persisted index shape for the incremental scrub: one row
        // per candidate token with its distinct-doc count (counted rows
        // — delete/merge-capable with the d23/d25 delta arithmetic)
        val run = intOpt("run", 4)
        graft.operators.Privacy.secretFrequencies(rel(0), minDigitRun = run)
      case "secret_scrub_incremental" =>
        // the daily-drop posture: the drop scrubs against a persisted
        // graft_secret_frequencies index; base + within-drop evidence
        // combine against k (the calls COMPOSE:
        // graft_secret_scrub_incremental(drop, graft_secret_frequencies(base)))
        val k = intOpt("k", 3)
        val run = intOpt("run", 4)
        graft.operators.Privacy.secretScrubAgainstIndex(rel(0), rel(1),
          k = k, minDigitRun = run)
      case "retention_expiry" =>
        // the scheduled delete's input: docs past their source's
        // retention as of the audit day. docs must carry (source,
        // ingest_day, ...); policy is (source, retention_days). The
        // output is the revoked-set shape graft_index_delete /
        // graft_components_delete consume — the calls compose.
        val asOf = intOpt("as_of", 359)
        graft.operators.Privacy.retentionExpiry(rel(0), rel(1),
          asOfDay = asOf.toLong)
      case "radius" =>
        val tau = doubleOpt("tau", 0.3)
        require(tau >= -1.0 && tau <= 1.0,
          s"graft_radius: tau is a cosine bound in [-1, 1], got $tau")
        graft.operators.Similarity.radiusSearch(rel(0), rel(1), tau = tau)
      case "louvain" =>
        val pairs = rel(0)
        graft.operators.Graph.louvainMove(endpointVerts(pairs), pairs)
      case "louvain_levels" =>
        // Graph.louvainLevels caps levels and moves at 4 each (every
        // move is an eager checkpoint round); the TVF only floors them
        val levels = intOpt("levels", 2)
        val moves = intOpt("moves", 1)
        val pairs = rel(0)
        graft.operators.Graph.louvainLevels(endpointVerts(pairs), pairs,
          levels = levels, movesPerLevel = moves)
      case "incremental_dedup" =>
        // the rational-threshold contract (num/den, default 4/5) keeps
        // the PPJoin prefix bound integer-exact — see
        // Dedup.incrementalDedup for why a double threshold is unsafe
        val num = intOpt("num", 4)
        val den = intOpt("den", 5)
        require(num <= den,
          s"graft_incremental_dedup: threshold num/den must be <= 1, " +
            s"got $num/$den")
        graft.operators.Dedup.incrementalDedup(rel(0), rel(1),
          num = num, den = den)
      case "incremental_minhash" =>
        val num = intOpt("num", 4)
        val den = intOpt("den", 5)
        require(num <= den,
          s"graft_incremental_minhash: threshold num/den must be <= 1, " +
            s"got $num/$den")
        graft.operators.Dedup.incrementalMinhash(
          graft.operators.Dedup.minhashIndex(rel(0)), rel(1),
          num = num, den = den)
      case "unigram_lm" =>
        val vocab = intOpt("vocab", 2048)
        graft.operators.Tokenizer.unigramLm(rel(0), vocabTarget = vocab)
      case "unigram_encode" =>
        val charCost = intOpt("char_cost", 6145).toLong
        val docs = rel(0)
        // the piece table ships as a codegen reference object (the
        // u4/u7 fixed-model discipline) — cap the collect so a caller
        // pointing a corpus-sized relation at the model slot fails
        // fast instead of OOMing the driver
        val pieceRows = rel(1)
          .select(col("piece").cast("string"), col("cost").cast("long"))
          .where(col("piece").isNotNull && col("cost").isNotNull)
          // duplicate piece rows with CONFLICTING costs would otherwise
          // resolve in plan-dependent order (an unordered limit+collect)
          // — take the min cost per piece and a canonical piece order so
          // the shipped model is a deterministic function of the relation
          .groupBy(col("piece")).agg(min(col("cost")).as("cost"))
          .orderBy(col("piece"))
          .limit(65537).collect()
        require(pieceRows.length <= 65536,
          "graft_unigram_encode: pieces relation exceeds 65536 rows — " +
            "a piece table is model state, not a corpus")
        val pieces = pieceRows.map(r => (r.getString(0), r.getLong(1))).toSeq
        docs.select(col("doc_id"),
            size(graft.functions.TextFunctions.tokens(col("text")))
              .cast("long").as("n_words"),
            size(graft.operators.Tokenizer.unigramSegment(
              col("text"), pieces, charCost)).cast("long").as("n_pieces"))
          .filter(col("n_words") > 0)
          .withColumn("ppw_ppm", expr("(1000000 * n_pieces) div n_words"))
      case "unigram_em" =>
        // u13's EM re-estimation round: E-step Viterbi usage under the
        // FIXED (piece, cost) relation, M-step exact bit-length
        // re-costing. Output (piece, n_uses, cost) is itself a valid
        // pieces relation, so the call SELF-composes —
        // graft_unigram_em(docs, graft_unigram_em(docs, pieces_t)) is
        // two EM rounds — and feeds graft_unigram_encode directly.
        val charCost = intOpt("char_cost", 6145).toLong
        val docs = rel(0)
        val pieceRows = rel(1)
          .select(col("piece").cast("string"), col("cost").cast("long"))
          .where(col("piece").isNotNull && col("cost").isNotNull)
          // duplicate piece rows with CONFLICTING costs would otherwise
          // resolve in plan-dependent order (an unordered limit+collect)
          // — take the min cost per piece and a canonical piece order so
          // the shipped model is a deterministic function of the relation
          .groupBy(col("piece")).agg(min(col("cost")).as("cost"))
          .orderBy(col("piece"))
          .limit(65537).collect()
        require(pieceRows.length <= 65536,
          "graft_unigram_em: pieces relation exceeds 65536 rows — " +
            "a piece table is model state, not a corpus")
        graft.operators.Tokenizer.unigramEmStep(docs,
          pieceRows.map(r => (r.getString(0), r.getLong(1))).toSeq,
          charCost)
      case "hyperball" =>
        // g15's HyperBall estimator face: per endpoint vertex the
        // HLL-estimated harmonic centrality and ball size within
        // `dist` hops (the register-digest gate face is g15; the
        // estimator is the serving face a SQL user wants). Runs its
        // per-round persisted jobs when executed (trainer posture).
        val dist = intOpt("dist", 4)
        require(dist <= 8, s"graft_hyperball: dist must be <= 8, got $dist")
        val m = intOpt("m", 256)
        require(m >= 16 && m <= (1 << 16),
          s"graft_hyperball: m must be in [16, 65536], got $m")
        val pairs = rel(0)
        graft.operators.Graph.harmonicCentralityHll(
          endpointVerts(pairs), pairs, maxDist = dist, m = m)
      case "harmonic" =>
        // g15p's exact bounded-radius harmonic centrality (integer
        // ppm) over the pair relation's endpoint vertices — the ground
        // truth graft_hyperball approximates; O(V·reach) distance
        // table, the documented reason the sketch face exists.
        val dist = intOpt("dist", 4)
        require(dist <= 8, s"graft_harmonic: dist must be <= 8, got $dist")
        val pairs = rel(0)
        graft.operators.Graph.harmonicCentralityExact(
          endpointVerts(pairs), pairs, maxDist = dist)
      case "ivf_append" =>
        graft.operators.Similarity.ivfDrift(rel(0), rel(1))
      case "components" =>
        // the d8 near-dup closure as a front door: (doc_id, rep) over
        // any (doc_id, lang, text) relation — the component map the
        // governance TVFs below consume
        val n = intOpt("n", 1)
        val threshold = doubleOpt("threshold", 0.95)
        require(threshold > 0.0 && threshold <= 1.0,
          s"graft_components: threshold must be in (0,1], got $threshold")
        graft.operators.Dedup.nearDupComponents(rel(0), n = n,
          threshold = threshold)
      case "components_index" =>
        // the d26 near-dup graph STORE build (member + edge rows) —
        // the eighth lifecycle index: feed it to graft_index_delete /
        // graft_index_merge with kind => 'components'; project the
        // serving map with `... WHERE dst IS NULL` (doc_id, rep)
        val n = intOpt("n", 1)
        val threshold = doubleOpt("threshold", 0.95)
        require(threshold > 0.0 && threshold <= 1.0,
          s"graft_components_index: threshold must be in (0,1], got $threshold")
        graft.operators.Dedup.componentsIndex(rel(0), n = n,
          threshold = threshold)
      case "license_propagation" =>
        // rank is a COLUMN NAME in `docs` (an integer restrictiveness
        // class — the license-registry lookup of a production pipeline)
        val rank = strOpt("rank")
        graft.operators.Dedup.licensePropagation(rel(0), rel(1), col(rank))
      case "split_leakage" =>
        graft.operators.Dedup.crossSplitLeakage(rel(0), rel(1))
      case "span_excise" =>
        // keep_one => true selects the ACL'22 all-but-one rule
        // (spanExciseKeepOne); default is the remove-every-copy
        // template variant (spanExcise). Callers rewriting at corpus
        // scale should point `docs` at a doc_id-bucketed table so the
        // cover join-back exchanges only the int cover side (the d20
        // posture).
        val n = intOpt("n", 8)
        require(n >= 2, s"graft_span_excise: n must be >= 2, got $n")
        if (boolOpt("keep_one"))
          graft.operators.Dedup.spanExciseKeepOne(rel(0), n = n)
        else graft.operators.Dedup.spanExcise(rel(0), n = n)
      case "index_delete" =>
        // TAKEDOWN across the persisted serving indexes (the d23
        // compliance family): remove a revoked-document set's
        // contribution from a persisted index WITHOUT a rebuild.
        // kind selects the store: 'span' (counted span-hash index —
        // revoked must carry doc_id AND text; n is the span length),
        // 'postings' (unbanded tf-idf postings — revoked is (doc_id)),
        // 'minhash' (uncapped band index — revoked is (doc_id)),
        // 'prefix' (streaming prefix index — revoked is (doc_id)),
        // 'ivf' (IVF member table — revoked is (vec_id)).
        val kindRaw = named.getOrElse("kind", "'span'")
        val kind =
          if (kindRaw.length >= 2 && kindRaw.startsWith("'") && kindRaw.endsWith("'"))
            kindRaw.substring(1, kindRaw.length - 1).toLowerCase
          else kindRaw.toLowerCase
        requireKindOptions("index_delete", kind, named.keySet)
        kind match {
          case "span" =>
            val n = intOpt("n", 8)
            require(n >= 2, s"graft_index_delete: n must be >= 2, got $n")
            graft.operators.Dedup.spanIndexDelete(rel(0), rel(1), n = n)
          case "postings" =>
            graft.operators.Dedup.postingsDelete(rel(0), rel(1))
          case "minhash" =>
            graft.operators.Dedup.minhashIndexDelete(rel(0), rel(1))
          case "prefix" =>
            graft.operators.Dedup.prefixIndexDelete(rel(0), rel(1))
          case "ivf" =>
            graft.operators.Similarity.ivfMembersDelete(rel(0), rel(1))
          case "secrets" =>
            // t27's (tok, nd) candidate-frequency index — revoked
            // carries doc_id + text; decrements from the revoked docs
            // alone, tokens reaching nd = 0 drop
            graft.operators.Privacy.secretIndexDelete(rel(0), rel(1),
              minDigitRun = intOpt("run", 4))
          case "charspan" =>
            // d27's counted char-window index (gh, nd) — revoked
            // carries doc_id + text; n is the window length in CHARS
            val n = intOpt("n", 40)
            require(n >= 2, s"graft_index_delete: n must be >= 2, got $n")
            graft.operators.Dedup.spanIndexCharsDelete(rel(0), rel(1), n = n)
          case "components" =>
            // d26's near-dup graph store (member + edge rows) — revoked
            // is (doc_id); the repair is pure index arithmetic (clique
            // relabel + edge splice + affected-component re-closure),
            // no text is read, so no shingle options apply
            graft.operators.Dedup.componentsIndexDelete(rel(0), rel(1))
          case "curriculum" =>
            // s16's ranking store — revoked carries (doc_id, source);
            // anti join + in-place re-rank + count decrement (the
            // prefix contract: rank-for-rank the rebuild's prefix)
            graft.operators.Curriculum.curriculumIndexDelete(rel(0), rel(1))
          case other => throw new IllegalArgumentException(
            s"graft_index_delete: kind must be one of span, postings, " +
              s"minhash, prefix, ivf, secrets, charspan, components, " +
              s"curriculum — got '$other'")
        }
      case "components_delete" =>
        // TAKEDOWN on the near-dup component map — the graph store's
        // delete, where revocation can SPLIT a component: untouched
        // components pass through, affected components' survivors
        // re-close over their own text (the d26 operator). Relations:
        // the persisted (doc_id, rep) map, the corpus it was built
        // from, and the revoked (doc_id) set.
        val n = intOpt("n", 1)
        val threshold = doubleOpt("threshold", 0.95)
        require(threshold > 0.0 && threshold <= 1.0,
          s"graft_components_delete: threshold must be in (0,1], got $threshold")
        graft.operators.Dedup.componentsDelete(rel(0), rel(1), rel(2),
          n = n, threshold = threshold)
      case "index_merge" =>
        // COMPACTION across the persisted serving indexes — the append
        // half of graft_index_delete (same kind dispatch): fold an
        // arriving drop's contribution into a persisted index without
        // re-reading the base corpus. kind: 'span' (counted span-hash
        // index — drop carries doc_id + text; n is the span length),
        // 'postings' (unbanded tf-idf postings — drop carries doc_id +
        // text). Drop doc_ids must be disjoint from the base's (the
        // snapshot contract).
        val kindRaw2 = named.getOrElse("kind", "'span'")
        val kind2 =
          if (kindRaw2.length >= 2 && kindRaw2.startsWith("'") && kindRaw2.endsWith("'"))
            kindRaw2.substring(1, kindRaw2.length - 1).toLowerCase
          else kindRaw2.toLowerCase
        requireKindOptions("index_merge", kind2, named.keySet)
        kind2 match {
          case "span" =>
            val n = intOpt("n", 8)
            require(n >= 2, s"graft_index_merge: n must be >= 2, got $n")
            graft.operators.Dedup.spanIndexMerge(rel(0), rel(1), n = n)
          case "postings" =>
            graft.operators.Dedup.postingsMerge(rel(0), rel(1))
          case "minhash" =>
            graft.operators.Dedup.minhashIndexMerge(rel(0), rel(1))
          case "prefix" =>
            graft.operators.Dedup.prefixIndexMerge(rel(0), rel(1))
          case "secrets" =>
            // t27's (tok, nd) candidate-frequency index — drop carries
            // doc_id + text; run is the candidate digit-run length
            graft.operators.Privacy.secretIndexMerge(rel(0), rel(1),
              minDigitRun = intOpt("run", 4))
          case "charspan" =>
            // d27's counted char-window index — drop carries doc_id +
            // text; n is the window length in CHARS
            val n2c = intOpt("n", 40)
            require(n2c >= 2, s"graft_index_merge: n must be >= 2, got $n2c")
            graft.operators.Dedup.spanIndexCharsMerge(rel(0), rel(1), n = n2c)
          case "components" =>
            // d26's near-dup graph store — drop carries doc_id + lang +
            // text; n/threshold are the shingle length and Jaccard bound
            // for verifying NEW cross pairs (old×old never re-verifies —
            // the stored edge set is already complete)
            val nc = intOpt("n", 1)
            val tc = doubleOpt("threshold", 0.95)
            require(tc > 0.0 && tc <= 1.0,
              s"graft_index_merge: threshold must be in (0,1], got $tc")
            graft.operators.Dedup.componentsIndexMerge(rel(0), rel(1),
              n = nc, threshold = tc)
          case "curriculum" =>
            // s16's ranking store — drop carries (doc_id, source); the
            // heap re-runs over index rows ∪ the drop's hashed rows
            // (top-k of top-k(S) ∪ D = top-k(S ∪ D) — exact), counts
            // fold per source; k is the per-source ranking depth
            graft.operators.Curriculum.curriculumIndexMerge(rel(0), rel(1),
              k = intOpt("k", 1000))
          case other => throw new IllegalArgumentException(
            s"graft_index_merge: kind must be one of span, postings, " +
              s"minhash, prefix, secrets, charspan, components, " +
              s"curriculum — got '$other' (IVF appends go through graft_ivf_append — the " +
              "member merge needs the centroid relation)")
        }
      case "curriculum_delete_buffered" =>
        // the exact-delete curriculum path (r18): index ∪ overflow
        // survivors re-rank and trim to k — EXACTLY the rebuild until a
        // saturated source loses more than the buffer's pad, raising
        // EAGERLY beyond (r19: the violation count is its own action at
        // rewrite time — an in-plan assert is prunable under pushed
        // predicates). `overflow` is the persisted (k, k+pad] buffer
        // (graft-side: curriculumOverflow); k MUST match the index's
        // build k (the snapshot contract).
        graft.operators.Curriculum.curriculumIndexDelete(rel(0), rel(1),
          overflow = Some(rel(2)), k = intOpt("k", 1000))
      case "takedown_audit" =>
        // the unified 8-store audit (x25): docs (doc_id, lang, text),
        // revoked (full doc rows — graft_retention_expiry's output
        // shape composes directly), the persisted IVF member table,
        // and its revoked vec_ids. n => span length (tokens; charspan
        // is fixed at its 40-char default), run => secret digit-run.
        graft.operators.Audit.takedownAudit(rel(0), rel(1), rel(2), rel(3),
          spanN = intOpt("n", 8), minDigitRun = intOpt("run", 4))
      case "knn_label" =>
        val k = intOpt("k", 5)
        graft.operators.Similarity.knnLabel(rel(0), rel(1), k = k)
      case "semantic_decon" =>
        val tau = doubleOpt("tau", 0.9)
        require(tau >= -1.0 && tau <= 1.0,
          s"graft_semantic_decon: tau is a cosine bound in [-1, 1], got $tau")
        graft.operators.Decontaminate.semanticFlags(rel(0), rel(1), tau = tau)
      case "asof" =>
        // key/ord/payload are COLUMN NAMES (strOpt above). `payload`
        // accepts a quoted comma list ('value,props').
        val key = strOpt("key")
        val ord = strOpt("ord")
        val payload = strOpt("payload").split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        require(payload.nonEmpty, "graft_asof: payload names no columns")
        if (boolOpt("forward"))
          graft.operators.AsofJoin.forward(rel(0), rel(1), key, ord, payload)
        else
          graft.operators.AsofJoin.backward(rel(0), rel(1), key, ord, payload)
    }
  }

  /** Reference error semantics: `select 'abc' > 10` must fail to bind — the
    * reference's `can_implicit_cast` forbids Varchar↔numeric
    * (src/types_v2/types.rs:138-200; asserted by
    * tests/slt/comparison_function.slt:2-7). Spark instead implicit-casts
    * the string side and yields NULL, so after analysis we walk every
    * comparison and reject ones whose operands were a string and a number
    * BEFORE Catalyst's implicit casts. Explicit user-written CASTs are
    * tagged by the parser (Cast.USER_SPECIFIED_CAST) and stay allowed.
    */
  private def rejectVarcharNumericComparison(df: DataFrame): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{BinaryComparison, Cast, Expression, SubqueryExpression}
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    def origType(e: Expression): DataType = e match {
      case c: Cast if c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty => origType(c.child)
      case other => other.dataType
    }
    def checkPlan(p: LogicalPlan): Unit = p.foreach { node =>
      node.expressions.foreach { root =>
        root.foreach {
          case cmp: BinaryComparison =>
            val (l, r) = (origType(cmp.left), origType(cmp.right))
            def isNum(t: DataType) = t.isInstanceOf[NumericType]
            if ((l == StringType && isNum(r)) || (isNum(l) && r == StringType))
              throw new IllegalArgumentException(
                s"cannot compare Varchar with ${if (isNum(l)) l.simpleString else r.simpleString}: " +
                  "no implicit Varchar↔numeric cast (reference types_v2/types.rs:138-200)")
          // subquery plans hang off expressions, not the outer plan tree —
          // descend so `where x in (select … where 'abc' > 10)` also rejects
          case sub: SubqueryExpression => checkPlan(sub.plan)
          case _ => ()
        }
      }
    }
    checkPlan(df.queryExecution.analyzed)
  }

  /** Reference error semantics: a subquery in FROM must carry an alias
    * (Postgres-compatible; asserted by tests/slt/subquery.slt:5). Scans the
    * top-level FROM clause for `(select ...)` items introduced by FROM /
    * `,` / JOIN and requires an identifier after the closing paren.
    * Subqueries nested inside expressions (IN/EXISTS/scalar) sit at paren
    * depth > 0 after their consuming keyword and are not FROM items.
    */
  private def requireFromSubqueryAlias(sql: String): Unit = {
    val fromPos = topLevelKeyword(sql, "from", 0).getOrElse(return)
    val mask = codeMask(sql)
    val n = sql.length
    var i = fromPos
    var depth = 0
    def isWord(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < n) {
      if (mask(i)) {
        val c = sql.charAt(i)
        if (c == ')') depth -= 1
        else if (c == '(') {
          // token immediately before the paren decides whether this is a
          // FROM item (from/,/join) or an expression paren (function call…)
          var p = i - 1
          while (p >= 0 && sql.charAt(p).isWhitespace) p -= 1
          val before =
            if (p >= 0 && sql.charAt(p) == ',') ","
            else {
              var q = p
              while (q >= 0 && isWord(sql.charAt(q))) q -= 1
              sql.substring(q + 1, p + 1).toLowerCase
            }
          val close = if (depth == 0 && Set("from", ",", "join").contains(before))
            matchingParen(sql, i, mask) else -1
          if (close > 0) {
            val firstWord = sql.substring(i + 1, close).trim
              .takeWhile(isWord).toLowerCase
            if (firstWord == "select") {
              var j = close + 1
              while (j < n && sql.charAt(j).isWhitespace) j += 1
              // a backtick-quoted identifier after the paren IS an alias
              val aliased = j < n && sql.charAt(j) == '`'
              val next =
                if (j >= n) ""
                else if (sql.charAt(j) == ',') ","
                else sql.substring(j).takeWhile(isWord).toLowerCase
              val clauseStarters = Set("", ",", "where", "group", "order", "limit",
                "having", "union", "intersect", "except", "on", "join", "inner",
                "left", "right", "full", "cross", "natural", "offset")
              if (!aliased && clauseStarters.contains(next))
                throw new IllegalArgumentException(
                  "subquery in FROM must have an alias (reference v1 binder, tests/slt/subquery.slt:5)")
            }
            i = close // item consumed; nested FROMs are the subquery's own
          } else depth += 1
        }
      }
      i += 1
    }
  }

  /** Index of the `)` matching the `(` at `open` (active code only);
    * -1 if unbalanced.
    */
  private def matchingParen(s: String, open: Int, mask: Array[Boolean]): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      if (mask(i)) {
        val c = s.charAt(i)
        if (c == '(') depth += 1
        else if (c == ')') { depth -= 1; if (depth == 0) return i }
      }
      i += 1
    }
    -1
  }

  /** `select v1+1 as a from t where a >= 2` — the reference binds select
    * aliases inside WHERE (bind_select_node.rs:98-131); Spark does not.
    * Substitute alias → its expression in the WHERE clause and retry.
    *
    * Clause boundaries come from a quote/paren-aware scan
    * ([[topLevelKeyword]]), so a `where`/`from` inside a subquery or a
    * string literal never splits the statement; the substitution itself
    * ([[replaceIdentifier]]) skips string literals, so an alias that also
    * appears inside quoted text is left alone.
    */
  private def rewriteAliasInWhere(sql: String): Option[String] = {
    for {
      fromPos <- topLevelKeyword(sql, "from", 0)
      selPos <- topLevelKeyword(sql, "select", 0)
      if selPos < fromPos
      wherePos <- topLevelKeyword(sql, "where", fromPos)
      rewritten <- {
        val whereStart = wherePos + "where".length
        val tailStart =
          Seq("group", "order", "limit", "having", "union", "intersect", "except")
            .flatMap(k => topLevelKeyword(sql, k, whereStart)).minOption
            .getOrElse(sql.length)
        val selectList = sql.substring(selPos + "select".length, fromPos)
        var where = sql.substring(whereStart, tailStart)
        var changed = false
        splitTopLevel(selectList).foreach { item =>
          """(?is)^(.*\S)\s+as\s+(\w+)\s*$""".r.findFirstMatchIn(item.trim).foreach { am =>
            val expr = am.group(1); val alias = am.group(2)
            val replaced = replaceIdentifier(where, alias, s"($expr)")
            if (replaced != where) { where = replaced; changed = true }
          }
        }
        if (changed)
          Some(sql.substring(0, whereStart) + where + sql.substring(tailStart))
        else None
      }
    } yield rewritten
  }

  /** Index of the first top-level (paren depth 0, outside string literals)
    * occurrence of keyword `kw` at or after position `from`, as a whole
    * word. Statement routing and the alias rewrite both need clause
    * boundaries that ignore subqueries and string literals.
    */
  private def topLevelKeyword(s: String, kw: String, from: Int): Option[Int] = {
    val mask = codeMask(s)
    var depth = 0
    var i = 0
    val n = s.length
    def isWord(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < n) {
      if (mask(i)) {
        val c = s.charAt(i)
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (depth == 0 && i >= from &&
          s.regionMatches(true, i, kw, 0, kw.length) &&
          (i == 0 || !isWord(s.charAt(i - 1))) &&
          (i + kw.length >= n || !isWord(s.charAt(i + kw.length))))
          return Some(i)
      }
      i += 1
    }
    None
  }

  /** Replace whole-word, case-insensitive occurrences of `ident` in `text`
    * with `repl`, skipping string literals (an alias that also appears
    * inside '...' text must stay untouched).
    */
  private def replaceIdentifier(text: String, ident: String, repl: String): String = {
    val mask = codeMask(text)
    val out = new StringBuilder
    var i = 0
    val n = text.length
    def isWord(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < n) {
      if (mask(i) && text.regionMatches(true, i, ident, 0, ident.length) &&
        (i == 0 || !isWord(text.charAt(i - 1))) &&
        (i + ident.length >= n || !isWord(text.charAt(i + ident.length)))) {
        out ++= repl
        i += ident.length
      } else { out += text.charAt(i); i += 1 }
    }
    out.toString
  }

  /** Split a select list on top-level commas (ignores commas inside parens
    * and quotes).
    */
  private def splitTopLevel(s: String): Seq[String] = {
    val mask = codeMask(s)
    val out = mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      if (mask(i)) s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.filter(_.trim.nonEmpty).toSeq
  }

  // ---- DDL/DML helpers ---------------------------------------------------

  /** Reference error semantics: CREATE TABLE over an existing name fails
    * (tests/slt/create_table.slt:8; the v2 binder checks the catalog in
    * bind_create.rs).
    */
  private def requireNotExists(name: String): Unit =
    if (tables.contains(name.toLowerCase))
      throw new IllegalArgumentException(s"table ${name.toLowerCase} already exists")

  /** sqlrs type name → Spark type, with the unsigned-widening policy of
    * SURVEY §1.2 (no unsigned types in Spark: widen to the next signed
    * type, UBIGINT → DECIMAL(20,0), matching Spark's own JDBC/parquet
    * unsigned handling). INTERVAL maps like the reference: plain `interval`
    * is day-time (types_v2/types.rs:229-230), `interval year to month` is
    * the year-month variant.
    */
  private[engine] def parseType(t: String): DataType = {
    val norm = t.trim.toLowerCase.replaceAll("\\s+", " ")
    norm match {
      case "boolean" | "bool" => BooleanType
      case "tinyint" => ByteType
      case "tinyint unsigned" => ShortType
      case "smallint" => ShortType
      case "smallint unsigned" => IntegerType
      case "int" | "integer" => IntegerType
      case "int unsigned" | "integer unsigned" => LongType
      case "bigint" => LongType
      case "bigint unsigned" => DecimalType(20, 0)
      case "float" | "real" => FloatType
      case "double" => DoubleType
      case "varchar" | "string" | "text" => StringType
      case "date" => DateType
      case "timestamp" => TimestampType
      case "interval" | "interval day to second" => DayTimeIntervalType()
      case "interval year to month" => YearMonthIntervalType()
      case v if v.startsWith("varchar") => StringType
      case v if v.startsWith("decimal") =>
        val nums = "\\d+".r.findAllIn(v).map(_.toInt).toSeq
        if (nums.size >= 2) DecimalType(nums(0), nums(1))
        else if (nums.size == 1) DecimalType(nums(0), 0)
        else DecimalType(10, 0)
      case other => throw new IllegalArgumentException(s"unsupported type: $other")
    }
  }

  /** Inclusive max of each unsigned sqlrs type; widening erases
    * unsignedness from the Spark type, so the origin is kept as column
    * metadata and enforced on INSERT (reference `can_implicit_cast`
    * rejects out-of-range values, types_v2/types.rs:138-200;
    * tests/slt/insert_table.slt:50).
    */
  private val UnsignedMax: Map[String, java.math.BigDecimal] = Map(
    "tinyint unsigned" -> new java.math.BigDecimal(255),
    "smallint unsigned" -> new java.math.BigDecimal(65535),
    "int unsigned" -> new java.math.BigDecimal(4294967295L),
    "integer unsigned" -> new java.math.BigDecimal(4294967295L),
    "bigint unsigned" -> new java.math.BigDecimal("18446744073709551615"))

  private[engine] val UnsignedMaxKey = "graft.unsignedMax"

  private def parseSchema(colDefs: String): StructType =
    StructType(splitTopLevel(colDefs).map { c =>
      val parts = c.trim.split("\\s+", 2)
      val norm = parts(1).trim.toLowerCase.replaceAll("\\s+", " ")
      val meta = UnsignedMax.get(norm) match {
        case Some(mx) =>
          new MetadataBuilder().putString(UnsignedMaxKey, mx.toPlainString).build()
        case None => Metadata.empty
      }
      StructField(parts(0).toLowerCase, parseType(parts(1)), nullable = true, meta)
    })

  /** INSERT semantics from the reference (bind_insert.rs): explicit column
    * list reorders, missing columns get NULL, values implicit-cast to the
    * table's types.
    */
  private def insertInto(name: String, colList: Option[String], values: DataFrame): Unit = {
    val target = table(name)
    val schema = target.schema
    val explicit = colList.map(_.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq)
    val incoming = explicit.getOrElse(schema.fields.map(_.name).toSeq)
    require(incoming.size == values.columns.length,
      s"INSERT column count mismatch: ${incoming.size} vs ${values.columns.length}")
    val byName = incoming.zip(values.columns).toMap
    // unsigned-origin range enforcement (tests/slt/insert_table.slt:50):
    // validated on the INCOMING values, before the widening cast can wrap.
    // The source is materialized ONCE (executor-side localCheckpoint) so
    // validation and insertion see the same rows even for a
    // non-deterministic INSERT..SELECT — otherwise a rand()-style source
    // could pass the check and then re-evaluate out of range on insert.
    val rangeViolations = schema.fields.flatMap { f =>
      if (f.metadata.contains(UnsignedMaxKey)) {
        byName.get(f.name).map { src =>
          val v = col(src).cast(DecimalType(38, 0))
          col(src).isNotNull &&
            (v < lit(java.math.BigDecimal.ZERO) ||
              v > lit(new java.math.BigDecimal(f.metadata.getString(UnsignedMaxKey))))
        }
      } else None
    }
    val source =
      if (rangeViolations.isEmpty) values
      else {
        val once = values.localCheckpoint(true)
        if (!once.filter(rangeViolations.reduce(_ || _)).isEmpty)
          throw new IllegalArgumentException(
            s"INSERT value out of range for unsigned column in $name " +
              "(reference can_implicit_cast, types_v2/types.rs:138-200)")
        once
      }
    val aligned = source.select(
      schema.fields.map { f =>
        byName.get(f.name) match {
          case Some(src) => col(src).cast(f.dataType).as(f.name)
          case None => lit(null).cast(f.dataType).as(f.name)
        }
      }.toIndexedSeq: _*)
    val unioned = target.unionByName(aligned)
    // plan-lineage cap: each INSERT union-and-replaces the view, so a long
    // REPL session doing thousands of inserts would grow the plan linearly
    // and slow every analysis pass. Collapse the lineage every
    // `CollapseEvery` inserts with an eager localCheckpoint (executor-side
    // materialization — rows never hit the driver).
    insertCounts(name.toLowerCase) = insertCounts.getOrElse(name.toLowerCase, 0) + 1
    if (insertCounts(name.toLowerCase) % CollapseEvery == 0)
      register(name, unioned.localCheckpoint(eager = true))
    else
      register(name, unioned)
  }

  // ---- meta / introspection ------------------------------------------------

  /** SHOW TABLES renders like the v2 pragma (tests/slt/pragma.slt:6-11):
    * (schema_name, table_name) rows, schema fixed to `main`.
    */
  def showTables(): DataFrame = {
    import spark.implicits._
    tables.keys.toSeq.sorted.map(("main", _)).toDF("schema_name", "table_name")
  }

  /** sqlrs_tables() parity (sqlrs_tables.rs:1-117): (schema_name,
    * schema_oid, table_name); the single `main` schema has oid 1.
    */
  def sqlrsTables(): DataFrame = {
    import spark.implicits._
    tables.keys.toSeq.sorted.map(("main", 1L, _))
      .toDF("schema_name", "schema_oid", "table_name")
  }

  /** Spark type → sqlrs LogicalType display name (types_v2/types.rs:9-26).
    * Unsigned variants are unrepresentable after widening (SURVEY §1.2), so
    * they render as their widened signed type.
    */
  private def logicalTypeName(t: DataType): String = t match {
    case BooleanType => "Boolean"
    case ByteType => "Tinyint"
    case ShortType => "Smallint"
    case IntegerType => "Integer"
    case LongType => "Bigint"
    case FloatType => "Float"
    case DoubleType => "Double"
    case StringType => "Varchar"
    case DateType => "Date"
    case d: DecimalType if d.scale == 0 => "UBigint"
    case other => other.simpleString.capitalize
  }

  /** sqlrs_columns() parity (sqlrs_columns.rs:25-39): one row per table —
    * (table_name, column_names, column_types) with list-rendered strings,
    * e.g. `t1 [v1, v2, v3] [Integer, Integer, Integer]`.
    */
  def sqlrsColumns(): DataFrame = {
    import spark.implicits._
    tables.toSeq.sortBy(_._1).map { case (t, df) =>
      (t,
        df.schema.fields.map(_.name).mkString("[", ", ", "]"),
        df.schema.fields.map(f => logicalTypeName(f.dataType)).mkString("[", ", ", "]"))
    }.toDF("table_name", "column_names", "column_types")
  }

  /** DESCRIBE t renders identically to one sqlrs_columns() row
    * (bind_explain_table.rs; golden output tests/slt/pragma.slt:14-17).
    */
  def describe(name: String): DataFrame = {
    import spark.implicits._
    val df = table(name)
    Seq((name.toLowerCase,
      df.schema.fields.map(_.name).mkString("[", ", ", "]"),
      df.schema.fields.map(f => logicalTypeName(f.dataType)).mkString("[", ", ", "]")))
      .toDF("table_name", "column_names", "column_types")
  }

  /** Per-column catalog dump (richer than the reference surface; kept for
    * programmatic use — the v1 CLI's `\dt` moral equivalent).
    */
  def columnsCatalog(): DataFrame = {
    import spark.implicits._
    tables.toSeq.sortBy(_._1).flatMap { case (t, df) =>
      df.schema.fields.zipWithIndex.map { case (f, i) =>
        ("main", t, f.name, i, f.dataType.simpleString, f.nullable)
      }
    }.toDF("schema_name", "table_name", "column_name", "column_index",
      "data_type", "nullable")
  }

  /** EXPLAIN parity: the reference returns a two-column relation
    * (explain_type, explain_value) with one multi-line tree per row —
    * logical, optimized logical, physical (bind_explain.rs:23-29;
    * physical_explain.rs:24-34; renderer tree_render.rs:1-193, 2-space
    * indent per level). The trees here are Catalyst's analyzed /
    * optimized / executed plans rendered in the reference's node
    * vocabulary (LogicalProjection, LogicalGet: main.t, PhysicalFilter…),
    * plus a fourth row with Spark's own formatted plan — the detail a
    * Spark operator actually tunes against. Expression text is Catalyst's
    * (the reference prints binder column indices that have no Spark
    * analogue); node names and tree shape are the parity surface.
    */
  def explainDf(sql: String): DataFrame = {
    import spark.implicits._
    val qe = runSelect(sql).queryExecution
    Seq(
      ("logical_plan", renderLogicalTree(qe.analyzed)),
      ("logical_plan_opt", renderLogicalTree(qe.optimizedPlan)),
      ("physical_plan", renderPhysicalTree(qe.executedPlan)),
      ("physical_plan_spark", qe.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).trim))
      .toDF("explain_type", "explain_value")
  }

  def explain(sql: String): String =
    explainDf(sql).collect()
      .map(r => s"${r.getString(0)}:\n${r.getString(1)}").mkString("\n")

  private def renderLogicalTree(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): String = {
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.catalyst.plans.logical._
    val sb = new StringBuilder
    def exprStr(es: Seq[Expression]): String =
      es.map(e => try e.sql catch { case _: Throwable => e.simpleString(100) })
        .mkString(", ")
    def walk(p: LogicalPlan, level: Int): Unit = {
      val pad = "  " * level
      p match {
        // a reference to a cataloged table — the reference's scan node
        // (schema fixed to `main` like the v2 catalog)
        case s: SubqueryAlias if tables.contains(s.alias.toLowerCase) =>
          sb.append(pad).append(s"LogicalGet: main.${s.alias.toLowerCase}\n")
        case s: SubqueryAlias => // derived-table alias: transparent
          walk(s.child, level)
        case v: View => walk(v.child, level)
        case GlobalLimit(l, LocalLimit(_, child)) =>
          sb.append(pad).append(s"LogicalLimit: limit[${l.sql}], offset[None]\n")
          walk(child, level + 1)
        case pr: Project =>
          sb.append(pad).append(s"LogicalProjection: ${exprStr(pr.projectList)}\n")
          walk(pr.child, level + 1)
        case f: Filter =>
          sb.append(pad).append(s"LogicalFilter: ${exprStr(Seq(f.condition))}\n")
          walk(f.child, level + 1)
        case _: OneRowRelation =>
          sb.append(pad).append("LogicalDummyScan\n")
        case l: LocalRelation =>
          // materialized rows (VALUES / in-memory table after optimization)
          sb.append(pad).append(
            if (l.data.isEmpty) "LogicalDummyScan\n" else "LogicalExpressionGet\n")
        case other if other.nodeName == "LogicalRelation" ||
            other.nodeName == "LogicalRDD" =>
          sb.append(pad).append("LogicalGet: read_csv\n")
        case other =>
          // outside the reference's vocabulary (joins, aggregates, sorts…):
          // reference naming convention over Catalyst's node name
          sb.append(pad).append(s"Logical${other.nodeName}\n")
          other.children.foreach(walk(_, level + 1))
      }
    }
    walk(plan, 0)
    sb.toString.stripTrailing()
  }

  private def renderPhysicalTree(
      plan: org.apache.spark.sql.execution.SparkPlan): String = {
    import org.apache.spark.sql.execution._
    val sb = new StringBuilder
    def walk(p: SparkPlan, level: Int): Unit = {
      val pad = "  " * level
      p match {
        // execution wrappers with no reference analogue are transparent
        case a: adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan, level)
        case w: WholeStageCodegenExec => walk(w.child, level)
        case i: InputAdapter => walk(i.child, level)
        case other =>
          val name = other match {
            case _: ProjectExec => "PhysicalProjection"
            case _: FilterExec => "PhysicalFilter"
            case _: FileSourceScanExec => "PhysicalTableScan"
            case _: LocalTableScanExec => "PhysicalColumnDataScan"
            case _: GlobalLimitExec | _: LocalLimitExec | _: CollectLimitExec =>
              "PhysicalLimit"
            case _ => s"Physical${other.nodeName}"
          }
          sb.append(pad).append(name).append('\n')
          other.children.foreach(walk(_, level + 1))
      }
    }
    walk(plan, 0)
    sb.toString.stripTrailing()
  }

  private def emptyOk: DataFrame = {
    import spark.implicits._
    Seq.empty[String].toDF("ok")
  }
}
