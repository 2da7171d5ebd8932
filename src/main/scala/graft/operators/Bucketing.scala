package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) storage layout for co-located joins.
  *
  * The reference engine is single-process and has no notion of a shuffle
  * (SURVEY.md §4.3), so this has no counterpart there — it exists for the
  * cluster execution model: at 100 TB the exchange feeding a fact-fact join
  * (lineitem ⋈ orders on orderkey) is the single largest cost in most
  * plans, and it is paid again by EVERY query that joins on that key.
  * Writing both fact tables bucketed by the join key hash-partitions the
  * data ONCE at write time; Spark's scan then reports the bucket
  * distribution as its output partitioning, and the join planner drops the
  * exchange on both sides for every subsequent query (verified by
  * `PlanQualitySpec`: zero shuffle exchanges under a merge-join hint).
  *
  * `sortBy` on the same keys additionally persists per-file sort order, so
  * single-file buckets skip the join-side sort as well.
  */
object Bucketing {

  /** Write `df` as a bucketed external parquet table registered as `table`
    * in the session catalog, with data at `path`. `buckets` must match
    * between co-located join partners; keys are the join keys.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      buckets: Int,
      keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key")
    // Pre-shuffle on the bucket keys so each write task holds exactly
    // one bucket's rows (repartition and bucketBy share the Murmur3
    // hash): ONE file per bucket instead of tasks × buckets files.
    // Single-file buckets are what lets the scan honor the sortBy
    // metadata (a multi-file bucket has no cross-file order, so Spark
    // re-sorts the join side); the exchange itself is the write-once
    // cost the bucketed layout prepays for every later join.
    df.repartition(buckets, keys.map(org.apache.spark.sql.functions.col): _*)
      .write
      .mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Register `table` over ALREADY-BUCKETED parquet files at `path` —
    * metadata-only, no data moves. The files must have been produced by
    * [[writeBucketed]] with the SAME `buckets`/`keys` (their names carry
    * the bucket ids the catalog metadata promises; registering a foreign
    * layout would silently mis-bucket every join). Exists so a publisher
    * can build at a tmp path, atomically rename the directory into
    * place, and then re-point the catalog — `saveAsTable(overwrite)`
    * directly onto the live path deletes the serving files before the
    * new build commits.
    */
  def registerBucketed(
      spark: SparkSession,
      table: String,
      path: String,
      buckets: Int,
      keys: Seq[String],
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val ks = keys.map(k => s"`$k`").mkString(", ")
    spark.sql(s"CREATE TABLE `$table` (${schema.toDDL}) USING parquet " +
      s"CLUSTERED BY ($ks) SORTED BY ($ks) INTO $buckets BUCKETS " +
      s"LOCATION '$path'")
  }

  /** The bucketed table as a DataFrame (scan carries the bucket
    * distribution, so joins/aggregations on the bucket keys skip their
    * exchange).
    */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
