package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{Events, Parity, Pipeline, Tpch}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory: one entry per implemented operator
  * from SURVEY.md §2 plus the training-data-pipeline extensions. `oracleSql`
  * carries the DuckDB-equivalent SQL for the driver's differential check;
  * entries without oracle SQL get a weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Parity.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Parity.queries ++ Pipeline.queries ++ Events.queries ++ Tpch.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Parity.oracles ++ Pipeline.oracles ++ Events.oracles ++ Tpch.oracles
}
