package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2 parity queries: the reference engine's full query surface
  * (scan/filter/project, joins, aggregation, distinct, order/limit/offset,
  * scalar subqueries, VALUES, dummy scan, casts, date±interval) re-expressed
  * Spark-first over the driver testdata.
  *
  * Conventions shared with the DuckDB oracles:
  *   - Every aggregate over a double column goes through DECIMAL so the
  *     result is order-independent and bit-identical across engines (double
  *     summation order differs between Spark partitions and DuckDB), then is
  *     cast back to DOUBLE for a common output type.
  *   - Every query ends in a total ORDER BY (unique key, or all columns so
  *     ties are interchangeable) — the reference is single-threaded and
  *     order-deterministic; distributed Spark is not (SURVEY §4.3).
  *   - Column names are aliased identically on both sides.
  */
object Parity {

  /** Exact, order-independent sum of a 2-decimal double column. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregation (reference: PhysicalHashAgg, hash_agg.rs:33-223) ----
    "q1_agg" -> { (s, dir) =>
      // TPC-H Q1 shape: grouped sum/min/max/count with a derived measure.
      val li = Tables.load(s, dir, "lineitem")
      li.filter(col("l_quantity") < 49)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- ungrouped aggregation (reference: PhysicalSimpleAgg) ----
    "q2_simple_agg" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_partkey")).as("n_parts"),
        dsum(col("l_quantity")).as("sum_qty"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))
    },

    // ---- distinct aggregates (reference: count.rs:10-56, sum.rs:36-132) ----
    "q3_distinct_agg" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      o.groupBy(col("o_orderstatus"))
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          sum_distinct(col("o_custkey")).as("sum_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus"))
    },

    // ---- SELECT DISTINCT (reference plans it as group-by-all) ----
    "q4_distinct" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- filter + project + alias + arithmetic (evaluator.rs:13-121) ----
    "q5_filter_project" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.filter(col("l_quantity") > 30 && col("l_discount") <= 0.05 ||
          col("l_returnflag") === "R" && col("l_tax") =!= 0.0)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("net_price"),
          (col("l_quantity") + lit(1.0)).as("qty_plus1"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- joins (reference: PhysicalHashJoin hash_join.rs:147-320) ----
    "q6_join_inner" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("c_mktsegment"))
    },

    "q7_join_left_residual" -> { (s, dir) =>
      // LEFT join with a non-equi residual in the ON clause
      // (reference: join.rs:40-48 equi keys + `filter` residual).
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey") && o("o_totalprice") > 100000.0, "left")
        .groupBy(c("c_nationkey").as("nationkey"))
        .agg(count(o("o_orderkey")).as("n_big_orders"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("nationkey"))
    },

    "q8_join_right" -> { (s, dir) =>
      val n = Tables.load(s, dir, "nation")
      val c = Tables.load(s, dir, "customer")
      c.join(n, c("c_nationkey") === n("n_nationkey"), "right")
        .groupBy(col("n_name"))
        .agg(count(col("c_custkey")).as("n_cust"))
        .orderBy(col("n_name"))
    },

    "q9_join_full" -> { (s, dir) =>
      // FULL join over disjoint-ish key ranges exercises null padding on
      // both sides (reference: visited-bitmap logic hash_join.rs:193-320).
      val hi = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 150000.0)
        .select(col("o_custkey")).distinct()
      val c = Tables.load(s, dir, "customer").filter(col("c_acctbal") < 0)
        .select(col("c_custkey"), col("c_acctbal"))
      c.join(hi, c("c_custkey") === hi("o_custkey"), "full")
        .select(
          coalesce(col("c_custkey"), lit(-1)).as("cust"),
          coalesce(col("o_custkey"), lit(-1)).as("big_spender"),
          col("c_acctbal"))
        .orderBy(col("cust"), col("big_spender"))
    },

    "q10_join_cross" -> { (s, dir) =>
      // multi-FROM `from a, b` binds to a cross join in the reference
      // (binder/statement/mod.rs:40-56).
      val r = Tables.load(s, dir, "region")
      val n = Tables.load(s, dir, "nation")
      r.crossJoin(n)
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    },

    "q11_multi_join" -> { (s, dir) =>
      // TPC-H Q5 shape: 5-way join, dims broadcast, one shuffle per big key.
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("n_name"))
    },

    // ---- order / limit / offset (order.rs:15-67, limit.rs:12-84) ----
    "q12_order_limit_offset" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(5)
        .limit(10)
    },

    // ---- uncorrelated scalar subquery (subquery.rs:63-84: rewritten to a
    // cross join with the one-row aggregate; we keep the same shape but let
    // Spark broadcast the single row) ----
    "q13_scalar_subquery" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val avgPrice = o.agg(avg(col("o_totalprice")).as("avg_price"))
      o.crossJoin(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("avg_price") * 1.5)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_expensive"))
        .orderBy(col("o_orderstatus"))
    },

    // ---- VALUES list (LogicalExpressionGet → PhysicalExpressionScan) ----
    "q14_values" -> { (s, dir) =>
      import s.implicits._
      Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", -3.0))
        .toDF("id", "tag", "score")
        .orderBy(col("id"))
    },

    // ---- FROM-less SELECT (LogicalDummyScan) ----
    "q15_dummy_scan" -> { (s, dir) =>
      s.range(1).select(
        lit(1L).as("a"),
        lit(2.3).as("b"),
        lit("x").as("c"),
        (lit(10L) * lit(4L) - lit(2L)).as("d"))
    },

    // ---- alias usable in WHERE (reference binds select aliases in WHERE,
    // bind_select_node.rs:98-131; Spark needs the expression inline) ----
    "q16_alias_in_where" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.select(col("l_orderkey"), col("l_linenumber"),
          (col("l_quantity") + col("l_tax")).as("qt"))
        .filter(col("qt") >= 49.0)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- date ± interval (arithmetic_function.rs:73-198; we implement the
    // CORRECT subtraction semantics, diverging from the reference's packed-
    // interval negate bug, SURVEY §2.8) ----
    "q17_date_interval" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate").cast("date").as("ship_date"))
        .filter(col("ship_date") < lit("1995-03-01").cast("date"))
        // dates go out as timestamps: both engines materialize them as
        // microsecond timestamps, removing dtype ambiguity in the compare
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("ship_date").cast("timestamp").as("ship_ts"),
          add_months(col("ship_date"), 1).cast("timestamp").as("plus_month"),
          date_add(col("ship_date"), 35).cast("timestamp").as("plus_35d"),
          add_months(col("ship_date"), -12).cast("timestamp").as("minus_year"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- casts (default_cast.rs:11-37; truncation-sensitive casts avoided:
    // Spark truncates double→int, DuckDB rounds — floor() on both sides) ----
    "q18_cast" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.select(
          col("l_orderkey").cast("int").as("ok_int"),
          col("l_linenumber").cast("bigint").as("ln_big"),
          floor(col("l_extendedprice")).cast("bigint").as("price_floor"),
          col("l_quantity").cast("string").as("qty_str"),
          col("l_linenumber").cast("double").as("ln_dbl"))
        .filter(col("ok_int") <= 64)
        .orderBy(col("ok_int"), col("ln_big"))
    },

    // ---- comparison + conjunction kernels over every operator
    // (default_comparison.rs:14-79, default_conjunction.rs:36-59) ----
    "q19_comparisons" -> { (s, dir) =>
      val p = Tables.load(s, dir, "part")
      p.select(
          col("p_partkey"),
          (col("p_size") === 10).as("eq10"),
          (col("p_size") =!= 10).as("ne10"),
          (col("p_size") > 25).as("gt25"),
          (col("p_size") >= 25).as("ge25"),
          (col("p_size") < 5).as("lt5"),
          (col("p_size") <= 5).as("le5"),
          (col("p_size") > 10 && col("p_size") < 20).as("band"),
          (col("p_size") < 3 || col("p_size") > 47).as("tails"))
        .orderBy(col("p_partkey"))
    },

    // ---- set operations (absent in the reference — SURVEY §2.7 — but part
    // of a complete engine; Spark union/intersect/except) ----
    "q20_set_ops" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val s1 = c.filter(col("c_acctbal") > 5000).select(col("c_nationkey"))
      val s2 = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_nationkey"))
      s1.union(s2).distinct()
        .except(s1.intersect(s2).limit(0)) // keep plan shape: union/intersect/except all exercised
        .withColumnRenamed("c_nationkey", "nationkey")
        .orderBy(col("nationkey"))
    },

    // ---- semi/anti joins (absent in the reference — SURVEY §2.3 lists
    // them as free Spark capability; EXISTS/NOT EXISTS shapes) ----
    "q21_semi_anti" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(c("c_mktsegment").as("mktsegment"))
        .agg(count(lit(1)).as("n")).withColumn("grp", lit("with"))
      val withoutOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(c("c_mktsegment").as("mktsegment"))
        .agg(count(lit(1)).as("n")).withColumn("grp", lit("without"))
      withOrders.unionByName(withoutOrders)
        .select(col("grp"), col("mktsegment"), col("n"))
        .orderBy(col("grp"), col("mktsegment"))
    },

    // ---- correlated scalar subquery (reference supports only uncorrelated,
    // subquery.rs:63-84; Spark decorrelates natively) ----
    "q22_correlated_subquery" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT c_nationkey AS nationkey, count(*) AS n_above
          |FROM customer c
          |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer i
          |                   WHERE i.c_nationkey = c.c_nationkey)
          |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
    },

    // ---- grouping sets: ROLLUP (absent in reference, SURVEY §2.4) ----
    "q23_rollup" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    "q28_cube" -> { (s, dir) =>
      // CUBE completes the grouping-set family next to q23's ROLLUP: all
      // four grouping combinations in one pass (Spark expands to an
      // Expand + single aggregate — one shuffle, not four scans)
      val li = Tables.load(s, dir, "lineitem")
      li.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    "q30_pivot" -> { (s, dir) =>
      // PIVOT — wide-format aggregation with a FIXED value list (the
      // only scale-safe form: an inferred list is a full extra distinct
      // pass AND an unbounded schema). Spark's relational pivot rewrites
      // to one partial+final aggregate with CASE arms — exactly the
      // conditional-count SQL the oracle replays; absent cells are
      // coalesced to 0 so both engines agree on empty combinations.
      val e = Tables.load(s, dir, "events")
      val types = Seq("click", "error", "purchase", "signup", "view")
      e.select((col("user_id") % 5).as("bucket"), col("event_type"))
        .groupBy(col("bucket"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("bucket") +: types.map(t =>
          coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy(col("bucket"))
    },

    "q31_unpivot" -> { (s, dir) =>
      // UNPIVOT (wide→long melt) — q30's inverse, the reshape a
      // reporting layer runs constantly: per-source stats as one row
      // per (source, metric). Spark's relational unpivot rewrites to
      // an Expand over the already-aggregated O(sources) frame — the
      // melt itself never touches corpus-scale data; value columns
      // share one type (BIGINT) as unpivot requires.
      val d = Tables.load(s, dir, "documents")
      d.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"),
          countDistinct(col("lang")).as("n_langs"))
        .unpivot(Array(col("source")),
          Array(col("n_docs"), col("n_chars"), col("n_langs")),
          "metric", "value")
        .orderBy(col("source"), col("metric"))
    },

    "q29_grouping_sets" -> { (s, dir) =>
      // explicit GROUPING SETS with grouping_id disambiguation: (flag),
      // (status), and () — grouping_id distinguishes a rolled-up NULL
      // from a genuine NULL group value
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
          |  CAST(grouping(l_linestatus) AS INT) AS g_status,
          |  count(*) AS n
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin)
    },

    // ---- HAVING (absent from both reference binders, SURVEY §2.4) ----
    "q24_having" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      o.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .filter(col("n_orders") >= 10)
        .orderBy(col("o_custkey"))
    },

    // ---- string functions (reference registers NO string functions,
    // SURVEY §2.8 — only arithmetic; all free in Spark) ----
    "q25_string_funcs" -> { (s, dir) =>
      val p = Tables.load(s, dir, "part")
      p.select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          lower(col("p_brand")).as("brand_lower"),
          substring(col("p_name"), 1, 8).as("name_prefix"),
          length(col("p_name")).as("name_len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), "a", "@").as("name_subst"),
          trim(col("p_type")).as("type_trim"))
        .filter(col("p_partkey") <= 400)
        .orderBy(col("p_partkey"))
    },

    // ---- AVG (reference agg set is Count/Sum/Min/Max only,
    // agg_func.rs:10-15). Expressed as exact-decimal sum over count: both
    // engines then divide the SAME two numbers, so the double result is
    // bit-identical — Spark's decimal avg() rounds at scale+4 and DuckDB's
    // avg() accumulates doubles, which would drift at the hash gate. ----
    "q26_avg" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // ---- CASE WHEN bucketing (searched case; Catalyst folds the ladder) ----
    "q27_case_when" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      o.select(col("o_orderkey"),
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "medium")
            .otherwise("large").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  min(l_quantity) AS min_qty,
        |  max(l_quantity) AS max_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_quantity < 49
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_simple_agg" ->
      """SELECT count(*) AS n_rows,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  min(l_shipdate) AS min_ship,
        |  max(l_shipdate) AS max_ship
        |FROM lineitem""".stripMargin,

    "q3_distinct_agg" ->
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS n_cust,
        |  CAST(sum(DISTINCT o_custkey) AS BIGINT) AS sum_cust,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q4_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q5_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net_price,
        |  l_quantity + 1.0 AS qty_plus1
        |FROM lineitem
        |WHERE l_quantity > 30 AND l_discount <= 0.05 OR l_returnflag = 'R' AND l_tax <> 0.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q6_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q7_join_left_residual" ->
      """SELECT c_nationkey AS nationkey,
        |  count(o_orderkey) AS n_big_orders,
        |  count(*) AS n_rows
        |FROM customer LEFT JOIN orders
        |  ON c_custkey = o_custkey AND o_totalprice > 100000.0
        |GROUP BY c_nationkey ORDER BY nationkey""".stripMargin,

    "q8_join_right" ->
      """SELECT n_name, count(c_custkey) AS n_cust
        |FROM customer RIGHT JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q9_join_full" ->
      """WITH hi AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 150000.0),
        |  c AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < 0)
        |SELECT coalesce(c_custkey, -1) AS cust,
        |  coalesce(o_custkey, -1) AS big_spender,
        |  c_acctbal
        |FROM c FULL JOIN hi ON c_custkey = o_custkey
        |ORDER BY cust, big_spender""".stripMargin,

    "q10_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q11_multi_join" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q12_order_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10 OFFSET 5""".stripMargin,

    "q13_scalar_subquery" ->
      """SELECT o_orderstatus, count(*) AS n_expensive
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.5
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q14_values" ->
      """SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'a', CAST(1.5 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), 'b', CAST(2.5 AS DOUBLE)),
        |  (CAST(3 AS BIGINT), 'c', CAST(-3.0 AS DOUBLE))) AS t(id, tag, score)
        |ORDER BY id""".stripMargin,

    "q15_dummy_scan" ->
      """SELECT CAST(1 AS BIGINT) AS a, CAST(2.3 AS DOUBLE) AS b, 'x' AS c,
        |  CAST(10 AS BIGINT) * 4 - 2 AS d""".stripMargin,

    "q16_alias_in_where" ->
      """SELECT l_orderkey, l_linenumber, l_quantity + l_tax AS qt
        |FROM lineitem WHERE l_quantity + l_tax >= 49.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q17_date_interval" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_ts,
        |  CAST(CAST(CAST(l_shipdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS TIMESTAMP) AS plus_month,
        |  CAST(CAST(CAST(l_shipdate AS DATE) + INTERVAL 35 DAY AS DATE) AS TIMESTAMP) AS plus_35d,
        |  CAST(CAST(CAST(l_shipdate AS DATE) - INTERVAL 12 MONTH AS DATE) AS TIMESTAMP) AS minus_year
        |FROM lineitem WHERE CAST(l_shipdate AS DATE) < DATE '1995-03-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q18_cast" ->
      """SELECT CAST(l_orderkey AS INTEGER) AS ok_int,
        |  CAST(l_linenumber AS BIGINT) AS ln_big,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(l_quantity AS VARCHAR) AS qty_str,
        |  CAST(l_linenumber AS DOUBLE) AS ln_dbl
        |FROM lineitem WHERE CAST(l_orderkey AS INTEGER) <= 64
        |ORDER BY ok_int, ln_big""".stripMargin,

    "q19_comparisons" ->
      """SELECT p_partkey,
        |  p_size = 10 AS eq10, p_size <> 10 AS ne10,
        |  p_size > 25 AS gt25, p_size >= 25 AS ge25,
        |  p_size < 5 AS lt5, p_size <= 5 AS le5,
        |  p_size > 10 AND p_size < 20 AS band,
        |  p_size < 3 OR p_size > 47 AS tails
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q20_set_ops" ->
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
        |UNION
        |SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY nationkey""".stripMargin,

    "q21_semi_anti" ->
      """SELECT 'with' AS grp, c_mktsegment AS mktsegment, count(*) AS n
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment
        |UNION ALL
        |SELECT 'without' AS grp, c_mktsegment AS mktsegment, count(*) AS n
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY grp, mktsegment""".stripMargin,

    "q22_correlated_subquery" ->
      """SELECT c_nationkey AS nationkey, count(*) AS n_above
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer i
        |                   WHERE i.c_nationkey = c.c_nationkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q23_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q28_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q30_pivot" ->
      """SELECT user_id % 5 AS bucket,
        |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
        |  CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
        |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
        |  CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
        |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q31_unpivot" ->
      """WITH w AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |  FROM documents GROUP BY source)
        |SELECT source, 'n_docs' AS metric, n_docs AS value FROM w
        |UNION ALL SELECT source, 'n_chars', n_chars FROM w
        |UNION ALL SELECT source, 'n_langs', n_langs FROM w
        |ORDER BY source, metric""".stripMargin,

    "q29_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INT) AS g_status,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin,

    "q24_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 10
        |ORDER BY o_custkey""".stripMargin,

    "q25_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  lower(p_brand) AS brand_lower,
        |  substring(p_name, 1, 8) AS name_prefix,
        |  length(p_name) AS name_len,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  regexp_replace(p_name, 'a', '@', 'g') AS name_subst,
        |  trim(p_type) AS type_trim
        |FROM part WHERE p_partkey <= 400
        |ORDER BY p_partkey""".stripMargin,

    "q26_avg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q27_case_when" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 150000 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |  count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin
  )
}
