package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Classic TPC-H query shapes adapted to the driver's synthetic schema
  * (TESTDATA.md; some TPC-H columns — shipmode, commitdate, shippriority —
  * don't exist, so those predicates are mapped onto present columns while
  * keeping each query's SHAPE: the join graph, aggregation structure, and
  * ordering/limit semantics that make the plan interesting at scale).
  * The reference repo generates exactly these 22 queries via tpch-dbgen
  * (/root/reference/Makefile:63-92) but has no runner; here the important
  * ones run oracle-checked.
  *
  * Same conventions as [[Parity]]: decimal-routed double aggregates, total
  * ORDER BY, matching column aliases on both sides.
  */
object Tpch {

  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  private def revenue: Column =
    sum(col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
      .cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q3: shipping-priority — 3-way join, filter both fact sides, top-10
    // by revenue (TakeOrderedAndProject after partial aggregation)
    "tpch3_shipping_priority" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(revenue.as("rev"))
        .orderBy(col("rev").desc, col("l_orderkey").asc)
        .limit(10)
    },

    // Q4: order-priority checking — EXISTS decorrelated to a semi join
    // (no commitdate/receiptdate in this schema: "late line item" becomes
    // shipped more than 60 days after the order date)
    "tpch4_order_priority" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      val li = Tables.load(s, dir, "lineitem")
      val late = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey"))
      o.join(late, o("o_orderkey") === late("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // Q6: forecasting revenue change — pure scan+filter+ungrouped agg;
    // every predicate must reach the parquet scan
    "tpch6_forecast_revenue" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          col("l_discount").cast("decimal(18,2)")).cast("double").as("revenue"))
    },

    // Q10: returned-item reporting — 4-way join on the R-flagged subset,
    // top-20 customers by lost revenue
    "tpch10_returned_items" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(revenue.as("rev"))
        .orderBy(col("rev").desc, col("c_custkey").asc)
        .limit(20)
    },

    // Q14: promotion effect — conditional aggregation over a join
    // (promo = part names containing a marker token)
    "tpch14_promo_effect" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      val p = Tables.load(s, dir, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .agg(
          (sum(when(col("p_type").startsWith("PROMO"),
            col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") * 100.0 /
            sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
              .cast("double")).as("promo_revenue"))
    },

    // Q2 shape: min-within-group via a correlated subquery — for each
    // nation, the supplier(s) with the minimum account balance
    "tpch2_min_within_group" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT n_name, s_name, s_acctbal
          |FROM supplier JOIN nation ON s_nationkey = n_nationkey
          |WHERE s_acctbal = (SELECT min(s_acctbal) FROM supplier i
          |                   WHERE i.s_nationkey = supplier.s_nationkey)
          |ORDER BY n_name, s_name""".stripMargin)
    },

    // Q15 shape: CTE revenue view + scalar-max join (top supplier(s))
    "tpch15_top_supplier" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      val sup = Tables.load(s, dir, "supplier")
      val rev = li.groupBy(col("l_suppkey"))
        .agg(revenue.as("total_revenue"))
      val maxRev = rev.agg(max(col("total_revenue")).as("mr"))
      rev.join(broadcast(maxRev), rev("total_revenue") === maxRev("mr"))
        .join(sup, rev("l_suppkey") === sup("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    },

    // Q16 shape: anti-join + distinct count — parts of a brand not supplied
    // in large quantities. Written as NOT EXISTS, not NOT IN: NOT IN over a
    // nullable column is null-aware and degrades to a broadcast-nested-loop
    // at scale, while NOT EXISTS stays a hash left-anti join regardless of
    // nullability (identical results here — l_partkey is non-null).
    "tpch16_parts_supplied" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT p_brand, p_type, count(DISTINCT p_partkey) AS n_parts
          |FROM part
          |WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem
          |                  WHERE l_partkey = p_partkey AND l_quantity > 49)
          |GROUP BY p_brand, p_type
          |ORDER BY n_parts DESC, p_brand, p_type""".stripMargin)
    },

    // Q19 shape: disjunction of conjunctive range predicates across a join
    // (the codegen stress shape — one fused filter, no plan blowup)
    "tpch19_disjunctive_join" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 45)))
        .agg(revenue.as("revenue"), count(lit(1)).as("n"))
    },

    // Q18: large-volume customers — HAVING over a grouped fact, then join
    // back for the detail rows
    "tpch18_large_orders" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val big = li.groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 205.0)
      big.join(o, big("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    },

    // Q5: local-supplier volume — the 6-table join cycle (customer and
    // supplier must share a nation). Dimension chain broadcasts; the two
    // fact tables meet in one shuffle join; the cycle condition
    // c_nationkey = s_nationkey closes as a residual on the joined row.
    "tpch5_local_supplier_volume" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val li = Tables.load(s, dir, "lineitem")
      val su = Tables.load(s, dir, "supplier")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(su),
          li("l_suppkey") === su("s_suppkey") &&
            c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(revenue.as("rev"))
        .orderBy(col("rev").desc, col("n_name").asc)
    },

    // Q12 shape: conditional aggregation over a join — counts of
    // high/low-priority orders per line status (no shipmode column in this
    // schema; the CASE-bucketed agg over the join is the shape)
    "tpch12_priority_shipping" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      val o = Tables.load(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    },

    // Q13: customer order-count distribution — the outer-join histogram
    // (two stacked aggregations; customers with zero orders count too)
    "tpch13_customer_distribution" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q17: small-quantity-order revenue — correlated per-part average.
    // The threshold l_quantity < 0.2·avg(qty) is compared as
    // 5·qty·count < sum(qty) in EXACT decimal/integer arithmetic: a
    // double-rounded average could flip rows at the boundary between
    // engines, an exactness trick the float form cannot give.
    "tpch17_small_quantity_revenue" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part").filter(col("p_brand") === "Brand#2")
      val perPart = li.groupBy(col("l_partkey").as("ag_partkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sq"),
          count(lit(1)).as("cnt"))
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .join(perPart, li("l_partkey") === col("ag_partkey"))
        .filter(col("l_quantity").cast("decimal(18,2)") * 5 * col("cnt") < col("sq"))
        .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
    },

    // Q1 full: the 8-aggregate pricing summary. Intermediates are cast to
    // DECIMAL(12,2) so the three-factor product stays inside DECIMAL(38,6)
    // with NO scale reduction — Spark truncates scale (with rounding) on
    // decimal overflow while DuckDB widens, so an exactly-representable
    // intermediate is the only hash-stable form. Averages are exact
    // decimal sums divided by the group count, cast to double at the end.
    "tpch1_pricing_summary" -> { (s, dir) =>
      val d2 = (c: Column) => c.cast("decimal(12,2)")
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      val one = lit(1).cast("decimal(12,2)")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(d2(col("l_extendedprice")) * (one - d2(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(d2(col("l_extendedprice")) * (one - d2(col("l_discount"))) *
            (one + d2(col("l_tax")))).cast("double").as("sum_charge"),
          // exact decimal sum → double, THEN divide: decimal division
          // rounds at engine-specific scales, double division of identical
          // operands is bit-identical
          (sum(d2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(d2(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
          (sum(d2(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Q7: volume shipping between two nations — the double-dimension join
    // (nation joined twice under different roles) with a symmetric
    // either-direction predicate and a year-grouped aggregate
    "tpch7_volume_shipping" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val su = Tables.load(s, dir, "supplier")
      val n1 = Tables.load(s, dir, "nation").select(
        col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val n2 = Tables.load(s, dir, "nation").select(
        col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n1), su("s_nationkey") === col("s_nkey"))
        .join(broadcast(n2), c("c_nationkey") === col("c_nkey"))
        .filter(
          (col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19") ||
          (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(revenue.as("rev"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // Q22: wealthy inactive customers — scalar average threshold + anti
    // join. The `c_acctbal > avg(...)` comparison runs as
    // bal·count > sum in exact decimal arithmetic (same boundary-exactness
    // trick as Q17). Every synthetic customer has orders, so "inactive"
    // is adapted to "no URGENT orders" — the anti-join-on-subset shape is
    // preserved and the result set stays non-empty.
    "tpch22_inactive_customers" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val urgent = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val pos = c.filter(col("c_acctbal") > 0.0)
        .agg(sum(col("c_acctbal").cast("decimal(18,2)")).as("sbal"),
          count(lit(1)).as("nbal"))
      c.crossJoin(broadcast(pos))
        .filter(col("c_acctbal").cast("decimal(18,2)") * col("nbal") > col("sbal"))
        .join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("c_nationkey"))
    },

    // Q8: national market share — per-year ratio of one supplier-nation's
    // revenue to total revenue in a region's market. The case-sum /
    // total-sum ratio stays in exact decimals until one final double
    // division.
    "tpch8_market_share" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val c = Tables.load(s, dir, "customer")
      val su = Tables.load(s, dir, "supplier")
      val n1 = Tables.load(s, dir, "nation").select(
        col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val n2 = Tables.load(s, dir, "nation").select(
        col("n_nationkey").as("c_nkey"), col("n_regionkey").as("c_rkey"))
      val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      val volume = col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n1), su("s_nationkey") === col("s_nkey"))
        .join(broadcast(n2), c("c_nationkey") === col("c_nkey"))
        .join(broadcast(r), col("c_rkey") === r("r_regionkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_1", volume)
          .otherwise(lit(0).cast("decimal(12,2)"))).cast("double") /
          sum(volume).cast("double")).as("mkt_share"))
        .orderBy(col("o_year"))
    },

    // Q9 shape: product-type profit by nation and year (no partsupp table:
    // cost is p_retailprice·quantity, preserving the two-sided decimal
    // profit expression and the nation×year rollup)
    "tpch9_product_profit" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val p = Tables.load(s, dir, "part").filter(col("p_type") === "ECONOMY")
      val su = Tables.load(s, dir, "supplier")
      val n = Tables.load(s, dir, "nation")
      val profit =
        col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")) -
          col("p_retailprice").cast("decimal(12,2)") *
            col("l_quantity").cast("decimal(12,2)")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(profit).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // Q11 shape: important stock — per-key value share against a global
    // scalar threshold (no partsupp: value is lineitem extendedprice per
    // part). The HAVING-vs-scalar-subquery comparison stays in exact
    // decimals.
    "tpch11_important_stock" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val perPart = li.groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("value_d"))
      val total = perPart.agg(sum(col("value_d")).as("tot"),
        count(lit(1)).as("np"))
      perPart.crossJoin(broadcast(total))
        // keep parts holding > 1.5× the mean per-part value — exact
        // integer/decimal comparison value·np·2 > 3·tot (the synthetic
        // value distribution is near-uniform, so a fixed 0.1%-of-total cut
        // would select nothing)
        .filter(col("value_d") * col("np") * 2 > col("tot") * 3)
        .select(col("l_partkey"), col("value_d").cast("double").as("value"))
        .orderBy(col("value").desc, col("l_partkey").asc)
    },

    // Q21 shape: suppliers who kept orders waiting — the double-correlated
    // EXISTS / NOT EXISTS pair, decorrelated to one semi and one anti join
    // over the same multi-supplier order set ("late" = shipped > 60 days
    // after the order date, as in Q4)
    "tpch21_waiting_suppliers" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders").filter(col("o_orderstatus") === "F")
      val li = Tables.load(s, dir, "lineitem")
        .join(o.select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
      val late = li.filter(
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      val l1 = late.select(col("l_orderkey").as("k"), col("l_suppkey").as("sk"))
        .distinct()
      // EXISTS: another supplier also has a line in the order
      val others = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("sk2"))
        .distinct()
      val withOther = l1.join(others,
        col("k") === col("k2") && col("sk") =!= col("sk2"), "left_semi")
      // NOT EXISTS: no OTHER supplier was late on that order
      val otherLate = l1.select(col("k").as("k3"), col("sk").as("sk3"))
      val sole = withOther.join(otherLate,
        col("k") === col("k3") && col("sk") =!= col("sk3"), "left_anti")
      val su = Tables.load(s, dir, "supplier")
      sole.join(su, col("sk") === su("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(100)
    },

    // Q20 shape: part-supply threshold — nested aggregate feeding a semi
    // join chain. The classic "available > 0.5·shipped" needs partsupp;
    // here a supplier qualifies when it shipped MORE than 1.5× the part's
    // mean per-supplier quantity of the brand (scale-invariant, compared
    // in exact arithmetic: qty·ns·2 > tot·3).
    "tpch20_part_supply" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part").filter(col("p_brand") === "Brand#3")
      val sp = li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
      val pp = sp.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("qty")).as("tot"), count(lit(1)).as("ns"))
      val qualifying = sp.join(pp, col("l_partkey") === col("pk"))
        .filter(col("qty") * col("ns") * 2 > col("tot") * 3)
        .select(col("l_suppkey"))
      Tables.load(s, dir, "supplier")
        .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    }
  )

  val oracles: Map[String, String] = Map(
    "tpch3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY rev DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "tpch4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "tpch6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "tpch10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev
        |FROM lineitem, orders, customer, nation
        |WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey
        |  AND o_custkey = c_custkey AND c_nationkey = n_nationkey
        |  AND o_orderdate >= TIMESTAMP '1996-10-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY rev DESC, c_custkey ASC LIMIT 20""".stripMargin,

    "tpch14_promo_effect" ->
      """SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0 /
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |  AS promo_revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,

    "tpch2_min_within_group" ->
      """SELECT n_name, s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_acctbal = (SELECT min(s_acctbal) FROM supplier i
        |                   WHERE i.s_nationkey = supplier.s_nationkey)
        |ORDER BY n_name, s_name""".stripMargin,

    "tpch15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "tpch16_parts_supplied" ->
      """SELECT p_brand, p_type, count(DISTINCT p_partkey) AS n_parts
        |FROM part
        |WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND l_quantity > 49)
        |GROUP BY p_brand, p_type
        |ORDER BY n_parts DESC, p_brand, p_type""".stripMargin,

    "tpch19_disjunctive_join" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 45)""".stripMargin,

    "tpch18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  total_qty
        |FROM (SELECT l_orderkey,
        |        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 205.0) big
        |JOIN orders ON big.l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "tpch5_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY rev DESC, n_name ASC""".stripMargin,

    "tpch12_priority_shipping" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "tpch13_customer_distribution" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey) cc
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "tpch17_small_quantity_revenue" ->
      """WITH per_part AS (
        |  SELECT l_partkey AS ag_partkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
        |    count(*) AS cnt
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |  AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN per_part ON l_partkey = ag_partkey
        |WHERE p_brand = 'Brand#2'
        |  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sq""".stripMargin,

    "tpch1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) *
        |      (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE)
        |    AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "tpch7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
        |   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
        |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "tpch22_inactive_customers" ->
      """WITH pos AS (
        |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sbal, count(*) AS nbal
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_nationkey, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer, pos
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * nbal > sbal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "tpch8_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
        |  CAST(sum(CASE WHEN n1.n_name = 'NATION_1'
        |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |  AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |JOIN region ON n2.n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY year(o_orderdate) ORDER BY o_year""".stripMargin,

    "tpch9_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) -
        |    CAST(p_retailprice AS DECIMAL(12,2)) *
        |      CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_type = 'ECONOMY'
        |GROUP BY n_name, year(o_orderdate)
        |ORDER BY nation, o_year DESC""".stripMargin,

    "tpch11_important_stock" ->
      """WITH per_part AS (
        |  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_d
        |  FROM lineitem GROUP BY l_partkey),
        |tot AS (SELECT sum(value_d) AS tot, count(*) AS np FROM per_part)
        |SELECT l_partkey, CAST(value_d AS DOUBLE) AS value
        |FROM per_part, tot
        |WHERE value_d * np * 2 > tot * 3
        |ORDER BY value DESC, l_partkey ASC""".stripMargin,

    "tpch21_waiting_suppliers" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |late AS (
        |  SELECT DISTINCT l_orderkey AS k, l_suppkey AS sk FROM li
        |  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY),
        |others AS (SELECT DISTINCT l_orderkey AS k2, l_suppkey AS sk2 FROM li)
        |SELECT s_name, count(*) AS numwait
        |FROM late
        |JOIN supplier ON sk = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM others
        |              WHERE k2 = late.k AND sk2 <> late.sk)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.k = late.k AND l3.sk <> late.sk)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name ASC LIMIT 100""".stripMargin,

    "tpch20_part_supply" ->
      """WITH sp AS (
        |  SELECT l_suppkey, l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#3'
        |  GROUP BY l_suppkey, l_partkey),
        |pp AS (SELECT l_partkey, sum(qty) AS tot, count(*) AS ns FROM sp GROUP BY l_partkey)
        |SELECT s_name, s_acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM sp JOIN pp USING (l_partkey)
        |  WHERE qty * ns * 2 > tot * 3)
        |ORDER BY s_name""".stripMargin
  )
}
