package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables._

/** Block A — relational / OLAP core (SURVEY §2.A).
  *
  * The reference's analytics surface is Druid SQL over rolled-up facts
  * (see /root/reference/jupyter-notebooks/02-Query_Analysis.ipynb);
  * this block proves the equivalent warehouse-query capability on the
  * TPC-H-shaped tables, expressed as declarative DataFrame plans so
  * Catalyst performs pushdown / pruning / join planning.
  *
  * Cross-engine determinism (the DuckDB oracle hash-compares values):
  * per-row arithmetic stays in doubles (bit-identical IEEE ops in both
  * engines), aggregation casts to DECIMAL(18,6) first (exact,
  * order-independent sums), and final derived values are computed from
  * those exact sums with identical expression shapes.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** Exact-sum helper: sum(expr) as DECIMAL(18,6), emitted as double. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast(DoubleType)
  private def ts(s: String): Column = to_timestamp(lit(s))

  // ---------------------------------------------------------------- q01
  // Grouped multi-aggregate with a pushed-down scan filter (TPC-H Q1
  // shape). At 100 TB this is a single map-side-combinable hash
  // aggregate over a pruned 7-column scan — no join, one shuffle of
  // ~|groups| rows.
  private val q01: Q = (s, d) =>
    // widen: ~10 decimal aggregates per row over a single-row-group
    // scan file = one task (bytes-gated — the identity at scale,
    // where the scan fans out and the partial agg is map-side)
    graft.operators.Par.widen(
        lineitem(s, d).filter(col("l_shipdate") <= ts("2000-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q01Sql = """
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  // ---------------------------------------------------------------- q02
  // Join + global top-N. customer and nation are broadcast (dims), and
  // orderBy.limit plans as TakeOrderedAndProject — no global sort at
  // scale.
  private val q02: Q = (s, d) => {
    val o = orders(s, d)
    val c = customer(s, d)
    val n = nation(s, d)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(col("o_orderkey"), col("c_name"), col("n_name"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  private val q02Sql = """
    SELECT o_orderkey, c_name, n_name, o_totalprice
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10"""

  // ---------------------------------------------------------------- q03
  // 3-way join, aggregate, top-N (TPC-H Q3 shape). Filters reach each
  // scan before the joins; customer side broadcasts.
  private val q03: Q = (s, d) => {
    val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(s, d).filter(col("o_orderdate") < ts("1998-07-01"))
    val l = lineitem(s, d).filter(col("l_shipdate") > ts("1998-07-01"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q03Sql = """
    SELECT l_orderkey, o_orderdate, o_orderpriority,
      CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01'
      AND l_shipdate > TIMESTAMP '1998-07-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10"""

  // ---------------------------------------------------------------- q04
  // Correlated EXISTS with a range predicate (TPC-H Q4 shape) —
  // Catalyst decorrelates to a left-semi join; written as SQL to
  // exercise the subquery path end-to-end.
  private val q04: Q = (s, d) => {
    orders(s, d).createOrReplaceTempView("orders_v")
    lineitem(s, d).createOrReplaceTempView("lineitem_v")
    s.sql("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders_v o
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1996-07-01'
        AND EXISTS (SELECT 1 FROM lineitem_v l
                    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
  }

  private val q04Sql = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  // ---------------------------------------------------------------- q05
  // 5-way star join (TPC-H Q5 shape): fact-fact shuffle joins on keys,
  // all dimension sides broadcast; local-supplier condition
  // c_nationkey = s_nationkey applied post-join.
  private val q05: Q = (s, d) => {
    val l = lineitem(s, d)
    val o = orders(s, d)
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
    val c = customer(s, d)
    val su = supplier(s, d)
    val n = nation(s, d)
    val r = region(s, d).filter(col("r_name") === "ASIA")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q05Sql = """
    SELECT n_name,
      CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name"""

  // ---------------------------------------------------------------- q06
  // Highly selective single-table aggregate (TPC-H Q6 shape) — the
  // predicate and 4-column projection must reach the parquet reader
  // (PushedFilters / ReadSchema), which is what makes this cheap at
  // 100 TB.
  private val q06: Q = (s, d) =>
    lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01")
        && col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))

  private val q06Sql = """
    SELECT
      CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"""

  // ---------------------------------------------------------------- q07
  // Left-semi join (EXISTS). Semi-join avoids materializing the
  // right side's columns; with a small filtered build side Spark
  // broadcasts it.
  private val q07: Q = (s, d) => {
    val urgent = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    customer(s, d)
      .join(urgent, col("c_custkey") === urgent("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  private val q07Sql = """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    ORDER BY c_custkey"""

  // ---------------------------------------------------------------- q08
  // Left-anti join (NOT EXISTS).
  private val q08: Q = (s, d) => {
    val big = orders(s, d).filter(col("o_totalprice") > 100000.0)
    customer(s, d)
      .join(big, col("c_custkey") === big("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  private val q08Sql = """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0)
    ORDER BY c_custkey"""

  // ---------------------------------------------------------------- q09
  // ROLLUP hierarchical aggregation (Druid-style rollup cube over
  // dimensions). Spark expands grouping sets in a single shuffle.
  private val q09: Q = (s, d) =>
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  private val q09Sql = """
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
      COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""

  // ---------------------------------------------------------------- q21
  // Full CUBE with GROUPING() markers (distinguishes "null dimension
  // value" from "aggregated-away dimension").
  private val q21: Q = (s, d) =>
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_price"),
        grouping(col("o_orderstatus")).as("g_status"),
        grouping(col("o_orderpriority")).as("g_prio"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"),
        col("g_status"), col("g_prio"))

  private val q21Sql = """
    SELECT o_orderstatus, o_orderpriority,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price,
      CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_status,
      CAST(GROUPING(o_orderpriority) AS TINYINT) AS g_prio
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST, g_status, g_prio"""

  // ---------------------------------------------------------------- q10
  // Exact multi-column COUNT DISTINCT (Spark plans expand + two-phase
  // aggregate; distinct keys shuffle once).
  private val q10: Q = (s, d) =>
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(date_trunc("month", col("o_orderdate"))).as("n_months"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  private val q10Sql = """
    SELECT o_orderpriority,
      COUNT(DISTINCT o_custkey) AS n_customers,
      COUNT(DISTINCT date_trunc('month', o_orderdate)) AS n_months,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  // ---------------------------------------------------------------- q11
  // Top-N per group via the custom TopKPerGroup operator (bounded
  // per-group heaps after one hash shuffle — see graft.plans.TopKPlan;
  // the ROW_NUMBER window formulation it replaces sorts every group's
  // full row set). Hash-matches the windowed DuckDB oracle.
  private val q11: Q = (s, d) =>
    graft.plans.TopK.perGroup(part(s, d),
        groupCols = Seq("p_brand"),
        orders = Seq(("p_retailprice", true), ("p_partkey", false)),
        k = 3)
      .select(col("p_brand"), col("rn"), col("p_partkey"), col("p_retailprice"))
      .orderBy(col("p_brand"), col("rn"))

  private val q11Sql = """
    SELECT p_brand, rn, p_partkey, p_retailprice
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
        ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part) t
    WHERE rn <= 3
    ORDER BY p_brand, rn"""

  // ---------------------------------------------------------------- q12
  // UNION ALL + conditional (CASE) aggregation — the reference's
  // multi-branch Druid queries union per-metric branches
  // (02-Query_Analysis get_top_by_multiple_metrics).
  private val q12: Q = (s, d) => {
    val o = orders(s, d)
    val open = o.filter(col("o_orderstatus") === "O").withColumn("bucket", lit("open"))
    val done = o.filter(col("o_orderstatus") === "F").withColumn("bucket", lit("done"))
    open.unionByName(done)
      .groupBy(col("bucket"), col("o_orderpriority"))
      .agg(
        dsum(col("o_totalprice")).as("total_price"),
        dsum(when(col("o_totalprice") > 50000.0, col("o_totalprice")).otherwise(0.0)).as("big_price"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("bucket"), col("o_orderpriority"))
  }

  private val q12Sql = """
    SELECT bucket, o_orderpriority,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price,
      CAST(SUM(CAST(CASE WHEN o_totalprice > 50000.0 THEN o_totalprice ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) AS big_price,
      COUNT(*) AS n_orders
    FROM (
      SELECT 'open' AS bucket, o_orderpriority, o_totalprice FROM orders WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT 'done' AS bucket, o_orderpriority, o_totalprice FROM orders WHERE o_orderstatus = 'F') t
    GROUP BY bucket, o_orderpriority
    ORDER BY bucket, o_orderpriority"""

  // ---------------------------------------------------------------- q19
  // Scalar aggregate subquery (price above corpus average) — planned
  // as a single-row broadcast.
  // Threshold 1.02× (not 1.5×): retail prices span only 900–999.9
  // (max/avg ≈ 1.05), so larger multipliers yield 0 rows and the gate
  // hash-matches vacuously. The average is a decimal-sum / count
  // (order-independent) rather than AVG over doubles, whose
  // accumulation order differs between engines for boundary rows.
  private val q19: Q = (s, d) => {
    part(s, d).createOrReplaceTempView("part_v")
    s.sql("""
      SELECT p_partkey, p_brand, p_retailprice
      FROM part_v
      WHERE p_retailprice > 1.02 * (
        SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) FROM part_v)
      ORDER BY p_partkey""")
  }

  private val q19Sql = """
    SELECT p_partkey, p_brand, p_retailprice
    FROM part
    WHERE p_retailprice > 1.02 * (
      SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) FROM part)
    ORDER BY p_partkey"""

  // ---------------------------------------------------------------- q20
  // Nested IN over an aggregate-filtered subquery (TPC-H Q18 shape):
  // big-quantity orders by key, decorrelated into a join on the
  // grouped HAVING result.
  private val q20: Q = (s, d) => {
    orders(s, d).createOrReplaceTempView("orders_v")
    lineitem(s, d).createOrReplaceTempView("lineitem_v")
    s.sql("""
      SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
      FROM orders_v o
      WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem_v
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 140)
      ORDER BY o.o_orderkey""")
  }

  private val q20Sql = """
    SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
    FROM orders o
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 140)
    ORDER BY o.o_orderkey"""

  // ---------------------------------------------------------------- q13
  // Approximate COUNT DISTINCT (HyperLogLog++) — Druid-style approx
  // distinct; constant memory per group at any scale. No DuckDB
  // oracle (different sketch) → rows-only check + ScalaTest bound.
  private val q13: Q = (s, d) =>
    events(s, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  val entries: Map[String, Q] = Map(
    "q04_correlated_exists" -> q04,
    "q19_scalar_subquery" -> q19,
    "q20_nested_in_having" -> q20,
    "q21_cube_grouping" -> q21,
    "q01_pricing_summary" -> q01,
    "q02_top_orders" -> q02,
    "q03_shipping_priority" -> q03,
    "q05_region_revenue" -> q05,
    "q06_selective_agg" -> q06,
    "q07_semi_join" -> q07,
    "q08_anti_join" -> q08,
    "q09_rollup" -> q09,
    "q10_count_distinct" -> q10,
    "q11_window_topn_per_group" -> q11,
    "q12_union_conditional" -> q12,
    "q13_approx_distinct" -> q13)

  val oracles: Map[String, String] = Map(
    "q04_correlated_exists" -> q04Sql,
    "q19_scalar_subquery" -> q19Sql,
    "q20_nested_in_having" -> q20Sql,
    "q21_cube_grouping" -> q21Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_top_orders" -> q02Sql,
    "q03_shipping_priority" -> q03Sql,
    "q05_region_revenue" -> q05Sql,
    "q06_selective_agg" -> q06Sql,
    "q07_semi_join" -> q07Sql,
    "q08_anti_join" -> q08Sql,
    "q09_rollup" -> q09Sql,
    "q10_count_distinct" -> q10Sql,
    "q11_window_topn_per_group" -> q11Sql,
    "q12_union_conditional" -> q12Sql)
}
