package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}

import graft.Tables._

/** Extended SQL surface (SURVEY §2.F): the remaining query classes a
  * Druid-SQL user of the reference exercises — JSON label extraction
  * (metrics_db's `metric.labels` json dimension), general window
  * functions, date dimensions, and quantiles.
  */
object Extended {
  type Q = (SparkSession, String) => DataFrame

  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast(DoubleType)

  // --------------------------------------------------- qan_label_metrics
  // metrics_db_ingestion.json models labels as a JSON dimension; the
  // events table's `props` JSON column plays that role. Extraction is
  // a shared-regex pull (identical semantics in both engines), rolled
  // up per (bucket, metric).
  private val qanLabelMetrics: Q = (s, d) =>
    events(s, d)
      .withColumn("label_k", nullif(regexp_extract(col("props"), "\"k\": ([0-9]+)", 1), lit("")).cast(IntegerType))
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("label_k")).as("sum_k"),
        min(col("label_k")).as("min_k"),
        max(col("label_k")).as("max_k"))
      .withColumn("avg_k", col("sum_k").cast(DoubleType) / col("n").cast(DoubleType))
      .orderBy(col("bucket"), col("event_type"))

  private val qanLabelMetricsSql = """
    WITH e AS (
      SELECT date_trunc('hour', ts) AS bucket, event_type,
        CAST(NULLIF(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS INT) AS label_k
      FROM events)
    SELECT bucket, event_type, COUNT(*) AS n,
      CAST(SUM(label_k) AS BIGINT) AS sum_k, MIN(label_k) AS min_k, MAX(label_k) AS max_k,
      CAST(SUM(label_k) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_k
    FROM e
    GROUP BY 1, 2
    ORDER BY 1, 2"""

  // --------------------------------------------------- q14_window_suite
  // The window-function family beyond ROW_NUMBER: rank, dense_rank,
  // lag/lead, and a running sum — per customer over their orders.
  private val q14: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d)
      .filter(col("o_custkey") < 50)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        rank().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))).as("price_rank"),
        dense_rank().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderpriority"))).as("prio_rank"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        sum(col("o_totalprice").cast(DecimalType(18, 6)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType).as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q14Sql = """
    SELECT o_custkey, o_orderkey, o_orderdate,
      RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
      DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS prio_rank,
      LAG(o_totalprice, 1) OVER w AS prev_price,
      LEAD(o_totalprice, 1) OVER w AS next_price,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey"""

  // --------------------------------------------------- q15_date_dims
  // Date-dimension extraction + grouping (time_floor analytics over
  // calendar parts instead of fixed buckets).
  private val q15: Q = (s, d) =>
    orders(s, d)
      .groupBy(
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
      .orderBy(col("y"), col("q"), col("m"))

  private val q15Sql = """
    SELECT CAST(year(o_orderdate) AS INT) AS y,
      CAST(quarter(o_orderdate) AS INT) AS q,
      CAST(month(o_orderdate) AS INT) AS m,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3"""

  // --------------------------------------------------- q16_percentiles
  // Exact interpolated percentiles per group (Druid exposes
  // APPROX_QUANTILE; the exact form is the verifiable baseline and
  // Spark's `percentile` matches DuckDB's quantile_cont interpolation).
  private val q16: Q = (s, d) =>
    // (widen measured a wash here — merging 32 partial percentile
    // value buffers costs what the parallel build saves; left alone)
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      // ONE percentile buffer for all three cut points: three separate
      // percentile() aggregates each accumulate their own value map
      // (3× the map-side work and merge traffic for identical state)
      .agg(
        expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("ps"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        expr("round(ps[0], 4)").as("p50"),
        expr("round(ps[1], 4)").as("p90"),
        expr("round(ps[2], 4)").as("p99"),
        col("n"))
      .orderBy(col("l_returnflag"))

  private val q16Sql = """
    SELECT l_returnflag,
      ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
      ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
      COUNT(*) AS n
    FROM lineitem
    GROUP BY 1
    ORDER BY 1"""

  // --------------------------------------------------- q17_string_funcs
  // String-function family over part names.
  private val q17: Q = (s, d) =>
    part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        when(col("p_name").like("%green%"), 1).otherwise(0).as("is_green"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"))
      .orderBy(col("p_partkey"))

  private val q17Sql = """
    SELECT p_partkey,
      upper(p_brand) AS brand_u,
      length(p_name) AS name_len,
      substr(p_name, 1, 5) AS name_pfx,
      concat_ws('|', p_brand, p_type) AS brand_type,
      CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS is_green,
      regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels
    FROM part
    ORDER BY p_partkey"""

  // --------------------------------------------------- qan_sessionize
  // Gap-based sessionization of the event log (6h inactivity gap):
  // the classic log-analytics operator; one shuffle on the entity key
  // (operators.Temporal.sessionize).
  private val qanSessionize: Q = (s, d) =>
    graft.operators.Temporal.sessionize(events(s, d), Seq("user_id"), "ts", gapSec = 21600)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"),
        max(col("ts")).as("end_ts"),
        dsum(col("value")).as("total_value"))
      .orderBy(col("user_id"), col("session_id"))

  private val qanSessionizeSql = """
    WITH flagged AS (
      SELECT user_id, ts, value,
        CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
               OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 21600000000
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
      SELECT user_id, ts, value,
        CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id, COUNT(*) AS n_events,
      MIN(ts) AS start_ts, MAX(ts) AS end_ts,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY 1, 2
    ORDER BY 1, 2"""

  // --------------------------------------------------- qan_asof_enrich
  // Backward as-of join: each event enriched with the customer's most
  // recent order at event time (operators.Temporal.asofBackward —
  // tagged-union + window, one shuffle; the oracle uses DuckDB's
  // native ASOF JOIN). Right side deduped to one row per (key, ts).
  private val qanAsofEnrich: Q = (s, d) => {
    val dedupedOrders = orders(s, d)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_custkey"), col("o_orderdate")).orderBy(col("o_orderkey").desc)))
      .filter(col("rn") === 1).drop("rn")
    graft.operators.Temporal.asofBackward(
        events(s, d).select(col("event_id"), col("user_id"), col("ts")),
        dedupedOrders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate",
        rightPayload = Seq("o_orderkey", "o_orderdate", "o_totalprice"))
      .orderBy(col("event_id"))
  }

  private val qanAsofEnrichSql = """
    WITH deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                     ORDER BY o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1)
    SELECT e.event_id, e.user_id, e.ts, d.o_orderkey, d.o_orderdate, d.o_totalprice
    FROM events e
    ASOF LEFT JOIN deduped d
      ON e.user_id = d.o_custkey AND e.ts >= d.o_orderdate
    ORDER BY e.event_id"""

  // --------------------------------------------------- q18_approx_percentile
  // Druid-style APPROX_QUANTILE: bounded-memory sketch percentiles
  // (constant state per group at any scale). Different sketch than
  // DuckDB → rows-only; AnnSpec bounds its error against q16's exact
  // percentiles.
  private val q18: Q = (s, d) =>
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)").as("pcts"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        element_at(col("pcts"), 1).as("p50"),
        element_at(col("pcts"), 2).as("p90"),
        element_at(col("pcts"), 3).as("p99"),
        col("n"))
      .orderBy(col("l_returnflag"))

  // ------------------------------------------------------ q22_range_join
  // Range (interval) join with NO equality key: events against global
  // time windows. Spark's native plan for a pure inequality join is a
  // broadcast nested loop — O(|events|·|windows|) compares. The scale
  // path is bucket decomposition: each window explodes into the hour
  // buckets it covers, each event maps to its single hour bucket, and
  // the join becomes an EQUI-join on bucket followed by the exact
  // range filter. Each event meets each window at most once (one
  // bucket per event, distinct buckets per window), so no dedup stage
  // is needed. PlanSpec pins the no-nested-loop guarantee. The oracle
  // is the naive inequality join — same answer, different plan class.
  private val hourUs = 3600L * 1000000L
  private val q22: Q = (s, d) => {
    val win = s.range(40).toDF("w_id")
      .withColumn("w_start",
        timestamp_micros(lit(1704067200000000L) + col("w_id") * (17L * hourUs)))
      .withColumn("w_end", timestamp_micros(unix_micros(col("w_start")) + 5L * hourUs))
    val winBuckets = win.withColumn("bucket", explode(expr(
      s"sequence(unix_micros(w_start) div $hourUs, (unix_micros(w_end) - 1) div $hourUs)")))
    events(s, d)
      .withColumn("bucket", expr(s"unix_micros(ts) div $hourUs"))
      .join(winBuckets, Seq("bucket"))
      .where(col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .groupBy(col("w_id"), col("w_start"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy(col("w_id"))
  }

  // 1704067200000000 us = 2024-01-01 00:00:00 UTC (the corpus epoch)
  private val q22Sql = """
    WITH w AS (
      SELECT i AS w_id,
        TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (i * 17) HOUR AS w_start
      FROM range(40) t(i))
    SELECT w.w_id, w.w_start, COUNT(*) AS n_events,
      CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM w JOIN events e
      ON e.ts >= w.w_start AND e.ts < w.w_start + INTERVAL 5 HOUR
    GROUP BY 1, 2
    ORDER BY 1"""

  // --------------------------------------------------- qan_anomaly_mad
  // Robust per-key outlier detection — the "this query suddenly
  // behaves differently" alert a QAN service raises: per (instance,
  // digest) the median and the median absolute deviation (robust to
  // the very outliers being hunted, unlike mean/stddev), then flag
  // events beyond 3 scaled MADs (1.4826·MAD ≈ σ under normality).
  // Distributed shape: two small per-key aggregates broadcast back
  // onto the stream — the event table itself shuffles once per
  // aggregate and never sorts globally; exact `percentile` per key is
  // the honest small-key-count path (the sketch path is q18's
  // approx_percentile, same pairing as q16).
  private val qanAnomalyMad: Q = (s, d) => {
    val ev = events(s, d)
    val med = ev.groupBy(col("user_id"), col("event_type"))
      .agg(expr("percentile(value, 0.5D)").as("med"))
    val dev = ev.join(broadcast(med), Seq("user_id", "event_type"))
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy(col("user_id"), col("event_type"))
      .agg(expr("percentile(adev, 0.5D)").as("mad"))
    dev.join(broadcast(mad), Seq("user_id", "event_type"))
      .filter(col("mad") > 0)
      .withColumn("score", (col("value") - col("med")) / (lit(1.4826) * col("mad")))
      .filter(abs(col("score")) > 3.0)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
        round(col("score"), 4).as("score"))
      .orderBy(col("event_id"))
  }

  private val qanAnomalyMadSql = """
    WITH med AS (
      SELECT user_id, event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1, 2),
    dev AS (
      SELECT e.event_id, e.user_id, e.event_type, e.value, m.med,
        abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (user_id, event_type)),
    mad AS (
      SELECT user_id, event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY 1, 2)
    SELECT d.event_id, d.user_id, d.event_type, d.value,
      ROUND(d.med, 6) AS med, ROUND(m.mad, 6) AS mad,
      ROUND((d.value - d.med) / (1.4826 * m.mad), 4) AS score
    FROM dev d JOIN mad m USING (user_id, event_type)
    WHERE m.mad > 0
      AND abs((d.value - d.med) / (1.4826 * m.mad)) > 3.0
    ORDER BY d.event_id"""

  // -------------------------------------------------------- q23_pivot
  // PIVOT: order counts and totals cross-tabbed priority × status —
  // the wide-format report shape BI layers ask of a warehouse. Spark's
  // .pivot with EXPLICIT values compiles to one hash aggregate of
  // conditional aggregates (no values-discovery pre-query, no extra
  // pass): same single-shuffle plan as any groupBy at 100 TB. Totals
  // go through DECIMAL(18,2) so each cell is an exact cents sum.
  private val q23Pivot: Q = (s, d) => {
    val pivoted = orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType), 2)
          .as("total"))
    // an empty cell pivots to NULL, but an empty COUNT is 0 — align
    // the count cells (totals stay NULL: no orders, no sum) so the
    // result doesn't depend on every cell being populated
    Seq("F", "O", "P").foldLeft(pivoted) { (df, v) =>
      df.withColumn(s"${v}_cnt", coalesce(col(s"${v}_cnt"), lit(0L)))
    }.orderBy(col("o_orderpriority"))
  }

  private val q23PivotSql = {
    val cells = Seq("F", "O", "P").map { v =>
      s"""CAST(SUM(CASE WHEN o_orderstatus = '$v' THEN 1 ELSE 0 END) AS BIGINT) AS "${v}_cnt",
      ROUND(CAST(SUM(CASE WHEN o_orderstatus = '$v' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS "${v}_total""""
    }.mkString(",\n      ")
    s"""
    SELECT o_orderpriority,
      $cells
    FROM orders
    GROUP BY 1
    ORDER BY 1"""
  }

  // ------------------------------------------------------ q24_set_ops
  // INTERSECT / EXCEPT set operations (distinct semantics): customers
  // who ordered in BOTH 1995 and 1996, minus those with an open 1997
  // order. Spark plans each as an aggregate + semi/anti join on the
  // key — the same shuffle shape as q07/q08, no global sort at scale.
  private val q24SetOps: Q = (s, d) => {
    val o = orders(s, d)
    def custsIn(cond: org.apache.spark.sql.Column) =
      o.filter(cond).select(col("o_custkey"))
    custsIn(year(col("o_orderdate")) === 1995)
      .intersect(custsIn(year(col("o_orderdate")) === 1996))
      .except(custsIn(year(col("o_orderdate")) === 1997 &&
        col("o_orderstatus") === "O"))
      .orderBy(col("o_custkey"))
  }

  private val q24SetOpsSql = """
    (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
     INTERSECT
     SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
      AND o_orderstatus = 'O'
    ORDER BY o_custkey"""

  // -------------------------------------------------- q25_window_dist
  // Distribution window family: ntile / percent_rank / cume_dist —
  // the remaining rank-class window functions next to q14's suite.
  // The ORDER BY carries the key as a tiebreak so every rank is
  // deterministic (equal totalprice values would otherwise make
  // percent_rank engine-dependent). One hash shuffle on the partition
  // key, per-partition sort — the standard window shape at scale.
  private val q25WindowDist: Q = (s, d) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders(s, d)
      .filter(col("o_orderkey") % 20 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy(col("o_orderkey"))
  }

  private val q25WindowDistSql = """
    SELECT o_orderkey, o_orderpriority, o_totalprice,
      ntile(4) OVER wp AS quartile,
      ROUND(percent_rank() OVER wp, 6) AS pct_rank,
      ROUND(cume_dist() OVER wp, 6) AS cume
    FROM orders
    WHERE o_orderkey % 20 = 0
    WINDOW wp AS (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey"""

  // ------------------------------------------------ q26_grouping_sets
  // Explicit GROUPING SETS — the general form behind q09's ROLLUP and
  // q21's CUBE: an arbitrary set list ((flag, status), (flag), ()),
  // with grouping_id() disambiguating aggregated-out NULLs. Spark
  // plans one Expand + one hash aggregate — a single pass over the
  // fact table regardless of how many sets are requested.
  private val q26GroupingSets: Q = (s, d) =>
    lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("sum_qty"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  private val q26GroupingSetsSql = """
    SELECT l_returnflag, l_linestatus,
      CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      COUNT(*) AS n,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY gid, l_returnflag, l_linestatus"""

  // --------------------------------------------------- q28_table_profile
  // Single-pass table profiler — the data-quality pass every
  // warehouse runs before trusting a feed: per column, null count,
  // exact NDV, and type-appropriate min/max (numerics as doubles;
  // strings and timestamps through one shared formatted-string slot).
  // ALL columns profile in ONE scan: a single aggregate computes
  // every statistic, then a stack() unpivot reshapes the one-row
  // result to a row per column — no per-column re-scan, no
  // self-union of the table.
  //
  // 100 TB shape: the multi-distinct aggregate compiles to Spark's
  // Expand (input ×(|distinct cols|+1) before the partial aggregate)
  // — the documented price of EXACT NDV in one pass. The at-scale
  // default is the sketch profile (approx_count_distinct, the same
  // HLL as q13) where the expand disappears; this exact form is its
  // audit, the same pairing as q13/q10.
  private val q28TableProfile: Q = (s, d) => {
    // widen: the Expand ×(distinct cols + 1) partial aggregate is
    // CPU-per-row work over a single small scan file = one task
    // (bytes-gated — at scale the scan fans out and this is the
    // identity)
    val t = graft.operators.Par.widen(orders(s, d))
    val num = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val str = Seq("o_orderstatus", "o_orderpriority")
    val ts = Seq("o_orderdate")
    val aggs =
      Seq(count(lit(1)).as("n_rows")) ++
        (num ++ str ++ ts).flatMap { c =>
          Seq(count(col(c)).as(s"nn_$c"), countDistinct(col(c)).as(s"ndv_$c"))
        } ++
        num.flatMap(c => Seq(
          min(col(c)).cast(DoubleType).as(s"mn_$c"),
          max(col(c)).cast(DoubleType).as(s"mx_$c"))) ++
        str.flatMap(c => Seq(min(col(c)).as(s"ms_$c"), max(col(c)).as(s"xs_$c"))) ++
        ts.flatMap(c => Seq(
          date_format(min(col(c)), "yyyy-MM-dd HH:mm:ss").as(s"ms_$c"),
          date_format(max(col(c)), "yyyy-MM-dd HH:mm:ss").as(s"xs_$c")))
    val one = t.agg(aggs.head, aggs.tail: _*)
    val rows =
      num.map(c =>
        s"'$c', n_rows - nn_$c, ndv_$c, mn_$c, mx_$c, CAST(NULL AS STRING), CAST(NULL AS STRING)") ++
        (str ++ ts).map(c =>
          s"'$c', n_rows - nn_$c, ndv_$c, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), ms_$c, xs_$c")
    one.select(expr(
        s"stack(${rows.length}, ${rows.mkString(", ")}) " +
          "AS (column_name, n_null, ndv, min_num, max_num, min_str, max_str)"))
      .orderBy(col("column_name"))
  }

  private val q28TableProfileSql: String = {
    val num = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val str = Seq("o_orderstatus", "o_orderpriority")
    val ts = Seq("o_orderdate")
    val aggs =
      Seq("COUNT(*) AS n_rows") ++
        (num ++ str ++ ts).flatMap(c =>
          Seq(s"COUNT($c) AS nn_$c", s"COUNT(DISTINCT $c) AS ndv_$c")) ++
        num.flatMap(c => Seq(
          s"CAST(MIN($c) AS DOUBLE) AS mn_$c", s"CAST(MAX($c) AS DOUBLE) AS mx_$c")) ++
        str.flatMap(c => Seq(s"MIN($c) AS ms_$c", s"MAX($c) AS xs_$c")) ++
        ts.flatMap(c => Seq(
          s"strftime(MIN($c), '%Y-%m-%d %H:%M:%S') AS ms_$c",
          s"strftime(MAX($c), '%Y-%m-%d %H:%M:%S') AS xs_$c"))
    val selects =
      num.map(c => s"""SELECT '$c' AS column_name, n_rows - nn_$c AS n_null,
          ndv_$c AS ndv, mn_$c AS min_num, mx_$c AS max_num,
          CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM a""") ++
        (str ++ ts).map(c => s"""SELECT '$c', n_rows - nn_$c, ndv_$c,
          CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), ms_$c, xs_$c FROM a""")
    s"""
    WITH a AS (SELECT ${aggs.mkString(", ")} FROM orders)
    ${selects.mkString("\n    UNION ALL\n    ")}
    ORDER BY column_name"""
  }

  val entries: Map[String, Q] = Map(
    "q23_pivot" -> q23Pivot,
    "q24_set_ops" -> q24SetOps,
    "q25_window_dist" -> q25WindowDist,
    "q26_grouping_sets" -> q26GroupingSets,
    "qan_anomaly_mad" -> qanAnomalyMad,
    "q22_range_join" -> q22,
    "q28_table_profile" -> q28TableProfile,
    "q18_approx_percentile" -> q18,
    "qan_sessionize" -> qanSessionize,
    "qan_asof_enrich" -> qanAsofEnrich,
    "qan_label_metrics" -> qanLabelMetrics,
    "q14_window_suite" -> q14,
    "q15_date_dims" -> q15,
    "q16_percentiles" -> q16,
    "q17_string_funcs" -> q17)

  val oracles: Map[String, String] = Map(
    "q23_pivot" -> q23PivotSql,
    "q24_set_ops" -> q24SetOpsSql,
    "q25_window_dist" -> q25WindowDistSql,
    "q26_grouping_sets" -> q26GroupingSetsSql,
    "qan_anomaly_mad" -> qanAnomalyMadSql,
    "qan_sessionize" -> qanSessionizeSql,
    "qan_asof_enrich" -> qanAsofEnrichSql,
    "qan_label_metrics" -> qanLabelMetricsSql,
    "q14_window_suite" -> q14Sql,
    "q15_date_dims" -> q15Sql,
    "q16_percentiles" -> q16Sql,
    "q17_string_funcs" -> q17Sql,
    "q22_range_join" -> q22Sql,
    "q28_table_profile" -> q28TableProfileSql)
}
