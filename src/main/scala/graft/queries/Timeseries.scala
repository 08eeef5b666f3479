package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables._

/** Time-series analytics surface (SURVEY §2.B additions, round 5):
  * the remaining Druid-class operations a monitoring UI issues against
  * the rollup tables — gap-filled continuous series (Druid lacks them;
  * every dashboard reimplements LOCF client-side), topN with an
  * "(others)" remainder bucket (Druid's native topN query type,
  * jupyter-notebooks/02-Query_Analysis.ipynb renders exactly this
  * shape), and period-over-period change alerts (the QAN workflow's
  * "did this digest regress since yesterday" question).
  */
object Timeseries {
  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------- qan_gapfill
  // Gap-filled per-series daily totals with LOCF (last observation
  // carried forward) — the time_bucket_gapfill/locf operation of
  // TimescaleDB-class stores, over the QAN (instance, digest) series.
  //
  // 100 TB shape: the observed rollup is one hash aggregate; the spine
  // is generated per key from its own [min, max] bucket range
  // (sequence + explode — bounded by retention horizon, never a global
  // calendar cross-join); the spine⋈observed join is an equi-join on
  // (key, bucket); LOCF is one window per key. No node ever sees more
  // than one key-partition's spine.
  private val qanGapfill: Q = (s, d) => {
    val base = events(s, d)
      .groupBy(col("user_id"), col("event_type"),
        date_trunc("day", col("ts")).as("bucket"))
      .agg(sum(col("value").cast(DecimalType(18, 6))).as("dv"),
        count(lit(1)).as("n_events"))
    val spine = base
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("user_id"), col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("bucket"))
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(base, Seq("user_id", "event_type", "bucket"), "left")
      .withColumn("filled_value",
        round(last(col("dv"), ignoreNulls = true).over(w).cast(DoubleType), 4))
      .select(col("user_id"), col("event_type"), col("bucket"),
        col("filled_value"),
        col("dv").isNull.as("was_gap"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy(col("user_id"), col("event_type"), col("bucket"))
  }

  private val qanGapfillSql = """
    WITH base AS (
      SELECT user_id, event_type, date_trunc('day', ts) AS bucket,
        SUM(CAST(value AS DECIMAL(18,6))) AS dv,
        COUNT(*) AS n_events
      FROM events GROUP BY 1, 2, 3),
    spine AS (
      SELECT user_id, event_type,
        unnest(generate_series(MIN(bucket), MAX(bucket), INTERVAL 1 DAY)) AS bucket
      FROM base GROUP BY 1, 2),
    j AS (
      SELECT s.user_id, s.event_type, s.bucket, b.dv, b.n_events
      FROM spine s LEFT JOIN base b USING (user_id, event_type, bucket))
    SELECT user_id, event_type, bucket,
      ROUND(CAST(last_value(dv IGNORE NULLS) OVER (
        PARTITION BY user_id, event_type ORDER BY bucket
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS filled_value,
      dv IS NULL AS was_gap,
      COALESCE(n_events, 0) AS n_events
    FROM j
    ORDER BY user_id, event_type, bucket"""

  // --------------------------------------------------- qan_topn_others
  // Druid's native topN query shape: the K heaviest dimension values by
  // a metric, plus ONE "(others)" row aggregating the remainder, with
  // each row's share of the grand total — what the reference notebooks
  // render as "top queries" pie/bar charts without dropping the tail.
  //
  // 100 TB shape: the corpus collapses through one map-side-combined
  // hash aggregate to |dimension| rows BEFORE any ranking; the
  // ranking itself is Ranking.globalRowNumber — range-partitioned
  // two-phase rank, so even a 10⁷-digest dimension never funnels
  // through a single-partition window — and the grand-total broadcast
  // runs on the collapsed aggregate, never on raw data. Sums stay
  // DECIMAL through the re-group so the "(others)" fold is
  // order-independent.
  private val qanTopnOthers: Q = (s, d) => {
    val agg = events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("calls"),
        sum(col("value").cast(DecimalType(18, 6))).as("tv"))
    val ranked = graft.operators.Ranking.globalRowNumber(
      agg, Seq(col("tv").desc, col("event_type")), "rk")
    val grand = agg.agg(sum(col("tv")).as("gv"))
    ranked
      .withColumn("bucket_name",
        when(col("rk") <= 3, col("event_type")).otherwise(lit("(others)")))
      .groupBy(col("bucket_name"))
      .agg(sum(col("calls")).as("calls"),
        sum(col("tv")).as("tv2"),
        min(col("rk")).as("rank"),
        count(lit(1)).as("n_merged"))
      .crossJoin(broadcast(grand))
      .select(col("bucket_name"), col("rank"), col("n_merged"), col("calls"),
        round(col("tv2").cast(DoubleType), 4).as("total_value"),
        round(col("tv2").cast(DoubleType) / col("gv").cast(DoubleType), 6)
          .as("share"))
      .orderBy(col("rank"))
  }

  private val qanTopnOthersSql = """
    WITH agg AS (
      SELECT event_type, COUNT(*) AS calls,
        SUM(CAST(value AS DECIMAL(18,6))) AS tv
      FROM events GROUP BY 1),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY tv DESC, event_type) AS rk
      FROM agg),
    grand AS (SELECT SUM(tv) AS gv FROM agg),
    folded AS (
      SELECT CASE WHEN rk <= 3 THEN event_type ELSE '(others)' END AS bucket_name,
        CAST(SUM(calls) AS BIGINT) AS calls, SUM(tv) AS tv2,
        MIN(rk) AS rank, COUNT(*) AS n_merged
      FROM ranked GROUP BY 1)
    SELECT bucket_name, rank, n_merged, calls,
      ROUND(CAST(tv2 AS DOUBLE), 4) AS total_value,
      ROUND(CAST(tv2 AS DOUBLE) / CAST(gv AS DOUBLE), 6) AS share
    FROM folded, grand
    ORDER BY rank"""

  // ----------------------------------------------- qan_percent_change
  // Period-over-period regression detection: each (instance, digest)
  // day total vs its previous OBSERVED day, as a percent change, with
  // an alert flag past ±50% — the "did this query's cost jump since
  // yesterday" QAN alert (the behavior-change complement of
  // qan_anomaly_mad's distributional outliers).
  //
  // 100 TB shape: one hash aggregate to day grain, then a single lag
  // window per key — the same single-shuffle pattern as
  // qan_snapshot_delta, so the plan is identical at any scale. The
  // delta is computed on exact DECIMAL sums; only the final ratio is
  // double, so the alert flag cannot flap across engines/partitionings.
  private val qanPercentChange: Q = (s, d) => {
    val base = events(s, d)
      .groupBy(col("user_id"), col("event_type"),
        date_trunc("day", col("ts")).as("bucket"))
      .agg(sum(col("value").cast(DecimalType(18, 6))).as("dv"),
        count(lit(1)).as("n_calls"))
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("bucket"))
    base
      .withColumn("prev", lag(col("dv"), 1).over(w))
      .withColumn("pct_change",
        when(col("prev").isNotNull && col("prev") =!= 0,
          round((col("dv") - col("prev")).cast(DoubleType)
            / col("prev").cast(DoubleType), 6)))
      .select(col("user_id"), col("event_type"), col("bucket"), col("n_calls"),
        round(col("dv").cast(DoubleType), 4).as("day_value"),
        round(col("prev").cast(DoubleType), 4).as("prev_value"),
        col("pct_change"),
        coalesce(abs(col("pct_change")) > 0.5, lit(false)).as("alert"))
      .orderBy(col("user_id"), col("event_type"), col("bucket"))
  }

  private val qanPercentChangeSql = """
    WITH base AS (
      SELECT user_id, event_type,
        CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        SUM(CAST(value AS DECIMAL(18,6))) AS dv,
        COUNT(*) AS n_calls
      FROM events GROUP BY 1, 2, 3),
    lagged AS (
      SELECT *, LAG(dv, 1) OVER (
        PARTITION BY user_id, event_type ORDER BY bucket) AS prev
      FROM base),
    pc AS (
      SELECT *, CASE WHEN prev IS NOT NULL AND prev <> 0
        THEN ROUND(CAST(dv - prev AS DOUBLE) / CAST(prev AS DOUBLE), 6)
        END AS pct_change
      FROM lagged)
    SELECT user_id, event_type, bucket, n_calls,
      ROUND(CAST(dv AS DOUBLE), 4) AS day_value,
      ROUND(CAST(prev AS DOUBLE), 4) AS prev_value,
      pct_change,
      COALESCE(abs(pct_change) > 0.5, false) AS alert
    FROM pc
    ORDER BY user_id, event_type, bucket"""

  // -------------------------------------------------------- qan_funnel
  // Ordered event-sequence funnel: per user the first `view`, the
  // first `click` strictly AFTER it, and the first `purchase` strictly
  // after that — the stage-reached report every behavioral-analytics
  // store (Druid via theta sketches, product-analytics SQL) answers.
  //
  // 100 TB shape: each stage is one filtered aggregate + one equi-join
  // on the user key — min-ts chaining, never a per-user ordered scan
  // or a window over raw events. Stages prune hard: stage k only
  // processes users that survived stage k-1 (the join IS the filter).
  private val qanFunnel: Q = (s, d) => {
    val ev = events(s, d)
    val a = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts_view"))
    val b = ev.filter(col("event_type") === "click")
      .join(a, Seq("user_id"))
      .filter(col("ts") > col("ts_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts_click"))
    val c = ev.filter(col("event_type") === "purchase")
      .join(b, Seq("user_id"))
      .filter(col("ts") > col("ts_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts_purchase"))
    a.join(b, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .withColumn("stage_reached",
        when(col("ts_purchase").isNotNull, 3)
          .when(col("ts_click").isNotNull, 2).otherwise(1))
      .orderBy(col("user_id"))
  }

  private val qanFunnelSql = """
    WITH a AS (
      SELECT user_id, MIN(ts) AS ts_view FROM events
      WHERE event_type = 'view' GROUP BY 1),
    b AS (
      SELECT e.user_id, MIN(e.ts) AS ts_click
      FROM events e JOIN a ON a.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > a.ts_view GROUP BY 1),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS ts_purchase
      FROM events e JOIN b ON b.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > b.ts_click GROUP BY 1)
    SELECT a.user_id, a.ts_view, b.ts_click, c.ts_purchase,
      CASE WHEN c.ts_purchase IS NOT NULL THEN 3
           WHEN b.ts_click IS NOT NULL THEN 2 ELSE 1 END AS stage_reached
    FROM a LEFT JOIN b USING (user_id) LEFT JOIN c USING (user_id)
    ORDER BY a.user_id"""

  // ------------------------------------------------------ qan_retention
  // Cohort retention matrix: users cohorted by first-activity day,
  // each later active day counted as day-k retention, with the rate
  // against the cohort's size — the engagement decay curve.
  //
  // 100 TB shape: first-activity is one hash aggregate per user; the
  // (user, active-day) set is one distinct (hash aggregate); the
  // cohort join is an equi-join on the user key; the matrix itself is
  // a tiny (cohorts × horizon) aggregate with the per-cohort size
  // broadcast back. Raw events never sort and never see a window.
  private val qanRetention: Q = (s, d) => {
    val ev = events(s, d)
    val cohort = ev.groupBy(col("user_id"))
      .agg(date_trunc("day", min(col("ts"))).as("cohort_day"))
    val activeDays = ev
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val cells = activeDays.join(cohort, Seq("user_id"))
      .withColumn("day_k", datediff(col("day"), col("cohort_day")))
      .groupBy(col("cohort_day"), col("day_k"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = cohort.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_size"))
    cells.join(broadcast(sizes), Seq("cohort_day"))
      .select(col("cohort_day"), col("day_k"), col("n_active"), col("cohort_size"),
        round(col("n_active").cast(DoubleType) / col("cohort_size").cast(DoubleType), 6)
          .as("retention"))
      .orderBy(col("cohort_day"), col("day_k"))
  }

  private val qanRetentionSql = """
    WITH cohort AS (
      SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS cohort_day
      FROM events GROUP BY 1),
    active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events),
    cells AS (
      SELECT c.cohort_day, datediff('day', c.cohort_day, a.day) AS day_k,
        COUNT(*) AS n_active
      FROM active a JOIN cohort c USING (user_id)
      GROUP BY 1, 2),
    sizes AS (
      SELECT cohort_day, COUNT(*) AS cohort_size FROM cohort GROUP BY 1)
    SELECT cohort_day, CAST(day_k AS INT) AS day_k, n_active, cohort_size,
      ROUND(CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE), 6) AS retention
    FROM cells JOIN sizes USING (cohort_day)
    ORDER BY cohort_day, day_k"""

  // ------------------------------------------------------ qan_sla_burn
  // SRE error-budget burn: per instance, the trailing-7-day error
  // rate against a 5% budget, evaluated every day — the SLO alert a
  // monitoring stack derives from the QAN stream. Composition of the
  // gapfill spine (day buckets made contiguous per instance, so a
  // trailing ROWS window IS a trailing time window — no RANGE frame
  // needed) with a rolling conditional aggregate. Counts are integers,
  // the rate is one double division at the end: no accumulation drift.
  //
  // 100 TB shape: one hash aggregate to (instance, day), a per-key
  // spine bounded by retention, one rolling window per key — the
  // same single-shuffle-per-stage shape as qan_gapfill.
  private val qanSlaBurn: Q = (s, d) => {
    val base = events(s, d)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"))
    val spine = base.groupBy(col("user_id"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("bucket"))
    val w7 = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
      .rowsBetween(-6, Window.currentRow)
    spine.join(base, Seq("user_id", "bucket"), "left")
      .select(col("user_id"), col("bucket"),
        coalesce(col("n_total"), lit(0L)).as("n_total"),
        coalesce(col("n_errors"), lit(0L)).as("n_errors"))
      .withColumn("w7_total", sum(col("n_total")).over(w7))
      .withColumn("w7_errors", sum(col("n_errors")).over(w7))
      .withColumn("burn_rate",
        when(col("w7_total") > 0,
          round(col("w7_errors").cast(DoubleType) / col("w7_total").cast(DoubleType), 6)))
      .withColumn("violation", coalesce(col("burn_rate") > 0.05, lit(false)))
      .orderBy(col("user_id"), col("bucket"))
  }

  private val qanSlaBurnSql = """
    WITH base AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
        COUNT(*) AS n_total,
        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
      FROM events GROUP BY 1, 2),
    spine AS (
      SELECT user_id,
        unnest(generate_series(MIN(bucket), MAX(bucket), INTERVAL 1 DAY)) AS bucket
      FROM base GROUP BY 1),
    j AS (
      SELECT s.user_id, s.bucket,
        COALESCE(b.n_total, 0) AS n_total, COALESCE(b.n_errors, 0) AS n_errors
      FROM spine s LEFT JOIN base b USING (user_id, bucket)),
    rolled AS (
      SELECT *,
        CAST(SUM(n_total) OVER w7 AS BIGINT) AS w7_total,
        CAST(SUM(n_errors) OVER w7 AS BIGINT) AS w7_errors
      FROM j
      WINDOW w7 AS (PARTITION BY user_id ORDER BY bucket
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT user_id, bucket, n_total, n_errors, w7_total, w7_errors,
      CASE WHEN w7_total > 0
        THEN ROUND(CAST(w7_errors AS DOUBLE) / CAST(w7_total AS DOUBLE), 6)
      END AS burn_rate,
      COALESCE(CASE WHEN w7_total > 0
        THEN ROUND(CAST(w7_errors AS DOUBLE) / CAST(w7_total AS DOUBLE), 6)
      END > 0.05, false) AS violation
    FROM rolled
    ORDER BY user_id, bucket"""

  // ------------------------------------------------ qan_value_histogram
  // Fixed-width value histogram per digest (the Druid histogram
  // aggregator class): bin counts plus in-bin min/max, the
  // latency-distribution panel every QAN UI draws. One hash aggregate
  // on (digest, bin) — bins are scan-level arithmetic, cardinality is
  // digests × occupied bins, map-side combined.
  private val qanValueHistogram: Q = (s, d) =>
    events(s, d)
      .withColumn("bin", floor(col("value") / 5.0).cast("long"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("bin_min"),
        max(col("value")).as("bin_max"))
      .withColumn("bin_lo", col("bin") * 5.0)
      .orderBy(col("event_type"), col("bin"))

  private val qanValueHistogramSql = """
    SELECT event_type, CAST(floor(value / 5.0) AS BIGINT) AS bin,
      COUNT(*) AS n, MIN(value) AS bin_min, MAX(value) AS bin_max,
      CAST(CAST(floor(value / 5.0) AS BIGINT) * 5.0 AS DOUBLE) AS bin_lo
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2"""

  // --------------------------------------------------- qan_drift_psi
  // Population Stability Index of the value distribution between the
  // first and second half of the observation window, per digest — the
  // ML-monitoring/SRE "did this metric's distribution shift" check
  // (the ops twin of doc_dist_drift). Buckets reuse the
  // qan_value_histogram width-5 rule; the period boundary is the
  // midpoint of the epoch-µs range (integer arithmetic, engine-
  // exact). Per-BUCKET contributions (p−q)·ln(p/q) under add-1
  // smoothing only — never a cross-bucket double sum (fold order
  // differs between engines); the per-digest PSI is the consumer's
  // reduction. Shape: ONE conditional hash aggregate over the scan
  // (both periods in one pass), per-type totals re-aggregated from
  // the tiny bucket frame and joined back broadcast.
  private val qanDriftPsi: Q = (s, d) => {
    val ev = events(s, d)
    // integer div, not `/`: Column `/` on longs is DOUBLE division, and
    // an odd min+max would put the boundary at x.5 where the oracle's
    // `// 2` puts it at x — an event exactly at the midpoint would
    // then land in different periods on the two engines
    val mid = ev.agg(expr(
      "(min(unix_micros(ts)) + max(unix_micros(ts))) div 2").as("mid_us"))
    val counts = ev.crossJoin(broadcast(mid))
      .withColumn("bin", floor(col("value") / 5.0).cast("long"))
      .groupBy(col("event_type"), col("bin"))
      .agg(sum(when(unix_micros(col("ts")) < col("mid_us"), 1L).otherwise(0L)).as("n_a"),
        sum(when(unix_micros(col("ts")) >= col("mid_us"), 1L).otherwise(0L)).as("n_b"))
    val totals = counts.groupBy(col("event_type"))
      .agg(sum(col("n_a")).as("tot_a"), sum(col("n_b")).as("tot_b"),
        count(lit(1)).as("n_bins"))
    val p = (col("n_a") + 1).cast(DoubleType) / (col("tot_a") + col("n_bins")).cast(DoubleType)
    val q = (col("n_b") + 1).cast(DoubleType) / (col("tot_b") + col("n_bins")).cast(DoubleType)
    counts.join(broadcast(totals), Seq("event_type"))
      .select(col("event_type"), col("bin"), col("n_a"), col("n_b"),
        round(p, 8).as("p_a"), round(q, 8).as("p_b"),
        round((p - q) * log(p / q), 8).as("psi_contrib"))
      .orderBy(col("event_type"), col("bin"))
  }

  private val qanDriftPsiSql = """
    WITH mid AS (
      SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid_us FROM events),
    counts AS (
      SELECT event_type, CAST(floor(value / 5.0) AS BIGINT) AS bin,
        CAST(SUM(CASE WHEN epoch_us(ts) < mid_us THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN epoch_us(ts) >= mid_us THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM events, mid
      GROUP BY 1, 2),
    totals AS (
      SELECT event_type, CAST(SUM(n_a) AS BIGINT) AS tot_a,
        CAST(SUM(n_b) AS BIGINT) AS tot_b, COUNT(*) AS n_bins
      FROM counts GROUP BY 1)
    SELECT c.event_type, c.bin, c.n_a, c.n_b,
      ROUND(CAST(c.n_a + 1 AS DOUBLE) / CAST(t.tot_a + t.n_bins AS DOUBLE), 8) AS p_a,
      ROUND(CAST(c.n_b + 1 AS DOUBLE) / CAST(t.tot_b + t.n_bins AS DOUBLE), 8) AS p_b,
      ROUND((CAST(c.n_a + 1 AS DOUBLE) / CAST(t.tot_a + t.n_bins AS DOUBLE)
           - CAST(c.n_b + 1 AS DOUBLE) / CAST(t.tot_b + t.n_bins AS DOUBLE))
        * LN((CAST(c.n_a + 1 AS DOUBLE) / CAST(t.tot_a + t.n_bins AS DOUBLE))
           / (CAST(c.n_b + 1 AS DOUBLE) / CAST(t.tot_b + t.n_bins AS DOUBLE))), 8)
        AS psi_contrib
    FROM counts c JOIN totals t USING (event_type)
    ORDER BY 1, 2"""

  // ------------------------------------------- qan_time_weighted_avg
  // Time-weighted average (TimescaleDB's time_weight, LOCF weighting):
  // per (instance, digest) the integral of the last-observed value
  // over each inter-event interval divided by the observed span —
  // the honest mean of an irregularly-sampled gauge, where the
  // arithmetic mean over-weights busy periods. The integral is
  // DECIMAL(value) × BIGINT(µs) products summed exactly, so the only
  // double is the final division: order-independent across engines
  // and partitionings. One lag window per key, one hash aggregate.
  private val qanTimeWeightedAvg: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("next_us", lead(unix_micros(col("ts")), 1).over(w))
      .withColumn("dt_us", col("next_us") - unix_micros(col("ts")))
      .filter(col("dt_us").isNotNull)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("value").cast(DecimalType(18, 6))
          * col("dt_us").cast(DecimalType(20, 0))).as("num"),
        sum(col("dt_us")).as("den_us"))
      // a key whose whole observed span is zero (all events at one
      // timestamp) has no time axis to weight over — drop it rather
      // than divide by zero (EdgeEventsSpec's identical-ts pair)
      .filter(col("den_us") > 0)
      .select(col("user_id"), col("event_type"), col("n_segments"),
        round(col("den_us").cast(DoubleType) / 1000000.0, 6).as("span_secs"),
        round(col("num").cast(DoubleType) / col("den_us").cast(DoubleType), 6)
          .as("twa"))
      .orderBy(col("user_id"), col("event_type"))
  }

  private val qanTimeWeightedAvgSql = """
    WITH seg AS (
      SELECT user_id, event_type, value,
        LEAD(epoch_us(ts), 1) OVER (PARTITION BY user_id, event_type
          ORDER BY ts, event_id) - epoch_us(ts) AS dt_us
      FROM events),
    agg AS (
      SELECT user_id, event_type, COUNT(*) AS n_segments,
        SUM(CAST(value AS DECIMAL(18,6)) * CAST(dt_us AS DECIMAL(20,0))) AS num,
        CAST(SUM(dt_us) AS BIGINT) AS den_us
      FROM seg
      WHERE dt_us IS NOT NULL
      GROUP BY 1, 2
      HAVING SUM(dt_us) > 0)
    SELECT user_id, event_type, n_segments,
      ROUND(CAST(den_us AS DOUBLE) / 1000000.0, 6) AS span_secs,
      ROUND(CAST(num AS DOUBLE) / CAST(den_us AS DOUBLE), 6) AS twa
    FROM agg
    ORDER BY user_id, event_type"""

  // -------------------------------------------------------- qan_heatmap
  // Hour-of-day × day-of-week load matrix — the weekly-rhythm heatmap
  // every monitoring UI draws (when does load land; when do errors
  // cluster). One hash aggregate on 168 scan-derived keys, map-side
  // combined; Spark's dayofweek is Sunday=1, shifted to DuckDB's
  // Sunday=0 convention.
  private val qanHeatmap: Q = (s, d) =>
    events(s, d)
      .groupBy((dayofweek(col("ts")) - 1).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("calls"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("total_value"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errors"),
        countDistinct(col("event_type")).as("n_digests"))
      .orderBy(col("dow"), col("hod"))

  private val qanHeatmapSql = """
    SELECT CAST(dayofweek(ts) AS BIGINT) AS dow, CAST(hour(ts) AS BIGINT) AS hod,
      COUNT(*) AS calls,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
      CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
      COUNT(DISTINCT event_type) AS n_digests
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2"""

  // --------------------------------------------------------- qan_apdex
  // Apdex satisfaction score per digest and hour (the standard SLA
  // index: T=5, satisfied ≤ T, tolerating ≤ 4T, apdex = (satisfied +
  // tolerating/2) / total). Integer counts, one rounded division —
  // a single map-side-combined hash aggregate at any scale.
  private val qanApdex: Q = (s, d) =>
    events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") <= 5.0, 1L).otherwise(0L)).as("satisfied"),
        sum(when(col("value") > 5.0 && col("value") <= 20.0, 1L).otherwise(0L))
          .as("tolerating"))
      .withColumn("apdex",
        round((col("satisfied").cast(DoubleType)
          + col("tolerating").cast(DoubleType) / 2.0) / col("n").cast(DoubleType), 6))
      .orderBy(col("event_type"), col("bucket"))

  private val qanApdexSql = """
    SELECT event_type, date_trunc('hour', ts) AS bucket,
      COUNT(*) AS n,
      CAST(SUM(CASE WHEN value <= 5.0 THEN 1 ELSE 0 END) AS BIGINT) AS satisfied,
      CAST(SUM(CASE WHEN value > 5.0 AND value <= 20.0 THEN 1 ELSE 0 END) AS BIGINT) AS tolerating,
      ROUND((CAST(SUM(CASE WHEN value <= 5.0 THEN 1 ELSE 0 END) AS DOUBLE)
        + CAST(SUM(CASE WHEN value > 5.0 AND value <= 20.0 THEN 1 ELSE 0 END) AS DOUBLE) / 2.0)
        / CAST(COUNT(*) AS DOUBLE), 6) AS apdex
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2"""

  // --------------------------------------------------- q27_range_window
  // Time-RANGE window frames — the complement of q14's ROW frames: a
  // trailing 1-hour moving count/sum per instance, where the frame is
  // defined by event-time distance, not row position (irregular
  // sampling makes ROWS frames wrong here). One hash shuffle on the
  // key + per-key ordered frame scan; sums stay DECIMAL inside the
  // frame so the moving aggregate is order-independent.
  private val q27RangeWindow: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("t_us"))
      .rangeBetween(-3600000000L, Window.currentRow)
    events(s, d)
      .withColumn("t_us", unix_micros(col("ts")))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h",
        round(sum(col("value").cast(DecimalType(18, 6))).over(w).cast(DoubleType), 4))
      .select(col("event_id"), col("user_id"), col("ts"), col("n_1h"), col("sum_1h"))
      .orderBy(col("event_id"))
  }

  private val q27RangeWindowSql = """
    SELECT event_id, user_id, ts,
      COUNT(*) OVER w AS n_1h,
      ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 4) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY event_id"""

  // ---------------------------------------------------- qan_concurrency
  // Interval-overlap concurrency — "how many statements were in
  // flight at once": each event becomes an interval [ts, ts+value s]
  // (value plays execution time), swept as +1/−1 boundary points with
  // a per-instance running sum. The tie rule (ends sort before starts
  // at the same instant, then event id) is pinned in the ORDER BY so
  // both engines walk the boundaries identically. One union + one
  // window per key — the sweep line never leaves its instance
  // partition, so the plan is a single hash shuffle at any scale.
  private val qanConcurrency: Q = (s, d) => {
    val iv = events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s_us"),
        (unix_micros(col("ts")) +
          (col("value").cast(DecimalType(18, 6)) * 1000000).cast("long")).as("e_us"))
    val pts = iv.select(col("user_id"), col("event_id"), col("s_us").as("t"),
        lit(1L).as("delta"))
      .unionByName(iv.select(col("user_id"), col("event_id"),
        col("e_us").as("t"), lit(-1L).as("delta")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("delta"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts
      .withColumn("conc", sum(col("delta")).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("conc")).as("max_concurrency"),
        (count(lit(1)) / 2).cast("long").as("n_intervals"))
      .orderBy(col("user_id"))
  }

  private val qanConcurrencySql = """
    WITH iv AS (
      SELECT user_id, event_id, epoch_us(ts) AS s_us,
        epoch_us(ts) + CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS e_us
      FROM events),
    pts AS (
      SELECT user_id, event_id, s_us AS t, CAST(1 AS BIGINT) AS delta FROM iv
      UNION ALL
      SELECT user_id, event_id, e_us AS t, CAST(-1 AS BIGINT) AS delta FROM iv),
    swept AS (
      SELECT user_id,
        CAST(SUM(delta) OVER (PARTITION BY user_id
          ORDER BY t, delta, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc
      FROM pts)
    SELECT user_id, MAX(conc) AS max_concurrency,
      CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals
    FROM swept
    GROUP BY 1
    ORDER BY 1"""

  // --------------------------------------- qan_digest_cooccurrence
  // Digest co-occurrence ("which statements run together"): two
  // digests co-occur when both appear on the same instance in the
  // same hour. Reported per pair: co-occurrence count, each side's
  // bucket count, LIFT (observed co-occurrence over the independence
  // expectation) and Jaccard — the market-basket view of a query
  // workload, which surfaces app-level transaction groupings no
  // per-digest rollup can.
  //
  // 100 TB shape: the corpus collapses to DISTINCT (instance, hour,
  // digest) in one hash aggregate first; the pair join runs on that
  // collapsed set keyed by (instance, hour), so each bucket
  // contributes at most |digests-in-bucket|² pairs — bounded by
  // per-instance digest cardinality, never by event count. Marginals
  // and the grand total are tiny aggregates broadcast back.
  private val qanDigestCooccurrence: Q = (s, d) => {
    val b = events(s, d)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("bucket"),
        col("event_type"))
      .distinct()
    val tot = b.select(col("user_id"), col("bucket")).distinct()
      .agg(count(lit(1)).as("n_buckets"))
    val single = b.groupBy(col("event_type")).agg(count(lit(1)).as("n_b"))
    val pairs = b.select(col("user_id"), col("bucket"), col("event_type").as("a_type"))
      .join(b.select(col("user_id"), col("bucket"), col("event_type").as("b_type")),
        Seq("user_id", "bucket"))
      .filter(col("a_type") < col("b_type"))
      .groupBy(col("a_type"), col("b_type"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(single.select(col("event_type").as("a_type"), col("n_b").as("n_a"))),
        Seq("a_type"))
      .join(broadcast(single.select(col("event_type").as("b_type"), col("n_b").as("n_bb"))),
        Seq("b_type"))
      .crossJoin(broadcast(tot))
      .select(col("a_type"), col("b_type"), col("n_ab"),
        col("n_a"), col("n_bb").as("n_b"),
        round(col("n_ab").cast(DoubleType) * col("n_buckets").cast(DoubleType)
          / (col("n_a").cast(DoubleType) * col("n_bb").cast(DoubleType)), 6).as("lift"),
        round(col("n_ab").cast(DoubleType)
          / (col("n_a") + col("n_bb") - col("n_ab")).cast(DoubleType), 6).as("jaccard"))
      .orderBy(col("a_type"), col("b_type"))
  }

  private val qanDigestCooccurrenceSql = """
    WITH b AS (
      SELECT DISTINCT user_id, date_trunc('hour', ts) AS bucket, event_type
      FROM events),
    tot AS (
      SELECT COUNT(*) AS n_buckets FROM (SELECT DISTINCT user_id, bucket FROM b)),
    single AS (
      SELECT event_type, COUNT(*) AS n_b FROM b GROUP BY 1),
    pairs AS (
      SELECT a.event_type AS a_type, bb.event_type AS b_type, COUNT(*) AS n_ab
      FROM b a JOIN b bb ON a.user_id = bb.user_id AND a.bucket = bb.bucket
        AND a.event_type < bb.event_type
      GROUP BY 1, 2)
    SELECT a_type, b_type, n_ab, sa.n_b AS n_a, sb.n_b AS n_b,
      ROUND(CAST(n_ab AS DOUBLE) * CAST(n_buckets AS DOUBLE)
        / (CAST(sa.n_b AS DOUBLE) * CAST(sb.n_b AS DOUBLE)), 6) AS lift,
      ROUND(CAST(n_ab AS DOUBLE)
        / CAST(sa.n_b + sb.n_b - n_ab AS DOUBLE), 6) AS jaccard
    FROM pairs
    JOIN single sa ON sa.event_type = a_type
    JOIN single sb ON sb.event_type = b_type
    CROSS JOIN tot
    ORDER BY a_type, b_type"""

  // ---------------------------------------------------- qan_rank_movers
  // Day-over-day rank movement: every (instance, digest) ranked by
  // its day total on the latest observed day and on the day before,
  // with the rank delta — the "what newly became expensive" leaderboard
  // (a regression can hide inside a stable percent change if the whole
  // fleet moved; rank movement is the relative alarm).
  //
  // 100 TB shape: the corpus collapses to (entity, day) totals in one
  // hash aggregate; the two-day restriction and both rankings run on
  // that collapsed table. The per-day ranking window partitions on
  // the day (2 partitions over |entities| rows — at fleet scale that
  // is ~10⁵ digest rows per day, a single-task sort each, never raw
  // events). Day totals are exact DECIMAL so ranks cannot flap
  // across engines; ties pin to (user_id, event_type).
  private val qanRankMovers: Q = (s, d) => {
    val day = events(s, d)
      .groupBy(col("user_id"), col("event_type"),
        date_trunc("day", col("ts")).as("bucket"))
      .agg(sum(col("value").cast(DecimalType(18, 6))).as("dv"))
    // the two latest observed days via TakeOrderedAndProject + a
    // one-row broadcast — not a partition-less row_number window (the
    // day list is bounded by retention, but the plan should carry
    // zero single-partition windows anywhere)
    val lastTwo = day.select(col("bucket")).distinct()
      .orderBy(col("bucket").desc).limit(2)
      .agg(max(col("bucket")).as("b1"), min(col("bucket")).as("b2"))
    val ranked = day.crossJoin(broadcast(lastTwo))
      .withColumn("which",
        when(col("bucket") === col("b1"), 1)
          .when(col("bucket") === col("b2"), 2))
      .filter(col("which").isNotNull)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("which"))
          .orderBy(col("dv").desc, col("user_id"), col("event_type"))))
    val now = ranked.filter(col("which") === 1)
      .select(col("user_id"), col("event_type"),
        col("rnk").as("rank_now"), col("dv").as("dv_now"))
    val prev = ranked.filter(col("which") === 2)
      .select(col("user_id"), col("event_type"),
        col("rnk").as("rank_prev"), col("dv").as("dv_prev"))
    now.join(prev, Seq("user_id", "event_type"), "left")
      .select(col("user_id"), col("event_type"),
        col("rank_now"), col("rank_prev"),
        (col("rank_prev") - col("rank_now")).as("moved_up"),
        round(col("dv_now").cast(DoubleType), 4).as("value_now"),
        round(col("dv_prev").cast(DoubleType), 4).as("value_prev"),
        col("rank_prev").isNull.as("new_entry"))
      .orderBy(col("rank_now"), col("user_id"), col("event_type"))
  }

  private val qanRankMoversSql = """
    WITH day AS (
      SELECT user_id, event_type, date_trunc('day', ts) AS bucket,
        SUM(CAST(value AS DECIMAL(18,6))) AS dv
      FROM events GROUP BY 1, 2, 3),
    last_two AS (
      SELECT bucket, ROW_NUMBER() OVER (ORDER BY bucket DESC) AS which
      FROM (SELECT DISTINCT bucket FROM day)
      QUALIFY which <= 2),
    ranked AS (
      SELECT d.*, lt.which,
        ROW_NUMBER() OVER (PARTITION BY lt.which
          ORDER BY d.dv DESC, d.user_id, d.event_type) AS rnk
      FROM day d JOIN last_two lt USING (bucket))
    SELECT n.user_id, n.event_type,
      n.rnk AS rank_now, p.rnk AS rank_prev,
      p.rnk - n.rnk AS moved_up,
      ROUND(CAST(n.dv AS DOUBLE), 4) AS value_now,
      ROUND(CAST(p.dv AS DOUBLE), 4) AS value_prev,
      p.rnk IS NULL AS new_entry
    FROM (SELECT * FROM ranked WHERE which = 1) n
    LEFT JOIN (SELECT * FROM ranked WHERE which = 2) p
      ON p.user_id = n.user_id AND p.event_type = n.event_type
    ORDER BY rank_now, n.user_id, n.event_type"""

  // ---------------------------------------------- qan_metric_correlation
  // Pearson correlation between digest pairs' hourly load series —
  // "which statements move together": regressions that co-occur point
  // at a shared cause (one plan change, one noisy neighbor), which no
  // per-digest view can see. Series are aligned on the full hour
  // spine (missing hours = 0 — silence IS signal for correlation).
  //
  // Determinism: all five moments (Σx, Σy, Σxy, Σx², Σy²) accumulate
  // as exact DECIMALs — order-independent across engines and
  // partitionings — and Pearson is formed from them in ONE pinned
  // double expression (products/differences of exactly-converted
  // moments), so the 6dp-rounded r cannot flap.
  //
  // 100 TB shape: the corpus collapses to (digest, hour) totals in
  // one hash aggregate, then the pairing universe is HARD-BOUNDED to
  // the top-K digests by total volume (K=100, a TakeOrderedAndProject
  // + broadcast semi-join): pair work is K²·hours regardless of fleet
  // digest cardinality — a 10⁴-digest fleet would otherwise put 10⁸
  // pair rows per hour through the join, and correlation against
  // noise-floor digests is meaningless anyway. The spine is
  // |hours|×K; the moments aggregate is map-side combined.
  private val qanMetricCorrelation: Q = (s, d) => {
    val corrK = 100
    val hourlyAll = events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(sum(col("value").cast(DecimalType(18, 6))).cast(DecimalType(18, 6)).as("dv"))
    val topDigests = hourlyAll.groupBy(col("event_type"))
      .agg(coalesce(sum(col("dv")), lit(0).cast(DecimalType(28, 6))).as("__total"))
      .orderBy(col("__total").desc, col("event_type"))
      .limit(corrK)
      .select(col("event_type"))
    val hourly = hourlyAll.join(broadcast(topDigests), Seq("event_type"), "left_semi")
    val spine = hourly.select(col("bucket")).distinct()
      .crossJoin(hourly.select(col("event_type")).distinct())
    val series = spine.join(hourly, Seq("event_type", "bucket"), "left")
      .select(col("event_type"), col("bucket"),
        coalesce(col("dv"), lit(0).cast(DecimalType(18, 6))).as("dv"))
    val moments = series.select(col("bucket"), col("event_type").as("a_type"), col("dv").as("av"))
      .join(series.select(col("bucket"), col("event_type").as("b_type"), col("dv").as("bv")),
        Seq("bucket"))
      .filter(col("a_type") < col("b_type"))
      .groupBy(col("a_type"), col("b_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("av")).as("sx"), sum(col("bv")).as("sy"),
        sum(col("av") * col("bv")).as("sxy"),
        sum(col("av") * col("av")).as("sxx"),
        sum(col("bv") * col("bv")).as("syy"))
    val nD = col("n").cast(DoubleType)
    val num = nD * col("sxy").cast(DoubleType) - col("sx").cast(DoubleType) * col("sy").cast(DoubleType)
    val denx = nD * col("sxx").cast(DoubleType) - col("sx").cast(DoubleType) * col("sx").cast(DoubleType)
    val deny = nD * col("syy").cast(DoubleType) - col("sy").cast(DoubleType) * col("sy").cast(DoubleType)
    moments
      .withColumn("r", when(denx > 0 && deny > 0, round(num / sqrt(denx * deny), 6)))
      .select(col("a_type"), col("b_type"), col("n").as("n_hours"), col("r"),
        coalesce(abs(col("r")) > 0.5, lit(false)).as("co_moving"))
      .orderBy(col("a_type"), col("b_type"))
  }

  private val qanMetricCorrelationSql = """
    WITH hourly AS (
      -- width 19 forces DuckDB's HUGEINT decimal path: an (18,6)
      -- operand pair multiplies in int64 internals and overflows at
      -- sf0.1 hourly magnitudes; 19+19 = 38 still fits the cap.
      -- The CASE replicates Spark's (18,6) domain bound exactly: a
      -- total past 10^12 NULLs on the Spark side (non-ANSI narrowing
      -- cast, needed to keep the decimal products inside precision
      -- 38), so the oracle must drop it identically
      SELECT event_type, date_trunc('hour', ts) AS bucket,
        CAST(CASE WHEN abs(SUM(CAST(value AS DECIMAL(18,6)))) < 1000000000000
          THEN SUM(CAST(value AS DECIMAL(18,6))) END AS DECIMAL(19,6)) AS dv
      FROM events GROUP BY 1, 2),
    -- replay of the Spark-side K=100 volume prefilter: the pairing
    -- universe is the top-K digests by total hourly volume (ties on
    -- the digest), so pair work is K²·hours at any fleet size
    topk AS (
      SELECT event_type FROM (
        SELECT event_type, COALESCE(SUM(dv), CAST(0 AS DECIMAL(19,6))) AS total
        FROM hourly GROUP BY 1
        ORDER BY total DESC, event_type
        LIMIT 100)),
    hourlyk AS (
      SELECT h.* FROM hourly h JOIN topk USING (event_type)),
    spine AS (
      SELECT b.bucket, t.event_type
      FROM (SELECT DISTINCT bucket FROM hourlyk) b
      CROSS JOIN (SELECT DISTINCT event_type FROM hourlyk) t),
    series AS (
      SELECT s.event_type, s.bucket,
        COALESCE(h.dv, CAST(0 AS DECIMAL(19,6))) AS dv
      FROM spine s LEFT JOIN hourlyk h USING (event_type, bucket)),
    moments AS (
      SELECT a.event_type AS a_type, b.event_type AS b_type,
        COUNT(*) AS n,
        SUM(a.dv) AS sx, SUM(b.dv) AS sy,
        SUM(a.dv * b.dv) AS sxy,
        SUM(a.dv * a.dv) AS sxx,
        SUM(b.dv * b.dv) AS syy
      FROM series a JOIN series b ON a.bucket = b.bucket
        AND a.event_type < b.event_type
      GROUP BY 1, 2),
    formed AS (
      SELECT a_type, b_type, n,
        CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
        CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
        CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny
      FROM moments)
    SELECT a_type, b_type, n AS n_hours,
      CASE WHEN denx > 0 AND deny > 0
        THEN ROUND(num / sqrt(denx * deny), 6) END AS r,
      COALESCE(abs(CASE WHEN denx > 0 AND deny > 0
        THEN ROUND(num / sqrt(denx * deny), 6) END) > 0.5, false) AS co_moving
    FROM formed
    ORDER BY a_type, b_type"""

  // ------------------------------------------- qan_markov_transitions
  // First-order workload transition model: P(next digest | current
  // digest), estimated from each instance's time-ordered statement
  // stream — the Markov view of a workload (app transaction shapes,
  // prefetch/plan-cache hints, anomaly baselines for "statement B
  // suddenly stopped following A"). Probabilities are exact rationals
  // of transition counts; successor ranks break ties on the digest.
  //
  // 100 TB shape: one lead() window per instance partition (the same
  // single-shuffle shape as qan_snapshot_delta) collapses the stream
  // to (cur, next) pairs; counts are one map-side-combined hash
  // aggregate over |digests|² keys at most; row totals are a tiny
  // broadcast join-back.
  private val qanMarkovTransitions: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = events(s, d)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("cur"), col("next_type").as("nxt"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy(col("cur")).agg(sum(col("n")).as("n_cur"))
    trans.join(broadcast(totals), Seq("cur"))
      .withColumn("p", round(col("n").cast(DoubleType) / col("n_cur").cast(DoubleType), 6))
      .withColumn("successor_rank", row_number().over(
        Window.partitionBy(col("cur")).orderBy(col("n").desc, col("nxt"))))
      .select(col("cur"), col("nxt"), col("n"), col("n_cur"), col("p"),
        col("successor_rank"))
      .orderBy(col("cur"), col("successor_rank"))
  }

  private val qanMarkovTransitionsSql = """
    WITH nx AS (
      SELECT event_type AS cur,
        LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events),
    trans AS (
      SELECT cur, nxt, COUNT(*) AS n
      FROM nx WHERE nxt IS NOT NULL
      GROUP BY 1, 2),
    totals AS (
      SELECT cur, CAST(SUM(n) AS BIGINT) AS n_cur FROM trans GROUP BY 1)
    SELECT cur, nxt, n, n_cur,
      ROUND(CAST(n AS DOUBLE) / CAST(n_cur AS DOUBLE), 6) AS p,
      ROW_NUMBER() OVER (PARTITION BY cur ORDER BY n DESC, nxt) AS successor_rank
    FROM trans JOIN totals USING (cur)
    ORDER BY cur, successor_rank"""

  // ---------------------------------------------- qan_m4_downsample
  // M4 downsampling (Jugel et al., VLDB 2014): per series and pixel-
  // column time bucket keep ONLY the first, last, lowest and highest
  // points — the provably error-free reduction for min-max line
  // rendering. A dashboard pulling a month of per-second QAN data
  // renders identical pixels from ≤4 points per bucket instead of the
  // raw stream. Role winners are struct-min/max over (key, event_id)
  // pairs, so every tie is pinned and both engines pick identical
  // points; a point winning several roles is emitted once.
  //
  // 100 TB shape: ONE map-side-combined hash aggregate over (series,
  // bucket) computes all four winners (struct min/max — no sort, no
  // window); the join-back to fetch the winners' rows is an equi-join
  // on event_id against the already-bucket-pruned scan.
  private val qanM4Downsample: Q = (s, d) => {
    val ev = events(s, d)
    val sel = ev
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(
        min(struct(col("ts"), col("event_id"))).getField("event_id").as("first_id"),
        max(struct(col("ts"), col("event_id"))).getField("event_id").as("last_id"),
        min(struct(col("value"), col("event_id"))).getField("event_id").as("low_id"),
        max(struct(col("value"), col("event_id"))).getField("event_id").as("high_id"),
        count(lit(1)).as("n_raw"))
    val ids = sel.select(col("user_id"), col("bucket"), col("n_raw"),
        explode(array(col("first_id"), col("last_id"), col("low_id"), col("high_id")))
          .as("event_id"))
      .distinct()
    ids.join(ev.select(col("event_id"), col("ts"), col("value")), Seq("event_id"))
      .select(col("user_id"), col("bucket"), col("event_id"), col("ts"),
        col("value"), col("n_raw"))
      .orderBy(col("user_id"), col("bucket"), col("event_id"))
  }

  private val qanM4DownsampleSql = """
    WITH sel AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket,
        (MIN(struct_pack(t := ts, id := event_id))).id AS first_id,
        (MAX(struct_pack(t := ts, id := event_id))).id AS last_id,
        (MIN(struct_pack(v := value, id := event_id))).id AS low_id,
        (MAX(struct_pack(v := value, id := event_id))).id AS high_id,
        COUNT(*) AS n_raw
      FROM events GROUP BY 1, 2),
    ids AS (
      SELECT DISTINCT user_id, bucket, n_raw,
        unnest([first_id, last_id, low_id, high_id]) AS event_id
      FROM sel)
    SELECT i.user_id, i.bucket, i.event_id, e.ts, e.value, i.n_raw
    FROM ids i JOIN events e USING (event_id)
    ORDER BY i.user_id, i.bucket, i.event_id"""

  // ------------------------------------------------- qan_error_ztest
  // One-proportion z-test per instance: is THIS instance's error rate
  // statistically above the fleet baseline, given how much traffic it
  // serves? The raw rate misleads (a small instance with 2 errors in
  // 10 calls looks worse than a big one with 900 in 10 000); the
  // z-score z = (p̂ − p₀) / √(p₀(1−p₀)/n) normalizes by sample size —
  // the standard fleet-outlier test monitoring stacks run.
  //
  // Determinism: inputs are integer counts; p̂, p₀ and z are formed in
  // one pinned double expression (both engines execute the identical
  // IEEE ops), and the flag fires on the ROUNDED z. 100 TB shape: one
  // map-side-combined hash aggregate per instance + a one-row fleet
  // total broadcast back — the corpus is read once.
  private val qanErrorZtest: Q = (s, d) => {
    val per = events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("x"))
    val fleet = per.agg(sum(col("n")).as("fn"), sum(col("x")).as("fx"))
    val p0 = col("fx").cast(DoubleType) / col("fn").cast(DoubleType)
    val pHat = col("x").cast(DoubleType) / col("n").cast(DoubleType)
    val z = (pHat - p0) / sqrt(p0 * (lit(1.0) - p0) / col("n").cast(DoubleType))
    per.crossJoin(broadcast(fleet))
      .select(col("user_id"), col("n"), col("x"),
        round(pHat, 6).as("error_rate"),
        round(p0, 6).as("fleet_rate"),
        // a degenerate baseline (no errors anywhere, or all errors)
        // has zero variance — there is no test to run. The guard
        // keeps z NULL instead of NaN (whose NaN-is-largest Spark
        // comparison would false-alarm EVERY instance), matching
        // DuckDB's NULL on zero division
        when(col("fx") > 0 && col("fx") < col("fn"), round(z, 4)).as("z_score"))
      .withColumn("elevated", coalesce(col("z_score") > 3.0, lit(false)))
      .withColumn("depressed", coalesce(col("z_score") < -3.0, lit(false)))
      .orderBy(col("user_id"))
  }

  private val qanErrorZtestSql = """
    WITH per AS (
      SELECT user_id, COUNT(*) AS n,
        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS x
      FROM events GROUP BY 1),
    fleet AS (
      SELECT CAST(SUM(n) AS BIGINT) AS fn, CAST(SUM(x) AS BIGINT) AS fx FROM per),
    formed AS (
      SELECT user_id, n, x, fx, fn,
        CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p_hat,
        CAST(fx AS DOUBLE) / CAST(fn AS DOUBLE) AS p0
      FROM per CROSS JOIN fleet),
    scored AS (
      SELECT user_id, n, x, p_hat, p0,
        CASE WHEN fx > 0 AND fx < fn
          THEN ROUND((p_hat - p0) / sqrt(p0 * (1.0 - p0) / CAST(n AS DOUBLE)), 4)
        END AS z
      FROM formed)
    SELECT user_id, n, x,
      ROUND(p_hat, 6) AS error_rate,
      ROUND(p0, 6) AS fleet_rate,
      z AS z_score,
      COALESCE(z > 3.0, false) AS elevated,
      COALESCE(z < -3.0, false) AS depressed
    FROM scored
    ORDER BY user_id"""

  // ---------------------------------------------- qan_trend_forecast
  // Per-instance least-squares load trend + next-day forecast — the
  // capacity-planning read of the QAN stream ("is this instance's
  // daily load growing, and what does tomorrow look like"). x is the
  // epoch-day index, y the exact-DECIMAL day total; slope/intercept
  // come from the five moments in one pinned double expression (the
  // same exact-moment discipline as qan_metric_correlation), and the
  // growing flag fires on the ROUNDED slope.
  //
  // 100 TB shape: one hash aggregate to (instance, day), one tiny
  // per-instance moments aggregate — the corpus is read once, no
  // window, no sort.
  private val qanTrendForecast: Q = (s, d) => {
    val day = events(s, d)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("bucket"))
      .agg(sum(col("value").cast(DecimalType(18, 6))).cast(DecimalType(18, 6)).as("dv"))
      .withColumn("x", datediff(col("bucket"), to_date(lit("1970-01-01"))).cast("long"))
    val m = day.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("dv")).as("sy"),
        sum(col("dv") * col("x").cast(DecimalType(10, 0))).as("sxy"),
        max(col("x")).as("xmax"))
    val nD = col("n").cast(DoubleType)
    val den = nD * col("sxx").cast(DoubleType) - col("sx").cast(DoubleType) * col("sx").cast(DoubleType)
    val slope = (nD * col("sxy").cast(DoubleType) - col("sx").cast(DoubleType) * col("sy").cast(DoubleType)) / den
    val intercept = (col("sy").cast(DoubleType) - slope * col("sx").cast(DoubleType)) / nD
    m.filter(col("n") >= 2)
      .select(col("user_id"), col("n").as("n_days"),
        round(slope, 6).as("slope_per_day"),
        round(intercept + slope * (col("xmax") + lit(1L)).cast(DoubleType), 4)
          .as("forecast_next_day"))
      .withColumn("growing", col("slope_per_day") > 0.0)
      .orderBy(col("user_id"))
  }

  private val qanTrendForecastSql = """
    WITH day AS (
      -- the CASE replicates Spark's (18,6) narrowing-cast domain
      -- bound (totals past 10^12 NULL silently on the Spark side)
      SELECT user_id, date_trunc('day', ts) AS bucket,
        CAST(CASE WHEN abs(SUM(CAST(value AS DECIMAL(18,6)))) < 1000000000000
          THEN SUM(CAST(value AS DECIMAL(18,6))) END AS DECIMAL(18,6)) AS dv
      FROM events GROUP BY 1, 2),
    dx AS (
      SELECT user_id, dv,
        CAST(datediff('day', TIMESTAMP '1970-01-01', CAST(bucket AS TIMESTAMP)) AS BIGINT) AS x
      FROM day),
    m AS (
      SELECT user_id, COUNT(*) AS n,
        CAST(SUM(x) AS BIGINT) AS sx,
        CAST(SUM(x * x) AS BIGINT) AS sxx,
        SUM(dv) AS sy,
        SUM(dv * CAST(x AS DECIMAL(10,0))) AS sxy,
        CAST(MAX(x) AS BIGINT) AS xmax
      FROM dx GROUP BY 1),
    formed AS (
      SELECT user_id, n, xmax,
        (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
        CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd
      FROM m WHERE n >= 2)
    SELECT user_id, n AS n_days,
      ROUND(slope, 6) AS slope_per_day,
      ROUND((syd - slope * sxd) / CAST(n AS DOUBLE) + slope * CAST(xmax + 1 AS DOUBLE), 4)
        AS forecast_next_day,
      ROUND(slope, 6) > 0.0 AS growing
    FROM formed
    ORDER BY user_id"""

  // ---------------------------------------------- qan_topn_approx_audit
  // Druid's native topN is APPROXIMATE: each segment reports only its
  // local top-K, and the broker merges those partial lists — a digest
  // that is mid-pack everywhere but huge in aggregate can be
  // undercounted or missed (the documented caveat that makes Druid
  // docs say "use groupBy for exact results"). This audit replays
  // that merge against the exact answer: per-instance (= per-segment)
  // top-3 partial lists, merged and re-ranked, joined to the exact
  // global ranking — per digest the approx/exact values, both ranks,
  // and the undercount. The reference's notebooks run topN queries;
  // this measures what that approximation costs on this workload.
  //
  // 100 TB shape: the segment aggregate is one hash aggregate; the
  // per-segment top-3 is a bounded-heap window per instance (the
  // TopKPerGroup rewrite applies); everything after runs on ≤3 rows
  // per instance, and the exact side reuses the same collapsed
  // aggregate — the corpus is read once. Both global rankings go
  // through Ranking.globalRowNumber (range-partitioned two-phase
  // rank), so a 10⁶-digest dimension never hits a single-partition
  // window.
  private val qanTopnApproxAudit: Q = (s, d) => {
    val seg = events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("value").cast(DecimalType(18, 6))).as("dv"))
    val segTop = seg
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("dv").desc, col("event_type"))))
      .filter(col("rk") <= 3)
    val approx = graft.operators.Ranking.globalRowNumber(
      segTop.groupBy(col("event_type")).agg(sum(col("dv")).as("approx_dv")),
      Seq(col("approx_dv").desc, col("event_type")), "approx_rank")
    val exact = graft.operators.Ranking.globalRowNumber(
      seg.groupBy(col("event_type")).agg(sum(col("dv")).as("exact_dv")),
      Seq(col("exact_dv").desc, col("event_type")), "exact_rank")
    exact.join(approx, Seq("event_type"), "left")
      .select(col("exact_rank"), col("event_type"),
        round(col("exact_dv").cast(DoubleType), 4).as("exact_value"),
        round(col("approx_dv").cast(DoubleType), 4).as("approx_value"),
        col("approx_rank"),
        round((col("exact_dv") - coalesce(col("approx_dv"), lit(0)))
          .cast(DoubleType), 4).as("undercount"),
        (col("approx_rank") === col("exact_rank")).as("rank_agrees"))
      .orderBy(col("exact_rank"))
  }

  private val qanTopnApproxAuditSql = """
    WITH seg AS (
      SELECT user_id, event_type, SUM(CAST(value AS DECIMAL(18,6))) AS dv
      FROM events GROUP BY 1, 2),
    seg_top AS (
      SELECT * FROM (
        SELECT user_id, event_type, dv, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY dv DESC, event_type) AS rk
        FROM seg)
      WHERE rk <= 3),
    approx AS (
      SELECT event_type, SUM(dv) AS approx_dv,
        ROW_NUMBER() OVER (ORDER BY SUM(dv) DESC, event_type) AS approx_rank
      FROM seg_top GROUP BY 1),
    exact AS (
      SELECT event_type, SUM(dv) AS exact_dv,
        ROW_NUMBER() OVER (ORDER BY SUM(dv) DESC, event_type) AS exact_rank
      FROM seg GROUP BY 1)
    SELECT e.exact_rank, e.event_type,
      ROUND(CAST(e.exact_dv AS DOUBLE), 4) AS exact_value,
      ROUND(CAST(a.approx_dv AS DOUBLE), 4) AS approx_value,
      a.approx_rank,
      ROUND(CAST(e.exact_dv - COALESCE(a.approx_dv, 0) AS DOUBLE), 4) AS undercount,
      a.approx_rank = e.exact_rank AS rank_agrees
    FROM exact e LEFT JOIN approx a USING (event_type)
    ORDER BY e.exact_rank"""

  // ------------------------------------------- qan_seasonal_residual
  // Seasonality-aware anomaly detection: every observed hour's fleet
  // call volume is scored against the baseline for ITS hour-of-week
  // slot (mean ± std over all same-slot hours) — Monday 09:00 compares
  // to Monday 09:00s, never to the global distribution. Catches the
  // "quiet Sunday night suddenly busy" anomaly that absolute
  // thresholds and the per-digest MAD alert both miss, and stops the
  // daily rush hour from alarming.
  //
  // Determinism: per-slot moments are integer sums (n, Σy, Σy²); mean
  // and sample variance form in one pinned double expression, the
  // flag fires on the ROUNDED z. 100 TB shape: one hash aggregate to
  // (hour, slot) grain, one 168-row baseline aggregate broadcast
  // back — the corpus is read once.
  private val qanSeasonalResidual: Q = (s, d) => {
    val hours = events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("calls"))
      .withColumn("dow", (dayofweek(col("bucket")) - 1).cast("long"))
      .withColumn("hod", hour(col("bucket")).cast("long"))
    val base = hours.groupBy(col("dow"), col("hod"))
      .agg(count(lit(1)).as("n_slot"),
        sum(col("calls")).as("sy"),
        sum(col("calls") * col("calls")).as("syy"))
    val nD = col("n_slot").cast(DoubleType)
    val mean = col("sy").cast(DoubleType) / nD
    val varS = (nD * col("syy").cast(DoubleType)
      - col("sy").cast(DoubleType) * col("sy").cast(DoubleType)) / (nD * (nD - lit(1.0)))
    hours.join(broadcast(base), Seq("dow", "hod"))
      .select(col("bucket"), col("dow"), col("hod"), col("calls"), col("n_slot"),
        round(mean, 4).as("slot_mean"),
        when(col("n_slot") > 1 && varS > 0,
          round((col("calls").cast(DoubleType) - mean) / sqrt(varS), 4)).as("z_score"))
      .withColumn("anomalous", coalesce(abs(col("z_score")) > 3.0, lit(false)))
      .orderBy(col("bucket"))
  }

  private val qanSeasonalResidualSql = """
    WITH hours AS (
      SELECT date_trunc('hour', ts) AS bucket, COUNT(*) AS calls
      FROM events GROUP BY 1),
    slotted AS (
      SELECT bucket, calls,
        CAST(dayofweek(bucket) AS BIGINT) AS dow,
        CAST(hour(bucket) AS BIGINT) AS hod
      FROM hours),
    base AS (
      SELECT dow, hod, COUNT(*) AS n_slot,
        CAST(SUM(calls) AS BIGINT) AS sy,
        CAST(SUM(calls * calls) AS BIGINT) AS syy
      FROM slotted GROUP BY 1, 2),
    formed AS (
      SELECT s.bucket, s.dow, s.hod, s.calls, b.n_slot,
        CAST(b.sy AS DOUBLE) / CAST(b.n_slot AS DOUBLE) AS mean,
        (CAST(b.n_slot AS DOUBLE) * CAST(b.syy AS DOUBLE)
          - CAST(b.sy AS DOUBLE) * CAST(b.sy AS DOUBLE))
          / (CAST(b.n_slot AS DOUBLE) * (CAST(b.n_slot AS DOUBLE) - 1.0)) AS var_s
      FROM slotted s JOIN base b USING (dow, hod)),
    scored AS (
      SELECT bucket, dow, hod, calls, n_slot,
        ROUND(mean, 4) AS slot_mean,
        CASE WHEN n_slot > 1 AND var_s > 0
          THEN ROUND((CAST(calls AS DOUBLE) - mean) / sqrt(var_s), 4)
        END AS z_score
      FROM formed)
    SELECT bucket, dow, hod, calls, n_slot, slot_mean, z_score,
      COALESCE(abs(z_score) > 3.0, false) AS anomalous
    FROM scored
    ORDER BY bucket"""

  val entries: Map[String, Q] = Map(
    "qan_seasonal_residual" -> qanSeasonalResidual,
    "qan_topn_approx_audit" -> qanTopnApproxAudit,
    "qan_trend_forecast" -> qanTrendForecast,
    "qan_error_ztest" -> qanErrorZtest,
    "qan_m4_downsample" -> qanM4Downsample,
    "qan_markov_transitions" -> qanMarkovTransitions,
    "qan_metric_correlation" -> qanMetricCorrelation,
    "qan_digest_cooccurrence" -> qanDigestCooccurrence,
    "qan_rank_movers" -> qanRankMovers,
    "q27_range_window" -> q27RangeWindow,
    "qan_concurrency" -> qanConcurrency,
    "qan_apdex" -> qanApdex,
    "qan_heatmap" -> qanHeatmap,
    "qan_time_weighted_avg" -> qanTimeWeightedAvg,
    "qan_sla_burn" -> qanSlaBurn,
    "qan_value_histogram" -> qanValueHistogram,
    "qan_drift_psi" -> qanDriftPsi,
    "qan_gapfill" -> qanGapfill,
    "qan_topn_others" -> qanTopnOthers,
    "qan_percent_change" -> qanPercentChange,
    "qan_funnel" -> qanFunnel,
    "qan_retention" -> qanRetention)

  val oracles: Map[String, String] = Map(
    "qan_seasonal_residual" -> qanSeasonalResidualSql,
    "qan_topn_approx_audit" -> qanTopnApproxAuditSql,
    "qan_trend_forecast" -> qanTrendForecastSql,
    "qan_error_ztest" -> qanErrorZtestSql,
    "qan_m4_downsample" -> qanM4DownsampleSql,
    "qan_markov_transitions" -> qanMarkovTransitionsSql,
    "qan_metric_correlation" -> qanMetricCorrelationSql,
    "qan_digest_cooccurrence" -> qanDigestCooccurrenceSql,
    "qan_rank_movers" -> qanRankMoversSql,
    "q27_range_window" -> q27RangeWindowSql,
    "qan_concurrency" -> qanConcurrencySql,
    "qan_apdex" -> qanApdexSql,
    "qan_heatmap" -> qanHeatmapSql,
    "qan_time_weighted_avg" -> qanTimeWeightedAvgSql,
    "qan_sla_burn" -> qanSlaBurnSql,
    "qan_value_histogram" -> qanValueHistogramSql,
    "qan_drift_psi" -> qanDriftPsiSql,
    "qan_gapfill" -> qanGapfillSql,
    "qan_topn_others" -> qanTopnOthersSql,
    "qan_percent_change" -> qanPercentChangeSql,
    "qan_funnel" -> qanFunnelSql,
    "qan_retention" -> qanRetentionSql)
}
