package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Tables._

/** Operational / serviceability surface (SURVEY §2.B, round 6) — the
  * remaining reference TODOs as queries (reference docs/TODO.md):
  *
  *  - time zone support (§2 "explicit UTC and local time zone
  *    configuration", "time zone conversion utilities"):
  *    qan_timezone_rollup rolls up per LOCAL day under a configured
  *    display offset and audits how many events cross a day boundary
  *    under conversion.
  *  - replication lag tracking (§9): qan_replication_lag compares
  *    each cluster member's applied-event high-water-mark against its
  *    primary's — in exact microseconds, never floating division.
  *  - query routing recommendations (§9): qan_routing_advice
  *    classifies digests read/write and flags read digests whose
  *    primary runs above its fair share of the cluster's calls.
  *  - EXPLAIN plan collection (§5 "automatic EXPLAIN plan collection
  *    for slow queries"): qan_explain_candidates picks the bounded
  *    per-digest-per-day slowest calls — the rate-limited candidate
  *    set a collector would EXPLAIN.
  *  - storage monitoring (§3 "monitoring for data storage usage"):
  *    qan_storage_usage estimates per-day stored bytes and the
  *    row-collapse ratio an hourly roll-up would achieve.
  *  - query variant comparison (§6): qan_app_variant_compare runs an
  *    app-vs-rest Welch z-test per digest from exact decimal moments.
  *  - intelligent sampling (§8): qan_adaptive_sampling equalizes the
  *    per-digest sample budget with an integer-exact adaptive rate.
  *
  * Topology scaffold matches Fleet.scala: cluster = user_id div 5,
  * primary = the member ≡ 0 mod 5 (documented there; a deployment
  * joins a real broadcast-sized instance→(cluster, role) dim).
  *
  * 100 TB shape: every query is one map-side-combined hash aggregate
  * over the scan, except the two windows, BOTH partitioned by
  * bounded keys — (cluster_id) with ≤5 members each for lag,
  * (digest, day) with top-K rank for EXPLAIN candidates. No global
  * windows, no self-joins; lag arithmetic stays in exact integer
  * microseconds so no engine-dependent float/round behavior exists.
  */
object Ops {
  type Q = (SparkSession, String) => DataFrame

  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast(DoubleType)

  // shared fleet-topology convention — ONE definition (Topology.scala)
  private val ClusterSize = Topology.ClusterSize

  private def withTopology(ev: DataFrame): DataFrame = Topology.withTopology(ev)

  // --------------------------------------------------- qan_timezone_rollup
  // Time zone support (TODO.md §2): ingestion stays UTC; display
  // rolls up per local calendar day under a configured offset. The
  // offset is deliberately non-hour-aligned (UTC+05:30) so the
  // conversion path is actually exercised. n_day_shifted counts the
  // events whose local day differs from their UTC day — the boundary
  // audit the TODO's "conversion utilities" need. One hash aggregate.
  private val TzOffsetMin = 330 // UTC+05:30

  private val qanTimezoneRollup: Q = (s, d) =>
    events(s, d)
      .withColumn("local_ts", col("ts") + expr(s"INTERVAL '$TzOffsetMin' MINUTE"))
      .withColumn("local_day", date_trunc("day", col("local_ts")))
      .groupBy(col("local_day"), col("event_type"))
      .agg(
        count(lit(1)).as("calls"),
        dsum(col("value")).as("total_value"),
        count(when(date_trunc("day", col("ts")) =!= col("local_day"), 1))
          .as("n_day_shifted"))
      .orderBy(col("local_day"), col("event_type"))

  private val qanTimezoneRollupSql = s"""
    WITH shifted AS (
      SELECT event_type, value, ts,
        ts + INTERVAL $TzOffsetMin MINUTE AS local_ts
      FROM events)
    SELECT CAST(date_trunc('day', local_ts) AS TIMESTAMP) AS local_day,
      event_type, COUNT(*) AS calls,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
      COUNT(CASE WHEN date_trunc('day', ts) <> date_trunc('day', local_ts)
        THEN 1 END) AS n_day_shifted
    FROM shifted
    GROUP BY 1, 2
    ORDER BY 1, 2"""

  // -------------------------------------------------- qan_replication_lag
  // Replication lag tracking (TODO.md §9): each member's applied
  // high-water-mark (max event ts) vs its cluster primary's, in
  // EXACT microseconds — negative lag (replica ahead of primary) is
  // kept raw rather than clamped, and the alert fires past a
  // threshold. One (cluster, member) hash aggregate, then a window
  // partitioned by cluster_id (≤ClusterSize rows per partition — no
  // skew possible by construction).
  private val LagAlertUs = 600L * 1000000L // 10 minutes

  private val qanReplicationLag: Q = (s, d) => {
    val member = withTopology(events(s, d))
      .groupBy(col("cluster_id"), col("user_id"), col("is_primary"))
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("events_applied"))
    val w = Window.partitionBy(col("cluster_id"))
    val lagUs = when(!col("is_primary") && col("primary_last_us").isNotNull,
      col("primary_last_us") - col("last_us"))
    member
      .withColumn("primary_last_us",
        max(when(col("is_primary"), col("last_us"))).over(w))
      .select(col("cluster_id"), col("user_id"),
        when(col("is_primary"), "primary").otherwise("replica").as("role"),
        timestamp_micros(col("last_us")).as("last_ts"),
        col("events_applied"),
        lagUs.as("lag_us"),
        coalesce(lagUs > LagAlertUs, lit(false)).as("lagging"))
      .orderBy(col("cluster_id"), col("user_id"))
  }

  private val qanReplicationLagSql = s"""
    WITH member AS (
      SELECT user_id // $ClusterSize AS cluster_id, user_id,
        user_id % $ClusterSize = 0 AS is_primary,
        MAX(epoch_us(ts)) AS last_us, COUNT(*) AS events_applied
      FROM events GROUP BY 1, 2, 3),
    w AS (
      SELECT *, MAX(CASE WHEN is_primary THEN last_us END)
        OVER (PARTITION BY cluster_id) AS primary_last_us
      FROM member)
    SELECT cluster_id, user_id,
      CASE WHEN is_primary THEN 'primary' ELSE 'replica' END AS role,
      make_timestamp(last_us) AS last_ts, events_applied,
      CASE WHEN NOT is_primary AND primary_last_us IS NOT NULL
        THEN primary_last_us - last_us END AS lag_us,
      COALESCE(CASE WHEN NOT is_primary AND primary_last_us IS NOT NULL
        THEN primary_last_us - last_us END > $LagAlertUs, false) AS lagging
    FROM w
    ORDER BY 1, 2"""

  // --------------------------------------------------- qan_routing_advice
  // Query routing recommendations (TODO.md §9): digests classify
  // read/write by statement kind (the scaffold maps browse digests to
  // reads, mutating ones to writes); a read digest whose primary
  // serves more than its fair share of cluster calls is advised to
  // offload. Fairness is decided in EXACT integers —
  // primary_calls × (n_replicas + 1) vs total_calls — so the advice
  // cannot flap on float rounding; excess_weighted is that integer
  // surplus (shiftable calls × member count). One conditional-sum
  // hash aggregate per (cluster, digest); no joins.
  private val ReadTypes = Seq("view", "click")

  private val qanRoutingAdvice: Q = (s, d) => {
    val agg = withTopology(events(s, d))
      .groupBy(col("cluster_id"), col("event_type"))
      .agg(
        count(when(col("is_primary"), 1)).as("primary_calls"),
        count(when(!col("is_primary"), 1)).as("replica_calls"),
        countDistinct(when(!col("is_primary"), col("user_id"))).as("n_replicas"),
        dsum(col("value")).as("total_value"))
      .withColumn("is_read", col("event_type").isin(ReadTypes: _*))
      .withColumn("total_calls", col("primary_calls") + col("replica_calls"))
      .withColumn("excess_weighted",
        col("primary_calls") * (col("n_replicas") + 1) - col("total_calls"))
    agg
      .select(col("cluster_id"), col("event_type"), col("is_read"),
        col("primary_calls"), col("replica_calls"), col("n_replicas"),
        round(col("primary_calls").cast(DoubleType) /
          col("total_calls").cast(DoubleType), 4).as("primary_share"),
        col("excess_weighted"),
        when(!col("is_read"), "keep_on_primary")
          .when(col("n_replicas") === 0, "no_replicas")
          .when(col("excess_weighted") > 0, "offload_to_replicas")
          .otherwise("balanced").as("advice"))
      .orderBy(col("cluster_id"), col("event_type"))
  }

  private val qanRoutingAdviceSql = s"""
    WITH agg AS (
      SELECT user_id // $ClusterSize AS cluster_id, event_type,
        COUNT(CASE WHEN user_id % $ClusterSize = 0 THEN 1 END) AS primary_calls,
        COUNT(CASE WHEN user_id % $ClusterSize <> 0 THEN 1 END) AS replica_calls,
        COUNT(DISTINCT CASE WHEN user_id % $ClusterSize <> 0 THEN user_id END) AS n_replicas
      FROM events
      GROUP BY 1, 2),
    formed AS (
      SELECT *, event_type IN ('view', 'click') AS is_read,
        primary_calls + replica_calls AS total_calls,
        primary_calls * (n_replicas + 1) - (primary_calls + replica_calls)
          AS excess_weighted
      FROM agg)
    SELECT cluster_id, event_type, is_read, primary_calls, replica_calls,
      n_replicas,
      ROUND(CAST(primary_calls AS DOUBLE) / CAST(total_calls AS DOUBLE), 4)
        AS primary_share,
      excess_weighted,
      CASE WHEN NOT is_read THEN 'keep_on_primary'
           WHEN n_replicas = 0 THEN 'no_replicas'
           WHEN excess_weighted > 0 THEN 'offload_to_replicas'
           ELSE 'balanced' END AS advice
    FROM formed
    ORDER BY 1, 2"""

  // ------------------------------------------------ qan_explain_candidates
  // EXPLAIN plan collection (TODO.md §5 "automatic EXPLAIN plan
  // collection for slow queries"): the collector-side selection — per
  // digest per day, the K slowest calls, deterministically
  // tie-broken. The window partitions by (digest, day) so its
  // per-partition row count is one day of one digest — never global —
  // and the output is bounded at digests × days × K rows regardless
  // of corpus size; that bound IS the TODO's rate limit on EXPLAIN
  // overhead against the production database.
  private val ExplainTopK = 3

  private val qanExplainCandidates: Q = (s, d) =>
    events(s, d)
      .withColumn("day", date_trunc("day", col("ts")))
      .withColumn("slow_rank", row_number().over(
        Window.partitionBy(col("event_type"), col("day"))
          .orderBy(col("value").desc, col("event_id"))))
      .filter(col("slow_rank") <= ExplainTopK)
      .select(col("event_type"), col("day"), col("slow_rank"),
        col("event_id"), col("ts"), col("value"))
      .orderBy(col("event_type"), col("day"), col("slow_rank"))

  private val qanExplainCandidatesSql = s"""
    WITH ranked AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        ROW_NUMBER() OVER (
          PARTITION BY event_type, date_trunc('day', ts)
          ORDER BY value DESC, event_id) AS slow_rank
      FROM events)
    SELECT event_type, day, slow_rank, event_id, ts, value
    FROM ranked
    WHERE slow_rank <= $ExplainTopK
    ORDER BY 1, 2, 3"""

  // --------------------------------------------------- qan_storage_usage
  // Storage-usage monitoring (TODO.md §3): per ingest day, raw row
  // count, estimated stored bytes (fixed-width columns + measured
  // string payloads), the row count an hourly×digest roll-up would
  // collapse to, and the collapse ratio — the number that says what
  // the retention tiering (Fleet.qan_retention_tiering) will save
  // BEFORE it runs. One hash aggregate; the distinct hourly key count
  // is computed inside it, keyed by exact epoch micros so both
  // engines see identical distinctness.
  private val qanStorageUsage: Q = (s, d) =>
    events(s, d)
      .withColumn("day", date_trunc("day", col("ts")))
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("raw_rows"),
        sum((length(col("event_type")) + length(col("props")) + lit(32))
          .cast(LongType)).as("est_bytes"),
        countDistinct(unix_micros(date_trunc("hour", col("ts"))), col("event_type"))
          .as("hourly_rows"))
      .select(col("day"), col("raw_rows"), col("est_bytes"), col("hourly_rows"),
        round(col("hourly_rows").cast(DoubleType) /
          col("raw_rows").cast(DoubleType), 6).as("rollup_ratio"))
      .orderBy(col("day"))

  private val qanStorageUsageSql = """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      COUNT(*) AS raw_rows,
      CAST(SUM(length(event_type) + length(props) + 32) AS BIGINT) AS est_bytes,
      COUNT(DISTINCT (epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP)), event_type))
        AS hourly_rows,
      ROUND(CAST(COUNT(DISTINCT (epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP)), event_type)) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS rollup_ratio
    FROM events
    GROUP BY 1
    ORDER BY 1"""

  // ------------------------------------------------ qan_app_variant_compare
  // Query variant comparison across apps (TODO.md §6 "query variant
  // comparison (similar queries across different apps)" + "statistical
  // significance indicators"): the same digest issued by different
  // apps is compared app-vs-rest on mean metric value with a Welch
  // z-test. Moments (n, Σv, Σv²) accumulate as EXACT decimals per
  // (digest, app); the rest-of-apps moments are the digest totals
  // minus the app's own — formed by a window over the app-grain rows
  // partitioned by digest (≤|apps| rows per partition, never raw
  // events) — so the corpus is read ONCE and no self-join exists.
  // z forms in one pinned double expression; the flag fires on the
  // ROUNDED z. App tag and digest follow the Fleet.scala scaffold
  // (app = user_id mod 3, digest = the statement shape, here its
  // event_type key per SURVEY §3's QAN mapping).
  private val qanAppVariantCompare: Q = (s, d) => {
    val perApp = events(s, d)
      .withColumn("app", concat(lit("app_"), col("user_id") % 3))
      .groupBy(col("event_type"), col("app"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).as("sv"),
        sum(col("value").cast(DecimalType(18, 6)) *
          col("value").cast(DecimalType(18, 6))).as("svv"))
    val w = Window.partitionBy(col("event_type"))
    val pooled = perApp
      .withColumn("tn", sum(col("n")).over(w))
      .withColumn("ts", sum(col("sv")).over(w))
      .withColumn("tss", sum(col("svv")).over(w))
      .withColumn("rn", col("tn") - col("n"))
      .withColumn("rs", col("ts") - col("sv"))
      .withColumn("rss", col("tss") - col("svv"))
    val nD = col("n").cast(DoubleType)
    val rnD = col("rn").cast(DoubleType)
    val meanA = col("sv").cast(DoubleType) / nD
    val meanR = col("rs").cast(DoubleType) / rnD
    val varA = (nD * col("svv").cast(DoubleType) -
      col("sv").cast(DoubleType) * col("sv").cast(DoubleType)) / (nD * (nD - 1.0))
    val varR = (rnD * col("rss").cast(DoubleType) -
      col("rs").cast(DoubleType) * col("rs").cast(DoubleType)) / (rnD * (rnD - 1.0))
    val se2 = varA / nD + varR / rnD
    val z = when(col("n") >= 2 && col("rn") >= 2 && se2 > 0.0,
      round((meanA - meanR) / sqrt(se2), 4))
    pooled
      .select(col("event_type"), col("app"), col("n"),
        round(meanA, 6).as("mean_value"),
        col("rn").as("rest_n"),
        when(col("rn") > 0, round(meanR, 6)).as("rest_mean"),
        z.as("z_score"),
        coalesce(abs(z) > 1.96, lit(false)).as("significant"))
      .orderBy(col("event_type"), col("app"))
  }

  private val qanAppVariantCompareSql = """
    WITH per_app AS (
      -- width 19 forces DuckDB's HUGEINT decimal path on the square
      -- (an (18,6) pair multiplies in int64 internals and overflows)
      SELECT event_type, 'app_' || (user_id % 3) AS app,
        COUNT(*) AS n,
        SUM(CAST(value AS DECIMAL(18,6))) AS sv,
        SUM(CAST(value AS DECIMAL(19,6)) * CAST(value AS DECIMAL(19,6))) AS svv
      FROM events
      GROUP BY 1, 2),
    pooled AS (
      SELECT *,
        CAST(SUM(n) OVER (PARTITION BY event_type) - n AS BIGINT) AS rn,
        SUM(sv) OVER (PARTITION BY event_type) - sv AS rs,
        SUM(svv) OVER (PARTITION BY event_type) - svv AS rss
      FROM per_app),
    formed AS (
      SELECT *,
        CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS mean_a,
        CAST(rs AS DOUBLE) / CAST(rn AS DOUBLE) AS mean_r,
        (CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
          - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var_a,
        (CAST(rn AS DOUBLE) * CAST(rss AS DOUBLE)
          - CAST(rs AS DOUBLE) * CAST(rs AS DOUBLE))
          / (CAST(rn AS DOUBLE) * (CAST(rn AS DOUBLE) - 1.0)) AS var_r
      FROM pooled),
    scored AS (
      SELECT *,
        CASE WHEN n >= 2 AND rn >= 2
            AND var_a / CAST(n AS DOUBLE) + var_r / CAST(rn AS DOUBLE) > 0.0
          THEN ROUND((mean_a - mean_r)
            / sqrt(var_a / CAST(n AS DOUBLE) + var_r / CAST(rn AS DOUBLE)), 4)
        END AS z
      FROM formed)
    SELECT event_type, app, n,
      ROUND(mean_a, 6) AS mean_value,
      rn AS rest_n,
      CASE WHEN rn > 0 THEN ROUND(mean_r, 6) END AS rest_mean,
      z AS z_score,
      COALESCE(abs(z) > 1.96, false) AS significant
    FROM scored
    ORDER BY 1, 2"""

  // ------------------------------------------------ qan_adaptive_sampling
  // Intelligent query sampling (TODO.md §8 "intelligent query
  // sampling algorithms"): a fixed global rate over-samples hot
  // digests and starves rare ones. Here the per-digest rate adapts to
  // volume — threshold_permille = ceil(budget×1000 / calls), capped
  // at 1000 — so EVERY digest lands ≈budget samples: rare digests
  // are kept whole, hot ones are rate-limited. Membership stays the
  // salted-hash rule (reproducible under re-runs, partitioning and
  // growth). Integer-exact throughout: ceil division on positive
  // integers, no float thresholds. One counts aggregate broadcast
  // back onto the scan (bounded by digest cardinality), one audit
  // aggregate out.
  private val AdaptiveBudget = 50L

  private val qanAdaptiveSampling: Q = (s, d) => {
    val ev = events(s, d)
    val counts = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("calls"))
      .withColumn("threshold_permille",
        least(lit(1000L),
          expr(s"(${AdaptiveBudget * 1000L} + calls - 1) div calls")))
    ev.withColumn("bucket",
        conv(substring(md5(concat(col("event_id").cast("string"),
          lit("|graft-adaptive-v1"))), 1, 8), 16, 10).cast("long") % 1000)
      .join(broadcast(counts), Seq("event_type"))
      .groupBy(col("event_type"), col("calls"), col("threshold_permille"))
      .agg(count(when(col("bucket") < col("threshold_permille"), 1)).as("n_sampled"))
      .select(col("event_type"), col("calls"), col("threshold_permille"),
        col("n_sampled"),
        round(col("n_sampled").cast(DoubleType) * 1000.0 /
          col("calls").cast(DoubleType), 3).as("realized_permille"),
        (col("threshold_permille") === 1000L).as("fully_sampled"))
      .orderBy(col("event_type"))
  }

  private val qanAdaptiveSamplingSql = s"""
    WITH counts AS (
      SELECT event_type, COUNT(*) AS calls,
        LEAST(1000, (${AdaptiveBudget * 1000L} + COUNT(*) - 1) // COUNT(*))
          AS threshold_permille
      FROM events GROUP BY 1),
    tagged AS (
      SELECT e.event_type, c.calls, c.threshold_permille,
        CAST(('0x' || substr(md5(CAST(e.event_id AS VARCHAR) || '|graft-adaptive-v1'), 1, 8)) AS BIGINT) % 1000 AS bucket
      FROM events e JOIN counts c USING (event_type))
    SELECT event_type, calls, threshold_permille,
      COUNT(CASE WHEN bucket < threshold_permille THEN 1 END) AS n_sampled,
      ROUND(CAST(COUNT(CASE WHEN bucket < threshold_permille THEN 1 END) AS DOUBLE)
        * 1000.0 / CAST(calls AS DOUBLE), 3) AS realized_permille,
      threshold_permille = 1000 AS fully_sampled
    FROM tagged
    GROUP BY 1, 2, 3
    ORDER BY 1"""

  val entries: Map[String, Q] = Map(
    "qan_app_variant_compare" -> qanAppVariantCompare,
    "qan_adaptive_sampling" -> qanAdaptiveSampling,
    "qan_timezone_rollup" -> qanTimezoneRollup,
    "qan_replication_lag" -> qanReplicationLag,
    "qan_routing_advice" -> qanRoutingAdvice,
    "qan_explain_candidates" -> qanExplainCandidates,
    "qan_storage_usage" -> qanStorageUsage)

  val oracles: Map[String, String] = Map(
    "qan_app_variant_compare" -> qanAppVariantCompareSql,
    "qan_adaptive_sampling" -> qanAdaptiveSamplingSql,
    "qan_timezone_rollup" -> qanTimezoneRollupSql,
    "qan_replication_lag" -> qanReplicationLagSql,
    "qan_routing_advice" -> qanRoutingAdviceSql,
    "qan_explain_candidates" -> qanExplainCandidatesSql,
    "qan_storage_usage" -> qanStorageUsageSql)
}
