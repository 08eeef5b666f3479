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

  private val ClusterSize = 5

  private def withTopology(ev: DataFrame): DataFrame = ev
    .withColumn("cluster_id", expr(s"user_id div $ClusterSize"))
    .withColumn("is_primary", col("user_id") % ClusterSize === 0)

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

  val entries: Map[String, Q] = Map(
    "qan_timezone_rollup" -> qanTimezoneRollup,
    "qan_replication_lag" -> qanReplicationLag,
    "qan_routing_advice" -> qanRoutingAdvice,
    "qan_explain_candidates" -> qanExplainCandidates,
    "qan_storage_usage" -> qanStorageUsage)

  val oracles: Map[String, String] = Map(
    "qan_timezone_rollup" -> qanTimezoneRollupSql,
    "qan_replication_lag" -> qanReplicationLagSql,
    "qan_routing_advice" -> qanRoutingAdviceSql,
    "qan_explain_candidates" -> qanExplainCandidatesSql,
    "qan_storage_usage" -> qanStorageUsageSql)
}
