package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.streaming.QanStream

/** Block B streaming entries (SURVEY §2.B st_*): each runs a real
  * Structured Streaming query (file-source → stateful transform →
  * memory sink) to completion and returns the materialized result.
  * Because the streaming operators implement exactly the batch
  * semantics, they share the batch DuckDB oracles — the strongest
  * correctness check a streaming op can get.
  */
object Streaming {
  type Q = (SparkSession, String) => DataFrame

  // Streaming snapshot→delta: the cumulative-counter view is computed
  // per micro-batch (window over the batch — here one batch), state
  // carries the last counter per (instance, digest).
  private val stDelta: Q = (s, d) => {
    import s.implicits._
    val w = Window
      .partitionBy(col("user_id"), col("event_type"), date_trunc("day", col("ts")))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // file-source streams can't host a global window; the counter view
    // is built batch-side (it is itself a deterministic view of the
    // table), then fed through a MemoryStream-free foreachBatch-less
    // typed stateful stream via the streaming Dataset API.
    val counters = graft.Tables.events(s, d)
      .withColumn("counter", sum(col("value").cast(DecimalType(18, 6))).over(w))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        col("counter").cast(DecimalType(38, 18)).as("counter"))
    val stream = graft.streaming.MemoryFeed.stream(s, counters.as[QanStream.CounterEvent])
    QanStream.runToMemory(QanStream.deltaStream(stream).toDF(), OutputMode.Append())
      .orderBy(col("event_id"))
  }

  // Streaming rollup in complete mode over the file-source stream.
  private val stRollup: Q = (s, d) =>
    QanStream.runToMemory(
        QanStream.rollupMinute(QanStream.eventsStream(s, d)), OutputMode.Complete())
      .orderBy(col("bucket"), col("event_type"))

  // Streaming governor: daily loads computed per batch, EMA folded in
  // managed state per instance; last emitted row per key is the
  // answer (single batch here → exactly the batch qan_ewma).
  private val stGovernor: Q = (s, d) => {
    import s.implicits._
    val loads = graft.Tables.events(s, d)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("total"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errors"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("slow"))
      .select(col("user_id"), col("day"),
        (least(lit(1.0), col("errors").cast(DoubleType) / col("total").cast(DoubleType)) * 0.7 +
          least(lit(1.0), col("slow").cast(DoubleType) / col("total").cast(DoubleType)) * 0.3).as("load_factor"))
    val stream = graft.streaming.MemoryFeed.stream(s, loads.as[QanStream.LoadObs])
    QanStream.runToMemory(QanStream.governorStream(stream).toDF(), OutputMode.Append())
      .orderBy(col("user_id"))
  }

  // Native session windows (Spark's session_window) with a watermark
  // in append mode — the streaming form of qan_sessionize. Append
  // mode only emits CLOSED sessions, so the bounded feed is augmented
  // with one far-future sentinel event per instance (value −1,
  // filtered back out by sign) to push the watermark past every real
  // session.
  private val stSession: Q = (s, d) => {
    import s.implicits._
    val ev = graft.Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val sentinels = ev.groupBy(col("user_id")).agg(max(col("ts")).as("mx"))
      .select(lit(-1L).as("event_id"),
        (col("mx") + expr("INTERVAL 48 HOURS")).as("ts"),
        col("user_id"), lit("__sentinel").as("event_type"), lit(-1.0).as("value"))
    val feed = graft.streaming.MemoryFeed.stream(s,
      ev.unionByName(sentinels).as[QanStream.RawEvent])
    val agg = feed.toDF()
      .withWatermark("ts", "1 second")
      .groupBy(col("user_id"), session_window(col("ts"), "6 hours"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("total_value"))
      .select(col("user_id"), col("session_window.start").as("start_ts"),
        col("n_events"), col("total_value"))
    QanStream.runToMemory(agg, OutputMode.Append())
      .filter(col("total_value") >= 0)
      .orderBy(col("user_id"), col("start_ts"))
  }

  private val stSessionSql = """
    WITH flagged AS (
      SELECT user_id, ts, value,
        CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
               OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 21600000000
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
      SELECT user_id, ts, value,
        SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
    SELECT user_id, MIN(ts) AS start_ts, COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, start_ts"""

  val entries: Map[String, Q] = Map(
    "st_delta_stream" -> stDelta,
    "st_rollup_stream" -> stRollup,
    "st_governor_stream" -> stGovernor,
    "st_session_stream" -> stSession)

  /** The streaming ops reproduce the batch semantics exactly, so they
    * share the batch oracles.
    */
  val oracles: Map[String, String] = Map(
    "st_session_stream" -> stSessionSql,
    "st_delta_stream" -> Qan.oracles("qan_snapshot_delta"),
    "st_rollup_stream" -> Qan.oracles("qan_rollup_minute"),
    "st_governor_stream" -> Qan.oracles("qan_ewma"))
}
