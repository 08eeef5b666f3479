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

  val entries: Map[String, Q] = Map(
    "st_delta_stream" -> stDelta,
    "st_rollup_stream" -> stRollup,
    "st_governor_stream" -> stGovernor)

  /** The streaming ops reproduce the batch semantics exactly, so they
    * share the batch oracles.
    */
  val oracles: Map[String, String] = Map(
    "st_delta_stream" -> Qan.oracles("qan_snapshot_delta"),
    "st_rollup_stream" -> Qan.oracles("qan_rollup_minute"),
    "st_governor_stream" -> Qan.oracles("qan_ewma"))
}
