package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.streaming.QanStream

/** Cost-attribution probe for the three heaviest STATEFUL streaming
  * heads at the 100× point after st_minhash_stream
  * (st_percent_change 21.9×, st_delta_stream 20.7×,
  * st_session_append 17.3× in BENCH_SF10 r10) — the r10 verdict's
  * directive #6, the [[StreamProbe]] pattern applied to the
  * flatMapGroupsWithState heads and the watermarked session window.
  *
  * Per head, two variants over the SAME feed:
  *
  *   scan-only  the stateless projection feeding the stateful stage,
  *              run to a NOOP sink: source scan + projection + sink
  *              machinery, zero state.
  *   full       the production stream (the exact builders the bench
  *              queries call), to the memory sink the bench replay
  *              uses. full − scan-only ≈ groupByKey shuffle + state
  *              store + group-function/session-merge work + sink
  *              ingest; the printed state metrics (commit/update
  *              times, rows, memory) split that further.
  *
  * Each variant runs over the 1-batch feed (the bench replay's shape)
  * and an 8-batch maxFilesPerTrigger=1 feed, so per-micro-batch fixed
  * overhead is the slope between the two. Two iterations — compare
  * the SECOND (first pays JIT).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.StreamHeadsProbe
  */
object StreamHeadsProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    import spark.implicits._

    // 8-file split of the events table for the multi-batch feed (the
    // loader already normalized ts to session-zoned TIMESTAMP)
    val splitDir =
      s"${System.getProperty("java.io.tmpdir", "/tmp")}/streamheads_events"
    graft.Tables.events(spark, sfDir).repartition(8)
      .write.mode("overwrite").parquet(splitDir)
    val schema = spark.read.parquet(splitDir).schema

    def oneBatchFeed(): DataFrame = QanStream.eventsStream(spark, sfDir)
    def multiBatchFeed(): DataFrame = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(splitDir)

    // the EXACT projections the bench queries apply before their
    // stateful stage (Streaming.scala stDelta / stPercentChange /
    // stSessionAppend) — scan-only measures this stage to a noop sink
    def deltaFeed(src: DataFrame): DataFrame = src
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        date_trunc("day", col("ts")).as("day"),
        col("value").cast(DecimalType(18, 6)).as("value_dec"))
    def pcFeed(src: DataFrame): DataFrame = src
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        unix_micros(date_trunc("day", col("ts"))).as("day_us"),
        col("value").cast(DecimalType(18, 6)).as("v"))
    def sessionAgg(src: DataFrame): DataFrame = src
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "6 hours"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("total_value"))
      .select(col("user_id"), col("session_window.start").as("start_ts"),
        col("n_events"), col("total_value"))

    val iters = sys.env.getOrElse("STREAMPROBE_ITERS", "2").toInt
    val feedSel = sys.env.getOrElse("STREAMPROBE_FEEDS", "1batch,8batch")
      .split(",").toSet
    for (iter <- 1 to iters) {
      println(s"[stream-probe] ---- iteration $iter (compare SECOND — first pays JIT) ----")
      for ((fl, feed) <- Seq(("1batch", () => oneBatchFeed()),
          ("8batch", () => multiBatchFeed())).filter(p => feedSel(p._1))) {
        // st_delta_stream
        StreamProbe.runNoop(spark, s"delta/scan/$fl", deltaFeed(feed()))
        StreamProbe.runVariant(spark, s"delta/full/$fl",
          QanStream.deltaFromRaw(deltaFeed(feed()).as[QanStream.SnapEvent]).toDF())
        // st_percent_change
        StreamProbe.runNoop(spark, s"pct/scan/$fl", pcFeed(feed()))
        StreamProbe.runVariant(spark, s"pct/full/$fl",
          QanStream.percentChangeStream(pcFeed(feed()).as[QanStream.PcEvent]).toDF())
        // st_session_append (built-in session window, not FMGWS)
        StreamProbe.runNoop(spark, s"session/scan/$fl",
          feed().select(col("user_id"), col("ts"), col("value")))
        StreamProbe.runVariant(spark, s"session/full/$fl", sessionAgg(feed()))
      }
    }
    spark.stop()
  }
}
