package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Polling snapshot ingestion, the reference's collector loop
  * re-expressed on Spark.
  *
  * The reference polls cumulative-counter statement tables on an
  * interval — `performance_schema.events_statements_summary_by_digest`
  * (otel-collector/extension/qanprocessor/mysql/collector.go:123) and
  * `pg_stat_statements` (postgresql/collector.go:112) — and feeds
  * successive snapshots through delta calculation. Here each poll is
  * one batch read staged as parquet, and the streaming side drains the
  * staging directory with `Trigger.AvailableNow` — the same
  * file-source machinery as QanStream.eventsStream, so everything
  * downstream (deltaFromRaw, rollups, governor) composes unchanged.
  *
  * The fetch itself is injectable: production uses the JDBC reader
  * (executor-side partitioned scan), tests use a stub — the sandbox
  * has no live database, so the seam is the tested surface.
  */
object PollingSource {

  /** One poll = one DataFrame of the cumulative-counter table. */
  trait SnapshotFetcher {
    def fetch(spark: SparkSession, pollIndex: Long): DataFrame
  }

  /** Production fetcher: partitioned JDBC scan of a statements table.
    *
    * `partitionColumn/lowerBound/upperBound/numPartitions` split the
    * scan across executors — a digest table is small per instance,
    * but a fleet-wide federated table is not; never read it through
    * one connection.
    */
  final case class JdbcFetcher(
      url: String,
      table: String,
      user: String,
      password: String,
      partitionColumn: Option[String] = None,
      lowerBound: Long = 0L,
      upperBound: Long = 1L,
      numPartitions: Int = 1) extends SnapshotFetcher {
    override def fetch(spark: SparkSession, pollIndex: Long): DataFrame = {
      val r = spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
      val p = partitionColumn.fold(r) { c =>
        r.option("partitionColumn", c)
          .option("lowerBound", lowerBound)
          .option("upperBound", upperBound)
          .option("numPartitions", numPartitions)
      }
      p.load()
    }
  }

  /** Poll `fetcher` `polls` times, staging each snapshot as one
    * parquet append stamped with `poll_index` and `poll_ts` (micros) —
    * the TimePeriodSecs ingredient CalculateDeltas needs
    * (snapshot.go:166). The driver only ORCHESTRATES the poll (the
    * fetch and write are executor-side jobs); `intervalMs` spaces the
    * polls like the reference's ticker, 0 in tests.
    *
    * Returns the staged row count per poll (diagnostics).
    */
  def pollToStaging(spark: SparkSession, fetcher: SnapshotFetcher,
      polls: Int, stagingDir: String, intervalMs: Long = 0L,
      startIndex: Long = 0L,
      clock: Long => Long = _ => System.currentTimeMillis() * 1000L): Seq[Long] =
    (startIndex until startIndex + polls).map { i =>
      val snap = fetcher.fetch(spark, i)
        .withColumn("poll_index", lit(i))
        .withColumn("poll_ts", lit(clock(i)))
      snap.write.mode("append").parquet(stagingDir)
      if (intervalMs > 0) Thread.sleep(intervalMs)
      snap.count()
    }

  /** File-source stream over the staging directory. */
  def stagedStream(spark: SparkSession, stagingDir: String,
      schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(stagingDir)

  /** Drain everything currently staged into a parquet sink and stop:
    * Trigger.AvailableNow processes all available input in
    * (rate-limited) micro-batches, checkpoints, and shuts the query
    * down — the batch-polling complement to a continuously-running
    * stream. Operator state (e.g. deltaStream's last counters) and
    * source offsets survive across drains through the checkpoint dir,
    * exactly like the reference's SnapshotStore surviving across poll
    * ticks; the file sink's commit log makes the output exactly-once.
    */
  def drainAvailableNow(df: DataFrame, outDir: String,
      checkpointDir: String): StreamingQuery = {
    // stateful operators snapshot spark.sql.shuffle.partitions at
    // query start and keep one state store per partition — at the
    // session's batch-oriented setting a bounded drain spends its
    // time committing near-empty store deltas, not computing deltas
    // (the QanStream.runToMemoryQuery replay rule; production drains
    // size this to their own key cardinality). Same set→start→restore
    // critical section, serialized through the shared replay lock.
    val q = graft.streaming.QanStream.startReplay(df.sparkSession) {
      df.writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    q
  }
}
