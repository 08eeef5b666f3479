package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.{DedupStream, QanStream}

/** Cost-attribution probe for st_minhash_stream — the heaviest
  * streaming query at the 100× point (231 s standalone in the r8
  * BENCH_SF10). Splits the measured replay cost into its three
  * candidate causes, each measured on the SAME executed plan over the
  * SAME feed, plus a state-store-backend comparison:
  *
  *   scan-only   the stateless stage (gram hashes → minhash signature
  *               → band explode) run to a stateless sink: signature
  *               compute + source/sink overhead, no state store.
  *   state-only  the same bucketed rows through an otherwise-identical
  *               flatMapGroupsWithState that updates per-bucket state
  *               but skips the member-comparison loop and emits
  *               nothing: scan cost + groupByKey shuffle + state-store
  *               I/O, no pair work. (state-only − scan-only ≈ state
  *               machinery; full − state-only ≈ pair comparison +
  *               emission.)
  *   full        production DedupStream.minhashPairStream.
  *   full@rocksdb the same full pipeline under the RocksDB state-store
  *               provider — the candidate fix IF store I/O dominates.
  *
  * Each variant runs over a 1-batch feed (the bench replay's shape)
  * and an 8-batch feed (maxFilesPerTrigger=1 over an 8-file split of
  * the same corpus) so per-micro-batch fixed overhead is measurable as
  * the slope between the two. Wall clock plus the progress-metric
  * breakdown (addBatch, state commit/update times, state rows/memory)
  * are printed per run; every variant runs twice and the SECOND run is
  * the comparable number (first pays JIT).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.StreamProbe
  */
object StreamProbe {

  private def stateOnlyStream(bucketed: org.apache.spark.sql.Dataset[DedupStream.BucketRow]) = {
    import bucketed.sparkSession.implicits._
    bucketed
      .groupByKey(r => (r.band, r.bkey))
      .flatMapGroupsWithState[DedupStream.BucketState, DedupStream.NearDupPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, it, state: GroupState[DedupStream.BucketState]) =>
          val arrivals = it.toSeq.sortBy(_.doc_id)
          var members = state.getOption.map(_.members).getOrElse(Nil)
          arrivals.foreach { r => members = (r.doc_id, r.sig) :: members }
          state.update(DedupStream.BucketState(members))
          Iterator.empty
      }
  }

  /** The stateless variant streams to the NOOP sink: every row is
    * evaluated and discarded executor-side. A memory sink would
    * collect the full bucketed relation (rows × 36-long signatures —
    * ~2 GB at the 100× corpus) to the driver, both blowing
    * maxResultSize and charging the scan-only variant a driver-ingest
    * cost the stateful variants never pay (they emit only pairs).
    */
  private[tools] def runNoop(spark: SparkSession, label: String, df: DataFrame): Unit = {
    val t0 = System.nanoTime()
    val q = df.writeStream.outputMode(OutputMode.Append())
      .format("noop")
      .option("checkpointLocation",
        s"${System.getProperty("java.io.tmpdir", "/tmp")}/streamprobe_ckpt_${java.util.UUID.randomUUID().toString.take(8)}")
      .start()
    q.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.filter(_.numInputRows > 0)
    val addBatch = progress.map(p =>
      Option(p.durationMs.get("addBatch")).map(_.longValue).getOrElse(0L)).sum
    val rows = progress.map(_.numInputRows).sum
    q.stop()
    println(f"[stream-probe] $label%-24s wall=$wall%7.2fs batches=${progress.length}%2d " +
      f"addBatch=${addBatch / 1e3}%6.2fs (noop sink) inRows=$rows%9d")
    QanStream.releaseReplayState(spark)
  }

  private[tools] def runVariant(spark: SparkSession, label: String, df: DataFrame): Unit = {
    val t0 = System.nanoTime()
    val h = QanStream.runToMemoryQuery(df, OutputMode.Append())
    h.query.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    val progress = h.query.recentProgress.filter(_.numInputRows > 0)
    val batches = progress.length
    def sumDur(key: String): Long =
      progress.map(p => Option(p.durationMs.get(key)).map(_.longValue).getOrElse(0L)).sum
    val addBatch = sumDur("addBatch")
    val stateOps = progress.flatMap(_.stateOperators)
    val commit = stateOps.map(_.commitTimeMs).sum
    val updates = stateOps.map(_.allUpdatesTimeMs).sum
    val removals = stateOps.map(_.allRemovalsTimeMs).sum
    val stateRows = if (stateOps.isEmpty) 0L else stateOps.map(_.numRowsTotal).max
    val stateMem = if (stateOps.isEmpty) 0L else stateOps.map(_.memoryUsedBytes).max
    val rows = spark.table(h.name).count()
    h.query.stop()
    println(f"[stream-probe] $label%-24s wall=$wall%7.2fs batches=$batches%2d " +
      f"addBatch=${addBatch / 1e3}%6.2fs stateCommit=${commit / 1e3}%6.2fs " +
      f"stateUpd=${updates / 1e3}%6.2fs stateRm=${removals / 1e3}%6.2fs " +
      f"stateRows=$stateRows%7d stateMB=${stateMem / 1e6}%7.1f out=$rows%7d")
    QanStream.releaseReplayState(spark)
  }

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

    // 8-file split of the same corpus for the multi-batch feed
    val splitDir = s"${System.getProperty("java.io.tmpdir", "/tmp")}/streamprobe_docs"
    graft.Tables.documents(spark, sfDir).repartition(8)
      .write.mode("overwrite").parquet(splitDir)
    val schema = spark.read.parquet(splitDir).schema

    def oneBatchFeed(): DataFrame = QanStream.documentsStream(spark, sfDir)
    def multiBatchFeed(): DataFrame = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(splitDir)

    val rocksdb = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    def withProvider[T](cls: String)(f: => T): T = {
      val prev = spark.conf.getOption(providerKey)
      spark.conf.set(providerKey, cls)
      try f finally prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }

    // big-corpus runs trim the sweep: STREAMPROBE_ITERS=1
    // STREAMPROBE_FEEDS=1batch keeps one pass per variant
    val iters = sys.env.getOrElse("STREAMPROBE_ITERS", "2").toInt
    val feedSel = sys.env.getOrElse("STREAMPROBE_FEEDS", "1batch,8batch").split(",").toSet
    for (iter <- 1 to iters) {
      println(s"[stream-probe] ---- iteration $iter (compare SECOND — first pays JIT) ----")
      for ((fl, feed) <- Seq(("1batch", () => oneBatchFeed()),
          ("8batch", () => multiBatchFeed())).filter(p => feedSel(p._1))) {
        runNoop(spark, s"scan-only/$fl",
          DedupStream.minhashBucketed(feed()).toDF())
        runVariant(spark, s"state-only/$fl",
          stateOnlyStream(DedupStream.minhashBucketed(feed())).toDF())
        runVariant(spark, s"full/$fl",
          DedupStream.minhashPairStream(feed()).toDF())
        withProvider(rocksdb) {
          runVariant(spark, s"full-rocksdb/$fl",
            DedupStream.minhashPairStream(feed()).toDF())
        }
      }
    }
    spark.stop()
  }
}
