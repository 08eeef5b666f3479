package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Intra-query cost attribution: run one query end to end (through the
  * noop sink, the bench's timed action) and print EVERY Spark job it
  * launches — wall clock, task count, description — plus the gaps
  * BETWEEN jobs (driver-side work: planning, fs listings, renames,
  * collects). Composite lifecycle queries (store build + append +
  * compact + manifest) launch dozens of jobs; this tells which leg
  * owns the seconds before any operator is touched.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        SPARK_GRAFT_ONLY=doc_lex_compact_tiered runMain graft.tools.JobProbe
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "doc_lex_compact_tiered")
      .split(",").toSeq
    val warm = sys.env.getOrElse("SPARK_GRAFT_WARM", "1").toInt
    // experimental conf overrides: SPARK_GRAFT_CONF="k=v;k=v"
    val extraConf = sys.env.getOrElse("SPARK_GRAFT_CONF", "")
      .split(";").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.driver.maxResultSize",
        sys.env.getOrElse("SPARK_GRAFT_MAX_RESULT", "4g"))
      .config("spark.ui.enabled", "false")
    val spark = extraConf.foldLeft(builder0) {
      case (b, (k, v)) => b.config(k, v)
    }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)

    final case class JobRec(id: Int, start: Long, var end: Long,
      var tasks: Int, desc: String)
    val jobs = ArrayBuffer[JobRec]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs += JobRec(js.jobId, js.time, -1L,
            js.stageInfos.map(_.numTasks).sum,
            Option(js.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .orElse(js.stageInfos.lastOption.map(_.name.take(90)))
              .getOrElse("?"))
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_.id == je.jobId).foreach(_.end = je.time)
        }
    }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def clear(): Unit = {
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        graft.streaming.QanStream.releaseReplayState(spark)
        System.gc()
      }
      for (_ <- 1 to warm) { // warm-up, untimed
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        clear()
      }
      jobs.synchronized(jobs.clear())
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.currentTimeMillis()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.currentTimeMillis() - t0) / 1e3
      spark.sparkContext.removeSparkListener(listener)
      val snap = jobs.synchronized(jobs.toVector).sortBy(_.start)
      println(f"[jobprobe] $name wall=${wall}%.2fs jobs=${snap.size}")
      var prevEnd = t0
      var jobSec = 0.0; var gapSec = 0.0
      snap.foreach { j =>
        val gap = (j.start - prevEnd) / 1e3
        val dur = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
        if (gap > 0) gapSec += gap
        if (dur > 0) jobSec += dur
        println(f"[jobprobe]   gap=${gap}%6.3fs job=${j.id}%4d " +
          f"dur=${dur}%7.3fs tasks=${j.tasks}%4d  ${j.desc}")
        prevEnd = math.max(prevEnd, if (j.end > 0) j.end else j.start)
      }
      val tail = (t0 + (wall * 1000).toLong - prevEnd) / 1e3
      println(f"[jobprobe] $name SUMMARY wall=${wall}%.2fs " +
        f"in_jobs=${jobSec}%.2fs driver_gaps=${gapSec + math.max(0, tail)}%.2fs " +
        f"n_jobs=${snap.size}")
      clear()
    }
    spark.stop()
  }
}
