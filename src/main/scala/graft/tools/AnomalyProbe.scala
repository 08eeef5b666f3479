package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-run attribution probe for the r10 bench anomaly
  * (doc_leakage_safe_split 9.11 s vs 3.09 s on identical code/data —
  * VERDICT r10 What's-wrong #3, and doc_lsh_recall's [2.61, 7.58]
  * band): run the query N times ISOLATED and print, per run, the wall
  * clock next to the JVM counters that move with it — GC time delta,
  * old-gen occupancy before/after, code-cache size. If wall tracks
  * the GC delta on identical plans, the spread is allocation/GC
  * variance (the minhash signature pass allocates shingle arrays at
  * GB/s; a run that lands on a mixed-GC cycle pays seconds), not a
  * plan or data change.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ONLY=doc_leakage_safe_split \
  *        runMain graft.tools.AnomalyProbe
  */
object AnomalyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "doc_leakage_safe_split")
      .split(",").toSeq
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)

    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    def gcSec(): Double = ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum / 1e3
    def oldGenMb(): Double = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(p => p.getName.contains("Old") || p.getName.contains("Tenured"))
      .map(_.getUsage.getUsed).sum / 1e6
    def codeMb(): Double = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap")).map(_.getUsage.getUsed).sum / 1e6

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm-up (JIT + parquet footers), untimed
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      for (r <- 1 to runs) {
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        System.gc()
        val (g0, o0) = (gcSec(), oldGenMb())
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[anomaly-probe] $name%-26s run=$r%2d wall=$wall%7.2fs " +
          f"gc_delta=${gcSec() - g0}%6.2fs oldgen=${o0}%7.1f->${oldGenMb()}%7.1fMB " +
          f"codecache=${codeMb()}%6.1fMB")
      }
    }
    spark.stop()
  }
}
