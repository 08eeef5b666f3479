package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Diagnostic main for the MinHash+LSH pipeline — the cost-attribution
  * companion to `Bench`. Prints, per stage, the row counts that drive
  * LSH cost on the current corpus (reps after exact-dedup collapse,
  * bucket-occupancy profile, band candidates before and after the
  * in-join signature prefilter, verified near-dup pairs) plus
  * wall-clock per stage.
  *
  * Exists because a bench-time shift on unchanged code must be
  * attributable: candidate-pair volume is data-dependent (the driver
  * regenerates testdata per round), and this probe turns "minhash got
  * slower" into "the corpus now carries N× more candidate pairs" (or
  * proves it doesn't). It drives the SAME internals production runs —
  * `Dedup.minhashCandidates` with `Dedup.Default*` constants — so the
  * attributed plan is the executed plan, not a re-implementation.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.MinhashProbe
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def clear(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }

    import Dedup.{DefaultBands, DefaultBucketCap, DefaultK, DefaultNgram, DefaultTau}
    val docs = Tables.documents(spark, sfDir)
    val nDocs = timed("corpus count")(docs.count())

    // Stage 1: exact-dedup collapse to reps (the production pre-pass)
    val reps = docs.select(col("doc_id").as("id"), col("text").as("__text"))
      .groupBy(col("__text")).agg(min(col("id")).as("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nReps = timed("reps (distinct texts)")(reps.count())
    println(s"[probe] docs=$nDocs reps=$nReps (exact-dup collapse ${nDocs - nReps})")

    // Stage 2: the production candidate stage WITHOUT the prefilter —
    // the raw banding volume (what the S-curve admits on this corpus)
    val rawStage = Dedup.minhashCandidates(reps, "__text",
      DefaultNgram, DefaultK, DefaultBands, DefaultBucketCap)
    timed("signatures (base persist)")(rawStage.base.count())
    val gramStats = rawStage.base
      .agg(avg(size(col("ghash"))).as("avg"), max(size(col("ghash"))).as("max")).head
    println(s"[probe] ghash avg=${gramStats.getDouble(0)} max=${gramStats.get(1)}")
    val nRaw = timed("band candidates (no prefilter)")(rawStage.candidates.count())

    // Stage 3: the production candidate stage WITH the in-join
    // signature prefilter — what actually reaches the gram verify
    val estStage = Dedup.minhashCandidates(reps, "__text",
      DefaultNgram, DefaultK, DefaultBands, DefaultBucketCap,
      minEst = DefaultTau - 0.2)
    val nEst = timed("candidates after est prefilter")(estStage.candidates.count())
    println(s"[probe] raw candidates=$nRaw  prefilter survivors=$nEst  " +
      f"kill ratio=${if (nRaw > 0) 1.0 - nEst.toDouble / nRaw else 0.0}%.3f")

    // Stage 4: full production pipeline end-to-end, cold (the bench's
    // measured unit). The occupancy-cap observe metrics print through
    // the session listener if any bucket was dropped.
    clear()
    val t0 = System.nanoTime()
    val nPairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text").count()
    println(f"[probe] full pipeline: $nPairs verified pairs in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
