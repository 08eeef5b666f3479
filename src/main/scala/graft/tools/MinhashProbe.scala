package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.expressions.GraftFunctions
import graft.operators.Dedup

/** Diagnostic main for the MinHash+LSH pipeline — the cost-attribution
  * companion to `Bench`. Prints, per stage, the row counts that drive
  * LSH cost on the current corpus (reps after exact-dedup collapse,
  * band-bucket candidate pairs, pairs surviving the signature
  * prefilter, verified near-dup pairs) plus wall-clock per stage.
  *
  * Exists because a bench-time shift on unchanged code must be
  * attributable: candidate-pair volume is data-dependent (the driver
  * regenerates testdata per round), and this probe turns "minhash got
  * slower" into "the corpus now carries N× more candidate pairs" (or
  * proves it doesn't).
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    val nDocs = timed("corpus count")(docs.count())
    println(s"[probe] docs=$nDocs")

    // Stage 1: exact-dedup collapse to reps
    val members = docs.select(col("doc_id").as("id"), col("text").as("__text"))
    val reps = members.groupBy(col("__text")).agg(min(col("id")).as("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nReps = timed("reps (distinct texts)")(reps.count())
    println(s"[probe] reps=$nReps (exact-dup collapse ${nDocs - nReps})")

    // Stage 2: shingles + signatures (the base persist)
    val n = 3; val k = 36; val bands = 6; val rows = k / bands
    val base = reps
      .select(col("id"),
        expr(s"transform(sequence(1, greatest(length(__text)-${n - 1}, 1)), " +
          s"i -> substring(__text, i, $n))").as("grams_raw"))
      .select(col("id"), GraftFunctions.gramHashes(col("grams_raw")).as("ghash"))
      .withColumn("sig", Dedup.minhashSignature("ghash", k))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("signatures")(base.count())
    val gramStats = timed("gram-size stats")(
      base.agg(avg(size(col("ghash"))).as("avg"), max(size(col("ghash"))).as("max"))
        .head)
    println(s"[probe] ghash avg=${gramStats.getDouble(0)} max=${gramStats.get(1)}")

    // Stage 3: band buckets + occupancy
    val buckets = base
      .select(col("id"), explode(Dedup.lshBands("sig", bands, rows)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bucket").as("bucket"))
    val occ = buckets.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("occ"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("bucket occupancy")(occ.count())
    val occStats = occ.agg(max(col("occ")).as("max_occ"),
      sum(col("occ") * (col("occ") - 1) / 2).as("pair_budget")).head
    println(s"[probe] max bucket occupancy=${occStats.get(0)}  " +
      s"sum-of-C(occ,2) pair budget=${occStats.get(1)}")

    // Stage 4: candidate pairs (deduped across bands)
    val cand = buckets.select(col("band"), col("bucket"), col("id").as("a_id"))
      .join(buckets.select(col("band"), col("bucket"), col("id").as("b_id")),
        Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCand = timed("candidate pairs")(cand.count())
    println(s"[probe] candidates=$nCand")

    // Stage 5: signature prefilter survivors
    val tau = 0.8
    val est = cand
      .join(base.select(col("id").as("a_id"), col("sig").as("a_sig")), Seq("a_id"))
      .join(base.select(col("id").as("b_id"), col("sig").as("b_sig")), Seq("b_id"))
      .withColumn("est_j", GraftFunctions.signatureOverlap(col("a_sig"), col("b_sig"))
        .cast(org.apache.spark.sql.types.DoubleType) / k)
      .filter(col("est_j") >= tau - 0.2)
    val nEst = timed("prefilter survivors")(est.count())
    println(s"[probe] prefilter survivors=$nEst")

    // Stage 6: full pipeline end-to-end (the bench's measured unit)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val t0 = System.nanoTime()
    val nPairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text").count()
    println(f"[probe] full pipeline: $nPairs verified pairs in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
