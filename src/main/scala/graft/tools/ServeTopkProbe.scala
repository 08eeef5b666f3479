package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

import graft.functions.expressions.GraftFunctions
import graft.operators.IvfPq

/** Phase-level attribution for st_ivfpq_serve_topk at a given sf dir:
  * times the offline build, the index load, the streaming candidate
  * scan alone, and the full per-batch top-k, so a wall-clock
  * regression can be pinned to a phase instead of guessed at.
  * Usage: runMain graft.tools.ServeTopkProbe <sfDir>
  */
object ServeTopkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[serve-probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val corpus = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"),
        col("embedding").cast(ArrayType(DoubleType)).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = timed("corpus count")(corpus.count())
    val dir = IvfPq.indexDir(sfDir) + "_probe"
    timed("buildIndex")(IvfPq.buildIndex(corpus, n, dim = 64, m = 16,
      dsub = 4, kCodes = 64, dir = dir))
    val loaded = timed("loadIndex")(IvfPq.loadIndex(spark, dir))
    val codedInv = broadcast(loaded.live.withColumnRenamed("id", "neighbor_id"))
    val full = corpus.select(col("id").as("neighbor_id"), col("v").as("cv"))

    // batch-land replica of the streaming candidate pipeline
    def candSlimOf(src: DataFrame): DataFrame =
      IvfPq.probe(loaded.index,
          src.select(col("vec_id").as("query_id"),
            col("embedding").cast(ArrayType(DoubleType)).as("qv")),
          "qv", 2)
        .join(codedInv, Seq("cell"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"),
          GraftFunctions.adcCosineFromQuery(col("qv"), col("codes"),
            loaded.books, 4).as("adc_cos"),
          col("neighbor_id"),
          lit(null).cast(ArrayType(DoubleType)).as("qv"))
    val batchSrc = graft.Tables.embeddings(spark, sfDir)
    val nCand = timed("candidates (batch scan)")(candSlimOf(batchSrc).count())
    println(s"[serve-probe] candidate rows: $nCand")

    def finish(batch: DataFrame): DataFrame = {
      val qs = batch.filter(col("neighbor_id").isNull)
        .select(col("query_id"), col("qv"))
      val surv = batch.filter(col("neighbor_id").isNotNull).drop("qv")
        .withColumn("adc_rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("adc_cos").desc, col("neighbor_id"))))
        .filter(col("adc_rank") <= 30)
      full.join(broadcast(surv), Seq("neighbor_id"))
        .join(broadcast(qs), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"), col("adc_cos"),
          col("adc_rank"),
          GraftFunctions.cosineSimilarity(col("qv"), col("cv")).as("cos_sim"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cos_sim").desc, col("neighbor_id"))))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos_sim"), 4).as("cos_sim"),
          round(col("adc_cos"), 4).as("adc_cos"), col("adc_rank"))
    }
    val queryRowsB = batchSrc
      .select(col("vec_id").as("query_id"),
        lit(null).cast(DoubleType).as("adc_cos"),
        lit(null).cast(LongType).as("neighbor_id"),
        col("embedding").cast(ArrayType(DoubleType)).as("qv"))
    val feedB = candSlimOf(batchSrc).unionByName(queryRowsB)
    // sub-phase split of finish()
    val adcAgg = candSlimOf(batchSrc).agg(sum(col("adc_cos")))
    timed("  adc compute alone (agg)")(adcAgg.collect())
    println("[serve-probe] ---- adc agg final plan ----")
    adcAgg.queryExecution.executedPlan.toString.linesIterator
      .map(l => "[serve-probe-plan] " + l.take(130)).foreach(println)
    timed("  qs leg alone")(feedB.filter(col("neighbor_id").isNull)
      .select(col("query_id"), col("qv")).count())
    val survB = feedB.filter(col("neighbor_id").isNotNull).drop("qv")
      .withColumn("adc_rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("adc_cos").desc, col("neighbor_id"))))
      .filter(col("adc_rank") <= 30)
    timed("  surv window alone")(survB.count())
    timed("  surv window again")(survB.count())
    val nOut = timed("finish() on batch feed")(finish(feedB).count())
    println(s"[serve-probe] finish rows (batch-land): $nOut")

    // the real streaming run, end to end
    val arriving = graft.streaming.QanStream.embeddingsStream(spark, sfDir)
    val candSlimS = candSlimOf(arriving)
    val queryRowsS = arriving
      .select(col("vec_id").as("query_id"),
        lit(null).cast(DoubleType).as("adc_cos"),
        lit(null).cast(LongType).as("neighbor_id"),
        col("embedding").cast(ArrayType(DoubleType)).as("qv"))
    val outS = timed("streaming foreachBatch")(
      graft.streaming.QanStream.runForeachBatch(
        candSlimS.unionByName(queryRowsS), finish))
    println(s"[serve-probe] streamed rows: ${timed("result count")(outS.count())}")
    spark.stop()
  }
}
