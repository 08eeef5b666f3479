package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Stage-count probe for the three queries the round-7 bench flagged
  * with tight-band cost shifts on unchanged code — the
  * [[MinhashProbe]] pattern extended per the round-7 directive: turn
  * "query X got slower" into the data-dependent counts that drive its
  * cost (or prove they didn't move). The r8 post-mortem
  * (docs/COST_ATTRIBUTION_r08.md) attributed the shifts to external
  * load, but the counts logged here are what MAKES that call cheap:
  * if the driver's corpus ever legitimately carries more cost, one
  * run shows it.
  *
  * Stages probed (all via the production helpers — Text.splitDf,
  * Text.qualityScoredDf, the contamination gram expression,
  * Temporal's dedup window):
  *  - doc_contamination: docs per split, exploded gram volume per
  *    side, distinct test grams, join output rows;
  *  - doc_quality_quantile_filter: per-language doc counts (= the
  *    broadcast threshold frame), kept fraction;
  *  - qan_asof_enrich: left/right input sizes, deduped right size,
  *    per-key right-series length profile (avg/p99/max).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.CostProbe
  */
object CostProbe {
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
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // ------------------------------------------------ doc_contamination
    // the PRODUCTION gram stage (Text.contaminationGrams — shared with
    // doc_contamination and doc_bloom_prefilter), so the counts below
    // describe the executed plan, not a re-implementation
    val grams = graft.queries.Text.contaminationGrams(Tables.documents(spark, sfDir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bySplit = timed("contamination: gram explode")(
      grams.groupBy(col("split"))
        .agg(countDistinct(col("doc_id")).as("docs"), count(lit(1)).as("gram_rows"),
          countDistinct(col("gram")).as("distinct_grams"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap)
    bySplit.toSeq.sortBy(_._1).foreach { case (sp, (d, g, dg)) =>
      println(s"[probe] contamination: split=$sp docs=$d gram_rows=$g distinct=$dg")
    }
    val testGrams = grams.where(col("split") === "test").select(col("gram")).distinct()
    val joined = timed("contamination: train x testGrams join")(
      grams.where(col("split") === "train")
        .join(testGrams.withColumn("hit", lit(1)), Seq("gram"), "left")
        // coalesce: sum over an all-NULL hit column (clean corpus, zero
        // contamination) is NULL, and getLong on NULL throws — the probe
        // must print matched_rows=0, not crash, on a clean corpus
        .agg(count(lit(1)).as("train_rows"),
          coalesce(sum(col("hit")), lit(0L)).as("matched")).head)
    println(s"[probe] contamination: join_input_train=${joined.getLong(0)} matched_rows=${joined.getLong(1)}")
    grams.unpersist(blocking = true)

    // ---------------------------------------- doc_quality_quantile_filter
    val scored = graft.queries.Text.qualityScoredDf(Tables.documents(spark, sfDir))
      .withColumn("micro_q", round(col("quality") * 1e6, 0).cast("long"))
    val perLang = timed("quantile filter: per-language frame")(
      scored.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), expr("percentile(micro_q, 0.25)").as("q25"))
        .collect())
    perLang.sortBy(_.getString(0)).foreach { r =>
      println(s"[probe] quantile: lang=${r.getString(0)} docs=${r.getLong(1)} q25_micro=${r.get(2)}")
    }
    println(s"[probe] quantile: threshold_frame_rows=${perLang.length}")

    // --------------------------------------------------- qan_asof_enrich
    val ev = Tables.events(spark, sfDir)
    val orders = Tables.table(spark, sfDir, "orders")
    val nEv = timed("asof: left count")(ev.count())
    val deduped = orders
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_custkey"), col("o_orderdate")).orderBy(col("o_orderkey").desc)))
      .filter(col("rn") === 1).drop("rn")
    val nOrders = orders.count()
    val nDeduped = timed("asof: right dedup")(deduped.count())
    val series = timed("asof: per-key right-series profile")(
      deduped.groupBy(col("o_custkey")).agg(count(lit(1)).as("len"))
        .agg(count(lit(1)).as("keys"), avg(col("len")).as("avg"),
          expr("percentile(len, 0.99)").as("p99"), max(col("len")).as("max")).head)
    println(f"[probe] asof: events=$nEv orders=$nOrders deduped=$nDeduped " +
      f"keys=${series.getLong(0)} series_avg=${series.getDouble(1)}%.2f " +
      f"series_p99=${series.getDouble(2)}%.1f series_max=${series.getLong(3)}")

    spark.stop()
  }
}
