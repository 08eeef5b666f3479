package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.apache.spark.sql.expressions.Window

import graft.operators.{AnnPq, IvfPq}
import graft.functions.expressions.GraftFunctions

/** Metadata-filtered ANN (IvfPq.filteredTopK): regime dispatch,
  * exactness of the brute arm, predicate soundness of the probe arm,
  * the probe-boost compensation claim, and the at-scale pushdown
  * story for the attribute-carrying coded file.
  */
class FilteredAnnSpec extends SparkSpec {

  private def labeled(dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"),
        col("embedding").cast(ArrayType(DoubleType)).as("v"), col("label"))

  test("filterRegimeFor dispatches on selectivity at the documented crossover") {
    assert(IvfPq.filterRegimeFor(1000, 50, 0.05) == IvfPq.BruteForceSubset)
    assert(IvfPq.filterRegimeFor(1000, 51, 0.05) == IvfPq.PreFilteredProbe)
    assert(IvfPq.filterRegimeFor(0, 0, 0.05) == IvfPq.BruteForceSubset)
    // fraction, not count: 10x the data, same selectivity, same regime
    assert(IvfPq.filterRegimeFor(10000, 510, 0.05) == IvfPq.PreFilteredProbe)
  }

  test("brute arm is EXACT: equals the filtered ground truth, ADC columns null") {
    val corpus = labeled(sf).persist()
    val n = corpus.count()
    val queries = corpus.filter(col("id") < 5)
      .select(col("id").as("query_id"), col("v").as("qv"))
    val pred = col("label") === 7 && col("id") % 7 === 3
    val got = IvfPq.filteredTopK(corpus, n, dim = 64, attrs = Seq("label"),
        pred = pred, queries = queries, k = 10, nprobe = 2, rerank = 30,
        m = 16, dsub = 4, kCodes = 64)
      .orderBy(col("query_id"), col("rank")).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getString(6) == "brute_force_subset"))
    assert(got.forall(r => r.isNullAt(4) && r.isNullAt(5)))
    val exact = corpus.filter(pred)
      .select(col("id").as("neighbor_id"), col("v").as("cv"))
      .crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        GraftFunctions.cosineSimilarity(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 4).as("cos_sim"))
      .orderBy(col("query_id"), col("rank")).collect()
    assert(got.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq ==
      exact.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq)
    corpus.unpersist()
  }

  test("probe arm: every result satisfies the predicate; regime pinned") {
    val corpus = labeled(sf).persist()
    val n = corpus.count()
    val queries = corpus.filter(col("id") < 5)
      .select(col("id").as("query_id"), col("v").as("qv"))
    val got = IvfPq.filteredTopK(corpus, n, dim = 64, attrs = Seq("label"),
      pred = col("label").isin(2, 5), queries = queries, k = 10, nprobe = 2,
      rerank = 30, m = 16, dsub = 4, kCodes = 64)
    val rows = got.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(6) == "pre_filtered_probe"))
    val offenders = got.join(corpus.select(col("id").as("neighbor_id"),
        col("label")), Seq("neighbor_id"))
      .filter(!col("label").isin(2, 5)).count()
    assert(offenders == 0, s"$offenders results violate the filter")
    corpus.unpersist()
  }

  test("probe boost compensates the filter: boosted recall >= unboosted") {
    val corpus = labeled(sf).persist()
    val n = corpus.count()
    val queries = corpus.filter(col("id") < 5)
      .select(col("id").as("query_id"), col("v").as("qv"))
    val pred = col("label").isin(2, 5)
    val vecsOnly = corpus.select(col("id"), col("v"))
    val index = IvfPq.indexAuto(vecsOnly, n, dim = 64)
    val books = AnnPq.collectCodebooks(
      AnnPq.refinedCodebooks(vecsOnly, 16, 4, 64), 16)
    val filteredN = corpus.filter(pred).count()
    def hits(boost: Int): Long = {
      val ann = IvfPq.filteredTopKWith(index, books, 4, corpus, Seq("label"),
          pred, queries, k = 10, nprobe = 2, rerank = 30,
          n = n, filteredN = filteredN, probeBoost = boost)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      val exact = corpus.filter(pred)
        .select(col("id").as("neighbor_id"), col("v").as("cv"))
        .crossJoin(broadcast(queries))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(GraftFunctions.cosineSimilarity(col("qv"), col("cv")).desc,
            col("neighbor_id"))))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("neighbor_id"))
      exact.join(ann, Seq("query_id", "neighbor_id"), "left_semi").count()
    }
    val (unboosted, boosted) = (hits(1), hits(2))
    assert(boosted >= unboosted,
      s"boost=2 found $boosted of the exact set vs $unboosted at boost=1")
    assert(boosted > 0)
    corpus.unpersist()
  }

  test("attribute-carrying coded file: the predicate pushes down to the stored scan") {
    val corpus = labeled(sf)
    val n = corpus.count()
    val vecsOnly = corpus.select(col("id"), col("v"))
    val index = IvfPq.indexAuto(vecsOnly, n, dim = 64)
    val books = AnnPq.collectCodebooks(
      AnnPq.refinedCodebooks(vecsOnly, 16, 4, 64), 16)
    val dir = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_filt_" +
      java.util.UUID.randomUUID.toString.take(8)
    // the wider schema a filtered-serving deployment stores
    IvfPq.codedInvertedFileAttrs(index, corpus, books, 4, Seq("label"))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    val scan = spark.read.parquet(dir).filter(col("label").isin(2, 5))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(label"),
      s"label filter must reach the parquet scan:\n$plan")
    assert(scan.count() > 0)
  }
}
