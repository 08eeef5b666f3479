package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.sources.TableIO

class SourcesSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("csv round-trip preserves rows and types") {
    val o = Tables.orders(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("csv_io").toString
    TableIO.writeCsv(o, dir)
    val back = TableIO.readCsv(spark, dir, o.schema)
    assert(back.schema == o.schema)
    assert(rows(back) == rows(o))
  }

  test("json round-trip preserves rows") {
    val n = Tables.nation(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("json_io").toString
    TableIO.writeJson(n, dir)
    assert(rows(TableIO.readJson(spark, dir, n.schema)) == rows(n))
  }

  test("partitioned parquet layout prunes partitions at the scan") {
    val o = Tables.orders(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("part_io").toString
    TableIO.writePartitioned(o, dir, "o_orderstatus")
    val back = TableIO.readParquet(spark, dir)
    val q = back.filter(col("o_orderstatus") === "O")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // partition filter must appear as a partition filter, not a data filter
    assert(plan.contains("PartitionFilters") && plan.contains("o_orderstatus"), plan)
    assert(q.count() == o.filter(col("o_orderstatus") === "O").count())
  }

  test("approx percentile within 2% of exact") {
    val approx = SparkEntry.queries("q18_approx_percentile")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = SparkEntry.queries("q16_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (p50, p90)) =>
      val (a50, a90) = approx(k)
      assert(math.abs(a50 - p50) / p50 <= 0.02, s"$k p50: $a50 vs $p50")
      assert(math.abs(a90 - p90) / p90 <= 0.02, s"$k p90: $a90 vs $p90")
    }
  }

  test("streaming rollup with watermark emits closed windows in append mode") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = ms.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val sink = graft.streaming.QanStream.runToMemoryQuery(agg, OutputMode.Append())
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    try {
      ms.addData((t(0), "a", 1.0), (t(0), "a", 2.0), (t(1), "b", 3.0))
      sink.query.processAllAvailable()
      // watermark still at 10:01-2min → nothing closed yet
      assert(spark.table(sink.name).count() == 0)
      // advance event time far enough to close the first windows
      ms.addData((t(10), "a", 5.0))
      sink.query.processAllAvailable()
      ms.addData((t(11), "a", 0.0)) // one more batch so the watermark advances past 10:01
      sink.query.processAllAvailable()
      val closed = spark.table(sink.name)
        .select(col("window.start").cast("string"), col("event_type"), col("n"), col("v"))
        .collect().map(_.toString).sorted.toSeq
      assert(closed.contains("[2024-01-01 10:00:00,a,2,3.0]"), closed.mkString("\n"))
      assert(closed.contains("[2024-01-01 10:01:00,b,1,3.0]"), closed.mkString("\n"))
    } finally sink.query.stop()
  }
}
