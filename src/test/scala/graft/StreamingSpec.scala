package graft

import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  private def rowsOf(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq.sorted

  test("streaming snapshot delta == batch snapshot delta") {
    assert(rowsOf("st_delta_stream") == rowsOf("qan_snapshot_delta"))
  }

  test("streaming rollup == batch rollup") {
    assert(rowsOf("st_rollup_stream") == rowsOf("qan_rollup_minute"))
  }

  test("streaming governor EMAs == batch qan_ewma") {
    assert(rowsOf("st_governor_stream") == rowsOf("qan_ewma"))
  }

  test("streaming delta keeps per-key state across micro-batches") {
    import spark.implicits._
    import graft.streaming.QanStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[QanStream.CounterEvent]
    val out = QanStream.runToMemoryQuery(QanStream.deltaStream(ms.toDS()).toDF())
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    try {
      ms.addData(QanStream.CounterEvent(1, 1, "q", t(0), BigDecimal(10)))
      out.query.processAllAvailable()
      // second batch: growth then a reset
      ms.addData(
        QanStream.CounterEvent(2, 1, "q", t(60), BigDecimal(25)),
        QanStream.CounterEvent(3, 1, "q", t(120), BigDecimal(5)))
      out.query.processAllAvailable()
      val deltas = spark.table(out.name)
        .orderBy(col("event_id")).collect().map(_.getDouble(3)).toSeq
      // first ever: full value; growth: 25-10; reset: current value
      assert(deltas == Seq(10.0, 15.0, 5.0))
    } finally out.query.stop()
  }
}
