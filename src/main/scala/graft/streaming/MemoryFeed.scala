package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Test/verify scaffolding: feed a bounded Dataset through a
  * MemoryStream so stateful streaming operators can be driven to
  * completion synchronously. Collects to the driver — never a
  * production path (production uses Kafka/file sources; see
  * QanStream.eventsStream).
  */
object MemoryFeed {
  def stream[T: Encoder](spark: SparkSession, ds: Dataset[T]): Dataset[T] = {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[T]
    val data = ds.collect().toSeq
    if (data.nonEmpty) ms.addData(data)
    ms.toDS()
  }
}
