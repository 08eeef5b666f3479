package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OTel-log-shaped export/import of QAN deltas.
  *
  * Mirrors the reference's log emission
  * (/root/reference/otel-collector/extension/qanprocessor/mysql/collector.go:208
  * deltaToLogs): one log record per digest delta, resource attributes
  * for service/system/instance, numeric delta attributes, digest text
  * as the body, and records with a non-positive calls delta skipped.
  *
  * The wire format is JSON-lines (one log record per line), written
  * and read with Spark's native JSON source — partition-parallel on
  * both sides, no driver involvement.
  */
object OtelLogs {

  /** Flatten a delta DataFrame into OTel-log-record rows. */
  def toLogRecords(deltas: DataFrame,
      instanceCol: String = "user_id",
      digestCol: String = "event_type",
      deltaCol: String = "delta_value",
      tsCol: String = "ts"): DataFrame =
    deltas
      .filter(col(deltaCol) > 0)
      .select(
        col(tsCol).as("timestamp"),
        lit("INFO").as("severity_text"),
        lit("graft").as("service_name"),
        when(col(instanceCol) % 2 === 0, "mysql").otherwise("postgresql").as("db_system"),
        concat(lit("instance-"), col(instanceCol)).as("resource_instance_id"),
        col(digestCol).as("db_statement_digest"),
        col(digestCol).as("body"),
        col(deltaCol).as("delta_value"))

  /** Microsecond-exact timestamp format for the JSON wire: the default
    * JSON timestampFormat keeps milliseconds only, which would corrupt
    * the collector's event times on the way through the file.
    */
  private val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def writeJson(records: DataFrame, path: String): Unit =
    records.write.mode("overwrite")
      .option("timestampFormat", TsFormat).json(path)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("timestampFormat", TsFormat).json(path)

  /** Schema-stable import: the consumer pins the record schema (the
    * OTel log-record shape is a contract, not something to re-infer
    * per file at 100 TB — inference is an extra full pass over the
    * data).
    */
  def readJson(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("timestampFormat", TsFormat).json(path)
}
