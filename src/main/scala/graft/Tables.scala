package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the driver-generated parquet tables.
  *
  * All readers are plain `spark.read.parquet` scans so Catalyst keeps
  * full freedom for column pruning and filter pushdown — at 100 TB the
  * scan is the dominant cost and must only read what the plan needs.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The generator writes timestamps as un-zoned parquet TIMESTAMP(MICROS);
    // Spark 4 would infer TIMESTAMP_NTZ for those, but the whole query
    // surface (unix_micros, window ranges, the DuckDB oracle at UTC)
    // is defined over session-zoned TIMESTAMP. Read them as LTZ.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark
    * has no native type for. Read it as raw nanos (legacy flag) and
    * truncate to microsecond timestamps — exactly what DuckDB does on
    * the oracle side, so values stay comparable.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    import org.apache.spark.sql.types.LongType
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
