package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the OTel-log JSON-lines wire format
  * ([[graft.sources.OtelLogs]] — the reference's deltaToLogs emission,
  * otel-collector/extension/qanprocessor/mysql/collector.go:208).
  *
  * Why a V2 source and not `spark.read.json`: the wire schema is a
  * CONTRACT (the collector promises these eight fields), so a consumer
  * should neither pay schema inference (an extra full pass at 100 TB)
  * nor read bytes it will not use. This source serves the pinned
  * schema from metadata and implements column pruning at the reader —
  * a rollup touching (digest, delta) parses two fields per record and
  * never materializes the rest. Files map 1:1 to input partitions.
  *
  * All file access goes through the Hadoop FileSystem API, so the
  * wire directory may live on any shared filesystem (file:// here,
  * HDFS/S3A on a cluster — the path's scheme picks the FS). Writes
  * are crash-safe: tasks write a hidden temp file and COMMIT renames
  * it to its final per-partition name, so a died task leaves only an
  * ignored temp and speculative attempts collapse to one file.
  *
  * Registered as `graft-otel` (META-INF services), usable as
  * `spark.read.format("graft-otel").load(dir)` /
  * `.write.format("graft-otel").save(dir)`.
  */
class OtelLogTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-otel"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OtelLogTable.WireSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OtelLogTable(properties.get("path"))
}

object OtelLogTable {
  /** The active session's Hadoop configuration as a serializable map,
    * captured on the DRIVER when the scan/write is planned — executors
    * then build the SAME FileSystem (S3A credentials, fs.defaultFS,
    * hdfs tuning set via spark.hadoop.*) instead of a bare classpath
    * Configuration.
    */
  def hadoopConfMap(): Map[String, String] =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(org.apache.spark.sql.graft.Bridge.hadoopConfMap)
      .getOrElse(Map.empty)

  /** Hadoop FS for a wire path (the path's scheme picks the FS). */
  def fs(path: String, conf: Map[String, String]): org.apache.hadoop.fs.FileSystem = {
    val c = new org.apache.hadoop.conf.Configuration()
    conf.foreach { case (k, v) => c.set(k, v) }
    new org.apache.hadoop.fs.Path(path).getFileSystem(c)
  }

  /** Committed wire part files under a dir (temp files excluded). */
  def partFiles(path: String, conf: Map[String, String]): Array[org.apache.hadoop.fs.Path] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val f = fs(path, conf)
    if (!f.exists(dir)) Array.empty
    else f.listStatus(dir)
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .map(_.getPath)
      .sortBy(_.getName)
  }

  /** The collector's log-record contract (OtelLogs.toLogRecords). */
  val WireSchema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("severity_text", StringType),
    StructField("service_name", StringType),
    StructField("db_system", StringType),
    StructField("resource_instance_id", StringType),
    StructField("db_statement_digest", StringType),
    StructField("body", StringType),
    StructField("delta_value", DoubleType)))
}

class OtelLogTable(path: String) extends Table with SupportsRead with SupportsWrite {
  require(path != null, "graft-otel: .load(path)/.save(path) is required")
  override def name(): String = s"graft-otel:$path"
  override def schema(): StructType = OtelLogTable.WireSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OtelLogScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new OtelLogWriteBuilder(path, info.schema())
}

class OtelLogScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = OtelLogTable.WireSchema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark hands the pruned subset in table-schema order; empty means
    // a count-style scan — keep zero fields, emit empty rows
    required = requiredSchema

  /** String equality and IsNotNull are evaluated during the parse —
    * a record failing them never materializes a row, so a
    * one-db_system rollup deserializes only that system's records.
    * Everything else stays a residual for Spark to evaluate above.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def stringField(a: String) = OtelLogTable.WireSchema.fields
      .exists(f => f.name == a && f.dataType == StringType)
    val (accepted, residual) = filters.partition {
      case EqualTo(a, _: String) => stringField(a)
      case IsNotNull(a) => stringField(a)
      case _ => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan =
    new OtelLogScan(path, required, pushed, OtelLogTable.hadoopConfMap())
}

class OtelLogScan(path: String, required: StructType, pushed: Array[Filter],
    conf: Map[String, String]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-otel $path, ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: ${pushed.mkString("[", ", ", "]")}"
  override def planInputPartitions(): Array[InputPartition] =
    OtelLogTable.partFiles(path, conf)
      .map(p => OtelLogPartition(p.toString): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new OtelLogReaderFactory(required, pushed, conf)
}

case class OtelLogPartition(file: String) extends InputPartition

class OtelLogReaderFactory(required: StructType, pushed: Array[Filter],
    conf: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new OtelLogPartitionReader(
      partition.asInstanceOf[OtelLogPartition].file, required, pushed, conf)
}

/** Write side: the same contract, symmetric with the reader. Rows
  * must arrive in the wire schema (the collector's emission shape —
  * a different schema is a caller bug, failed loudly at plan time).
  * Commit protocol: each task streams to a hidden temp and COMMIT
  * renames it to `part-<runId>-<partitionId>.json` — run-unique, so
  * a non-truncate write APPENDS alongside earlier jobs' files
  * instead of clobbering them. Rename is atomic on local/HDFS
  * filesystems; object stores without atomic rename (raw S3) need a
  * proper committer and are out of scope here. Truncate
  * (SaveMode.Overwrite) clears previous part files driver-side
  * before tasks launch.
  */
class OtelLogWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = {
    require(schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      OtelLogTable.WireSchema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"graft-otel: write schema must be the wire contract " +
        s"${OtelLogTable.WireSchema.simpleString}, got ${schema.simpleString}")
    new Write {
      override def toBatch: BatchWrite = new OtelLogBatchWrite(path, doTruncate,
        java.util.UUID.randomUUID.toString.take(8), OtelLogTable.hadoopConfMap())
    }
  }
}

class OtelLogBatchWrite(path: String, truncate: Boolean, runId: String,
    conf: Map[String, String]) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val fs = OtelLogTable.fs(path, conf)
    fs.mkdirs(new org.apache.hadoop.fs.Path(path)): Unit
    if (truncate)
      OtelLogTable.partFiles(path, conf).foreach(p => fs.delete(p, false): Unit)
    new OtelLogWriterFactory(path, runId, conf)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // job abort: drop files committed by finished tasks AND this run's
    // orphaned temps (a crashed executor's task abort never ran)
    val fs = OtelLogTable.fs(path, conf)
    messages.collect { case OtelLogCommit(f, _) =>
      fs.delete(new org.apache.hadoop.fs.Path(f), false): Unit
    }
    val dir = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(dir))
      fs.listStatus(dir)
        .filter(_.getPath.getName.startsWith(s".part-$runId-"))
        .foreach(st => fs.delete(st.getPath, false): Unit)
  }
}

class OtelLogWriterFactory(path: String, runId: String,
    conf: Map[String, String]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new OtelLogDataWriter(path, runId, partitionId, taskId, conf)
}

case class OtelLogCommit(file: String, rows: Long) extends WriterCommitMessage

/** Crash-safe task writer: rows stream to a hidden temp file; task
  * COMMIT renames it to the final `part-<runId>-<partitionId>` name
  * (atomic on rename-atomic filesystems). A task that dies leaves
  * only the ignored temp (swept by job abort); speculative attempts
  * of one run produce the same deterministic content and collapse to
  * one committed file per partition via last-rename-wins.
  */
class OtelLogDataWriter(dir: String, runId: String, partitionId: Int,
    taskId: Long, conf: Map[String, String]) extends DataWriter[InternalRow] {
  import org.apache.hadoop.fs.Path
  private val fs = OtelLogTable.fs(dir, conf)
  private val tmp = new Path(dir, f".part-$runId-$partitionId%05d-$taskId.json.inprogress")
  private val dest = new Path(dir, f"part-$runId-$partitionId%05d.json")
  private val TsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    .withZone(java.time.ZoneOffset.UTC)
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    fs.create(tmp, true), "UTF-8"))
  private var rows = 0L

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  override def write(row: InternalRow): Unit = {
    val fields = OtelLogTable.WireSchema.fields.zipWithIndex.flatMap {
      case (f, i) if row.isNullAt(i) => None
      case (f, i) =>
        val v = f.dataType match {
          case TimestampType =>
            jstr(TsFmt.format(java.time.Instant.ofEpochSecond(
              Math.floorDiv(row.getLong(i), 1000000L),
              Math.floorMod(row.getLong(i), 1000000L) * 1000L)))
          case StringType => jstr(row.getUTF8String(i).toString)
          case DoubleType => row.getDouble(i).toString
          case other => throw new IllegalArgumentException(
            s"graft-otel: unsupported field type $other")
        }
        Some(s"${jstr(f.name)}:$v")
    }
    out.write(fields.mkString("{", ",", "}"))
    out.write("\n")
    rows += 1
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    // last-rename-wins across speculative attempts: both attempts
    // carry identical deterministic content, so either file is correct
    if (fs.exists(dest)) fs.delete(dest, false): Unit
    require(fs.rename(tmp, dest), s"graft-otel: commit rename failed for $dest")
    OtelLogCommit(dest.toString, rows)
  }
  override def abort(): Unit = { out.close(); fs.delete(tmp, false): Unit }
  override def close(): Unit = ()
}

/** One JSON-lines file → InternalRows of the pruned schema. Parsing
  * uses json4s (already on Spark's classpath — Spark core depends on
  * it); only the REQUIRED fields are converted, the rest of the
  * record is skipped after the parse.
  */
class OtelLogPartitionReader(file: String, required: StructType,
    pushed: Array[Filter], conf: Map[String, String])
    extends PartitionReader[InternalRow] {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private val TsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
  private val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
    OtelLogTable.fs(file, conf).open(new org.apache.hadoop.fs.Path(file)), "UTF-8"))
  private val lines = Iterator.continually(reader.readLine())
    .takeWhile(_ != null).filter(_.nonEmpty)
  private var row: InternalRow = _

  private def passes(obj: JValue): Boolean = pushed.forall {
    case EqualTo(a, v: String) => obj \ a match {
      case JString(s) => s == v
      case _ => false
    }
    case IsNotNull(a) => obj \ a match {
      case JNothing | JNull => false
      case _ => true
    }
    case _ => true // pushFilters only accepts the two shapes above
  }

  private def field(obj: JValue, f: StructField): Any = obj \ f.name match {
    case JNothing | JNull => null
    case v => f.dataType match {
      case TimestampType =>
        val s = v.asInstanceOf[JString].s
        val odt = java.time.OffsetDateTime.parse(s, TsFmt)
        odt.toInstant.getEpochSecond * 1000000L + odt.getNano / 1000L
      case StringType => UTF8String.fromString(v.asInstanceOf[JString].s)
      case DoubleType => v match {
        case JDouble(d) => d
        case JInt(i) => i.toDouble
        case JDecimal(d) => d.toDouble
        case other => throw new IllegalArgumentException(
          s"graft-otel: ${f.name} is not numeric: $other")
      }
      case other => throw new IllegalArgumentException(
        s"graft-otel: unsupported field type $other")
    }
  }

  @scala.annotation.tailrec
  final override def next(): Boolean =
    if (!lines.hasNext) false
    else {
      val obj = JsonMethods.parse(lines.next())
      if (passes(obj)) {
        row = new GenericInternalRow(
          required.fields.map(f => field(obj, f)).asInstanceOf[Array[Any]])
        true
      } else next()
    }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}
