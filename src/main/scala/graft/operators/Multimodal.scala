package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed output of the (stubbed) media decode stage. */
case class MediaFeatures(
    doc_id: Long,
    byte_len: Int,
    fake_width: Int,
    fake_height: Int,
    features: Array[Double])

/** Multimodal column plumbing: opaque `binary` payloads flow through
  * Spark untyped; decode / feature-extraction runs batched per
  * partition (the same shape a vectorized/Arrow UDF stage has: one
  * JVM-side loop per partition, amortized setup, bounded memory).
  *
  * STUB: this container has no image/audio codecs, so `decode` below
  * is a deterministic fake (byte-histogram moments + dimensions
  * derived from the payload length). The Spark-side plumbing —
  * binary column in, typed feature rows out, per-partition batching,
  * schema — is the real, tested part; swap `decode` for a JNI/codec
  * call in production.
  */
object Multimodal {

  /** Deterministic fake decode of a binary payload. */
  private[graft] def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val n = bytes.length
    // fake "image dimensions" parsed from the payload
    val w = (n % 640) + 1
    val h = (n / math.max(w, 1)) + 1
    // 8 bucketed byte-histogram means as the "feature vector"
    val sums = new Array[Double](8)
    val counts = new Array[Long](8)
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      sums(b % 8) += b
      counts(b % 8) += 1
      i += 1
    }
    val feats = Array.tabulate(8)(j => if (counts(j) == 0) 0.0 else sums(j) / counts(j))
    MediaFeatures(id, n, w, h, feats)
  }

  /** Batched feature extraction over (id, payload) pairs. */
  def extractFeatures(spark: SparkSession, df: DataFrame,
      idCol: String, binCol: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => decode(id, bytes) } }
  }
}
