package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.functions.expressions._

/** Session extension entry points.
  *
  * Cluster deployment: set
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) and every session
  * gets the custom planner strategy plus the SQL-callable functions.
  * For an already-running session (e.g. the driver-owned one in
  * Verify/Bench), `GraftExtensions.install(spark)` registers the same
  * pieces at runtime.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)
    GraftExtensions.functionBuilders.foreach { case (name, builder) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            "graft.functions.expressions", name),
          builder))
    }
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

  // scalar config args (k, window, mask) must be SQL literals — they
  // parameterize the generated code, not the per-row evaluation
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val functionBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> (es => SimHash64(es.head)),
    "poly_fingerprint" -> (es => PolyFingerprint(es.head)),
    "hamming64" -> (es => HammingDistance64(es(0), es(1))),
    "cosine_similarity" -> (es => CosineSimilarity(es(0), es(1))),
    "gram_hashes" -> (es => GramHashes(es.head)),
    "sorted_intersect_count" -> (es => SortedIntersectCount(es(0), es(1))),
    "minhash_signature" -> (es => MinHashSignature(es(0), intLit(es(1), "k"))),
    "signature_overlap" -> (es => SignatureOverlap(es(0), es(1))),
    "chunk_fingerprints" -> (es =>
      if (es.length == 1) ChunkFingerprints(es.head, 8, 31L)
      else ChunkFingerprints(es(0), intLit(es(1), "window"), longLit(es(2), "mask"))))

  /** Runtime registration on an existing session (idempotent). */
  def install(spark: SparkSession): Unit = {
    TopK.install(spark)
    functionBuilders.foreach { case (name, builder) =>
      org.apache.spark.sql.graft.Bridge.registerFunction(spark, name, builder)
    }
  }
}
