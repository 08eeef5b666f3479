package graft

import org.apache.spark.sql.functions._

import graft.functions.expressions.GraftFunctions

/** Corpus-curation operators: source reputation, TF-IDF key terms,
  * containment pairs.
  */
class CorpusSpec extends SparkSpec {

  test("containment: a doc fully inside another scores 1.0 where jaccard stays low") {
    import spark.implicits._
    val short = "the quick brown fox jumps over the lazy dog near the river bank"
    val long = short + " and then a very long unrelated tail about completely different " +
      "topics stretching the gram set far beyond the original sentence body"
    val df = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
      .select(col("doc_id"),
        GraftFunctions.gramHashes(
          expr("transform(sequence(1, greatest(length(text)-2, 1)), i -> substring(text, i, 3))")).as("grams"))
    val a = df.filter(col("doc_id") === 1).select(col("grams").as("ag"))
    val b = df.filter(col("doc_id") === 2).select(col("grams").as("bg"))
    val r = a.crossJoin(b)
      .select(
        (GraftFunctions.sortedIntersectCount(col("ag"), col("bg")).cast("double") /
          size(col("ag")).cast("double")).as("containment"),
        (GraftFunctions.sortedIntersectCount(col("ag"), col("bg")).cast("double") /
          (size(col("ag")) + size(col("bg")) -
            GraftFunctions.sortedIntersectCount(col("ag"), col("bg"))).cast("double")).as("jaccard"))
      .head()
    assert(r.getDouble(0) == 1.0, s"containment ${r.getDouble(0)}")
    assert(r.getDouble(1) < 0.7, s"jaccard ${r.getDouble(1)} unexpectedly high")
  }

  test("containment pairs: directed, thresholded, shared grams bounded by |A|") {
    val out = SparkEntry.queries("doc_containment_pairs")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nShared = r.getLong(2); val nA = r.getLong(3); val c = r.getDouble(4)
      assert(r.getLong(0) != r.getLong(1))
      assert(nShared <= nA, s"shared $nShared > |A| $nA")
      assert(c >= 0.9 && c <= 1.0, s"containment $c out of range")
      assert(math.abs(c - nShared.toDouble / nA) < 1e-12)
    }
  }

  test("tfidf: dense ranks per doc, integer score consistent with tf/df/N") {
    val out = SparkEntry.queries("doc_tfidf_topk")(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    val byDoc = out.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length).toSeq,
        s"ranks not dense for doc $doc")
      rows.foreach { r =>
        val tf = r.getLong(3); val df = r.getLong(4); val score = r.getLong(5)
        assert(df >= 1 && df <= n)
        assert(score == tf * (1000000L * n / df), s"score mismatch for doc $doc")
      }
    }
  }

  test("source reputation: formula holds, all docs of a source agree") {
    val out = SparkEntry.queries("doc_source_reputation")(spark, sf).collect()
    assert(out.length == Tables.documents(spark, sf).count())
    val bySource = out.groupBy(_.getString(1))
    bySource.foreach { case (src, rows) =>
      assert(rows.map(_.getLong(2)).distinct.length == 1, s"n_docs disagree for $src")
      assert(rows.head.getLong(2) == rows.length, s"n_docs wrong for $src")
      val r = rows.head
      val (q, dup, en, rep) = (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      // rep is the 6dp-rounded combination of the (already 6dp-rounded)
      // components — compare against the unrounded formula within a
      // half-ulp of the rounding grid to stay engine-robust
      assert(math.abs(rep - (q * 0.5 + (1.0 - dup) * 0.3 + en * 0.2)) < 1e-6,
        s"reputation formula broken for $src")
      assert(rows.forall(_.getBoolean(7) == (rep >= 0.5)))
    }
  }
}
