package graft

import org.apache.spark.sql.functions._

/** The statistical quality/anomaly operators: unigram LM scoring and
  * MAD-based outlier detection.
  */
class QualitySpec extends SparkSpec {

  test("unigram logprob: every doc scored, probabilities are probabilities") {
    val out = SparkEntry.queries("doc_unigram_logprob")(spark, sf).collect()
    assert(out.length == Tables.documents(spark, sf).count())
    out.foreach { r =>
      val n = r.getLong(1); val lp = r.getDouble(2); val ppl = r.getDouble(3)
      assert(n >= 1)
      // log of a frequency < 1 is strictly negative; ppl = e^{-lp} > 1
      assert(lp < 0.0, s"doc ${r.getLong(0)} avg_logprob $lp")
      assert(ppl > 1.0, s"doc ${r.getLong(0)} ppl $ppl")
    }
    // token accounting matches the whitespace tokenizer used elsewhere
    val nTok = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ws = SparkEntry.queries("doc_token_count")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(nTok == ws)
  }

  test("bloom prefilter returns exactly doc_contamination's rows (no false negatives)") {
    val exact = SparkEntry.queries("doc_contamination")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val bloomed = SparkEntry.queries("doc_bloom_prefilter")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(bloomed == exact)
  }

  test("bloom_agg / bloom_contains are callable from SQL") {
    graft.plans.GraftExtensions.install(spark)
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("x").createOrReplaceTempView("bloom_probe_t")
    val hits = spark.sql("""
      SELECT x, bloom_contains(
        (SELECT bloom_agg(x) FROM bloom_probe_t WHERE x < 3), x) AS hit
      FROM bloom_probe_t ORDER BY x""")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(hits(1L) && hits(2L)) // members always hit
  }

  test("mad anomalies: every flagged event is >3 scaled MADs from its group median") {
    val out = SparkEntry.queries("qan_anomaly_mad")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(math.abs(r.getDouble(6)) > 3.0, s"event ${r.getLong(0)} score ${r.getDouble(6)}")
      assert(r.getDouble(5) > 0.0) // mad strictly positive by the gate
    }
    // robustness sanity: anomalies are a minority of events (~7-8% on
    // this heavy-tailed synthetic value distribution — a normal corpus
    // would flag ~0.3%)
    val total = Tables.events(spark, sf).count()
    assert(out.length.toDouble / total < 0.15,
      s"${out.length} of $total events flagged — threshold not selective")
  }
}
