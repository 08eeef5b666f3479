package graft

import org.apache.spark.sql.functions._

/** Quantified guarantees for the two rows-only sketch operators (their
  * internal randomness cannot be replayed in DuckDB, so the driver
  * gate only row-counts them; these specs carry the actual error
  * bounds, measured at two scale factors so the bound is not a
  * single-corpus fluke).
  */
class SketchSpec extends SparkSpec {

  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("q13 HLL: relative error within 3×rsd of exact, at two scale factors") {
    // q13 configures rsd = 0.01; HLL++'s standard error is rsd, so
    // 3×rsd is the ~99.7% envelope. Measured per group, per SF.
    sfs.foreach { dir =>
      val approx = SparkEntry.queries("q13_approx_distinct")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = Tables.events(spark, dir)
        .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (k, n) =>
        val a = approx(k)
        val err = math.abs(a - n).toDouble / n
        assert(err <= 0.03, s"$dir $k: approx $a vs exact $n (err $err > 3×rsd)")
      }
    }
  }

  test("q18 quantile sketch: rank error within 1/accuracy of the target, at two scale factors") {
    // approx_percentile(…, accuracy=10000) guarantees the returned
    // value's rank is within n/accuracy of the target rank. Verify the
    // actual rank of every returned value: the [count(<v), count(≤v)]
    // interval must overlap [q−ε, q+ε] (±1 row for boundary ties).
    val eps = 1.0 / 10000
    sfs.foreach { dir =>
      val rows = SparkEntry.queries("q18_approx_percentile")(spark, dir).collect()
      assert(rows.nonEmpty)
      val li = Tables.lineitem(spark, dir)
        .select(col("l_returnflag"), col("l_extendedprice")).cache()
      try rows.foreach { r =>
        val (flag, n) = (r.getString(0), r.getLong(4))
        Seq(0.5 -> r.getDouble(1), 0.9 -> r.getDouble(2), 0.99 -> r.getDouble(3))
          .foreach { case (q, v) =>
            val below = li.filter(col("l_returnflag") === flag &&
              col("l_extendedprice") < v).count()
            val atOrBelow = li.filter(col("l_returnflag") === flag &&
              col("l_extendedprice") <= v).count()
            val lo = below.toDouble / n
            val hi = atOrBelow.toDouble / n
            assert(lo <= q + eps + 1.0 / n && hi >= q - eps - 1.0 / n,
              s"$dir $flag p$q: value $v has rank interval [$lo, $hi], " +
                s"target $q ± $eps (n=$n)")
          }
      } finally li.unpersist(blocking = true)
    }
  }

  // ------------------------------------------------------- Misra–Gries
  // doc_heavy_hitters itself is oracle-exact (the sketch is only a
  // prefilter); these specs pin the sketch property that exactness
  // RELIES on — no heavy hitter is ever evicted — on a corpus whose
  // vocabulary (50k keys) vastly exceeds the counter budget, which the
  // synthetic documents table (31-word vocabulary) never exercises.

  private def mgCandidates(df: org.apache.spark.sql.DataFrame, k: Int)
      : (Long, Set[String]) = {
    val r = df.agg(graft.functions.expressions.GraftFunctions
        .misraGries(col("token"), k).as("sk"))
      .select(col("sk.n"), col("sk.candidates")).head()
    (r.getLong(0), r.getSeq[String](1).toSet)
  }

  test("misra_gries: candidate set is a superset of true heavy hitters at high cardinality") {
    import spark.implicits._
    val k = 100
    // 3 hot keys at ~2% each inside 50k distinct uniform cold keys,
    // spread over 8 partitions so partial buffers churn and merge
    val rows = (0 until 200000).map { i =>
      if (i % 50 < 3) s"hot_${i % 50}" else s"cold_${i % 49999}_${i % 7}"
    }
    val df = spark.createDataset(rows).toDF("token").repartition(8)
    val (n, cands) = mgCandidates(df, k)
    assert(n == 200000L)
    assert(cands.size <= k, s"bound violated: ${cands.size} > $k")
    val exactHot = df.groupBy(col("token")).count()
      .filter(col("count") * k > lit(n)).collect().map(_.getString(0)).toSet
    assert(exactHot.nonEmpty && exactHot.subsetOf(cands),
      s"missed heavy hitters: ${exactHot.diff(cands)}")
  }

  test("misra_gries: nulls are ignored and a uniform stream still respects the k bound") {
    import spark.implicits._
    val rows: Seq[Option[String]] =
      (0 until 20000).map(i => if (i % 5 == 0) None else Some(s"u_${i % 6000}"))
    val df = spark.createDataset(rows).toDF("token").repartition(5)
    val (n, cands) = mgCandidates(df, 20)
    assert(n == 16000L, s"nulls must not count: n=$n")
    assert(cands.size <= 20)
  }

  test("doc_heavy_hitters: equals the exact full-vocabulary aggregate") {
    // end-to-end equality at the gate scale: sketch-prefiltered +
    // recounted answer == naive exact heavy hitters
    val got = SparkEntry.queries("doc_heavy_hitters")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val tok = Tables.documents(spark, sf)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
    val n = tok.count()
    val want = tok.groupBy(col("token")).count()
      .filter(col("count") * 200 > lit(n))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }.toSeq
    assert(got == want)
  }
}
