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
}
