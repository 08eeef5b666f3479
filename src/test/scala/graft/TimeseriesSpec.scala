package graft

import org.apache.spark.sql.functions._

/** Time-series surface: gap-filled LOCF series, topN with an
  * "(others)" remainder, period-over-period change alerts.
  */
class TimeseriesSpec extends SparkSpec {

  test("qan_gapfill: spines are contiguous per key, LOCF fills every gap after the first value") {
    val out = SparkEntry.queries("qan_gapfill")(spark, sf).cache()
    try {
      // every key's bucket sequence is day-contiguous (that IS the spine)
      val holes = out
        .withColumn("prev", lag(col("bucket"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"), col("event_type")).orderBy(col("bucket"))))
        .filter(col("prev").isNotNull &&
          col("bucket") =!= col("prev") + expr("interval 1 day"))
      assert(holes.count() === 0, "spine has holes")
      // a key's first row is an observation (spine starts at min(bucket))
      val firsts = out
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"), col("event_type")).orderBy(col("bucket"))))
        .filter(col("rn") === 1)
      assert(firsts.filter(col("was_gap")).count() === 0)
      // gap rows carry no events and a non-null carried value
      assert(out.filter(col("was_gap") &&
        (col("n_events") =!= 0 || col("filled_value").isNull)).count() === 0)
      // there IS something to fill at this sf (non-degenerate fixture)
      assert(out.filter(col("was_gap")).count() > 0)
    } finally out.unpersist()
  }

  test("qan_topn_others: exactly one remainder row, shares sum to 1, fold conserves calls") {
    val out = SparkEntry.queries("qan_topn_others")(spark, sf).collect()
    val others = out.filter(_.getString(0) == "(others)")
    assert(others.length <= 1)
    val shares = out.map(_.getDouble(5)).sum
    assert(math.abs(shares - 1.0) < 1e-4, s"shares sum $shares")
    val nTypes = Tables.events(spark, sf).select(col("event_type")).distinct.count()
    assert(out.map(_.getLong(2)).sum === nTypes, "n_merged must cover every dimension value")
    val totalCalls = out.map(_.getLong(3)).sum
    assert(totalCalls === Tables.events(spark, sf).count())
    // named rows are ranks 1..3; the remainder starts at 4
    assert(out.filter(_.getString(0) != "(others)").map(_.getInt(1)).sorted.toSeq
      == (1 to (out.length - others.length)).toSeq)
    others.foreach(r => assert(r.getInt(1) === out.length - others.length + 1))
  }

  test("qan_percent_change: first observation never alerts, pct matches day values") {
    val out = SparkEntry.queries("qan_percent_change")(spark, sf).collect()
    out.foreach { r =>
      val prev = if (r.isNullAt(5)) None else Some(r.getDouble(5))
      val pct = if (r.isNullAt(6)) None else Some(r.getDouble(6))
      val alert = r.getBoolean(7)
      if (prev.isEmpty) {
        assert(pct.isEmpty && !alert, "first observation must not alert")
      } else if (prev.get != 0.0) {
        // rounded display values reproduce the ratio to display precision
        val approx = (r.getDouble(4) - prev.get) / prev.get
        assert(math.abs(approx - pct.get) < 1e-3, s"pct ${pct.get} vs $approx")
        assert(alert === (math.abs(pct.get) > 0.5))
      }
    }
    assert(out.exists(r => !r.isNullAt(6)), "no comparable periods at this sf")
  }

  test("q27_range_window: trailing 1h frame matches a driver recount") {
    val out = SparkEntry.queries("q27_range_window")(spark, sf).collect()
    val byUser = out.groupBy(_.getLong(1))
    byUser.take(3).foreach { case (_, rows) =>
      def us(t: java.sql.Timestamp) = t.getTime / 1000 * 1000000 + t.getNanos / 1000
      val times = rows.map(r => us(r.getTimestamp(2))).sorted
      rows.foreach { r =>
        val t = us(r.getTimestamp(2))
        val expected = times.count(x => x >= t - 3600000000L && x <= t)
        assert(r.getLong(3) === expected, s"frame count at $t")
      }
    }
  }

  test("qan_concurrency: max overlap matches a brute-force interval recount") {
    val out = SparkEntry.queries("qan_concurrency")(spark, sf).collect()
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value")).collect()
      .groupBy(_.getLong(0))
    out.take(5).foreach { r =>
      val ivs = raw(r.getLong(0)).map { e =>
        def us(t: java.sql.Timestamp) = t.getTime / 1000 * 1000000 + t.getNanos / 1000
        val s = us(e.getTimestamp(1))
        (s, s + (BigDecimal(e.getDouble(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          * 1000000).toLong)
      }
      // overlap count evaluated at every interval start (ends exclusive)
      val brute = ivs.map { case (s, _) =>
        ivs.count { case (s2, e2) => s2 <= s && s < e2 }
      }.max
      assert(r.getLong(1) === brute, s"user ${r.getLong(0)} max concurrency")
      assert(r.getLong(2) === ivs.length)
    }
  }

  test("qan_time_weighted_avg: matches a driver-side LOCF integral recompute") {
    val out = SparkEntry.queries("qan_time_weighted_avg")(spark, sf).collect()
    assert(out.nonEmpty)
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"), col("value"), col("event_id"))
      .collect()
      .groupBy(r => (r.getLong(0), r.getString(1)))
    out.take(10).foreach { r =>
      val key = (r.getLong(0), r.getString(1))
      val evs = raw(key).sortBy(e => (e.getTimestamp(2).getTime,
        e.getTimestamp(2).getNanos, e.getLong(4)))
      val segs = evs.zip(evs.tail).map { case (a, b) =>
        def us(t: java.sql.Timestamp) = t.getTime / 1000 * 1000000 + t.getNanos / 1000
        (a.getDouble(3), us(b.getTimestamp(2)) - us(a.getTimestamp(2)))
      }
      val num = segs.map { case (v, dt) => BigDecimal(v) * BigDecimal(dt) }.sum
      val den = segs.map(_._2).sum
      assert(r.getLong(2) === segs.length, s"$key n_segments")
      assert(math.abs(r.getDouble(4) - (num / den).toDouble) < 1e-5,
        s"$key twa ${r.getDouble(4)} vs ${(num / den).toDouble}")
    }
  }

  test("qan_sla_burn: rolling sums match a driver recount, violation rule exact") {
    val out = SparkEntry.queries("qan_sla_burn")(spark, sf).collect()
    assert(out.nonEmpty)
    val byUser = out.groupBy(_.getLong(0))
    byUser.take(5).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getTimestamp(1).getTime)
      sorted.zipWithIndex.foreach { case (r, i) =>
        val window = sorted.slice(math.max(0, i - 6), i + 1)
        assert(r.getLong(4) === window.map(_.getLong(2)).sum, "w7_total recount")
        assert(r.getLong(5) === window.map(_.getLong(3)).sum, "w7_errors recount")
        if (r.getLong(4) > 0) {
          val rate = r.getDouble(6)
          assert(r.getBoolean(7) === (rate > 0.05))
        } else assert(r.isNullAt(6) && !r.getBoolean(7))
      }
    }
  }

  test("qan_value_histogram: bins cover their range, counts conserve the table") {
    val out = SparkEntry.queries("qan_value_histogram")(spark, sf).collect()
    assert(out.map(_.getLong(2)).sum === Tables.events(spark, sf).count())
    out.foreach { r =>
      val (lo, mn, mx) = (r.getDouble(5), r.getDouble(3), r.getDouble(4))
      assert(mn >= lo && mx < lo + 5.0 && mn <= mx,
        s"bin ${r.getLong(1)}: [$mn,$mx] outside [$lo,${lo + 5.0})")
    }
  }

  test("qan_funnel: stage timestamps strictly ordered, stages monotonically shrink") {
    val out = SparkEntry.queries("qan_funnel")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val view = r.getTimestamp(1)
      val click = if (r.isNullAt(2)) None else Some(r.getTimestamp(2))
      val purchase = if (r.isNullAt(3)) None else Some(r.getTimestamp(3))
      val stage = r.getInt(4)
      click.foreach(c => assert(c.after(view), "click must follow first view"))
      purchase.foreach { p =>
        assert(click.isDefined, "stage 3 implies stage 2")
        assert(p.after(click.get), "purchase must follow first click")
      }
      assert(stage === (1 + click.size + purchase.size))
    }
    val counts = (1 to 3).map(k => out.count(_.getInt(4) >= k))
    assert(counts == counts.sorted.reverse, s"funnel must shrink: $counts")
  }

  test("qan_retention: day-0 is complete, rates bounded, cohorts cover all users") {
    val out = SparkEntry.queries("qan_retention")(spark, sf).collect()
    val day0 = out.filter(_.getInt(1) == 0)
    day0.foreach(r => assert(r.getLong(2) === r.getLong(3) &&
      r.getDouble(4) === 1.0, "every cohort member is active on day 0"))
    out.foreach { r =>
      assert(r.getInt(1) >= 0, "activity cannot precede the cohort day")
      assert(r.getLong(2) <= r.getLong(3) && r.getDouble(4) <= 1.0)
    }
    val users = Tables.events(spark, sf).select(col("user_id")).distinct.count()
    assert(day0.map(_.getLong(3)).sum === users, "cohort sizes must partition users")
  }

  test("qan_digest_cooccurrence: lift/jaccard formulas hold against recomputed marginals") {
    val out = SparkEntry.queries("qan_digest_cooccurrence")(spark, sf).collect()
    assert(out.nonEmpty)
    val buckets = Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("hour", col("ts"))).distinct.count()
    out.foreach { r =>
      val (a, b, nab, na, nb) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a < b, "pairs are ordered by dimension value")
      assert(nab <= math.min(na, nb), "co-occurrence bounded by each marginal")
      assert(math.abs(r.getDouble(5) -
        BigDecimal(nab.toDouble * buckets / (na.toDouble * nb.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, "lift formula")
      assert(math.abs(r.getDouble(6) -
        BigDecimal(nab.toDouble / (na + nb - nab).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, "jaccard formula")
    }
    // each unordered pair appears once
    assert(out.map(r => (r.getString(0), r.getString(1))).distinct.length === out.length)
  }

  test("qan_metric_correlation: |r| <= 1, full spine alignment, co-moving flag from rounded r") {
    val out = SparkEntry.queries("qan_metric_correlation")(spark, sf).collect()
    assert(out.nonEmpty)
    val nHours = Tables.events(spark, sf)
      .select(date_trunc("hour", col("ts"))).distinct.count()
    out.foreach { r =>
      assert(r.getLong(2) === nHours, "every pair aligns on the full hour spine")
      if (!r.isNullAt(3)) {
        val corr = r.getDouble(3)
        assert(corr >= -1.0 - 1e-9 && corr <= 1.0 + 1e-9, s"r out of range: $corr")
        assert(r.getBoolean(4) === (math.abs(corr) > 0.5))
      } else assert(!r.getBoolean(4))
    }
    val nTypes = Tables.events(spark, sf).select(col("event_type")).distinct.count()
    assert(out.length === nTypes * (nTypes - 1) / 2, "one row per unordered digest pair")
  }

  test("qan_seasonal_residual: every observed hour scored once, z from its own slot's moments") {
    val out = SparkEntry.queries("qan_seasonal_residual")(spark, sf).collect()
    val nHours = Tables.events(spark, sf)
      .select(date_trunc("hour", col("ts"))).distinct.count()
    assert(out.length === nHours, "one row per observed hour")
    // recompute one slot's baseline from the output itself
    val slot = out.groupBy(r => (r.getLong(1), r.getLong(2))).head._2
    val calls = slot.map(_.getLong(3).toDouble)
    val mean = calls.sum / calls.length
    slot.foreach { r =>
      assert(math.abs(r.getDouble(5) - BigDecimal(mean)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, "slot mean")
      if (!r.isNullAt(6)) {
        val varS = calls.map(c => (c - mean) * (c - mean)).sum / (calls.length - 1)
        val want = (r.getLong(3) - mean) / math.sqrt(varS)
        assert(math.abs(r.getDouble(6) - want) < 1e-2, "z from slot moments")
      }
      assert(r.getBoolean(7) === (!r.isNullAt(6) && math.abs(r.getDouble(6)) > 3.0))
    }
  }

  test("qan_topn_approx_audit: approx never exceeds exact, exact ranks dense, undercount consistent") {
    val out = SparkEntry.queries("qan_topn_approx_audit")(spark, sf).collect()
    assert(out.map(_.getInt(0)).sorted.toSeq === (1 to out.length), "exact ranks dense")
    out.foreach { r =>
      val exact = r.getDouble(2)
      // a digest missed by EVERY segment's top-3 is legitimately NULL
      // on the approx side — the exact failure mode the audit surfaces
      val approx = if (r.isNullAt(3)) 0.0 else r.getDouble(3)
      val under = r.getDouble(5)
      // the per-segment merge can only LOSE value (each segment's
      // non-top-3 contributions are dropped), never invent it
      assert(approx <= exact + 1e-6, "approx topN cannot exceed the exact total")
      assert(math.abs(under - (exact - approx)) < 1e-3, "undercount = exact - approx")
      if (r.isNullAt(3)) assert(r.isNullAt(4), "missed digests carry no approx rank")
    }
  }

  test("qan_trend_forecast: slope matches a driver-side least squares, forecast extrapolates") {
    val out = SparkEntry.queries("qan_trend_forecast")(spark, sf).collect()
    assert(out.nonEmpty)
    // recompute one instance's fit from raw day totals
    val uid = out.head.getLong(0)
    val days = Tables.events(spark, sf)
      .filter(col("user_id") === uid)
      .groupBy(date_trunc("day", col("ts")).as("b"))
      .agg(sum(col("value")).as("y"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime / 86400000L.toDouble, r.getDouble(1)))
    val n = days.length.toDouble
    val sx = days.map(_._1).sum; val sy = days.map(_._2).sum
    val sxy = days.map(t => t._1 * t._2).sum; val sxx = days.map(t => t._1 * t._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(out.head.getDouble(2) - slope) < 1e-2,
      s"slope ${out.head.getDouble(2)} vs recomputed $slope")
    out.foreach { r =>
      assert(r.getLong(1) >= 2, "single-day instances are dropped (no trend from one point)")
      assert(r.getBoolean(4) === (r.getDouble(2) > 0.0))
    }
  }

  test("qan_error_ztest: counts partition the fleet, z formula holds, flags on rounded z") {
    val out = SparkEntry.queries("qan_error_ztest")(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    assert(out.map(_.getLong(1)).sum === total, "per-instance counts partition the fleet")
    val fleetRate = out.head.getDouble(4)
    out.foreach { r =>
      val (n, x, z) = (r.getLong(1), r.getLong(2), r.getDouble(5))
      assert(r.getDouble(4) === fleetRate, "every row sees the same fleet baseline")
      val p0 = out.map(_.getLong(2)).sum.toDouble / total
      val want = (x.toDouble / n - p0) / math.sqrt(p0 * (1 - p0) / n)
      assert(math.abs(z - want) < 1e-3, s"z $z vs recomputed $want")
      assert(r.getBoolean(6) === (z > 3.0) && r.getBoolean(7) === (z < -3.0))
    }
  }

  test("qan_m4_downsample: every bucket's extremes survive, <=4 points, min-max exact") {
    val out = SparkEntry.queries("qan_m4_downsample")(spark, sf).cache()
    try {
      val perBucket = out.groupBy(col("user_id"), col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("value")).as("lo"), max(col("value")).as("hi"),
          min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      assert(perBucket.filter(col("n") > 4).count() === 0, "M4 keeps at most 4 points")
      // the reduced set preserves each bucket's true min/max value and
      // first/last timestamp — the error-free rendering guarantee
      val truth = Tables.events(spark, sf)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(min(col("value")).as("t_lo"), max(col("value")).as("t_hi"),
          min(col("ts")).as("t_first"), max(col("ts")).as("t_last"))
      val broken = perBucket.join(truth, Seq("user_id", "bucket"))
        .filter(col("lo") =!= col("t_lo") || col("hi") =!= col("t_hi") ||
          col("first_ts") =!= col("t_first") || col("last_ts") =!= col("t_last"))
      assert(broken.count() === 0, "downsampled extremes must equal the raw extremes")
      // where a bucket has more than 4 raw points, M4 strictly reduces
      // (at tiny SFs buckets can be sparser than 4 — then it's lossless
      // pass-through, which the extremes check above already proves)
      val reducible = out.filter(col("n_raw") > 4)
        .groupBy(col("user_id"), col("bucket"), col("n_raw"))
        .agg(count(lit(1)).as("kept"))
      assert(reducible.filter(col("kept") >= col("n_raw")).count() === 0,
        "buckets with >4 raw points must shrink")
      assert(out.count() <= Tables.events(spark, sf).count())
    } finally { out.unpersist(); () }
  }

  test("qan_markov_transitions: rows are a stochastic matrix, counts conserve transitions") {
    val out = SparkEntry.queries("qan_markov_transitions")(spark, sf).collect()
    assert(out.nonEmpty)
    // per-cur probabilities sum to ~1 and counts sum to the row total
    out.groupBy(_.getString(0)).foreach { case (cur, rows) =>
      assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-3, s"$cur rows don't sum to 1")
      assert(rows.map(_.getLong(2)).sum === rows.head.getLong(3), s"$cur counts vs total")
      assert(rows.map(_.getInt(5)).sorted.toSeq === (1 to rows.length), s"$cur ranks dense")
    }
    // total transitions = events - one per instance (the last has no successor)
    val events = Tables.events(spark, sf).count()
    val instances = Tables.events(spark, sf).select(col("user_id")).distinct.count()
    assert(out.map(_.getLong(2)).sum === events - instances)
  }

  test("qan_rank_movers: dense unique ranks, movement arithmetic, new entries flagged") {
    val out = SparkEntry.queries("qan_rank_movers")(spark, sf).collect()
    assert(out.nonEmpty)
    val nowRanks = out.map(_.getInt(2)).sorted.toSeq
    assert(nowRanks === (1 to out.length), "rank_now must be a dense permutation")
    out.foreach { r =>
      val prevNull = r.isNullAt(3)
      assert(r.getBoolean(7) === prevNull, "new_entry iff no previous-day rank")
      if (!prevNull)
        assert(r.getInt(3) - r.getInt(2) === r.getInt(4), "moved_up = rank_prev - rank_now")
      else assert(r.isNullAt(4))
    }
  }
  test("drift psi: contributions reproduce from bucket counts; periods partition every bucket") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("qan_drift_psi")(spark, sf).collect()
    assert(rows.nonEmpty)
    // the two periods partition the histogram exactly
    val ev = Tables.events(spark, sf)
    val total = ev.count()
    assert(rows.map(r => r.getLong(2) + r.getLong(3)).sum == total,
      "n_a + n_b over all buckets must cover every event")
    // per event_type: recompute totals and every psi contribution
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val totA = rs.map(_.getLong(2)).sum
      val totB = rs.map(_.getLong(3)).sum
      val nBins = rs.length
      rs.foreach { r =>
        val p = (r.getLong(2) + 1).toDouble / (totA + nBins)
        val q = (r.getLong(3) + 1).toDouble / (totB + nBins)
        assert(math.abs(r.getDouble(6) - (p - q) * math.log(p / q)) < 1e-7,
          s"psi contrib off for ${r.getString(0)} bin ${r.getLong(1)}")
      }
    }
  }
}
