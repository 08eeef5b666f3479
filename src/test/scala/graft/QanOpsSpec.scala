package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.QanOps

/** Unit semantics of the multi-counter snapshot→delta
  * (QanOps.snapshotDeltaMulti) against the reference's CalculateDeltas
  * rules (mysql/snapshot.go): per-counter reset handling, first
  * snapshot emits nothing, count-star gate, TimePeriodSecs.
  */
class QanOpsSpec extends SparkSpec {

  private def t(sec: Long) = new Timestamp(sec * 1000)

  // (key, ts, cum_a "count star", cum_b)
  private def snaps = {
    import spark.implicits._
    Seq(
      ("k1", t(0), 10L, 100L),   // first snapshot — never emitted
      ("k1", t(30), 12L, 130L),  // deltas: a=2 (>0 → kept), b=30, period=30s
      ("k1", t(60), 12L, 150L),  // a=0 → gated out (not executed)
      ("k1", t(90), 3L, 20L),    // counter reset: deltas are curr values
      ("k2", t(10), 5L, 50L),    // only one snapshot for k2 — nothing
      ("k3", t(20), 0L, 40L)     // first snapshot with ZERO count-star
    ).toDF("k", "ts", "cum_a", "cum_b")
  }

  test("multi-counter delta: reset rule, first-snapshot gate, count-star gate") {
    val out = QanOps.snapshotDeltaMulti(snaps,
        keys = Seq("k"), ord = Seq(col("ts")), tsCol = col("ts"),
        counters = Seq("cum_a" -> "d_a", "cum_b" -> "d_b"))
      .select(col("k"), col("ts"), col("d_a"), col("d_b"), col("time_period_secs"))
      .orderBy(col("k"), col("ts"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000,
        r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(out == Seq(
      ("k1", 30L, 2L, 30L, 30.0),
      ("k1", 90L, 3L, 20L, 30.0)))
  }

  test("emitFirst=true diverges only on the first snapshot per key") {
    val out = QanOps.snapshotDeltaMulti(snaps,
        keys = Seq("k"), ord = Seq(col("ts")), tsCol = col("ts"),
        counters = Seq("cum_a" -> "d_a", "cum_b" -> "d_b"),
        emitFirst = true)
      .select(col("k"), col("ts"), col("d_a"), col("d_b"))
      .orderBy(col("k"), col("ts"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000,
        r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out == Seq(
      ("k1", 0L, 10L, 100L), // first counts fully
      ("k1", 30L, 2L, 30L),
      ("k1", 90L, 3L, 20L),
      ("k2", 10L, 5L, 50L),
      // pg new-query rule (postgresql/snapshot.go:199): a first
      // observation emits UNGATED — even with a zero count-star
      ("k3", 20L, 0L, 40L)))
  }

  test("multi-counter plan shares one shuffle across all counter lags") {
    val out = QanOps.snapshotDeltaMulti(snaps,
      keys = Seq("k"), ord = Seq(col("ts")), tsCol = col("ts"),
      counters = Seq("cum_a" -> "d_a", "cum_b" -> "d_b"))
    val plan = out.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected a single hash shuffle, plan:\n$plan")
  }

  test("tree rollup: root covers the fleet, every subtree equals its children plus itself") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("qan_tree_rollup")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // root (ancestor 0) must cover every instance and every call
    val ev = Tables.events(spark, sfDir)
    val totalCalls = ev.count()
    val nInst = ev.select(col("user_id")).distinct().count()
    assert(rows(0L) == ((nInst, totalCalls)), s"root ${rows(0L)} vs ($nInst, $totalCalls)")
    // conservation at every internal node: subtree(a) = Σ subtree(c)
    // over children c (c div 10 == a, c != a) + a's own leaf stats
    val own = ev.groupBy(col("user_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.keys.filter(_ > 0).foreach { a =>
      val children = rows.keys.filter(c => c != a && c / 10 == a)
      val expect = children.map(rows(_)._2).sum + own.getOrElse(a, 0L)
      assert(rows(a)._2 == expect,
        s"node $a: subtree_calls ${rows(a)._2} != children+own $expect")
    }
  }
}
