package graft

import org.apache.spark.sql.functions._

import graft.operators.Temporal

class TemporalSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof backward: inclusive at equal ts, null when no earlier right row, latest wins") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // exactly at a right ts → inclusive
      (2L, 10L, ts("2024-01-01 09:00:00")),  // before any right row → null
      (3L, 10L, ts("2024-01-01 12:00:00")),  // two right rows before → latest
      (4L, 99L, ts("2024-01-01 12:00:00"))   // key with no right rows at all
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), "a"),
      (10L, ts("2024-01-01 11:00:00"), "b")
    ).toDF("rk", "rt", "tag")
    val out = Temporal.asofBackward(left, right, "k", "rk", "t", "rt", Seq("tag"))
      .select("id", "tag").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains("a"))
    assert(out(2L).isEmpty)
    assert(out(3L).contains("b"))
    assert(out(4L).isEmpty)
  }

  test("sessionize: gap starts a new session per key, running ids") {
    import spark.implicits._
    val df = Seq(
      (10L, ts("2024-01-01 10:00:00")),
      (10L, ts("2024-01-01 10:10:00")),  // same session (gap 10m < 30m)
      (10L, ts("2024-01-01 11:00:00")),  // new session (gap 50m)
      (20L, ts("2024-01-01 10:00:00"))   // separate key → own session
    ).toDF("user_id", "t")
    val out = Temporal.sessionize(df, Seq("user_id"), "t", gapSec = 1800)
      .select("user_id", "t", "session_id")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
    assert(out == Set(
      (10L, "2024-01-01 10:00:00.0", 1L),
      (10L, "2024-01-01 10:10:00.0", 1L),
      (10L, "2024-01-01 11:00:00.0", 2L),
      (20L, "2024-01-01 10:00:00.0", 1L)))
  }
}
