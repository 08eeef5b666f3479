package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over keyed streams-at-rest: sessionization
  * and as-of joins. Both are single-shuffle window formulations — the
  * shape that survives 100 TB (partition by entity key, sort within
  * partition; no self-join, no driver state).
  */
object Temporal {

  /** Gap-based sessionization: a new session starts when the gap to
    * the previous event of the same key exceeds `gapSec`. Session ids
    * are a running count of session starts — the standard two-window
    * formulation (lag → flag → cumulative sum), one shuffle on the key.
    */
  def sessionize(df: DataFrame, keyCols: Seq[String], tsCol: String,
      gapSec: Long, sessionCol: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    df.withColumn("__new_session",
        when(prev.isNull || (unix_micros(col(tsCol)) - prev) > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn(sessionCol,
        sum(col("__new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }

  /** Backward as-of join: attach to each left row the single right
    * row of the same key with the greatest `rightTs <= leftTs`
    * (nulls when none). Implemented as tagged-union + one window over
    * (key, time) — a single shuffle, instead of an inequality join
    * (which Spark would plan as a broadcast-nested-loop).
    *
    * The right side must be unique per (key, ts) — pre-dedupe it or
    * the attached row among ties is unspecified.
    *
    * @param rightPayload right columns to carry (become nullable)
    */
  def asofBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    val payloadType = right.select(rightPayload.map(col): _*).schema
    val lSide = left.select(
      (col(leftKey).as("__k") +:
        unix_micros(col(leftTs).cast("timestamp")).as("__t") +:
        lit(1).as("__is_left") +:
        lit(null).cast(payloadType).as("__p") +:
        left.schema.fields.map(f => col(f.name))): _*)
    val rSide = right.select(
      (col(rightKey).as("__k") +:
        unix_micros(col(rightTs).cast("timestamp")).as("__t") +:
        lit(0).as("__is_left") +:
        struct(rightPayload.map(col): _*).as("__p") +:
        left.schema.fields.map(f => lit(null).cast(f.dataType).as(f.name))): _*)
    // right rows sort before left rows at equal time → "<=" semantics
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(left.columns.map(col) ++ rightPayload.map(p => col(s"__match.$p").as(p)): _*)
  }
}
