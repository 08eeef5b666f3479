package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — `ROW_NUMBER() OVER (ORDER BY ...)`
  * without the single-partition window.
  *
  * Spark plans a partition-less window as "move everything to one
  * task": fine on a collapsed 5-row aggregate, a scale-killer the
  * moment the ranked set grows with the fleet (10⁶–10⁷ digests at a
  * 100 TB deployment all funnel through one thread). The classic
  * scalable formulation used here:
  *
  *  1. range-repartition by the sort key — partition i holds keys
  *     that all sort before partition i+1's (RangePartitioner);
  *  2. rank locally inside each range partition (a PARTITIONED
  *     window keyed on the physical partition id);
  *  3. add each partition's prefix offset — the total row count of
  *     all earlier partitions, a ≤P-row aggregate joined back as a
  *     broadcast.
  *
  * The result is exactly `row_number()` over the given total order
  * (callers must pass a tie-free sort — include a unique key last),
  * with the ranked set staying distributed end to end. Cost: one
  * range exchange + one hash exchange over the input, both over the
  * already-collapsed aggregate a caller ranks, never raw data.
  */
object Ranking {

  private val PidCol = "__grank_pid"
  private val LrkCol = "__grank_lrk"
  private val CntCol = "__grank_cnt"
  private val OffCol = "__grank_off"

  /** Append `out` = global row_number over `sortExprs` (which must be
    * a total order). IntegerType, matching `row_number()`.
    */
  def globalRowNumber(df: DataFrame, sortExprs: Seq[Column], out: String,
      partitions: Int = 32): DataFrame = {
    val ranged = df
      .repartitionByRange(partitions, sortExprs: _*)
      .withColumn(PidCol, spark_partition_id())
    val local = ranged.withColumn(LrkCol,
      row_number().over(Window.partitionBy(col(PidCol)).orderBy(sortExprs: _*)))
    val counts = local.groupBy(col(PidCol)).agg(count(lit(1)).as(CntCol))
    // prefix offsets: sum of earlier partitions' counts — a ≤P×P
    // self-join on the tiny per-partition count table, so no window
    // (partition-less or otherwise) ever appears in this plan
    val earlier = counts.select(col(PidCol).as(s"${PidCol}_e"), col(CntCol).as(s"${CntCol}_e"))
    val offsets = counts
      .join(earlier, col(s"${PidCol}_e") < col(PidCol), "left")
      .groupBy(col(PidCol))
      .agg(coalesce(sum(col(s"${CntCol}_e")), lit(0L)).as(OffCol))
    local
      .join(broadcast(offsets), Seq(PidCol))
      .withColumn(out, (col(LrkCol) + col(OffCol)).cast("int"))
      .drop(PidCol, LrkCol, OffCol)
  }
}
