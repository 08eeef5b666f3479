package graft

import org.apache.spark.sql.functions._

/** Extended SQL surface additions: PIVOT cross-tab and
  * INTERSECT/EXCEPT set operations.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("q23_pivot: cells partition the orders table and match direct filters") {
    val out = SparkEntry.queries("q23_pivot")(spark, sf).collect()
    val orders = Tables.orders(spark, sf)
    assert(out.length === orders.select(col("o_orderpriority")).distinct.count())
    val cellSum = out.map(r => r.getLong(1) + r.getLong(3) + r.getLong(5)).sum
    assert(cellSum === orders.count(), "pivot cells must partition the table")
    // spot-check one cell against a direct conditional count
    val urgent = out.find(_.getString(0) == "1-URGENT").get
    val direct = orders.filter(col("o_orderpriority") === "1-URGENT" &&
      col("o_orderstatus") === "F").count()
    assert(urgent.getLong(1) === direct)
  }

  test("q24_set_ops: members ordered in both years, none with an open 1997 order, distinct") {
    val out = SparkEntry.queries("q24_set_ops")(spark, sf).collect().map(_.getLong(0))
    assert(out.toSet.size === out.length, "set semantics must dedupe")
    val o = Tables.orders(spark, sf)
    def keys(cond: org.apache.spark.sql.Column): Set[Long] =
      o.filter(cond).select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val y95 = keys(year(col("o_orderdate")) === 1995)
    val y96 = keys(year(col("o_orderdate")) === 1996)
    val open97 = keys(year(col("o_orderdate")) === 1997 && col("o_orderstatus") === "O")
    assert(out.toSet === ((y95 intersect y96) diff open97))
  }

  test("q25_window_dist: quartiles balanced, pct_rank/cume bounded and monotone per group") {
    val out = SparkEntry.queries("q25_window_dist")(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(1)).foreach { case (prio, rows) =>
      val n = rows.length
      // ntile balance: bucket sizes differ by at most 1
      val sizes = rows.groupBy(_.getInt(3)).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"$prio quartiles unbalanced")
      val sorted = rows.sortBy(r => (r.getDouble(2), r.getLong(0)))
      // percent_rank: first row 0, last row 1 (n>1); cume ends at 1
      assert(sorted.head.getDouble(4) === 0.0)
      if (n > 1) assert(math.abs(sorted.last.getDouble(4) - 1.0) < 1e-9)
      assert(math.abs(sorted.last.getDouble(5) - 1.0) < 1e-9)
      assert(sorted.sliding(2).forall(p => p.head.getDouble(5) <= p.last.getDouble(5) + 1e-12))
    }
  }

  test("q26_grouping_sets: three grouping levels, each conserving the table totals") {
    val out = SparkEntry.queries("q26_grouping_sets")(spark, sf).collect()
    val total = Tables.lineitem(spark, sf).count()
    val byGid = out.groupBy(_.getLong(2))
    // gid 0 = (flag, status); gid 1 = (flag); gid 3 = ()
    assert(byGid.keySet === Set(0L, 1L, 3L))
    byGid.foreach { case (gid, rows) =>
      assert(rows.map(_.getLong(3)).sum === total, s"gid $gid counts must cover the table")
      if (gid == 3L) assert(rows.length === 1 &&
        rows.head.isNullAt(0) && rows.head.isNullAt(1))
      if (gid == 1L) assert(rows.forall(r => !r.isNullAt(0) && r.isNullAt(1)))
      if (gid == 0L) assert(rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)))
    }
  }
}
