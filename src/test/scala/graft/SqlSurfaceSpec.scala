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
}
