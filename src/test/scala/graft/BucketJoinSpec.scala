package graft

import org.apache.spark.sql.functions._

/** SURVEY §5 claims bucketing co-locates fact-fact joins; this proves
  * it on this engine's tables: lineitem⋈orders written bucketed+sorted
  * by orderkey plans a SortMergeJoin with NO exchange and NO sort on
  * the join key — at 100 TB that's the entire shuffle of both fact
  * tables eliminated for every downstream key-aligned join.
  */
class BucketJoinSpec extends SparkSpec {

  test("bucketed+sorted fact tables join without exchange or sort on the key") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf).write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("graft_orders_b")
      Tables.lineitem(spark, sf).write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("graft_lineitem_b")
      val j = spark.table("graft_lineitem_b")
        .join(spark.table("graft_orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("hashpartitioning(l_orderkey"),
        s"lineitem still shuffles on the join key:\n$plan")
      assert(!plan.contains("hashpartitioning(o_orderkey"),
        s"orders still shuffles on the join key:\n$plan")
      // bucket-local sort files: no Sort operator feeding the join either
      val joinSection = plan.substring(0, plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Sort ["), s"unexpected sort above the join:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    }
  }
}
