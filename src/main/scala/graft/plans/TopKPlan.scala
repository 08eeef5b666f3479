package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.{IntegerType, Metadata}

/** Custom whole-operator: top-k rows per group with a rank column.
  *
  * The composed-builtin formulation (`row_number().over(Window)` then
  * `filter(rn <= k)`) sorts every group's complete row set. This
  * operator keeps a bounded k-element heap per group — O(n log k)
  * work and O(groups·k) state, independent of group sizes: the
  * difference that matters when a hot group holds 10⁹ rows at 100 TB.
  *
  * Spark-first structure (logical node → planner strategy → physical
  * exec): the exec declares ClusteredDistribution on the group keys,
  * so EnsureRequirements inserts exactly one hash shuffle and the
  * heaps run data-local. Installed per session via
  * `experimental.extraStrategies` (TopK.install).
  */
case class TopKPerGroup(
    k: Int,
    groupCols: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rn is born here, not derived from the child — declare it produced
  // or CheckAnalysis reports it as a missing input attribute
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerGroup =>
      TopKPerGroupExec(t.k, t.groupCols, t.order, t.rankAttr, planLater(t.child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    k: Int,
    groupCols: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  // one hash shuffle on the group keys; no sort required from the child
  override def requiredChildDistribution: Seq[Distribution] =
    if (groupCols.isEmpty) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupCols))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupExprs = groupCols
    val orderLocal = order
    val childOutput = child.output
    val outSchema = output
    child.execute().mapPartitions({ it =>
      val groupProj = UnsafeProjection.create(groupExprs, childOutput)
      val ordering = GenerateOrdering.generate(orderLocal, childOutput)
      val outProj = UnsafeProjection.create(outSchema.map(a => a: Expression), outSchema)
      // per-group bounded heap with the WORST kept row on top
      val worstOnTop: java.util.Comparator[InternalRow] = ordering.reversed()
      val heaps = new java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()
      it.foreach { row =>
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, worstOnTop)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val joiner = new JoinedRow
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { heap =>
        // drain the heap worst-first, emit best-first with ranks 1..k
        val arr = new Array[InternalRow](heap.size)
        var i = arr.length - 1
        while (i >= 0) { arr(i) = heap.poll(); i -= 1 }
        arr.iterator.zipWithIndex.map { case (row, idx) =>
          outProj(joiner(row, InternalRow(idx + 1)))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

object TopK {
  import org.apache.spark.sql.graft.Bridge

  /** Install graft's planner strategies into a session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** Top-k rows per group, ranked 1..k by `orders` (column name,
    * descending flag) — pass enough keys for a total order or ranks of
    * tied rows are partition-dependent. Columns are resolved by name
    * against the child's analyzed output (the custom node has no
    * analyzer rule, so it must be built already-resolved).
    */
  def perGroup(df: DataFrame, groupCols: Seq[String],
      orders: Seq[(String, Boolean)], k: Int, rankName: String = "rn"): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val plan = df.queryExecution.analyzed
    def resolve(name: String): Expression =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${plan.output.map(_.name)}"))
    val sortOrders = orders.map { case (c, desc) =>
      SortOrder(resolve(c), if (desc) Descending else Ascending)
    }
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false, Metadata.empty)()
    Bridge.ofRows(spark, TopKPerGroup(k, groupCols.map(resolve), sortOrders, rankAttr, plan))
  }
}
