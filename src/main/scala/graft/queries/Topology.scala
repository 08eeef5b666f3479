package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fleet-topology convention shared by the Fleet and Ops query
  * blocks (and their DuckDB oracles): the corpus carries no explicit
  * topology table, so cluster membership is derived deterministically —
  * cluster = user_id div [[ClusterSize]], primary = the member ≡ 0 mod
  * [[ClusterSize]]. A deployment would join a real
  * instance→(cluster, role) dimension instead, broadcast-sized by
  * construction (one row per instance) — see Fleet.scala's header.
  *
  * One definition on purpose: the constant is interpolated into both
  * the DataFrame plans and the oracle SQL of two files; a silent fork
  * would hash-mismatch every fleet/ops query.
  */
object Topology {
  val ClusterSize = 5

  def withTopology(ev: DataFrame): DataFrame = ev
    .withColumn("cluster_id", expr(s"user_id div $ClusterSize"))
    .withColumn("is_primary", col("user_id") % ClusterSize === 0)
}
