package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every implemented operator has an entry in [[queries]]; every
  * SQL-expressible one also has a DuckDB oracle in [[oracleSql]]
  * (column names and row order aligned between the two).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * QAN "top queries by total time" — the reference's headline
    * analytics (qan_analysis_example.ipynb).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("qan_top_queries")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.entries ++
      graft.queries.Qan.entries ++
      graft.queries.Text.entries ++
      graft.queries.Vectors.entries ++
      graft.queries.ScaleOps.entries ++
      graft.queries.Streaming.entries ++
      graft.queries.Polling.entries ++
      graft.queries.Extended.entries ++
      graft.queries.Corpus.entries ++
      graft.queries.Timeseries.entries ++
      graft.queries.Fleet.entries ++
      graft.queries.Ops.entries

  /** DuckDB-equivalent SQL per query key (driver correctness gate). */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Qan.oracles ++
      graft.queries.Text.oracles ++
      graft.queries.Vectors.oracles ++
      graft.queries.Streaming.oracles ++
      graft.queries.Polling.oracles ++
      graft.queries.Extended.oracles ++
      graft.queries.ScaleOps.oracles ++
      graft.queries.Corpus.oracles ++
      graft.queries.Timeseries.oracles ++
      graft.queries.Fleet.oracles ++
      graft.queries.Ops.oracles
}
