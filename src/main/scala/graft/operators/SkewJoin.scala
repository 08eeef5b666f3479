package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase salted join for skewed keys.
  *
  * AQE's skew-join handling splits oversized post-shuffle partitions
  * at runtime, but it only triggers for sort-merge joins and after a
  * shuffle has already materialized the skew. Pre-salting is the
  * planned-ahead form — but salting EVERY key replicates the entire
  * build side ×buckets, which on a fact-fact join at 100 TB costs
  * more than the skew it cures. So: two phases.
  *
  *  1. Detect hot keys with a cheap count aggregate on the probe side
  *     (map-side partial combine; output is one row per key). A key is
  *     hot when its row count exceeds `hotFactor` × the mean count —
  *     by construction a small set, broadcast everywhere below.
  *  2. HOT slice: probe rows get a deterministic salt in [0, buckets)
  *     (hash of the whole row — no RNG state on executors, retries
  *     repartition identically), build rows for hot keys ONLY are
  *     replicated ×buckets, and the join key becomes (key, salt) — one
  *     hot key's rows spread over `buckets` reducers.
  *     COLD slice: plain equi-join, no replication at all.
  *     Union of the two is the exact inner-join multiset.
  *
  * Build-side replication is proportional to the hot keys' build rows
  * (≈ buckets × |build ∩ hot|), not to buckets × |build| — the
  * difference between a bounded fix-up and an 8× blow-up of 100 TB.
  */
object SkewJoin {

  /** Keys whose probe-side row count exceeds `hotFactor` × the mean
    * per-key count. One hash aggregate + one tiny global mean — the
    * "cheap count sketch" phase.
    */
  def hotKeys(probe: DataFrame, key: String, hotFactor: Double): DataFrame = {
    val counts = probe.groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
    // global mean as a broadcast 1-row cross join — NOT a partitionless
    // window, which would funnel every key's count row through one task
    val mean = counts.agg(avg(col("__cnt")).as("__mean"))
    counts.crossJoin(broadcast(mean))
      .filter(col("__cnt") > col("__mean") * hotFactor)
      .select(col(key))
  }

  /** Inner join with hot-key-only salting (see object doc).
    *
    * @param buckets   salt fan-out for hot keys
    * @param hotFactor hot threshold as a multiple of the mean per-key
    *                  probe count
    */
  def saltedInner(left: DataFrame, right: DataFrame, key: String,
      buckets: Int, hotFactor: Double = 4.0): DataFrame = {
    val hot = broadcast(hotKeys(left, key, hotFactor))

    // hot slice: salt probe rows, replicate ONLY the hot build rows
    val hotLeft = left.join(hot, Seq(key), "left_semi")
      .withColumn("__salt",
        pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(buckets)))
    val hotRight = right.join(hot, Seq(key), "left_semi")
      .withColumn("__salt", explode(sequence(lit(0L), lit(buckets - 1L))))
    val hotJoined = hotLeft.join(hotRight, Seq(key, "__salt")).drop("__salt")

    // cold slice: plain join, both sides filtered by the broadcast set
    val coldJoined = left.join(hot, Seq(key), "left_anti")
      .join(right.join(hot, Seq(key), "left_anti"), Seq(key))

    hotJoined.unionByName(coldJoined)
  }

  /** The replicated build-side slice alone — exposed so specs can
    * assert replication is proportional to hot-key build rows, not to
    * buckets × |build|.
    */
  def replicatedBuildRows(left: DataFrame, right: DataFrame, key: String,
      buckets: Int, hotFactor: Double = 4.0): Long = {
    val hot = broadcast(hotKeys(left, key, hotFactor))
    right.join(hot, Seq(key), "left_semi")
      .withColumn("__salt", explode(sequence(lit(0L), lit(buckets - 1L))))
      .count()
  }
}
