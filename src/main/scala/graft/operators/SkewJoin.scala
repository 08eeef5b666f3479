package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * AQE's skew-join handling splits oversized post-shuffle partitions
  * at runtime, but it only triggers for sort-merge joins and after a
  * shuffle has already materialized the skew. Pre-salting is the
  * planned-ahead form: the skewed (left) side gets a random-ish salt
  * in [0, buckets), the build (right) side is replicated once per
  * salt value, and the join key becomes (key, salt) — one hot key's
  * rows spread over `buckets` reducers.
  *
  * Salt derives from a hash of the whole left row (`xxhash64` over
  * all columns), so it's deterministic (re-runs and retries produce
  * identical partitioning — no RNG state on executors).
  */
object SkewJoin {

  def saltedInner(left: DataFrame, right: DataFrame, key: String,
      buckets: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(buckets)))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0L), lit(buckets - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
