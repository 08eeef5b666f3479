package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Approximate nearest neighbour via random-hyperplane LSH.
  *
  * The brute-force baseline (Vectors.embCosineTopk) cross-joins
  * queries × corpus — exact but O(|Q|·n). Here every vector gets a
  * `bits`-bit sign code from fixed random hyperplanes; queries explode
  * into multiprobe codes (own bucket + all Hamming-1 neighbours) and
  * the search is an equi-join on the bucket code followed by exact
  * re-ranking inside buckets. At 100 TB: corpus codes are computed in
  * one scan, the join shuffles by code, and per-bucket work is
  * bounded by bucket occupancy.
  */
object AnnLsh {

  /** Deterministic pseudo-random hyperplanes (xorshift from a fixed
    * seed) — stable across runs and engines, no RNG state.
    */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    var s = seed
    def next(): Double = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      (s % 1000L).toDouble / 1000.0
    }
    Array.fill(bits, dim)(next())
  }

  /** Sign-bit bucket code of `v` (array<double> column) under `hp` —
    * one compiled loop via the native HyperplaneCode expression (the
    * planes ride along as a codegen reference object). The previous
    * `aggregate(zip_with(...))` HOF formulation evaluated bits×dim
    * interpreted lambdas per row on the full corpus scan; for
    * well-formed (non-null, full-dimension) vectors the fold order is
    * unchanged, so codes (and the DuckDB replay) are bit-identical.
    * Edge semantics deliberately differ: a NULL vector now yields a
    * NULL code (dropping out of the bucket equi-join) where the HOF
    * chain collapsed all nulls into bucket 0, and a short vector is
    * treated as zero-padded (prefix dot) rather than forcing every
    * bit to 0.
    */
  def bucketCode(v: String, hp: Array[Array[Double]]): Column =
    graft.functions.expressions.GraftFunctions.hyperplaneCode(col(v), hp)

  /** Top-k approximate neighbours for each query vector.
    *
    * @param vecs    (id, v: array<double>) corpus
    * @param queries (query_id, qv: array<double>) query set
    */
  def topK(vecs: DataFrame, queries: DataFrame, k: Int, bits: Int, dim: Int): DataFrame = {
    val hp = hyperplanes(bits, dim)
    val corpus = vecs.withColumn("code", bucketCode("v", hp))
    val q = queries
      .withColumn("code0", bucketCode("qv", hp))
      // multiprobe: own bucket + every Hamming-1 bucket, as an
      // exploded equi-join key (never an inequality join)
      .withColumn("code", explode(expr(
        s"concat(array(code0), transform(sequence(0, ${bits - 1}, 1), j -> code0 ^ shiftleft(1L, j)))")))
    q.join(corpus, Seq("code"))
      .filter(col("query_id") =!= col("id"))
      .withColumn("cos_sim",
        graft.functions.expressions.GraftFunctions.cosineSimilarity(col("qv"), col("v")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        round(col("cos_sim"), 4).as("cos_sim"))
  }
}
