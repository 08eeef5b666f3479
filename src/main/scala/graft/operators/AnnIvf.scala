package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Approximate nearest neighbour via IVF (inverted-file) cells — the
  * second scale path next to AnnLsh, trading LSH's oblivious buckets
  * for data-adaptive ones.
  *
  * Structure: deterministic seeded initial centroids → one Lloyd
  * refinement (cell means with decimal-exact sums, so the refinement
  * is engine-replayable) → corpus assigned to its nearest refined
  * centroid (the inverted file) → each query probes its `nprobe`
  * nearest cells and exact-cosine re-ranks inside them.
  *
  * At 100 TB: centroids are a tiny broadcast table (cells × dim),
  * assignment is one scan, the search is an equi-join on cell id, and
  * per-query work is bounded by probed-cell occupancy — the same
  * bounded-bucket argument as AnnLsh, but cells track the data
  * distribution so occupancy stays balanced where random hyperplanes
  * would not. More Lloyd rounds would just repeat the refinement
  * stage; one round keeps the oracle replay tractable while
  * exercising the full shape.
  */
object AnnIvf {

  /** Deterministic seeded initial centroids (same xorshift family as
    * AnnLsh.hyperplanes, different seed) — stable across runs and
    * engines, no RNG state.
    */
  def centroids0(cells: Int, dim: Int, seed: Long = 7L): Array[Array[Double]] = {
    var s = seed
    def next(): Double = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      (s % 1000L).toDouble / 1000.0
    }
    Array.fill(cells, dim)(next())
  }

  /** Squared-L2 distances of `v` to every inline centroid, as an
    * array column — sequential fold per centroid, the shape DuckDB's
    * list_reduce replays bit-exactly.
    */
  private def distArray(v: String, cents: Array[Array[Double]]): Column = {
    val folds = cents.map { c =>
      val lits = c.mkString("array(", "D,", "D)")
      s"aggregate(zip_with($v, $lits, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"
    }
    expr(folds.mkString("array(", ", ", ")"))
  }

  /** Squared-L2 fold between two array columns (corpus vector vs a
    * refined-centroid row from the cross join). */
  private def distCols(v: String, c: String): Column =
    expr(s"aggregate(zip_with($v, $c, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)")

  /** One Lloyd refinement: assign to the nearest seeded centroid
    * (ties → lowest cell), then per-cell per-dimension means with
    * decimal-exact sums. Returns (cell, centroid: array<double>);
    * empty cells vanish (no members → no mean), deterministically.
    */
  def refinedCentroids(corpus: DataFrame, cells: Int, dim: Int): DataFrame = {
    val cents = centroids0(cells, dim)
    val assigned = corpus
      .withColumn("__d", distArray("v", cents))
      // first occurrence of the min = lowest cell id on exact ties
      .withColumn("cell", expr("array_position(__d, array_min(__d)) - 1"))
    assigned
      .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim"))
      .agg((sum(col("x").cast(DecimalType(18, 6))).cast(DoubleType) /
        count(lit(1))).as("m"))
      .groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, m))), p -> p.m)")
        .as("centroid"))
  }

  /** Top-k approximate neighbours per query through the inverted file.
    *
    * @param vecs    (id, v: array<double>) corpus
    * @param queries (query_id, qv: array<double>) query set
    */
  def topK(vecs: DataFrame, queries: DataFrame, k: Int, cells: Int, dim: Int,
      nprobe: Int = 2): DataFrame = {
    val cent1 = refinedCentroids(vecs, cells, dim)
    // inverted file: each corpus vector in its nearest refined cell
    // (broadcast cross join: centroids are cells×dim, always tiny)
    val wVec = Window.partitionBy(col("id")).orderBy(col("dist"), col("cell"))
    val inverted = vecs.crossJoin(broadcast(cent1))
      .withColumn("dist", distCols("v", "centroid"))
      .withColumn("rn", row_number().over(wVec))
      .filter(col("rn") === 1)
      .select(col("id"), col("v"), col("cell"))
    // each query probes its nprobe nearest cells
    val wQ = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("cell"))
    val probes = queries.crossJoin(broadcast(cent1))
      .withColumn("dist", distCols("qv", "centroid"))
      .withColumn("rn", row_number().over(wQ))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
    probes.join(inverted, Seq("cell"))
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
