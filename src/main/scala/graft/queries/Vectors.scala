package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.Tables._
import graft.functions.expressions.GraftFunctions

/** Block D — similarity search over the `embeddings` table (SURVEY
  * §2.D). The pairwise kernel is the native CosineSimilarity
  * expression (one compiled pass; the HOF zip_with/aggregate chain
  * interprets per element and dominated the join). Brute-force
  * variants are the correctness baselines; the LSH variant is the
  * 100 TB path (bucket join instead of cross join).
  */
object Vectors {
  type Q = (SparkSession, String) => DataFrame

  private def vecs(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .withColumn("v", col("embedding").cast(ArrayType(DoubleType)))

  // --------------------------------------------------- emb_cosine_topk
  // Brute-force cosine top-k: the exact-ANN baseline. Query set is
  // fixed (vec_id < 5) so work is bounded; ranking via per-query
  // ROW_NUMBER window. Cosine rounded to 4dp to absorb cross-engine
  // fold-order ulps.
  private val embCosineTopk: Q = (s, d) => {
    val e = vecs(s, d)
    val q = e.select(col("vec_id").as("query_id"), col("v").as("qv"))
      .filter(col("query_id") < 5)
    val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"))
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", GraftFunctions.cosineSimilarity(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos_sim"), 4).as("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val embCosineTopkSql = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    p AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        list_cosine_similarity(q.v, c.v) AS cos_raw
      FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
    r AS (
      SELECT query_id, neighbor_id, cos_raw,
        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS rank
      FROM p)
    SELECT query_id, rank, neighbor_id, ROUND(cos_raw, 4) AS cos_sim
    FROM r
    WHERE rank <= 10
    ORDER BY query_id, rank"""

  // --------------------------------------------------- emb_near_dup_pairs
  // Embedding-cosine near-duplicate pairs over a capped id range
  // (vec_id < 500 keeps the pair count sf-independent; the scale path
  // is emb_ann_lsh). Threshold 0.4 matches this corpus's cosine
  // distribution (max ≈ 0.51).
  private val embNearDupPairs: Q = (s, d) => {
    val e = vecs(s, d).filter(col("vec_id") < 500)
    val a = e.select(col("vec_id").as("a_id"), col("v").as("av"), col("label").as("a_label"))
    val b = e.select(col("vec_id").as("b_id"), col("v").as("bv"), col("label").as("b_label"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos_sim", GraftFunctions.cosineSimilarity(col("av"), col("bv")))
      .filter(col("cos_sim") >= 0.4)
      .select(col("a_id"), col("b_id"), round(col("cos_sim"), 4).as("cos_sim"),
        (col("a_label") === col("b_label")).as("same_label"))
      .orderBy(col("a_id"), col("b_id"))
  }

  private val embNearDupPairsSql = """
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id < 500)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      ROUND(list_cosine_similarity(a.v, b.v), 4) AS cos_sim,
      a.label = b.label AS same_label
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.4
    ORDER BY a_id, b_id"""

  val entries: Map[String, Q] = Map(
    "emb_cosine_topk" -> embCosineTopk,
    "emb_near_dup_pairs" -> embNearDupPairs)

  val oracles: Map[String, String] = Map(
    "emb_cosine_topk" -> embCosineTopkSql,
    "emb_near_dup_pairs" -> embNearDupPairsSql)
}
