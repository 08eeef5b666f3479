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

  // --------------------------------------------------- emb_int8_quantize
  // Symmetric int8 scalar quantization — the 4× storage / bandwidth
  // lever for a 100 TB embedding store. One native compiled pass per
  // vector (Int8QuantStats / Int8Recon — no per-element interpreted
  // HOFs); the oracle replays scale, the clamped floor(x/s + 0.5)
  // code rule, and the index-order mae fold bit-exactly, so scale and
  // mae are UNROUNDED. recon_cos (quality of the quantized index) is
  // rounded 4dp like every cross-engine cosine.
  private val embInt8Quantize: Q = (s, d) => {
    val e = vecs(s, d)
      .withColumn("stats", GraftFunctions.int8QuantStats(col("v")))
      .withColumn("recon", GraftFunctions.int8Recon(col("v")))
    e.select(col("vec_id"),
        col("stats").getItem(0).as("scale"),
        col("stats").getItem(1).as("mae"),
        col("stats").getItem(2).cast("long").as("n_sat"),
        round(GraftFunctions.cosineSimilarity(col("v"), col("recon")), 4).as("recon_cos"))
      .orderBy(col("vec_id"))
  }

  // the quantization rule, shared by both quantize oracles: clamped
  // round-half-up-toward-+inf code — floor(x/s + 0.5), NOT round()
  // (whose half rule differs between engines)
  private def codeSql(x: String, s: String): String =
    s"CASE WHEN $s = 0 THEN 0.0 ELSE GREATEST(-127.0, LEAST(127.0, floor($x / $s + 0.5))) END"

  private val embInt8QuantizeSql = s"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    sc AS (
      SELECT vec_id, v,
        list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      FROM e),
    q AS (
      SELECT vec_id, v, scale,
        list_transform(v, x -> ${codeSql("x", "scale")} * scale) AS recon
      FROM sc)
    SELECT vec_id, scale,
      list_reduce(list_prepend(0.0,
        list_transform(range(1, len(v) + 1),
          i -> abs(v[CAST(i AS INT)] - recon[CAST(i AS INT)]))),
        (acc, y) -> acc + y) / len(v) AS mae,
      len(list_filter(v, x -> abs(${codeSql("x", "scale")}) = 127.0)) AS n_sat,
      ROUND(list_cosine_similarity(v, recon), 4) AS recon_cos
    FROM q
    ORDER BY vec_id"""

  // --------------------------------------------------- emb_quantized_topk
  // Top-k search over the QUANTIZED index (corpus side reconstructed
  // from int8 codes, queries kept full-precision — the asymmetric
  // scheme real ANN services run). Same contract as emb_cosine_topk;
  // recall vs the exact ranking is measured in AnnSpec.
  private val embQuantizedTopk: Q = (s, d) => {
    val e = vecs(s, d)
    val q = e.select(col("vec_id").as("query_id"), col("v").as("qv"))
      .filter(col("query_id") < 5)
    val c = e.select(col("vec_id").as("neighbor_id"),
      GraftFunctions.int8Recon(col("v")).as("cv"))
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("qcos", GraftFunctions.cosineSimilarity(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("qcos").desc, col("neighbor_id"))))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("qcos"), 4).as("qcos"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val embQuantizedTopkSql = s"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    r AS (
      SELECT vec_id,  v,
        list_transform(v, x -> ${codeSql("x",
          "(list_max(list_transform(v, y -> abs(y))) / 127.0)")} *
          (list_max(list_transform(v, y -> abs(y))) / 127.0)) AS recon
      FROM e),
    p AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        list_cosine_similarity(q.v, c.recon) AS cos_raw
      FROM e q JOIN r c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
    rk AS (
      SELECT query_id, neighbor_id, cos_raw,
        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS rank
      FROM p)
    SELECT query_id, rank, neighbor_id, ROUND(cos_raw, 4) AS qcos
    FROM rk
    WHERE rank <= 10
    ORDER BY query_id, rank"""

  // --------------------------------------------------- emb_dedup_clusters
  // Semantic dedup: connected components over embedding-cosine near-dup
  // pairs → one representative per cluster — the decision table of an
  // embedding-based (SemDeDup-style) corpus dedup, composing
  // emb_near_dup_pairs with the shared CC operator. Same bounded id
  // range as the pair query; at scale the pair source is emb_ann_lsh
  // buckets, and CC's small-graph regime labels on the driver.
  private val embDedupClusters: Q = (s, d) => {
    val e = vecs(s, d).filter(col("vec_id") < 500)
    val a = e.select(col("vec_id").as("a_id"), col("v").as("av"))
    val b = e.select(col("vec_id").as("b_id"), col("v").as("bv"))
    val pairs = a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos_sim", GraftFunctions.cosineSimilarity(col("av"), col("bv")))
      .filter(col("cos_sim") >= 0.4)
      .select(col("a_id"), col("b_id"))
    graft.operators.Dedup.connectedComponents(
        e.select(col("vec_id").as("id")), pairs)
      .groupBy(col("cluster").as("representative_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .orderBy(col("representative_id"))
  }

  private val embDedupClustersSql = """
    WITH RECURSIVE e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id < 500),
    pairs AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.4),
    edges AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION ALL
      SELECT b_id, a_id FROM pairs),
    reach(id, lbl) AS (
      SELECT vec_id, vec_id FROM e
      UNION
      SELECT g.dst, r.lbl
      FROM reach r JOIN edges g ON g.src = r.id
      WHERE r.lbl < g.dst),
    labels AS (
      SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id)
    SELECT cluster AS representative_id, COUNT(*) AS cluster_size
    FROM labels
    GROUP BY 1
    ORDER BY 1"""

  val entries: Map[String, Q] = Map(
    "emb_cosine_topk" -> embCosineTopk,
    "emb_near_dup_pairs" -> embNearDupPairs,
    "emb_int8_quantize" -> embInt8Quantize,
    "emb_quantized_topk" -> embQuantizedTopk,
    "emb_dedup_clusters" -> embDedupClusters)

  val oracles: Map[String, String] = Map(
    "emb_cosine_topk" -> embCosineTopkSql,
    "emb_near_dup_pairs" -> embNearDupPairsSql,
    "emb_int8_quantize" -> embInt8QuantizeSql,
    "emb_quantized_topk" -> embQuantizedTopkSql,
    "emb_dedup_clusters" -> embDedupClustersSql)
}
