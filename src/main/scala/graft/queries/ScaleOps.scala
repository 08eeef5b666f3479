package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.Tables._
import graft.functions.expressions.GraftFunctions
import graft.operators.{AnnLsh, Dedup, Multimodal}

/** Rows-only operators (SURVEY §2): the scale paths whose algorithms
  * aren't expressible in DuckDB SQL (seeded MinHash/SimHash/LSH,
  * partition-batched decode). The driver records a rows-only check;
  * semantics are covered by ScalaTest specs that compare against the
  * exact brute-force baselines.
  */
object ScaleOps {
  type Q = (SparkSession, String) => DataFrame

  // MinHash+LSH near-dup pairs, exact-verified at threshold 0.8 —
  // same contract as doc_ngram_jaccard_pairs but candidate-driven
  // (see Dedup.minhashNearDupPairs for the 100 TB argument).
  private val docMinhashLsh: Q = (s, d) =>
    Dedup.minhashNearDupPairs(documents(s, d), "doc_id", "text",
        n = 3, k = 32, bands = 8, tau = 0.8)
      .orderBy(col("a_id"), col("b_id"))

  // Cluster formation over MinHash near-dup pairs: connected
  // components → one representative per cluster with its size — the
  // "drop all but one" dedup decision table.
  private val docDedupClusters: Q = (s, d) => {
    val docs = documents(s, d).select(col("doc_id").as("id"))
    val pairs = Dedup.minhashNearDupPairs(documents(s, d), "doc_id", "text")
    Dedup.connectedComponents(docs, pairs)
      .groupBy(col("cluster").as("representative_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .orderBy(col("representative_id"))
  }

  // SimHash fingerprint per document plus its banding chunks.
  private val docSimhash: Q = (s, d) =>
    documents(s, d)
      .select(col("doc_id"), GraftFunctions.simhash64(col("text")).as("simhash"))
      .withColumn("chunk0", expr("simhash & 65535"))
      .orderBy(col("doc_id"))

  // Polynomial rolling-hash fingerprint (custom codegen Expression).
  private val docFingerprint: Q = (s, d) =>
    documents(s, d)
      .select(col("doc_id"), GraftFunctions.polyFingerprint(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))

  // LSH-bucketed approximate top-k — the scale path matching
  // emb_cosine_topk's contract (recall measured in AnnSpec).
  private val embAnnLsh: Q = (s, d) => {
    val e = embeddings(s, d).withColumn("v", col("embedding").cast(ArrayType(DoubleType)))
    val corpus = e.select(col("vec_id").as("id"), col("v"))
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    AnnLsh.topK(corpus, queries, k = 10, bits = 6, dim = 64)
      .orderBy(col("query_id"), col("rank"))
  }

  // Multimodal: binary payload → per-partition batched (stubbed)
  // decode → typed feature rows.
  private val mmFeatureStub: Q = (s, d) => {
    val withBin = documents(s, d).withColumn("payload", encode(col("text"), "UTF-8"))
    Multimodal.extractFeatures(s, withBin, "doc_id", "payload")
      .toDF()
      .select(col("doc_id"), col("byte_len"), col("fake_width"), col("fake_height"),
        round(element_at(col("features"), 1), 4).as("f0"),
        round(element_at(col("features"), 8), 4).as("f7"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB can replay PolyHash exactly: decode UTF-8 bytes via hex
    * pairs, then a HUGEINT fold of (acc·base + byte) mod 2⁶¹−1 — so
    * the custom codegen expression gets a real cross-engine oracle.
    */
  private val docFingerprintSql = """
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
      FROM documents),
    f AS (
      SELECT doc_id,
        list_reduce(
          list_prepend(CAST(0 AS HUGEINT),
            list_transform(range(1, n + 1),
              i -> CAST((instr('0123456789ABCDEF', substr(h, 2*i-1, 1)) - 1) * 16
                 + instr('0123456789ABCDEF', substr(h, 2*i, 1)) - 1 AS HUGEINT))),
          (acc, v) -> (acc * 1000003 + v) % 2305843009213693951) AS fp
      FROM b)
    SELECT doc_id, CAST(fp AS BIGINT) AS fingerprint
    FROM f
    ORDER BY doc_id"""

  val entries: Map[String, Q] = Map(
    "doc_minhash_lsh" -> docMinhashLsh,
    "doc_dedup_clusters" -> docDedupClusters,
    "doc_simhash" -> docSimhash,
    "doc_fingerprint" -> docFingerprint,
    "emb_ann_lsh" -> embAnnLsh,
    "mm_feature_stub" -> mmFeatureStub)

  /** DuckDB replay of SimHash64: FNV-1a per whitespace token with
    * mod-2⁶⁴ wrap-around emulated in HUGEINT, ±1 bit votes, sign
    * bits reassembled and converted back to the signed 64-bit value.
    * The 2^b constants are inlined as HUGEINT literals (pow() would
    * go through doubles and lose exactness at 2⁶³).
    */
  private val docSimhashSql: String = {
    val pow2 = (0 until 64).map(b => s"${BigInt(1) << b}::HUGEINT").mkString("[", ", ", "]")
    val two64 = BigInt(1) << 64
    s"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
      FROM documents),
    hashed AS (
      SELECT doc_id,
        list_transform(tokens, t ->
          list_reduce(
            list_prepend(14695981039346656037::HUGEINT,
              list_transform(range(1, length(t) + 1), i -> CAST(unicode(substr(t, CAST(i AS INT), 1)) AS HUGEINT))),
            (acc, c) -> (xor(acc, c) * 1099511628211) % $two64::HUGEINT)) AS hashes
      FROM tok),
    bits AS (
      SELECT doc_id,
        list_sum(list_transform(range(0, 64), b ->
          CASE WHEN list_sum(list_transform(hashes, h ->
                 CASE WHEN (h // ($pow2[CAST(b AS INT) + 1])) % 2 = 1 THEN 1 ELSE -1 END)) > 0
               THEN $pow2[CAST(b AS INT) + 1] ELSE 0::HUGEINT END)) AS u
      FROM hashed)
    SELECT doc_id,
      CAST(CASE WHEN u >= ${BigInt(1) << 63}::HUGEINT THEN u - $two64::HUGEINT ELSE u END AS BIGINT) AS simhash,
      CAST(CASE WHEN u >= ${BigInt(1) << 63}::HUGEINT THEN u - $two64::HUGEINT ELSE u END AS BIGINT) & 65535 AS chunk0
    FROM bits
    ORDER BY doc_id"""
  }

  val oracles: Map[String, String] = Map(
    "doc_fingerprint" -> docFingerprintSql,
    "doc_simhash" -> docSimhashSql)
}
