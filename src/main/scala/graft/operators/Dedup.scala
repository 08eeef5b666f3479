package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.expressions.GraftFunctions

/** Near-duplicate detection operators — the 100 TB paths.
  *
  * Brute-force pair comparison (Text.docNgramJaccard) is O(n²) and
  * exists only as a small-scale oracle. These operators generate
  * candidates with hash buckets (MinHash banding / SimHash chunks) so
  * the join is equi-key and shuffle-partitioned: cost scales with
  * bucket occupancy, never with n².
  */
object Dedup {

  /** MinHash signature: k permutations approximated by seeded
    * xxhash64, signature[i] = min hash over shingles.
    */
  def minhashSignature(grams: String, k: Int): Column =
    expr(s"transform(sequence(0, ${k - 1}), i -> array_min(transform($grams, g -> xxhash64(g, i))))")

  /** LSH banding: split the signature into `bands` bands of
    * `rows` values; each band hashes to a bucket key. Two docs whose
    * true Jaccard is j collide in ≥1 band with prob 1-(1-j^rows)^bands.
    */
  def lshBands(sig: String, bands: Int, rows: Int): Column =
    expr(s"transform(sequence(0, ${bands - 1}), " +
      s"j -> struct(j AS band, xxhash64(concat_ws(',', slice($sig, j*$rows+1, $rows)), j) AS bucket))")

  /** Full MinHash+LSH near-dup pipeline: shingle → sign → band →
    * bucket-join for candidates → exact Jaccard verification.
    *
    * @param df       input with an id column and a text column
    * @param tau      Jaccard threshold for verified pairs
    * @return (a_id, b_id, jaccard) for verified candidate pairs
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 8, tau: Double = 0.8): DataFrame = {
    require(k == bands * (k / bands), "k must divide into bands evenly")
    val rows = k / bands
    val base = df
      .select(col(idCol).as("id"),
        array_distinct(expr(s"transform(sequence(1, greatest(length($textCol)-${n - 1}, 1)), " +
          s"i -> substring($textCol, i, $n))")).as("grams"))
      .withColumn("sig", minhashSignature("grams", k))
    val buckets = base
      .select(col("id"), col("grams"), explode(lshBands("sig", bands, rows)).as("b"))
      .select(col("id"), col("grams"), col("b.band").as("band"), col("b.bucket").as("bucket"))
    val left = buckets.select(col("band"), col("bucket"), col("id").as("a_id"), col("grams").as("a_grams"))
    val right = buckets.select(col("band"), col("bucket"), col("id").as("b_id"), col("grams").as("b_grams"))
    // equi-join on (band, bucket): shuffle-partitioned, no cross join
    val candidates = left.join(right, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_grams"), col("b_grams"))
      .dropDuplicates("a_id", "b_id")
    candidates
      .withColumn("inter", size(array_intersect(col("a_grams"), col("b_grams"))))
      .withColumn("jaccard", col("inter").cast(DoubleType) /
        (size(col("a_grams")) + size(col("b_grams")) - col("inter")).cast(DoubleType))
      .filter(col("jaccard") >= tau)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** SimHash fingerprints + near-dup pairs within a Hamming ball.
    *
    * Candidates come from matching any of 4 16-bit fingerprint chunks
    * (pigeonhole: hamming ≤ maxHamming < 4 chunks differing ⇒ at least
    * one chunk equal when maxHamming ≤ 3... for larger radii more
    * chunks would be needed; with radius ≤ 3 this is exact recall).
    */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol).as("id"),
      GraftFunctions.simhash64(col(textCol)).as("fp"))
    val chunks = fp.select(col("id"), col("fp"),
      explode(expr("transform(sequence(0, 3), c -> struct(c AS chunk, shiftright(fp, cast(c*16 AS INT)) & 65535 AS ck))")).as("b"))
      .select(col("id"), col("fp"), col("b.chunk").as("chunk"), col("b.ck").as("ck"))
    val l = chunks.select(col("chunk"), col("ck"), col("id").as("a_id"), col("fp").as("a_fp"))
    val r = chunks.select(col("chunk"), col("ck"), col("id").as("b_id"), col("fp").as("b_fp"))
    l.join(r, Seq("chunk", "ck"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", GraftFunctions.hamming64(col("a_fp"), col("b_fp")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }
}
