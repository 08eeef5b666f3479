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

  /** MinHash signature: k permutations via the native
    * MinHashSignature expression (one compiled loop per row — see its
    * scaladoc for why the HOF formulation was replaced).
    */
  def minhashSignature(grams: String, k: Int): Column =
    GraftFunctions.minhashSignature(col(grams), k)

  /** LSH banding: split the signature into `bands` bands of `rows`
    * values; the band's raw signature slice IS the bucket key (an
    * array<long> equi-join key — no bucket hash needed, hash
    * partitioning of the shuffle does that implicitly, and the raw
    * slice keeps the operator engine-replayable). Two docs whose true
    * Jaccard is j collide in ≥1 band with prob 1-(1-j^rows)^bands.
    */
  def lshBands(sig: String, bands: Int, rows: Int): Column =
    expr(s"transform(sequence(0, ${bands - 1}), " +
      s"j -> struct(j AS band, slice($sig, j*$rows+1, $rows) AS bucket))")

  /** Full MinHash+LSH near-dup pipeline: shingle → sign → band →
    * bucket-join for candidates → exact Jaccard verification.
    *
    * @param df       input with an id column and a text column
    * @param tau      Jaccard threshold for verified pairs
    * @return (a_id, b_id, jaccard) for verified candidate pairs
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 36, bands: Int = 6, tau: Double = 0.8): DataFrame = {
    require(k == bands * (k / bands), "k must divide into bands evenly")
    val rows = k / bands
    // banding S-curve: P(candidate | jaccard j) = 1-(1-j^rows)^bands.
    // rows=6 keeps sub-threshold pairs (j≈0.4-0.6, common in repetitive
    // corpora) at low single-digit candidate rates while j≥0.8 pairs
    // collide with p≥0.84 — candidate volume, not n², is the cost.
    // shingles + signatures are reused by banding, the estimate
    // prefilter, and final verification — persist so the shingle/hash
    // work runs once (per-doc state is ~2 KB; spills to disk if the
    // corpus partition outgrows executor memory)
    val base = df
      .select(col(idCol).as("id"),
        expr(s"transform(sequence(1, greatest(length($textCol)-${n - 1}, 1)), " +
          s"i -> substring($textCol, i, $n))").as("grams_raw"))
      // shingle sets live on as sorted distinct 64-bit hashes: set ops
      // (minhash, exact intersect) run on longs, never strings
      .select(col("id"), GraftFunctions.gramHashes(col("grams_raw")).as("ghash"))
      .withColumn("sig", minhashSignature("ghash", k))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = base
      .select(col("id"), explode(lshBands("sig", bands, rows)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bucket").as("bucket"))
    // candidates carry only ids through the band join (the gram arrays
    // would otherwise be shuffled once per colliding band)
    val candidates = buckets.select(col("band"), col("bucket"), col("id").as("a_id"))
      .join(buckets.select(col("band"), col("bucket"), col("id").as("b_id")), Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .dropDuplicates("a_id", "b_id")
    // cheap prefilter before the expensive gram join: the MinHash
    // signature itself estimates jaccard (fraction of equal slots).
    // In a repetitive corpus the band join can admit ~10% of all
    // pairs; comparing k longs per pair drops nearly all of them
    // before any gram array is shuffled. Margin 0.2 ≈ 3σ of the
    // estimator at k=36 → recall loss ≪1%.
    val sigs = base
    val estKeep = candidates
      .join(sigs.select(col("id").as("a_id"), col("sig").as("a_sig")), Seq("a_id"))
      .join(sigs.select(col("id").as("b_id"), col("sig").as("b_sig")), Seq("b_id"))
      .withColumn("est_j",
        GraftFunctions.signatureOverlap(col("a_sig"), col("b_sig")).cast(DoubleType) / k)
      .filter(col("est_j") >= tau - 0.2)
      .select(col("a_id"), col("b_id"))
    estKeep
      .join(base.select(col("id").as("a_id"), col("ghash").as("a_g")), Seq("a_id"))
      .join(base.select(col("id").as("b_id"), col("ghash").as("b_g")), Seq("b_id"))
      .withColumn("inter", GraftFunctions.sortedIntersectCount(col("a_g"), col("b_g")))
      .withColumn("jaccard", col("inter").cast(DoubleType) /
        (size(col("a_g")) + size(col("b_g")) - col("inter")).cast(DoubleType))
      .filter(col("jaccard") >= tau)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Connected components over near-dup pairs → cluster labels
    * (min id in the component), the final step of corpus dedup: keep
    * one representative per cluster, drop the rest.
    *
    * Iterative min-label propagation over the edge list: each round
    * every node adopts the minimum label in its neighborhood; rounds
    * are whole-stage joins (no driver graph state) and the iteration
    * count is bounded by the component diameter — near-dup clusters
    * are shallow (dozens of hops at most), so this converges in a
    * handful of shuffles even at 100 TB edge scale.
    *
    * @param ids   one column `id` — every node (incl. singletons)
    * @param pairs columns `a_id`, `b_id`
    * @return (id, cluster) where cluster = min id of the component
    */
  def connectedComponents(ids: DataFrame, pairs: DataFrame,
      maxIterations: Int = 20): DataFrame = {
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = ids.select(col("id"), col("id").as("cluster"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      // each node's candidate = min(own label, min neighbor label)
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("cluster")).as("nmin"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val changed = next.withColumnRenamed("cluster", "next_cluster")
        .join(labels, Seq("id"))
        .filter(col("next_cluster") =!= col("cluster")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    labels
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
