package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType, StructField, StructType}

/** Persisted LEXICAL retrieval index — the BM25 counterpart of the
  * [[IvfPq]] store. A production retrieval system tokenizes and
  * aggregates the corpus ONCE and serves query-by-example from the
  * stored artifact; it does not re-run the corpus-wide explode +
  * aggregate per process start (at 100 TB the posting build is a full
  * corpus scan — the single most expensive lexical pass there is).
  *
  * Layout under `dir/`:
  *   - `postings/` (doc_id, token, tf) — the big table, one row per
  *     distinct (doc, token); everything else derives from it.
  *   - `df/` (token, df) — map-side-combined document frequencies.
  *   - `dl/` (doc_id, dl) — document lengths (Σ tf per doc); derived
  *     from the DOCS relation (left join against the postings), so a
  *     doc whose text tokenizes to nothing (null/empty) still owns a
  *     dl = 0 row — dl is the store's exact per-doc membership
  *     roster, which is what lets compaction re-derive n_corpus and
  *     target segments without ever consulting the original corpus.
  *   - `totals/` (n_corpus, t_total) — one row per segment.
  *
  * SEGMENTS AND COMMIT MARKERS (the LSM/table-format discipline):
  * every mutating write lands as a NAMED SEGMENT — a deterministic
  * set of files across the four tables plus a commit marker — and
  * readers only see files whose segment is committed:
  *   - the base build writes plain `part-*` files (the implicit
  *     `base` segment, always live — a build is wholesale-destructive
  *     by contract, so a torn build is a torn store and the recovery
  *     is rebuild);
  *   - a batch append publishes `seg-<id>-<n>.parquet` files, live
  *     only once `_segments/<id>` exists ([[appendToIndex]]);
  *   - a streaming ingest batch publishes `ingest-<b>-<n>.parquet`
  *     files, live only once `_ingest_commits/<b>` exists
  *     ([[appendBatchToIndex]]);
  *   - a shard merge copies `shard<i>-…` files (always live — the
  *     merge copies only the shards' LIVE file sets).
  * The marker is written strictly AFTER every data file of its
  * segment is in place, so a crash anywhere inside a multi-table
  * publish leaves the whole segment INVISIBLE — [[loadIndex]] sees
  * either all four tables of a segment or none of it, never torn
  * statistics. The liveness check is one driver-side directory
  * listing per table (cost ∝ file count — the manifest read every
  * LSM store pays; a deployment amortizes it in a manifest file).
  *
  * Every write is deterministic (pure aggregates of the corpus), so a
  * loaded index reproduces the inline frames bit for bit — the oracle
  * replay of an index-served query is the SAME SQL chain as the
  * inline one (doc_bm25_served shares doc_bm25_topk's oracle; that
  * hash equality IS the store round-trip proof, the emb_index_build
  * discipline).
  *
  * Scoring contract (shared verbatim with the inline doc_bm25_topk —
  * ONE implementation: [[serveStage]] for every stored/streamed path,
  * [[queryTerms]] + [[scoreCandidates]] underneath it and the inline
  * chain, so the paths cannot drift): BM25 k1 = 1.2, b = 0.75;
  * the tf-saturation term as the exact integer rational
  * 44·T·tf / (20·T·tf + 6·T + 18·dl·N); idf argument (2N+2)/(2df+1);
  * per-term contributions summed through DECIMAL(28,15); ranking by
  * the ROUNDED score. Query terms are capped to the `qTerms` LOWEST-df
  * terms (the WAND-style rare-terms-first cap) so candidate volume is
  * Σ df over rare terms — and because df rides the bounded query-term
  * relation (broadcast into the candidate join), the posting file
  * never shuffles by token (the r13 no-token-window discipline).
  *
  * 100 TB shape: the posting store is scan-pruned by the broadcast
  * rare-term join; df/dl/totals are small side tables (df is
  * vocab-sized — joined only against query-doc tokens, never the
  * posting file). Serving work per query batch is bounded by
  * |Q|·qTerms·df(rare) candidate rows.
  *
  * Reference behavior: the retrieval pillar of the brief (lexical
  * retrieval next to the vector index); arithmetic shared with
  * queries/Corpus.scala's doc_bm25_topk.
  */
object LexIndex {

  /** The shared whitespace tokenization (doc_top_tokens rule) folded
    * to the posting aggregate: (doc_id, token, tf) with map-side
    * partials — ONE explode pass over the corpus.
    */
  def postings(docs: DataFrame): DataFrame =
    // widen: tokenization is CPU-per-row work; a single small corpus
    // file is ONE scan task regardless of cores (bytes-gated — at
    // scale the scan fans out and widen is the identity)
    Par.widen(docs).select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Document frequencies from the posting aggregate (one row per
    * (doc, token) ⇒ per-token row count = distinct-doc count) —
    * map-side-combined, never a token window.
    */
  def dfOf(post: DataFrame): DataFrame =
    post.groupBy(col("token")).agg(count(lit(1)).as("df"))

  /** Document lengths: Σ tf per doc, derived from the DOCS relation so
    * every doc owns a row — a null/empty text tokenizes to no posting
    * rows (explode drops it) but still counts in n_corpus, and dl is
    * the membership roster compaction trusts ([[compactIndex]] derives
    * surviving n_corpus from it and targets segments through it). The
    * join is doc-count-sized (dl ≪ postings).
    */
  def dlOf(docs: DataFrame, post: DataFrame): DataFrame =
    docs.select(col("doc_id"))
      .join(post.groupBy(col("doc_id")).agg(sum(col("tf")).as("pdl")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("pdl"), lit(0L)).as("dl"))

  /** One-row corpus totals: document count and total token count. */
  def totalsOf(docs: DataFrame, post: DataFrame): DataFrame =
    docs.agg(count(lit(1)).as("n_corpus"))
      .crossJoin(post.agg(coalesce(sum(col("tf")), lit(0L)).as("t_total")))

  /** Rare-terms-first query-term selection: the `qTerms` LOWEST-df
    * tokens of each query doc, df attached. `queryPost` holds ONLY
    * the query docs' posting rows (doc_id, token[, …]) — the df join
    * touches that bounded relation, never the corpus posting file.
    */
  def queryTerms(queryPost: DataFrame, dfT: DataFrame,
      qTerms: Int): DataFrame =
    capQueryTerms(
      queryPost.select(col("doc_id"), col("token")).join(dfT, Seq("token")),
      qTerms)

  /** The rank-and-cap half of [[queryTerms]] for callers whose df
    * join already happened upstream (st_bm25_serve attaches df with a
    * stateless stream-static join; the cap is a ranking, so it runs
    * per micro-batch): input (doc_id, token, df).
    */
  def capQueryTerms(withDf: DataFrame, qTerms: Int): DataFrame =
    withDf.withColumn("qrn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("df"), col("token"))))
      .filter(col("qrn") <= qTerms)
      .select(col("doc_id").as("query_id"), col("token"), col("df"))

  /** BM25 scoring of `qterms` (query_id, token, df — broadcast)
    * against the posting table: candidates, exact-rational saturation
    * term, DECIMAL(28,15) contribution sums, ranking by the rounded
    * score. Output: (query_id, doc_id, n_terms, bm25, rank).
    */
  def scoreCandidates(qterms: DataFrame, post: DataFrame, dl: DataFrame,
      totals: DataFrame): DataFrame = {
    val cand = broadcast(qterms).join(post, Seq("token"))
      .filter(col("doc_id") =!= col("query_id"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(totals))
    val contrib =
      log((lit(2.0) * col("n_corpus") + lit(2.0)).cast(DoubleType) /
          (lit(2.0) * col("df") + lit(1.0)).cast(DoubleType)) *
        ((lit(44L) * col("t_total") * col("tf")).cast(DoubleType) /
          (lit(20L) * col("t_total") * col("tf") + lit(6L) * col("t_total")
            + lit(18L) * col("dl") * col("n_corpus")).cast(DoubleType))
    cand.withColumn("c", contrib)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        round(sum(col("c").cast(DecimalType(28, 15))).cast(DoubleType), 6)
          .as("bm25"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("bm25").desc, col("doc_id"))))
  }

  /** End-to-end ranked retrieval over index FRAMES (inline or
    * loaded): query docs selected by `queryPred` over the posting
    * table.
    */
  def bm25Ranked(post: DataFrame, dfT: DataFrame, dl: DataFrame,
      totals: DataFrame, queryPred: Column, qTerms: Int): DataFrame =
    scoreCandidates(queryTerms(post.filter(queryPred), dfT, qTerms),
      post, dl, totals)

  private val postingSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("token", StringType),
    StructField("tf", LongType)))
  private val dfSchema = StructType(Seq(
    StructField("token", StringType),
    StructField("df", LongType)))
  private val dlSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("dl", LongType)))
  private val totalsSchema = StructType(Seq(
    StructField("n_corpus", LongType),
    StructField("t_total", LongType)))
  private val tables = Seq("postings", "df", "dl", "totals")

  // ------------------------------------------------- segment plumbing

  private val shardRe = "^(shard\\d+)-(.*)$".r

  /** The segment a store file belongs to, parsed from its name:
    * `seg-a1-0.parquet` → `seg-a1` (batch append / compaction),
    * `ingest-3-0.parquet` → `ingest-3` (streaming ingest),
    * `shard0-part-….parquet` → `shard0/base` (merged shard slices —
    * recursive, so a merged shard's own appends keep their identity),
    * anything else → `base` (the build's own files).
    */
  private[graft] def segmentOf(name: String): String =
    if (name.startsWith("seg-")) "seg-" + name.split("-")(1)
    else if (name.startsWith("ingest-")) "ingest-" + name.split("-")(1)
    else name match {
      case shardRe(pfx, rest) => pfx + "/" + segmentOf(rest)
      case _ => "base"
    }

  /** Is a store file LIVE — i.e. committed? `seg-`/`ingest-` tagged
    * files need their marker; everything else (base build, merged
    * shard copies — the merge copies only live files) is live.
    */
  private[graft] def fileIsLive(name: String, segs: Set[String],
      ingests: Set[String]): Boolean =
    if (name.startsWith("seg-")) segs.contains(name.split("-")(1))
    else if (name.startsWith("ingest-")) ingests.contains(name.split("-")(1))
    else true

  private def markerSet(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Set[String] =
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).map(_.getPath.getName).toSet

  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The LIVE data files of one store table — one driver-side listing
    * (∝ file count: the LSM manifest read; a deployment amortizes it
    * into a manifest file instead of a listing).
    */
  private[graft] def liveFiles(spark: SparkSession, dir: String,
      table: String): Seq[org.apache.hadoop.fs.Path] = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(spark, dir)
    val t = new Path(s"$dir/$table")
    if (!fs.exists(t)) return Seq.empty
    val segs = markerSet(fs, new Path(s"$dir/_segments"))
    val ingests = markerSet(fs, new Path(s"$dir/_ingest_commits"))
    fs.listStatus(t).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet")
        && fileIsLive(p.getName, segs, ingests))
      .sortBy(_.toString).toSeq
  }

  private def schemaOf(table: String): StructType = table match {
    case "postings" => postingSchema
    case "df" => dfSchema
    case "dl" => dlSchema
    case _ => totalsSchema
  }

  private def emptyDf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)

  /** A store table as a DataFrame of its LIVE files only. Fast path:
    * a store that never saw a tagged write (no marker dirs) reads the
    * directory wholesale — no listing, no filtering.
    */
  private def readTable(spark: SparkSession, dir: String,
      table: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(spark, dir)
    val filtered = fs.exists(new Path(s"$dir/_segments")) ||
      fs.exists(new Path(s"$dir/_ingest_commits"))
    if (!filtered) spark.read.schema(schemaOf(table)).parquet(s"$dir/$table")
    else {
      val files = liveFiles(spark, dir, table)
      if (files.isEmpty) emptyDf(spark, schemaOf(table))
      else spark.read.schema(schemaOf(table)).parquet(files.map(_.toString): _*)
    }
  }

  /** One SEGMENT of a store table as a DataFrame — a file-list read of
    * just that segment's live files (segment-sized, never a store
    * scan: what the lifecycle manifests use to audit a delta without
    * re-reading the base).
    */
  private[graft] def segmentTable(spark: SparkSession, dir: String,
      table: String, segment: String): DataFrame = {
    val files = liveFiles(spark, dir, table)
      .filter(p => segmentOf(p.getName) == segment)
    if (files.isEmpty) emptyDf(spark, schemaOf(table))
    else spark.read.schema(schemaOf(table)).parquet(files.map(_.toString): _*)
  }

  /** The live segment inventory of a store table: segment →
    * file count (driver-side, ∝ file count — the fragmentation view
    * doc_lex_stats reports and the compaction scheduler watches).
    */
  private[graft] def segmentsOf(spark: SparkSession, dir: String,
      table: String): Map[String, Int] =
    liveFiles(spark, dir, table).groupBy(p => segmentOf(p.getName))
      .map { case (s, fs) => (s, fs.size) }

  /** Next unused id under `_segments` for a prefix ('a' = batch
    * append, 'c' = compaction): max numeric suffix + 1.
    */
  private def nextSegId(fs: org.apache.hadoop.fs.FileSystem, dir: String,
      prefix: String): String = {
    val re = s"^$prefix(\\d+)$$".r
    val used = markerSet(fs, new org.apache.hadoop.fs.Path(s"$dir/_segments"))
      .flatMap { case re(n) => Some(n.toLong); case _ => None }
    prefix + (if (used.isEmpty) 1L else used.max + 1L)
  }

  /** Scale-adaptive range-partition count for a token-sorted store
    * write: one partition per `graft.store.targetPartitionBytes`
    * (default 64 MB) of ESTIMATED source volume — Catalyst plan
    * statistics, which for parquet scans are the file-size sum, so no
    * job runs to size the write (guide §6: output files sized by
    * bytes, not by a core-count constant). A sandbox-scale corpus or
    * delta lands in ONE partition — which also skips the
    * RangePartitioner's sampling pass outright (numPartitions == 1
    * computes no bounds), removing one full Spark job per
    * token-sorted table write — while a 100 TB corpus derives
    * thousands of advisory-sized partitions from the same byte rule.
    * The serve path is file-count-agnostic: token-IN row-group
    * pruning holds per file at any partition count.
    */
  private[graft] def rangeParts(src: DataFrame): Int = {
    val bytes = src.queryExecution.optimizedPlan.stats.sizeInBytes
    // a source with NO size estimate (e.g. a foreachBatch micro-batch's
    // LogicalRDD) reports the defaultSizeInBytes sentinel — fall back
    // to the session's shuffle parallelism rather than trusting it
    if (bytes >= BigInt(Long.MaxValue) / 4)
      return src.sparkSession.sessionState.conf.numShufflePartitions
    val target = BigInt(src.sparkSession.conf
      .get("graft.store.targetPartitionBytes", (64L << 20).toString).toLong)
    ((bytes / target.max(1)) + 1).min(BigInt(1 << 20)).toInt
  }

  /** The token-sorted layout of one store table write: range
    * partitioning so each parquet file covers a tight token range
    * (the serve path's token-IN pushdown prunes at the SCAN — a
    * rare-term lookup reads a handful of row groups, never the
    * corpus-sized table), sorted within partitions for row-group-level
    * min/max stats.
    */
  private def tokenSorted(df: DataFrame, n: Int): DataFrame =
    df.repartitionByRange(n, col("token")).sortWithinPartitions(col("token"))

  /** Independent store-table writes of one publish run overlapped —
    * the derived aggregates of one build are independent jobs over
    * the already-materialized posting cache; serializing them
    * serializes their scheduling latency, which at delta scale IS
    * their cost (see [[Par.jobs]]).
    */
  private def inParallel(work: (() => Unit)*): Unit = Par.jobs(work: _*)

  /** Build and persist the lexical index: ONE corpus tokenization
    * pass, the three derived aggregates, four parquet tables. The
    * target dir is replaced wholesale (the encodeShard discipline —
    * destructive intent is total and explicit; a torn build is
    * recovered by rebuilding, so the base segment needs no marker).
    */
  def buildIndex(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true): Unit
    val post = postings(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = rangeParts(docs)
    try {
      // the postings write materializes the persisted aggregate …
      tokenSorted(post, n).write.parquet(s"$dir/postings")
      // … so the three derived aggregates are independent jobs over
      // the cache; overlap them (the vocab table keeps the same
      // token-sorted layout: the serve path's per-batch df attach
      // prunes it with the same token-IN)
      inParallel(
        () => tokenSorted(dfOf(post), n).write.parquet(s"$dir/df"),
        () => dlOf(docs, post).write.parquet(s"$dir/dl"),
        () => totalsOf(docs, post).write.parquet(s"$dir/totals"))
    } finally post.unpersist(): Unit
  }

  /** The serve path's posting access: a broadcast join alone does NOT
    * prune the posting SCAN (join keys don't push down), so a stored
    * lookup would read the whole table per query batch at 100 TB.
    * When the query-term set is small (the interactive case — it is
    * ≤ |Q|·qTerms by the rare-term cap), collect it (bounded,
    * driver-safe by the same argument as centroids/codebooks) and
    * push `token IN (…)` into the parquet scan, where the
    * token-range-sorted layout ([[buildIndex]]) turns it into
    * row-group pruning. Above `maxPushdownTerms` (a bulk replay of a
    * huge query batch) fall back to the full scan + broadcast join —
    * the honest shape when the lookup set itself is corpus-sized.
    *
    * NOTE: constructing this DataFrame runs a DRIVER-SIDE JOB (the
    * bounded term-set collect) — callers on a serving path pay it per
    * micro-batch, which is the intended trade (a small collect buys
    * row-group pruning of the corpus-sized store). [[serveStage]]
    * collects the term set ONCE and prunes both of its scans with it;
    * this entry point remains for callers holding a single scan.
    * `isInCollection` keeps the pushed predicate a set (Catalyst folds
    * large lists to InSet) rather than a 10k-literal In() tree.
    */
  def candidatePostings(post: DataFrame, qterms: DataFrame,
      maxPushdownTerms: Int = 10000): DataFrame = {
    val terms = qterms.select(col("token")).distinct()
      .limit(maxPushdownTerms + 1).collect().map(_.getString(0)).toSeq
    pruneByTokens(post, terms, terms.size > maxPushdownTerms)
  }

  /** Token-IN scan pruning with the two honest edges: an over-cap set
    * degrades to the full scan (broadcast join still bounds the
    * output), and an EMPTY set short-circuits to an empty relation —
    * an empty micro-batch must not broadcast the vocab table or feed
    * an unpruned corpus-wide posting relation into scoring.
    */
  private[graft] def pruneByTokens(table: DataFrame, terms: Seq[String],
      overCap: Boolean): DataFrame =
    if (overCap) table
    else if (terms.isEmpty) table.filter(lit(false))
    else table.filter(col("token").isInCollection(terms))

  /** Per-row tokenization of QUERY documents (doc_id, text) →
    * distinct (doc_id, token) rows — the serve-side twin of
    * [[postings]]: query-by-example scoring uses term PRESENCE +
    * rarity, never query-side tf, so split → array_distinct →
    * explode per row is the whole job (no aggregation ⇒ legal on a
    * streaming source too, which is exactly how st_bm25_serve and
    * st_hybrid_serve tokenize arriving requests).
    */
  def queryTokens(queryDocs: DataFrame): DataFrame =
    queryDocs.select(col("doc_id"),
      explode(array_distinct(split(lower(trim(col("text"))), "\\s+")))
        .as("token"))

  /** The ONE lexical serving stage — inline-built frames, the stored
    * batch path ([[bm25FromIndex]]) and the streaming serves
    * (st_bm25_serve / st_hybrid_serve's foreachBatch bodies) all run
    * exactly this function, so the paths cannot drift. `qtoks` is the
    * query token relation (doc_id, token); BOTH stored scans it
    * touches are token-IN pruned — by ONE driver-side collect of the
    * raw query-token set, reused for the vocab scan and the posting
    * scan (the capped rare-term set is a subset of the raw set, so
    * the superset pushdown is correct by construction; r14 paid a
    * second per-batch collect here). An empty batch short-circuits
    * both scans to empty relations. The rare-term cap is
    * localCheckpoint-ed once — it feeds the scoring broadcast, and
    * recomputing it would re-run the vocab prune.
    */
  def serveStage(loaded: Loaded, qtoks: DataFrame, qTerms: Int,
      maxPushdownTerms: Int = 10000): DataFrame = {
    val terms = qtoks.select(col("token")).distinct()
      .limit(maxPushdownTerms + 1).collect().map(_.getString(0)).toSeq
    val overCap = terms.size > maxPushdownTerms
    val withDf = qtoks
      .join(broadcast(pruneByTokens(loaded.df, terms, overCap)), Seq("token"))
    val qterms = capQueryTerms(withDf, qTerms).localCheckpoint(true)
    // candidates come from the LIVE views: a tombstoned doc is
    // unservable the moment its delete lands, before any compaction
    scoreCandidates(qterms,
      pruneByTokens(loaded.livePostings, terms, overCap),
      loaded.liveDl, loaded.totals)
  }

  /** The loaded artifact. `postings`/`dl` are the RAW stores (what
    * the lifecycle manifests audit); `livePostings`/`liveDl` are what
    * serving consumes — the stores minus pending tombstoned docs.
    * With no pending deletes the live views ARE the raw frames (no
    * join node is added), so deletion costs nothing until a delete
    * actually lands — the IvfPq.Loaded.live discipline. `df` and
    * `totals` are the SEGMENT-SUMMED views (an append lands additive
    * delta segments; summing per token / over segment rows
    * reconstructs exactly the monolithic aggregates because segment
    * doc sets are disjoint): corpus statistics, which — like the
    * vector index's frozen trained halves — do NOT move on delete
    * until compaction re-derives them (mass deletion drifting the
    * stats is the same retrain/compact trigger a deployment watches;
    * doc_lex_stats reports the drift fraction).
    */
  final case class Loaded(postings: DataFrame, df: DataFrame,
      dl: DataFrame, totals: DataFrame, livePostings: DataFrame,
      liveDl: DataFrame)

  /** Load a stored index: LIVE files only (committed segments — see
    * the segment header; a torn multi-table publish is invisible),
    * segment-summed df/totals views, tombstone-gated live views.
    */
  def loadIndex(spark: SparkSession, dir: String): Loaded = {
    val postings = readTable(spark, dir, "postings")
    val df = readTable(spark, dir, "df")
      .groupBy(col("token")).agg(sum(col("df")).as("df"))
    val dl = readTable(spark, dir, "dl")
    val totals = readTable(spark, dir, "totals")
      .agg(coalesce(sum(col("n_corpus")), lit(0L)).as("n_corpus"),
        coalesce(sum(col("t_total")), lit(0L)).as("t_total"))
    val tombPath = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    val fs = tombPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (livePostings, liveDl) =
      if (fs.exists(tombPath)) {
        val tombs = broadcast(tombstonesOf(spark, dir))
        (postings.join(tombs, Seq("doc_id"), "left_anti")
           .select(col("doc_id"), col("token"), col("tf")),
         dl.join(tombs, Seq("doc_id"), "left_anti")
           .select(col("doc_id"), col("dl")))
      } else (postings, dl)
    Loaded(postings, df, dl, totals, livePostings, liveDl)
  }

  /** Ranked retrieval from the STORED artifact for a batch of QUERY
    * DOCUMENTS (doc_id, text): tokenize the query text per row
    * ([[queryTokens]] — the caller supplies the text, the interactive
    * contract; the store is never scanned to recover a query's own
    * terms, which on the token-sorted layout would be an unpruned
    * full posting pass), then the shared [[serveStage]] against the
    * token-IN-pruned vocab and posting scans.
    */
  def bm25FromIndex(loaded: Loaded, queryDocs: DataFrame,
      qTerms: Int): DataFrame =
    serveStage(loaded, queryTokens(queryDocs), qTerms)

  // -------------------------------------------------------- lifecycle
  // A 100 TB corpus is never static, and a takedown cannot force a
  // corpus re-tokenize. Same discipline as the vector store (IvfPq
  // append/delete/compact), re-expressed for an inverted text index:
  //
  //  - APPEND (new documents): one delta-sized tokenization pass lands
  //    an ADDITIVE SEGMENT — delta posting files (each itself
  //    token-range sorted, so row-group pruning holds per segment),
  //    delta df/dl rows, a delta totals row — committed by its
  //    `_segments/<id>` marker strictly after all four tables are in
  //    place. Nothing existing is rewritten; loadIndex's
  //    segment-summed df/totals views make append ≡ build(base ∪
  //    delta) exactly (delta doc ids are NEW by contract — the IvfPq
  //    append contract).
  //  - DELETE (takedown): append doc ids to a side tombstone table;
  //    the store is untouched. Serving consumes the live views
  //    (broadcast anti-join), so a deleted doc is unservable the
  //    moment the delete lands. df/totals stay as-built until
  //    compaction (the statistics-drift rule — scores drop the doc
  //    as candidate immediately; its residual contribution to corpus
  //    statistics dies at the next compaction, exactly like quantizer
  //    drift on the vector side).
  //  - COMPACT — SEGMENT-LOCAL (tiered): segments are doc-disjoint by
  //    construction (the append contract; the property shard merge
  //    relies on), so a tombstoned doc lives in exactly one segment —
  //    compaction rewrites ONLY the segments holding tombstoned docs
  //    (discovered through the dl roster: one segment-file-attributed
  //    scan of the doc-count-sized dl table), folds their survivors
  //    into one new committed segment, and leaves every other
  //    segment's files BYTE-UNTOUCHED (doc_lex_compact_tiered proves
  //    that with a before/after content-hash manifest). Rewrite work
  //    is ∝ touched segments, not store size — the IvfPq cell-local
  //    bound on the text side. Statistics stay exact because the
  //    untouched segments' df/dl/totals rows had no tombstoned docs
  //    by definition, and the new segment's rows are re-derived from
  //    its survivors (n_corpus from the dl roster — null-text-safe).
  //
  // Durability (single concurrent compactor assumed): compaction
  // stages the rewritten segment (all four tables), writes a PLAN
  // (every publish rename and every old file to drop, by name), then
  // a `_complete` marker; a crash mid-stage restarts fresh (no
  // marker → staging discarded); a crash mid-publish resumes the
  // plan on the next compactIndex call (renames and drops are
  // name-deterministic and idempotent). Tombstones are cleared
  // strictly AFTER the publish, and NEVER on a resumed publish
  // (whether a late-landing tombstone made the snapshot is unknowable
  // then); re-applying an already-removed doc's tombstone is a no-op
  // anti-join, so deletes are never lost — at worst re-applied.
  //
  // Streaming-ingest fencing: a store carrying `_ingest_commits`
  // receipts is REFUSED by default (the mergeIndexes rule — an
  // ingest publish racing the compactor's drops would be erased while
  // its marker survives, permanently losing rows). Passing
  // `ingestFenced = true` asserts the stream is STOPPED for good;
  // compaction then folds every ingest segment into the rewrite and
  // clears the receipts — a store accepts at most ONE stream lifetime
  // between compactions, and the next stream starts a fresh
  // checkpoint (batchIds restart at 0 against cleared markers).

  /** Append NEW documents to a stored index as one additive committed
    * segment — one tokenization pass over the delta, delta-sized
    * writes only, CRASH-ATOMIC: the four tables stage under
    * `_append_staging`, publish renames them to deterministic
    * `seg-<id>-<n>` names, and the `_segments/<id>` marker lands
    * strictly last — a crash anywhere leaves the whole segment
    * invisible to [[loadIndex]] (never torn statistics), and the next
    * append call rolls the torn attempt back (batch appends are
    * transactional retry-by-caller; the STREAMING path
    * [[appendBatchToIndex]] instead resumes by batchId). `failAfter`
    * is the crash-window test seam: "stage-partial" dies between
    * table writes, "staged" after the staging completes, and
    * "publish-partial" between table publishes.
    */
  def appendToIndex(deltaDocs: DataFrame, dir: String,
      failAfter: String = ""): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = deltaDocs.sparkSession
    val fs = fsOf(spark, dir)
    rollbackTornAppend(fs, dir)
    val segId = nextSegId(fs, dir, "a")
    val staging = s"$dir/_append_staging/seg=$segId"
    val post = postings(deltaDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = rangeParts(deltaDocs)
    try {
      tokenSorted(post, n).write.mode("overwrite")
        .parquet(s"$staging/postings")
      tokenSorted(dfOf(post), n).write.mode("overwrite")
        .parquet(s"$staging/df")
      if (failAfter == "stage-partial") return
      // independent delta-sized jobs over the materialized cache —
      // overlapped (the crash seam above stays between table writes)
      inParallel(
        () => dlOf(deltaDocs, post).write.mode("overwrite")
          .parquet(s"$staging/dl"),
        () => totalsOf(deltaDocs, post).write.mode("overwrite")
          .parquet(s"$staging/totals"))
    } finally post.unpersist(): Unit
    fs.create(new Path(s"$dir/_append_staging/_complete")).close()
    if (failAfter == "staged") return
    // publish: activate liveness filtering BEFORE the first rename so
    // an in-flight segment can never be read
    fs.mkdirs(new Path(s"$dir/_segments")): Unit
    for (t <- tables) {
      val target = new Path(s"$dir/$t")
      if (!fs.exists(target)) fs.mkdirs(target): Unit
      fs.listStatus(new Path(s"$staging/$t")).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName).zipWithIndex
        .foreach { case (f, i) =>
          val dst = new Path(target, s"seg-$segId-$i.parquet")
          if (fs.exists(dst)) fs.delete(dst, false): Unit
          fs.rename(f, dst): Unit
        }
      if (failAfter == "publish-partial" && t == "postings") return
    }
    fs.create(new Path(s"$dir/_segments/$segId")).close() // the commit point
    fs.delete(new Path(s"$dir/_append_staging"), true): Unit
  }

  /** Roll back a torn batch append: purge any partially-published
    * (invisible) files of an UNCOMMITTED staged segment, then drop
    * the staging. A committed leftover (marker landed, staging
    * cleanup alone crashed) keeps its files.
    */
  private def rollbackTornAppend(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(s"$dir/_append_staging")
    if (!fs.exists(root)) return
    fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("seg=")).foreach { sd =>
        val segId = sd.getName.stripPrefix("seg=")
        if (!fs.exists(new Path(s"$dir/_segments/$segId")))
          tables.foreach { t =>
            val tp = new Path(s"$dir/$t")
            if (fs.exists(tp)) fs.listStatus(tp).map(_.getPath)
              .filter(_.getName.startsWith(s"seg-$segId-"))
              .foreach(p => fs.delete(p, false): Unit)
          }
      }
    fs.delete(root, true): Unit
  }

  /** Tombstone-delete documents from the stored index: appends the
    * ids to the side tombstone table; the store itself is untouched
    * (see the lifecycle header). Serving drops the docs immediately
    * via the live views; physical removal is [[compactIndex]]'s job.
    * A single-table append is job-atomic (the write commits or it
    * doesn't), so no staging protocol is needed here.
    */
  def deleteFromIndex(ids: DataFrame, dir: String): Unit =
    ids.select(col("doc_id").cast(LongType).as("doc_id"))
      .write.mode("append").parquet(s"$dir/tombstones")

  private val tombstoneSchema = StructType(Seq(StructField("doc_id", LongType)))

  /** The pending tombstone set — empty (not an error) when no delete
    * has landed since the last compaction.
    */
  def tombstonesOf(spark: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(tombstoneSchema).parquet(p.toString)
    else emptyDf(spark, tombstoneSchema)
  }

  /** The live segments whose dl roster holds any of `docIds` — the
    * touched-segment discovery of [[compactIndex]] and the
    * tombstone-attribution row of doc_lex_stats, as ONE
    * file-attributed scan of the doc-count-sized dl table (the
    * per-segment probe loop this replaces ran one join job per
    * segment). The collected set is bounded by the dl file count — a
    * manifest-sized read at deployment scale.
    */
  private[graft] def segmentsHolding(spark: SparkSession, dir: String,
      docIds: DataFrame): Set[String] = {
    val dlFiles = liveFiles(spark, dir, "dl")
    if (dlFiles.isEmpty) Set.empty
    else spark.read.schema(dlSchema).parquet(dlFiles.map(_.toString): _*)
      .withColumn("f", input_file_name())
      .join(broadcast(docIds), Seq("doc_id"), "left_semi")
      .select(col("f")).distinct().collect()
      .map(r => segmentOf(r.getString(0).split("/").last)).toSet
  }

  /** SEGMENT-LOCAL compaction (see the lifecycle header): discover
    * the segments holding tombstoned docs through the dl roster,
    * rewrite ONLY those (survivors folded into one new committed
    * segment, statistics re-derived from the segment's own rows),
    * drop the old segments' files, clear the tombstone snapshot.
    * Untouched segments' files are never opened for write — work is
    * ∝ touched segments, not store size. `failAfterStage` is the
    * crash-window test seam (stage + plan + marker land, publish does
    * not — the next call must resume the plan). `ingestFenced`
    * asserts no ingest stream is running and folds + clears the
    * stream's receipts (see the fencing note above); without it a
    * store carrying `_ingest_commits` is refused.
    */
  def compactIndex(spark: SparkSession, dir: String,
      failAfterStage: Boolean = false, ingestFenced: Boolean = false): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(spark, dir)
    val stage = new Path(s"$dir/_compact_staging")
    val marker = new Path(s"$dir/_compact_staging/_complete")
    if (fs.exists(marker)) {
      // a previous compaction crashed mid-publish: finish its plan;
      // do NOT clear tombstones (snapshot membership unknowable —
      // re-application is a no-op, loss would not be)
      publishCompaction(fs, dir, clearTombs = false)
      return
    }
    if (fs.exists(stage)) fs.delete(stage, true): Unit // crashed mid-stage
    val ingestMarkers = new Path(s"$dir/_ingest_commits")
    require(!fs.exists(ingestMarkers) || ingestFenced,
      s"compactIndex: store $dir carries _ingest_commits receipts - an " +
        "ingest stream may be live, and its publishes would race the " +
        "compactor's drops (rows erased, marker kept). Stop the stream " +
        "for good and pass ingestFenced = true to fold the stream's " +
        "segments and clear its receipts (one stream lifetime per " +
        "compaction cycle; the next stream needs a fresh checkpoint)")
    // snapshot the tombstone FILES now: only this set is applied and
    // cleared; a delete landing during compaction stays pending
    val tombPath = new Path(s"$dir/tombstones")
    val tombFiles: Seq[Path] =
      if (!fs.exists(tombPath)) Seq.empty
      else fs.listStatus(tombPath).filter(_.isFile).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).toSeq
    val tombs =
      if (tombFiles.isEmpty) emptyDf(spark, tombstoneSchema)
      else spark.read.schema(tombstoneSchema)
        .parquet(tombFiles.map(_.toString): _*)
    // touched segments: the dl roster rows of tombstoned docs,
    // attributed to their segment files ([[segmentsHolding]] — one
    // scan of the doc-count-sized dl table)
    val touchedBySnapshot: Set[String] =
      if (tombFiles.isEmpty) Set.empty
      else segmentsHolding(spark, dir, tombs)
    val fencedIngest: Set[String] =
      if (!ingestFenced) Set.empty
      else tables.flatMap(t => segmentsOf(spark, dir, t).keys)
        .filter(_.startsWith("ingest-")).toSet
    val touched = touchedBySnapshot ++ fencedIngest
    if (touched.isEmpty) {
      // nothing physical to rewrite: the snapshot's docs are in no
      // live segment (spurious or already-compacted deletes) — the
      // snapshot is trivially applied; clear it
      tombFiles.foreach(f => fs.delete(f, false): Unit)
      if (fs.exists(tombPath) &&
          !fs.listStatus(tombPath).exists(_.getPath.getName.endsWith(".parquet")))
        fs.delete(tombPath, true): Unit
      if (ingestFenced && fs.exists(ingestMarkers))
        fs.delete(ingestMarkers, true): Unit
      return
    }
    val newId = nextSegId(fs, dir, "c")
    val touchedFiles: Map[String, Seq[Path]] = tables.map(t =>
      t -> liveFiles(spark, dir, t)
        .filter(p => touched(segmentOf(p.getName)))).toMap
    def readTouched(t: String): DataFrame = {
      val files = touchedFiles(t)
      if (files.isEmpty) emptyDf(spark, schemaOf(t))
      else spark.read.schema(schemaOf(t)).parquet(files.map(_.toString): _*)
    }
    // stage the rewritten segment: survivors of the touched segments
    // only — every other segment's files are never opened. The
    // touched postings and dl stages are independent (overlapped);
    // df/totals derive from the STAGED files (self-verifying read-
    // back), so they wait, then overlap each other.
    val touchedPost = readTouched("postings")
    val n = rangeParts(touchedPost)
    inParallel(
      () => tokenSorted(
          touchedPost.join(broadcast(tombs), Seq("doc_id"), "left_anti"), n)
        .write.parquet(s"$dir/_compact_staging/postings"),
      () => readTouched("dl").join(broadcast(tombs), Seq("doc_id"), "left_anti")
        .write.parquet(s"$dir/_compact_staging/dl"))
    val sp = spark.read.schema(postingSchema)
      .parquet(s"$dir/_compact_staging/postings")
    // surviving totals from the dl ROSTER (null-text-safe: a doc with
    // no postings still owns a dl row) + the staged survivors' tf sum
    val sdl = spark.read.schema(dlSchema).parquet(s"$dir/_compact_staging/dl")
    inParallel(
      () => tokenSorted(dfOf(sp), n)
        .write.parquet(s"$dir/_compact_staging/df"),
      () => sdl.agg(count(lit(1)).as("n_corpus"))
        .crossJoin(sp.agg(coalesce(sum(col("tf")), lit(0L)).as("t_total")))
        .write.parquet(s"$dir/_compact_staging/totals"))
    // the PLAN: every publish rename and every drop, by name — what a
    // resumed publish replays idempotently
    val plan = new StringBuilder
    for (t <- tables) {
      fs.listStatus(new Path(s"$dir/_compact_staging/$t")).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName).zipWithIndex
        .foreach { case (f, i) =>
          plan.append(s"pub:$t/${f.getName}:seg-$newId-$i.parquet\n"): Unit
        }
      touchedFiles(t).foreach(p => plan.append(s"drop:$t/${p.getName}\n"): Unit)
    }
    plan.append(s"commit:$newId\n"): Unit
    touched.foreach { s =>
      if (s.startsWith("seg-"))
        plan.append(s"dropmark:_segments/${s.stripPrefix("seg-")}\n"): Unit
      if (s.startsWith("ingest-"))
        plan.append(
          s"dropmark:_ingest_commits/${s.stripPrefix("ingest-")}\n"): Unit
    }
    if (ingestFenced) plan.append("fence:_ingest_commits\n"): Unit
    tombFiles.foreach(p => plan.append(s"tomb:${p.getName}\n"): Unit)
    val out = fs.create(new Path(s"$dir/_compact_staging/_plan"))
    out.write(plan.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    fs.create(marker).close()
    if (failAfterStage) return
    publishCompaction(fs, dir, clearTombs = true)
  }

  /** Replay the staged compaction plan: renames in (invisible until
    * the commit marker), old files and markers dropped, the new
    * segment committed, snapshot tombstones cleared (never on a
    * resume), staging removed. Every step is name-deterministic and
    * idempotent. The brief reader-visible window (old files dropped,
    * new marker not yet landed) is the documented single-compactor /
    * no-concurrent-reader publish window the r13 design carried too.
    */
  private def publishCompaction(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, clearTombs: Boolean): Unit = {
    import org.apache.hadoop.fs.Path
    val planPath = new Path(s"$dir/_compact_staging/_plan")
    val in = fs.open(planPath)
    val planText = new String(
      org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8)
    in.close()
    val lines = planText.split("\n").filter(_.nonEmpty).toSeq
    fs.mkdirs(new Path(s"$dir/_segments")): Unit
    // 1. renames in (files stay invisible: no marker yet)
    lines.filter(_.startsWith("pub:")).foreach { l =>
      val Array(tableAndSrc, dstName) = l.stripPrefix("pub:").split(":")
      val Array(t, srcName) = tableAndSrc.split("/")
      val src = new Path(s"$dir/_compact_staging/$t/$srcName")
      if (fs.exists(src)) {
        val target = new Path(s"$dir/$t")
        if (!fs.exists(target)) fs.mkdirs(target): Unit
        val dst = new Path(target, dstName)
        if (fs.exists(dst)) fs.delete(dst, false): Unit
        fs.rename(src, dst): Unit
      }
    }
    // 2. drop the rewritten segments' old files and markers
    lines.filter(_.startsWith("drop:")).foreach { l =>
      val p = new Path(s"$dir/${l.stripPrefix("drop:")}")
      if (fs.exists(p)) fs.delete(p, false): Unit
    }
    lines.filter(_.startsWith("dropmark:")).foreach { l =>
      val p = new Path(s"$dir/${l.stripPrefix("dropmark:")}")
      if (fs.exists(p)) fs.delete(p, false): Unit
    }
    // 3. commit the new segment
    lines.filter(_.startsWith("commit:")).foreach { l =>
      fs.create(new Path(s"$dir/_segments/${l.stripPrefix("commit:")}"),
        true).close()
    }
    // 4. stream fence: the folded stream's receipts die with it
    if (lines.exists(_.startsWith("fence:"))) {
      val p = new Path(s"$dir/_ingest_commits")
      if (fs.exists(p)) fs.delete(p, true): Unit
    }
    // 5. snapshot tombstones — strictly after every publish step, and
    // NEVER on a resumed publish
    if (clearTombs) {
      lines.filter(_.startsWith("tomb:")).foreach { l =>
        val p = new Path(s"$dir/tombstones/${l.stripPrefix("tomb:")}")
        if (fs.exists(p)) fs.delete(p, false): Unit
      }
      val tombPath = new Path(s"$dir/tombstones")
      if (fs.exists(tombPath) &&
          !fs.listStatus(tombPath).exists(_.getPath.getName.endsWith(".parquet")))
        fs.delete(tombPath, true): Unit
    }
    fs.delete(new Path(s"$dir/_compact_staging"), true): Unit
  }

  /** Merge self-contained shard stores into one serving artifact —
    * how a 100 TB corpus is ACTUALLY tokenized: no single job runs
    * the full corpus pass; each shard job builds an independent store
    * over its doc slice ([[buildIndex]] — there are no trained halves
    * on the lexical side, so unlike IvfPq.mergeIndexes nothing needs
    * cross-shard equality verification), and the merge is FILE-LEVEL:
    * every shard's LIVE segment files (committed segments only — a
    * shard's torn append garbage never crosses the merge) land
    * shard-tagged under the output tables — no decode, no shuffle, no
    * row ever read (cost ∝ file count). Correct because the store is
    * ADDITIVE SEGMENTS by design: postings/dl rows are doc-disjoint
    * across shards and loadIndex's segment-summed df/totals views
    * reconstruct the monolithic aggregates exactly — merge(shards) ≡
    * build(corpus) row for row (LexIndexSpec pins it; the
    * doc_lex_shard_merge oracle hash-proves it end to end). Pending
    * shard tombstones union the same way, so deletes landed against a
    * shard survive the merge. Refused: a shard carrying
    * streaming-ingest receipts (per-stream batchIds cannot merge
    * meaningfully) or a staged compaction (the shard is mid-rewrite —
    * indeterminate).
    *
    * The copy itself is the sandbox stand-in for a same-filesystem
    * rename or an object-store server-side copy (the merge must not
    * consume its input shards, so a local rename is not an option
    * here); it runs on a bounded driver thread pool — at real segment
    * counts (10⁵–10⁶ files) the per-file round trips dominate the
    * merge, so the pool width, not the byte volume, is the cost knob.
    */
  def mergeIndexes(spark: SparkSession, shardDirs: Seq[String],
      outDir: String, copyThreads: Int = 8): Unit = {
    require(shardDirs.nonEmpty, "mergeIndexes: no shards")
    import org.apache.hadoop.fs.{FileUtil, Path}
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(outDir).getFileSystem(conf)
    shardDirs.foreach { d =>
      require(!fs.exists(new Path(s"$d/_ingest_commits")),
        s"mergeIndexes: shard $d carries _ingest_commits receipts - " +
          "it is a serving store, not a build shard; compact its ingest " +
          "into a fresh build before merging")
      require(!fs.exists(new Path(s"$d/_compact_staging")),
        s"mergeIndexes: shard $d carries a staged compaction - finish " +
          "or discard it (compactIndex) before merging")
    }
    val out = new Path(outDir)
    if (fs.exists(out)) fs.delete(out, true): Unit
    // the four tables always exist in the output (explicit-schema
    // reads of an existing empty dir yield empty relations — the
    // empty-corpus totality rule); tombstones only if a shard has any
    tables.foreach(t => fs.mkdirs(new Path(s"$outDir/$t")): Unit)
    val copies: Seq[(Path, Path)] = shardDirs.zipWithIndex.flatMap {
      case (d, i) =>
        val data = tables.flatMap { t =>
          liveFiles(spark, d, t)
            .map(f => (f, new Path(s"$outDir/$t", s"shard$i-${f.getName}")))
        }
        val tomb = new Path(s"$d/tombstones")
        val tombs =
          if (!fs.exists(tomb)) Seq.empty
          else fs.listStatus(tomb).map(_.getPath)
            .filter(_.getName.endsWith(".parquet"))
            .map(f =>
              (f, new Path(s"$outDir/tombstones", s"shard$i-${f.getName}")))
            .toSeq
        data ++ tombs
    }
    if (copies.exists(_._2.toString.contains("/tombstones/")))
      fs.mkdirs(new Path(s"$outDir/tombstones")): Unit
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(copyThreads, copies.size max 1)))
    try {
      val futures = copies.map { case (src, dst) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit =
            FileUtil.copy(fs, src, fs, dst, false, conf): Unit
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()
  }

  /** [[appendToIndex]] for STREAMING ingest — idempotent under
    * micro-batch retry (IvfPq.appendBatchToIndex's exact protocol):
    * a commit marker short-circuits replayed batches; the delta
    * tables stage under a batchId-keyed scratch dir with overwrite;
    * publish renames staged files to DETERMINISTIC batchId-keyed
    * names inside the store tables, deleting any partial publish of
    * this batch first; the marker lands last — and liveness filtering
    * is activated before the first rename, so a torn publish is
    * INVISIBLE to readers until its retry completes it. Frozen
    * tokenization is deterministic per row, so a full replay
    * reproduces identical bytes. Work and writes stay delta-sized.
    */
  def appendBatchToIndex(batch: DataFrame, dir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    import org.apache.hadoop.fs.Path
    val fs = fsOf(spark, dir)
    val marker = new Path(s"$dir/_ingest_commits/$batchId")
    if (fs.exists(marker)) return
    val staging = s"$dir/_staging/batch=$batchId"
    val post = postings(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = rangeParts(batch)
    try {
      tokenSorted(post, n).write.mode("overwrite")
        .parquet(s"$staging/postings")
      // batch-sized independent jobs over the materialized cache
      inParallel(
        () => tokenSorted(dfOf(post), n).write.mode("overwrite")
          .parquet(s"$staging/df"),
        () => dlOf(batch, post).write.mode("overwrite")
          .parquet(s"$staging/dl"),
        () => totalsOf(batch, post).write.mode("overwrite")
          .parquet(s"$staging/totals"))
    } finally post.unpersist(): Unit
    // an in-flight (unmarked) ingest segment must never be readable:
    // the marker DIR activates loadIndex's liveness filtering before
    // the first rename lands
    fs.mkdirs(marker.getParent): Unit
    tables.foreach { t =>
      val target = new Path(s"$dir/$t")
      if (!fs.exists(target)) fs.mkdirs(target): Unit
      // clear any partial publish of THIS batch before re-publishing
      fs.listStatus(target).map(_.getPath)
        .filter(_.getName.startsWith(s"ingest-$batchId-"))
        .foreach(p => fs.delete(p, false): Unit)
      val stagedDir = new Path(s"$staging/$t")
      fs.listStatus(stagedDir).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName).zipWithIndex
        .foreach { case (f, i) =>
          fs.rename(f, new Path(target, s"ingest-$batchId-$i.parquet")): Unit
        }
    }
    fs.delete(new Path(staging), true)
    fs.create(marker).close()
  }
}
