package graft.operators

/** Overlap INDEPENDENT Spark actions from a bounded driver pool
  * (optimization guide §2.6: actions are only sequential because the
  * driver calls them sequentially; scheduling independent jobs
  * together lets the next job's tasks back-fill executors freed by
  * the current job's tail — and at delta scale, where each job is a
  * handful of tasks, it collapses the serialized per-job scheduling
  * latency that otherwise IS the cost). Used for the independent
  * table writes of one store publish and for independent store
  * builds inside one composite lifecycle query. Exceptions propagate
  * to the caller (first failure wins, the pool is drained).
  */
object Par {

  /** Widen a CPU-heavy stage's input when the upstream layout would
    * starve it of parallelism — a single small-file scan (one parquet
    * file = one task regardless of cores) or a byte-coalesced tiny
    * shuffle/cache (AQE sizes partitions by bytes; per-row compute
    * cost is invisible to it). Applies an explicit round-robin
    * repartition to `defaultParallelism` ONLY when the estimated
    * input is small enough that the extra exchange is trivial
    * (bytes < parallelism × `graft.compute.widenTargetBytes`,
    * default 64 MB — i.e. the upstream could not have fanned out to
    * a partition per core at the advisory size anyway); above the
    * gate, and for sources with no size estimate, this is the
    * identity — a 100 TB scan already fans out and must NOT be
    * reshuffled for parallelism (guide §2.5 input-starvation remedy,
    * gated so it can never become an at-scale shuffle).
    */
  def widen(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    if (df.isStreaming) return df // no batch plan to size; see widenStream
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes >= BigInt(Long.MaxValue) / 4) return df // no estimate
    val target = BigInt(spark.conf
      .get("graft.compute.widenTargetBytes", (64L << 20).toString).toLong)
    if (bytes >= target.max(1) * cores) df
    else df.repartition(cores)
  }

  /** [[widen]] for STREAMING inputs, where no size estimate exists at
    * plan time: an unconditional round-robin repartition to
    * defaultParallelism applied per micro-batch, placed BEFORE a
    * CPU-per-row stage so the arrival batch's compute fans out
    * instead of pipelining into the source scan's task count (a
    * single-file replay source is ONE task per batch). Production
    * shape: total cores is the right fan-out for per-arrival
    * enrichment compute at any scale — arrival batches are bounded by
    * the trigger, not by corpus size, and the exchange carries one
    * bounded batch.
    */
  def widenStream(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  def jobs(work: (() => Unit)*): Unit = {
    if (work.size <= 1) { work.foreach(_()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(work.size)
    try {
      val fs = work.map(w => pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = w()
      }))
      fs.foreach(_.get())
    } finally pool.shutdown()
  }
}
