package graft

/** Zero-row total-function sweep: every batch query must run to
  * completion (typically to an empty result) on schema-correct but
  * EMPTY tables. At 100 TB this is the "selective filter upstream
  * matched nothing" / "new partition not yet populated" case — a
  * pipeline stage that crashes on an empty input kills the whole job
  * for a state of the world that is routine, not exceptional.
  * Streaming + polling entries are excluded: their harnesses block on
  * data availability by design and are exercised by StreamingSpec /
  * PollingSpec with explicit feeds.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_empty_" +
      java.util.UUID.randomUUID.toString.take(8)
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    names.foreach { n =>
      Tables.table(spark, sf, n).limit(0).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    // events goes through its loader so ts is already micros-typed
    Tables.events(spark, sf).limit(0).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("every batch query is total over zero-row tables") {
    val batch = SparkEntry.queries.keys
      .filterNot(n => n.startsWith("st_") || n == "qan_poll_delta")
      .toSeq.sorted
    val failures = batch.flatMap { name =>
      try { SparkEntry.queries(name)(spark, emptyDir).collect(); None }
      catch { case e: Throwable => Some(s"$name: ${e.toString.take(200)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
