package graft.operators

import org.apache.spark.sql.SparkSession

/** Session-keyed scratch directories for persisted store artifacts
  * (lexical index, vector index, request feeds): paths are keyed by
  * (dataset, applicationId) so two JVMs sharing /tmp on the same
  * dataset each get their own store — one session's wholesale
  * delete-and-rebuild can never race another session's open parquet
  * readers (within a session the queries run sequentially and every
  * build is deterministic). A JVM shutdown hook reclaims the per-app
  * dirs on clean exit — at sf10 a store is GBs, and without the hook
  * every bench/verify JVM would leave its own copy behind.
  */
object Scratch {

  private val cleanup =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** `/tmp/<prefix>_<dataset>_<applicationId>` with exit-time
    * reclamation, registered once per distinct dir.
    */
  def sessionDir(prefix: String, spark: SparkSession,
      sfDir: String): String = {
    val dir = s"${System.getProperty("java.io.tmpdir", "/tmp")}/${prefix}_" +
      sfDir.replaceAll("[^A-Za-z0-9._-]", "_") +
      "_" + spark.sparkContext.applicationId
    if (cleanup.add(dir))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rec(f: java.io.File): Unit = {
          val cs = f.listFiles(); if (cs != null) cs.foreach(rec)
          f.delete(): Unit
        }
        rec(new java.io.File(dir))
      }))
    dir
  }
}
