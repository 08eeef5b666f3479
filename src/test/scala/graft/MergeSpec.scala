package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.operators.{AnnPq, IvfPq}

/** Distributed index build (train-once → shard-encode → file-level
  * merge): merged == monolithic bit for bit in BOTH regimes,
  * mismatched trained halves refused, shard tombstones survive the
  * merge.
  */
class MergeSpec extends SparkSpec {

  private def corpus(): DataFrame =
    Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"),
        col("embedding").cast(ArrayType(DoubleType)).as("v"))

  private def tmp(tag: String): String =
    s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_merge_${tag}_" +
      java.util.UUID.randomUUID.toString.take(8)

  private def storeRows(dir: String): Set[(Long, Seq[Int], Int)] =
    IvfPq.loadIndex(spark, dir).inverted.collect()
      .map(r => (r.getLong(1), r.getSeq[Int](2).toList: Seq[Int], r.getInt(0)))
      .toSet

  private def buildMerged(oneLevelMax: Long, tag: String): (String, String) = {
    val c = corpus().persist()
    val n = c.count()
    val index = IvfPq.indexAuto(c, n, dim = 64, oneLevelMax = oneLevelMax)
    val books = AnnPq.collectCodebooks(
      AnnPq.refinedCodebooks(c, 16, 4, 64), 16)
    val (dirA, dirB, dirM, dirMono) =
      (tmp(s"${tag}_a"), tmp(s"${tag}_b"), tmp(s"${tag}_m"), tmp(s"${tag}_mono"))
    IvfPq.encodeShard(index, books, 4, c.filter(col("id") % 2 === 0), dirA)
    IvfPq.encodeShard(index, books, 4, c.filter(col("id") % 2 === 1), dirB)
    IvfPq.mergeIndexes(spark, Seq(dirA, dirB), dirM)
    IvfPq.buildIndex(c, n, dim = 64, m = 16, dsub = 4, kCodes = 64,
      dir = dirMono, oneLevelMax = oneLevelMax)
    c.unpersist()
    (dirM, dirMono)
  }

  test("merged shards == monolithic build, one-level regime") {
    val (m, mono) = buildMerged(graft.operators.AnnIvf.OneLevelMaxVectors, "one")
    assert(storeRows(m) == storeRows(mono))
    assert(storeRows(m).nonEmpty)
  }

  test("merged shards == monolithic build, FORCED two-level regime") {
    val (m, mono) = buildMerged(-1L, "two")
    // the merged store must load as two-level (trained halves carried)
    IvfPq.loadIndex(spark, m).index match {
      case IvfPq.TwoLevelIndexW(_, _) => ()
      case other => fail(s"merged store loaded as $other")
    }
    assert(storeRows(m) == storeRows(mono))
    assert(storeRows(m).nonEmpty)
  }

  test("mismatched trained halves are refused") {
    val c = corpus().persist()
    val n = c.count()
    val books = AnnPq.collectCodebooks(
      AnnPq.refinedCodebooks(c, 16, 4, 64), 16)
    val idxFull = IvfPq.indexAuto(c, n, dim = 64)
    // a DIFFERENT training corpus → different centroids
    val half = c.filter(col("id") % 2 === 0)
    val idxHalf = IvfPq.indexAuto(half, half.count(), dim = 64)
    val (dirA, dirB) = (tmp("mm_a"), tmp("mm_b"))
    IvfPq.encodeShard(idxFull, books, 4, c.filter(col("id") % 2 === 0), dirA)
    IvfPq.encodeShard(idxHalf, books, 4, c.filter(col("id") % 2 === 1), dirB)
    val e = intercept[IllegalArgumentException] {
      IvfPq.mergeIndexes(spark, Seq(dirA, dirB), tmp("mm_m"))
    }
    assert(e.getMessage.contains("trained table"))
    c.unpersist()
  }

  test("pending shard tombstones survive the merge") {
    val c = corpus().persist()
    val n = c.count()
    val index = IvfPq.indexAuto(c, n, dim = 64)
    val books = AnnPq.collectCodebooks(
      AnnPq.refinedCodebooks(c, 16, 4, 64), 16)
    val (dirA, dirB, dirM) = (tmp("tb_a"), tmp("tb_b"), tmp("tb_m"))
    IvfPq.encodeShard(index, books, 4, c.filter(col("id") % 2 === 0), dirA)
    IvfPq.encodeShard(index, books, 4, c.filter(col("id") % 2 === 1), dirB)
    // a delete lands against shard A before the merge
    val victim = c.filter(col("id") % 2 === 0).select(col("id")).limit(1)
    val victimId = victim.collect().head.getLong(0)
    IvfPq.deleteFromIndex(victim, dirA)
    IvfPq.mergeIndexes(spark, Seq(dirA, dirB), dirM)
    val merged = IvfPq.loadIndex(spark, dirM)
    assert(merged.inverted.filter(col("id") === victimId).count() == 1,
      "raw store keeps the row until compaction")
    assert(merged.live.filter(col("id") === victimId).count() == 0,
      "the shard's pending tombstone must gate the merged live view")
    c.unpersist()
  }
}
