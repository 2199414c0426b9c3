package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.build._
import graft.ingest._
import graft.query._

class StoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def docs() = {
    val corpus = Corpus.fromDocumentsTable(spark, sfDir)
    DocIds.assign(spark, corpus, partitions = 4)
  }

  private def segKey(s: Segment): (Int, Int) = (s.termId, s.shard)

  test("resumable build: partial build resumes byte-identically") {
    val dirFull = java.nio.file.Files.createTempDirectory("graft-full").toString
    val dirPart = java.nio.file.Files.createTempDirectory("graft-part").toString
    val shardSize = 64L

    // one-shot build
    val full = IndexStore.buildResumable(spark, docs(), "block_optpfor",
                                         shardSize, dirFull, 4)
    val fullSegs = full.segments.collect().map(s => segKey(s) -> s).toMap

    // two-stage build: first only shards {0,1,2} (simulate a killed run by
    // building a filtered subset, writing manifests for what finished)
    val idxPartial = IndexBuilder.build(spark, docs(), "block_optpfor",
                                        shardSize, 4, Some(Set(0, 1, 2)))
    idxPartial.segments.write.mode("append").partitionBy("shard")
      .parquet(s"$dirPart/segments")
    idxPartial.norms.filter(n => Set(0, 1, 2).contains(n.shard))
      .write.mode("append").partitionBy("shard").parquet(s"$dirPart/norms")
    for (s <- Seq(0, 1, 2)) {
      val m = s"""{"shard": $s, "segments": 1, "postings": 1, "occ": 1, "bytes": 1, "inputDocs": 64, "wallMillis": 0, "indexType": "block_optpfor", "builtAtEpochMs": 0, "attempt": "partial", "formatVersion": ${IndexStore.FormatVersion}}"""
      val p = new java.io.File(s"$dirPart/manifests"); p.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dirPart/manifests/shard-$s.json"), m)
    }
    assert(IndexStore.validShards(spark, dirPart) == Set(0, 1, 2))

    // a manifest from an older byte-format version must not count as
    // done (its bytes would decode as garbage under current code) —
    // resume below then rebuilds shard 2, still byte-identically
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dirPart/manifests/shard-2.json"),
      """{"shard": 2, "segments": 1, "postings": 1, "occ": 1, "bytes": 1, "inputDocs": 64, "wallMillis": 0, "indexType": "block_optpfor", "builtAtEpochMs": 0, "attempt": "partial", "formatVersion": 1}""")
    assert(IndexStore.validShards(spark, dirPart) == Set(0, 1))
    assert(IndexStore.validShards(spark, dirPart, Some("ef")).isEmpty)

    // resume: should build only the remaining shards
    val resumed = IndexStore.buildResumable(spark, docs(), "block_optpfor",
                                            shardSize, dirPart, 4)
    val resumedSegs = resumed.segments.collect().map(s => segKey(s) -> s).toMap
    assert(resumedSegs.keySet == fullSegs.keySet)
    for ((k, s) <- resumedSegs) {
      assert(java.util.Arrays.equals(s.bytes, fullSegs(k).bytes),
             s"segment $k bytes differ after resume")
      assert(s.blockMaxScores.toSeq == fullSegs(k).blockMaxScores.toSeq)
    }
    assert(IndexStore.validShards(spark, dirPart) ==
           IndexStore.validShards(spark, dirFull))
  }

  test("store round-trip: written index answers like the in-memory one") {
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString
    val idx = IndexStore.buildResumable(spark, docs(), "block_optpfor",
                                        1L << 20, dir, 4)
    val queries = Seq(Query(0, Array("join", "hash")),
                      Query(1, Array("the", "a")),
                      Query(2, Array("dup")))
    val direct = IndexBuilder.build(spark, docs(), "block_optpfor", 1L << 20, 4)
    val a = Engine.topK(spark, idx, queries, "wand", 10).collect()
      .sortBy(h => (h.queryId, h.rank)).map(h => (h.queryId, h.docId, h.score)).toSeq
    val b = Engine.topK(spark, direct, queries, "wand", 10).collect()
      .sortBy(h => (h.queryId, h.rank)).map(h => (h.queryId, h.docId, h.score)).toSeq
    assert(a == b)
    assert(idx.meta.numPostings > 0)
  }

  test("hierarchical merge == direct coarse build, byte-identical") {
    val fine = IndexBuilder.build(spark, docs(), "block_optpfor", 64L, 4)
    val merged = Merge.mergeShards(spark, fine, 16384) // -> shardSize 2^20
    val direct = IndexBuilder.build(spark, docs(), "block_optpfor", 64L * 16384, 4)
    val a = merged.segments.collect().map(s => segKey(s) -> s).toMap
    val b = direct.segments.collect().map(s => segKey(s) -> s).toMap
    assert(a.keySet == b.keySet)
    for ((k, s) <- a) {
      assert(java.util.Arrays.equals(s.bytes, b(k).bytes), s"bytes differ at $k")
      assert(s.blockMaxScores.toSeq == b(k).blockMaxScores.toSeq, s"blockmax $k")
    }
    // merged norms identical too
    val na = merged.norms.collect().map(n => n.shard -> n.norms.toSeq).toMap
    val nb = direct.norms.collect().map(n => n.shard -> n.norms.toSeq).toMap
    assert(na == nb)
  }
}
