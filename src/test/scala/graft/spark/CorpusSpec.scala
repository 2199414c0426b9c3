package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest._

/** The input-hint invariant: extracted text per url is byte-identical
  * across runs AND across parallelism levels (the per-doc seeded
  * generator makes partitioning irrelevant). */
class CorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("synthetic corpus is byte-identical across partition counts") {
    val a = Corpus.synthetic(spark, 2000, partitions = 3).collect()
      .map(d => d.url -> d.text).toMap
    val b = Corpus.synthetic(spark, 2000, partitions = 16).collect()
      .map(d => d.url -> d.text).toMap
    assert(a == b)
    // html carries the text (the v1 extraction ground-truth contract)
    val c = Corpus.synthetic(spark, 50, partitions = 2).collect()
    c.foreach { d =>
      assert(new String(d.html, "UTF-8") == s"<html><body>${d.text}</body></html>")
      assert(d.lang == "en")
    }
  }

  test("docID assignment is stable across parallelism") {
    val c1 = Corpus.synthetic(spark, 1500, partitions = 2)
    val c2 = Corpus.synthetic(spark, 1500, partitions = 11)
    val a = DocIds.assign(spark, c1, partitions = 3).collect()
      .map(d => d.url -> d.docId).toMap
    val b = DocIds.assign(spark, c2, partitions = 13).collect()
      .map(d => d.url -> d.docId).toMap
    assert(a == b)
    // dense 0..n-1 in url order
    val sorted = a.toSeq.sortBy(_._1).map(_._2)
    assert(sorted == (0L until 1500L))
  }

  test("dictionary termIDs are dense in lexicographic order") {
    val corpus = Corpus.fromDocumentsTable(spark, "/root/testdata/sf0.001")
    val docs = DocIds.assign(spark, corpus, 4)
    val idx = graft.build.IndexBuilder.build(spark, docs, "block_optpfor",
                                             1L << 20, 4)
    val dict = idx.dict.collect().sortBy(_.termId)
    assert(dict.map(_.termId).toSeq == dict.indices.toSeq)
    assert(dict.map(_.term).toSeq == dict.map(_.term).sorted.toSeq)
  }
}
