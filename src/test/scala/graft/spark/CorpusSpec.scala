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

  test("docID assignment: duplicate urls stay dense and deterministic") {
    import spark.implicits._
    // 3 copies of 400 urls: ids must be dense 0..1199 and each url must
    // own exactly the contiguous id run at its rank — which pins the
    // url -> id-set mapping regardless of partitioning (the (url, pid,
    // pos) total sort order additionally pins WHICH copy gets which id)
    def dupCorpus(parts: Int) = {
      val base = Corpus.synthetic(spark, 400, partitions = parts).collect()
      spark.createDataset(
        (0 until 3).flatMap(_ => base)).repartition(parts)
    }
    val a = DocIds.assign(spark, dupCorpus(3), partitions = 4).collect()
    val ids = a.map(_.docId).sorted.toSeq
    assert(ids == (0L until 1200L))
    val byUrl = a.groupBy(_.url).view.mapValues(_.map(_.docId).sorted.toSeq)
    val urlsSorted = byUrl.keys.toSeq.sorted
    urlsSorted.zipWithIndex.foreach { case (u, rank) =>
      assert(byUrl(u) == (rank * 3L until rank * 3L + 3),
             s"url $u (rank $rank) ids ${byUrl(u)}")
    }
  }

  test("docID assignment: degenerate partitioning (1 doc, many partitions)") {
    val one = Corpus.synthetic(spark, 1, partitions = 1)
    val a = DocIds.assign(spark, one, partitions = 8).collect()
    assert(a.length == 1 && a.head.docId == 0L)
    // more partitions than distinct sampled urls
    val few = Corpus.synthetic(spark, 5, partitions = 2)
    val b = DocIds.assign(spark, few, partitions = 32).collect()
    assert(b.map(_.docId).sorted.toSeq == (0L until 5L))
  }

  test("UrlRangePartitioner routes keys by upper-bound convention") {
    val p = new UrlRangePartitioner(Array("b", "d", "d", "f"))
    assert(p.numPartitions == 5)
    assert(p.getPartition("a") == 0)
    assert(p.getPartition("b") == 0) // equal to bound -> its partition
    assert(p.getPartition("c") == 1)
    assert(p.getPartition("d") == 1) // duplicate bounds: first match
    assert(p.getPartition("e") == 3)
    assert(p.getPartition("f") == 3)
    assert(p.getPartition("g") == 4) // above all bounds -> last
    val empty = new UrlRangePartitioner(Array.empty)
    assert(empty.numPartitions == 1 && empty.getPartition("anything") == 0)
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
