package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end ranked-query agreement, the reference's strongest test
  * (/root/reference/test/test_ranked_queries.cpp:12-75): wand, maxscore,
  * block-max wand and ranked_and against the exhaustive ranked_or oracle
  * and against an independent brute-force model — here tightened to
  * bit-identical float32 scores and rank-identical docIDs with the
  * (score desc, docId asc) tie-break. */
class DaatSpec extends AnyFunSuite {
  private val coll = CollectionFixture.make(numDocs = 20000, numTerms = 40,
                                            seed = 4242L)
  private val k = 10
  private val codec: BlockCodec = OptPfdCodec

  // encoded lists + per-term metadata
  private val encoded: Array[Array[Byte]] =
    coll.termDocs.indices.map(t =>
      BlockPostingList.encode(codec, coll.termDocs(t), coll.termFreqs(t))).toArray

  private val maxTermWeight: Array[Float] = coll.termDocs.indices.map { t =>
    var m = 0.0f
    for (i <- coll.termDocs(t).indices) {
      val s = Bm25.docTermWeight(coll.termFreqs(t)(i).toLong,
                                 coll.normLens(coll.termDocs(t)(i)))
      if (s > m) m = s
    }
    m
  }.toArray

  private val blockMaxWeights: Array[Array[Float]] = coll.termDocs.indices.map { t =>
    val docs = coll.termDocs(t)
    val freqs = coll.termFreqs(t)
    val blocks = (docs.length + 127) / 128
    Array.tabulate(blocks) { b =>
      var m = 0.0f
      var i = b * 128
      val end = math.min(docs.length, (b + 1) * 128)
      while (i < end) {
        val s = Bm25.docTermWeight(freqs(i).toLong, coll.normLens(docs(i)))
        if (s > m) m = s
        i += 1
      }
      m
    }
  }.toArray

  private def openLists(terms: Array[Int], scorer: Scorer): Array[Daat.ScoredList] =
    Daat.queryFreqs(terms).map { qt =>
      val en = new BlockPostingList.Enumerator(encoded(qt.termId), 0,
                                               coll.numDocs, codec)
      val qw = scorer.queryTermWeight(qt.qtf.toLong,
                                      coll.termDocs(qt.termId).length.toLong,
                                      coll.numDocs.toLong)
      new Daat.ScoredList(en, qw, qw * maxTermWeight(qt.termId), en,
                          blockMaxWeights(qt.termId))
    }

  /** Independent brute-force model with the same float32 operation order. */
  private def bruteOr(terms: Array[Int], scorer: Scorer): Array[(Int, Float)] = {
    val qts = Daat.queryFreqs(terms)
    val perDoc = scala.collection.mutable.TreeMap.empty[Int, Float]
    // accumulate in termId order per doc, matching kernel list order;
    // kernel accumulates per doc over lists in open order, which is the
    // queryFreqs (termId-sorted) order
    val docTerms = scala.collection.mutable.TreeMap.empty[Int, List[(Int, Int)]]
    for ((qt, li) <- qts.zipWithIndex) {
      val docs = coll.termDocs(qt.termId)
      val freqs = coll.termFreqs(qt.termId)
      for (i <- docs.indices) {
        docTerms(docs(i)) = (li, freqs(i)) :: docTerms.getOrElse(docs(i), Nil)
      }
    }
    val topk = new TopKQueue(k)
    for ((doc, lst) <- docTerms) {
      var score = 0.0f
      for ((li, f) <- lst.sortBy(_._1)) {
        val qt = qts(li)
        val qw = scorer.queryTermWeight(qt.qtf.toLong,
                                        coll.termDocs(qt.termId).length.toLong,
                                        coll.numDocs.toLong)
        score += qw * scorer.docTermWeight(f.toLong, coll.normLens(doc))
      }
      topk.insert(score, doc)
    }
    topk.finalized()
  }

  private val rnd = new scala.util.Random(123)
  private val queries: Seq[Array[Int]] = Seq.tabulate(300) { _ =>
    val len = 1 + rnd.nextInt(5)
    Array.fill(len)(rnd.nextInt(coll.termDocs.length))
  }

  test("wand == maxscore == blockMaxWand == rankedOr, bit-identical") {
    for ((q, qi) <- queries.zipWithIndex) {
      val oracle = Daat.rankedOr(openLists(q, Bm25), coll.normLens,
                                 coll.numDocs, k)
      val w = Daat.wand(openLists(q, Bm25), coll.normLens, coll.numDocs, k)
      val ms = Daat.maxscore(openLists(q, Bm25), coll.normLens, coll.numDocs, k)
      val bmw = Daat.blockMaxWand(openLists(q, Bm25), coll.normLens,
                                  coll.numDocs, k)
      assert(w.toSeq == oracle.toSeq, s"q$qi wand (${q.mkString(",")})")
      assert(ms.toSeq == oracle.toSeq, s"q$qi maxscore")
      assert(bmw.toSeq == oracle.toSeq, s"q$qi bmw")
    }
  }

  test("rankedOr matches independent brute-force model bit-for-bit") {
    for ((q, qi) <- queries.take(60).zipWithIndex) {
      val oracle = bruteOr(q, Bm25)
      val got = Daat.rankedOr(openLists(q, Bm25), coll.normLens,
                              coll.numDocs, k)
      assert(got.toSeq == oracle.toSeq, s"q$qi")
    }
  }

  test("rankedAnd agrees with brute-force conjunction") {
    for ((q, qi) <- queries.take(100).zipWithIndex) {
      val qts = Daat.queryFreqs(q)
      // brute-force conjunction; kernels sum per-doc in termId order
      val docSets = qts.map(qt => coll.termDocs(qt.termId).toSet)
      val common = docSets.reduce(_ intersect _).toArray.sorted
      val topk = new TopKQueue(k)
      for (doc <- common) {
        var score = 0.0f
        for (qt <- qts) {
          val idx = java.util.Arrays.binarySearch(coll.termDocs(qt.termId), doc)
          val qw = Bm25.queryTermWeight(qt.qtf.toLong,
                                        coll.termDocs(qt.termId).length.toLong,
                                        coll.numDocs.toLong)
          score += qw * Bm25.docTermWeight(coll.termFreqs(qt.termId)(idx).toLong,
                                           coll.normLens(doc))
        }
        topk.insert(score, doc)
      }
      val got = Daat.rankedAnd(openLists(q, Bm25), coll.normLens,
                               coll.numDocs, k)
      assert(got.toSeq == topk.finalized().toSeq, s"q$qi")
    }
  }

  test("boolean and/or counts match set algebra") {
    for (q <- queries.take(100)) {
      val qts = Daat.queryFreqs(q)
      val sets = qts.map(qt => coll.termDocs(qt.termId).toSet)
      val enumsA = qts.map(qt => new BlockPostingList.Enumerator(
        encoded(qt.termId), 0, coll.numDocs, codec): PostingEnum)
      assert(Daat.andCount(enumsA, coll.numDocs) == sets.reduce(_ intersect _).size.toLong)
      val enumsO = qts.map(qt => new BlockPostingList.Enumerator(
        encoded(qt.termId), 0, coll.numDocs, codec): PostingEnum)
      assert(Daat.orCount(enumsO, coll.numDocs) == sets.reduce(_ union _).size.toLong)
    }
  }

  test("TfScorer integer ranking is exact") {
    for (q <- queries.take(40)) {
      val got = Daat.rankedOr(openLists(q, TfScorer), coll.normLens,
                              coll.numDocs, k, TfScorer)
      val oracle = bruteOr(q, TfScorer)
      assert(got.toSeq == oracle.toSeq)
      got.foreach { case (_, s) => assert(s == s.toInt.toFloat) }
    }
  }
}
