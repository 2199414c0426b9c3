package graft.core

import org.scalatest.funsuite.AnyFunSuite

object CollectionFixture {
  /** Seeded synthetic collection mirroring the reference posting-list
    * fixtures (test_block_posting_list.cpp:50-66): universe ~20k, lists
    * with avg gap 1.1+rand*10, freqs in [1, 256]. */
  final case class Collection(numDocs: Int,
                              termDocs: Array[Array[Int]],
                              termFreqs: Array[Array[Int]],
                              normLens: Array[Float])

  def make(numDocs: Int = 20000, numTerms: Int = 30,
           seed: Long = 42L): Collection = {
    val rnd = new scala.util.Random(seed)
    val termDocs = new Array[Array[Int]](numTerms)
    val termFreqs = new Array[Array[Int]](numTerms)
    for (t <- 0 until numTerms) {
      val avgGap = 1.1 + rnd.nextDouble() * 10
      val n = math.max(1, (numDocs / avgGap).toInt - rnd.nextInt(10))
      // strictly increasing docIDs in [0, numDocs)
      val base = Array.fill(n)(rnd.nextInt(numDocs - n).toLong).sorted
      termDocs(t) = Array.tabulate(n)(i => (base(i) + i).toInt)
      termFreqs(t) = Array.fill(n)(rnd.nextInt(256) + 1)
    }
    val lens = Array.fill(numDocs)(50 + rnd.nextInt(250))
    val avgLen = lens.map(_.toDouble).sum / numDocs
    val normLens = lens.map(l => (l / avgLen).toFloat)
    Collection(numDocs, termDocs, termFreqs, normLens)
  }
}

class BlockPostingListSpec extends AnyFunSuite {
  private val coll = CollectionFixture.make()

  private def checkList(codec: BlockCodec, docs: Array[Int], freqs: Array[Int]): Unit = {
    val bytes = BlockPostingList.encode(codec, docs, freqs)
    // full sweep
    val e = new BlockPostingList.Enumerator(bytes, 0, coll.numDocs, codec)
    for (i <- docs.indices) {
      assert(e.docId == docs(i), s"${codec.name} i=$i")
      assert(e.freq == freqs(i), s"${codec.name} i=$i freq")
      e.next()
    }
    assert(e.docId == coll.numDocs)
    // next_geq from reset at every doc (test_block_posting_list.cpp pattern)
    var i = 0
    while (i < docs.length) {
      val e2 = new BlockPostingList.Enumerator(bytes, 0, coll.numDocs, codec)
      e2.nextGeq(docs(i))
      assert(e2.docId == docs(i) && e2.position == firstPos(docs, i))
      assert(e2.freq == freqs(firstPos(docs, i)))
      // then a forward skip
      if (i + 37 < docs.length) {
        e2.nextGeq(docs(i + 37))
        assert(e2.docId == docs(i + 37))
      }
      i += (docs.length / 53) max 1
    }
    // next_geq past the end
    val e3 = new BlockPostingList.Enumerator(bytes, 0, coll.numDocs, codec)
    e3.nextGeq(docs.last + 1)
    assert(e3.docId == coll.numDocs)
    // positional access
    val e4 = new BlockPostingList.Enumerator(bytes, 0, coll.numDocs, codec)
    var p = 0
    while (p < docs.length) {
      e4.moveTo(p)
      assert(e4.docId == docs(p) && e4.freq == freqs(p), s"move $p")
      p += (docs.length / 31) max 1
    }
  }

  private def firstPos(docs: Array[Int], i: Int): Int = i // strict docs: position == i

  test("block posting lists round-trip for every codec") {
    for (codec <- Seq(OptPfdCodec, InterpolativeCodec, VarintCodec)) {
      for (t <- coll.termDocs.indices)
        checkList(codec, coll.termDocs(t), coll.termFreqs(t))
      // tiny lists
      checkList(codec, Array(0), Array(1))
      checkList(codec, Array(19999), Array(255))
      checkList(codec, Array.tabulate(128)(_ * 3), Array.fill(128)(2))
      checkList(codec, Array.tabulate(129)(_ * 2), Array.fill(129)(1))
    }
  }
}

class EfPostingListSpec extends AnyFunSuite {
  private val coll = CollectionFixture.make(numDocs = 8000, numTerms = 12, seed = 7L)

  test("EF-family posting lists round-trip (ef/single/uniform/opt)") {
    for (family <- Seq(EfFamily.ef, EfFamily.single, EfFamily.uniform, EfFamily.opt)) {
      for (t <- coll.termDocs.indices) {
        val docs = coll.termDocs(t)
        val freqs = coll.termFreqs(t)
        val bytes = EfPostingList.encode(family, coll.numDocs, docs, freqs)
        val e = new EfPostingList.Enumerator(bytes, family, coll.numDocs)
        for (i <- docs.indices) {
          assert(e.docId == docs(i), s"${family.name} t=$t i=$i")
          assert(e.freq == freqs(i), s"${family.name} t=$t i=$i freq")
          e.next()
        }
        assert(e.docId == coll.numDocs)
        // skips
        val e2 = new EfPostingList.Enumerator(bytes, family, coll.numDocs)
        var i = 0
        while (i < docs.length) {
          e2.nextGeq(docs(i))
          assert(e2.docId == docs(i), s"${family.name} geq t=$t i=$i")
          assert(e2.freq == freqs(i), s"${family.name} geq freq t=$t i=$i")
          i += 13
        }
      }
      // singleton
      val bytes = EfPostingList.encode(family, coll.numDocs, Array(42), Array(7))
      val e = new EfPostingList.Enumerator(bytes, family, coll.numDocs)
      assert(e.docId == 42 && e.freq == 7 && e.size == 1)
    }
  }
}
