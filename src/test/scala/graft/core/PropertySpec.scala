package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Property-based round-trips (FIXTURES.md §4: ScalaCheck generators for
  * monotone sequences on top of the ported seeded grids). Raw ScalaCheck
  * generators sampled with fixed seeds (no scalatest bridge in the
  * offline cache). */
class PropertySpec extends AnyFunSuite {

  private def forAll[T](gen: Gen[T], cases: Int = 150)(body: T => Unit): Unit = {
    val params = Gen.Parameters.default
    for (i <- 0 until cases) {
      val seed = org.scalacheck.rng.Seed(1000L + i)
      body(gen.pureApply(params, seed))
    }
  }

  private val p = SeqParams.default

  private val monotoneGen: Gen[(Array[Long], Long)] = for {
    n <- Gen.choose(1, 400)
    slack <- Gen.choose(0L, 5000L)
    gaps <- Gen.listOfN(n, Gen.choose(0L, 40L))
  } yield {
    val vals = gaps.scanLeft(0L)(_ + _).tail.toArray
    (vals, vals.last + 1 + slack)
  }

  private val strictGen: Gen[(Array[Long], Long)] = for {
    n <- Gen.choose(1, 400)
    slack <- Gen.choose(0L, 5000L)
    gaps <- Gen.listOfN(n, Gen.choose(1L, 40L))
  } yield {
    val vals = gaps.scanLeft(-1L)(_ + _).tail.toArray
    (vals, vals.last + 1 + slack)
  }

  test("compact EF: random access and next_geq agree with the array") {
    forAll(monotoneGen) { case (vals, universe) =>
      val bw = new BitWriter()
      CompactEliasFano.write(bw, i => vals(i), universe, vals.length, p)
      val bv = bw.result()
      val e = new CompactEliasFano.Enumerator(bv, 0, universe, vals.length, p)
      for (i <- vals.indices) assert(e.moveTo(i) == vals(i))
      val e2 = new CompactEliasFano.Enumerator(bv, 0, universe, vals.length, p)
      val probe = vals(vals.length / 2)
      val got = e2.nextGeq(probe)
      val exp = vals.find(_ >= probe).getOrElse(universe)
      assert(got == exp)
    }
  }

  test("PEF round-trips arbitrary strictly increasing sequences") {
    forAll(strictGen) { case (vals, universe) =>
      val bw = new BitWriter()
      PartitionedSequence.indexed.write(bw, i => vals(i), universe,
                                        vals.length, p)
      val e = PartitionedSequence.indexed.enumerator(bw.result(), 0, universe,
                                                     vals.length, p)
      for (i <- vals.indices) assert(e.moveTo(i) == vals(i))
    }
  }

  private val blockGen: Gen[Array[Int]] = for {
    n <- Gen.oneOf(Gen.choose(1, 128), Gen.const(128))
    mag <- Gen.choose(1, 24)
    vs <- Gen.listOfN(n, Gen.choose(0, (1 << mag) - 1))
  } yield vs.toArray

  test("all block codecs round-trip arbitrary blocks, exact consumption") {
    forAll(blockGen) { values =>
      for (codec <- Seq(OptPfdCodec, VarintCodec, InterpolativeCodec, MixedCodec)) {
        val out = new ByteWriter()
        codec.encode(values, -1, values.length, out)
        val bytes = out.result()
        val dec = new Array[Int](values.length)
        val consumed = codec.decode(bytes, 0, dec, -1, values.length)
        assert(consumed == bytes.length, codec.name)
        assert(dec.sameElements(values), codec.name)
      }
    }
  }

  test("block posting lists round-trip arbitrary doc/freq pairs") {
    val listGen = for {
      n <- Gen.choose(1, 600)
      gaps <- Gen.listOfN(n, Gen.choose(1, 50))
      freqs <- Gen.listOfN(n, Gen.choose(1, 300))
    } yield {
      val docs = gaps.scanLeft(-1)(_ + _).tail.toArray
      (docs, freqs.toArray, docs.last + 1 + 37)
    }
    forAll(listGen) { case (docs, freqs, universe) =>
      val bytes = BlockPostingList.encode(OptPfdCodec, docs, freqs)
      val e = new BlockPostingList.Enumerator(bytes, 0, universe, OptPfdCodec)
      for (i <- docs.indices) {
        assert(e.docId == docs(i) && e.freq == freqs(i))
        e.next()
      }
      assert(e.docId == universe)
    }
  }

  test("top-k queue equals sort-based selection under the tie-break") {
    val gen = for {
      n <- Gen.choose(0, 200)
      scores <- Gen.listOfN(n, Gen.choose(0, 50).map(_.toFloat))
    } yield scores.toArray
    forAll(gen) { scores =>
      val q = new TopKQueue(10)
      // ascending docIds, like DAAT
      scores.zipWithIndex.foreach { case (s, d) => q.insert(s, d) }
      val expected = scores.zipWithIndex
        .map { case (s, d) => (d, s) }
        .sortBy { case (d, s) => (-s, d) }.take(10).toSeq
      assert(q.finalized().toSeq == expected)
    }
  }
}
