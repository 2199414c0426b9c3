package graft.core

import org.scalatest.funsuite.AnyFunSuite

class BitsSpec extends AnyFunSuite {
  test("BitWriter append/read round-trip") {
    val rnd = new scala.util.Random(12345)
    val vals = Array.fill(2000)((rnd.nextLong(), rnd.nextInt(64) + 1))
    val bw = new BitWriter()
    vals.foreach { case (v, l) => bw.appendBits(v, l) }
    val bv = bw.result()
    var pos = 0L
    vals.foreach { case (v, l) =>
      assert(bv.getBits(pos, l) == (v & Bits.mask(l)), s"pos=$pos len=$l")
      pos += l
    }
  }

  test("setBits after zeroExtend") {
    val bw = new BitWriter()
    bw.zeroExtend(1000)
    bw.setBits(963, 0x2AL, 7)
    bw.set(10)
    val bv = bw.result()
    assert(bv.getBits(963, 7) == 0x2AL)
    assert(bv.get(10))
    assert(!bv.get(11))
  }

  test("UnaryEnum next/skip/skip0 against naive scan") {
    val rnd = new scala.util.Random(99)
    val n = 4096
    val bw = new BitWriter()
    val bits = Array.fill(n)(rnd.nextInt(5) == 0)
    bits.foreach(b => bw.appendBits(if (b) 1L else 0L, 1))
    // slack of ones at the end so scans terminate
    for (_ <- 0 until 128) bw.appendBits(1L, 1)
    val bv = bw.result()
    val ones = (0 until n).filter(bits(_)).map(_.toLong)

    // next() sweep
    val e = new UnaryEnum(bv, 0)
    ones.foreach(p => assert(e.next() == p))

    // skip(k) from 0: should land on k-th one
    for (k <- 0 until ones.length by 7) {
      val e2 = new UnaryEnum(bv, 0)
      e2.skip(k.toLong)
      assert(e2.next() == ones(k), s"skip($k)")
    }

    // skip0(k) from 0: land on k-th zero
    val zeros = (0 until n).filter(!bits(_)).map(_.toLong)
    for (k <- 0 until zeros.length by 13) {
      val e3 = new UnaryEnum(bv, 0)
      e3.skip0(k.toLong)
      assert(e3.position == zeros(k), s"skip0($k)")
    }

    // skip0 after next() treats the consumed 1 as zero
    if (ones.nonEmpty) {
      val e4 = new UnaryEnum(bv, 0)
      val p0 = e4.next()
      e4.skip0(0)
      assert(e4.position == p0)
    }

    // predecessor1
    for (p <- ones.indices.init) {
      assert(bv.predecessor1(ones(p + 1) - 1) == ones(p) ||
             ones(p + 1) - 1 == ones(p))
    }
  }

  test("gamma/delta codes round-trip") {
    val rnd = new scala.util.Random(7)
    val vals = Array.fill(3000)(math.abs(rnd.nextLong()) % (1L << rnd.nextInt(40)))
    val bw = new BitWriter()
    vals.foreach(v => IntCodes.writeGamma(bw, v))
    vals.foreach(v => IntCodes.writeDelta(bw, v))
    val it = new BitsEnumerator(bw.result(), 0)
    vals.foreach(v => assert(IntCodes.readGamma(it) == v))
    vals.foreach(v => assert(IntCodes.readDelta(it) == v))
  }
}

class CompactEliasFanoSpec extends AnyFunSuite with SequenceHarness {
  private val p = SeqParams.default

  private def mk(seq: Array[Long], universe: Long): () => SeqEnum = {
    val bw = new BitWriter()
    CompactEliasFano.write(bw, i => seq(i), universe, seq.length, p)
    val bv = bw.result()
    () => new CompactEliasFano.Enumerator(bv, 0, universe, seq.length, p)
  }

  test("singleton sequences") {
    testSequence(mk(Array(0L), 1), Array(0L))
    testSequence(mk(Array(1L), 2), Array(1L))
  }

  test("random strict sequences at several densities") {
    for (avgGap <- Seq(1.1, 2.5, 10.0, 100.0)) {
      val n = 2000
      val universe = (n * avgGap).toLong
      val seq = randomSequence(universe, n, strict = true)
      testSequence(mk(seq, universe), seq)
    }
  }

  test("weakly monotone (duplicates)") {
    val n = 1000
    val universe = 300L
    val seq = randomSequence(universe, n, strict = false)
    testSequence(mk(seq, universe), seq)
  }
}

class StrictEliasFanoSpec extends AnyFunSuite with SequenceHarness {
  private val p = SeqParams.strict(SeqParams.default)

  private def mk(seq: Array[Long], universe: Long): () => SeqEnum = {
    val bw = new BitWriter()
    StrictEliasFano.write(bw, i => seq(i), universe, seq.length, p)
    val bv = bw.result()
    () => new StrictEliasFano.Enumerator(bv, 0, universe, seq.length, p)
  }

  test("strict sequences") {
    for (avgGap <- Seq(1.1, 3.0, 25.0)) {
      val n = 1500
      val universe = (n * avgGap).toLong
      val seq = randomSequence(universe, n, strict = true)
      testSequence(mk(seq, universe), seq, withNextGeq = false)
    }
  }
}

class RankedBitvectorSpec extends AnyFunSuite with SequenceHarness {
  private val p = SeqParams.default

  private def mk(seq: Array[Long], universe: Long): () => SeqEnum = {
    val bw = new BitWriter()
    RankedBitvector.write(bw, i => seq(i), universe, seq.length, p)
    val bv = bw.result()
    () => new RankedBitvector.Enumerator(bv, 0, universe, seq.length, p)
  }

  test("random strict sequences (dense + sparse)") {
    for (avgGap <- Seq(1.1, 1.9, 4.0)) {
      val n = 2000
      val universe = (n * avgGap).toLong
      val seq = randomSequence(universe, n, strict = true)
      testSequence(mk(seq, universe), seq)
    }
  }

  test("singleton") {
    testSequence(mk(Array(0L), 1), Array(0L))
  }
}

class IndexedSeqSpec extends AnyFunSuite with SequenceHarness {
  private val p = SeqParams.default

  private def mk(seq: Array[Long], universe: Long): () => SeqEnum = {
    val bw = new BitWriter()
    IndexedSeq.write(bw, i => seq(i), universe, seq.length, p)
    val bv = bw.result()
    () => IndexedSeq.enumerator(bv, 0, universe, seq.length, p)
  }

  test("all-ones case (universe == n)") {
    val n = 500
    val seq = Array.tabulate(n)(_.toLong)
    assert(IndexedSeq.bitSize(p, n, n) == 0L)
    testSequence(mk(seq, n), seq)
  }

  test("mixed densities pick correct representation and round-trip") {
    for (avgGap <- Seq(1.05, 1.5, 3.0, 50.0)) {
      val n = 1500
      val universe = (n * avgGap).toLong
      val seq = randomSequence(universe, n, strict = true)
      testSequence(mk(seq, universe), seq)
    }
  }
}

class PositiveSeqSpec extends AnyFunSuite {
  private val p = SeqParams.default

  test("positive values round-trip via prefix sums") {
    val rnd = new scala.util.Random(555)
    for (n <- Seq(1, 7, 100, 5000)) {
      val vals = Array.fill(n)(rnd.nextInt(255).toLong + 1)
      val universe = vals.sum + 1
      val bw = new BitWriter()
      PositiveSeq.write(bw, i => vals(i), universe, n, p)
      val bv = bw.result()
      val e = new PositiveSeq.Enumerator(bv, 0, universe, n, p)
      // sequential
      for (i <- 0 until n) assert(e.moveTo(i) == vals(i), s"seq i=$i")
      // random access
      val idx = rnd.shuffle((0 until n).toList)
      val e2 = new PositiveSeq.Enumerator(bv, 0, universe, n, p)
      idx.foreach(i => assert(e2.moveTo(i) == vals(i), s"rand i=$i"))
    }
  }
}
