package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference PEF test grid
  * (/root/reference/test/test_partitioned_sequence.cpp:81-109 and
  * test_uniform_partitioned_sequence.cpp): singletons, several densities,
  * and short sequences with a large universe (singleton-partition path).
  * PEF requires strictly increasing input (posting docID lists are).
  */
class PartitionedSpec extends AnyFunSuite with SequenceHarness {
  private val p = SeqParams.default

  private def mk(kind: SequenceKind, seq: Array[Long], universe: Long,
                 withGeq: Boolean = true): Unit = {
    val bw = new BitWriter()
    kind.write(bw, i => seq(i), universe, seq.length, p)
    val bv = bw.result()
    testSequence(() => kind.enumerator(bv, 0, universe, seq.length, p), seq,
                 withNextGeq = withGeq)
  }

  test("PEF singleton sequences") {
    mk(PartitionedSequence.indexed, Array(0L), 1)
    mk(PartitionedSequence.indexed, Array(1L), 2)
    mk(PartitionedSequence.strict, Array(0L), 1, withGeq = false)
    mk(PartitionedSequence.strict, Array(1L), 2, withGeq = false)
  }

  test("PEF multiple densities (indexed chunks)") {
    for (avgGap <- Seq(1.1, 1.9, 2.5, 3.0, 5.0, 10.0)) {
      val n = 3000
      val universe = (n * avgGap).toLong
      val seq = randomSequence(universe, n, strict = true)
      mk(PartitionedSequence.indexed, seq, universe)
    }
  }

  test("PEF strict chunks (freqs prefix-sum flavor)") {
    for (avgGap <- Seq(1.1, 3.0, 10.0)) {
      val n = 2000
      val universe = (n * avgGap).toLong
      val seq = randomSequence(universe, n, strict = true)
      mk(PartitionedSequence.strict, seq, universe, withGeq = false)
    }
  }

  test("PEF short sequences with large universe (singleton partitions)") {
    val rnd = new scala.util.Random(42)
    var i = 1
    while (i < 512) {
      val universe = 100000L
      val initialGap = rnd.nextInt(50000).toLong
      val seq = randomSequence(universe - initialGap, i, strict = true)
        .map(_ + initialGap)
      mk(PartitionedSequence.indexed, seq, universe)
      i += 41
    }
  }

  test("uniform partitioned sequences") {
    mk(UniformPartitionedSequence.indexed, Array(0L), 1)
    for (avgGap <- Seq(1.1, 2.5, 10.0)) {
      val n = 3000
      val universe = (n * avgGap).toLong
      val seq = randomSequence(universe, n, strict = true)
      mk(UniformPartitionedSequence.indexed, seq, universe)
    }
    // short sequence -> single partition path
    val short = randomSequence(5000, 100, strict = true)
    mk(UniformPartitionedSequence.indexed, short, 5000)
  }

  test("PEF positive-sequence composition (opt freqs path)") {
    val rnd = new scala.util.Random(777)
    for (n <- Seq(1, 300, 5000)) {
      val vals = Array.fill(n)(rnd.nextInt(255).toLong + 1)
      val universe = vals.sum + 1
      val bw = new BitWriter()
      PositiveSeq.write(bw, i => vals(i), universe, n, p,
                        PartitionedSequence.strict)
      val bv = bw.result()
      val e = new PositiveSeq.Enumerator(bv, 0, universe, n, p,
                                         PartitionedSequence.strict)
      for (i <- 0 until n) assert(e.moveTo(i) == vals(i), s"n=$n i=$i")
      val e2 = new PositiveSeq.Enumerator(bv, 0, universe, n, p,
                                          PartitionedSequence.strict)
      rnd.shuffle((0 until n).toList).foreach(i => assert(e2.moveTo(i) == vals(i)))
    }
  }

  test("optimal partition: endpoints valid and cost no worse than single block") {
    val n = 4000
    val universe = 40000L
    val seq = randomSequence(universe, n, strict = true)
    val costFn = (u: Long, m: Long) =>
      IndexedSeq.bitSize(p, u, m) + OptimalPartition.FixCost
    val parts = OptimalPartition.compute(i => seq(i), universe, n, costFn)
    assert(parts.last == n)
    assert(parts.head > 0)
    assert(parts.sliding(2).forall(w => w.length < 2 || w(0) < w(1)))
    // encoded size should beat a single unpartitioned indexed sequence
    val bwPef = new BitWriter()
    PartitionedSequence.indexed.write(bwPef, i => seq(i), universe, n, p)
    val single = IndexedSeq.bitSize(p, universe, n)
    assert(bwPef.size <= single + 64,
           s"PEF ${bwPef.size} bits vs single-chunk $single")
  }
}
