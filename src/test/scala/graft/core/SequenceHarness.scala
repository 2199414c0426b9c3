package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's generic enumerator test discipline
  * (/root/reference/test/test_generic_sequence.hpp:28-203): exhaustive
  * move() random access, full next() sweep, prev_value at every step,
  * power-of-two skips, and randomized next_geq probes. Enumerators are
  * re-created (not copied) for the sub-tests that need a fresh cursor.
  */
trait SequenceHarness { self: AnyFunSuite =>

  /** Deterministic sorted sequence, mirrors random_sequence (srand(42)). */
  def randomSequence(universe: Long, n: Int, strict: Boolean = true,
                     seed: Long = 42L): Array[Long] = {
    val rnd = new scala.util.Random(seed)
    val u = if (strict) universe - n else universe
    val seq = Array.fill(n)(math.abs(rnd.nextLong()) % math.max(u, 1L)).sorted
    if (strict) for (i <- seq.indices) seq(i) += i
    seq
  }

  def testMoveNext(mk: () => SeqEnum, seq: Array[Long]): Unit = {
    val r = mk()
    assert(r.size == seq.length)
    if (seq.isEmpty) return

    // random access + prev_value
    for (i <- seq.indices) {
      val v = r.moveTo(i)
      assert(r.position == i, s"i=$i")
      assert(v == seq(i), s"i=$i got $v want ${seq(i)}")
      if (i > 0) assert(r.prevValue == seq(i - 1), s"i=$i prev")
      else assert(r.prevValue == 0L, s"i=$i prev")
    }
    r.moveTo(seq.length)
    assert(r.prevValue == seq.last)

    // full sweep with next()
    val r2 = mk()
    var v = r2.moveTo(0)
    for (i <- seq.indices) {
      assert(v == seq(i), s"sweep i=$i")
      if (i > 0) assert(r2.prevValue == seq(i - 1)) else assert(r2.prevValue == 0L)
      v = r2.next()
    }
    assert(r2.position == seq.length)
    assert(r2.prevValue == seq.last)

    // power-of-two skips
    var i = 0
    while (i < seq.length) {
      var skip = 1
      while (skip < seq.length - i) {
        val rr = mk()
        rr.moveTo(i)
        val got = rr.moveTo(i + skip)
        assert(rr.position == i + skip, s"i=$i skip=$skip")
        assert(got == seq(i + skip), s"i=$i skip=$skip")
        skip <<= 1
      }
      i += 1
    }
  }

  def testNextGeq(mk: () => SeqEnum, seq: Array[Long]): Unit = {
    val r = mk()
    assert(r.size == seq.length)
    if (seq.isEmpty) return
    val rnd = new scala.util.Random(4242L)

    var last = 0L
    for (i <- seq.indices) {
      if (seq(i) != last) {
        for (t <- 0 until 10) {
          val p: Long = i match {
            case 0 => last + 1
            case 1 => seq(i)
            case _ => last + 1 + (math.abs(rnd.nextLong()) % (seq(i) - last))
          }
          val rr = mk()
          val v = rr.nextGeq(p)
          assert(rr.position == i, s"i=$i t=$t p=$p pos=${rr.position}")
          assert(v == seq(i), s"i=$i t=$t p=$p")
          if (rr.position > 0) assert(rr.prevValue == seq(i - 1), s"i=$i prev")
          else assert(rr.prevValue == 0L)
        }
        last = seq(i)
      }
    }

    val r3 = mk()
    r3.nextGeq(seq.last + 1)
    assert(r3.position == seq.length)
    assert(r3.prevValue == seq.last)

    val r4 = mk()
    r4.nextGeq(2 * seq.last + 1)
    assert(r4.position == seq.length)

    // next_geq small skips; exact landing position is only pinned down for
    // strictly increasing sequences (for duplicate runs next_geq may land
    // anywhere inside the run depending on the cursor)
    val strict = seq.length < 2 ||
      seq.sliding(2).forall(w => w(0) < w(1))
    var i = 0
    while (i < seq.length) {
      var skip = 1
      while (skip < seq.length - i) {
        val target = seq(i + skip)
        val rr = mk()
        rr.moveTo(i)
        val v = rr.nextGeq(target)
        assert(v == target, s"i=$i skip=$skip")
        assert(seq(rr.position.toInt) == target, s"i=$i skip=$skip pos")
        if (strict)
          assert(rr.position == i + skip, s"i=$i skip=$skip want=${i + skip} got=${rr.position}")
        skip <<= 1
      }
      i += 1
    }
  }

  def testSequence(mk: () => SeqEnum, seq: Array[Long],
                   withNextGeq: Boolean = true): Unit = {
    testMoveNext(mk, seq)
    if (withNextGeq) testNextGeq(mk, seq)
  }
}
