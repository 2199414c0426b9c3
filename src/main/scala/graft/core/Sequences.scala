package graft.core

/** Sampling parameters for the EF / ranked-bitvector skip structures
  * (reference defaults: /root/reference/global_parameters.hpp:6-12). */
final case class SeqParams(
    efLogSampling0: Int = 9,
    efLogSampling1: Int = 8,
    rbLogRank1Sampling: Int = 9,
    rbLogSampling1: Int = 8,
    logPartitionSize: Int = 7)

object SeqParams {
  val default: SeqParams = SeqParams()
  /** Strictly-increasing chunks never need zero/rank sampling
    * (/root/reference/strict_sequence.hpp:24-30). */
  def strict(p: SeqParams): SeqParams =
    p.copy(efLogSampling0 = 62, rbLogRank1Sampling = 62)
}

/** Enumerator over a monotone sequence with (position, value) cursor.
  * Past-the-end reads return `universe` as a +infinity sentinel, the same
  * convention all reference merge loops rely on
  * (/root/reference/compact_elias_fano.hpp:152-153). */
trait SeqEnum {
  def size: Long
  def position: Long
  def value: Long
  /** Move cursor to `position` (<= size); returns value there. */
  def moveTo(position: Long): Long
  /** Advance to first element with value >= lowerBound. */
  def nextGeq(lowerBound: Long): Long
  /** Advance one element. */
  def next(): Long
  /** Value of the previous element (0 if at the start). */
  def prevValue: Long
}

/** Compact Elias-Fano over [0, universe), n > 0 elements, weakly monotone.
  * Layout + skip pointers per /root/reference/compact_elias_fano.hpp:14-136:
  * [zero-skip pointers | one-skip pointers | high bits (unary, sentinel
  * zero-padded) | low bits (fixed width)].
  */
object CompactEliasFano {

  final class Offsets(val baseOffset: Long, val universe: Long, val n: Long,
                      p: SeqParams) {
    val logSampling0: Int = p.efLogSampling0
    val logSampling1: Int = p.efLogSampling1
    val lowerBits: Int = if (universe > n) Bits.msb(universe / n) else 0
    val mask: Long = Bits.mask(lowerBits)
    val higherBitsLength: Long = n + (universe >>> lowerBits) + 2
    val pointerSize: Int = Bits.ceilLog2(higherBitsLength)
    val pointers0: Long = (higherBitsLength - n) >>> logSampling0
    val pointers1: Long = n >>> logSampling1
    val pointers0Offset: Long = baseOffset
    val pointers1Offset: Long = pointers0Offset + pointers0 * pointerSize
    val higherBitsOffset: Long = pointers1Offset + pointers1 * pointerSize
    val lowerBitsOffset: Long = higherBitsOffset + higherBitsLength
    val end: Long = lowerBitsOffset + n * lowerBits
  }

  def bitSize(p: SeqParams, universe: Long, n: Long): Long =
    new Offsets(0, universe, n, p).end

  def write(bw: BitWriter, values: Int => Long, universe: Long, n: Long,
            p: SeqParams): Unit = {
    val base = bw.size
    val of = new Offsets(base, universe, n, p)
    bw.zeroExtend(of.end - base)

    val sample1Mask = (1L << of.logSampling1) - 1

    // zero-skip pointers covering the zero run [begin, end) given
    // `rankEnd` ones precede it
    def setPtr0s(begin: Long, end: Long, rankEnd: Long): Unit = {
      val beginZeros = begin - rankEnd
      val endZeros = end - rankEnd
      var ptr0 = (beginZeros + (1L << of.logSampling0) - 1) >>> of.logSampling0
      while ((ptr0 << of.logSampling0) < endZeros) {
        if (ptr0 != 0) {
          val offset = of.pointers0Offset + (ptr0 - 1) * of.pointerSize
          bw.setBits(offset, (ptr0 << of.logSampling0) + rankEnd, of.pointerSize)
        }
        ptr0 += 1
      }
    }

    var last = 0L
    var lastHigh = 0L
    var i = 0L
    while (i < n) {
      val v = values(i.toInt)
      if (i > 0 && v < last)
        throw new IllegalArgumentException(s"sequence not sorted at $i: $v < $last")
      require(v < universe, s"value $v out of universe $universe")
      val high = (v >>> of.lowerBits) + i + 1
      val low = v & of.mask

      bw.set(of.higherBitsOffset + high)
      bw.setBits(of.lowerBitsOffset + i * of.lowerBits, low, of.lowerBits)

      if (i > 0 && (i & sample1Mask) == 0) {
        val ptr1 = i >>> of.logSampling1
        bw.setBits(of.pointers1Offset + (ptr1 - 1) * of.pointerSize, high,
                   of.pointerSize)
      }

      setPtr0s(lastHigh + 1, high, i)
      lastHigh = high
      last = v
      i += 1
    }
    setPtr0s(lastHigh + 1, of.higherBitsLength, n)
  }

  final val LinearScanThreshold = 8L

  final class Enumerator(bv: BitVector, offset: Long, universe: Long, n: Long,
                         p: SeqParams) extends SeqEnum {
    private val of = new Offsets(offset, universe, n, p)
    private var mPosition: Long = of.n
    private var mValue: Long = of.universe
    // harmless placeholder: fast paths that fork() it from the initial
    // past-the-end state never actually read it
    private var high: UnaryEnum = new UnaryEnum(bv, of.higherBitsOffset)

    def size: Long = of.n
    def position: Long = mPosition
    def value: Long = mValue

    @inline private def readLow(pos: Long): Long =
      bv.getBits(of.lowerBitsOffset + pos * of.lowerBits, of.lowerBits)

    @inline private def readNext(): Long = {
      val h = high.next() - of.higherBitsOffset
      ((h - mPosition - 1) << of.lowerBits) | readLow(mPosition)
    }

    private def pointer(offset0: Long, i: Long): Long =
      if (i == 0) 0L
      else bv.getBits(offset0 + (i - 1) * of.pointerSize, of.pointerSize)

    def moveTo(position: Long): Long = {
      if (position == mPosition) return mValue
      val skip = position - mPosition
      if (position > mPosition && skip <= LinearScanThreshold) {
        mPosition = position
        if (mPosition == size) { mValue = of.universe }
        else {
          val he = high.fork()
          var i = 0L
          var h = 0L
          while (i < skip) { h = he.next(); i += 1 }
          mValue = ((h - of.higherBitsOffset - mPosition - 1) << of.lowerBits) |
            readLow(mPosition)
          high = he
        }
        return mValue
      }
      slowMove(position)
    }

    private def slowMove(position: Long): Long = {
      if (position == size) {
        mPosition = position
        mValue = of.universe
        return mValue
      }
      var toSkip = 0L
      if (position > mPosition && (position - mPosition) >>> of.logSampling1 == 0) {
        toSkip = position - mPosition - 1
      } else {
        val ptr = position >>> of.logSampling1
        val highPos = pointer(of.pointers1Offset, ptr)
        val highRank = ptr << of.logSampling1
        high = new UnaryEnum(bv, of.higherBitsOffset + highPos)
        toSkip = position - highRank
      }
      high.skip(toSkip)
      mPosition = position
      mValue = readNext()
      mValue
    }

    def nextGeq(lowerBound: Long): Long = {
      if (lowerBound == mValue) return mValue
      val highLowerBound = lowerBound >>> of.lowerBits
      val curHigh = mValue >>> of.lowerBits
      val highDiff = highLowerBound - curHigh
      if (lowerBound > mValue && highDiff <= LinearScanThreshold) {
        // linear scan over the next few elements
        val he = high.fork()
        var v = 0L
        var done = false
        while (!done) {
          mPosition += 1
          if (mPosition < size) {
            val h = he.next() - (of.higherBitsOffset + mPosition + 1)
            v = (h << of.lowerBits) | readLow(mPosition)
            if (v >= lowerBound) done = true
          } else {
            mPosition = size
            v = of.universe
            done = true
          }
        }
        high = he
        mValue = v
        mValue
      } else slowNextGeq(lowerBound)
    }

    private def slowNextGeq(lowerBound: Long): Long = {
      if (lowerBound >= of.universe) return moveTo(size)
      val highLowerBound = lowerBound >>> of.lowerBits
      val curHigh = mValue >>> of.lowerBits
      val highDiff = highLowerBound - curHigh

      var toSkip = 0L
      if (lowerBound > mValue && (highDiff >>> of.logSampling0) == 0) {
        // the current (already consumed) 1 counts as a zero for skip0
        toSkip = highDiff
      } else {
        val ptr = highLowerBound >>> of.logSampling0
        val highPos = pointer(of.pointers0Offset, ptr)
        val highRank0 = ptr << of.logSampling0
        high = new UnaryEnum(bv, of.higherBitsOffset + highPos)
        toSkip = highLowerBound - highRank0
      }
      high.skip0(toSkip)
      mPosition = high.position - of.higherBitsOffset - highLowerBound

      while (true) {
        if (mPosition == size) { mValue = of.universe; return mValue }
        val h = high.next() - (of.higherBitsOffset + mPosition + 1)
        val v = (h << of.lowerBits) | readLow(mPosition)
        if (v >= lowerBound) { mValue = v; return mValue }
        mPosition += 1
      }
      mValue
    }

    def next(): Long = {
      mPosition += 1
      if (mPosition < size) mValue = readNext()
      else mValue = of.universe
      mValue
    }

    def prevValue: Long = {
      if (mPosition == 0) return 0L
      var prevHigh =
        if (mPosition < size) bv.predecessor1(high.position - 1)
        else bv.predecessor1(of.lowerBitsOffset - 1)
      prevHigh -= of.higherBitsOffset
      val prevPos = mPosition - 1
      val prevLow = readLow(prevPos)
      ((prevHigh - prevPos - 1) << of.lowerBits) | prevLow
    }
  }
}

/** Strictly-increasing variant: encodes v_i - i over universe-n+1
  * (/root/reference/strict_elias_fano.hpp:10-82). */
object StrictEliasFano {
  def bitSize(p: SeqParams, universe: Long, n: Long): Long =
    CompactEliasFano.bitSize(p, universe - n + 1, n)

  def write(bw: BitWriter, values: Int => Long, universe: Long, n: Long,
            p: SeqParams): Unit =
    CompactEliasFano.write(bw, i => values(i) - i, universe - n + 1, n, p)

  final class Enumerator(bv: BitVector, offset: Long, universe: Long, n: Long,
                         p: SeqParams) extends SeqEnum {
    private val ef = new CompactEliasFano.Enumerator(bv, offset, universe - n + 1, n, p)
    def size: Long = ef.size
    def position: Long = ef.position
    def value: Long = ef.value + ef.position
    def moveTo(position: Long): Long = { ef.moveTo(position); value }
    def next(): Long = { ef.next(); value }
    def nextGeq(lowerBound: Long): Long =
      throw new UnsupportedOperationException("strict EF has no next_geq")
    def prevValue: Long =
      if (ef.position > 0) ef.prevValue + ef.position - 1 else 0L
  }
}

/** Plain bitmap of the set + rank/select samples; the dense-list
  * alternative to EF (/root/reference/compact_ranked_bitvector.hpp). */
object RankedBitvector {

  final class Offsets(val baseOffset: Long, val universe: Long, val n: Long,
                      p: SeqParams) {
    val logRank1Sampling: Int = p.rbLogRank1Sampling
    val logSampling1: Int = p.rbLogSampling1
    val rank1SampleSize: Int = Bits.ceilLog2(n + 1)
    val pointerSize: Int = Bits.ceilLog2(universe)
    val rank1Samples: Long = universe >>> logRank1Sampling
    val pointers1: Long = n >>> logSampling1
    val rank1SamplesOffset: Long = baseOffset
    val pointers1Offset: Long = rank1SamplesOffset + rank1Samples * rank1SampleSize
    val bitsOffset: Long = pointers1Offset + pointers1 * pointerSize
    val end: Long = bitsOffset + universe
  }

  def bitSize(p: SeqParams, universe: Long, n: Long): Long =
    new Offsets(0, universe, n, p).end

  def write(bw: BitWriter, values: Int => Long, universe: Long, n: Long,
            p: SeqParams): Unit = {
    val base = bw.size
    val of = new Offsets(base, universe, n, p)
    bw.zeroExtend(of.end - base)

    def setRank1Samples(begin: Long, end: Long, rank: Long): Unit = {
      var sample = (begin + (1L << of.logRank1Sampling) - 1) >>> of.logRank1Sampling
      while ((sample << of.logRank1Sampling) < end) {
        if (sample != 0) {
          bw.setBits(of.rank1SamplesOffset + (sample - 1) * of.rank1SampleSize,
                     rank, of.rank1SampleSize)
        }
        sample += 1
      }
    }

    val sample1Mask = (1L << of.logSampling1) - 1
    var last = 0L
    var i = 0L
    while (i < n) {
      val v = values(i.toInt)
      if (i > 0 && v == last) throw new IllegalArgumentException("duplicate element")
      if (i > 0 && v < last) throw new IllegalArgumentException("not sorted")
      bw.set(of.bitsOffset + v)
      if (i > 0 && (i & sample1Mask) == 0) {
        val ptr1 = i >>> of.logSampling1
        bw.setBits(of.pointers1Offset + (ptr1 - 1) * of.pointerSize, v,
                   of.pointerSize)
      }
      setRank1Samples(last + 1, v + 1, i)
      last = v
      i += 1
    }
    setRank1Samples(last + 1, universe, n)
  }

  final val LinearScanThreshold = 8L

  final class Enumerator(bv: BitVector, offset: Long, universe: Long, n: Long,
                         p: SeqParams) extends SeqEnum {
    private val of = new Offsets(offset, universe, n, p)
    private var mPosition: Long = of.n
    private var mValue: Long = of.universe
    private var en: UnaryEnum = new UnaryEnum(bv, of.bitsOffset)

    def size: Long = of.n
    def position: Long = mPosition
    def value: Long = mValue

    @inline private def readNext(): Long = en.next() - of.bitsOffset

    private def pointer(offset0: Long, i: Long, width: Int): Long =
      if (i == 0) 0L else bv.getBits(offset0 + (i - 1) * width, width)

    def moveTo(position: Long): Long = {
      if (position == mPosition) return mValue
      val skip = position - mPosition
      if (position > mPosition && skip <= LinearScanThreshold) {
        mPosition = position
        if (mPosition == size) mValue = of.universe
        else {
          val he = en.fork()
          var i = 0L
          var h = 0L
          while (i < skip) { h = he.next(); i += 1 }
          mValue = h - of.bitsOffset
          en = he
        }
        return mValue
      }
      slowMove(position)
    }

    private def slowMove(position: Long): Long = {
      if (position == size) { mPosition = position; mValue = of.universe; return mValue }
      var toSkip = 0L
      if (position > mPosition && (position - mPosition) >>> of.logSampling1 == 0) {
        toSkip = position - mPosition - 1
      } else {
        val ptr = position >>> of.logSampling1
        val ptrPos = pointer(of.pointers1Offset, ptr, of.pointerSize)
        en = new UnaryEnum(bv, of.bitsOffset + ptrPos)
        toSkip = position - (ptr << of.logSampling1)
      }
      en.skip(toSkip)
      mPosition = position
      mValue = readNext()
      mValue
    }

    def nextGeq(lowerBound: Long): Long = {
      if (lowerBound == mValue) return mValue
      val diff = lowerBound - mValue
      if (lowerBound > mValue && diff <= LinearScanThreshold) {
        val he = en.fork()
        var v = 0L
        var done = false
        while (!done) {
          mPosition += 1
          if (mPosition < size) {
            v = he.next() - of.bitsOffset
            if (v >= lowerBound) done = true
          } else { mPosition = size; v = of.universe; done = true }
        }
        mValue = v
        en = he
        mValue
      } else slowNextGeq(lowerBound)
    }

    private def slowNextGeq(lowerBound: Long): Long = {
      if (lowerBound >= of.universe) return moveTo(size)
      val skip = lowerBound - mValue
      en = new UnaryEnum(bv, of.bitsOffset + lowerBound)

      var begin = 0L
      if (lowerBound > mValue && (skip >>> of.logRank1Sampling) == 0) {
        begin = of.bitsOffset + mValue
      } else {
        val block = lowerBound >>> of.logRank1Sampling
        mPosition = pointer(of.rank1SamplesOffset, block, of.rank1SampleSize)
        begin = of.bitsOffset + (block << of.logRank1Sampling)
      }

      val end = of.bitsOffset + lowerBound
      var beginWord = begin >>> 6
      val beginShift = (begin & 63).toInt
      val endWord = end >>> 6
      val endShift = (end & 63).toInt
      var word = (bv.words(beginWord.toInt) >>> beginShift) << beginShift
      while (beginWord < endWord) {
        mPosition += java.lang.Long.bitCount(word)
        beginWord += 1
        word = bv.words(beginWord.toInt)
      }
      if (endShift != 0)
        mPosition += java.lang.Long.bitCount(word << (64 - endShift))

      if (mPosition < size) mValue = readNext()
      else mValue = of.universe
      mValue
    }

    def next(): Long = {
      mPosition += 1
      if (mPosition < size) mValue = readNext() else mValue = of.universe
      mValue
    }

    def prevValue: Long = {
      if (mPosition == 0) return 0L
      val pos =
        if (mPosition < size) bv.predecessor1(en.position - 1)
        else bv.predecessor1(of.end - 1)
      pos - of.bitsOffset
    }
  }
}

/** Implicit 0..universe-1 when n == universe; zero bits
  * (/root/reference/all_ones_sequence.hpp). */
object AllOnesSeq {
  def bitSize(universe: Long, n: Long): Long =
    if (universe == n) 0L else Long.MaxValue

  final class Enumerator(universe: Long) extends SeqEnum {
    private var mPosition: Long = universe
    def size: Long = universe
    def position: Long = mPosition
    def value: Long = mPosition
    def moveTo(position: Long): Long = { mPosition = position; mPosition }
    def nextGeq(lowerBound: Long): Long = {
      mPosition = math.min(lowerBound, universe)
      if (mPosition == universe) universe else mPosition
    }
    def next(): Long = { mPosition += 1; mPosition }
    def prevValue: Long = if (mPosition == 0) 0L else mPosition - 1
  }
}

/** Per-chunk best-of {EF, ranked bitvector, implicit all-ones} by exact
  * bit cost, 1 type bit (all-ones implicit)
  * (/root/reference/indexed_sequence.hpp:12-165). */
object IndexedSeq {
  final val TypeBits = 1
  final val EliasFanoType = 0L
  final val RankedBitvectorType = 1L

  def bitSize(p: SeqParams, universe: Long, n: Long): Long = {
    var best = AllOnesSeq.bitSize(universe, n)
    val ef = CompactEliasFano.bitSize(p, universe, n) + TypeBits
    if (ef < best) best = ef
    val rb = RankedBitvector.bitSize(p, universe, n) + TypeBits
    if (rb < best) best = rb
    best
  }

  def write(bw: BitWriter, values: Int => Long, universe: Long, n: Long,
            p: SeqParams): Unit = {
    val allOnes = AllOnesSeq.bitSize(universe, n)
    if (allOnes == 0L) return // implicit
    val ef = CompactEliasFano.bitSize(p, universe, n) + TypeBits
    val rb = RankedBitvector.bitSize(p, universe, n) + TypeBits
    if (ef <= rb) {
      bw.appendBits(EliasFanoType, TypeBits)
      CompactEliasFano.write(bw, values, universe, n, p)
    } else {
      bw.appendBits(RankedBitvectorType, TypeBits)
      RankedBitvector.write(bw, values, universe, n, p)
    }
  }

  def enumerator(bv: BitVector, offset: Long, universe: Long, n: Long,
                 p: SeqParams): SeqEnum = {
    if (AllOnesSeq.bitSize(universe, n) == 0L) new AllOnesSeq.Enumerator(universe)
    else if ((bv.getBits(offset, TypeBits) & 1L) == EliasFanoType)
      new CompactEliasFano.Enumerator(bv, offset + TypeBits, universe, n, p)
    else
      new RankedBitvector.Enumerator(bv, offset + TypeBits, universe, n, p)
  }
}

/** Strictly-increasing best-of chunk (zero-sampling disabled)
  * (/root/reference/strict_sequence.hpp). */
object StrictSeq {
  final val TypeBits = 1

  def bitSize(p: SeqParams, universe: Long, n: Long): Long = {
    val sp = SeqParams.strict(p)
    var best = AllOnesSeq.bitSize(universe, n)
    val ef = StrictEliasFano.bitSize(sp, universe, n) + TypeBits
    if (ef < best) best = ef
    val rb = RankedBitvector.bitSize(sp, universe, n) + TypeBits
    if (rb < best) best = rb
    best
  }

  def write(bw: BitWriter, values: Int => Long, universe: Long, n: Long,
            p: SeqParams): Unit = {
    val sp = SeqParams.strict(p)
    val allOnes = AllOnesSeq.bitSize(universe, n)
    if (allOnes == 0L) return
    val ef = StrictEliasFano.bitSize(sp, universe, n) + TypeBits
    val rb = RankedBitvector.bitSize(sp, universe, n) + TypeBits
    if (ef <= rb) {
      bw.appendBits(IndexedSeq.EliasFanoType, TypeBits)
      StrictEliasFano.write(bw, values, universe, n, sp)
    } else {
      bw.appendBits(IndexedSeq.RankedBitvectorType, TypeBits)
      RankedBitvector.write(bw, values, universe, n, sp)
    }
  }

  def enumerator(bv: BitVector, offset: Long, universe: Long, n: Long,
                 p: SeqParams): SeqEnum = {
    val sp = SeqParams.strict(p)
    if (AllOnesSeq.bitSize(universe, n) == 0L) new AllOnesSeq.Enumerator(universe)
    else if ((bv.getBits(offset, TypeBits) & 1L) == IndexedSeq.EliasFanoType)
      new StrictEliasFano.Enumerator(bv, offset + TypeBits, universe, n, sp)
    else
      new RankedBitvector.Enumerator(bv, offset + TypeBits, universe, n, sp)
  }
}

/** Uniform interface over the sequence encodings, so index families can
  * compose them (the reference composes via template parameters,
  * index_types.hpp:18-42). */
trait SequenceKind extends Serializable {
  def bitSize(p: SeqParams, universe: Long, n: Long): Long
  def write(bw: BitWriter, values: Int => Long, universe: Long, n: Long,
            p: SeqParams): Unit
  def enumerator(bv: BitVector, offset: Long, universe: Long, n: Long,
                 p: SeqParams): SeqEnum
}

object CompactEfKind extends SequenceKind {
  def bitSize(p: SeqParams, universe: Long, n: Long): Long =
    CompactEliasFano.bitSize(p, universe, n)
  def write(bw: BitWriter, values: Int => Long, universe: Long, n: Long,
            p: SeqParams): Unit =
    CompactEliasFano.write(bw, values, universe, n, p)
  def enumerator(bv: BitVector, offset: Long, universe: Long, n: Long,
                 p: SeqParams): SeqEnum =
    new CompactEliasFano.Enumerator(bv, offset, universe, n, p)
}

object IndexedKind extends SequenceKind {
  def bitSize(p: SeqParams, universe: Long, n: Long): Long =
    IndexedSeq.bitSize(p, universe, n)
  def write(bw: BitWriter, values: Int => Long, universe: Long, n: Long,
            p: SeqParams): Unit =
    IndexedSeq.write(bw, values, universe, n, p)
  def enumerator(bv: BitVector, offset: Long, universe: Long, n: Long,
                 p: SeqParams): SeqEnum =
    IndexedSeq.enumerator(bv, offset, universe, n, p)
}

object StrictKind extends SequenceKind {
  def bitSize(p: SeqParams, universe: Long, n: Long): Long =
    StrictSeq.bitSize(p, universe, n)
  def write(bw: BitWriter, values: Int => Long, universe: Long, n: Long,
            p: SeqParams): Unit =
    StrictSeq.write(bw, values, universe, n, p)
  def enumerator(bv: BitVector, offset: Long, universe: Long, n: Long,
                 p: SeqParams): SeqEnum =
    StrictSeq.enumerator(bv, offset, universe, n, p)
}

/** Positive integers stored as prefix sums in a strict-family sequence;
  * move(i) returns the difference of consecutive prefix sums
  * (/root/reference/positive_sequence.hpp). */
object PositiveSeq {
  def write(bw: BitWriter, values: Int => Long, universe: Long, n: Long,
            p: SeqParams, base: SequenceKind = StrictKind): Unit = {
    require(n > 0)
    var sum = 0L
    val prefix = new Array[Long](n.toInt)
    var i = 0
    while (i < n) { sum += values(i); prefix(i) = sum; i += 1 }
    base.write(bw, j => prefix(j), universe, n, p)
  }

  final class Enumerator(bv: BitVector, offset: Long, universe: Long, n: Long,
                         p: SeqParams, baseKind: SequenceKind = StrictKind) {
    private val base = baseKind.enumerator(bv, offset, universe, n, p)
    private var mPosition: Long = base.size
    private var mCur: Long = 0L

    def size: Long = base.size

    /** Value (difference) at `position`. */
    def moveTo(position: Long): Long = {
      var prev = mCur
      if (position != mPosition + 1) {
        if (position == 0) {
          mCur = base.moveTo(0)
          mPosition = 0
          return mCur
        }
        prev = base.moveTo(position - 1)
      }
      mCur = base.next()
      mPosition = position
      mCur - prev
    }
  }
}
