package graft.core

/** (1+eps)-approximate optimal partitioning of a monotone sequence into
  * variable chunks, shortest-path DP over geometric cost windows
  * (/root/reference/optimal_partition.hpp:13-122; constants
  * /root/reference/configuration.hpp:29-31).
  */
object OptimalPartition {
  final val Eps1 = 0.03
  final val Eps2 = 0.3
  final val FixCost = 64L // bits amortized per partition

  /** Returns partition endpoints (exclusive, ascending, last == n). */
  def compute(values: Int => Long, universe: Long, n: Int,
              costFn: (Long, Long) => Long,
              eps1: Double = Eps1, eps2: Double = Eps2): Array[Int] = {

    final class Window(var costUpperBound: Long) {
      var start = 0
      var end = 0
      var minP: Long = values(0)
      var maxP: Long = 0L
      def universeSpan: Long = maxP - minP + 1
      def size: Long = (end - start).toLong
      def advanceStart(): Unit = { minP = values(start) + 1; start += 1 }
      def advanceEnd(): Unit = { maxP = values(end); end += 1 }
    }

    val singleCost = costFn(universe, n.toLong)
    val minCost = Array.fill[Long](n + 1)(singleCost)
    minCost(0) = 0L

    val windows = scala.collection.mutable.ArrayBuffer.empty[Window]
    val costLb = costFn(1L, 1L)
    var costBound = costLb
    var continue = true
    while (continue && (eps1 == 0 || costBound < costLb / eps1)) {
      windows += new Window(costBound)
      if (costBound >= singleCost) continue = false
      else costBound = (costBound * (1 + eps2)).toLong
    }

    val path = new Array[Int](n + 1)
    var i = 0
    while (i < n) {
      var lastEnd = i + 1
      var w = 0
      while (w < windows.length) {
        val window = windows(w)
        while (window.end < lastEnd) window.advanceEnd()
        var loop = true
        while (loop) {
          val windowCost = costFn(window.universeSpan, window.size)
          if (minCost(i) + windowCost < minCost(window.end)) {
            minCost(window.end) = minCost(i) + windowCost
            path(window.end) = i
          }
          lastEnd = window.end
          if (window.end == n) loop = false
          else if (windowCost >= window.costUpperBound) loop = false
          else window.advanceEnd()
        }
        window.advanceStart()
        w += 1
      }
      i += 1
    }

    val parts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var cur = n
    while (cur != 0) { parts += cur; cur = path(cur) }
    parts.reverseIterator.toArray
  }
}

/** Partitioned Elias-Fano: optimal variable partitions, layout
  * gamma_nz(#parts) | singleton fast path (base in ceil_log2(U) bits +
  * delta-coded tight/loose upper bound + chunk) or
  * gamma(endpoint_bits) | EF(sizes) | EF(upper_bounds) | fixed-width
  * endpoints | concatenated rebased chunks
  * (/root/reference/partitioned_sequence.hpp:15-348).
  */
final class PartitionedSequence(chunk: SequenceKind) extends SequenceKind {

  def bitSize(p: SeqParams, universe: Long, n: Long): Long =
    // only used as a chunk cost by outer compositions; PEF is top-level
    throw new UnsupportedOperationException("PEF is not a chunk codec")

  def write(bw: BitWriter, values: Int => Long, universe: Long, n: Long,
            p: SeqParams): Unit = {
    require(n > 0)
    val nInt = n.toInt
    val costFn = (u: Long, m: Long) =>
      chunk.bitSize(p, u, m) + OptimalPartition.FixCost
    val partition = OptimalPartition.compute(values, universe, nInt, costFn)
    val partitions = partition.length
    IntCodes.writeGammaNonZero(bw, partitions.toLong)

    if (partitions == 1) {
      val curBase = values(0)
      val back = values(nInt - 1) - curBase
      bw.appendBits(curBase, Bits.ceilLog2(universe))
      if (n > 1) {
        if (curBase + back + 1 == universe) IntCodes.writeDelta(bw, 0) // tight
        else IntCodes.writeDelta(bw, back)
      }
      chunk.write(bw, i => values(i) - curBase, back + 1, n, p)
    } else {
      val bvSequences = new BitWriter()
      val endpoints = new Array[Long](partitions)
      val upperBounds = new Array[Long](partitions + 1)
      upperBounds(0) = values(0)

      var curBase = values(0)
      var curI = 0
      var pi = 0
      while (pi < partitions) {
        val end = partition(pi)
        val base = curBase
        val m = end - curI
        val ub = values(end - 1)
        val lo = curI
        chunk.write(bvSequences, j => values(lo + j) - base,
                    values(end - 1) - base + 1, m.toLong, p)
        endpoints(pi) = bvSequences.size
        upperBounds(pi + 1) = ub
        curBase = ub + 1
        curI = end
        pi += 1
      }

      val bvSizes = new BitWriter()
      CompactEliasFano.write(bvSizes, i => partition(i).toLong, n,
                             (partitions - 1).toLong, p)
      val bvUpperBounds = new BitWriter()
      CompactEliasFano.write(bvUpperBounds, i => upperBounds(i), universe,
                             (partitions + 1).toLong, p)

      val endpointBits = Bits.ceilLog2(bvSequences.size + 1)
      IntCodes.writeGamma(bw, endpointBits.toLong)
      bw.append(bvSizes)
      bw.append(bvUpperBounds)
      var e = 0
      while (e < partitions - 1) {
        bw.appendBits(endpoints(e), endpointBits)
        e += 1
      }
      bw.append(bvSequences)
    }
  }

  def enumerator(bv: BitVector, offset: Long, universe: Long, n: Long,
                 p: SeqParams): SeqEnum =
    new PartitionedSequence.Enumerator(bv, offset, universe, n, p, chunk)
}

object PartitionedSequence {
  /** PEF over best-of indexed chunks: the reference "opt" docs sequence. */
  val indexed = new PartitionedSequence(IndexedKind)
  /** PEF over strict chunks: prefix-sum (freqs) flavor. */
  val strict = new PartitionedSequence(StrictKind)

  final class Enumerator(bv: BitVector, offset: Long, universe: Long, n: Long,
                         p: SeqParams, chunk: SequenceKind) extends SeqEnum {
    private var mPartitions = 0L
    private var mEndpointsOffset = 0L
    private var mEndpointBits = 0
    private var mSequencesOffset = 0L
    private val mSize = n

    private var mPosition = 0L
    private var mCurPartition = 0L
    private var mCurBegin = 0L
    private var mCurEnd = 0L
    private var mCurBase = 0L
    private var mCurUpperBound = 0L

    private var sizes: CompactEliasFano.Enumerator = null
    private var upperBounds: CompactEliasFano.Enumerator = null
    private var partEnum: SeqEnum = null

    locally {
      val it = new BitsEnumerator(bv, offset)
      mPartitions = IntCodes.readGammaNonZero(it)
      if (mPartitions == 1) {
        mCurPartition = 0
        mCurBegin = 0
        mCurEnd = n
        val universeBits = Bits.ceilLog2(universe)
        mCurBase = it.take(universeBits)
        var ub = 0L
        if (n > 1) {
          val universeDelta = IntCodes.readDelta(it)
          ub = if (universeDelta != 0) universeDelta else universe - mCurBase - 1
        }
        partEnum = chunk.enumerator(bv, it.position, ub + 1, n, p)
        mCurUpperBound = mCurBase + ub
      } else {
        mEndpointBits = IntCodes.readGamma(it).toInt
        var curOffset = it.position
        sizes = new CompactEliasFano.Enumerator(bv, curOffset, n,
                                                mPartitions - 1, p)
        curOffset += CompactEliasFano.bitSize(p, n, mPartitions - 1)
        upperBounds = new CompactEliasFano.Enumerator(bv, curOffset, universe,
                                                      mPartitions + 1, p)
        curOffset += CompactEliasFano.bitSize(p, universe, mPartitions + 1)
        mEndpointsOffset = curOffset
        curOffset += mEndpointBits.toLong * (mPartitions - 1)
        mSequencesOffset = curOffset
      }
      mPosition = size
      slowMove()
    }

    def size: Long = mSize
    def position: Long = mPosition
    def value: Long =
      if (mPosition == mSize) universe
      else mCurBase + partEnum.value

    def numPartitions: Long = mPartitions

    def moveTo(position: Long): Long = {
      mPosition = position
      if (mPosition >= mCurBegin && mPosition < mCurEnd)
        mCurBase + partEnum.moveTo(mPosition - mCurBegin)
      else slowMove()
    }

    def nextGeq(lowerBound: Long): Long = {
      if (lowerBound >= mCurBase && lowerBound <= mCurUpperBound) {
        val v = partEnum.nextGeq(lowerBound - mCurBase)
        mPosition = mCurBegin + partEnum.position
        if (partEnum.position == partEnum.size) slowNext() // spilled past chunk
        else mCurBase + v
      } else slowNextGeq(lowerBound)
    }

    def next(): Long = {
      mPosition += 1
      if (mPosition < mCurEnd) mCurBase + partEnum.next()
      else slowNext()
    }

    def prevValue: Long =
      if (mPosition == mCurBegin) {
        if (mCurPartition != 0) mCurBase - 1 else 0L
      } else mCurBase + partEnum.prevValue

    private def slowNext(): Long = {
      if (mPosition == mSize) {
        partEnum.next()
        return universe
      }
      switchPartition(mCurPartition + 1)
      mCurBase + partEnum.moveTo(0)
    }

    private def slowMove(): Long = {
      if (mPosition == size) {
        if (mPartitions > 1) switchPartition(mPartitions - 1)
        partEnum.moveTo(partEnum.size)
        return universe
      }
      sizes.nextGeq(mPosition + 1) // endpoint strictly > position
      switchPartition(sizes.position)
      mCurBase + partEnum.moveTo(mPosition - mCurBegin)
    }

    private def slowNextGeq(lowerBound: Long): Long = {
      if (mPartitions == 1) {
        if (lowerBound < mCurBase) return moveTo(0)
        else return moveTo(size)
      }
      upperBounds.nextGeq(lowerBound)
      if (upperBounds.position == 0) return moveTo(0)
      if (upperBounds.position == upperBounds.size) return moveTo(size)
      switchPartition(upperBounds.position - 1)
      nextGeq(lowerBound)
    }

    private def switchPartition(partition: Long): Unit = {
      val endpoint =
        if (partition != 0)
          bv.getBits(mEndpointsOffset + (partition - 1) * mEndpointBits,
                     mEndpointBits)
        else 0L
      val partitionBegin = mSequencesOffset + endpoint
      mCurPartition = partition
      mCurEnd = sizes.moveTo(partition)
      mCurBegin = sizes.prevValue
      mCurUpperBound = upperBounds.moveTo(partition + 1)
      mCurBase = upperBounds.prevValue + (if (partition != 0) 1L else 0L)
      partEnum = chunk.enumerator(bv, partitionBegin,
                                  mCurUpperBound - mCurBase + 1,
                                  mCurEnd - mCurBegin, p)
    }
  }
}

/** Fixed 2^logPartitionSize-element partitions; same layout as PEF but
  * with implicit sizes (/root/reference/uniform_partitioned_sequence.hpp). */
final class UniformPartitionedSequence(chunk: SequenceKind) extends SequenceKind {

  def bitSize(p: SeqParams, universe: Long, n: Long): Long =
    throw new UnsupportedOperationException("not a chunk codec")

  def write(bw: BitWriter, values: Int => Long, universe: Long, n: Long,
            p: SeqParams): Unit = {
    require(n > 0)
    val partitionSize = 1L << p.logPartitionSize
    val partitions = ((n + partitionSize - 1) / partitionSize).toInt
    IntCodes.writeGammaNonZero(bw, partitions.toLong)

    if (partitions == 1) {
      val curBase = values(0)
      val back = values(n.toInt - 1) - curBase
      bw.appendBits(curBase, Bits.ceilLog2(universe))
      if (n > 1) {
        if (curBase + back + 1 == universe) IntCodes.writeDelta(bw, 0)
        else IntCodes.writeDelta(bw, back)
      }
      chunk.write(bw, i => values(i) - curBase, back + 1, n, p)
    } else {
      val bvSequences = new BitWriter()
      val endpoints = new Array[Long](partitions)
      val upperBounds = new Array[Long](partitions + 1)
      upperBounds(0) = values(0)
      var curBase = values(0)
      var pi = 0
      while (pi < partitions) {
        val lo = (pi.toLong * partitionSize).toInt
        val end = math.min((pi + 1).toLong * partitionSize, n).toInt
        val base = curBase
        val ub = values(end - 1)
        chunk.write(bvSequences, j => values(lo + j) - base, ub - base + 1,
                    (end - lo).toLong, p)
        endpoints(pi) = bvSequences.size
        upperBounds(pi + 1) = ub
        curBase = ub + 1
        pi += 1
      }
      val bvUpperBounds = new BitWriter()
      CompactEliasFano.write(bvUpperBounds, i => upperBounds(i), universe,
                             (partitions + 1).toLong, p)
      val endpointBits = Bits.ceilLog2(bvSequences.size + 1)
      IntCodes.writeGamma(bw, endpointBits.toLong)
      bw.append(bvUpperBounds)
      var e = 0
      while (e < partitions - 1) { bw.appendBits(endpoints(e), endpointBits); e += 1 }
      bw.append(bvSequences)
    }
  }

  def enumerator(bv: BitVector, offset: Long, universe: Long, n: Long,
                 p: SeqParams): SeqEnum =
    new UniformPartitionedSequence.Enumerator(bv, offset, universe, n, p, chunk)
}

object UniformPartitionedSequence {
  val indexed = new UniformPartitionedSequence(IndexedKind)
  val strict = new UniformPartitionedSequence(StrictKind)

  final class Enumerator(bv: BitVector, offset: Long, universe: Long, n: Long,
                         p: SeqParams, chunk: SequenceKind) extends SeqEnum {
    private val partitionSize = 1L << p.logPartitionSize
    private var mPartitions = 0L
    private var mEndpointsOffset = 0L
    private var mEndpointBits = 0
    private var mSequencesOffset = 0L

    private var mPosition = 0L
    private var mCurPartition = 0L
    private var mCurBegin = 0L
    private var mCurEnd = 0L
    private var mCurBase = 0L
    private var mCurUpperBound = 0L

    private var upperBounds: CompactEliasFano.Enumerator = null
    private var partEnum: SeqEnum = null

    locally {
      val it = new BitsEnumerator(bv, offset)
      mPartitions = IntCodes.readGammaNonZero(it)
      if (mPartitions == 1) {
        mCurPartition = 0
        mCurBegin = 0
        mCurEnd = n
        mCurBase = it.take(Bits.ceilLog2(universe))
        var ub = 0L
        if (n > 1) {
          val d = IntCodes.readDelta(it)
          ub = if (d != 0) d else universe - mCurBase - 1
        }
        partEnum = chunk.enumerator(bv, it.position, ub + 1, n, p)
        mCurUpperBound = mCurBase + ub
      } else {
        mEndpointBits = IntCodes.readGamma(it).toInt
        var curOffset = it.position
        upperBounds = new CompactEliasFano.Enumerator(bv, curOffset, universe,
                                                      mPartitions + 1, p)
        curOffset += CompactEliasFano.bitSize(p, universe, mPartitions + 1)
        mEndpointsOffset = curOffset
        curOffset += mEndpointBits.toLong * (mPartitions - 1)
        mSequencesOffset = curOffset
      }
      mPosition = size
      slowMove()
    }

    def size: Long = n
    def position: Long = mPosition
    def value: Long =
      if (mPosition == n) universe else mCurBase + partEnum.value

    def moveTo(position: Long): Long = {
      mPosition = position
      if (mPosition >= mCurBegin && mPosition < mCurEnd)
        mCurBase + partEnum.moveTo(mPosition - mCurBegin)
      else slowMove()
    }

    def nextGeq(lowerBound: Long): Long = {
      if (lowerBound >= mCurBase && lowerBound <= mCurUpperBound) {
        val v = partEnum.nextGeq(lowerBound - mCurBase)
        mPosition = mCurBegin + partEnum.position
        if (partEnum.position == partEnum.size) slowNext()
        else mCurBase + v
      } else slowNextGeq(lowerBound)
    }

    def next(): Long = {
      mPosition += 1
      if (mPosition < mCurEnd) mCurBase + partEnum.next()
      else slowNext()
    }

    def prevValue: Long =
      if (mPosition == mCurBegin) {
        if (mCurPartition != 0) mCurBase - 1 else 0L
      } else mCurBase + partEnum.prevValue

    private def slowNext(): Long = {
      if (mPosition == n) { partEnum.next(); return universe }
      switchPartition(mCurPartition + 1)
      mCurBase + partEnum.moveTo(0)
    }

    private def slowMove(): Long = {
      if (mPosition == n) {
        if (mPartitions > 1) switchPartition(mPartitions - 1)
        partEnum.moveTo(partEnum.size)
        return universe
      }
      switchPartition(mPosition >>> p.logPartitionSize)
      mCurBase + partEnum.moveTo(mPosition - mCurBegin)
    }

    private def slowNextGeq(lowerBound: Long): Long = {
      if (mPartitions == 1) {
        if (lowerBound < mCurBase) return moveTo(0)
        else return moveTo(size)
      }
      upperBounds.nextGeq(lowerBound)
      if (upperBounds.position == 0) return moveTo(0)
      if (upperBounds.position == upperBounds.size) return moveTo(size)
      switchPartition(upperBounds.position - 1)
      nextGeq(lowerBound)
    }

    private def switchPartition(partition: Long): Unit = {
      val endpoint =
        if (partition != 0)
          bv.getBits(mEndpointsOffset + (partition - 1) * mEndpointBits,
                     mEndpointBits)
        else 0L
      mCurPartition = partition
      mCurBegin = partition * partitionSize
      mCurEnd = math.min(n, (partition + 1) * partitionSize)
      mCurUpperBound = upperBounds.moveTo(partition + 1)
      mCurBase = upperBounds.prevValue + (if (partition != 0) 1L else 0L)
      partEnum = chunk.enumerator(bv, mSequencesOffset + endpoint,
                                  mCurUpperBound - mCurBase + 1,
                                  mCurEnd - mCurBegin, p)
    }
  }
}
