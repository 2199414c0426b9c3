package graft.core

/** Bit-level foundation for the compressed-sequence kernel.
  *
  * Capabilities mirror the succinct bitvector primitives the reference
  * engine builds on (see /root/reference/compact_elias_fano.hpp:63-417 for
  * the operations required: positional set/get, fixed-width reads at
  * arbitrary bit offsets, unary (select-style) enumeration with one/zero
  * skips, and predecessor-1 queries). Implementation is from scratch on
  * JVM longs; only the *semantics* follow the reference.
  */
object Bits {
  /** floor(log2(x)) for x > 0. */
  @inline def msb(x: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(x)

  /** ceil(log2(x)): number of bits needed to represent values in [0, x). */
  @inline def ceilLog2(x: Long): Int = if (x > 1) msb(x - 1) + 1 else 0

  @inline def mask(len: Int): Long = if (len >= 64) -1L else (1L << len) - 1

  /** Position (0-indexed from LSB) of the k-th (0-indexed) set bit of w. */
  def selectInWord(w: Long, k: Long): Int = {
    var word = w
    var i = k
    while (i > 0) { word &= word - 1; i -= 1 }
    java.lang.Long.numberOfTrailingZeros(word)
  }
}

/** Growable little-endian bit buffer (appends + random-access patching). */
final class BitWriter(initialWords: Int = 4) {
  private var words = new Array[Long](math.max(initialWords, 1))
  private var bits = 0L

  def size: Long = bits

  private def ensureWords(nWords: Int): Unit = {
    if (nWords > words.length) {
      var cap = words.length
      while (cap < nWords) cap = cap * 2
      words = java.util.Arrays.copyOf(words, cap)
    }
  }

  /** Append the low `len` bits of `value` (0 <= len <= 64). */
  def appendBits(value: Long, len: Int): Unit = {
    if (len == 0) return
    val v = value & Bits.mask(len)
    val off = (bits & 63).toInt
    val w = (bits >>> 6).toInt
    ensureWords(w + 2)
    words(w) |= v << off
    if (off + len > 64) words(w + 1) = v >>> (64 - off)
    bits += len
  }

  /** Append `n` zero bits. */
  def zeroExtend(n: Long): Unit = {
    bits += n
    ensureWords(((bits + 63) >>> 6).toInt + 1)
  }

  /** Set a single bit at absolute position `pos` (< size). */
  def set(pos: Long): Unit = {
    words((pos >>> 6).toInt) |= 1L << (pos & 63).toInt
  }

  /** Patch `len` bits at absolute position `pos` (region must be zero). */
  def setBits(pos: Long, value: Long, len: Int): Unit = {
    if (len == 0) return
    val v = value & Bits.mask(len)
    val off = (pos & 63).toInt
    val w = (pos >>> 6).toInt
    words(w) |= v << off
    if (off + len > 64) words(w + 1) |= v >>> (64 - off)
  }

  /** Append the whole content of another writer. */
  def append(other: BitWriter): Unit = {
    val oWords = other.wordsView
    val oBits = other.size
    var copied = 0L
    var i = 0
    while (copied < oBits) {
      val len = math.min(64L, oBits - copied).toInt
      appendBits(oWords(i), len)
      i += 1
      copied += len
    }
  }

  private[core] def wordsView: Array[Long] = words

  def result(): BitVector = {
    val nWords = ((bits + 63) >>> 6).toInt
    // one word of slack so readers can over-read harmlessly
    new BitVector(java.util.Arrays.copyOf(words, nWords + 1), bits)
  }
}

/** Immutable bit vector; `words` has >= 1 slack word beyond `sizeBits`. */
final class BitVector(val words: Array[Long], val sizeBits: Long) {

  @inline def get(pos: Long): Boolean =
    ((words((pos >>> 6).toInt) >>> (pos & 63).toInt) & 1L) != 0

  /** Read `len` (<= 64) bits starting at absolute bit offset `pos`. */
  @inline def getBits(pos: Long, len: Int): Long = {
    if (len == 0) return 0L
    val off = (pos & 63).toInt
    val w = (pos >>> 6).toInt
    if (off + len <= 64) (words(w) >>> off) & Bits.mask(len)
    else ((words(w) >>> off) | (words(w + 1) << (64 - off))) & Bits.mask(len)
  }

  /** Position of the last set bit at position <= pos; requires one exists. */
  def predecessor1(pos: Long): Long = {
    var w = (pos >>> 6).toInt
    val off = (pos & 63).toInt
    var word = words(w) & (if (off == 63) -1L else (1L << (off + 1)) - 1)
    while (word == 0) { w -= 1; word = words(w) }
    (w.toLong << 6) + Bits.msb(word)
  }

  def bytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(words)
    bb.array()
  }
}

object BitVector {
  def fromBytes(b: Array[Byte], sizeBits: Long): BitVector = {
    val nWords = (b.length + 7) / 8
    val words = new Array[Long](nWords + 1)
    val bb = java.nio.ByteBuffer.wrap(java.util.Arrays.copyOf(b, nWords * 8))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().get(words, 0, nWords)
    new BitVector(words, sizeBits)
  }
}

/** Sequential bit reader: fixed-width takes + zero-run skips (for gamma). */
final class BitsEnumerator(bv: BitVector, start: Long) {
  private var pos = start

  def position: Long = pos

  def take(len: Int): Long = {
    val v = bv.getBits(pos, len)
    pos += len
    v
  }

  /** Consume the run of zeros up to and including the next 1; return the
    * number of zeros consumed. */
  def skipZeros(): Int = {
    val startPos = pos
    var w = (pos >>> 6).toInt
    var off = (pos & 63).toInt
    var word = bv.words(w) >>> off
    while (word == 0) {
      w += 1
      off = 0
      pos = w.toLong << 6
      word = bv.words(w)
    }
    val tz = java.lang.Long.numberOfTrailingZeros(word)
    pos += tz + 1
    (pos - startPos - 1).toInt
  }
}

/** Select-style scanner over set (or unset) bits.
  *
  * Semantics (matching the reference's usage contract,
  * compact_elias_fano.hpp:163-335):
  *  - `next()` returns the position of the first 1 at >= scan point and
  *    consumes it (the bit reads as 0 for subsequent skip0 calls).
  *  - `skip(k)` lands ON the k-th (0-indexed) remaining 1 without
  *    consuming it, so a following next() returns that position.
  *  - `skip0(k)` lands ON the k-th (0-indexed) remaining 0, where bits
  *    already consumed by next() count as zeros.
  */
final class UnaryEnum(bv: BitVector, startPos: Long) {
  private val data = bv.words
  private var pos = startPos
  private var buf: Long = {
    val off = (startPos & 63).toInt
    data((startPos >>> 6).toInt) & (-1L << off)
  }

  def position: Long = pos

  /** Copy current scan state (cheap; used by small-skip fast paths). */
  def fork(): UnaryEnum = {
    val e = new UnaryEnum(bv, 0L)
    e.pos = pos
    e.buf = buf
    e
  }

  private[core] def assignFrom(o: UnaryEnum): Unit = { pos = o.pos; buf = o.buf }

  def next(): Long = {
    var b = buf
    var wordBase = pos & ~63L
    while (b == 0) {
      wordBase += 64
      b = data((wordBase >>> 6).toInt)
    }
    val posInWord = java.lang.Long.numberOfTrailingZeros(b)
    buf = b & (b - 1) // consume
    pos = wordBase + posInWord
    pos
  }

  def skip(k: Long): Unit = {
    var remaining = k
    var b = buf
    var wordBase = pos & ~63L
    var c = java.lang.Long.bitCount(b)
    while (c <= remaining) {
      remaining -= c
      wordBase += 64
      b = data((wordBase >>> 6).toInt)
      c = java.lang.Long.bitCount(b)
    }
    val posInWord = Bits.selectInWord(b, remaining)
    buf = b & (-1L << posInWord) // land on it, unconsumed
    pos = wordBase + posInWord
  }

  def skip0(k: Long): Unit = {
    var remaining = k
    var wordBase = pos & ~63L
    var b = ~buf & (-1L << (pos & 63).toInt)
    var c = java.lang.Long.bitCount(b)
    while (c <= remaining) {
      remaining -= c
      wordBase += 64
      b = ~data((wordBase >>> 6).toInt)
      c = java.lang.Long.bitCount(b)
    }
    val posInWord = Bits.selectInWord(b, remaining)
    pos = wordBase + posInWord
    buf = data((wordBase >>> 6).toInt) & (-1L << posInWord)
  }
}
