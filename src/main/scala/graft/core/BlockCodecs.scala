package graft.core

/** Growable little-endian byte buffer for block-codec output. */
final class ByteWriter(initial: Int = 64) {
  private var buf = new Array[Byte](initial)
  private var len = 0

  def size: Int = len

  private def ensure(extra: Int): Unit = {
    if (len + extra > buf.length) {
      var cap = buf.length
      while (cap < len + extra) cap <<= 1
      buf = java.util.Arrays.copyOf(buf, cap)
    }
  }

  def putByte(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }

  def putIntLE(v: Int): Unit = {
    ensure(4)
    buf(len) = v.toByte
    buf(len + 1) = (v >>> 8).toByte
    buf(len + 2) = (v >>> 16).toByte
    buf(len + 3) = (v >>> 24).toByte
    len += 4
  }

  def putBytes(b: Array[Byte], off: Int, n: Int): Unit = {
    ensure(n)
    System.arraycopy(b, off, buf, len, n)
    len += n
  }

  /** Patch a previously written little-endian int. */
  def patchIntLE(pos: Int, v: Int): Unit = {
    buf(pos) = v.toByte
    buf(pos + 1) = (v >>> 8).toByte
    buf(pos + 2) = (v >>> 16).toByte
    buf(pos + 3) = (v >>> 24).toByte
  }

  /** Reserve n zero bytes, returning their start offset. */
  def reserve(n: Int): Int = { ensure(n); val at = len; java.util.Arrays.fill(buf, at, at + n, 0.toByte); len += n; at }

  def byteAt(idx: Int): Int = buf(idx) & 0xff
  def byteSet(idx: Int, v: Int): Unit = buf(idx) = v.toByte

  def result(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
}

object ByteIo {
  @inline def getIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
    ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
}

/** 7-bit variable byte with MSB set on the LAST byte of each value —
  * exact bytes, no padding (/root/reference/block_codecs.hpp:17-99). */
object TightVByte {
  def encode(value: Int, out: ByteWriter): Unit = {
    var v = value
    while ((v & ~0x7f) != 0) {
      out.putByte(v & 0x7f)
      v >>>= 7
    }
    out.putByte(v | 0x80)
  }

  /** Decode one value; returns (value, newOffset) packed as a Long:
    * high 32 = value, low 32 = offset. */
  def decode(in: Array[Byte], offset: Int): Long = {
    var off = offset
    var shift = 0
    var v = 0
    var done = false
    while (!done) {
      val c = in(off) & 0xff
      v += (c & 0x7f) << shift
      off += 1
      shift += 7
      if ((c & 0x80) != 0) done = true
    }
    (v.toLong << 32) | (off.toLong & 0xffffffffL)
  }

  @inline def value(packed: Long): Int = (packed >>> 32).toInt
  @inline def offset(packed: Long): Int = packed.toInt
}

/** Bit writer/reader over little-endian 32-bit words with minimal binary
  * (centered) codes — the interpolative coding substrate
  * (/root/reference/interpolative_coding.hpp:10-153). */
final class IntBitWriter {
  private var buf = new Array[Int](16)
  private var words = 0
  private var sizeBits = 0L

  def size: Long = sizeBits

  def write(bits: Int, len: Int): Unit = {
    if (len == 0) return
    val posInWord = (sizeBits % 32).toInt
    sizeBits += len
    if (posInWord == 0) {
      if (words == buf.length) buf = java.util.Arrays.copyOf(buf, words * 2)
      buf(words) = bits
      words += 1
    } else {
      buf(words - 1) |= bits << posInWord
      if (len > 32 - posInWord) {
        if (words == buf.length) buf = java.util.Arrays.copyOf(buf, words * 2)
        buf(words) = bits >>> (32 - posInWord)
        words += 1
      }
    }
  }

  def writeInt(value: Int, u: Int): Unit = {
    // minimal binary (truncated) code for value in [0, u)
    val b = Bits.msb(u.toLong & 0xffffffffL)
    val m = (1L << (b + 1)) - (u.toLong & 0xffffffffL)
    if ((value.toLong & 0xffffffffL) < m) write(value, b)
    else {
      val v = value + m.toInt
      write(v >>> 1, b)
      write(v & 1, 1)
    }
  }

  def writeInterpolative(in: Array[Int], lo: Int, n: Int, low: Int, high: Int): Unit = {
    if (n == 0) return
    val h = n / 2
    val value = in(lo + h)
    writeInt(value - low, high - low + 1)
    writeInterpolative(in, lo, h, low, value)
    writeInterpolative(in, lo + h + 1, n - h - 1, value, high)
  }

  def writeTo(out: ByteWriter): Unit = {
    val bytes = ((sizeBits + 7) / 8).toInt
    var i = 0
    while (i < bytes) {
      out.putByte((buf(i >> 2) >>> ((i & 3) * 8)) & 0xff)
      i += 1
    }
  }
}

final class IntBitReader(in: Array[Byte], startOffset: Int) {
  private var off = startOffset
  private var avail = 0
  private var buf = 0L
  private var posBits = 0L

  def position: Long = posBits

  @inline private def nextWord(): Int = {
    // reads may run past the logical end inside the last partial word
    val b0 = if (off < in.length) in(off) & 0xff else 0
    val b1 = if (off + 1 < in.length) in(off + 1) & 0xff else 0
    val b2 = if (off + 2 < in.length) in(off + 2) & 0xff else 0
    val b3 = if (off + 3 < in.length) in(off + 3) & 0xff else 0
    off += 4
    b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
  }

  def read(len: Int): Int = {
    if (len == 0) return 0
    if (avail < len) {
      buf |= (nextWord().toLong & 0xffffffffL) << avail
      avail += 32
    }
    val v = (buf & ((1L << len) - 1)).toInt
    buf >>>= len
    avail -= len
    posBits += len
    v
  }

  def readInt(u: Int): Int = {
    val b = Bits.msb(u.toLong & 0xffffffffL)
    val m = (1L << (b + 1)) - (u.toLong & 0xffffffffL)
    var v = read(b)
    if ((v.toLong & 0xffffffffL) >= m) v = (v << 1) + read(1) - m.toInt
    v
  }

  def readInterpolative(out: Array[Int], lo: Int, n: Int, low: Int, high: Int): Unit = {
    val h = n / 2
    val value = low + readInt(high - low + 1)
    out(lo + h) = value
    if (n == 1) return
    if (h > 0) readInterpolative(out, lo, h, low, value)
    if (n - h - 1 > 0) readInterpolative(out, lo + h + 1, n - h - 1, value, high)
  }
}

/** Block codec contract: 128-value blocks of non-negative ints; partial
  * blocks (n < 128) always fall back to binary interpolative, exactly as
  * every reference block codec does (/root/reference/block_codecs.hpp:196-199).
  * `sumOfValues` = -1 means unknown (then the codec stores it itself). */
trait BlockCodec extends Serializable {
  final val blockSize = 128
  def name: String
  def encode(in: Array[Int], sumOfValues: Int, n: Int, out: ByteWriter): Unit
  /** Returns the offset just past the consumed bytes. */
  def decode(in: Array[Byte], offset: Int, out: Array[Int], sumOfValues: Int,
             n: Int): Int
}

/** Binary interpolative coding of prefix-summed values, center-recursive
  * (/root/reference/block_codecs.hpp:101-148). Fully deterministic. */
object InterpolativeCodec extends BlockCodec {
  def name = "interpolative"

  def encode(in: Array[Int], sumOfValues: Int, n: Int, out: ByteWriter): Unit = {
    require(n <= blockSize)
    val prefix = new Array[Int](n)
    prefix(0) = in(0)
    var i = 1
    while (i < n) { prefix(i) = prefix(i - 1) + in(i); i += 1 }
    var sum = sumOfValues
    if (sum == -1) {
      sum = prefix(n - 1)
      TightVByte.encode(sum, out)
    }
    val bw = new IntBitWriter()
    bw.writeInterpolative(prefix, 0, n - 1, 0, sum)
    bw.writeTo(out)
  }

  def decode(in: Array[Byte], offset: Int, out: Array[Int], sumOfValues: Int,
             n: Int): Int = {
    var off = offset
    var sum = sumOfValues
    if (sum == -1) {
      val packed = TightVByte.decode(in, off)
      sum = TightVByte.value(packed)
      off = TightVByte.offset(packed)
    }
    out(n - 1) = sum
    var readBytes = 0
    if (n > 1) {
      val br = new IntBitReader(in, off)
      br.readInterpolative(out, 0, n - 1, 0, sum)
      var i = n - 1
      while (i > 0) { out(i) -= out(i - 1); i -= 1 }
      readBytes = ((br.position + 7) / 8).toInt
    }
    off + readBytes
  }
}

/** Simple16: 28 payload bits per 32-bit word, 16 layouts
  * (Zhang, Long & Suel WWW'08; the exception coder of the reference's
  * OptPFD per /root/reference/block_codecs.hpp:152). */
object Simple16 {
  // (count, bit widths) per selector
  val widths: Array[Array[Int]] = Array(
    Array.fill(28)(1),
    Array.fill(7)(2) ++ Array.fill(14)(1),
    Array.fill(7)(1) ++ Array.fill(7)(2) ++ Array.fill(7)(1),
    Array.fill(14)(1) ++ Array.fill(7)(2),
    Array.fill(14)(2),
    Array(4) ++ Array.fill(8)(3),
    Array(3, 4, 4, 4, 4, 3, 3, 3),
    Array.fill(7)(4),
    Array(5, 5, 5, 5, 4, 4),
    Array(4, 4, 5, 5, 5, 5),
    Array(6, 6, 6, 5, 5),
    Array(5, 5, 6, 6, 6),
    Array.fill(4)(7),
    Array(10, 9, 9),
    Array(14, 14),
    Array(28))

  /** Encode `n` values (< 2^28 each) from in[off..), append 32-bit words. */
  def encode(in: Array[Int], off: Int, n: Int, out: ByteWriter): Unit = {
    var i = off
    val end = off + n
    while (i < end) {
      var sel = 0
      var chosen = -1
      var fitCount = 0
      while (sel < 16 && chosen < 0) {
        val w = widths(sel)
        var k = 0
        var ok = true
        while (ok && k < w.length && i + k < end) {
          if ((in(i + k) >>> w(k)) != 0) ok = false
          else k += 1
        }
        // selector fits if it packs min(w.length, remaining) values
        if (ok && (k == w.length || i + k == end)) { chosen = sel; fitCount = k }
        sel += 1
      }
      require(chosen >= 0, s"Simple16: value too large at $i: ${in(i)}")
      val w = widths(chosen)
      var word = chosen << 28
      var shift = 0
      var k = 0
      while (k < fitCount) {
        word |= in(i + k) << shift
        shift += w(k)
        k += 1
      }
      out.putIntLE(word)
      i += fitCount
    }
  }

  /** Decode exactly `n` values into out[off..); returns new byte offset. */
  def decode(in: Array[Byte], offset: Int, out: Array[Int], off: Int,
             n: Int): Int = {
    var byteOff = offset
    var produced = 0
    while (produced < n) {
      val word = ByteIo.getIntLE(in, byteOff)
      byteOff += 4
      val sel = word >>> 28
      val w = widths(sel)
      var shift = 0
      var k = 0
      while (k < w.length && produced < n) {
        out(off + produced) = (word >>> shift) & ((1 << w(k)) - 1)
        shift += w(k)
        produced += 1
        k += 1
      }
    }
    byteOff
  }
}

/** OptPFD: per-128-block bit width b chosen to minimize encoded bytes,
  * values >= 2^b become exceptions whose positions (as gaps) and high
  * bits are Simple16-coded — algorithmic re-derivation of the
  * reference's patched OPTPFor<4, Simple16>
  * (/root/reference/block_codecs.hpp:150-227; Yan, Ding & Suel WWW'09).
  * Layout: [b: u8][nExceptions: u8][Simple16 positions][Simple16 highs]
  * [packed 128*b bits]. Partial blocks fall back to interpolative.
  */
object OptPfdCodec extends BlockCodec {
  def name = "optpfd"

  private def packedBytes(b: Int): Int = (blockSize * b + 7) / 8

  /** Encoded size in bytes for width b, or -1 if infeasible. */
  private def sizeFor(in: Array[Int], n: Int, b: Int): Int = {
    if (b >= 32) return 2 + packedBytes(32)
    var exceptions = 0
    var i = 0
    var maxHigh = 0
    while (i < n) {
      val high = in(i) >>> b
      if (high != 0) { exceptions += 1; if (high > maxHigh) maxHigh = high }
      i += 1
    }
    if (exceptions > 255) return -1
    if (maxHigh != 0 && (32 - Integer.numberOfLeadingZeros(maxHigh)) > 28)
      return -1 // Simple16 cannot code the high parts
    // Simple16 words estimated exactly by encoding? cost estimate: do it.
    var extra = 0
    if (exceptions > 0) {
      val positions = new Array[Int](exceptions)
      val highs = new Array[Int](exceptions)
      collectExceptions(in, n, b, positions, highs)
      val tmp = new ByteWriter(64)
      Simple16.encode(positions, 0, exceptions, tmp)
      Simple16.encode(highs, 0, exceptions, tmp)
      extra = tmp.size
    }
    2 + extra + packedBytes(b)
  }

  private def collectExceptions(in: Array[Int], n: Int, b: Int,
                                positions: Array[Int], highs: Array[Int]): Unit = {
    var i = 0
    var e = 0
    var last = -1
    while (i < n) {
      if ((in(i) >>> b) != 0) {
        positions(e) = i - last - 1 // gap-coded positions
        highs(e) = in(i) >>> b
        last = i
        e += 1
      }
      i += 1
    }
  }

  def encode(in: Array[Int], sumOfValues: Int, n: Int, out: ByteWriter): Unit = {
    require(n <= blockSize)
    if (n < blockSize) { InterpolativeCodec.encode(in, sumOfValues, n, out); return }

    var bestB = 32
    var bestSize = sizeFor(in, n, 32)
    var b = 0
    while (b < 32) {
      val s = sizeFor(in, n, b)
      if (s >= 0 && s < bestSize) { bestSize = s; bestB = b }
      b += 1
    }

    out.putByte(bestB)
    if (bestB >= 32) {
      out.putByte(0)
      var i = 0
      while (i < n) { out.putIntLE(in(i)); i += 1 }
      return
    }
    var exceptions = 0
    var i = 0
    while (i < n) { if ((in(i) >>> bestB) != 0) exceptions += 1; i += 1 }
    out.putByte(exceptions)
    if (exceptions > 0) {
      val positions = new Array[Int](exceptions)
      val highs = new Array[Int](exceptions)
      collectExceptions(in, n, bestB, positions, highs)
      Simple16.encode(positions, 0, exceptions, out)
      Simple16.encode(highs, 0, exceptions, out)
    }
    // packed low bits
    val nBytes = packedBytes(bestB)
    val at = out.reserve(nBytes)
    if (bestB > 0) {
      var bitPos = 0L
      i = 0
      while (i < n) {
        val v = in(i) & ((1 << bestB) - 1)
        writeBitsInto(out, at, bitPos, v, bestB)
        bitPos += bestB
        i += 1
      }
    }
  }

  // patch bits into previously reserved zero bytes
  private def writeBitsInto(out: ByteWriter, base: Int, bitPos: Long, v: Int,
                            len: Int): Unit = {
    var remaining = len
    var value = v.toLong & 0xffffffffL
    var pos = bitPos
    while (remaining > 0) {
      val byteIdx = base + (pos >>> 3).toInt
      val bitInByte = (pos & 7).toInt
      val take = math.min(8 - bitInByte, remaining)
      val cur = outByte(out, byteIdx)
      outByteSet(out, byteIdx,
                 (cur | (((value & ((1L << take) - 1)) << bitInByte).toInt)) & 0xff)
      value >>>= take
      pos += take
      remaining -= take
    }
  }

  // ByteWriter internal access helpers
  private def outByte(out: ByteWriter, idx: Int): Int = out.byteAt(idx)
  private def outByteSet(out: ByteWriter, idx: Int, v: Int): Unit =
    out.byteSet(idx, v)

  def decode(in: Array[Byte], offset: Int, out: Array[Int], sumOfValues: Int,
             n: Int): Int = {
    if (n < blockSize)
      return InterpolativeCodec.decode(in, offset, out, sumOfValues, n)
    var off = offset
    val b = in(off) & 0xff
    val exceptions = in(off + 1) & 0xff
    off += 2
    if (b >= 32) {
      var i = 0
      while (i < n) { out(i) = ByteIo.getIntLE(in, off); off += 4; i += 1 }
      return off
    }
    val positions = new Array[Int](exceptions)
    val highs = new Array[Int](exceptions)
    if (exceptions > 0) {
      off = Simple16.decode(in, off, positions, 0, exceptions)
      off = Simple16.decode(in, off, highs, 0, exceptions)
    }
    // unpack low bits
    if (b == 0) java.util.Arrays.fill(out, 0, n, 0)
    else {
      var bitPos = off.toLong << 3
      var i = 0
      while (i < n) {
        out(i) = readBits(in, bitPos, b)
        bitPos += b
        i += 1
      }
    }
    off += packedBytes(b)
    // patch exceptions
    var e = 0
    var idx = -1
    while (e < exceptions) {
      idx += positions(e) + 1
      out(idx) |= highs(e) << b
      e += 1
    }
    off
  }

  @inline private def readBits(in: Array[Byte], bitPos: Long, len: Int): Int = {
    var v = 0L
    var got = 0
    var pos = bitPos
    while (got < len) {
      val byteIdx = (pos >>> 3).toInt
      val bitInByte = (pos & 7).toInt
      val take = math.min(8 - bitInByte, len - got)
      val bits = ((in(byteIdx) & 0xff) >>> bitInByte) & ((1 << take) - 1)
      v |= bits.toLong << got
      got += take
      pos += take
    }
    v.toInt
  }
}

/** Varint-G8IU (Stepanov et al., SPIRE'11), the exact group byte format
  * of the reference's varint blocks (block_codecs.hpp:229-315 over
  * FastPFor's VarIntG8IU): each group is 1 descriptor byte + 8 data
  * bytes; integers are little-endian 1-4 byte varints that never span
  * groups; the descriptor starts at 0xFF and bit k is CLEARED when data
  * byte k is the LAST byte of an integer — so unused trailing padding
  * bytes keep their bits SET (FastPFor initializes desc = 0xFF and
  * XOR-clears one bit per integer). The reference decodes groups with
  * SSSE3 shuffle tables — on the JVM the same bytes decode scalar,
  * bit-scanning the descriptor for clear bits. Partial blocks fall back
  * to interpolative exactly like the reference. */
object VarintCodec extends BlockCodec {
  def name = "varint"

  def encode(in: Array[Int], sumOfValues: Int, n: Int, out: ByteWriter): Unit = {
    require(n <= blockSize)
    if (n < blockSize) { InterpolativeCodec.encode(in, sumOfValues, n, out); return }
    var i = 0
    while (i < n) {
      val descAt = out.reserve(9) // descriptor + 8 data bytes (zeroed)
      var desc = 0xff
      var pos = 0
      var filled = true
      while (i < n && filled) {
        val v = in(i)
        val len =
          if ((v & 0xffffff00) == 0) 1
          else if ((v & 0xffff0000) == 0) 2
          else if ((v & 0xff000000) == 0) 3
          else 4
        if (pos + len > 8) filled = false
        else {
          var b = 0
          while (b < len) {
            out.byteSet(descAt + 1 + pos + b, (v >>> (8 * b)) & 0xff)
            b += 1
          }
          pos += len
          desc &= ~(1 << (pos - 1))
          i += 1
        }
      }
      out.byteSet(descAt, desc)
    }
  }

  def decode(in: Array[Byte], offset: Int, out: Array[Int], sumOfValues: Int,
             n: Int): Int = {
    if (n < blockSize)
      return InterpolativeCodec.decode(in, offset, out, sumOfValues, n)
    var off = offset
    var i = 0
    while (i < n) {
      val desc = in(off) & 0xff
      off += 1
      var start = 0
      var b = 0
      while (b < 8) {
        if ((desc & (1 << b)) == 0) {
          var v = 0
          var j = start
          while (j <= b) {
            v |= (in(off + j) & 0xff) << (8 * (j - start))
            j += 1
          }
          out(i) = v
          i += 1
          start = b + 1
        }
        b += 1
      }
      off += 8
    }
    off
  }
}

/** Mixed block codec: each full block carries a 1-byte codec tag and the
  * smallest encoding among {OptPFD, varint, interpolative} — the
  * space-optimal point of the reference's per-block space-time frontier
  * (/root/reference/mixed_block.hpp:10-218 with lambda -> infinity;
  * partial blocks are always interpolative there too). */
object MixedCodec extends BlockCodec {
  def name = "mixed"
  val candidates: Array[BlockCodec] =
    Array(OptPfdCodec, VarintCodec, InterpolativeCodec)
  final val OptPfdTag = 0
  final val VarintTag = 1
  final val InterpolativeTag = 2

  /** Encode a full block with an explicitly chosen codec tag (the
    * space-time optimizer's output path); partial blocks are tagless
    * interpolative like everywhere else. */
  def encodeWith(tag: Int, in: Array[Int], sumOfValues: Int, n: Int,
                 out: ByteWriter): Unit = {
    if (n < blockSize) { InterpolativeCodec.encode(in, sumOfValues, n, out); return }
    out.putByte(tag)
    candidates(tag).encode(in, sumOfValues, n, out)
  }

  def encode(in: Array[Int], sumOfValues: Int, n: Int, out: ByteWriter): Unit = {
    require(n <= blockSize)
    if (n < blockSize) { InterpolativeCodec.encode(in, sumOfValues, n, out); return }
    // interpolative prefix-sums values: only a valid candidate when the
    // sum stays inside u32 (the reference's implicit contract)
    var sum = 0L
    var i = 0
    while (i < n) { sum += (in(i).toLong & 0xffffffffL); i += 1 }
    val interpOk = sum <= Int.MaxValue && in.forall(_ >= 0)
    var bestTag = 0
    var best: Array[Byte] = null
    var tag = 0
    while (tag < candidates.length) {
      if (tag != 2 || interpOk) {
        val w = new ByteWriter()
        candidates(tag).encode(in, sumOfValues, n, w)
        val bytes = w.result()
        if (best == null || bytes.length < best.length) { best = bytes; bestTag = tag }
      }
      tag += 1
    }
    out.putByte(bestTag)
    out.putBytes(best, 0, best.length)
  }

  def decode(in: Array[Byte], offset: Int, out: Array[Int], sumOfValues: Int,
             n: Int): Int = {
    if (n < blockSize)
      return InterpolativeCodec.decode(in, offset, out, sumOfValues, n)
    val tag = in(offset) & 0xff
    candidates(tag).decode(in, offset + 1, out, sumOfValues, n)
  }
}

object BlockCodecs {
  val byName: Map[String, BlockCodec] = Map(
    "optpfd" -> OptPfdCodec,
    "interpolative" -> InterpolativeCodec,
    "varint" -> VarintCodec,
    "mixed" -> MixedCodec)
}
