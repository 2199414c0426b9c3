package graft.core

/** Elias gamma / delta codes over a BitWriter / BitsEnumerator.
  * Semantics per /root/reference/integer_codes.hpp:6-45 (values offset by
  * +1 so that 0 is encodable; little-endian unary prefix).
  */
object IntCodes {
  def writeGamma(bw: BitWriter, n: Long): Unit = {
    val nn = n + 1
    val l = Bits.msb(nn)
    bw.appendBits(1L << l, l + 1)
    bw.appendBits(nn ^ (1L << l), l)
  }

  def writeGammaNonZero(bw: BitWriter, n: Long): Unit = {
    require(n > 0)
    writeGamma(bw, n - 1)
  }

  def readGamma(it: BitsEnumerator): Long = {
    val l = it.skipZeros()
    (it.take(l) | (1L << l)) - 1
  }

  def readGammaNonZero(it: BitsEnumerator): Long = readGamma(it) + 1

  def writeDelta(bw: BitWriter, n: Long): Unit = {
    val nn = n + 1
    val l = Bits.msb(nn)
    writeGamma(bw, l.toLong)
    bw.appendBits(nn ^ (1L << l), l)
  }

  def readDelta(it: BitsEnumerator): Long = {
    val l = readGamma(it).toInt
    (it.take(l) | (1L << l)) - 1
  }
}
