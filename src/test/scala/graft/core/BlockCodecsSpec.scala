package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference block-codec grid
  * (/root/reference/test/test_block_codecs.cpp:9-46): sizes
  * {1, 16, blockSize-1, blockSize} x magnitudes 2^1..2^24 x
  * {known, unknown} sum_of_values, seeded mt19937(12345)-style; also
  * asserts the decoder consumes exactly the encoded bytes.
  */
class BlockCodecsSpec extends AnyFunSuite {

  private val codecs = Seq(InterpolativeCodec, OptPfdCodec, VarintCodec,
                           MixedCodec)

  private def roundTrip(codec: BlockCodec, values: Array[Int],
                        knownSum: Boolean): Unit = {
    val n = values.length
    val sum = if (knownSum) values.sum else -1
    val out = new ByteWriter()
    codec.encode(values, sum, n, out)
    val bytes = out.result()
    val decoded = new Array[Int](n)
    val consumed = codec.decode(bytes, 0, decoded, sum, n)
    assert(consumed == bytes.length,
           s"${codec.name} n=$n: consumed $consumed of ${bytes.length}")
    assert(decoded.sameElements(values),
           s"${codec.name} n=$n knownSum=$knownSum mismatch")
  }

  test("codec grid: sizes x magnitudes x known/unknown sum") {
    val rnd = new scala.util.Random(12345)
    for (codec <- codecs) {
      for (size <- Seq(1, 16, 127, 128)) {
        for (mag <- 1 to 24) {
          val bound = 1 << mag
          val values = Array.fill(size)(rnd.nextInt(bound))
          roundTrip(codec, values, knownSum = true)
          roundTrip(codec, values, knownSum = false)
        }
      }
    }
  }

  test("all-zero and all-equal blocks") {
    for (codec <- codecs) {
      roundTrip(codec, new Array[Int](128), knownSum = true)
      roundTrip(codec, Array.fill(128)(7), knownSum = false)
      roundTrip(codec, Array.fill(127)(1), knownSum = true)
      roundTrip(codec, Array(0), knownSum = true)
    }
  }

  test("skewed blocks exercise the exception path") {
    val rnd = new scala.util.Random(54321)
    for (codec <- codecs) {
      // mostly small with a few huge values -> OptPFD picks small b + exceptions
      val values = Array.tabulate(128) { i =>
        if (i % 17 == 0) (1 << 20) + rnd.nextInt(1 << 26) else rnd.nextInt(16)
      }
      roundTrip(codec, values, knownSum = false)
    }
    // values near the 2^31 boundary: only full blocks of the non-prefix-sum
    // codecs (interpolative prefix sums must stay < 2^31, same u32 contract
    // as the reference)
    for (codec <- Seq(OptPfdCodec, VarintCodec, MixedCodec)) {
      val big = Array.fill(128)(rnd.nextInt(Int.MaxValue))
      roundTrip(codec, big, knownSum = false)
    }
  }

  test("mixed codec picks the smallest candidate per block") {
    val rnd = new scala.util.Random(31337)
    for (_ <- 0 until 20) {
      val values = Array.fill(128)(rnd.nextInt(1 << (1 + rnd.nextInt(20))))
      val sizes = Seq(OptPfdCodec, VarintCodec, InterpolativeCodec).map { c =>
        val w = new ByteWriter(); c.encode(values, -1, 128, w); w.size
      }
      val w = new ByteWriter(); MixedCodec.encode(values, -1, 128, w)
      assert(w.size == sizes.min + 1, s"mixed ${w.size} vs min ${sizes.min}+tag")
    }
  }

  test("varint G8IU group byte format matches the published layout") {
    // Stepanov et al. SPIRE'11 / FastPFor VarIntG8IU: 1 descriptor + 8
    // data bytes; LE varints never spanning groups; the descriptor
    // starts at 0xFF and bit k is CLEARED where data byte k ends an
    // integer, so trailing padding bytes keep their bits set.
    // First group of [300, 5, 70000, 0x01020304, ...]:
    //   300   -> 2C 01        (ends at byte 1 -> clear bit 1)
    //   5     -> 05           (ends at byte 2 -> clear bit 2)
    //   70000 -> 70 11 01     (ends at byte 5 -> clear bit 5)
    //   0x01020304 needs 4 bytes, only 2 left -> padding 00 00
    // desc = 0xFF ^ 0b00100110 = 0xD9
    val vals = Array(300, 5, 70000, 0x01020304) ++ Array.fill(124)(7)
    val w = new ByteWriter()
    VarintCodec.encode(vals, -1, 128, w)
    val b = w.result()
    assert((b(0) & 0xff) == 0xd9, f"desc ${b(0)}%02x")
    assert(b.slice(1, 9).map(_ & 0xff).toSeq ==
           Seq(0x2c, 0x01, 0x05, 0x70, 0x11, 0x01, 0x00, 0x00))
    // second group: the deferred 4-byte integer (clear bit 3) then four
    // 7s filling bytes 4-7 (clear bits 4-7) -> desc 0xFF ^ 0xF8 = 0x07
    assert((b(9) & 0xff) == 0x07, f"desc2 ${b(9)}%02x")
    assert(b.slice(10, 18).map(_ & 0xff).toSeq ==
           Seq(0x04, 0x03, 0x02, 0x01, 0x07, 0x07, 0x07, 0x07))
    val out = new Array[Int](128)
    val consumed = VarintCodec.decode(b, 0, out, -1, 128)
    assert(consumed == b.length)
    assert(out.sameElements(vals))
  }

  test("Simple16 round-trip") {
    val rnd = new scala.util.Random(9)
    for (mag <- 1 to 27; n <- Seq(1, 5, 28, 100)) {
      val vals = Array.fill(n)(rnd.nextInt(1 << mag))
      val out = new ByteWriter()
      Simple16.encode(vals, 0, n, out)
      val bytes = out.result()
      val dec = new Array[Int](n)
      val consumed = Simple16.decode(bytes, 0, dec, 0, n)
      assert(consumed == bytes.length)
      assert(dec.sameElements(vals), s"mag=$mag n=$n")
    }
  }

  test("TightVByte single values") {
    for (v <- Seq(0, 1, 127, 128, 16383, 16384, Int.MaxValue)) {
      val out = new ByteWriter()
      TightVByte.encode(v, out)
      val packed = TightVByte.decode(out.result(), 0)
      assert(TightVByte.value(packed) == v)
      assert(TightVByte.offset(packed) == out.size)
    }
  }

  test("concatenated blocks decode sequentially") {
    val rnd = new scala.util.Random(2024)
    for (codec <- codecs) {
      val blocks = Seq.fill(5)(Array.fill(128)(rnd.nextInt(1 << 12))) :+
        Array.fill(45)(rnd.nextInt(1 << 12))
      val out = new ByteWriter()
      blocks.foreach(b => codec.encode(b, -1, b.length, out))
      val bytes = out.result()
      var off = 0
      for (b <- blocks) {
        val dec = new Array[Int](b.length)
        off = codec.decode(bytes, off, dec, -1, b.length)
        assert(dec.sameElements(b))
      }
      assert(off == bytes.length)
    }
  }
}
