package graft.core

/** Document enumerator over one posting list.
  *
  * DocIDs are shard-local Ints (universe = docs in shard, < 2^31); global
  * 10^12-scale docIDs are `shardBase + local` at the Spark layer. This
  * mirrors the reference's u32 docID space (binary_collection.hpp:15)
  * while the engine shards the corpus by docID range for web scale.
  * Exhausted enumerators return `universe` (numDocs) as docId — the +inf
  * sentinel of all DAAT merges (block_posting_list.hpp:115-117).
  */
trait PostingEnum {
  def size: Int
  def docId: Int
  def freq: Int
  def next(): Unit
  def nextGeq(lowerBound: Int): Unit
  def moveTo(pos: Int): Unit
  def position: Int
}

/** Block-compressed posting list, layout per
  * /root/reference/block_posting_list.hpp:13-53:
  * vbyte(n) | u32 block_maxs[blocks] (last docID per block) |
  * u32 block_endpoints[blocks-1] | per block: codec(d-gaps with known
  * gap-universe), codec(freqs-1, unknown sum). Gaps are doc-last-1.
  */
object BlockPostingList {

  def write(out: ByteWriter, codec: BlockCodec, docs: Array[Int],
            freqs: Array[Int]): Unit = {
    val n = docs.length
    require(n > 0, "posting list must be nonempty")
    TightVByte.encode(n, out)
    val bs = codec.blockSize
    val blocks = (n + bs - 1) / bs
    val beginBlockMaxs = out.size
    out.reserve(4 * blocks)          // block_maxs
    val beginBlockEndpoints = out.size
    if (blocks > 1) out.reserve(4 * (blocks - 1))
    val beginBlocks = out.size

    val docsBuf = new Array[Int](bs)
    val freqsBuf = new Array[Int](bs)
    var lastDoc = -1
    var blockBase = 0
    var b = 0
    while (b < blocks) {
      val curSize = if ((b + 1) * bs <= n) bs else n % bs
      var i = 0
      while (i < curSize) {
        val doc = docs(b * bs + i)
        docsBuf(i) = doc - lastDoc - 1
        lastDoc = doc
        freqsBuf(i) = freqs(b * bs + i) - 1
        i += 1
      }
      out.patchIntLE(beginBlockMaxs + 4 * b, lastDoc)
      codec.encode(docsBuf, lastDoc - blockBase - (curSize - 1), curSize, out)
      codec.encode(freqsBuf, -1, curSize, out)
      if (b != blocks - 1)
        out.patchIntLE(beginBlockEndpoints + 4 * b, out.size - beginBlocks)
      blockBase = lastDoc + 1
      b += 1
    }
  }

  /** Convenience: encode one list into a standalone byte array. */
  def encode(codec: BlockCodec, docs: Array[Int], freqs: Array[Int]): Array[Byte] = {
    val out = new ByteWriter(docs.length * 2 + 16)
    write(out, codec, docs, freqs)
    out.result()
  }

  /** Raw per-block view: (index, size, docGapUniverse, docGaps, freqsMinus1)
    * — the get_blocks/block_data access path of the reference
    * (block_posting_list.hpp:213-284), used for re-compression. */
  final case class BlockData(index: Int, size: Int, docGapUniverse: Int,
                             docGaps: Array[Int], freqsMinus1: Array[Int],
                             blockMaxDoc: Int)

  def blockData(data: Array[Byte], startOffset: Int,
                codec: BlockCodec): Array[BlockData] = {
    val packed = TightVByte.decode(data, startOffset)
    val n = TightVByte.value(packed)
    val base = TightVByte.offset(packed)
    val bs = codec.blockSize
    val blocks = (n + bs - 1) / bs
    val blockMaxsOff = base
    val blocksDataOff = blockMaxsOff + 4 * blocks + 4 * (blocks - 1)
    val out = new Array[BlockData](blocks)
    var ptr = blocksDataOff
    var b = 0
    while (b < blocks) {
      val curSize = if ((b + 1) * bs <= n) bs else n % bs
      val curBase = (if (b != 0) ByteIo.getIntLE(data, blockMaxsOff + 4 * (b - 1)) else -1) + 1
      val blockMax = ByteIo.getIntLE(data, blockMaxsOff + 4 * b)
      val gapUniverse = blockMax - curBase - (curSize - 1)
      val gaps = new Array[Int](curSize)
      val freqs = new Array[Int](curSize)
      ptr = codec.decode(data, ptr, gaps, gapUniverse, curSize)
      ptr = codec.decode(data, ptr, freqs, -1, curSize)
      out(b) = BlockData(b, curSize, gapUniverse, gaps, freqs, blockMax)
      b += 1
    }
    out
  }

  /** Re-assemble a list from per-block codec choices into the mixed
    * (tag-byte) format readable by MixedCodec — the write_blocks path
    * (block_posting_list.hpp:55-82). `docTags`/`freqTags` index into
    * MixedCodec's candidate table; partial blocks stay interpolative. */
  def writeMixed(out: ByteWriter, n: Int, blocksIn: Array[BlockData],
                 docTags: Array[Int], freqTags: Array[Int]): Unit = {
    TightVByte.encode(n, out)
    val blocks = blocksIn.length
    val beginBlockMaxs = out.size
    out.reserve(4 * blocks)
    val beginBlockEndpoints = out.size
    if (blocks > 1) out.reserve(4 * (blocks - 1))
    val beginBlocks = out.size
    var b = 0
    while (b < blocks) {
      val bd = blocksIn(b)
      out.patchIntLE(beginBlockMaxs + 4 * b, bd.blockMaxDoc)
      MixedCodec.encodeWith(docTags(b), bd.docGaps, bd.docGapUniverse,
                            bd.size, out)
      MixedCodec.encodeWith(freqTags(b), bd.freqsMinus1, -1, bd.size, out)
      if (b != blocks - 1)
        out.patchIntLE(beginBlockEndpoints + 4 * b, out.size - beginBlocks)
      b += 1
    }
  }

  /** Per-list block access counters, layout [2*b] = docs-block decodes,
    * [2*b+1] = freqs-block decodes (reference block_profiler.hpp:9-63). */
  final class Enumerator(data: Array[Byte], startOffset: Int, universe: Int,
                         codec: BlockCodec,
                         profile: Array[Long] = null) extends PostingEnum {
    private val bs = codec.blockSize
    private var mBase = 0
    private var nVal = 0
    locally {
      val packed = TightVByte.decode(data, startOffset)
      nVal = TightVByte.value(packed)
      mBase = TightVByte.offset(packed)
    }
    private val n: Int = nVal
    private val blocks = (n + bs - 1) / bs
    private val blockMaxsOff = mBase
    private val blockEndpointsOff = blockMaxsOff + 4 * blocks
    private val blocksDataOff = blockEndpointsOff + 4 * (blocks - 1)

    private val docsBuf = new Array[Int](bs)
    private val freqsBuf = new Array[Int](bs)
    private var curBlock = 0
    private var posInBlock = 0
    private var curBlockMax = 0
    private var curBlockSize = 0
    private var curDocId = 0
    private var freqsOffset = 0
    private var freqsDecoded = false
    private var endOffset = 0 // offset past the whole list (known after last block decode)

    decodeDocsBlock(0)

    def size: Int = n
    def numBlocks: Int = blocks
    def currentBlock: Int = curBlock
    def docId: Int = curDocId
    def position: Int = curBlock * bs + posInBlock

    def blockMax(b: Int): Int = ByteIo.getIntLE(data, blockMaxsOff + 4 * b)

    def freq: Int = {
      if (!freqsDecoded) decodeFreqsBlock()
      freqsBuf(posInBlock) + 1
    }

    def next(): Unit = {
      posInBlock += 1
      if (posInBlock == curBlockSize) {
        if (curBlock + 1 == blocks) { curDocId = universe; return }
        decodeDocsBlock(curBlock + 1)
      } else {
        curDocId += docsBuf(posInBlock) + 1
      }
    }

    def nextGeq(lowerBound: Int): Unit = {
      if (lowerBound > curBlockMax) {
        // linear scan over block maxes (binary search performs worse here,
        // block_posting_list.hpp:129 comment)
        if (lowerBound > blockMax(blocks - 1)) { curDocId = universe; return }
        var block = curBlock + 1
        while (blockMax(block) < lowerBound) block += 1
        decodeDocsBlock(block)
      }
      while (curDocId < lowerBound) {
        posInBlock += 1
        curDocId += docsBuf(posInBlock) + 1
      }
    }

    def moveTo(pos: Int): Unit = {
      if (pos >= n) { curDocId = universe; return }
      val block = pos / bs
      if (block != curBlock) decodeDocsBlock(block)
      else if (pos < position) decodeDocsBlock(block) // rewind within block
      while (position < pos) {
        posInBlock += 1
        curDocId += docsBuf(posInBlock) + 1
      }
    }

    /** Offset past the end of the list; requires decoding the last block. */
    def end(): Int = {
      if (curBlock != blocks - 1) decodeDocsBlock(blocks - 1)
      if (!freqsDecoded) decodeFreqsBlock()
      endOffset
    }

    private def decodeDocsBlock(block: Int): Unit = {
      val endpoint =
        if (block != 0) ByteIo.getIntLE(data, blockEndpointsOff + 4 * (block - 1))
        else 0
      val blockData = blocksDataOff + endpoint
      curBlockSize = if ((block + 1) * bs <= n) bs else n % bs
      val curBase = (if (block != 0) blockMax(block - 1) else -1) + 1
      curBlockMax = blockMax(block)
      freqsOffset = codec.decode(data, blockData, docsBuf,
                                 curBlockMax - curBase - (curBlockSize - 1),
                                 curBlockSize)
      docsBuf(0) += curBase
      curBlock = block
      posInBlock = 0
      curDocId = docsBuf(0)
      freqsDecoded = false
      if (profile != null) profile(2 * block) += 1
    }

    private def decodeFreqsBlock(): Unit = {
      val after = codec.decode(data, freqsOffset, freqsBuf, -1, curBlockSize)
      if (curBlock == blocks - 1) endOffset = after
      freqsDecoded = true
      if (profile != null) profile(2 * curBlock + 1) += 1
    }
  }
}

/** Elias-Fano-family posting list (reference freq_index families,
  * index_types.hpp:18-32): docs via a pluggable SequenceKind, freqs via
  * prefix-summed positive sequence. Header per freq_index.hpp:70-81:
  * gamma_nz(occurrences) | n in ceil_log2(occ+1) bits if occ>1 |
  * gamma(docsBits) [ours: needed since docs+freqs share one row] |
  * docs bits | freqs bits.
  */
final case class EfFamily(name: String, docs: SequenceKind,
                          freqsBase: SequenceKind) extends Serializable

object EfFamily {
  val ef = EfFamily("ef", CompactEfKind, StrictKind)
  val single = EfFamily("single", IndexedKind, StrictKind)
  val uniform = EfFamily("uniform", UniformPartitionedSequence.indexed,
                         UniformPartitionedSequence.strict)
  val opt = EfFamily("opt", PartitionedSequence.indexed,
                     PartitionedSequence.strict)
  val byName: Map[String, EfFamily] =
    Seq(ef, single, uniform, opt).map(f => f.name -> f).toMap
}

object EfPostingList {

  def encode(family: EfFamily, numDocs: Int, docs: Array[Int],
             freqs: Array[Int], p: SeqParams = SeqParams.default): Array[Byte] = {
    val n = docs.length
    require(n > 0)
    var occ = 0L
    freqs.foreach(occ += _)
    val docsBits = new BitWriter()
    family.docs.write(docsBits, i => docs(i).toLong, numDocs.toLong, n.toLong, p)
    val freqsBits = new BitWriter()
    PositiveSeq.write(freqsBits, i => freqs(i).toLong, occ + 1, n.toLong, p,
                      family.freqsBase)
    val bw = new BitWriter()
    IntCodes.writeGammaNonZero(bw, occ)
    if (occ > 1) bw.appendBits(n.toLong, Bits.ceilLog2(occ + 1))
    IntCodes.writeGamma(bw, docsBits.size)
    bw.append(docsBits)
    bw.append(freqsBits)
    val bv = bw.result()
    // prefix the bit length so fromBytes can reconstruct
    val out = new ByteWriter()
    TightVByte.encode(bv.sizeBits.toInt, out)
    out.putBytes(bv.bytes, 0, ((bv.sizeBits + 7) / 8).toInt)
    out.result()
  }

  final class Enumerator(bytes: Array[Byte], family: EfFamily, numDocs: Int,
                         p: SeqParams = SeqParams.default) extends PostingEnum {
    private val (bv, headerStart) = {
      val packed = TightVByte.decode(bytes, 0)
      val sizeBits = TightVByte.value(packed)
      val off = TightVByte.offset(packed)
      (BitVector.fromBytes(java.util.Arrays.copyOfRange(bytes, off, bytes.length),
                           sizeBits.toLong), 0L)
    }
    private val it = new BitsEnumerator(bv, headerStart)
    private val occurrences: Long = IntCodes.readGammaNonZero(it)
    private val n: Int =
      if (occurrences > 1) it.take(Bits.ceilLog2(occurrences + 1)).toInt else 1
    private val docsBits: Long = IntCodes.readGamma(it)
    private val docsEnum: SeqEnum =
      family.docs.enumerator(bv, it.position, numDocs.toLong, n.toLong, p)
    private val freqsEnum =
      new PositiveSeq.Enumerator(bv, it.position + docsBits, occurrences + 1,
                                 n.toLong, p, family.freqsBase)

    docsEnum.moveTo(0)

    def size: Int = n
    def docId: Int = docsEnum.value.toInt
    def position: Int = docsEnum.position.toInt
    def freq: Int = freqsEnum.moveTo(docsEnum.position).toInt
    def next(): Unit = docsEnum.next()
    def nextGeq(lowerBound: Int): Unit = docsEnum.nextGeq(lowerBound.toLong)
    def moveTo(pos: Int): Unit = docsEnum.moveTo(pos.toLong)
  }
}
