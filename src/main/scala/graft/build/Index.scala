package graft.build

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.ingest._

/** One compressed posting (sub-)list: term x docID-shard.
  *
  * The shard IS the salt for head-term skew (SURVEY.md §7.4.2): a
  * stop-word's postings split into docID-contiguous sub-lists bounded by
  * shardSize, each encodable independently and in parallel; shard-local
  * docIDs stay in u32 like the reference's (binary_collection.hpp:15),
  * global docID = shard * shardSize + local. blockMaxScores is the
  * per-128-posting-block max BM25 doc_term_weight (the block-max WAND
  * sidecar, extending wand_data.hpp:20-53 to block granularity).
  */
final case class Segment(termId: Int, shard: Int, n: Int, occ: Long,
                         firstDoc: Long, lastDoc: Long,
                         bytes: Array[Byte],
                         blockMaxScores: Array[Float], maxScore: Float)

/** Per-shard BM25 length norms (wand_data.hpp:20-32: len / avgLen,
  * float32). */
final case class ShardNorms(shard: Int, numDocs: Int, norms: Array[Float])

final case class IndexMeta(numDocs: Long, avgLen: Float, shardSize: Long,
                           indexType: String, numTerms: Long,
                           numPostings: Long)

/** In-memory handle on a built index (datasets remain distributed). */
final case class BuiltIndex(meta: IndexMeta,
                            dict: Dataset[DictEntry],
                            segments: Dataset[Segment],
                            norms: Dataset[ShardNorms])

object IndexBuilder {

  val BlockFamilies = Set("block_optpfor", "block_interpolative",
                          "block_varint", "block_mixed")

  def codecFor(indexType: String): BlockCodec = indexType match {
    case "block_optpfor" => OptPfdCodec
    case "block_interpolative" => InterpolativeCodec
    case "block_varint" => VarintCodec
    case "block_mixed" => MixedCodec
    case other => throw new IllegalArgumentException(s"not a block type: $other")
  }

  /** Encode one (termId, shard) run. Postings must be docID-sorted. */
  def encodeSegment(indexType: String, termId: Int, shard: Int,
                    shardNumDocs: Int, docs: Array[Int], tfs: Array[Int],
                    normLens: Array[Float]): Segment = {
    val n = docs.length
    var occ = 0L
    var maxScore = 0.0f
    val blocks = (n + 127) / 128
    val blockMax = new Array[Float](blocks)
    var i = 0
    while (i < n) {
      occ += tfs(i)
      val s = Bm25.docTermWeight(tfs(i).toLong, normLens(i))
      val b = i >>> 7
      if (s > blockMax(b)) blockMax(b) = s
      if (s > maxScore) maxScore = s
      i += 1
    }
    val bytes =
      if (BlockFamilies(indexType))
        BlockPostingList.encode(codecFor(indexType), docs, tfs)
      else
        EfPostingList.encode(EfFamily.byName(indexType), shardNumDocs, docs, tfs)
    Segment(termId, shard, n, occ, docs(0).toLong, docs(n - 1).toLong,
            bytes, blockMax, maxScore)
  }

  /** Full build: corpus docs -> dictionary -> postings -> compressed
    * docID-sorted segments + norms + meta.
    *
    * Plan shape (scale notes):
    *  - per-doc tokenize carries (term, tf, len): no token-level shuffle,
    *    no postings-x-norms join (normLen = len/avgLen is computed from
    *    the carried len and the broadcast scalar avgLen);
    *  - one shuffle to group postings by (termId, shard) via
    *    repartition + sortWithinPartitions; encode is a streaming
    *    mapPartitions over consecutive runs (the deterministic
    *    parallel-prepare/ordered-commit of semiasync_queue.hpp:12-96 is
    *    exactly Spark's sorted-shuffle contract);
    *  - head-term skew is bounded by shardSize (docID-range salting).
    */
  def build(spark: SparkSession, docs: Dataset[DocRow], indexType: String,
            shardSize: Long = 1L << 22,
            buildPartitions: Int = 32,
            onlyShards: Option[Set[Int]] = None,
            dictBroadcast: Option[Boolean] = None): BuiltIndex = {
    import spark.implicits._

    val docsP = docs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (numDocs, sumLen) = docsP.agg(count(lit(1)), sum($"len"))
      .as[(Long, Long)].head()
    require(numDocs > 0, "empty corpus")
    val avgLen = (sumLen.toDouble / numDocs.toDouble).toFloat

    // (term, docId, tf, len)
    val termFreqs = docsP.flatMap { d =>
      Tokenize.termFreqs(d.text).map { case (t, tf) => (t, d.docId, tf, d.len) }
    }.toDF("term", "docId", "tf", "len")

    val dict = Dictionary.build(spark, termFreqs.select($"term", $"tf"),
                                buildPartitions)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // broadcast only a genuinely small dictionary — a large broadcast
    // serializes on the driver and caps scaling; callers that know the
    // vocabulary shape can skip the sizing job entirely
    val (numTerms, useBroadcast) = dictBroadcast match {
      case Some(b) => (-1L, b)
      case None =>
        val n = dict.count()
        (n, n <= 200000)
    }
    val dictCols = dict.select($"term", $"termId")
    val dictJoin = if (useBroadcast) broadcast(dictCols) else dictCols
    val postings = termFreqs.join(dictJoin, "term")
      .select($"termId", $"docId", $"tf", $"len")

    val shardSizeL = shardSize
    val avgLenF = avgLen
    val numDocsL = numDocs
    val idxType = indexType

    val withShard = postings
      .withColumn("shard", ($"docId" / lit(shardSizeL)).cast("int"))
    val filtered = onlyShards match {
      case Some(s) => withShard.filter($"shard".isin(s.toSeq: _*))
      case None => withShard
    }

    val segments = filtered
      .repartition(buildPartitions, $"termId", $"shard")
      .sortWithinPartitions($"termId", $"shard", $"docId")
      .select($"termId", $"shard", $"docId", $"tf", $"len")
      .as[(Int, Int, Long, Int, Int)]
      .mapPartitions { it =>
        new Iterator[Segment] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): Segment = {
            val (termId, shard, _, _, _) = buf.head
            val docsB = new scala.collection.mutable.ArrayBuilder.ofInt
            val tfsB = new scala.collection.mutable.ArrayBuilder.ofInt
            val normsB = new scala.collection.mutable.ArrayBuilder.ofFloat
            val base = shard.toLong * shardSizeL
            while (buf.hasNext && buf.head._1 == termId && buf.head._2 == shard) {
              val (_, _, docId, tf, len) = buf.next()
              docsB += (docId - base).toInt
              tfsB += tf
              normsB += len.toFloat / avgLenF
            }
            val shardNumDocs =
              math.min(shardSizeL, numDocsL - base).toInt
            encodeSegment(idxType, termId, shard, shardNumDocs,
                          docsB.result(), tfsB.result(), normsB.result())
          }
        }
      }

    // per-shard norm arrays for query-time scoring
    val norms = docsP
      .map(d => (((d.docId / shardSizeL).toInt), (d.docId % shardSizeL).toInt,
                 d.len))
      .groupByKey(_._1)
      .mapGroups { (shard, it) =>
        val entries = it.toArray.sortBy(_._2)
        val arr = new Array[Float](entries.length)
        entries.foreach { case (_, local, len) => arr(local) = len.toFloat / avgLenF }
        ShardNorms(shard, entries.length, arr)
      }

    val numPostings = 0L // filled when persisted; avoid an extra job here
    BuiltIndex(IndexMeta(numDocs, avgLen, shardSize, indexType, numTerms,
                         numPostings),
               dict, segments, norms)
  }
}
