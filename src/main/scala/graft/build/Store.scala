package graft.build

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.{DictEntry, DocRow}
import org.apache.hadoop.fs.Path

/** On-disk index layout (Parquet + JSON manifests):
  *
  *   dir/dict/            term dictionary
  *   dir/segments/        compressed posting lists (partitioned by shard)
  *   dir/norms/           per-shard BM25 norm arrays
  *   dir/meta.json        IndexMeta
  *   dir/manifests/shard-K.json   per-shard lineage + metrics
  *
  * The per-shard manifest is the resumable-construction checkpoint
  * (north rule): a shard is rebuilt iff its manifest is missing or does
  * not validate; deterministic encoding makes re-runs byte-identical
  * (the semiasync_queue ordered-commit property, semiasync_queue.hpp:12-96,
  * holds here because encode input order is fixed by the sorted shuffle).
  */
object IndexStore {

  /** On-disk segment-byte format version, recorded in every shard
    * manifest. Bump whenever any codec's byte layout changes (v2: the
    * Varint-G8IU descriptor-polarity fix — v1 varint/mixed bytes decode
    * as garbage under v2 code). A shard manifested under a different
    * version or index type is treated as MISSING by buildResumable and
    * rebuilt; without this, resuming across a format change silently
    * mixes incompatible shard bytes into one index. */
  final val FormatVersion = 2

  final case class ShardManifest(shard: Int, segments: Long, postings: Long,
                                 occ: Long, bytes: Long, inputDocs: Long,
                                 wallMillis: Long, indexType: String,
                                 builtAtEpochMs: Long, attempt: String,
                                 formatVersion: Int)

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeString(spark: SparkSession, path: String, content: String): Unit = {
    val f = fs(spark, path)
    val out = f.create(new Path(path), true)
    out.write(content.getBytes("UTF-8"))
    out.close()
  }

  private def readString(spark: SparkSession, path: String): Option[String] = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      in.close()
      Some(bytes.toString("UTF-8"))
    }
  }

  // minimal flat JSON (no nesting/escaping needs beyond plain keys)
  private def toJson(m: Seq[(String, Any)]): String =
    m.map { case (k, v) =>
      v match {
        case s: String => s""""$k": "$s""""
        case other => s""""$k": $other"""
      }
    }.mkString("{", ", ", "}")

  private def jsonField(json: String, key: String): Option[String] = {
    val r = ("\"" + key + "\"\\s*:\\s*\"?([^,}\"]+)\"?").r
    r.findFirstMatchIn(json).map(_.group(1).trim)
  }

  def metaToJson(meta: IndexMeta): String = toJson(Seq(
    "numDocs" -> meta.numDocs, "avgLen" -> meta.avgLen,
    "shardSize" -> meta.shardSize, "indexType" -> meta.indexType,
    "numTerms" -> meta.numTerms, "numPostings" -> meta.numPostings))

  def metaFromJson(json: String): IndexMeta = IndexMeta(
    jsonField(json, "numDocs").get.toLong,
    jsonField(json, "avgLen").get.toFloat,
    jsonField(json, "shardSize").get.toLong,
    jsonField(json, "indexType").get,
    jsonField(json, "numTerms").get.toLong,
    jsonField(json, "numPostings").get.toLong)

  /** Shards whose manifest validates: parseable, matching segment data
    * present, byte-format version current, and (when given) the expected
    * index type — a manifest written by older-format or different-family
    * code does not count as done. */
  def validShards(spark: SparkSession, dir: String,
                  indexType: Option[String] = None): Set[Int] = {
    val f = fs(spark, dir)
    val mdir = new Path(s"$dir/manifests")
    if (!f.exists(mdir)) return Set.empty
    f.listStatus(mdir).toSeq.flatMap { st =>
      val name = st.getPath.getName
      if (!name.startsWith("shard-") || !name.endsWith(".json")) None
      else readString(spark, st.getPath.toString).flatMap { js =>
        for {
          shard <- jsonField(js, "shard").map(_.toInt)
          ver <- jsonField(js, "formatVersion").map(_.toInt)
          if ver == FormatVersion
          if indexType.forall(t => jsonField(js, "indexType").contains(t))
          if f.exists(new Path(s"$dir/segments/shard=$shard"))
        } yield shard
      }
    }.toSet
  }

  /** Resumable build: skips shards with a valid manifest, builds the
    * rest, appends their data, writes their manifests. Returns the
    * loaded (complete) index. */
  def buildResumable(spark: SparkSession, docs: Dataset[DocRow],
                     indexType: String, shardSize: Long, dir: String,
                     buildPartitions: Int = 32): BuiltIndex = {
    import spark.implicits._
    val t0 = System.currentTimeMillis()
    val attempt = java.util.UUID.randomUUID().toString.take(8)

    val numDocs = docs.count()
    val allShards = (0 until ((numDocs + shardSize - 1) / shardSize).toInt).toSet
    val done = validShards(spark, dir, Some(indexType))
    val missing = allShards -- done

    if (missing.nonEmpty) {
      // crash-safety: a previous attempt may have appended segment/norm
      // rows for a shard and died before writing its manifest; appending
      // again would duplicate posting lists. Remove any unmanifested
      // shard data before rebuilding.
      val f = fs(spark, dir)
      missing.foreach { shard =>
        f.delete(new Path(s"$dir/segments/shard=$shard"), true)
        f.delete(new Path(s"$dir/norms/shard=$shard"), true)
      }
      val idx = IndexBuilder.build(spark, docs, indexType, shardSize,
                                   buildPartitions,
                                   onlyShards = Some(missing))
      val segs = idx.segments
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      segs.write.mode(SaveMode.Append).partitionBy("shard")
        .parquet(s"$dir/segments")
      idx.norms.filter(n => missing.contains(n.shard))
        .write.mode(SaveMode.Append).partitionBy("shard").parquet(s"$dir/norms")
      idx.dict.write.mode(SaveMode.Overwrite).parquet(s"$dir/dict")

      // per-shard metrics -> manifests (lineage: inputDocs, attempt id,
      // wall time, sizes)
      val stats = segs.groupByKey(_.shard).mapGroups { (shard, it) =>
        var nSegs = 0L; var nPost = 0L; var occ = 0L; var bytes = 0L
        it.foreach { s => nSegs += 1; nPost += s.n; occ += s.occ; bytes += s.bytes.length }
        (shard, nSegs, nPost, occ, bytes)
      }.collect()
      val wall = System.currentTimeMillis() - t0
      stats.foreach { case (shard, nSegs, nPost, occ, bytes) =>
        val m = toJson(Seq(
          "shard" -> shard, "segments" -> nSegs, "postings" -> nPost,
          "occ" -> occ, "bytes" -> bytes,
          "inputDocs" -> math.min(shardSize, numDocs - shard * shardSize),
          "wallMillis" -> wall, "indexType" -> indexType,
          "builtAtEpochMs" -> System.currentTimeMillis(),
          "attempt" -> attempt, "formatVersion" -> FormatVersion))
        writeString(spark, s"$dir/manifests/shard-$shard.json", m)
      }
      val totalPostings = stats.map(_._3).sum +
        done.toSeq.flatMap(s => readString(spark, s"$dir/manifests/shard-$s.json"))
          .flatMap(jsonField(_, "postings")).map(_.toLong).sum
      writeString(spark, s"$dir/meta.json",
                  metaToJson(idx.meta.copy(numPostings = totalPostings)))
      segs.unpersist()
      // everything is on disk now; free the build-internal caches (the
      // tokens-sized layout + dict) — resumable builds run in long-lived
      // sessions where leaked build caches accumulate across shards/gates
      idx.release()
    }
    read(spark, dir)
  }

  def read(spark: SparkSession, dir: String): BuiltIndex = {
    import spark.implicits._
    val meta = metaFromJson(readString(spark, s"$dir/meta.json")
      .getOrElse(throw new IllegalStateException(s"no meta.json in $dir")))
    val dict = spark.read.parquet(s"$dir/dict").as[DictEntry]
    val segments = spark.read.parquet(s"$dir/segments")
      .select($"termId", $"shard".cast("int").as("shard"), $"n", $"occ",
              $"firstDoc", $"lastDoc", $"bytes", $"blockMaxScores", $"maxScore")
      .as[Segment]
    val norms = spark.read.parquet(s"$dir/norms")
      .select($"shard".cast("int").as("shard"), $"numDocs", $"norms")
      .as[ShardNorms]
    BuiltIndex(meta, dict, segments, norms)
  }
}

/** Hierarchical segment merge: coarsen the docID sharding by an integral
  * factor — sub-lists of the same term in adjacent shards concatenate
  * (docIDs rebase to the new shard origin) and re-encode. Deterministic,
  * so merged output is byte-identical to building directly at the coarse
  * shard size (the write_blocks re-assembly path of
  * block_posting_list.hpp:55-82, done value-level).
  */
object Merge {
  def mergeShards(spark: SparkSession, index: BuiltIndex,
                  factor: Int): BuiltIndex = {
    import spark.implicits._
    require(factor >= 1)
    val meta = index.meta
    val newShardSize = meta.shardSize * factor
    val oldShardSize = meta.shardSize
    val indexType = meta.indexType
    val numDocs = meta.numDocs

    val newNorms = index.norms.groupByKey(_.shard / factor).mapGroups {
      (newShard, it) =>
        val parts = it.toArray.sortBy(_.shard)
        val total = parts.map(_.numDocs).sum
        val arr = new Array[Float](total)
        var off = 0
        parts.foreach { p =>
          // old shards are contiguous and dense within the new shard
          System.arraycopy(p.norms, 0, arr, off, p.numDocs)
          off += p.numDocs
        }
        ShardNorms(newShard, total, arr)
    }

    val newSegments = index.segments.groupByKey(_.shard / factor)
      .flatMapGroups { (newShard, it) =>
        val newBase = newShard.toLong * newShardSize
        val byTerm = it.toArray.groupBy(_.termId)
        val isBlock = IndexBuilder.BlockFamilies(indexType)
        val codec = if (isBlock) IndexBuilder.codecFor(indexType) else null
        val shardNumDocs = math.min(newShardSize, numDocs - newBase).toInt
        byTerm.iterator.map { case (termId, segsArr) =>
          val segs = segsArr.sortBy(_.shard)
          var total = 0
          segs.foreach(total += _.n)
          val docs = new Array[Int](total)
          val tfs = new Array[Int](total)
          var off = 0
          segs.foreach { s =>
            val oldBase = s.shard.toLong * oldShardSize
            val rebase = (oldBase - newBase).toInt
            val oldShardDocs = math.min(oldShardSize, numDocs - oldBase).toInt
            val en: graft.core.PostingEnum =
              if (isBlock) new graft.core.BlockPostingList.Enumerator(
                s.bytes, 0, oldShardDocs, codec)
              else new graft.core.EfPostingList.Enumerator(
                s.bytes, graft.core.EfFamily.byName(indexType), oldShardDocs)
            var i = 0
            while (i < s.n) {
              docs(off) = en.docId + rebase
              tfs(off) = en.freq
              en.next()
              off += 1
              i += 1
            }
          }
          // norms for block maxima: recompute from the tf-weighted scores
          // requires per-posting norms — pulled from the merged norm array
          // computed above; to keep this a single pass we recompute norms
          // locally from lastDoc metadata is impossible, so we re-derive
          // from the docs via the shard norms captured per group
          (termId, docs, tfs)
        }.map { case (termId, docs, tfs) =>
          (newShard, termId, docs, tfs, shardNumDocs)
        }
      }

    // attach per-posting norms via cogroup with the new norms, then encode
    val encoded = newSegments.groupByKey(_._1)
      .cogroup(newNorms.groupByKey(_.shard)) { (shard, segIt, normIt) =>
        val normArr = normIt.toSeq.headOption.map(_.norms).getOrElse(Array.empty[Float])
        segIt.map { case (_, termId, docs, tfs, shardNumDocs) =>
          val postingNorms = new Array[Float](docs.length)
          var i = 0
          while (i < docs.length) { postingNorms(i) = normArr(docs(i)); i += 1 }
          IndexBuilder.encodeSegment(indexType, termId, shard, shardNumDocs,
                                     docs, tfs, postingNorms)
        }
      }

    BuiltIndex(meta.copy(shardSize = newShardSize), index.dict, encoded,
               newNorms)
  }
}
