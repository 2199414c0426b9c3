package graft.query

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.build._
import graft.ingest.DictEntry

/** A query: id + term strings (duplicates allowed; folded into query-term
  * multiplicity exactly like queries.hpp:133-150). */
final case class Query(queryId: Int, terms: Array[String])

final case class RankedHit(queryId: Int, rank: Int, docId: Long, score: Float)
final case class CountResult(queryId: Int, matches: Long)

/** Distributed query serving: queries are broadcast; each docID shard
  * runs the DAAT kernel over its segments (partition pruning on termId
  * keeps untouched lists unread); per-shard top-ks merge into a global
  * top-k ordered (score desc, docId asc). For a single shard this is
  * exactly the reference's single-node execution.
  */
object Engine {

  final val Ops = Seq("and", "or", "ranked_and", "ranked_or", "wand",
                      "maxscore", "block_max_wand")

  /** Resolve term strings -> (termId, df) for the query terms only (tiny
    * collect; the full dictionary never reaches the driver). */
  private def resolveTerms(spark: SparkSession, dict: Dataset[DictEntry],
                           queries: Seq[Query]): Map[String, (Int, Long)] = {
    import spark.implicits._
    val wanted = queries.flatMap(_.terms).distinct
    dict.filter($"term".isin(wanted: _*))
      .map(e => (e.term, (e.termId, e.df)))
      .collect().toMap
  }

  /** Per-shard kernel run over the shard's (filtered) segments. */
  private def runShard(op: String, scorer: Scorer, meta: IndexMeta,
                       k: Int,
                       queries: Array[(Int, Array[(Int, Int, Long)], Boolean)], // (qid, [(termId, qtf, df)], someTermUnknown)
                       segs: Map[Int, Segment],
                       norms: Array[Float],
                       shard: Int): Iterator[(Int, Long, Float, Long)] = {
    // returns (queryId, docIdGlobal, score, matches) rows; for boolean ops
    // score is 0 and matches carries the count
    val base = shard.toLong * meta.shardSize
    val shardNumDocs = norms.length
    val isBlock = IndexBuilder.BlockFamilies(meta.indexType)
    val codec = if (isBlock) IndexBuilder.codecFor(meta.indexType) else null
    val family = if (isBlock) null else EfFamily.byName(meta.indexType)

    queries.iterator.flatMap { case (qid, qterms, unknownTerm) =>
      val present = qterms.filter(t => segs.contains(t._1))
      val conjunctive = op == "and" || op == "ranked_and"
      if (present.isEmpty || (conjunctive && unknownTerm)) {
        // a conjunction with an out-of-vocabulary term matches nothing
        if (op == "and" || op == "or") Iterator.single((qid, -1L, 0.0f, 0L))
        else Iterator.empty
      } else if (op == "and" && present.length != qterms.length) {
        // a conjunction with a term absent from this shard matches nothing
        Iterator.single((qid, -1L, 0.0f, 0L))
      } else {
        def openEnum(termId: Int): PostingEnum =
          if (isBlock)
            new BlockPostingList.Enumerator(segs(termId).bytes, 0,
                                            shardNumDocs, codec)
          else
            new EfPostingList.Enumerator(segs(termId).bytes, family,
                                         shardNumDocs)
        op match {
          case "and" =>
            val enums = present.map(t => openEnum(t._1))
            Iterator.single((qid, -1L, 0.0f,
                             Daat.andCount(enums, shardNumDocs)))
          case "or" =>
            val enums = present.map(t => openEnum(t._1))
            Iterator.single((qid, -1L, 0.0f,
                             Daat.orCount(enums, shardNumDocs)))
          case _ =>
            val lists = present.map { case (termId, qtf, df) =>
              val en = openEnum(termId)
              val qw = scorer.queryTermWeight(qtf.toLong, df, meta.numDocs)
              val seg = segs(termId)
              new Daat.ScoredList(en, qw, qw * seg.maxScore,
                                  if (isBlock) en.asInstanceOf[BlockPostingList.Enumerator] else null,
                                  seg.blockMaxScores)
            }
            val top = op match {
              case "ranked_or" => Daat.rankedOr(lists, norms, shardNumDocs, k, scorer)
              case "ranked_and" =>
                if (present.length != qterms.length) Array.empty[(Int, Float)]
                else Daat.rankedAnd(lists, norms, shardNumDocs, k, scorer)
              case "wand" => Daat.wand(lists, norms, shardNumDocs, k, scorer)
              case "maxscore" => Daat.maxscore(lists, norms, shardNumDocs, k, scorer)
              case "block_max_wand" =>
                require(isBlock, "block_max_wand requires a block index")
                Daat.blockMaxWand(lists, norms, shardNumDocs, k, scorer)
              case other => throw new IllegalArgumentException(other)
            }
            top.iterator.map { case (d, s) => (qid, base + d, s, 0L) }
        }
      }
    }
  }

  /** Ranked top-k (op in ranked_and/ranked_or/wand/maxscore/block_max_wand). */
  def topK(spark: SparkSession, index: BuiltIndex, queries: Seq[Query],
           op: String, k: Int = 10,
           scorer: Scorer = Bm25): Dataset[RankedHit] = {
    import spark.implicits._
    val rows = shardResults(spark, index, queries, op, k, scorer)
    // global merge: top-k per query by (score desc, docId asc)
    rows.groupByKey(_._1).flatMapGroups { (qid, it) =>
      val all = it.toArray.sortBy { case (_, d, s, _) => (-s, d) }
      all.take(k).iterator.zipWithIndex.map { case ((_, d, s, _), r) =>
        RankedHit(qid, r + 1, d, s)
      }
    }
  }

  /** Boolean counts (op in and/or). */
  def count(spark: SparkSession, index: BuiltIndex, queries: Seq[Query],
            op: String): Dataset[CountResult] = {
    import spark.implicits._
    val rows = shardResults(spark, index, queries, op, 0, Bm25)
    // one distributed pass; the per-query counts are tiny (one row per
    // query), so the zero-fill for queries no shard touched happens
    // driver-side instead of a second evaluation of the shard cogroup
    val got = rows.groupByKey(_._1).mapGroups { (qid, it) =>
      CountResult(qid, it.map(_._4).sum)
    }.collect()
    val gotIds = got.map(_.queryId).toSet
    val all = got.toSeq ++
      queries.map(_.queryId).filterNot(gotIds).map(CountResult(_, 0L))
    spark.createDataset(all)
  }

  private def shardResults(spark: SparkSession, index: BuiltIndex,
                           queries: Seq[Query], op: String, k: Int,
                           scorer: Scorer)
      : Dataset[(Int, Long, Float, Long)] = {
    import spark.implicits._
    val termInfo = resolveTerms(spark, index.dict, queries)
    val resolved: Array[(Int, Array[(Int, Int, Long)], Boolean)] = queries.map { q =>
      // query_freqs: termId-sorted (termId, qtf, df)
      val qts = q.terms.flatMap(termInfo.get).groupBy(identity).toArray
        .map { case ((tid, df), occurrences) => (tid, occurrences.length, df) }
        .sortBy(_._1)
      val unknown = q.terms.exists(t => !termInfo.contains(t))
      (q.queryId, qts, unknown)
    }.toArray
    val neededTerms = resolved.flatMap(_._2.map(_._1)).distinct.toSet
    val bcQueries = spark.sparkContext.broadcast(resolved)
    val bcMeta = spark.sparkContext.broadcast(index.meta)
    val opL = op
    val kL = k
    val scorerL = scorer

    // Column predicate (not a typed lambda) so the filter pushes down to
    // the parquet scan / cached-batch pruning instead of deserializing
    // every segment row
    val filteredSegs = index.segments
      .filter(org.apache.spark.sql.functions.col("termId")
        .isin(neededTerms.toSeq: _*))
    filteredSegs.groupByKey(_.shard)
      .cogroup(index.norms.groupByKey(_.shard)) { (shard, segIt, normIt) =>
        val norms = normIt.toSeq.headOption.map(_.norms).getOrElse(Array.empty)
        if (norms.isEmpty) Iterator.empty
        else {
          val segs = segIt.map(s => s.termId -> s).toMap
          if (segs.isEmpty) Iterator.empty
          else runShard(opL, scorerL, bcMeta.value, kL, bcQueries.value,
                        segs, norms, shard)
        }
      }
  }
}
