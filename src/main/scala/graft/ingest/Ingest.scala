package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical input row, per the target corpus shape: Common-Crawl-style
  * web pages (url, warc_ts, html, text, lang). */
final case class CorpusDoc(url: String, warc_ts: java.sql.Timestamp,
                           html: Array[Byte], text: String, lang: String)

final case class DocRow(docId: Long, url: String, text: String, len: Int)
final case class DictEntry(term: String, termId: Int, df: Long, cf: Long)
final case class Posting(termId: Int, docId: Long, tf: Int)

object Corpus {
  /** Deterministic synthetic web corpus (FIXTURES.md §1, seed-stable,
    * byte-identical text per url across runs and cluster sizes): Zipf(1.1)
    * tokens over a synthetic vocabulary, doc length ~ reference profile. */
  def synthetic(spark: SparkSession, n: Int, partitions: Int = 32): Dataset[CorpusDoc] = {
    import spark.implicits._
    val vocabSize = math.max(1000, 12 * math.min(n, 200000))
    spark.range(0, n.toLong, 1, partitions).map { i =>
      val idx = i.toInt
      val rnd = new scala.util.Random(42L + idx)
      val len = 30 + rnd.nextInt(400)
      val sb = new StringBuilder(len * 8)
      var t = 0
      while (t < len) {
        // Zipf(s=1.1) via inverse-power sampling
        val u = rnd.nextDouble()
        val rank = math.min(vocabSize - 1,
          math.pow(u, -1.0 / 1.1).toInt - 1)
        if (t > 0) sb.append(' ')
        // zero-padded "w%06d" without String.format (it dominated gen
        // time); identical output for any rank
        sb.append('w')
        val s = Integer.toString(rank)
        var p = 6 - s.length
        while (p > 0) { sb.append('0'); p -= 1 }
        sb.append(s)
        t += 1
      }
      val text = sb.toString
      val url = "https://example.org/doc/%010d".format(idx)
      CorpusDoc(url,
                new java.sql.Timestamp(1483228800000L + idx * 1000L),
                ("<html><body>" + text + "</body></html>").getBytes("UTF-8"),
                text, "en")
    }
  }

  /** Adapter: driver testdata `documents.parquet` (doc_id, text, lang, ...)
    * to the canonical corpus shape. urls are zero-padded doc_ids, so the
    * dense-rank-by-url docID contract maps docId == doc_id. */
  def fromDocumentsTable(spark: SparkSession, sfDir: String): Dataset[CorpusDoc] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text", $"lang")
      .map { r =>
        val id = r.getLong(0)
        CorpusDoc("https://example.org/doc/%012d".format(id),
                  new java.sql.Timestamp(1483228800000L + id * 1000L),
                  Array.emptyByteArray, r.getString(1), r.getString(2))
      }
  }
}

object Tokenize {
  /** Deterministic tokenizer: lowercase (Locale.ROOT) + split on
    * non-alphanumeric runs. Matches DuckDB
    * regexp_split_to_array(lower(text), '[^a-z0-9]+') on ASCII input. */
  def tokens(text: String): Array[String] =
    text.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Per-document term frequencies without a token-level shuffle: one
    * hash-map pass per document (map-side combine by construction). */
  def termFreqs(text: String): Array[(String, Int)] = {
    val m = new java.util.HashMap[String, Int]()
    tokens(text).foreach(t => m.merge(t, 1, (a: Int, b: Int) => a + b))
    val out = new Array[(String, Int)](m.size)
    var i = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); out(i) = (e.getKey, e.getValue); i += 1 }
    scala.util.Sorting.stableSort(out, (a: (String, Int), b: (String, Int)) => a._1 < b._1)
    out
  }
}

object DocIds {
  /** Dense docIDs by ORDER BY url, scalable: range-partition by url,
    * sort within partitions, per-partition counts -> prefix offsets ->
    * per-partition id assignment. No single-partition window.
    *
    * OWNERSHIP: the returned dataset is persisted and already
    * materialized; the CALLER must `unpersist()` it when done — in a
    * long-lived session, un-freed assignments accumulate alongside the
    * build-internal caches (see BuiltIndex.release). */
  def assign(spark: SparkSession, corpus: Dataset[CorpusDoc],
             partitions: Int = 32): Dataset[DocRow] = {
    import spark.implicits._
    // column-level select BEFORE the typed stages so Catalyst prunes the
    // scan to (url, text): a typed .map would deserialize whole rows and
    // drag the html payload (the bulk of a web corpus) through the sort
    val sorted = corpus.toDF()
      .select($"url", $"text").as[(String, String)]
      .repartitionByRange(partitions, $"url")
      .sortWithinPartitions($"url")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sorted.mapPartitions(it => Iterator.single(it.size)).collect()
    val offsets = counts.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val out = sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var next = bc.value(pid)
      it.map { case (url, text) =>
        val id = next
        next += 1
        DocRow(id, url, text, Tokenize.tokens(text).length)
      }
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the assignment now so the sorted intermediate can be
    // freed: holding both (~2x the corpus text) through the downstream
    // build steals execution memory from its sorts/aggs — observed as a
    // 16-core build spilling where a 4-core one did not. The range
    // shuffle is deterministic (seeded sampler), so eviction-driven
    // recompute of `out` is safe as well as unlikely.
    out.count()
    sorted.unpersist(blocking = false)
    out
  }
}

object Dictionary {
  /** Dense termIDs by ORDER BY term with global df/cf — same scalable
    * range-sort + offsets scheme. The reference presumes ids assigned
    * upstream in list order (/root/reference/README.md:68-70); this fixes
    * the contract to lexicographic term order.
    *
    * OWNERSHIP: the returned dataset is persisted and already
    * materialized; the CALLER must `unpersist()` it when done (same
    * contract as DocIds.assign). The fused IndexBuilder.build derives
    * its dictionary internally and frees it via BuiltIndex.release; this
    * standalone path exists for callers that need a dictionary without
    * an index. */
  def build(spark: SparkSession, termDocFreqs: DataFrame,
            partitions: Int = 32): Dataset[DictEntry] = {
    import spark.implicits._
    val agg = termDocFreqs
      .groupBy($"term")
      .agg(count(lit(1)).as("df"), sum($"tf").as("cf"))
      .repartitionByRange(partitions, $"term")
      .sortWithinPartitions($"term")
      .select($"term", $"df", $"cf")
      .as[(String, Long, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = agg.mapPartitions(it => Iterator.single(it.size)).collect()
    val offsets = counts.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val out = agg.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var next = bc.value(pid)
      it.map { case (term, df, cf) =>
        val id = next
        next += 1
        DictEntry(term, id.toInt, df, cf)
      }
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // same lifecycle as DocIds.assign: materialize, free the aggregate
    out.count()
    agg.unpersist(blocking = false)
    out
  }
}
