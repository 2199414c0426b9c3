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

  /** `tokens(text).length` without allocating: counts maximal [a-z0-9]
    * runs in one char scan, lowercasing ASCII inline. The hot path of
    * the docId-assignment len column — `tokens()` allocates a full
    * lowercased copy plus two arrays per doc, which profiled as pure
    * GC in the build's tokenize stages. Any non-ASCII char falls back
    * to the exact `tokens()` path (String.toLowerCase has multi-char
    * mappings, e.g. U+0130, that a char scan cannot reproduce). */
  def countTokens(text: String): Int = {
    val n = text.length
    var i = 0
    var cnt = 0
    var in = false
    while (i < n) {
      val c = text.charAt(i)
      if (c >= 128) return tokens(text).length
      val tok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
                (c >= '0' && c <= '9')
      if (tok && !in) cnt += 1
      in = tok
      i += 1
    }
    cnt
  }

  /** Per-document term frequencies without a token-level shuffle: one
    * hash-map pass per document (map-side combine by construction).
    * Tokenizes by direct char scan on ASCII (no full-text lowercase
    * copy, no regex, no token arrays — one String per token emitted is
    * the only allocation); non-ASCII input falls back to `tokens()`
    * for byte-exact agreement with the oracle tokenizer. */
  def termFreqs(text: String): Array[(String, Int)] = {
    val m = new java.util.HashMap[String, Int]()
    val inc: java.util.function.BiFunction[Int, Int, Int] = (a, b) => a + b
    val n = text.length
    var i = 0
    var ascii = true
    val sb = new java.lang.StringBuilder(24)
    while (ascii && i < n) {
      val c = text.charAt(i)
      if (c >= 128) ascii = false
      else {
        val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) sb.append(lc)
        else if (sb.length > 0) { m.merge(sb.toString, 1, inc); sb.setLength(0) }
        i += 1
      }
    }
    if (!ascii) {
      m.clear()
      tokens(text).foreach(t => m.merge(t, 1, inc))
    } else if (sb.length > 0) m.merge(sb.toString, 1, inc)
    val out = new Array[(String, Int)](m.size)
    var j = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); out(j) = (e.getKey, e.getValue); j += 1 }
    scala.util.Sorting.stableSort(out, (a: (String, Int), b: (String, Int)) => a._1 < b._1)
    out
  }
}

object DocIds {
  /** Dense docIDs by ORDER BY url, scalable: range-partition by url,
    * sort within partitions, per-partition counts -> prefix offsets ->
    * per-partition id assignment. No single-partition window.
    *
    * OWNERSHIP: the returned dataset is persisted (at `storage`) and
    * already materialized; the CALLER must `unpersist()` it when done —
    * in a long-lived session, un-freed assignments accumulate alongside
    * the build-internal caches (see BuiltIndex.release).
    *
    * Ids come from `zipWithIndex` over the sorted relation PINNED AT
    * THE RDD LEVEL. The pinning is a correctness requirement, not an
    * optimization: every Dataset action compiles a fresh physical plan
    * whose range exchange re-samples boundaries, so per-partition
    * offsets collected under one plan do not bind a later plan's
    * partitions (measured: 99,704/100,000 distinct ids and run-to-run
    * instability with an unpinned Dataset-level offset scheme). A
    * single RDD object shares its shuffle across all downstream jobs
    * (map stages are skipped on re-execution), and zipWithIndex fixes
    * its partition offsets once, so ids are stable however often the
    * lineage re-executes.
    *
    * `storage`: MEMORY_AND_DISK by default; pass DISK_ONLY when the
    * corpus exceeds executor memory (the bench/scaling path does) — the
    * cache then costs zero heap and reads back through the page cache.
    * `len` is computed on the MAP side of the sort, so re-executions
    * and cache misses never re-tokenize. */
  def assign(spark: SparkSession, corpus: Dataset[CorpusDoc],
             partitions: Int = 32,
             storage: org.apache.spark.storage.StorageLevel =
               org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      : Dataset[DocRow] = {
    import spark.implicits._
    // column-level select BEFORE the typed stages so Catalyst prunes the
    // scan to (url, text): a typed .map would deserialize whole rows and
    // drag the html payload (the bulk of a web corpus) through the sort.
    // len (tokens per doc) is computed here, before the shuffle: one
    // tokenize per doc total, carried as 4 bytes per row.
    val sorted = corpus.toDF()
      .select($"url", $"text").as[(String, String)]
      .map { case (url, text) => (url, text, Tokenize.countTokens(text)) }
      .toDF("url", "text", "len").as[(String, String, Int)]
      .repartitionByRange(partitions, $"url")
      .sortWithinPartitions($"url")
      .rdd // pin: one RDD instance = one sampled boundary set, reused
    val out = spark.createDataset(
      sorted.zipWithIndex().map { case ((url, text, len), id) =>
        DocRow(id, url, text, len)
      }).persist(storage)
    // materialize now: downstream consumers read one pinned cache
    // instead of re-sorting the corpus per action
    out.count()
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
    // persist the vocab-shaped aggregate BEFORE the range shuffle: the
    // RangePartitioner's sampling pass evaluates its whole input, so an
    // unpersisted aggregate would run the (tokens-sized) upstream agg
    // TWICE — once to sample boundaries, once to shuffle (measured
    // ~18 s of a 58 s 1.2M-doc build). The cache is vocab-sized rows.
    val pre = termDocFreqs
      .groupBy($"term")
      .agg(count(lit(1)).as("df"), sum($"tf").as("cf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val agg = pre
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
    // same lifecycle as DocIds.assign: materialize, free the aggregates
    out.count()
    agg.unpersist(blocking = false)
    pre.unpersist(blocking = false)
    out
  }
}
