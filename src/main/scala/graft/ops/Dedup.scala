package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.Tokenize

/** Web-corpus deduplication operators: exact (hash groupBy), n-gram
  * Jaccard (shingle inverted index + pair verification), MinHash+LSH
  * (band-bucket join), SimHash (segment-blocked Hamming). All
  * deterministic and expressed Spark-first: the candidate generation is
  * a self-join on a blocking key, never an all-pairs crossJoin, so the
  * plans scale as sum-of-bucket^2 rather than corpus^2. */
object Dedup {

  /** Exact duplicate groups by content hash. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("text_hash"))
      .groupBy("text_hash")
      .agg(count(lit(1)).cast("long").as("dup_count"),
           min("doc_id").as("keeper_doc_id"))
      .filter(col("dup_count") >= 2)
      .orderBy("text_hash")

  /** Token k-shingles of a document, distinct. Documents with fewer than
    * k tokens have NO shingles (matches the oracle's n-gram definition,
    * generate_series(1, len-k+1) yielding nothing) — returning a partial
    * shingle would pair all short/empty docs through "". */
  def shingles(text: String, k: Int): Array[String] = {
    val toks = Tokenize.tokens(text)
    if (toks.length < k) Array.empty
    else (0 to toks.length - k).map(i => toks.slice(i, i + k).mkString(" "))
      .distinct.toArray
  }

  /** Exact n-gram Jaccard near-duplicate pairs, two-phase:
    *
    * 1. CANDIDATES from a shingle inverted index restricted to shingles
    *    with document frequency <= `maxShingleDf`, requiring >=
    *    `minCoOccur` shared cold shingles. The df cap bounds every
    *    bucket (a shingle shared by M docs otherwise yields M^2/2 rows —
    *    at corpus scale one boilerplate shingle would dominate the job);
    *    the co-occurrence floor drops the long tail of pairs sharing a
    *    single random shingle, which dominates verification cost. Pairs
    *    whose overlap is only hot shingles or a single shingle are
    *    missed — at threshold >= 0.5 those are not near-duplicates.
    * 2. EXACT verification: candidate pairs join their full (uncapped)
    *    per-doc shingle sets and intersect them, so reported jaccard
    *    values are exact — phase 1 only affects which pairs are probed.
    */
  def ngramJaccardPairs(spark: SparkSession, docs: DataFrame, k: Int = 3,
                        threshold: Double = 0.5,
                        maxShingleDf: Int = 200,
                        minCoOccur: Int = 2): DataFrame = {
    import spark.implicits._
    val sh = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) => shingles(text, k).map(s => (id, s)) }
      .toDF("doc_id", "shingle")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // candidate pairs in ONE shuffle: group postings by shingle, drop
    // hot buckets, emit each bucket's doc pairs directly. A sort-merge
    // self-join on shingle would shuffle the posting stream twice and
    // materialize the same pairs through a join — this is the inverted-
    // index pair-emission shape, bounded per bucket by the df cap.
    val cand = sh.groupBy("shingle")
      .agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")).between(2, maxShingleDf))
      .select(col("ds")).as[Array[Long]]
      .flatMap { ds =>
        val s = ds.sorted
        for {
          i <- s.indices.iterator
          j <- (i + 1) until s.length
        } yield (s(i), s(j))
      }
      .toDF("doc_a", "doc_b")
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCoOccur)
      .select("doc_a", "doc_b")
    val sets = sh.groupBy("doc_id")
      .agg(collect_set(col("shingle")).as("ss"),
           count(lit(1)).cast("long").as("sz"))
    val out = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("ss").as("ss_a"),
                        col("sz").as("sz_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("ss").as("ss_b"),
                        col("sz").as("sz_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("ss_a"), col("ss_b"))).cast("long"))
      .withColumn("uni", col("sz_a") + col("sz_b") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni").cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "inter", "uni", "jaccard")
      .orderBy("doc_a", "doc_b")
    // sh feeds four consumers (df cap, both sides of the candidate
    // self-join, the verification sets); materialize the small pair
    // output eagerly so the big shingle cache can be released here
    // instead of leaking into the caller's session
    val result = out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    result.count()
    sh.unpersist()
    result
  }

  // ---------------------------------------------------------------- MinHash

  final val MinHashPrime = (1L << 61) - 1

  /** First 8 bytes of MD5 as a non-negative Long — the shingle
    * fingerprint (stable across JVMs). */
  def fp64(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v & Long.MaxValue
  }

  /** Deterministic permutation parameters. */
  def perms(numPerms: Int, seed: Long): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPerms)((math.abs(rnd.nextLong()) % (MinHashPrime - 1) + 1,
                          math.abs(rnd.nextLong()) % MinHashPrime))
  }

  def minhashSignature(shingleFps: Array[Long],
                       ps: Array[(Long, Long)]): Array[Long] = {
    val sig = Array.fill(ps.length)(Long.MaxValue)
    var i = 0
    while (i < shingleFps.length) {
      val x = shingleFps(i)
      var j = 0
      while (j < ps.length) {
        val (a, b) = ps(j)
        // (a*x + b) mod p with p = 2^61-1 via 128-bit-free reduction
        val h = java.lang.Math.floorMod(
          multiplyHighMod(a, x, b), MinHashPrime)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** (a*x + b) mod (2^61-1) using Math.multiplyHigh for the 128-bit
    * product; Mersenne-prime folding. */
  private def multiplyHighMod(a: Long, x: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, x)
    val lo = a * x
    // fold 128-bit (hi, lo) mod 2^61-1: value = hi*2^64 + lo;
    // 2^64 mod p = 8, since 2^61 = 1 (mod p)
    val loMod = (lo & MinHashPrime) + (lo >>> 61)
    val hiMod = java.lang.Math.floorMod(hi, MinHashPrime) * 8 % MinHashPrime
    (loMod + hiMod + java.lang.Math.floorMod(b, MinHashPrime)) % MinHashPrime
  }

  /** MinHash + LSH near-duplicate candidates: `numPerms` permutations in
    * bands of `rowsPerBand`; docs sharing any band bucket are verified
    * with the signature-estimated similarity. */
  def minhashLsh(spark: SparkSession, docs: DataFrame, k: Int = 3,
                 numPerms: Int = 128, rowsPerBand: Int = 4,
                 threshold: Double = 0.8, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val ps = spark.sparkContext.broadcast(perms(numPerms, seed))
    // docs with no shingles have no MinHash signature (an all-MaxValue
    // sentinel signature would bucket every short doc together)
    val sigs = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val fps = shingles(text, k).map(fp64)
        if (fps.isEmpty) None
        else Some((id, minhashSignature(fps, ps.value)))
      }.toDF("doc_id", "sig")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = numPerms / rowsPerBand
    val banded = sigs.as[(Long, Array[Long])].flatMap { case (id, sig) =>
      (0 until bands).map { b =>
        val slice = sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)
        (b, slice.mkString(","), id)
      }
    }.toDF("band", "bucket", "doc_id")
    val l = banded.as("l")
    val r = banded.as("r")
    val cand = l.join(r, col("l.band") === col("r.band") &&
                         col("l.bucket") === col("r.bucket") &&
                         col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    // estimate similarity from full signatures
    val sa = sigs.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sig", "sig_a")
    val sb = sigs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sig", "sig_b")
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .as[(Long, Long, Array[Long], Array[Long])]
      .map { case (b, a, sb2, sa2) =>
        var eq = 0
        var i = 0
        while (i < sa2.length) { if (sa2(i) == sb2(i)) eq += 1; i += 1 }
        (a, b, eq.toDouble / sa2.length)
      }.toDF("doc_a", "doc_b", "est_jaccard")
      .filter(col("est_jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"),
              floor(col("est_jaccard") * 1000).cast("long").as("est_jaccard_x1000"))
      .orderBy("doc_a", "doc_b")
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash over tf-weighted token fingerprints. */
  def simhash(text: String): Long = {
    val acc = new Array[Int](64)
    Tokenize.termFreqs(text).foreach { case (term, tf) =>
      val h = fp64(term)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += tf else acc(b) -= tf
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  /** Near-dup pairs with Hamming distance <= maxDist, blocked on 16-bit
    * segments (pigeonhole: dist <= 3 guarantees one equal segment). */
  def simhashPairs(spark: SparkSession, docs: DataFrame,
                   maxDist: Int = 3): DataFrame = {
    import spark.implicits._
    require(maxDist <= 3, "4-segment blocking covers maxDist <= 3")
    val hashed = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, simhash(t)) }
      .toDF("doc_id", "simhash")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seg = hashed.as[(Long, Long)].flatMap { case (id, h) =>
      (0 until 4).map(s => (s, (h >>> (s * 16)) & 0xffffL, id, h))
    }.toDF("seg", "key", "doc_id", "simhash")
    val l = seg.as("l")
    val r = seg.as("r")
    l.join(r, col("l.seg") === col("r.seg") && col("l.key") === col("r.key") &&
              col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
              col("l.simhash").as("ha"), col("r.simhash").as("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
      .orderBy("doc_a", "doc_b")
  }
}
