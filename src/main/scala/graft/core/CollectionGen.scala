package graft.core

/** Seeded synthetic posting collection (reference fixture profile,
  * test_block_posting_list.cpp:50-66): shared by tests, profiling and
  * benchmarks. */
object CollectionGen {
  final case class Collection(numDocs: Int,
                              termDocs: Array[Array[Int]],
                              termFreqs: Array[Array[Int]],
                              normLens: Array[Float])

  def make(numDocs: Int = 20000, numTerms: Int = 30,
           seed: Long = 42L): Collection = {
    val rnd = new scala.util.Random(seed)
    val termDocs = new Array[Array[Int]](numTerms)
    val termFreqs = new Array[Array[Int]](numTerms)
    for (t <- 0 until numTerms) {
      val avgGap = 1.1 + rnd.nextDouble() * 10
      val n = math.max(1, (numDocs / avgGap).toInt - rnd.nextInt(10))
      val base = Array.fill(n)(rnd.nextInt(numDocs - n).toLong).sorted
      termDocs(t) = Array.tabulate(n)(i => (base(i) + i).toInt)
      termFreqs(t) = Array.fill(n)(rnd.nextInt(256) + 1)
    }
    val lens = Array.fill(numDocs)(50 + rnd.nextInt(250))
    val avgLen = lens.map(_.toDouble).sum / numDocs
    val normLens = lens.map(l => (l / avgLen).toFloat)
    Collection(numDocs, termDocs, termFreqs, normLens)
  }

  /** Zipf-profiled collection in the reference test-corpus regime
    * (test_collection: 10k docs, ~113k terms, mean len ~231): per-doc
    * terms drawn Zipf(1.1) over `vocab`, so list lengths follow the
    * head/tail skew of real web text. Also returns 500 queries sampled
    * half from head terms, half uniform (FIXTURES.md §3 profile). */
  final case class ZipfCollection(coll: Collection, queries: Array[Array[Int]])

  def zipf(numDocs: Int = 10000, vocab: Int = 50000,
           seed: Long = 42L): ZipfCollection = {
    val docTerms = new Array[Array[(Int, Int)]](numDocs)
    val lens = new Array[Int](numDocs)
    for (d <- 0 until numDocs) {
      val rnd = new scala.util.Random(seed + d)
      val len = 120 + rnd.nextInt(220)
      lens(d) = len
      val m = new java.util.HashMap[Integer, Integer]()
      var t = 0
      while (t < len) {
        val u = rnd.nextDouble()
        val term = math.min(vocab - 1, math.pow(u, -1.0 / 1.1).toInt - 1)
        m.merge(term, 1, (a: Integer, b: Integer) => a + b)
        t += 1
      }
      val arr = new Array[(Int, Int)](m.size)
      var i = 0
      val it = m.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
      docTerms(d) = arr.sortBy(_._1)
    }
    // invert to posting lists
    val byTerm = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.ArrayBuffer[(Int, Int)]]
    for (d <- 0 until numDocs; (term, tf) <- docTerms(d))
      byTerm.getOrElseUpdate(term, scala.collection.mutable.ArrayBuffer.empty) += ((d, tf))
    val presentTerms = byTerm.keys.toArray.sorted
    val termDocs = presentTerms.map(t => byTerm(t).map(_._1).toArray)
    val termFreqs = presentTerms.map(t => byTerm(t).map(_._2).toArray)
    val avgLen = lens.map(_.toDouble).sum / numDocs
    val normLens = lens.map(l => (l / avgLen).toFloat)
    val coll = Collection(numDocs, termDocs, termFreqs, normLens)

    val qrnd = new scala.util.Random(seed + 424242)
    val lenDist = Array(2, 2, 2, 3, 3, 3, 4, 4, 1, 5, 5, 6, 7, 1, 2, 3)
    val head = math.min(1000, termDocs.length)
    val queries = Array.fill(500) {
      val len = lenDist(qrnd.nextInt(lenDist.length))
      Array.fill(len)(
        if (qrnd.nextBoolean()) qrnd.nextInt(head)
        else qrnd.nextInt(termDocs.length))
    }
    ZipfCollection(coll, queries)
  }
}
