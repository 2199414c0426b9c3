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
}
