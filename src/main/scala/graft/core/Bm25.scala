package graft.core

/** Scoring model: all arithmetic in Float (IEEE-754 binary32), same
  * operation order as the reference, so scores are reproducible
  * bit-for-bit across runs and cluster sizes. */
trait Scorer extends Serializable {
  def docTermWeight(freq: Long, normLen: Float): Float
  def queryTermWeight(qtf: Long, df: Long, numDocs: Long): Float
}

/** BM25 with k1=1.2, b=0.5, float32 throughout
  * (/root/reference/bm25.hpp:7-25). idf computed as
  * (float) log((double) float32-ratio) — the JVM rendering of logf. */
object Bm25 extends Scorer {
  final val B = 0.5f
  final val K1 = 1.2f
  final val EpsilonScore = 1.0e-6f

  def docTermWeight(freq: Long, normLen: Float): Float = {
    val f = freq.toFloat
    f / (f + K1 * (1.0f - B + B * normLen))
  }

  def queryTermWeight(qtf: Long, df: Long, numDocs: Long): Float = {
    val f = qtf.toFloat
    val fdf = df.toFloat
    val ratio = (numDocs.toFloat - fdf + 0.5f) / (fdf + 0.5f)
    val idf = math.log(ratio.toDouble).toFloat
    f * math.max(EpsilonScore, idf) * (1.0f + K1)
  }
}

/** Integer term-frequency scorer (score = sum of tf). Exact in float32 up
  * to 2^24; used by the SQL-oracle-checked ranked queries. */
object TfScorer extends Scorer {
  def docTermWeight(freq: Long, normLen: Float): Float = freq.toFloat
  def queryTermWeight(qtf: Long, df: Long, numDocs: Long): Float = qtf.toFloat
}

/** Bounded top-k of (score, docId) with deterministic tie-break
  * (score desc, docId asc) — the reference keeps scores only
  * (queries.hpp:152-197); the north rule requires docIDs, so the heap
  * orders by (score asc, docId desc): the evicted element is always the
  * lowest score with the highest docId, making results independent of
  * arrival order among equals. */
final class TopKQueue(k: Int) {
  private val scores = new Array[Float](k)
  private val docs = new Array[Int](k)
  private var len = 0

  @inline private def worse(i: Int, j: Int): Boolean =
    scores(i) < scores(j) || (scores(i) == scores(j) && docs(i) > docs(j))

  def sizeNow: Int = len

  /** Current entry threshold (theta); -inf while not full. */
  def threshold: Float = if (len < k) Float.NegativeInfinity else scores(0)

  def wouldEnter(score: Float): Boolean = len < k || score > scores(0)

  def insert(score: Float, docId: Int): Boolean = {
    if (len < k) {
      scores(len) = score; docs(len) = docId; len += 1
      siftUp(len - 1)
      true
    } else if (score > scores(0) ||
               (score == scores(0) && docId < docs(0))) {
      scores(0) = score; docs(0) = docId
      siftDown(0)
      true
    } else false
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val parent = (i - 1) >> 1
      if (worse(i, parent)) { swap(i, parent); i = parent } else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < len && worse(l, m)) m = l
      if (r < len && worse(r, m)) m = r
      if (m == i) return
      swap(i, m)
      i = m
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = docs(i); docs(i) = docs(j); docs(j) = d
  }

  /** Descending (score, docId asc) results. */
  def finalized(): Array[(Int, Float)] = {
    val res = (0 until len).map(i => (docs(i), scores(i))).toArray
    res.sortBy { case (d, s) => (-s, d) }
  }

  def clear(): Unit = { len = 0 }
}
