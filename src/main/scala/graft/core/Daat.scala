package graft.core

/** Document-at-a-time query kernels over K posting enumerators —
  * boolean AND/OR, exhaustive ranked AND/OR, WAND, MaxScore, and
  * block-max WAND (/root/reference/queries.hpp:35-591; BMW per
  * Ding & Suel SIGIR'11 on top of the same loop).
  *
  * DocIDs are shard-local Ints; `numDocs` doubles as the +inf sentinel.
  * Score accumulation order replicates the reference so float32 results
  * are bit-reproducible: ranked_and accumulates in increasing-list-size
  * order, ranked_or/wand/maxscore in the order lists are opened
  * (termId-ascending after query_freqs).
  */
object Daat {

  final case class QueryTerm(termId: Int, qtf: Int)

  /** Collapse duplicate query terms into (termId, multiplicity), sorted by
    * termId (queries.hpp:133-150). */
  def queryFreqs(termIds: Array[Int]): Array[QueryTerm] = {
    val sorted = termIds.sorted
    val out = scala.collection.mutable.ArrayBuffer.empty[QueryTerm]
    var i = 0
    while (i < sorted.length) {
      if (i == 0 || sorted(i) != sorted(i - 1)) out += QueryTerm(sorted(i), 1)
      else out(out.length - 1) = out.last.copy(qtf = out.last.qtf + 1)
      i += 1
    }
    out.toArray
  }

  /** Scored list: enumerator + query weight (+ list max weight for
    * pruning kernels; + per-block max weights for BMW).
    *
    * Per-document scores are ALWAYS summed in `openIdx` (termId-ascending)
    * order via contribution slots, regardless of the order a kernel
    * discovers the matching lists in — float addition is not associative,
    * and this is what makes wand/maxscore/bmw scores bit-identical to the
    * exhaustive ranked_or oracle. */
  final class ScoredList(val en: PostingEnum, val qWeight: Float,
                         val maxWeight: Float,
                         val blockEn: BlockPostingList.Enumerator = null,
                         val blockMaxWeights: Array[Float] = null) {
    var openIdx: Int = 0
  }

  @inline private def assignOpenIdx(lists: Array[ScoredList]): Unit = {
    var i = 0
    while (i < lists.length) { lists(i).openIdx = i; i += 1 }
  }

  /** Sum contribution slots in open order and clear them. */
  @inline private def drainSlots(contrib: Array[Float]): Float = {
    var score = 0.0f
    var j = 0
    while (j < contrib.length) { score += contrib(j); contrib(j) = 0.0f; j += 1 }
    score
  }

  // ---------------------------------------------------------------- boolean

  /** Count of documents containing ALL terms (leapfrog,
    * queries.hpp:35-86). Enumerators must be fresh (at position 0). */
  def andCount(enumsIn: Array[PostingEnum], numDocs: Int,
               touchFreqs: Boolean = false): Long = {
    if (enumsIn.isEmpty) return 0L
    val enums = enumsIn.sortBy(_.size)
    var results = 0L
    var candidate = enums(0).docId
    var i = 1
    while (candidate < numDocs) {
      var restart = false
      while (i < enums.length && !restart) {
        enums(i).nextGeq(candidate)
        if (enums(i).docId != candidate) {
          candidate = enums(i).docId
          i = 0
          restart = true
        } else i += 1
      }
      if (!restart && i == enums.length) {
        results += 1
        if (touchFreqs) { var j = 0; while (j < enums.length) { enums(j).freq; j += 1 } }
        enums(0).next()
        candidate = enums(0).docId
        i = 1
      }
    }
    results
  }

  /** Count of documents containing ANY term (k-way min merge,
    * queries.hpp:88-131). `touchFreqs` replicates the
    * or_query<with_freqs> template flag: decode each matching list's
    * frequency before advancing, so the freq blocks' decode cost is
    * measured in the perf protocol. */
  def orCount(enums: Array[PostingEnum], numDocs: Int,
              touchFreqs: Boolean = false): Long = {
    if (enums.isEmpty) return 0L
    var results = 0L
    var curDoc = Int.MaxValue
    var i = 0
    while (i < enums.length) { if (enums(i).docId < curDoc) curDoc = enums(i).docId; i += 1 }
    while (curDoc < numDocs) {
      results += 1
      var nextDoc = numDocs
      i = 0
      while (i < enums.length) {
        if (enums(i).docId == curDoc) {
          if (touchFreqs) enums(i).freq
          enums(i).next()
        }
        if (enums(i).docId < nextDoc) nextDoc = enums(i).docId
        i += 1
      }
      curDoc = nextDoc
    }
    results
  }

  // ----------------------------------------------------------------- ranked

  /** Exhaustive top-k over the disjunction — the correctness oracle for
    * all pruning kernels (queries.hpp:404-476). */
  def rankedOr(lists: Array[ScoredList], normLens: Array[Float], numDocs: Int,
               k: Int, scorer: Scorer = Bm25): Array[(Int, Float)] = {
    val topk = new TopKQueue(k)
    if (lists.isEmpty) return topk.finalized()
    var curDoc = Int.MaxValue
    var i = 0
    while (i < lists.length) { if (lists(i).en.docId < curDoc) curDoc = lists(i).en.docId; i += 1 }
    while (curDoc < numDocs) {
      var score = 0.0f
      val normLen = normLens(curDoc)
      var nextDoc = numDocs
      i = 0
      while (i < lists.length) {
        val l = lists(i)
        if (l.en.docId == curDoc) {
          score += l.qWeight * scorer.docTermWeight(l.en.freq.toLong, normLen)
          l.en.next()
        }
        if (l.en.docId < nextDoc) nextDoc = l.en.docId
        i += 1
      }
      topk.insert(score, curDoc)
      curDoc = nextDoc
    }
    topk.finalized()
  }

  /** Top-k over the conjunction (leapfrog + full score,
    * queries.hpp:322-401). Accumulation in increasing-list-size order. */
  def rankedAnd(listsIn: Array[ScoredList], normLens: Array[Float],
                numDocs: Int, k: Int,
                scorer: Scorer = Bm25): Array[(Int, Float)] = {
    val topk = new TopKQueue(k)
    if (listsIn.isEmpty) return topk.finalized()
    assignOpenIdx(listsIn)
    val contrib = new Array[Float](listsIn.length)
    val lists = listsIn.sortBy(_.en.size)
    var candidate = lists(0).en.docId
    var i = 1
    while (candidate < numDocs) {
      var restart = false
      while (i < lists.length && !restart) {
        lists(i).en.nextGeq(candidate)
        if (lists(i).en.docId != candidate) {
          candidate = lists(i).en.docId
          i = 0
          restart = true
        } else i += 1
      }
      if (!restart && i == lists.length) {
        val normLen = normLens(candidate)
        i = 0
        while (i < lists.length) {
          contrib(lists(i).openIdx) = lists(i).qWeight *
            scorer.docTermWeight(lists(i).en.freq.toLong, normLen)
          i += 1
        }
        topk.insert(drainSlots(contrib), candidate)
        lists(0).en.next()
        candidate = lists(0).en.docId
        i = 1
      }
    }
    topk.finalized()
  }

  /** WAND dynamic pruning with list-level max weights
    * (queries.hpp:200-319). */
  def wand(lists: Array[ScoredList], normLens: Array[Float], numDocs: Int,
           k: Int, scorer: Scorer = Bm25): Array[(Int, Float)] = {
    val topk = new TopKQueue(k)
    if (lists.isEmpty) return topk.finalized()
    assignOpenIdx(lists)
    val contrib = new Array[Float](lists.length)
    val ordered = lists.clone()
    java.util.Arrays.sort(ordered, (a: ScoredList, b: ScoredList) =>
      java.lang.Integer.compare(a.en.docId, b.en.docId))

    def sortByDocId(): Unit =
      java.util.Arrays.sort(ordered, (a: ScoredList, b: ScoredList) =>
        java.lang.Integer.compare(a.en.docId, b.en.docId))

    var running = true
    while (running) {
      // find pivot
      var upperBound = 0.0f
      var pivot = 0
      var foundPivot = false
      while (!foundPivot && pivot < ordered.length &&
             ordered(pivot).en.docId < numDocs) {
        upperBound += ordered(pivot).maxWeight
        if (topk.wouldEnter(upperBound)) foundPivot = true
        else pivot += 1
      }
      if (!foundPivot) running = false
      else {
        val pivotId = ordered(pivot).en.docId
        if (pivotId == ordered(0).en.docId) {
          val normLen = normLens(pivotId)
          var i = 0
          var stop = false
          while (i < ordered.length && !stop) {
            val l = ordered(i)
            if (l.en.docId != pivotId) stop = true
            else {
              contrib(l.openIdx) =
                l.qWeight * scorer.docTermWeight(l.en.freq.toLong, normLen)
              l.en.next()
              i += 1
            }
          }
          topk.insert(drainSlots(contrib), pivotId)
          sortByDocId()
        } else {
          // advance the last list before the pivot group
          var nextList = pivot
          while (ordered(nextList).en.docId == pivotId) nextList -= 1
          ordered(nextList).en.nextGeq(pivotId)
          // bubble down
          var i = nextList + 1
          var done = false
          while (i < ordered.length && !done) {
            if (ordered(i).en.docId < ordered(i - 1).en.docId) {
              val t = ordered(i); ordered(i) = ordered(i - 1); ordered(i - 1) = t
              i += 1
            } else done = true
          }
        }
      }
    }
    topk.finalized()
  }

  /** MaxScore with essential/non-essential list split
    * (queries.hpp:478-591). */
  def maxscore(lists: Array[ScoredList], normLens: Array[Float], numDocs: Int,
               k: Int, scorer: Scorer = Bm25): Array[(Int, Float)] = {
    val topk = new TopKQueue(k)
    if (lists.isEmpty) return topk.finalized()
    assignOpenIdx(lists)
    val contrib = new Array[Float](lists.length)
    val ordered = lists.clone()
    java.util.Arrays.sort(ordered, (a: ScoredList, b: ScoredList) =>
      java.lang.Float.compare(a.maxWeight, b.maxWeight))

    val upperBounds = new Array[Float](ordered.length)
    upperBounds(0) = ordered(0).maxWeight
    var i = 1
    while (i < ordered.length) {
      upperBounds(i) = upperBounds(i - 1) + ordered(i).maxWeight
      i += 1
    }

    var nonEssential = 0
    var curDoc = Int.MaxValue
    i = 0
    while (i < ordered.length) { if (ordered(i).en.docId < curDoc) curDoc = ordered(i).en.docId; i += 1 }

    while (nonEssential < ordered.length && curDoc < numDocs) {
      // `score` tracks the reference's arrival-order partial sum for the
      // pruning checks; the inserted score is re-summed in open order
      var score = 0.0f
      val normLen = normLens(curDoc)
      var nextDoc = numDocs
      i = nonEssential
      while (i < ordered.length) {
        val l = ordered(i)
        if (l.en.docId == curDoc) {
          val c = l.qWeight * scorer.docTermWeight(l.en.freq.toLong, normLen)
          contrib(l.openIdx) = c
          score += c
          l.en.next()
        }
        if (l.en.docId < nextDoc) nextDoc = l.en.docId
        i += 1
      }
      // complete with non-essential lists while the bound allows
      i = nonEssential - 1
      var stop = false
      while (i >= 0 && !stop) {
        if (!topk.wouldEnter(score + upperBounds(i))) stop = true
        else {
          val l = ordered(i)
          l.en.nextGeq(curDoc)
          if (l.en.docId == curDoc) {
            val c = l.qWeight * scorer.docTermWeight(l.en.freq.toLong, normLen)
            contrib(l.openIdx) = c
            score += c
          }
          i -= 1
        }
      }
      if (topk.insert(drainSlots(contrib), curDoc)) {
        while (nonEssential < ordered.length &&
               !topk.wouldEnter(upperBounds(nonEssential))) {
          nonEssential += 1
        }
      }
      curDoc = nextDoc
    }
    topk.finalized()
  }

  /** Block-max WAND (Ding & Suel SIGIR'11): WAND pivoting with list-level
    * maxima, then a block-level upper-bound check before scoring; on
    * failure skip to just past the smallest current-block boundary.
    * Requires block lists (ScoredList.blockEn + blockMaxWeights, where
    * blockMaxWeights(b) = max over block b of docTermWeight, precomputed
    * at build time; the kernel multiplies by the query weight). */
  def blockMaxWand(lists: Array[ScoredList], normLens: Array[Float],
                   numDocs: Int, k: Int,
                   scorer: Scorer = Bm25): Array[(Int, Float)] = {
    val topk = new TopKQueue(k)
    if (lists.isEmpty) return topk.finalized()
    assignOpenIdx(lists)
    val contrib = new Array[Float](lists.length)
    val ordered = lists.clone()

    def sortByDocId(): Unit =
      java.util.Arrays.sort(ordered, (a: ScoredList, b: ScoredList) =>
        java.lang.Integer.compare(a.en.docId, b.en.docId))
    sortByDocId()

    // block index containing the first doc >= lb in list l (shallow:
    // scans block maxima only, no decode). Cached per list across pivot
    // iterations: enumerators only move forward and block maxima are
    // static, so for a non-decreasing lower bound the scan resumes where
    // the previous one stopped instead of restarting at currentBlock —
    // without this, long lists pay an O(blocks) rescan per pivot and BMW
    // loses to plain WAND even where block pruning wins.
    val cachedBlock = new Array[Int](lists.length)
    val cachedLb = new Array[Int](lists.length)
    def shallowBlock(l: ScoredList, lb: Int): Int = {
      val en = l.blockEn
      val idx = l.openIdx
      var b = en.currentBlock
      if (lb >= cachedLb(idx) && cachedBlock(idx) > b) b = cachedBlock(idx)
      val nb = en.numBlocks
      while (b < nb && en.blockMax(b) < lb) b += 1
      cachedBlock(idx) = b
      cachedLb(idx) = lb
      b
    }

    var running = true
    while (running) {
      var upperBound = 0.0f
      var pivot = 0
      var foundPivot = false
      while (!foundPivot && pivot < ordered.length &&
             ordered(pivot).en.docId < numDocs) {
        upperBound += ordered(pivot).maxWeight
        if (topk.wouldEnter(upperBound)) foundPivot = true
        else pivot += 1
      }
      if (!foundPivot) { running = false }
      else {
        val pivotId = ordered(pivot).en.docId
        // extend the pivot over all lists tied at pivotId so the block
        // bound covers every list that can contribute to docs in the
        // pruned range
        while (pivot + 1 < ordered.length &&
               ordered(pivot + 1).en.docId == pivotId) pivot += 1
        // block-level refinement over lists 0..pivot
        var blockUb = 0.0f
        var minBoundary = numDocs
        var i = 0
        while (i <= pivot) {
          val l = ordered(i)
          val b = shallowBlock(l, pivotId)
          if (b < l.blockEn.numBlocks) {
            blockUb += l.qWeight * l.blockMaxWeights(b)
            val boundary = l.blockEn.blockMax(b)
            if (boundary < minBoundary) minBoundary = boundary
          }
          i += 1
        }
        if (topk.wouldEnter(blockUb)) {
          if (pivotId == ordered(0).en.docId) {
            val normLen = normLens(pivotId)
            i = 0
            var stop = false
            while (i < ordered.length && !stop) {
              val l = ordered(i)
              if (l.en.docId != pivotId) stop = true
              else {
                contrib(l.openIdx) =
                  l.qWeight * scorer.docTermWeight(l.en.freq.toLong, normLen)
                l.en.next()
                i += 1
              }
            }
            topk.insert(drainSlots(contrib), pivotId)
            sortByDocId()
          } else {
            var nextList = pivot
            while (ordered(nextList).en.docId == pivotId) nextList -= 1
            ordered(nextList).en.nextGeq(pivotId)
            var j = nextList + 1
            var done = false
            while (j < ordered.length && !done) {
              if (ordered(j).en.docId < ordered(j - 1).en.docId) {
                val t = ordered(j); ordered(j) = ordered(j - 1); ordered(j - 1) = t
                j += 1
              } else done = true
            }
          }
        } else {
          // skip past the smallest block boundary among lists <= pivot,
          // but not past the next candidate from lists > pivot
          var d = if (minBoundary < numDocs) minBoundary + 1 else numDocs
          if (pivot + 1 < ordered.length &&
              ordered(pivot + 1).en.docId < d) d = ordered(pivot + 1).en.docId
          if (d <= pivotId) d = pivotId + 1
          i = 0
          while (i <= pivot) {
            if (ordered(i).en.docId < d) ordered(i).en.nextGeq(d)
            i += 1
          }
          sortByDocId()
        }
      }
    }
    topk.finalized()
  }
}
