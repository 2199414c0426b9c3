package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.build._
import graft.core._
import graft.ingest._
import graft.query._

class HybridSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def sourceIndex(): BuiltIndex = {
    val corpus = Corpus.fromDocumentsTable(spark, sfDir)
    val docs = DocIds.assign(spark, corpus, 4)
    IndexBuilder.build(spark, docs, "block_optpfor", 1L << 20, 4)
  }

  private def totalBytes(idx: BuiltIndex): Long =
    idx.segments.collect().map(_.bytes.length.toLong).sum

  private def decodeAll(idx: BuiltIndex): Set[(Int, Int, Int)] = {
    val codec = IndexBuilder.codecFor(idx.meta.indexType)
    idx.segments.collect().flatMap { s =>
      val e = new BlockPostingList.Enumerator(
        s.bytes, 0, math.min(idx.meta.shardSize, idx.meta.numDocs).toInt, codec)
      (0 until s.n).map { _ =>
        val r = (s.termId, e.docId, e.freq)
        e.next()
        r
      }
    }.toSet
  }

  test("hybrid optimization round-trips at every budget and respects it") {
    val src = sourceIndex()
    src.segments.persist()
    val expected = decodeAll(src)
    // fixed calibration so the three runs share identical frontiers
    // (timing it per run lets noise flip the fastest-codec start points)
    val cal = HybridOptimizer.DecTimeModel.constant(
      Map(0 -> 600.0, 1 -> 300.0, 2 -> 3000.0))

    val pureSpace = HybridOptimizer.optimize(spark, src, 0L, 4, cal)
    val sSpace = totalBytes(pureSpace)
    assert(decodeAll(pureSpace) == expected, "pure-space round trip")

    val pureSpeed = HybridOptimizer.optimize(spark, src, Long.MaxValue / 2, 4, cal)
    val sSpeed = totalBytes(pureSpeed)
    assert(decodeAll(pureSpeed) == expected, "pure-speed round trip")

    assert(sSpace <= sSpeed, s"space-optimal $sSpace > speed-optimal $sSpeed")

    // a budget between the extremes lands between them and round-trips
    val mid = (sSpace + sSpeed) / 2
    val midIdx = HybridOptimizer.optimize(spark, src, mid, 4, cal)
    val sMid = totalBytes(midIdx)
    assert(decodeAll(midIdx) == expected, "mid-budget round trip")
    assert(sMid <= sSpeed && sMid >= sSpace - 64,
           s"mid $sMid not within [$sSpace, $sSpeed]")

    // queries through the optimized index are identical
    val queries = Seq(Query(0, Array("join", "hash")),
                      Query(1, Array("the", "dup")))
    val a = Engine.topK(spark, src, queries, "ranked_or", 10).collect()
      .sortBy(h => (h.queryId, h.rank)).map(h => (h.queryId, h.docId, h.score)).toSeq
    val b = Engine.topK(spark, midIdx, queries, "ranked_or", 10).collect()
      .sortBy(h => (h.queryId, h.rank)).map(h => (h.queryId, h.docId, h.score)).toSeq
    assert(a == b)
  }

  test("learned decode-time model differentiates block shapes") {
    val m = HybridOptimizer.calibrate(runs = 64)
    // intercept-only predicts one time per codec; the learned model must
    // see block shape: an exception-heavy wide block vs a dense tiny
    // block should get different predictions for at least one codec
    val rnd = new scala.util.Random(7)
    val tiny = Array.fill(128)(rnd.nextInt(4))
    val wide = Array.fill(128)(rnd.nextInt(1 << 20))
    val preds = (0 until MixedCodec.candidates.length).map { tag =>
      def p(vals: Array[Int]): Double = {
        val w = new ByteWriter()
        MixedCodec.candidates(tag).encode(vals, -1, 128, w)
        val pforB = if (tag == MixedCodec.OptPfdTag) w.byteAt(0) else 0
        val pforEx = if (tag == MixedCodec.OptPfdTag) w.byteAt(1) else 0
        m.predict(tag, w.size, HybridOptimizer.valueFeatures(vals), pforB, pforEx)
      }
      (p(tiny), p(wide))
    }
    assert(preds.exists { case (a, b) =>
      math.abs(a - b) / math.max(a, b) > 0.05
    }, s"learned model is feature-blind: $preds")
    // and all predictions remain positive and finite
    preds.foreach { case (a, b) =>
      assert(a > 0 && b > 0 && !a.isNaN && !b.isNaN)
    }
  }

  test("pure-space hybrid equals the min-size mixed choice per unit") {
    val src = sourceIndex()
    val pureSpace = HybridOptimizer.optimize(spark, src, 0L, 4)
    // re-encoding every list with MixedCodec (which always picks min
    // size) must give the same total payload size
    val srcCodec = IndexBuilder.codecFor(src.meta.indexType)
    val mixedBytes = src.segments.collect().map { s =>
      val blocks = BlockPostingList.blockData(s.bytes, 0, srcCodec)
      var docs = 0
      val all = new scala.collection.mutable.ArrayBuilder.ofInt
      val fr = new scala.collection.mutable.ArrayBuilder.ofInt
      var last = -1
      blocks.foreach { bd =>
        var i = 0
        var cur = (if (bd.index == 0) -1
                   else last)
        bd.docGaps.take(bd.size).foreach { g =>
          cur = cur + g + 1
          all += cur
          i += 1
        }
        last = bd.blockMaxDoc
        bd.freqsMinus1.take(bd.size).foreach(f => fr += f + 1)
        docs += bd.size
      }
      BlockPostingList.encode(MixedCodec, all.result(), fr.result()).length.toLong
    }.sum
    assert(totalBytes(pureSpace) == mixedBytes,
           s"hybrid@0 ${totalBytes(pureSpace)} != mixed $mixedBytes")
  }
}
