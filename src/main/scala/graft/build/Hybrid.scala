package graft.build

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core._

/** WSDM'15 space-time index optimizer, Spark-first (reference pipeline:
  * /root/reference/optimal_hybrid_index.cpp — per-block space-time
  * points, lambda frontier, external sort, greedy budget sweep,
  * re-encode; and /root/reference/profile_decoding.cpp for the decode
  * cost calibration).
  *
  * Per (block, component) unit the codec candidates are {OptPFD, varint,
  * interpolative}; decode time uses a calibrated per-codec ns/block
  * constant (the reference learns a per-block linear model — O2/O3; the
  * constant model is the intercept-only special case and keeps the
  * pipeline deterministic). Greedy: every unit starts at its fastest
  * non-dominated point; frontier transitions (sorted by lambda =
  * delta-time / bytes-saved, the reference's lower-convex-hull walk,
  * optimal_hybrid_index.cpp:57-148) are taken globally
  * cheapest-time-per-byte first until the space budget is met — the
  * reference's stxxl external sort + sweep (:237-396) becomes a Spark
  * range-sort + per-partition prefix sums.
  */
object HybridOptimizer {

  /** O3: per-codec linear decode-time predictor over per-block features
    * [1, size, sum_of_logs, nonzeros, max_b, pfor_b, pfor_exceptions] —
    * the reference's feature set (dec_time_prediction.hpp:13,108-143)
    * minus n and entropy, which its own regression drops
    * (dec_time_regression.py:49). The reference fits L1-regularized
    * regression offline in numpy; here the fit is closed-form ridge
    * least squares so it needs no dependencies and runs at calibrate
    * time. pfor_b/pfor_exceptions are zero for non-PFD codecs
    * (mixed_block.hpp:80-97). */
  final case class DecTimeModel(weights: Array[Array[Double]],
                                meanNs: Array[Double]) extends Serializable {
    /** Predicted decode ns for one full block under codec `tag`. */
    def predict(tag: Int, size: Int, vf: Array[Double],
                pforB: Int, pforEx: Int): Double = {
      val w = weights(tag)
      val p = w(0) + w(1) * size + w(2) * vf(0) + w(3) * vf(1) +
              w(4) * vf(2) + w(5) * pforB + w(6) * pforEx
      if (p < 1.0) 1.0 else p // decode time is never free
    }
    def fastestTag: Int = {
      var best = 0
      var i = 1
      while (i < meanNs.length) { if (meanNs(i) < meanNs(best)) best = i; i += 1 }
      best
    }
  }

  object DecTimeModel {
    /** Intercept-only model (the round-1 constant calibration). */
    def constant(ns: Map[Int, Double]): DecTimeModel = {
      val tags = MixedCodec.candidates.indices
      DecTimeModel(tags.map(t => Array(ns(t), 0, 0, 0, 0, 0, 0)).toArray,
                   tags.map(ns).toArray)
    }
  }

  /** O2: codec-independent value statistics of one block
    * (dec_time_prediction.hpp:108-143): [sum_of_logs, nonzeros, max_b]. */
  def valueFeatures(vals: Array[Int]): Array[Double] = {
    var sumLogs = 0.0
    var nonzeros = 0.0
    var maxB = 0
    var i = 0
    while (i < vals.length) {
      val v = vals(i)
      sumLogs += math.log(v.toDouble + 1.0) * 1.4426950408889634 // log2
      if (v != 0) {
        nonzeros += 1
        val b = 32 - Integer.numberOfLeadingZeros(v)
        if (b > maxB) maxB = b
      }
      i += 1
    }
    Array(sumLogs, nonzeros, maxB.toDouble)
  }

  /** Feature-diverse seeded calibration blocks: uniform gaps over a
    * magnitude sweep, zero-heavy (freq-like), and exception-skewed
    * (small base + k large outliers) shapes. */
  private def calibrationBlocks(): Array[Array[Int]] = {
    val rnd = new scala.util.Random(12345)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    for (mag <- 1 to 16) out += Array.fill(128)(rnd.nextInt(1 << mag))
    for (mag <- Seq(2, 6, 10); pz <- Seq(0.5, 0.8, 0.95))
      out += Array.fill(128)(
        if (rnd.nextDouble() < pz) 0 else rnd.nextInt(1 << mag))
    for (k <- Seq(1, 4, 16, 64); mag <- Seq(12, 20)) {
      val b = Array.fill(128)(rnd.nextInt(16))
      var i = 0
      while (i < k) { b(rnd.nextInt(128)) = rnd.nextInt(1 << mag); i += 1 }
      out += b
    }
    out += Array.fill(128)(0)
    out += Array.fill(128)(1)
    out.toArray
  }

  /** Solve (X'X + eps*I) w = X'y — ridge-stabilized normal equations so
    * all-zero feature columns (pfor params under non-PFD codecs) stay
    * harmless. */
  private def fitLinear(xs: Array[Array[Double]], ys: Array[Double]): Array[Double] = {
    val d = xs(0).length
    val a = Array.ofDim[Double](d, d + 1)
    for (r <- xs.indices; i <- 0 until d) {
      val xi = xs(r)(i)
      var j = 0
      while (j < d) { a(i)(j) += xi * xs(r)(j); j += 1 }
      a(i)(d) += xi * ys(r)
    }
    for (i <- 0 until d) a(i)(i) += 1e-6
    // Gaussian elimination with partial pivoting
    for (col <- 0 until d) {
      var piv = col
      for (r <- col + 1 until d)
        if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r
      val t = a(col); a(col) = a(piv); a(piv) = t
      val p = a(col)(col)
      for (j <- col to d) a(col)(j) /= p
      for (r <- 0 until d if r != col) {
        val f = a(r)(col)
        if (f != 0.0) for (j <- col to d) a(r)(j) -= f * a(col)(j)
      }
    }
    Array.tabulate(d)(i => a(i)(d))
  }

  /** O1+O3: measure per-block decode times over the calibration shapes
    * (256 timed decodes each after warmup, profile_decoding.cpp:13-41
    * protocol) and fit the per-codec linear model. */
  def calibrate(runs: Int = 256): DecTimeModel = {
    val blocks = calibrationBlocks()
    val feats = blocks.map(valueFeatures)
    val out = new Array[Int](128)
    val weights = new Array[Array[Double]](MixedCodec.candidates.length)
    val means = new Array[Double](MixedCodec.candidates.length)
    for (tag <- MixedCodec.candidates.indices) {
      val codec = MixedCodec.candidates(tag)
      val xs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      val ys = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (bi <- blocks.indices) {
        val w = new ByteWriter()
        codec.encode(blocks(bi), -1, 128, w)
        val enc = w.result()
        val pforB = if (tag == MixedCodec.OptPfdTag) w.byteAt(0) else 0
        val pforEx = if (tag == MixedCodec.OptPfdTag) w.byteAt(1) else 0
        var r = 0
        while (r < 32) { codec.decode(enc, 0, out, -1, 128); r += 1 } // warmup
        val t0 = System.nanoTime()
        r = 0
        while (r < runs) { codec.decode(enc, 0, out, -1, 128); r += 1 }
        val ns = (System.nanoTime() - t0).toDouble / runs
        xs += Array(1.0, enc.length.toDouble, feats(bi)(0), feats(bi)(1),
                    feats(bi)(2), pforB.toDouble, pforEx.toDouble)
        ys += ns
      }
      weights(tag) = fitLinear(xs.toArray, ys.toArray)
      means(tag) = ys.sum / ys.length
    }
    DecTimeModel(weights, means)
  }

  // one frontier transition: taking it moves `unit` from hull step k to
  // k+1, paying deltaTimeNs to save `saving` bytes at cost rate lambda
  final case class Transition(termId: Int, shard: Int, block: Int,
                              comp: Int, step: Int, lambda: Double,
                              saving: Long)
  final case class Choice(termId: Int, shard: Int, block: Int,
                          comp: Int, tag: Int)

  /** Non-dominated (space desc, time asc) hull: (tag, space, time). */
  private def hull(sizes: Array[Int], times: Array[Double])
      : Array[(Int, Long, Double)] = {
    val pts = sizes.indices.map(t => (t, sizes(t).toLong + 1L, times(t)))
      .sortBy(p => (p._3, p._2)) // by time asc, then space
    val nd = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
    var minSpace = Long.MaxValue
    pts.foreach { p =>
      if (p._2 < minSpace) { nd += p; minSpace = p._2 }
    }
    // nd: time ascending AND space strictly descending = the frontier walk
    // order (start = fastest); enforce convexity (non-decreasing lambda)
    val h = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
    nd.foreach { p =>
      h += p
      var ok = false
      while (!ok && h.length >= 3) {
        val a = h(h.length - 3); val b = h(h.length - 2); val c = h.last
        val l1 = (b._3 - a._3) / (a._2 - b._2).toDouble
        val l2 = (c._3 - b._3) / (b._2 - c._2).toDouble
        if (l2 < l1) h.remove(h.length - 2) // b is above the hull
        else ok = true
      }
    }
    h.toArray
  }

  /** Re-encode a block index under a byte budget for full-block payloads.
    * budget >= sum of min sizes -> pure speed where affordable;
    * budget <= 0 -> pure space (every unit at its smallest point).
    *
    * The budget covers FULL-BLOCK payload bytes plus a 1-byte codec tag
    * per (block, component) unit — the quantity the sweep can actually
    * trade. It is NOT an on-disk size: list headers (vbyte n, block maxs,
    * endpoints) and partial trailing blocks (always interpolative) are
    * fixed costs excluded from both `budgetBytes` and the internal
    * startSpace sum. On-disk bytes ~= budget + sum over lists of
    * (vbyte(n) + 8*blocks - 4) + partial-block payloads. */
  def optimize(spark: SparkSession, index: BuiltIndex, budgetBytes: Long,
               partitions: Int = 32,
               calibration: DecTimeModel = null): BuiltIndex = {
    import spark.implicits._
    require(IndexBuilder.BlockFamilies(index.meta.indexType),
            "hybrid optimization expects a block index")
    val srcCodec = IndexBuilder.codecFor(index.meta.indexType)
    // calibration is an explicit input so comparative runs (and resumed
    // builds) are deterministic; timing it inline would let measurement
    // noise flip the per-unit frontiers between runs
    val model = if (calibration != null) calibration else calibrate()
    val bcModel = spark.sparkContext.broadcast(model)
    val fastestTag = model.fastestTag

    // per-unit candidate sizes + per-block predicted decode times ->
    // hull transitions (the time axis sees block shape through the
    // learned feature model, not one constant per codec)
    val units = index.segments.flatMap { s =>
      BlockPostingList.blockData(s.bytes, 0, srcCodec).iterator
        .filter(_.size == 128) // partial blocks stay interpolative, untouched
        .flatMap { bd =>
          Seq(0, 1).map { comp =>
            val (vals, sum) =
              if (comp == 0) (bd.docGaps, bd.docGapUniverse)
              else (bd.freqsMinus1, -1)
            val vf = valueFeatures(vals)
            val m = bcModel.value
            val nCand = MixedCodec.candidates.length
            val sizes = new Array[Int](nCand)
            val times = new Array[Double](nCand)
            var tag = 0
            while (tag < nCand) {
              val w = new ByteWriter()
              MixedCodec.candidates(tag).encode(vals, sum, 128, w)
              sizes(tag) = w.size
              val pforB = if (tag == MixedCodec.OptPfdTag) w.byteAt(0) else 0
              val pforEx = if (tag == MixedCodec.OptPfdTag) w.byteAt(1) else 0
              times(tag) = m.predict(tag, w.size, vf, pforB, pforEx)
              tag += 1
            }
            (s.termId, s.shard, bd.index, comp, sizes, times)
          }
        }
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val startAndTransitions = units.map { case (termId, shard, block, comp, sizes, times) =>
      val h = hull(sizes, times)
      val trans = (0 until h.length - 1).map { k =>
        Transition(termId, shard, block, comp, k,
                   (h(k + 1)._3 - h(k)._3) / (h(k)._2 - h(k + 1)._2).toDouble,
                   h(k)._2 - h(k + 1)._2)
      }.toArray
      val tags = h.map(_._1)
      (termId, shard, block, comp, h(0)._2, tags, trans)
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val startSpace = startAndTransitions.map(_._5).reduce(_ + _)
    val needed = startSpace - budgetBytes

    var transHandle: Dataset[Transition] = null
    val chosenSteps: Dataset[(Int, Int, Int, Int, Int)] =
      if (needed <= 0) spark.emptyDataset[(Int, Int, Int, Int, Int)]
      else {
        // global lambda-ascending sweep with scalable prefix sums
        val trans = startAndTransitions.flatMap(_._7)
          .repartitionByRange(partitions, $"lambda", $"termId", $"shard",
                              $"block", $"comp", $"step")
          .sortWithinPartitions($"lambda", $"termId", $"shard", $"block",
                                $"comp", $"step")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        transHandle = trans
        val partSums = trans.mapPartitions(it =>
          Iterator.single(it.map(_.saving).sum)).collect()
        val offsets = partSums.scanLeft(0L)(_ + _)
        val bcOffsets = spark.sparkContext.broadcast(offsets)
        val neededL = needed
        trans.mapPartitions { it =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          var cum = bcOffsets.value(pid)
          it.flatMap { t =>
            val take = cum < neededL
            cum += t.saving
            if (take) Some((t.termId, t.shard, t.block, t.comp, t.step + 1))
            else None
          }
        }
      }

    // per-unit final step = max selected (transitions form a prefix)
    val tagsDf = startAndTransitions.map {
        case (termId, shard, block, comp, _, tags, _) =>
          ((termId, shard, block, comp), tags)
      }.toDF("key", "tags")
    val stepsDf = chosenSteps.map(c => ((c._1, c._2, c._3, c._4), c._5))
      .groupByKey(_._1).mapGroups((k, it) => (k, it.map(_._2).max))
      .toDF("key", "step")
    val finalTags = tagsDf
      .joinWith(stepsDf, tagsDf("key") === stepsDf("key"), "left_outer")
      .map { case (l, r) =>
        val (key, tags) = (l.getStruct(0), l.getSeq[Int](1))
        val step = if (r == null) 0 else r.getInt(1)
        Choice(key.getInt(0), key.getInt(1), key.getInt(2), key.getInt(3),
               tags(step))
      }

    // re-encode per segment with the chosen per-unit tags
    val metaL = index.meta
    val fastest = fastestTag
    val newSegments = index.segments
      .groupByKey(s => (s.termId, s.shard))
      .cogroup(finalTags.groupByKey(c => (c.termId, c.shard))) {
        case ((_, _), segIt, choiceIt) =>
          val choices = choiceIt.map(c => ((c.block, c.comp), c.tag)).toMap
          segIt.map { s =>
            val blocks = BlockPostingList.blockData(s.bytes, 0, srcCodec)
            val docTags = blocks.map(bd => choices.getOrElse((bd.index, 0), fastest))
            val freqTags = blocks.map(bd => choices.getOrElse((bd.index, 1), fastest))
            val out = new ByteWriter(s.bytes.length + 16)
            BlockPostingList.writeMixed(out, s.n, blocks, docTags, freqTags)
            s.copy(bytes = out.result())
          }
      }

    // materialize the re-encoded index once, then drop the sweep
    // intermediates — callers probe the result repeatedly (byte sums,
    // decode verification) and must not re-run the hull/sort/sweep chain
    val result = newSegments
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    result.count()
    units.unpersist()
    startAndTransitions.unpersist()
    if (transHandle != null) transHandle.unpersist()

    BuiltIndex(metaL.copy(indexType = "block_mixed"), index.dict,
               result, index.norms)
  }
}