package graft

/** Child-process entry for ONE half of a scaling round.
  *
  * The scaling evidence simulates the north rule's "N vs 4N executors"
  * on a single box. Running both halves inside one 32-CPU JVM is NOT
  * that simulation: a `local[4]` build free-rides on the other 28 CPUs
  * — G1 sizes its parallel GC workers from the full machine, and
  * parquet/IO pools do the same — so the narrow half gets cluster
  * resources a 4-core node would not have, and measured efficiency is
  * structurally depressed (observed quiet-host compute-rate ratio
  * ~0.64 in-JVM vs >=0.8 process-confined). The parent therefore runs
  * each half as `taskset -c A..B java ... graft.BenchBuildHalf`:
  * cpuset confinement bounds EVERYTHING (worker threads, GC, IO pools)
  * to exactly N CPUs, the way a real N-core executor node is bounded.
  *
  * Within the cpuset, the half is a LOCAL-CLUSTER of identical 4-core
  * executor JVMs (see [[Bench.newClusterSession]]): N vs 4N executors,
  * not one JVM at N vs 4N threads — one shared heap serving 16
  * allocating threads measured ~35% slower per doc than the same work
  * split across 4-thread JVMs (cpuSec/doc 1.45x, zero spill), a
  * single-process artifact no executor cluster has. The parent must
  * export SPARK_SCALA_VERSION=2.13 to this process for the standalone
  * executor launcher.
  *
  * Process isolation also makes rounds independent: a watchdog-killed
  * half (the parent destroys the process at the wall cap) cannot leave
  * broken shuffle state behind to poison later rounds — in-JVM
  * cancelAllJobs aborts were observed corrupting the shared context
  * (Spark INTERNAL_ERROR on a later round's collect).
  *
  * Args: cores nDocs corpusDir corpusDocs warmDocs
  * Prints exactly one line
  * `GRAFT_HALF docsPerSec=<n> sec=<s> cpuSec=<c> runSec=<r>
  * spillMB=<m> diskSpillMB=<d>` on success; exits nonzero on failure.
  * The parent parses docsPerSec AND cpuSec (the timed region's
  * aggregate executor CPU — input to the quiet-round cpu-ratio veto),
  * so those fields are part of the contract; the spill fields are
  * memory-pressure diagnostics (a spilling half is measuring its
  * memory config, not core scaling). Timed region identical to the in-JVM path
  * ([[Bench.buildTimedSec]]).
  *
  * `GRAFT_HALF_PHASES=1` is a DIAGNOSTIC mode: it prints GRAFT_PHASE
  * lines and exits without ever printing a GRAFT_HALF line, so it is
  * incompatible with a full Bench run (the parent would record every
  * half as failed). Use it only when invoking this main directly.
  */
object BenchBuildHalf {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toInt
    val corpusDir = args(2)
    val corpusDocs = args(3).toInt
    val warmDocs = if (args.length > 4) args(4).toInt else 0
    // Default: a CLUSTER of identical 4-core executor JVMs (cores/4 of
    // them) — the literal N-vs-4N-executors comparison. A single
    // local[16] JVM is not four 4-core executors: one shared G1 heap
    // serving 16 allocating threads measured ~35% slower per doc at
    // the 1.2M-doc round size (cpuSec/doc 1.45x the 4-thread JVM's,
    // zero spill) — a runtime artifact, not a scaling property.
    // Identical executors make the halves differ ONLY in executor
    // count. GRAFT_HALF_MODE=local restores the single-JVM protocol;
    // GRAFT_HALF_EXEC_MB sizes each executor heap (default 12288 —
    // comfortably despilled for the 1.2M-doc round on ONE executor,
    // so neither cluster size is memory-starved and the pair measures
    // core scaling, not memory config).
    val mode = sys.env.getOrElse("GRAFT_HALF_MODE", "cluster")
    // Executor heap default 3072 MB: the guest advertises 125 GiB but
    // the host backs only ~10 GiB at RAM speed — beyond it, page
    // acquisition crawls at ~0.3 GiB/s and idle pages get reclaimed,
    // so a 4x12g half re-faults mid-build and reads 3-7x slow (the
    // "storm" that poisoned rounds 4-6 was this, self-inflicted).
    // Measured at 1.2M docs: 4x3g = 49.9k docs/s zero-spill; 4x6g =
    // 22.4k with cpuSec 3x (cliff); 4x12g = 7-15k. The narrow half
    // runs the same 3g executor (identical config, mild GC tax for
    // holding the whole round in one executor — real cluster memory
    // economics, spill-free at 1.2M).
    val execMb = sys.env.getOrElse("GRAFT_HALF_EXEC_MB", "3072").toInt
    // Executor width default 1: the pair compares 1 vs 4 IDENTICAL
    // 1-core executors, so the two halves occupy 1 and 4 vCPUs — under
    // every shared-resource wall this guest has. Measured per-doc cpu
    // by width (quietest runs): 1/2/4-wide 96-106us flat, 8-wide
    // 120-129us, 16-wide +30% — DRAM contention a real 4-node cluster
    // (4x the memory channels) does not have. At 1v4 the quiet pair's
    // cpu ratio is ~1.07 and efficiency measures the engine, not the
    // box's memory controller.
    val execCores = sys.env.getOrElse("GRAFT_HALF_EXEC_CORES", "1").toInt
    val spark =
      if (mode == "cluster" && execCores >= 1 && cores >= execCores &&
          cores % execCores == 0)
        Bench.newClusterSession(cores / execCores, execCores, execMb)
      else Bench.newSessionFor(cores)
    // diagnostic mode: per-phase wall breakdown (forces intermediate
    // results, so the total differs from the real fused pipeline — for
    // scaling-loss attribution only, never for the timed contract)
    if (sys.env.get("GRAFT_HALF_PHASES").contains("1")) {
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, count, length, lit, sum}
      def t[T](name: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"GRAFT_PHASE $name%-12s ${(System.nanoTime() - t0) / 1e9}%.2fs")
        r
      }
      val all = spark.read.parquet(corpusDir).as[graft.ingest.CorpusDoc]
      val corpus =
        if (corpusDocs > 0 && nDocs < corpusDocs)
          all.filter(col("url") < "https://example.org/doc/%010d".format(nDocs))
        else all
      // JIT warmup pass
      Bench.buildTimedSec(spark, math.min(nDocs, 150000), corpusDir, corpusDocs)
      val docs = t("assign") {
        val d = graft.ingest.DocIds.assign(spark, corpus, partitions = 64)
        d.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        d.count(); d
      }
      val idx = t("build") {
        val i = graft.build.IndexBuilder.build(spark, docs, "block_optpfor",
          shardSize = 1L << 21, buildPartitions = 64)
        i.segments.agg(sum(length(col("bytes")))).collect(); i
      }
      t("norms") { idx.norms.count() }
      t("fused") { Bench.buildTimedSec(spark, nDocs, corpusDir, corpusDocs) }
      docs.unpersist()
      spark.stop()
      sys.exit(0)
    }
    try {
      // untimed in-JVM warmup build: each half starts a COLD JVM, and
      // JIT/classloading cost is a fixed tax that the (shorter) wide
      // half would otherwise pay a larger fraction of, skewing the
      // pair. Both halves warm on the same small prefix before timing.
      if (warmDocs > 0) {
        Bench.buildTimedSec(spark, math.min(warmDocs, nDocs), corpusDir,
                            corpusDocs)
        // the warmup build's persisted datasets (docIDs, dict) would
        // otherwise sit in storage memory through the timed build,
        // stealing execution memory exactly when the wide half needs it
        spark.sqlContext.clearCache()
      }
      // NOTE: no in-set spin gauge. A gauge thread inside a fully-busy
      // cpuset measures its own scheduling pressure, not per-core
      // speed (tried: 72 ms on the busy 4-set vs 43 ms on the 16-set —
      // pure oversubscription asymmetry that would poison the ratio).
      // The parent's unconfined gauge, which lands on idle CPUs, keeps
      // the symmetric baseline the weather normalization relies on.
      //
      // The build's own aggregate TaskMetrics are the one gauge the
      // host cannot hide from: a hypervisor lock-holder-preemption
      // window (observed: 48% guest-sys time, executors on-CPU spinning
      // in futex, build 10x slow) leaves single-thread spin AND
      // pure-CPU capacity probes flat, but balloons the build's own
      // CPU-per-doc. The parent compares cpuSec/doc across the pair to
      // veto fake-quiet rounds.
      val run = new java.util.concurrent.atomic.AtomicLong
      val cpu = new java.util.concurrent.atomic.AtomicLong
      val memSpill = new java.util.concurrent.atomic.AtomicLong
      val diskSpill = new java.util.concurrent.atomic.AtomicLong
      // GRAFT_HALF_JOBS=1: also print one GRAFT_JOB line per Spark job
      // of the timed build (wall + preceding driver-side gap) — the
      // undistorted attribution of non-task wall (collects, broadcast
      // construction, planning/codegen live in the gaps). Diagnostic;
      // the parent ignores the extra lines.
      val jobLog =
        if (sys.env.get("GRAFT_HALF_JOBS").contains("1"))
          new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]
        else null
      // per-stage attribution: (cpuMs, runMs, gcMs, fetchWaitMs,
      // shuffleWriteMs, tasks) accumulated from task ends
      val stageAcc =
        if (jobLog == null) null
        else new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]
      val jobListener =
        if (jobLog == null) null
        else new org.apache.spark.scheduler.SparkListener {
          private val starts =
            new java.util.concurrent.ConcurrentHashMap[Int, Long]
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            starts.put(js.jobId, js.time); ()
          }
          override def onJobEnd(
              je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val s = starts.getOrDefault(je.jobId, je.time)
            jobLog.add((je.jobId, s, je.time)); ()
          }
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = te.taskMetrics
            if (m != null) {
              val a = stageAcc.computeIfAbsent(te.stageId,
                                               _ => new Array[Long](6))
              a.synchronized {
                a(0) += m.executorCpuTime / 1000000
                a(1) += m.executorRunTime
                a(2) += m.jvmGCTime
                a(3) += m.shuffleReadMetrics.fetchWaitTime
                a(4) += m.shuffleWriteMetrics.writeTime / 1000000
                a(5) += 1
              }
            }
          }
        }
      if (jobListener != null) spark.sparkContext.addSparkListener(jobListener)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            run.addAndGet(m.executorRunTime) // ms
            cpu.addAndGet(m.executorCpuTime) // ns
            memSpill.addAndGet(m.memoryBytesSpilled)
            diskSpill.addAndGet(m.diskBytesSpilled)
            ()
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.currentTimeMillis()
      val sec = Bench.buildTimedSec(spark, nDocs, corpusDir, corpusDocs)
      // listener bus is async; give stragglers a moment before reading
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
      if (jobListener != null) {
        spark.sparkContext.removeSparkListener(jobListener)
        import scala.jdk.CollectionConverters._
        var prevEnd = t0
        jobLog.asScala.toSeq.sortBy(_._2).foreach { case (id, s, e) =>
          println(f"GRAFT_JOB id=$id%-3d gapMs=${s - prevEnd}%-6d " +
                  f"wallMs=${e - s}%-6d")
          prevEnd = e
        }
        println(f"GRAFT_JOB tail gapMs=${t0 + (sec * 1000).toLong - prevEnd}")
        stageAcc.asScala.toSeq.sortBy(_._1).foreach { case (sid, a) =>
          println(f"GRAFT_STAGE id=$sid%-3d cpuMs=${a(0)}%-7d runMs=${a(1)}%-7d " +
                  f"gcMs=${a(2)}%-6d fetchMs=${a(3)}%-6d wrMs=${a(4)}%-6d " +
                  f"tasks=${a(5)}")
        }
      }
      // stdout is the parent's capture channel; the marker keeps the
      // line findable among any stray Spark WARNs
      println(f"GRAFT_HALF docsPerSec=${nDocs / sec}%.1f sec=$sec%.2f " +
              f"cpuSec=${cpu.get / 1e9}%.2f runSec=${run.get / 1e3}%.2f " +
              f"spillMB=${memSpill.get / 1048576} " +
              f"diskSpillMB=${diskSpill.get / 1048576}")
    } finally spark.stop()
    // Spark's nonDaemon threads can outlive stop(); exit explicitly so
    // the parent's waitFor returns promptly
    sys.exit(0)
  }
}
