package graft.tools

import graft.SparkEntry

/** Time named SparkEntry gates in isolation (diagnosis helper):
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt -batch 'runMain graft.tools.GateTime dedup_embedding_cosine ...'
  *
  * Runs each named gate (default: all headline-cost suspects) twice —
  * the bench times first-run plans, but a repeat separates plan-build
  * cost from execution cost when chasing a regression.
  */
object GateTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // --noop: time a noop-sink write (guide §1.4 — computes EVERY column
    // of every row, immune to count()'s column pruning) instead of the
    // bench's count() action
    val noop = args.contains("--noop")
    val names0 = args.toSeq.filterNot(_ == "--noop")
    val names =
      if (names0.nonEmpty) names0
      else Seq("ann_cosine_top5", "dedup_embedding_cosine",
               "dedup_embedding_cosine_lsh")
    val spark = graft.Bench.newSessionFor(cpus)
    for (name <- names; rep <- 1 to 2) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val n = if (noop) {
        df.write.format("noop").mode("overwrite").save(); -1L
      } else df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"GATE $name rep=$rep rows=$n sec=$sec%.1f" +
              (if (noop) " sink=noop" else ""))
    }
    spark.stop()
  }
}
