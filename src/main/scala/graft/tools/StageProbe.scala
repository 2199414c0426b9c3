package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler._

/** Attribute a gate's wall time to Spark stages (diagnosis helper):
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt -batch 'runMain graft.tools.StageProbe dedup_ngram_jaccard'
  *
  * Prints, per stage: wall span, aggregate task time, task count, and
  * the first line of the call site — plus the total un-attributed gap
  * (driver/planning/AQE time between stages), which per-stage metrics
  * alone cannot show.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Bench.newSessionFor(cpus)
    for (name <- args.toSeq) {
      case class St(id: Int, submitted: Long, completed: Long,
                    taskMs: Long, nTasks: Int, site: String)
      val stages = new scala.collection.mutable.ArrayBuffer[St]
      val lock = new Object
      val listener = new SparkListener {
        private val subm = new scala.collection.mutable.HashMap[Int, Long]
        override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
          lock.synchronized {
            subm(e.stageInfo.stageId) = System.nanoTime()
          }
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
          lock.synchronized {
            val si = e.stageInfo
            stages += St(si.stageId,
                         subm.getOrElse(si.stageId, 0L), System.nanoTime(),
                         si.taskMetrics.executorRunTime, si.numTasks,
                         si.details.linesIterator.take(1).mkString)
          }
      }
      spark.sparkContext.addSparkListener(listener)
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      spark.sparkContext.removeSparkListener(listener)
      println(f"PROBE $name rows=$n wall=$wall%.2f s, ${stages.length} stages")
      val spans = lock.synchronized(stages.toVector).sortBy(_.submitted)
      var covered = 0.0
      var lastEnd = 0L
      for (s <- spans) {
        val span = (s.completed - s.submitted) / 1e9
        val fresh = (s.completed - math.max(s.submitted, lastEnd)).max(0L) / 1e9
        lastEnd = math.max(lastEnd, s.completed)
        covered += fresh
        println(f"  stage ${s.id}%4d span=$span%6.2f s taskSum=${s.taskMs / 1e3}%6.2f s " +
                f"tasks=${s.nTasks}%3d  ${s.site.take(90)}")
      }
      println(f"  stage-covered wall: $covered%.2f s of $wall%.2f s " +
              f"(gap = driver/planning/AQE: ${wall - covered}%.2f s)")
    }
    spark.stop()
  }
}
