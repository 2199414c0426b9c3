package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.Streaming

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val srcDir = {
    val d = java.nio.file.Files.createTempDirectory("graft-stream-src").toString
    Streaming.stageChunks(spark, sfDir, d, chunks = 4)
    d
  }
  private def documents = spark.read.parquet(s"$sfDir/documents.parquet")

  test("streaming dedup drops cross-batch duplicate texts") {
    // batch 1 = the documents table; batch 2 = 50 of the same texts
    // re-emitted under new doc_ids (a re-crawl) — the state store must
    // drop every one of them in the LATER micro-batch
    val d = java.nio.file.Files.createTempDirectory("graft-stream-dup").toString
    documents.coalesce(1).write.mode("append").parquet(d)
    documents.filter(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .coalesce(1).write.mode("append").parquet(d)
    val kept = Streaming.runToCompletion(spark, d,
                                         Streaming.dedupStream, "append")
      .select("text_hash").collect().map(_.getString(0))
    val batch = documents.select(md5(col("text")).as("h")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(kept.length == kept.toSet.size, "a hash survived twice")
    assert(kept.toSet == batch, "survivor hashes != batch distinct hashes")
    assert(kept.length == batch.size)
  }

  test("watermarked windowed aggregation matches the batch buckets") {
    val win = Streaming.runToCompletion(spark, srcDir,
                                        Streaming.windowedLangStats, "complete")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val batch = documents
      .withColumn("window_start",
        (floor((lit(Streaming.EpochSeconds) +
                col("doc_id") * Streaming.SecondsPerDoc) / 60) * 60)
          .cast("long"))
      .groupBy("window_start", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(win == batch)
    assert(win.map(_._1).size > 1, "multiple event-time windows expected")
  }

  test("flatMapGroupsWithState running counts converge to batch counts") {
    val run = Streaming.runToCompletion(spark, srcDir,
      st => Streaming.runningLangCounts(st).toDF(), "append")
    val finals = run.groupBy("lang").agg(max(col("running")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val batch = documents.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(finals == batch)
    // the stream emitted intermediate states, not only the final one
    assert(run.count() > finals.size, "expected per-batch state emissions")
  }
}
