package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming surface for the training-data pipeline.
  *
  * The stateless text ops (quality, lang-ID, token counts, fingerprint)
  * stream unchanged — they are Column expressions, and Catalyst runs
  * the same plan per micro-batch. What needs streaming-specific
  * machinery is STATE, covered here three ways:
  *
  *   - exact dedup across the stream: `dropDuplicates` backed by the
  *     state store — the first-seen doc per distinct text survives;
  *   - watermark + windowed aggregation: event-time doc/char counts
  *     per (time window, lang);
  *   - `flatMapGroupsWithState`: running per-language counters emitting
  *     an update per micro-batch (the custom-state primitive that
  *     sessionization/quota ops build on).
  *
  * Batch/stream agreement is a driver gate (`stream_agreement`): the
  * documents table replayed as N single-file micro-batches must answer
  * exactly like the batch plans. At production scale the same
  * `readStream` points at the landing bucket and the dedup state gets
  * a TTL via dropDuplicatesWithinWatermark — the unbounded-state
  * variant here matches the batch-gate semantics exactly.
  */
object Streaming {

  /** documents.parquet schema (file streams need it declared). */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Synthetic deterministic event time: one doc every 7 s from a fixed
    * epoch — doc_id IS the arrival order in the fixtures, so this is
    * the streaming analog of an ingest timestamp. */
  final val EpochSeconds = 1700000000L
  final val SecondsPerDoc = 7L

  /** Stage the documents table as `chunks` single-file parquet drops in
    * doc_id-interleaved arrival order; the file source then replays one
    * file per micro-batch (maxFilesPerTrigger=1). */
  def stageChunks(spark: SparkSession, sfDir: String, outDir: String,
                  chunks: Int): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (0 until chunks).foreach { i =>
      docs.filter(pmod(col("doc_id"), lit(chunks)) === i)
        .coalesce(1).write.mode("append").parquet(outDir)
    }
  }

  def fileStream(spark: SparkSession, srcDir: String): DataFrame =
    spark.readStream.schema(DocumentsSchema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)

  /** Streaming exact dedup: state-store-backed dropDuplicates on the
    * content hash; the first-seen doc per distinct text survives. */
  def dedupStream(stream: DataFrame): DataFrame =
    stream.withColumn("text_hash", md5(col("text")))
      .dropDuplicates("text_hash")

  /** Watermarked event-time windowed aggregation: docs + chars per
    * (1-minute window, lang). The 10-minute watermark bounds state in a
    * real deployment; the gate reads the Complete-mode result so late
    * data semantics do not change the compare. */
  def windowedLangStats(stream: DataFrame): DataFrame =
    stream
      .withColumn("event_time",
        timestamp_seconds(lit(EpochSeconds) + col("doc_id") * SecondsPerDoc))
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "1 minute"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .select(col("window.start").cast("long").as("window_start"),
              col("lang"), col("n_docs"), col("sum_chars"))

  final case class LangRunning(lang: String, running: Long)

  /** Running per-language doc counters via flatMapGroupsWithState —
    * emits the cumulative count after each micro-batch touching the
    * language; the per-lang MAX over emissions is the final state. */
  def runningLangCounts(stream: DataFrame): Dataset[LangRunning] = {
    import stream.sparkSession.implicits._
    stream.select(col("lang")).as[String]
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (lang: String, rows: Iterator[String], state: GroupState[Long]) =>
          val now = state.getOption.getOrElse(0L) + rows.size
          state.update(now)
          Iterator(LangRunning(lang, now))
      }
  }

  /** Run a streaming transform of the staged chunks to completion
    * (Trigger.AvailableNow, one file per micro-batch) and return the
    * collected sink rows. The memory-sink temp view and the checkpoint
    * directory are both released before returning — gates call this
    * repeatedly, and a long-lived session must not accumulate catalog
    * views or /tmp checkpoint trees (sink rows are gate-scale; the
    * collect is bounded). */
  def runToCompletion(spark: SparkSession, srcDir: String,
                      transform: DataFrame => DataFrame,
                      outputMode: String): DataFrame = {
    val name = "stream_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val ckptPath = java.nio.file.Files.createTempDirectory("graft_ckpt")
    try {
      val q = transform(fileStream(spark, srcDir)).writeStream
        .format("memory").queryName(name)
        .outputMode(outputMode)
        .option("checkpointLocation", ckptPath.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val sink = spark.table(name)
      val rows = sink.collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), sink.schema)
    } finally {
      // release on BOTH paths: a failed stream (corrupt chunk, state
      // error) must not leak the sink view or the checkpoint tree
      try spark.catalog.dropTempView(name)
      catch { case scala.util.control.NonFatal(_) => }
      deleteRecursively(ckptPath)
    }
  }

  private[graft] def deleteRecursively(root: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    try {
      val it = Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .iterator()
      while (it.hasNext) Files.deleteIfExists(it.next())
    } catch { case scala.util.control.NonFatal(_) => }
  }
}
