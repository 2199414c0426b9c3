package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media payloads ride as opaque binary columns with
  * typed metadata; decode / feature-extract runs batched inside
  * mapPartitions (the Scala analog of mapInPandas — on a Python stack
  * the same plumbing surfaces as a pandas UDF over Arrow batches).
  *
  * The actual media DECODE IS A STUB (this container has no image/audio
  * codecs): `stubDecode` derives a deterministic pseudo-signal from the
  * payload bytes. Everything around it — schema, batching, partitioning,
  * feature shape — is real and tested.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, modality: String,
                            payload: Array[Byte], meta_width: Int,
                            meta_height: Int, meta_sample_rate: Int)

  final case class MediaFeatures(media_id: Long, modality: String,
                                 n_bytes: Long, features: Array[Float])

  /** Deterministic synthetic media table derived from the documents
    * table (payload = utf-8 bytes of the text, modality round-robin). */
  def syntheticMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val modality = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaRow(id, modality, payload,
                 meta_width = if (modality == "image") 64 else 0,
                 meta_height = if (modality == "image") 64 else 0,
                 meta_sample_rate = if (modality == "audio") 16000 else 0)
      }
  }

  /** STUB decoder: real deployments swap this for an image/audio codec.
    * Deterministic: 16-bin histogram of payload bytes (low nibble). */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) {
      hist(payload(i) & 0x0f) += 1.0f
      i += 1
    }
    if (payload.length > 0) {
      var j = 0
      while (j < 16) { hist(j) /= payload.length.toFloat; j += 1 }
    }
    hist
  }

  /** Batched feature extraction over partitions: one decoder instance
    * per partition (the expensive-init pattern of mapInPandas), rows
    * streamed, fixed-width Array[Float] feature output. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (model load, codec init)
      it.map { m =>
        MediaFeatures(m.media_id, m.modality, m.payload.length.toLong,
                      stubDecode(m.payload))
      }
    }
  }
}
