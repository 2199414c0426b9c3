package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media payloads ride as opaque binary columns with
  * typed metadata; decode / feature-extract runs batched inside
  * mapPartitions (the Scala analog of mapInPandas — on a Python stack
  * the same plumbing surfaces as a pandas UDF over Arrow batches).
  *
  * The decoders are REAL header-level parsers for three dependency-free
  * public formats — binary PPM (P6) images, RIFF/WAVE PCM16 audio, and
  * YUV4MPEG2 (C420) video — dispatched on the payload's magic bytes,
  * never on the label column. Each parses the actual byte layout
  * (dimensions / sample rate / frame count) and histograms the decoded
  * samples (luma, PCM amplitude, first-frame luma = frame sampling).
  * Payloads in any other format fall back to a byte histogram.
  * Production deployments swap in JPEG/FLAC/H.264 codecs behind the
  * same mapPartitions boundary; the Spark-side plumbing (binary column,
  * per-partition decoder init, fixed-width feature output) is what this
  * module exercises.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, modality: String,
                            payload: Array[Byte], meta_width: Int,
                            meta_height: Int, meta_sample_rate: Int)

  /** Decoded metadata + features. Fields not applicable to a modality
    * are 0 (e.g. dec_sample_rate for images). */
  final case class MediaFeatures(media_id: Long, modality: String,
                                 n_bytes: Long, dec_width: Int,
                                 dec_height: Int, dec_sample_rate: Int,
                                 dec_frames: Int, features: Array[Float])

  // ------------------------------------------------------------ synthesis

  /** Deterministic byte stream: splitmix64-style LCG over the seed. */
  private final class Lcg(seed: Long) {
    private var s = seed * 6364136223846793005L + 1442695040888963407L
    def nextByte(): Byte = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) & 0xff).toByte
    }
    def fill(n: Int): Array[Byte] = Array.fill(n)(nextByte())
  }

  /** Binary PPM (P6): "P6\n<w> <h>\n255\n" + w*h RGB triples. */
  def ppmPayload(w: Int, h: Int, seed: Long): Array[Byte] =
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ new Lcg(seed).fill(w * h * 3)

  /** Canonical 44-byte RIFF/WAVE header + mono PCM16LE samples. */
  def wavPayload(sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
    val dataSize = nSamples * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(1) // PCM, mono
    b.putInt(sampleRate).putInt(sampleRate * 2)
    b.putShort(2).putShort(16) // block align, bits/sample
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    val lcg = new Lcg(seed)
    var i = 0
    while (i < nSamples) {
      val s = ((lcg.nextByte() & 0xff) | ((lcg.nextByte() & 0xff) << 8)).toShort
      b.putShort(s)
      i += 1
    }
    b.array()
  }

  /** YUV4MPEG2 stream header + `frames` C420 frames
    * ("FRAME\n" + Y(w*h) + U(w/2*h/2) + V(w/2*h/2)); w,h even. */
  def y4mPayload(w: Int, h: Int, frames: Int, seed: Long): Array[Byte] = {
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII")
    val frameMark = "FRAME\n".getBytes("US-ASCII")
    val frameBytes = w * h + 2 * (w / 2) * (h / 2)
    val lcg = new Lcg(seed)
    val out = new java.io.ByteArrayOutputStream()
    out.write(header)
    (0 until frames).foreach { _ =>
      out.write(frameMark)
      out.write(lcg.fill(frameBytes))
    }
    out.toByteArray
  }

  /** Deterministic synthetic media table derived from the documents
    * table (one payload per doc, modality round-robin, sizes varied by
    * doc_id so the decoded-metadata gate is non-trivial). */
  def syntheticMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .map { id =>
        (id % 3) match {
          case 0 =>
            val w = 8 + (id % 5).toInt * 4
            val h = 8 + (id % 7).toInt * 2
            MediaRow(id, "image", ppmPayload(w, h, id), w, h, 0)
          case 1 =>
            val rate = 8000 + (id % 4).toInt * 4000
            MediaRow(id, "audio",
                     wavPayload(rate, 64 + (id % 192).toInt, id), 0, 0, rate)
          case _ =>
            val w = 16 + (id % 4).toInt * 8
            val h = 16 + (id % 3).toInt * 8
            MediaRow(id, "video",
                     y4mPayload(w, h, 1 + (id % 3).toInt, id), w, h, 0)
        }
      }
  }

  // -------------------------------------------------------------- decode

  private def normalized(hist: Array[Float], n: Long): Array[Float] = {
    if (n > 0) { var i = 0; while (i < hist.length) { hist(i) /= n; i += 1 } }
    hist
  }

  /** Parse binary PPM: magic "P6", ASCII width/height/maxval separated
    * by whitespace (# comments skipped per the netpbm spec), one
    * whitespace, then w*h RGB triples. Features: 16-bin luma histogram
    * (BT.601 integer weights). */
  def decodePpm(p: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (p.length < 2 || p(0) != 'P' || p(1) != '6') return None
    var pos = 2
    def skipWs(): Unit = {
      var done = false
      while (!done && pos < p.length) {
        val c = p(pos)
        if (c == '#') { while (pos < p.length && p(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
        else done = true
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0
      while (pos < p.length && p(pos) >= '0' && p(pos) <= '9') {
        v = v * 10 + (p(pos) - '0'); pos += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val maxv = readInt()
    pos += 1 // single whitespace before raster
    // raster size computed in Long: a corrupt header declaring e.g.
    // 40000x30000 wraps w*h*3 negative in Int and the bounds check
    // would pass straight into an out-of-bounds raster walk
    if (w <= 0 || h <= 0 || w > 32768 || h > 32768 || maxv != 255 ||
        pos.toLong + w.toLong * h * 3 > p.length) return None
    val hist = new Array[Float](16)
    var i = 0
    while (i < w * h) {
      val o = pos + i * 3
      val luma = (299 * (p(o) & 0xff) + 587 * (p(o + 1) & 0xff) +
                  114 * (p(o + 2) & 0xff)) / 1000
      hist(luma >>> 4) += 1.0f
      i += 1
    }
    Some((w, h, normalized(hist, w * h)))
  }

  /** Parse RIFF/WAVE: chunk-walk to "fmt " (format/channels/rate) and
    * "data" (PCM16LE samples). Features: 16-bin amplitude histogram. */
  def decodeWav(p: Array[Byte]): Option[(Int, Array[Float])] = {
    def ascii(off: Int, s: String): Boolean =
      off + s.length <= p.length &&
        s.indices.forall(i => p(off + i) == s.charAt(i).toByte)
    def u32(off: Int): Int =
      (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
        ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)
    def u16(off: Int): Int = (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
    if (!ascii(0, "RIFF") || !ascii(8, "WAVE")) return None
    // chunk walk in Long with RIFF's u32 sizes treated as UNSIGNED: a
    // corrupt size like 0x7FFFFFF0 makes an Int `pos += 8 + size`
    // wrap negative while `pos + 8 <= length` still passes, indexing
    // negative offsets — the walk must saturate past the end instead
    var pos = 12L
    var rate = 0
    var ok = false
    val hist = new Array[Float](16)
    var nSamples = 0L
    while (pos + 8 <= p.length) {
      val at = pos.toInt // pos + 8 <= p.length, so Int-safe
      val size = u32(at + 4).toLong & 0xffffffffL
      if (ascii(at, "fmt ") && pos + 8 + 16 <= p.length) {
        // PCM (1), mono, 16-bit is what we synthesize; reject others
        if (u16(at + 8) == 1 && u16(at + 10) == 1 && u16(at + 22) == 16) {
          rate = u32(at + 12)
          ok = rate > 0
        }
      } else if (ascii(at, "data") && ok) {
        // a declared size past the payload end clamps: decode what is
        // actually there rather than failing the whole payload
        val end = math.min(p.length.toLong, pos + 8 + size).toInt
        var o = at + 8
        while (o + 1 < end) {
          val s = ((p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)).toShort
          hist((s + 32768) >>> 12) += 1.0f
          nSamples += 1
          o += 2
        }
      }
      pos += 8 + size + (size & 1) // RIFF chunks are 2-byte aligned
    }
    if (!ok || nSamples == 0) None else Some((rate, normalized(hist, nSamples)))
  }

  /** Parse YUV4MPEG2: "YUV4MPEG2 ..." parameter line (W/H tags), then
    * frame-walk "FRAME\n" + C420 planes. Features: 16-bin luma
    * histogram of the FIRST frame (frame sampling — at production scale
    * decoding every frame of every video is the cost that kills jobs). */
  def decodeY4m(p: Array[Byte]): Option[(Int, Int, Int, Array[Float])] = {
    val magic = "YUV4MPEG2"
    if (p.length < magic.length ||
        !magic.indices.forall(i => p(i) == magic.charAt(i).toByte)) return None
    var eol = magic.length
    while (eol < p.length && p(eol) != '\n') eol += 1
    val params = new String(p, 0, eol, "US-ASCII").split(' ')
    def tag(c: Char): Option[Int] =
      params.find(s => s.nonEmpty && s.charAt(0) == c)
        .flatMap(s => scala.util.Try(s.substring(1).toInt).toOption)
    val wOpt = tag('W'); val hOpt = tag('H')
    if (wOpt.isEmpty || hOpt.isEmpty) return None
    val w = wOpt.get; val h = hOpt.get
    // frame size in Long (same Int-overflow class as the PPM raster:
    // a corrupt W/H tag must not wrap the bounds check)
    if (w <= 0 || h <= 0 || w > 32768 || h > 32768) return None
    val frameBytes = w.toLong * h + 2L * (w / 2) * (h / 2)
    val frameMark = "FRAME".getBytes("US-ASCII")
    var pos = eol + 1
    var frames = 0
    val hist = new Array[Float](16)
    while (pos + frameMark.length <= p.length &&
           frameMark.indices.forall(i => p(pos + i) == frameMark(i))) {
      var fe = pos
      while (fe < p.length && p(fe) != '\n') fe += 1 // frame param line
      val dataAt = fe + 1
      if (dataAt.toLong + frameBytes > p.length) return None
      if (frames == 0) {
        var i = 0
        while (i < w * h) { hist((p(dataAt + i) & 0xff) >>> 4) += 1.0f; i += 1 }
      }
      frames += 1
      pos = (dataAt.toLong + frameBytes).toInt // <= p.length by the check
    }
    if (frames == 0) None
    else Some((w, h, frames, normalized(hist, w.toLong * h)))
  }

  /** Fallback for unrecognized payloads: 16-bin byte histogram (low
    * nibble) — keeps the feature contract total. */
  def byteHistogram(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) { hist(payload(i) & 0x0f) += 1.0f; i += 1 }
    normalized(hist, payload.length)
  }

  /** Decode one payload by magic-byte sniffing (never trusts the label
    * column). Total: a payload no parser accepts — or one that makes a
    * parser throw despite the bounds checks — falls back to the byte
    * histogram instead of failing the Spark task (at 100 TB some
    * payloads WILL be corrupt, and one bad row must not kill a stage). */
  def decode(m: MediaRow): MediaFeatures = {
    val p = m.payload
    try {
      decodePpm(p).map { case (w, h, f) =>
        MediaFeatures(m.media_id, m.modality, p.length.toLong, w, h, 0, 1, f)
      }.orElse(decodeWav(p).map { case (rate, f) =>
        MediaFeatures(m.media_id, m.modality, p.length.toLong, 0, 0, rate, 0, f)
      }).orElse(decodeY4m(p).map { case (w, h, frames, f) =>
        MediaFeatures(m.media_id, m.modality, p.length.toLong, w, h, 0, frames, f)
      }).getOrElse(
        MediaFeatures(m.media_id, m.modality, p.length.toLong, 0, 0, 0, 0,
                      byteHistogram(p)))
    } catch {
      case scala.util.control.NonFatal(_) =>
        MediaFeatures(m.media_id, m.modality, p.length.toLong, 0, 0, 0, 0,
                      byteHistogram(p))
    }
  }

  /** Batched feature extraction over partitions: one decoder instance
    * per partition (the expensive-init pattern of mapInPandas), rows
    * streamed, fixed-width Array[Float] feature output. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (codec context, model)
      it.map(decode)
    }
  }
}
