package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, processed partition-parallel in batches.
  *
  * The Spark-side plumbing here is real and tested — schema, partition
  * parallelism, batch iteration shape (`mapPartitions` over a typed
  * Dataset, the JVM analog of `mapInPandas` batches). IMAGE decode is
  * real: JDK ImageIO (PNG/JPEG/GIF/BMP), gated against an oracle that
  * recomputes the pixel stats from the generation formula. Payloads no
  * codec recognizes fall back to a clearly-marked deterministic byte-stats
  * STUB, so arbitrary binary columns (and the audio path, which has no
  * in-container codec) stay verifiable end-to-end. Swap in richer codecs
  * (e.g. TwelveMonkeys/JavaCV) without touching the plumbing.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  final case class MediaMeta(kind: String, declaredWidth: Int)
  final case class MediaRow(doc_id: Long, media: Array[Byte], meta: MediaMeta)
  final case class DecodedRow(
      doc_id: Long, width: Int, height: Int, n_bytes: Long, mean_byte: Double)

  /** Build a media table from the documents table: payload = utf-8 bytes
    * (standing in for image bytes), metadata struct alongside. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(lit("image").as("kind"),
        (lit(1) + pmod(col("doc_id"), lit(64L)).cast("int")).as("declaredWidth")).as("meta"))

  /** ==== STUB DECODER (fallback) ====
    * Deterministic fake "image decode" for payloads no codec recognizes:
    * width from payload length, pixel mean from raw bytes — keeps the
    * pipeline verifiable end-to-end on arbitrary binary columns. */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Double) = {
    val w = 1 + (bytes.length % 64)
    val h = (bytes.length + w - 1) / w
    val mean = if (bytes.isEmpty) 0.0
    else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
    (w, h, mean)
  }

  /** ==== REAL DECODER ====
    * JDK ImageIO decode (PNG/JPEG/GIF/BMP — every registered reader).
    * Returns (width, height, mean over all raster samples: each band of
    * each pixel weighted equally) straight from the decoded raster — no
    * colorspace conversion, so lossless formats round-trip their sample
    * values exactly (what the mm_decode_image oracle pins). None when no
    * registered reader recognizes the bytes. */
  private def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Double)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val r = img.getRaster
        val bands = r.getNumBands
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < bands) { sum += r.getSample(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        val cnt = w.toLong * h * bands
        Some((w, h, if (cnt == 0) 0.0 else sum.toDouble / cnt))
      }
    } catch { case _: Exception => None }

  /** Partition-parallel batch decode: one task per partition, streaming
    * iterator (no per-row task overhead, no driver involvement) — the
    * exact execution shape a Pandas-UDF `mapInPandas` decode has in
    * PySpark. Real ImageIO decode when the payload is a recognized image
    * format; deterministic byte-stats stub otherwise (so non-image binary
    * columns still flow through the same pipeline). */
  def decode(media: DataFrame)(implicit spark: SparkSession): Dataset[DecodedRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // no temp-file cache for the in-memory streams ImageIO wraps
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val (w, h, m) = decodeImage(bytes).getOrElse(decodeStub(bytes))
          DecodedRow(id, w, h, bytes.length.toLong, m)
        }
      }
  }

  final case class ResizedRow(doc_id: Long, out_w: Int, out_h: Int, mean_byte: Double)

  /** Nearest-neighbor resize of the stub-decoded byte grid to a fixed
    * (outW × outH): source index = (r·h/outH, c·w/outW) — the REAL
    * resampling index math of a nearest-neighbor image resize; only the
    * "pixels" are stub bytes. Same partition-parallel batch shape as
    * decode; out-of-range samples read as 0. */
  def resize(media: DataFrame, outW: Int = 8, outH: Int = 8)(
      implicit spark: SparkSession): Dataset[ResizedRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, _) = decodeStub(bytes)
          var sum = 0L
          var r = 0
          while (r < outH) {
            var c = 0
            while (c < outW) {
              val idx = (r * h / outH) * w + (c * w / outW)
              if (idx < bytes.length) sum += (bytes(idx) & 0xff)
              c += 1
            }
            r += 1
          }
          ResizedRow(id, outW, outH, sum.toDouble / (outW * outH))
        }
      }
  }

  /** Feature extraction: `bins`-bin byte-value histogram per document —
    * the shape of any per-item dense feature vector (swap the histogram
    * for embedding-model output without touching the plumbing). Bins are
    * emitted as scalar columns so the result is engine-portable. */
  def featureExtract(media: DataFrame, bins: Int = 8)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val width = 256 / bins
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val counts = new Array[Long](bins)
          bytes.foreach(b => counts((b & 0xff) / width) += 1)
          (id, counts.toSeq)
        }
      }
      .toDF("doc_id", "counts")
      .select(col("doc_id") +:
        (0 until bins).map(k => element_at(col("counts"), k + 1).as(s"b$k")): _*)
  }

  final case class AudioFeatureRow(
      doc_id: Long, n_samples: Long, sum_sq: Long, zero_crossings: Long)

  /** Audio-analog features over the payload: treat each byte as a
    * centered PCM sample in [-128, 127] and emit the exact integer
    * energy (sum of squares — RMS is one sqrt away, kept integral so the
    * oracle gate is float-free) and the zero-crossing count (adjacent
    * sign flips, zero counted as non-negative) — the two cheapest
    * audio-quality signals. Same partition-parallel batch shape as
    * decode; swap the byte view for a real PCM decode at the marked
    * line. */
  def audioFeatures(media: DataFrame)(
      implicit spark: SparkSession): Dataset[AudioFeatureRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // >>> real audio decode goes here (javax.sound / FFmpeg binding)
          var sumSq = 0L
          var zc = 0L
          var i = 0
          var prevNeg = false
          while (i < bytes.length) {
            val s = (bytes(i) & 0xff) - 128
            sumSq += s.toLong * s
            val neg = s < 0
            if (i > 0 && neg != prevNeg) zc += 1
            prevNeg = neg
            i += 1
          }
          AudioFeatureRow(id, bytes.length.toLong, sumSq, zc)
        }
      }
  }

  /** Frame-sample shape: take every `stride`-th byte-window as a "frame"
    * and emit one row per frame — the video analog (explode after a
    * partition-parallel decode). */
  def frameSample(media: DataFrame, frameBytes: Int = 16, stride: Int = 64)(
      implicit spark: SparkSession): Dataset[(Long, Int, Double)] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          Iterator.range(0, math.max(bytes.length - frameBytes, 0), stride).map { off =>
            val frame = bytes.slice(off, off + frameBytes)
            val mean = frame.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / frame.length
            (id, off / stride, mean)
          }
        }
      }
  }
}
