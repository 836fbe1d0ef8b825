package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, processed partition-parallel in batches.
  *
  * The Spark-side plumbing here is real and tested — schema, partition
  * parallelism, batch iteration shape (`mapPartitions` over a typed
  * Dataset, the JVM analog of `mapInPandas` batches). The media DECODE
  * itself is a clearly-marked deterministic STUB (this container has no
  * image/audio codecs): it derives pixel-ish stats from the raw bytes, so
  * the whole pipeline stays verifiable end-to-end. Swap `decodeStub` for a
  * real codec (e.g. TwelveMonkeys/JavaCV) without touching the plumbing.
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

  /** ==== STUB DECODER ====
    * Deterministic fake "image decode": width from payload length, pixel
    * mean from raw bytes. Replace with a real codec at the marked line;
    * everything around it (batching, schema, parallelism) is production
    * shape. */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Double) = {
    // >>> real codec call goes here (e.g. ImageIO.read(new ByteArrayInputStream(bytes)))
    val w = 1 + (bytes.length % 64)
    val h = (bytes.length + w - 1) / w
    val mean = if (bytes.isEmpty) 0.0
    else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
    (w, h, mean)
  }

  /** Partition-parallel batch decode: one task per partition, streaming
    * iterator (no per-row task overhead, no driver involvement) — the
    * exact execution shape a Pandas-UDF `mapInPandas` decode has in
    * PySpark. */
  def decode(media: DataFrame)(implicit spark: SparkSession): Dataset[DecodedRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, m) = decodeStub(bytes)
          DecodedRow(id, w, h, bytes.length.toLong, m)
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
