package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-system ingest for opaque binary payloads — the front door of the
  * multimodal pipeline ([[graft.llm.Multimodal]] operates on `binary`
  * COLUMNS; real multimodal corpora arrive as object-store FILES, one
  * image/audio/video per object). Spark's built-in `binaryFile` source
  * turns a directory tree into (path, modificationTime, length, content)
  * rows with the scan distributed across executors — list + read
  * parallelism scales with files, no driver-side looping — and
  * `pathGlobFilter` prunes at listing time.
  *
  * [[readBinaryDir]] is the operator under certification: ingest a file
  * tree, key each blob by the numeric id in its file name, and expose
  * size + content digest — enough to join the blobs against a metadata
  * table and hand the `content` column to the Multimodal decode stages.
  * [[writeTextFiles]] is gate FIXTURE plumbing (it materializes a
  * file-per-document tree from a table so the read path has a
  * deterministic corpus); production corpora are written by upstream
  * collectors, not this library. */
object BinaryCorpus {

  /** One file per row — `<dir>/<id>.txt` holding the UTF-8 bytes of the
    * text column. Distributed write (foreachPartition), local/posix
    * target; fixture-only (see object scaladoc). */
  def writeTextFiles(docs: DataFrame, idCol: String, textCol: String,
                     dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .foreachPartition { it: Iterator[(Long, String)] =>
        it.foreach { case (id, text) =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"$id.txt"),
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      }
  }

  /** Ingest a binary file tree: one row per file matching `glob`, keyed
    * by the trailing integer in the file name, with byte length and an
    * md5 content digest (the join-key + integrity columns a multimodal
    * metadata join needs). `content` itself rides along for downstream
    * decode stages. */
  def readBinaryDir(spark: SparkSession, dir: String,
                    glob: String = "*.txt"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.[^.]+$", 1)
          .cast("long").as("doc_id"),
        col("length").as("n_bytes"),
        md5(col("content")).as("content_md5"),
        col("content"))
}
