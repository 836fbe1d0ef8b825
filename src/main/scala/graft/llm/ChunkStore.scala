package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content-addressed chunk store: [[Curation.cdcChunks]] materialized
  * into deduplicated storage — the rsync/LBFS/restic layout as a
  * corpus table format. Near-identical documents (crawl re-fetches,
  * versioned pages, boilerplate wrappers) share every chunk outside
  * their edit neighborhoods, so the store holds each distinct chunk
  * ONCE and documents become manifests of chunk hashes:
  *
  *  - `chunks/cb=<b>/…` — (chunk_hash, chunk), one row per DISTINCT
  *    chunk, bucketed by a 16-bit prefix of the content hash (same
  *    bucket-directory family as [[MinHashIndex]] / the lexical index);
  *  - `manifest/…`      — (doc_id, chunk_idx, chunk_hash), append-only.
  *
  * Append cost tracks the BATCH, not the corpus: a new batch's chunks
  * dedup against only the `cb=` buckets its own hashes fall into
  * (planning-time PartitionFilters — the incremental-index discipline),
  * and within them via one LEFT ANTI join on chunk_hash. Reconstruction
  * is one equi-join manifest→chunks on the content hash plus a per-doc
  * reassembly — exact byte-for-byte round trip (the `chunkstore_roundtrip`
  * gate oracles it against the source table itself). */
object ChunkStore {

  private def cb(hash: Column, n: Int): Column =
    pmod(conv(substring(hash, 1, 4), 16, 10).cast("long"), lit(n.toLong))

  /** Build the store from scratch (an existing store at `path` is
    * removed first: under dynamic partition overwrite a partitioned
    * re-write would only clear the buckets it touches, silently keeping
    * stale chunks and manifests). */
  def write(docs: DataFrame, textCol: String, idCol: String, path: String,
            nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, "ChunkStore.write: nBuckets must be positive")
    val root = new java.io.File(path)
    if (root.exists) {
      import java.nio.file.{Files, Paths}
      Files.walk(Paths.get(path)).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    val ch = Curation.cdcChunks(docs, textCol, idCol).persist()
    ch.groupBy("chunk_hash").agg(first(col("chunk")).as("chunk"))
      .withColumn("cb", cb(col("chunk_hash"), nBuckets))
      .repartition(col("cb"))
      .write.mode("overwrite").partitionBy("cb").parquet(s"$path/chunks")
    ch.select(col(idCol).as("doc_id"), col("chunk_idx"), col("chunk_hash"))
      .write.mode("overwrite").parquet(s"$path/manifest/run=__base__")
    ch.unpersist()
  }

  /** Append a batch: manifests land whole; chunk rows are stored only
    * for hashes the store has never seen. The anti-join's store side is
    * pruned to the batch's own `cb=` buckets — a planning-time
    * PartitionFilter, so the append never scans the full chunk table.
    *
    * `runId` scopes the manifest write to `manifest/run=<id>` with
    * OVERWRITE — an idempotent retry slot (the streaming ingest passes
    * its micro-batch id, so a replayed batch rewrites its own manifests
    * instead of duplicating them; a replay's chunk rows anti-join away
    * against the first attempt's). Without it the manifest is a plain
    * append. A store mixes the two freely: `run=` is a partition value,
    * and bare appends land under `run=__adhoc__`. */
  def append(batch: DataFrame, textCol: String, idCol: String, path: String,
             nBuckets: Int = 64, runId: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    val ch = Curation.cdcChunks(batch, textCol, idCol).persist()
    val newChunks = ch.groupBy("chunk_hash").agg(first(col("chunk")).as("chunk"))
      .withColumn("cb", cb(col("chunk_hash"), nBuckets))
      .persist()
    val touched = newChunks.select("cb").distinct()
      .collect().map(_.getLong(0)) // bounded: <= nBuckets values
    // a store seeded from an empty corpus has no cb= dirs yet (parquet
    // cannot persist a zero-file schema) — treat it as zero known hashes
    val chunkDirs = Option(new java.io.File(s"$path/chunks").listFiles)
      .exists(_.exists(f => f.isDirectory && f.getName.startsWith("cb=")))
    val existing =
      if (chunkDirs)
        spark.read.parquet(s"$path/chunks")
          .filter(col("cb").isin(touched: _*))
          .select("chunk_hash")
      else
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("chunk_hash",
              org.apache.spark.sql.types.StringType))))
    newChunks.join(existing, Seq("chunk_hash"), "left_anti")
      .repartition(col("cb"))
      .write.mode("append").partitionBy("cb").parquet(s"$path/chunks")
    val man = ch.select(col(idCol).as("doc_id"), col("chunk_idx"), col("chunk_hash"))
    runId match {
      case Some(id) =>
        man.write.mode("overwrite").parquet(s"$path/manifest/run=$id")
      case None =>
        man.write.mode("append").parquet(s"$path/manifest/run=__adhoc__")
    }
    newChunks.unpersist(); ch.unpersist()
  }

  /** Reassemble (doc_id, text) for every manifested document — the
    * byte-exact inverse of [[write]]/[[append]] for non-empty texts
    * (empty documents chunk to nothing and are not manifested). One
    * equi-join on the content hash + one per-doc reassembly shuffle. */
  def reconstruct(spark: SparkSession, path: String): DataFrame = {
    val man = spark.read.parquet(s"$path/manifest")
    val ch = spark.read.parquet(s"$path/chunks").select("chunk_hash", "chunk")
    man.join(ch, "chunk_hash")
      .groupBy("doc_id")
      .agg(concat_ws("", expr(
        "transform(array_sort(collect_list(struct(chunk_idx, chunk))), x -> x.chunk)"))
        .as("text"))
  }

  /** Storage accounting: manifested vs stored chunk rows/bytes. */
  def stats(spark: SparkSession, path: String): DataFrame = {
    val man = spark.read.parquet(s"$path/manifest")
    val ch = spark.read.parquet(s"$path/chunks")
    man.agg(count(lit(1)).as("manifest_chunks"))
      .crossJoin(ch.agg(count(lit(1)).as("stored_chunks"),
        sum(length(col("chunk"))).cast("long").as("stored_chars")))
  }

  /** One file per chunk bucket after N appends. */
  def compact(spark: SparkSession, path: String): Unit =
    IvfLayout.compact(spark, s"$path/chunks", partCol = "cb")
}
