package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Materialized IVF index: the corpus written PARTITIONED BY CELL, so a
  * query reads only its probed cells — nProbe/nCells of the data as a
  * planning-time partition-pruned scan (PartitionFilters on `cid`), not a
  * full-corpus scan re-assigned per query. This is the piece that turns
  * ivfTopK's inverted-list shape into an actual inverted LIST on disk:
  * at 100 TB the serving cost is proportional to the probed fraction.
  *
  * Layout: `<path>/cid=<cell>/…` parquet plus an underscore-hidden
  * `_centroids` sidecar (invisible to data reads) holding the quantizer,
  * so a reader needs no access to the original corpus or its row count.
  */
object IvfIndex {

  /** Assign every corpus vector to its nearest centroid (zero-shuffle
    * projection) and write cell-partitioned parquet + centroid sidecar. */
  def write(
      corpus: DataFrame, vecCol: String, idCol: String, path: String,
      nCells: Int = 16,
      corpusRows: Option[Long] = None,
      trainedCentroids: Option[Seq[Seq[Double]]] = None): Unit = {
    val spark = corpus.sparkSession
    val cents =
      Similarity.centroidsOf(corpus, vecCol, idCol, nCells, corpusRows, trainedCentroids)
    Similarity.assignCells(corpus, cents, vecCol, idCol, "neighbor", 1)
      .write.mode("overwrite").partitionBy("cid").parquet(path)
    import spark.implicits._
    cents.toDF("cid", "c_vec")
      .write.mode("overwrite").parquet(s"$path/_centroids")
  }

  private def readCentroids(spark: SparkSession, path: String): Seq[(Long, Seq[Float])] =
    spark.read.parquet(s"$path/_centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq.sortBy(_._1)

  /** Append new vectors into the existing cell layout using the index's
    * OWN sidecar quantizer — every appended row lands in one of the
    * existing cell directories (keep=1 against the stored centroids), so
    * pruned reads stay correct without re-indexing the corpus. The daily
    * incremental shape: index once, append batches. */
  def append(batch: DataFrame, vecCol: String, idCol: String, path: String): Unit = {
    val cents = readCentroids(batch.sparkSession, path)
    Similarity.assignCells(batch, cents, vecCol, idCol, "neighbor", 1)
      .write.mode("append").partitionBy("cid").parquet(path)
  }

  /** Approximate top-k against a written index. Queries are assigned their
    * nProbe cells by the sidecar quantizer (projection over literals); the
    * union of probed cells — bounded by |queries| × nProbe — becomes a
    * partition IN-filter, so only those cell directories are listed and
    * scanned. Identical results to `Similarity.ivfTopK` with the same
    * centroids (same assignment expressions, same rank contract). */
  def topK(
      spark: SparkSession, path: String, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, nProbe: Int = 4): DataFrame = {
    val cents = readCentroids(spark, path)
    val queryCells =
      Similarity.assignCells(queries, cents, vecCol, idCol, "query", nProbe)
    val probed = queryCells.select("cid").distinct()
      .collect().map(_.getLong(0)).toSeq.sorted

    val idx = spark.read.parquet(path)
    // partition-value inference types `cid` by its directory values (int
    // when they fit) — match the literal type so the IN-filter stays a
    // planning-time PartitionFilter instead of a cast that defeats pruning
    val cidLits: Seq[Any] = idx.schema("cid").dataType match {
      case LongType => probed
      case IntegerType => probed.map(_.toInt)
      case _ => probed.map(_.toString)
    }
    val cells = idx.filter(col("cid").isin(cidLits: _*))
      .select(col("neighbor_id"), col("neighbor_vec"), col("cid").cast("long").as("cid"))

    val cand = cells.join(broadcast(queryCells), "cid")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.cosine(col("query_vec"), col("neighbor_vec")), 6).as("c_r"))
    Similarity.rankTopK(cand, k)
  }
}
