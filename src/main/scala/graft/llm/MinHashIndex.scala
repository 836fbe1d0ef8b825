package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Materialized MinHash near-dup index — the persistence layer
  * [[Dedup.minhashNearDupPairsIncremental]]'s scaladoc promises ("in
  * production the corpus side's signatures persist as a table
  * maintained by previous runs"). Without it, every daily batch
  * re-scans and re-shingles the WHOLE corpus to rebuild signatures the
  * previous run already computed — O(corpus) per run. With it, a batch
  * run reads only:
  *
  *  - the band-key buckets the batch's own band keys hash into
  *    (`bands/kb=<b>/…`, planning-time PartitionFilters), and
  *  - the id buckets of the verification candidates
  *    (`sets/ib=<b>/…`, same mechanism),
  *
  * so per-run cost scales with the batch and its collision
  * neighborhood, not the corpus. Same layout family as [[IvfIndex]]
  * and the lexical index (Retrieval.writeIndex): content-hash bucket
  * directories + append-only growth + [[IvfLayout.compact]] hygiene.
  *
  * Results are pinned equal to the recompute-everything path
  * (R7Spec), and the `dedup_incremental_indexed` gate certifies the
  * served pairs against the same independent DuckDB derivation as
  * `dedup_incremental`. Ids must be disjoint between the index and any
  * served batch (the existing incremental contract). */
object MinHashIndex {

  private def kb(key: org.apache.spark.sql.Column, n: Int) =
    pmod(xxhash64(key), lit(n.toLong))
  private def ib(id: org.apache.spark.sql.Column, n: Int) =
    pmod(xxhash64(id), lit(n.toLong))

  /** Build the index: banded LSH rows bucketed by band-key hash, and
    * the sorted shingle-hash sets bucketed by id hash, each under a
    * `run=__base__` slot ([[RunSlots]]). */
  def write(docs: DataFrame, textCol: String, idCol: String, path: String,
            shingleN: Int = 3, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, "MinHashIndex.write: nBuckets must be positive")
    val spark = docs.sparkSession
    RunSlots.reset(spark, s"$path/bands")
    RunSlots.reset(spark, s"$path/sets")
    val sets = Dedup.shingleHashSets(docs, textCol, idCol, shingleN).persist()
    RunSlots.write(
      Dedup.bandRows(sets)
        .withColumn("kb", kb(col("key"), nBuckets))
        .repartition(col("kb"), col("key")),
      s"$path/bands", "kb", Some(RunSlots.Base))
    RunSlots.write(
      sets.withColumn("ib", ib(col("id"), nBuckets))
        .repartition(col("ib"), col("id")),
      s"$path/sets", "ib", Some(RunSlots.Base))
    sets.unpersist()
  }

  /** Append a batch's signatures into the existing buckets (the bucket
    * functions are content hashes, so placement never drifts). Run
    * AFTER serving the batch's pairs — the index then holds it as
    * corpus for the next run. `runId` makes the append a replayable
    * slot overwrite ([[RunSlots]] — foreachBatch exactly-once);
    * without it rows accumulate under the ad-hoc slot. */
  def append(batch: DataFrame, textCol: String, idCol: String, path: String,
             shingleN: Int = 3, nBuckets: Int = 64,
             runId: Option[String] = None): Unit = {
    RunSlots.requireNamedRunId(runId, "MinHashIndex.append")
    // standing takedown protection BEFORE shingling (forgotten ids
    // never re-index, and their shingles are never computed)
    val kept = Denylist.exclude(batch, idCol, batch.sparkSession, path)
    val sets = Dedup.shingleHashSets(kept, textCol, idCol, shingleN).persist()
    appendSets(sets, path, nBuckets, runId)
    sets.unpersist()
  }

  /** [[append]] for the index's single checkpointed stream: mints the
    * reserved `b<batchId>` run id (manual appends must use a
    * non-numeric name — the fold manifest's collapse semantics apply
    * to the `b<digits>` namespace). */
  def appendBatch(batch: DataFrame, textCol: String, idCol: String,
                  path: String, shingleN: Int, nBuckets: Int,
                  batchId: Long): Unit = {
    val kept = Denylist.exclude(batch, idCol, batch.sparkSession, path)
    val sets = Dedup.shingleHashSets(kept, textCol, idCol, shingleN).persist()
    appendSets(sets, path, nBuckets, Some(s"b$batchId"))
    sets.unpersist()
  }

  /** [[append]] from precomputed signature sets (the
    * [[Dedup.shingleHashSets]] shape) — the serve-then-append loop
    * computes signatures once and feeds both sides. EVERY caller
    * pre-excludes the denylist before shingling (append, appendBatch,
    * and serveThenAppendSlot, whose plan also serves from the filtered
    * sets) — excluding again here would re-read the list and re-run a
    * guaranteed-no-op anti-join per micro-batch (the r15
    * stream_chunkstore redundant-read class). */
  private[graft] def appendSets(sets: DataFrame, path: String,
                                nBuckets: Int,
                                runId: Option[String] = None): Unit = {
    RunSlots.write(
      Dedup.bandRows(sets)
        .withColumn("kb", kb(col("key"), nBuckets))
        .repartition(col("kb"), col("key")),
      s"$path/bands", "kb", runId)
    RunSlots.write(
      sets.withColumn("ib", ib(col("id"), nBuckets))
        .repartition(col("ib"), col("id")),
      s"$path/sets", "ib", runId)
  }

  /** One file per bucket directory after N appends (both tables);
    * tombstoned ids are purged from both and the markers cleared. */
  def compact(spark: SparkSession, path: String): Unit = {
    // the two tables are independent staged rewrites under different
    // lease keys — bounded overlap (§2.6); markers clear only after
    // BOTH folds land, exactly as before
    graft.core.Par.run3(
      () => IvfLayout.compact(spark, s"$path/bands", partCol = "kb",
        transform = df => Tombstones.exclude(df, "id", spark, path)),
      () => IvfLayout.compact(spark, s"$path/sets", partCol = "ib",
        transform = df => Tombstones.exclude(df, "id", spark, path)))
    Tombstones.clear(spark, path)
  }

  /** Tombstone indexed documents: [[nearDupPairsIncremental]] /
    * [[serveThenAppend]] stop pairing against them immediately (no
    * rewrite); [[compact]] reclaims their band and set rows. A marker
    * hides its id even in rows appended AFTER the deletion — to re-add
    * a deleted id, compact first or use a fresh id
    * ([[Tombstones]] re-ingest trap). */
  def deleteDocs(ids: DataFrame, idCol: String, path: String): Unit =
    Tombstones.add(ids, idCol, path)

  private def typedLits(df: DataFrame, colName: String, vals: Seq[Long]): Seq[Any] =
    df.schema(colName).dataType match {
      case LongType => vals
      case IntegerType => vals.map(_.toInt)
      case _ => vals.map(_.toString)
    }

  /** Near-dup pairs touching `batch` — new-vs-index and new-vs-new,
    * never index-vs-index — identical results to
    * [[Dedup.minhashNearDupPairsIncremental]] over the indexed corpus,
    * reading only the batch's band-key buckets and the candidates' id
    * buckets.
    *
    * The returned pairs are MATERIALIZED (eager localCheckpoint) before
    * the three intermediate caches (signatures, band rows, candidates)
    * are released — a long-lived session serving daily batches would
    * otherwise accumulate cached blocks run over run until memory
    * pressure evicts them ([[write]]/[[append]] already unpersist; this
    * path's result depends on the caches, so release must follow
    * materialization). The pair set is tiny relative to the corpus, and
    * its checkpoint blocks are context-cleaner-collected with the
    * returned DataFrame. */
  def nearDupPairsIncremental(
      spark: SparkSession, path: String, batch: DataFrame,
      textCol: String, idCol: String,
      jaccardThreshold: Double = 0.8, shingleN: Int = 3,
      nBuckets: Int = 64): DataFrame = {
    val (lazyPairs, caches) = nearDupPairsIncrementalPlan(
      spark, path, batch, textCol, idCol, jaccardThreshold, shingleN, nBuckets)
    val out = lazyPairs.localCheckpoint(true)
    caches.foreach(_.unpersist())
    out
  }

  /** The lazy serve plan plus its live caches — split out so the bucket
    * PartitionFilters stay inspectable (R7Spec pins them; the public
    * entry's eager checkpoint severs the lineage they live in). Callers
    * of THIS form own the returned caches. */
  private[llm] def nearDupPairsIncrementalPlan(
      spark: SparkSession, path: String, batch: DataFrame,
      textCol: String, idCol: String,
      jaccardThreshold: Double, shingleN: Int,
      nBuckets: Int): (DataFrame, Seq[DataFrame]) = {
    // standing takedown protection on the serve-only route too: a
    // forgotten doc in the candidate batch must not emit pairs into
    // the caller's pair store (r16 review, second pass)
    val kept = Denylist.exclude(batch, idCol, spark, path)
    val newSets = Dedup.shingleHashSets(kept, textCol, idCol, shingleN).persist()
    val (pairs, caches) = planFromSets(spark, path, newSets,
      jaccardThreshold, nBuckets)
    (pairs, newSets +: caches)
  }

  /** One serve-then-append cycle with the batch's signatures computed
    * ONCE: serve the batch's near-dup pairs (handed to `writePairs`,
    * which MUST materialize them synchronously — their plan still reads
    * the pre-append index), then append the same signature sets into the
    * index. The streaming micro-batch loop runs on this; the two-call
    * [[nearDupPairsIncremental]]+[[append]] shape shingles every batch
    * twice and pays an extra localCheckpoint materialization. */
  def serveThenAppend(
      spark: SparkSession, path: String, batch: DataFrame,
      textCol: String, idCol: String,
      jaccardThreshold: Double = 0.8, shingleN: Int = 3,
      nBuckets: Int = 64, runId: Option[String] = None)(
      writePairs: DataFrame => Unit): Unit = {
    RunSlots.requireNamedRunId(runId, "MinHashIndex.serveThenAppend")
    serveThenAppendSlot(spark, path, batch, textCol, idCol,
      jaccardThreshold, shingleN, nBuckets, runId)(writePairs)
  }

  /** [[serveThenAppend]] for the checkpointed stream (mints `b<id>`). */
  def serveThenAppendBatch(
      spark: SparkSession, path: String, batch: DataFrame,
      textCol: String, idCol: String,
      jaccardThreshold: Double, shingleN: Int,
      nBuckets: Int, batchId: Long)(
      writePairs: DataFrame => Unit): Unit =
    serveThenAppendSlot(spark, path, batch, textCol, idCol,
      jaccardThreshold, shingleN, nBuckets, Some(s"b$batchId"))(writePairs)

  private def serveThenAppendSlot(
      spark: SparkSession, path: String, batch: DataFrame,
      textCol: String, idCol: String,
      jaccardThreshold: Double, shingleN: Int,
      nBuckets: Int, runId: Option[String])(
      writePairs: DataFrame => Unit): Unit = {
    // standing takedown protection applied to the WHOLE loop, serve
    // included (matching ContainIndex.serveThenAppendSlot): a forgotten
    // doc must neither re-index NOR emit near-dup pairs into the
    // caller's pair store — served pairs naming a taken-down id are a
    // downstream artifact no audit covers (r16 review)
    val kept = Denylist.exclude(batch, idCol, spark, path)
    val sets = Dedup.shingleHashSets(kept, textCol, idCol, shingleN).persist()
    val (lazyPairs, caches) = planFromSets(spark, path, sets,
      jaccardThreshold, nBuckets)
    writePairs(lazyPairs)
    appendSets(sets, path, nBuckets, runId)
    (sets +: caches).foreach(_.unpersist())
  }

  /** The serve plan from precomputed (persisted) signature sets; the
    * returned caches exclude `newSets`, which the caller owns. */
  private def planFromSets(
      spark: SparkSession, path: String, newSets: DataFrame,
      jaccardThreshold: Double,
      nBuckets: Int): (DataFrame, Seq[DataFrame]) = {
    val nb = Dedup.bandRows(newSets).persist()

    // bounded driver metadata: distinct band-key buckets of the batch
    val kbs = nb.select(kb(col("key"), nBuckets).as("kb")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    val bandsRaw = spark.read.parquet(s"$path/bands")
    val idxBands = Tombstones.exclude(
      bandsRaw
        .filter(col("kb").isin(typedLits(bandsRaw, "kb", kbs): _*))
        .select(col("id"), col("band"), col("key")),
      "id", spark, path)

    val left = nb.select(col("band"), col("key"), col("id").as("nid"))
    val right = idxBands.unionByName(nb)
      .select(col("band"), col("key"), col("id").as("oid"))
    val cand = left.join(right, Seq("band", "key"))
      .filter(col("nid") =!= col("oid"))
      .select(least(col("nid"), col("oid")).as("id_a"),
        greatest(col("nid"), col("oid")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .persist()

    // candidates' id buckets (batch ids hash to buckets too — harmless
    // extra reads, still bounded by nBuckets)
    val ibs = cand.select(ib(col("id_a"), nBuckets).as("ib"))
      .unionByName(cand.select(ib(col("id_b"), nBuckets).as("ib")))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
    val setsRaw = spark.read.parquet(s"$path/sets")
    // band-side exclusion already keeps deleted ids out of candidates;
    // excluding here too keeps the verify join honest if a deleted id
    // arrives via the batch side of a candidate pair
    val idxSets = Tombstones.exclude(
      setsRaw
        .filter(col("ib").isin(typedLits(setsRaw, "ib", ibs): _*))
        .select(col("id"), col("hs")),
      "id", spark, path)
    val allSets = newSets.unionByName(idxSets)

    (Dedup.verifyJaccard(cand, allSets, jaccardThreshold),
      Seq(nb, cand))
  }

  /** Store integrity audit over the two copies of the signature data:
    *  - `band_without_set` (CORRUPTION): a banding row whose id has no
    *    signature-set row — it can nominate candidate pairs the
    *    verifier cannot load the set for;
    *  - `set_without_band` (CORRUPTION): a signature set absent from
    *    the banding copy — the doc is INVISIBLE to candidate
    *    generation and silently escapes every near-dup check. */
  def fsck(spark: SparkSession, path: String): DataFrame = {
    val setIds = spark.read.parquet(s"$path/sets").select("id").distinct()
      .persist()
    val bandIds = spark.read.parquet(s"$path/bands").select("id").distinct()
      .persist()
    val orphanBand = bandIds.join(setIds, Seq("id"), "left_anti").count()
    val silentSet = setIds.join(bandIds, Seq("id"), "left_anti").count()
    setIds.unpersist(); bandIds.unpersist()
    import spark.implicits._
    Seq(("band_without_set", orphanBand), ("set_without_band", silentSet))
      .toDF("check", "violations")
  }

}
