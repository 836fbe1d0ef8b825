package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus curation.
  *
  * Training-data pipelines need samples that are REPRODUCIBLE — across
  * reruns, retries, engines, and cluster sizes — because the sample
  * feeds downstream jobs and audits. RNG-based `df.sample` is none of
  * those (partition-dependent). Hashing a stable id is all of them: keep
  * a row iff `hash(id) mod 100 < rate`. Pure projection + filter — no
  * shuffle, no state, trivially partition-parallel at any scale, and the
  * same rows survive no matter how the data is split.
  */
object Sampling {

  /** Uniform hash bucket in [0, buckets) from a stable id — md5 low bits
    * are uniform and engine-portable (same literal hex both sides of the
    * DuckDB gate). Shared by rate sampling (percent buckets) and
    * Packing's shard assignment. */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Deterministic global shuffle into training shards — the step between
    * curation and writing training files. Every example gets a seeded
    * shuffle key `md5(seed:id)`; shard = uniform hash of the key, order
    * within a shard = (key, id). Reproducible across reruns, engines, and
    * cluster sizes (no RNG, no partition dependence), and re-seeding
    * produces an independent permutation for the next epoch.
    *
    * Scale shape: one hash-partition exchange on `shard` plus a
    * per-shard sort (`repartition + sortWithinPartitions` when writing;
    * the returned frame carries shard + pos columns for the gate/audit).
    * No global sort: each shard orders independently, and nShards is
    * sized to the writer parallelism. */
  def deterministicShuffle(
      df: DataFrame, idCol: String, seed: Long, nShards: Int): DataFrame = {
    require(nShards > 0, "deterministicShuffle: nShards must be positive")
    val key = md5(concat(lit(seed.toString), lit(":"), col(idCol).cast("string")))
    val shard = pmod(conv(substring(key, 1, 4), 16, 10).cast("long"), lit(nShards.toLong))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("shuffle_key"), col(idCol))
    df.withColumn("shuffle_key", key)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
  }

  /** Dense GLOBAL example ordinal 0..n−1 in deterministic shuffled order
    * — the stable index a training run resumes from ("restart at example
    * 48,001,217") and the join key for example-level logging. The global
    * order is (shard, shuffle_key, id): [[deterministicShuffle]] gives
    * each shard dense local positions in parallel, then ONE bounded
    * driver step — the nShards per-shard counts — turns them global via
    * broadcast prefix offsets (the two-pass zipWithIndex shape, kept in
    * the DataFrame world: no RDD hop, no global sort, no single-reducer
    * window). Reproducible across reruns, engines, and cluster layouts.
    *
    * Output: the NARROW mapping (idCol, shard, pos, global_pos) — join
    * it back to payload columns by id at the use site; materializing the
    * ordinal should never force the text/embedding payload through a
    * checkpoint. The shuffled mapping is persisted across the counts
    * action and the serve branch (rule 7), materialized (eager
    * localCheckpoint — 4 narrow columns per row), then released. */
  def globalOrdinal(
      df: DataFrame, idCol: String, seed: Long, nShards: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sh = deterministicShuffle(df.select(col(idCol)), idCol, seed, nShards)
      .persist()
    // nShards rows of bounded metadata — never corpus rows
    val counts = sh.groupBy("shard").agg(count(lit(1)).as("cnt"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val offsets = counts.scanLeft((-1L, 0L)) {
      case ((_, acc), (s, c)) => (s, acc + c)
    }.tail.zip(counts).map { case ((s, end), (_, c)) => (s, end - c) }
    val offDf = offsets.toSeq.toDF("shard", "__off")
    val out = sh.join(broadcast(offDf), Seq("shard"), "left")
      .withColumn("global_pos", coalesce(col("__off"), lit(0L)) + col("pos"))
      .select(col(idCol), col("shard"), col("pos"), col("global_pos"))
      .localCheckpoint(true)
    sh.unpersist()
    out
  }

  /** Stratified sample: per-stratum keep-percentages (0-100), e.g. keep
    * 10% of 'en' docs and 50% of everything else — the downsample-the-
    * head / keep-the-tail shape of corpus language balancing. */
  def stratifiedHashSample(
      df: DataFrame, idCol: String, stratumCol: String,
      ratesPct: Map[String, Int], defaultPct: Int): DataFrame = {
    require((ratesPct.values ++ Seq(defaultPct)).forall(r => r >= 0 && r <= 100),
      "stratifiedHashSample: rates must be percentages in [0, 100]")
    val rate = ratesPct.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < rate)
  }

  /** Token-budget sampling: take ~`budget` tokens' worth of documents,
    * deterministically — "give me a 10B-token slice of this corpus" is
    * how training runs are actually sized. The corpus is hash-sharded
    * (same seeded md5 key as [[deterministicShuffle]], so the slice is a
    * uniform random-looking sample, reproducible across engines and
    * cluster layouts); each shard takes documents in key order while its
    * running token total stays within `budget / nShards`.
    *
    * Guarantees: total kept tokens <= budget (hard); each shard's
    * shortfall is at most one document, so the realized total is within
    * nShards × max_doc_tokens of the budget — tighten by raising
    * nShards. No global sort, no single reducer: one hash exchange on
    * `shard` plus a per-shard cumulative sum. */
  def tokenBudgetSample(
      df: DataFrame, idCol: String, weightCol: String,
      budget: Long, nShards: Int = 64, seed: Long = 9L): DataFrame = {
    require(budget >= 0, "tokenBudgetSample: budget must be >= 0")
    require(nShards > 0, "tokenBudgetSample: nShards must be positive")
    // A budget smaller than nShards would floor perShard to 0 and return
    // an empty sample; shrink the shard count so any positive budget
    // still keeps documents (ADVICE r5).
    val effShards = if (budget > 0) math.min(nShards.toLong, budget).toInt else nShards
    val key = md5(concat(lit(seed.toString), lit(":"), col(idCol).cast("string")))
    val shard = pmod(conv(substring(key, 1, 4), 16, 10).cast("long"), lit(effShards.toLong))
    val perShard = budget / effShards
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__key"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__key", key)
      .withColumn("shard", shard)
      .withColumn("cum_tokens", sum(col(weightCol)).over(w))
      .filter(col("cum_tokens") <= perShard)
      .drop("__key")
  }

  /** Deterministic train/val/test split assignment — the holdout step
    * every training corpus needs before packing. A document's split is a
    * pure function of (seed, id): seeded md5 bucket in [0, 100), the
    * lowest `testPct` buckets are test, the next `valPct` are val, the
    * rest train. Reproducible across reruns, engines, and cluster
    * layouts (no RNG, no partition dependence), and STABLE UNDER
    * APPEND — a document keeps its split when the corpus grows, so
    * yesterday's held-out set is never silently trained on. Re-seeding
    * produces an independent assignment. Pure projection: no shuffle,
    * partition-parallel at any scale. */
  def splitAssign(
      df: DataFrame, idCol: String, seed: Long,
      valPct: Int, testPct: Int): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100,
      "splitAssign: valPct/testPct must be >= 0 and sum to <= 100")
    val b = hashBucket(concat(lit(seed.toString), lit(":"), col(idCol).cast("string")))
    df.withColumn("split",
      when(b < testPct, lit("test"))
        .when(b < testPct + valPct, lit("val"))
        .otherwise(lit("train")))
  }

  /** Corpus mixing: per-source REAL-valued weights, up- and down-sampling
    * in one operator — the data-mixing step that turns curated sources
    * into a training distribution (2.5 means every doc appears twice and
    * half the docs a third time; 0.5 means half the docs appear once).
    *
    * Each row is emitted `floor(w)` times, plus one more iff its hash
    * bucket clears the fractional part — so the realized copy count is a
    * deterministic function of (id, seed), reproducible across reruns,
    * engines, and cluster layouts, and the expected multiplicity is
    * exactly w. The emitted `epoch` column (1-based copy index) is what
    * downstream shuffles key on so repeats land in different shards.
    *
    * Fractions are resolved at percent granularity (`round(frac*100)`):
    * coarse enough to be float-exact cross-engine, fine enough for mix
    * design. Pure projection + explode — no shuffle, no state. */
  def weightedMix(
      df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      seed: String = "mix"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w <= 100),
      "weightedMix: weights must be in [0, 100]")
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (k, v)) =>
      when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }
    val fracPct = round((w - floor(w)) * 100).cast("long")
    val tail = hashBucket(concat(col(idCol).cast("string"), lit(":"), lit(seed)))
      .lt(fracPct)
    val copies = floor(w).cast("long") + when(tail, 1L).otherwise(0L)
    df.withColumn("__n_copies", copies)
      .filter(col("__n_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(1L), col("__n_copies"))))
      .drop("__n_copies")
  }

  /** Temperature-scaled corpus mixing: down-weight head sources so the
    * sampling distribution is ∝ n_d^(1/τ) instead of ∝ n_d — the
    * multilingual/multi-source rebalancing rule (τ > 1 flattens; τ = ∞
    * would be uniform). Implemented at τ = 2 with EXACT integer
    * arithmetic so the sample is reproducible across engines: per-source
    * weight w_d = floor(sqrt(n_d)), target_d = (w_d · budget) / Σ w_d
    * (integer division — realized total is within #sources of budget),
    * and each source keeps its target_d documents with the smallest
    * seeded shuffle keys (same md5 key family as
    * [[deterministicShuffle]], so the per-source pick is a uniform,
    * append-stable-ish, engine-portable pseudo-sample).
    *
    * floor(sqrt(double)) is exact for n < 2^52 under IEEE sqrt (both
    * engines correctly round), so the Scala-side targets match a SQL
    * oracle's bit-for-bit.
    *
    * Scale shape: one count aggregate (map-side combinable; #sources
    * result rows — a bounded-metadata collect), then one exchange on
    * source for the per-source rank. A hot source funnels its rank
    * through one task; at production scale swap the exact rank for a
    * threshold on `hashBucket(id, n_d) < target_d` — same distribution,
    * zero shuffle, approximate count (documented trade; the exact form
    * is what a gate can pin). */
  def temperatureMix(
      df: DataFrame, idCol: String, sourceCol: String,
      budget: Long, seed: Long = 17L): DataFrame = {
    require(budget > 0, "temperatureMix: budget must be positive")
    val src = requireStringSource(df, sourceCol, "temperatureMix")
    val counts = src.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val weights = counts.map { case (s, n) =>
      (s, math.floor(math.sqrt(n.toDouble)).toLong)
    }
    val totalW = weights.map(_._2).sum
    require(totalW > 0, "temperatureMix: empty corpus")
    val target = weights.map { case (s, w) => (s, w * budget / totalW) }.toMap
    val targetCol = target.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }
    val key = md5(concat(lit(seed.toString), lit(":"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sourceCol).orderBy(col("__key"), col(idCol))
    src.withColumn("__key", key)
      .withColumn("__rk", row_number().over(w).cast("long"))
      .filter(col("__rk") <= targetCol)
      .drop("__key", "__rk")
  }

  /** Both mixers require a STRING source column and EXCLUDE null-source
    * rows (a null source names no mixture component; silently folding
    * it into "drop" was the old behavior — now it is the documented,
    * explicitly-filtered contract, and a non-string column fails fast
    * instead of throwing mid-collect). */
  private def requireStringSource(
      df: DataFrame, sourceCol: String, op: String): DataFrame = {
    val dt = df.schema(sourceCol).dataType
    require(dt == org.apache.spark.sql.types.StringType,
      s"$op: sourceCol '$sourceCol' must be STRING, got ${dt.simpleString}")
    df.filter(col(sourceCol).isNotNull)
  }

  /** The ZERO-SHUFFLE form of [[temperatureMix]]: instead of an exact
    * per-source rank (one exchange, hot sources funnel through one
    * task), keep a row iff its seeded hash bucket over n_d buckets falls
    * below the source's target — a pure projection + filter whose
    * realized per-source count is target_d in expectation with
    * hypergeometric-ish concentration (each document's inclusion is a
    * deterministic function of (seed, id), so the sample is still fully
    * reproducible and append-stable; only its SIZE is approximate).
    * Same integer target arithmetic as the exact form. This is the
    * 100 TB operating point; the exact form is what a hash-equality
    * gate can pin. */
  def temperatureMixThreshold(
      df: DataFrame, idCol: String, sourceCol: String,
      budget: Long, seed: Long = 17L): DataFrame = {
    require(budget > 0, "temperatureMixThreshold: budget must be positive")
    val src = requireStringSource(df, sourceCol, "temperatureMixThreshold")
    val counts = src.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val weights = counts.map { case (s, n) =>
      (s, math.floor(math.sqrt(n.toDouble)).toLong)
    }
    val totalW = weights.map(_._2).sum
    require(totalW > 0, "temperatureMixThreshold: empty corpus")
    val target = weights.map { case (s, w) => (s, w * budget / totalW) }.toMap
    // keep iff a 16-bit seeded hash clears the source's keep-fraction
    // threshold floor(2^16 · target_d / n_d) — md5-prefix buckets carry
    // 16 bits, so the realized rate is within 2^-16 of target_d / n_d
    val keep = counts.foldLeft(lit(false)) { case (acc, (s, n)) =>
      val thr = 65536L * target.getOrElse(s, 0L) / math.max(n, 1L)
      when(col(sourceCol) === s,
        hashBucket(concat(lit(seed.toString), lit(":"),
          col(idCol).cast("string")), 65536) < lit(thr)).otherwise(acc)
    }
    src.filter(keep)
  }

  /** Deterministic in-shard negative sampling — the pairing step of
    * contrastive/embedding training: each example gets `k` negatives
    * drawn from its own hash shard, as a pure function of (seed, id, j)
    * — reproducible across reruns, engines, and cluster layouts, like
    * every sampler here. In-shard is also how production contrastive
    * batches actually draw negatives (from the same batch/shard), which
    * is what makes this scale: each shard ranks and self-joins
    * independently — per-shard windows and a per-shard equi-join, no
    * global sort, no single reducer, no driver data.
    *
    * Within a shard of size m, example at rank r takes negatives at
    * ranks (r + 1 + h_j) mod m with h_j = hash16(seed:id:j) mod (m−1) —
    * never its own rank. Shards of size 1 emit no negatives. Returns
    * (id, j, neg_id). */
  def negativeSample(
      df: DataFrame, idCol: String, k: Int,
      nShards: Int = 64, seed: Long = 23L): DataFrame = {
    require(k > 0, "negativeSample: k must be positive")
    require(nShards > 0, "negativeSample: nShards must be positive")
    val key = md5(concat(lit(seed.toString), lit(":"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__key"), col(idCol))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("shard")
    val ranked = df
      .withColumn("__key", key)
      .withColumn("shard",
        pmod(conv(substring(col("__key"), 1, 4), 16, 10).cast("long"),
          lit(nShards.toLong)))
      .withColumn("r", row_number().over(w).cast("long") - 1L)
      .withColumn("m", count(lit(1)).over(wAll))
      .select(col(idCol), col("shard"), col("r"), col("m"))
    val wanted = ranked.filter(col("m") > 1)
      .select(col(idCol), col("shard"), col("r"), col("m"),
        explode(sequence(lit(1), lit(k))).as("j"))
      .withColumn("__h",
        hashBucket(concat(lit(seed.toString), lit(":"),
          col(idCol).cast("string"), lit(":"), col("j")), 65536))
      .withColumn("nr",
        pmod(col("r") + 1L + pmod(col("__h"), col("m") - 1L), col("m")))
    wanted
      .join(ranked.select(col(idCol).as("neg_id"), col("shard"),
        col("r").as("nr")), Seq("shard", "nr"))
      .select(col(idCol), col("j").cast("long").as("j"), col("neg_id"))
  }
}
