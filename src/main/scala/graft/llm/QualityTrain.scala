package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed trainer for the hashed bag-of-words quality classifier
  * whose INFERENCE side has shipped since round 6
  * ([[TextStats.modelQualityScore]] — the CCNet/GPT-3-style
  * quality-filter model; cf. reference `macros/` which treats model
  * artifacts as externally-supplied). This closes the loop: the weights
  * are no longer a hand-shipped artifact, they are trained IN the
  * engine, on the corpus, by distributed gradient descent — the
  * fasttext-classifier role in a CCNet-style curation stack, expressed
  * as Spark aggregations.
  *
  * The model is logistic-regression-shaped but built for CROSS-ENGINE
  * EXACTNESS (the repo's oracle discipline): all state is fixed-point
  * BIGINT micros, the link is the HARD sigmoid
  * `p = clamp(1/2 + z/4, 0, 1)` (piecewise-linear, so every step is
  * rational), and every division is integer division — both Spark's
  * `div` and DuckDB's `//` truncate toward zero, so a DuckDB oracle
  * replays training bit-for-bit. Summed quantities are truncated
  * PER-ROW before the sum (`Σ idiv(e·cnt, n)`), keeping partial
  * aggregation order-independent — the same exact-integer posture as
  * [[LmScore]] and the fixed-point centroids.
  *
  * Features: token `t` hashes to bucket `(md5_32(t) mod d) + 1` — the
  * exact bucketing [[TextStats.modelQualityScore]] applies at inference
  * — and the document feature vector is the token-count histogram
  * normalized by document length (the division is folded into the
  * per-doc margin and per-doc gradient quotients). Bucket 0 is the
  * bias (a synthetic feature with cnt = n, so `w0·n/n = w0`).
  *
  * Per iteration (T iterations, d+1 weights):
  *   z_doc = idiv(Σ_j w_j·cnt_j, n)           -- margin, micros
  *   p     = clamp(500000 + idiv(z, 4), 0, 1e6) -- hard sigmoid
  *   e     = p − y·1e6                          -- signed error
  *   g_j   = Σ_docs idiv(e·cnt_j, n)            -- gradient, micros
  *   w_j  ← w_j − idiv(lrNum·g_j, lrDen·N)
  *
  * Distribution shape (the 100 TB audit): the feature frame
  * (doc, bucket, cnt, n) is built ONCE — one explode + one hash
  * aggregate — then repartitioned by doc and persisted (PLANS.md
  * rule 7: it feeds every iteration twice). Each iteration is ONE job:
  * margin aggregate per doc (co-partitioned — no exchange), join the
  * N-row error frame back to features on doc (co-partitioned — no
  * exchange), gradient groupBy(bucket) whose output is d+1 rows (the
  * only per-iteration exchange carries ≤ (d+1) × tasks partial rows),
  * collect d+1 longs to the driver. Weights ride the plan as a literal
  * array — no join against a weights table, no driver-side data beyond
  * the model itself. Cost per iteration is one pass over the CACHED
  * feature frame; nothing re-tokenizes the corpus.
  *
  * Overflow: |e| ≤ 1e6, cnt ≤ n, so per-row products fit comfortably;
  * margins are bounded by d·max|w|·1, and |w| grows at most
  * lr·1e6/iteration. ANSI mode turns any violation into an error, not
  * a wrong answer.
  *
  * Plan-size boundary: the weight vector rides the plan as a LITERAL
  * array (`typedLit`) — constant per plan but linear in d. Fine for
  * the fasttext-style regime this models; past `LiteralWeightMax`
  * (64k) the margin sums switch automatically to a broadcast
  * (bucket, w) join — bit-identical sums, one extra BroadcastHashJoin
  * per iteration, plan size constant in d (TrainSpec pins parity). */
object QualityTrain {

  /** Trained model: `weightsMicro(0)` is the bias, `weightsMicro(j)` the
    * weight of hash bucket j (1-based), all in fixed-point micros. */
  final case class Model(weightsMicro: Array[Long], d: Int,
                         iters: Int, lrNum: Long, lrDen: Long,
                         nTrain: Long) {
    /** Handoff to [[TextStats.modelQualityScore]]: (bucket weights as
      * doubles, bias). The scorer's mean-weight feature equals this
      * model's margin up to the fixed-point truncation. */
    def toScorer: (Seq[Double], Double) =
      (weightsMicro.drop(1).map(_ / 1e6).toSeq, weightsMicro(0) / 1e6)
  }

  /** `(md5_32(token) mod d) + 1` — identical to the inference-side
    * bucketing in [[TextStats.modelQualityScore]]. */
  private def bucket(t: Column, d: Int): Column =
    (pmod(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), lit(d.toLong)) + 1)
      .cast("int")

  /** Exploded training features: (id, y, bucket, cnt, n), with the
    * synthetic bias row (bucket 0, cnt = n) per document. Zero-token
    * documents are EXCLUDED — they carry no feature signal and the
    * inference side already defines their score as sigmoid(bias). */
  def features(df: DataFrame, textCol: String, idCol: String,
               labelCol: String, d: Int): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        col(labelCol).cast("long").as("y"),
        Dedup.tokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .filter(col("n") > 0)
    val feat = toks.select(col("id"), col("y"), col("n"),
        explode(col("toks")).as("tok"))
      .groupBy(col("id"), col("y"), col("n"), bucket(col("tok"), d).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val bias = toks.select(col("id"), col("y"), col("n"),
      lit(0).as("bucket"), col("n").as("cnt"))
    feat.unionByName(bias)
  }

  /** Train for `iters` iterations of full-batch gradient descent.
    * Labels must be 0/1 (cast to long). */
  def train(df: DataFrame, textCol: String, idCol: String, labelCol: String,
            d: Int = 64, iters: Int = 3,
            lrNum: Long = 1L, lrDen: Long = 1L): Model =
    descend(df, textCol, idCol, labelCol, d, iters, lrNum, lrDen,
      w0 = Array.fill(d + 1)(0L))

  /** WARM-START continuation: keep descending from a previously trained
    * (or deployed) model's weights over a NEW corpus — the incremental
    * maintenance shape for a growing labeled set (the
    * [[graft.operators.PageRank.rankWarm]] pattern for the classifier):
    * yesterday's weights already sit near the optimum for the unchanged
    * bulk, so the continuation needs a fraction of a cold fit's
    * iterations. Same fixed-point contract — a fixed-iteration warm run
    * replays bit-exact in [[oracleSqlWarm]]. Hyperparameters (d, lr)
    * come from the model; the per-iteration normalizer uses the NEW
    * corpus size. */
  def trainFrom(model: Model, df: DataFrame, textCol: String, idCol: String,
                labelCol: String, iters: Int): Model =
    descend(df, textCol, idCol, labelCol, model.d, iters,
      model.lrNum, model.lrDen, w0 = model.weightsMicro.clone())

  private def descend(df: DataFrame, textCol: String, idCol: String,
                      labelCol: String, d: Int, iters: Int,
                      lrNum: Long, lrDen: Long, w0: Array[Long]): Model = {
    require(d > 0, "QualityTrain.train: d must be positive")
    require(iters > 0, "QualityTrain.train: iters must be positive")
    require(lrNum > 0 && lrDen > 0, "QualityTrain.train: lr must be positive")
    require(w0.length == d + 1,
      s"QualityTrain: weight vector length ${w0.length} != d+1 = ${d + 1}")
    // one feature build, co-partitioned by doc for every later step
    val feat = features(df, textCol, idCol, labelCol, d)
      .repartition(col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // one cached pass: population size AND label validation (a label
      // outside {0,1} would silently corrupt the error term's range)
      val Array(nTrain, nBad) = feat.filter(col("bucket") === 0)
        .agg(count(lit(1)),
          sum(when(col("y").isin(0L, 1L), 0L).otherwise(1L)))
        .first() match { case r => Array(r.getLong(0), r.getLong(1)) }
      require(nBad == 0,
        s"QualityTrain.train: $nBad documents with labels outside {0, 1}")
      require(nTrain > 0, "QualityTrain.train: no documents with tokens")
      val w = w0
      var it = 0
      while (it < iters) {
        val grads = gradient(feat, w).collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        var j = 0
        while (j <= d) {
          w(j) = w(j) - idivL(lrNum * grads.getOrElse(j, 0L), lrDen * nTrain)
          j += 1
        }
        it += 1
      }
      Model(w, d, iters, lrNum, lrDen, nTrain)
    } finally feat.unpersist()
  }

  /** Driver-side truncate-toward-zero division (Java `/` semantics —
    * matches Spark `div` and DuckDB `//`). */
  private def idivL(a: Long, b: Long): Long = a / b

  /** One gradient pass over the cached feature frame under weights `w`:
    * returns (bucket, g) rows, d+1 of them. Package-private for the
    * TrainSpec cache pin. */
  private[llm] def gradient(feat: DataFrame, w: Array[Long]): DataFrame = {
    val err = perDocError(feat, w)
    feat.join(err, "id")
      .groupBy(col("bucket"))
      .agg(sum(expr("(e * cnt) div n")).as("g"))
  }

  /** Above this weight count the literal-array form would scale the
    * PLAN with d (the KMeans-at-k≈160 collapse); margins switch to a
    * broadcast (bucket, w) join — identical sums, one extra
    * BroadcastHashJoin in the per-iteration plan. */
  private[graft] val LiteralWeightMax = 65536

  /** The per-doc weighted-count sum `s = Σ_j w_j·cnt_j` under weights
    * `w` — literal-array form for fasttext-sized d, broadcast-join form
    * past [[LiteralWeightMax]]. Bit-identical either way (BIGINT sums,
    * order-free). */
  private def marginSum(feat: DataFrame, w: Array[Long]): DataFrame =
    if (w.length <= LiteralWeightMax) {
      val wl = typedLit(w.toSeq)
      feat.groupBy(col("id"), col("y"), col("n"))
        .agg(sum(element_at(wl, col("bucket") + 1) * col("cnt")).as("s"))
    } else {
      val spark = feat.sparkSession
      import spark.implicits._
      val wDf = w.zipWithIndex.map { case (wv, j) => (j, wv) }.toSeq
        .toDF("bucket", "w")
      feat.join(broadcast(wDf), "bucket")
        .groupBy(col("id"), col("y"), col("n"))
        .agg(sum(col("w") * col("cnt")).as("s"))
    }

  /** Per-doc signed error frame (id, e) under weights `w`. */
  private def perDocError(feat: DataFrame, w: Array[Long]): DataFrame =
    marginSum(feat, w)
      .select(col("id"),
        (clampMicro(lit(500000L) + expr("(s div n) div 4"))
          - col("y") * lit(1000000L)).as("e"))

  private def clampMicro(p: Column): Column =
    greatest(lit(0L), least(lit(1000000L), p))

  /** Hard-sigmoid classification audit under a trained model: one row
    * (tp, fp, tn, fn, n_docs) over documents WITH tokens (the training
    * population). Prediction is `z >= 0` — exact in integers, the same
    * decision boundary as sigmoid(z) >= 0.5. */
  def hardAudit(df: DataFrame, textCol: String, idCol: String,
                labelCol: String, model: Model): DataFrame = {
    val feat = features(df, textCol, idCol, labelCol, model.d)
    marginSum(feat, model.weightsMicro)
      .select(col("y"), (expr("s div n") >= 0L).as("pred"))
      .agg(
        sum(when(col("pred") && col("y") === 1L, 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") && col("y") === 0L, 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred") && col("y") === 0L, 1L).otherwise(0L)).as("tn"),
        sum(when(!col("pred") && col("y") === 1L, 1L).otherwise(0L)).as("fn"),
        count(lit(1)).as("n_docs"))
  }

  /** Reliability (calibration) table for any scored frame — the eval
    * step between [[hardAudit]] and deployment: does a score of ~0.7
    * actually mean a ~70% positive rate? Rows are score deciles
    * (bin = floor(score·nBins), top-clamped so score 1.0 lands in the
    * last bin): n docs, n_pos, observed rate_pm = n_pos·1000 div n,
    * and mean predicted pred_pm = Σ floor(score·1000) div n — a model
    * is calibrated where rate_pm ≈ pred_pm per bin. Integer
    * arithmetic throughout: given cross-engine-identical scores (the
    * 6-decimal rounding contract every scorer here honors), the whole
    * table is hash-exact (gate `quality_calibration`). floor, never
    * CAST or round, for the per-mille projection — double→int CAST
    * truncates in Spark but rounds in DuckDB, and round() splits ties
    * differently; floor is floor everywhere. Output is |nBins| rows —
    * corpus-size-independent, one aggregate pass. */
  def calibration(scored: DataFrame, scoreCol: String, labelCol: String,
                  nBins: Int = 10): DataFrame = {
    require(nBins > 0, "calibration: nBins must be positive")
    scored.select(
        least(floor(col(scoreCol) * nBins).cast("long"),
          lit(nBins - 1L)).as("bin"),
        col(labelCol).cast("long").as("__y"),
        floor(col(scoreCol) * 1000).cast("long").as("__pm"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"),
        sum(col("__pm")).as("__sum_pm"))
      .withColumn("rate_pm", expr("n_pos * 1000L div n"))
      .withColumn("pred_pm", expr("__sum_pm div n"))
      .select("bin", "n", "n_pos", "rate_pm", "pred_pm")
  }

  /** Trained weights as a DataFrame (bucket, w) — bucket 0 is the bias.
    * d+1 rows; the gate/oracle interchange format. */
  def weightsDf(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.weightsMicro.zipWithIndex
      .map { case (w, j) => (j, w) }.toSeq.toDF("bucket", "w")
  }

  // ---- model persistence ------------------------------------------------

  /** Persist the trained model (the Dsir.writeModel artifact pattern):
    * weights as (bucket, w) rows, hyperparameters in a `_meta` sidecar.
    * A trained model is a deploy artifact — fit once on the training
    * corpus, then any scoring job (batch or daily) reads it back with
    * zero training work.
    *
    * ATOMIC publish (r11 verdict "What's missing #3"): the old
    * overwrite-in-place left a torn artifact if a crash landed between
    * the weights and `_meta` writes (or mid-file). Both tables now land
    * in a fresh `v_<seq>` version dir committed by an explicit
    * `_SUCCESS` marker written LAST — the writeLabels discipline
    * ([[graft.streaming.StreamingIncremental]]): a crash at any point
    * leaves the previous committed model readable, superseded versions
    * (and a pre-versioning flat layout) are cleaned only after the
    * commit, and an interrupted cleanup is healed by the next write. */
  def writeModel(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    val vdir = VersionedArtifact.nextVersionDir(spark, path)
    model.weightsMicro.zipWithIndex.map { case (w, j) => (j, w) }.toSeq
      .toDF("bucket", "w")
      .coalesce(1).write.mode("overwrite").parquet(s"$vdir/weights")
    Seq((model.d, model.iters, model.lrNum, model.lrDen, model.nTrain))
      .toDF("d", "iters", "lr_num", "lr_den", "n_train")
      .coalesce(1).write.mode("overwrite").parquet(s"$vdir/_meta")
    VersionedArtifact.commitAndPrune(spark, path, vdir,
      legacyEntries = Seq("weights", "_meta"))
  }

  def readModel(spark: SparkSession, path: String): Model = {
    // highest committed v_<seq>, else the pre-versioning flat layout
    val dir = VersionedArtifact.currentDir(spark, path).getOrElse(path)
    val w = spark.read.parquet(s"$dir/weights").collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).map(_._2)
    val m = spark.read.parquet(s"$dir/_meta").head()
    require(w.length == m.getInt(0) + 1,
      s"QualityTrain.readModel: ${w.length} weights for d=${m.getInt(0)}")
    Model(w, m.getInt(0), m.getInt(1), m.getLong(2), m.getLong(3), m.getLong(4))
  }

  // ---- DuckDB oracle ----------------------------------------------------

  /** Generate the unrolled DuckDB SQL that replays training exactly:
    * one pair of CTEs per iteration (per-doc error, per-bucket weight
    * update). `labelExpr` is a DuckDB boolean/int expression over the
    * documents table yielding the 0/1 label; `finalSelect` picks the
    * output ("weights" → (bucket, w); "audit" → confusion row).
    * `trainWhere` restricts the TRAINING population; `evalWhere`, when
    * set with "audit", audits a SEPARATE held-out population (the
    * train/eval-hygiene replay). */
  /** One suffix-scoped block of GD iteration CTEs — shared by
    * [[oracleSql]] (sfx="") and [[oracleSqlWarm]]'s two phases. */
  private def gdIterCtes(iters: Int, lrNum: Long, lrDen: Long,
                         sfx: String): String =
    (1 to iters).map { k =>
      val wp = s"w${k - 1}$sfx"
      s"""e$k$sfx AS (
         |  SELECT f.id,
         |         GREATEST(0, LEAST(1000000, 500000 + (SUM(w.w * f.cnt) // f.n) // 4))
         |           - f.y * 1000000 AS e
         |  FROM feat$sfx f JOIN $wp w USING (bucket)
         |  GROUP BY f.id, f.y, f.n),
         |g$k$sfx AS (
         |  SELECT f.bucket, SUM((e.e * f.cnt) // f.n) AS g
         |  FROM feat$sfx f JOIN e$k$sfx e USING (id)
         |  GROUP BY 1),
         |w$k$sfx AS (
         |  SELECT w.bucket,
         |         w.w - ($lrNum * COALESCE(g.g, 0)) // ($lrDen * (SELECT c FROM nn$sfx)) AS w
         |  FROM $wp w LEFT JOIN g$k$sfx g USING (bucket))""".stripMargin
    }.mkString(",\n")

  private def featChainSql(sfx: String, where: Option[String], d: Int,
                           labelExpr: String, table: String,
                           textCol: String, idCol: String): String =
    s"""docs$sfx AS (
       |  SELECT $idCol AS id, CAST($labelExpr AS BIGINT) AS y,
       |         list_filter(string_split(lower($textCol), ' '), x -> len(x) > 0) AS t
       |  FROM $table${where.map(w => s" WHERE $w").getOrElse("")}),
       |docn$sfx AS (SELECT id, y, CAST(len(t) AS BIGINT) AS n, t FROM docs$sfx WHERE len(t) > 0),
       |feat$sfx AS (
       |  SELECT id, y, n, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |    SELECT id, y, n,
       |           CAST((CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % $d) + 1 AS INT) AS bucket
       |    FROM (SELECT id, y, n, unnest(t) AS tok FROM docn$sfx))
       |  GROUP BY 1, 2, 3, 4
       |  UNION ALL
       |  SELECT id, y, n, 0 AS bucket, n AS cnt FROM docn$sfx)""".stripMargin

  /** Unrolled DuckDB SQL replaying a cold [[train]] over the rows
    * matching `where1` (`iters1` iterations) followed by a
    * [[trainFrom]] continuation over the rows matching `where2`
    * (`iters2` iterations from phase 1's weights) — bit-exact. */
  def oracleSqlWarm(d: Int, iters1: Int, iters2: Int,
                    lrNum: Long, lrDen: Long, labelExpr: String,
                    where1: String, where2: Option[String] = None,
                    table: String = "documents",
                    textCol: String = "text",
                    idCol: String = "doc_id"): String = {
    val p1 =
      s"""WITH ${featChainSql("P", Some(where1), d, labelExpr, table, textCol, idCol)},
         |nnP AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM docnP),
         |w0P AS (SELECT CAST(range AS INT) AS bucket, CAST(0 AS BIGINT) AS w
         |        FROM range(0, ${d + 1})),
         |${gdIterCtes(iters1, lrNum, lrDen, "P")}""".stripMargin
    val p2 =
      s"""${featChainSql("", where2, d, labelExpr, table, textCol, idCol)},
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM docn),
         |w0 AS (SELECT bucket, w FROM w${iters1}P),
         |${gdIterCtes(iters2, lrNum, lrDen, "")}""".stripMargin
    s"$p1,\n$p2\nSELECT bucket, CAST(w AS BIGINT) AS w FROM w$iters2 ORDER BY bucket"
  }

  def oracleSql(d: Int, iters: Int, lrNum: Long, lrDen: Long,
                labelExpr: String, table: String = "documents",
                textCol: String = "text", idCol: String = "doc_id",
                finalSelect: String = "weights",
                trainWhere: Option[String] = None,
                evalWhere: Option[String] = None): String = {
    def featChain(sfx: String, where: Option[String]): String =
      s"""docs$sfx AS (
         |  SELECT $idCol AS id, CAST($labelExpr AS BIGINT) AS y,
         |         list_filter(string_split(lower($textCol), ' '), x -> len(x) > 0) AS t
         |  FROM $table${where.map(w => s" WHERE $w").getOrElse("")}),
         |docn$sfx AS (SELECT id, y, CAST(len(t) AS BIGINT) AS n, t FROM docs$sfx WHERE len(t) > 0),
         |feat$sfx AS (
         |  SELECT id, y, n, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
         |    SELECT id, y, n,
         |           CAST((CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % $d) + 1 AS INT) AS bucket
         |    FROM (SELECT id, y, n, unnest(t) AS tok FROM docn$sfx))
         |  GROUP BY 1, 2, 3, 4
         |  UNION ALL
         |  SELECT id, y, n, 0 AS bucket, n AS cnt FROM docn$sfx)""".stripMargin
    val evalChain = evalWhere.map(w => ",\n" + featChain("E", Some(w))).getOrElse("")
    val base =
      s"""WITH ${featChain("", trainWhere)},
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM docn),
         |w0 AS (SELECT CAST(range AS INT) AS bucket, CAST(0 AS BIGINT) AS w
         |       FROM range(0, ${d + 1}))$evalChain""".stripMargin
    val iterCtes = gdIterCtes(iters, lrNum, lrDen, sfx = "")
    val fin = finalSelect match {
      case "weights" =>
        s"SELECT bucket, CAST(w AS BIGINT) AS w FROM w$iters ORDER BY bucket"
      case "audit" =>
        val auditFeat = if (evalWhere.isDefined) "featE" else "feat"
        s""", pred AS (
           |  SELECT f.y, (SUM(w.w * f.cnt) // f.n) >= 0 AS p
           |  FROM $auditFeat f JOIN w$iters w USING (bucket)
           |  GROUP BY f.id, f.y, f.n)
           |SELECT
           |  CAST(SUM(CASE WHEN p AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |  CAST(SUM(CASE WHEN p AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |  CAST(SUM(CASE WHEN NOT p AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           |  CAST(SUM(CASE WHEN NOT p AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs
           |FROM pred""".stripMargin
      case other => sys.error(s"oracleSql: unknown finalSelect $other")
    }
    if (finalSelect == "audit") s"$base,\n$iterCtes$fin"
    else s"$base,\n$iterCtes\n$fin"
  }
}
