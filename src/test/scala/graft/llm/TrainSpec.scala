package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** QualityTrain: the in-engine classifier trainer. The load-bearing pin
  * is full parity against a plain-Scala reference implementation of the
  * exact fixed-point recurrence — every truncation, in order — on real
  * corpus data. */
class TrainSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference trainer: straight loops over in-memory docs,
    * the spec's independent implementation of the documented math. */
  private def referenceTrain(docs: Seq[(Long, Long, String)], d: Int,
                             iters: Int, lrNum: Long, lrDen: Long): Array[Long] =
    referenceDescend(docs, d, iters, lrNum, lrDen, Array.fill(d + 1)(0L))

  private def referenceDescend(docs: Seq[(Long, Long, String)], d: Int,
                               iters: Int, lrNum: Long, lrDen: Long,
                               w0: Array[Long]): Array[Long] = {
    def bucket(tok: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val hex = h.take(4).map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(hex, 16) % d + d) % d).toInt + 1
    }
    val feats = docs.flatMap { case (id, y, text) =>
      val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) None
      else {
        val n = toks.length.toLong
        val cnt = new Array[Long](d + 1)
        cnt(0) = n // bias feature
        toks.foreach(t => cnt(bucket(t)) += 1)
        Some((id, y, n, cnt))
      }
    }
    val nTrain = feats.size.toLong
    val w = w0
    for (_ <- 1 to iters) {
      val g = new Array[Long](d + 1)
      feats.foreach { case (_, y, n, cnt) =>
        var s = 0L
        var j = 0
        while (j <= d) { s += w(j) * cnt(j); j += 1 }
        val z = s / n
        val p = math.max(0L, math.min(1000000L, 500000L + z / 4))
        val e = p - y * 1000000L
        j = 0
        while (j <= d) { g(j) += e * cnt(j) / n; j += 1 }
      }
      var j = 0
      while (j <= d) { w(j) -= lrNum * g(j) / (lrDen * nTrain); j += 1 }
    }
    w
  }

  test("train matches the driver-side reference recurrence on real docs") {
    val docs = sf("sf0.001", "documents")
      .select(col("doc_id"), when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        col("text"))
    val local = docs.as[(Long, Long, String)].collect().toSeq
    val model = QualityTrain.train(
      docs.toDF("doc_id", "y", "text"), "text", "doc_id", "y",
      d = 16, iters = 3)
    val ref = referenceTrain(local, d = 16, iters = 3, lrNum = 1L, lrDen = 1L)
    assert(model.weightsMicro.toSeq === ref.toSeq)
    assert(model.nTrain === local.count(_._3.trim.nonEmpty))
  }

  test("training is deterministic across runs") {
    val docs = sf("sf0.001", "documents")
      .select(col("doc_id"), when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        col("text"))
    val m1 = QualityTrain.train(docs, "text", "doc_id", "y", d = 8, iters = 2)
    val m2 = QualityTrain.train(docs, "text", "doc_id", "y", d = 8, iters = 2)
    assert(m1.weightsMicro.toSeq === m2.weightsMicro.toSeq)
  }

  test("trainFrom on an unchanged corpus IS continued descent: warm(2)+2 == cold 4") {
    val docs = sf("sf0.001", "documents")
      .select(col("doc_id"), when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        col("text"))
    val cold4 = QualityTrain.train(docs, "text", "doc_id", "y", d = 16, iters = 4)
    val warm = QualityTrain.trainFrom(
      QualityTrain.train(docs, "text", "doc_id", "y", d = 16, iters = 2),
      docs, "text", "doc_id", "y", iters = 2)
    assert(warm.weightsMicro.toSeq === cold4.weightsMicro.toSeq)
  }

  test("trainFrom over a GROWN corpus matches the reference seeded with phase-1 weights") {
    val docs = sf("sf0.001", "documents")
      .select(col("doc_id"), when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        col("text"))
    val half = docs.filter(col("doc_id") % 2 === 0)
    val m0 = QualityTrain.train(half, "text", "doc_id", "y", d = 16, iters = 2)
    val warm = QualityTrain.trainFrom(m0, docs, "text", "doc_id", "y", iters = 2)
    // reference: continue the driver-side recurrence from m0's weights
    // over the full corpus (new normalizer = full corpus size)
    val local = docs.as[(Long, Long, String)].collect().toSeq
    val ref = referenceDescend(local, d = 16, iters = 2, lrNum = 1L, lrDen = 1L,
      w0 = m0.weightsMicro.clone())
    assert(warm.weightsMicro.toSeq === ref.toSeq)
    // trainFrom must not mutate the input model
    assert(m0.weightsMicro.toSeq !==  warm.weightsMicro.toSeq)
  }

  test("a separable toy corpus trains to a perfect hard audit") {
    // two disjoint vocabularies; verify they actually hash apart at d=64
    val pos = (1 to 20).map(i => (i.toLong, 1L, "alpha signal alpha"))
    val neg = (21 to 40).map(i => (i.toLong, 0L, "bravo noise bravo"))
    val docs = (pos ++ neg).toDF("doc_id", "y", "text")
    val model = QualityTrain.train(docs, "text", "doc_id", "y",
      d = 64, iters = 8, lrNum = 4L, lrDen = 1L)
    val audit = QualityTrain.hardAudit(docs, "text", "doc_id", "y", model)
      .collect()(0)
    assert(audit.getAs[Long]("tp") === 20L)
    assert(audit.getAs[Long]("tn") === 20L)
    assert(audit.getAs[Long]("fp") === 0L)
    assert(audit.getAs[Long]("fn") === 0L)
  }

  test("labels outside {0,1} refuse loudly") {
    val docs = Seq((1L, 1L, "alpha"), (2L, 2L, "beta"))
      .toDF("doc_id", "y", "text")
    val e = intercept[IllegalArgumentException] {
      QualityTrain.train(docs, "text", "doc_id", "y", d = 8, iters = 1)
    }
    assert(e.getMessage.contains("labels outside"))
  }

  test("zero-token documents are excluded from training") {
    val docs = Seq((1L, 1L, "alpha beta"), (2L, 0L, "   "), (3L, 0L, "gamma"))
      .toDF("doc_id", "y", "text")
    val model = QualityTrain.train(docs, "text", "doc_id", "y", d = 8, iters = 1)
    assert(model.nTrain === 2L)
  }

  test("gradient passes read the feature CACHE, never the corpus file (rule 7 pin)") {
    val docs = sf("sf0.001", "documents")
      .select(col("doc_id"), (col("doc_id") % 2 === 0).cast("long").as("y"),
        col("text"))
    val feat = QualityTrain.features(docs, "text", "doc_id", "y", 8)
      .repartition(col("id"))
      .persist()
    try {
      feat.count()
      val g = QualityTrain.gradient(feat, Array.fill(9)(0L))
      val opt = g.queryExecution.optimizedPlan
      val cached = opt.collect {
        case im: org.apache.spark.sql.execution.columnar.InMemoryRelation => im
      }
      val files = opt.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
        case v2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => v2
      }
      assert(cached.nonEmpty,
        "gradient must read the persisted feature frame")
      assert(files.isEmpty,
        s"gradient must not re-scan the corpus file; plan: $opt")
    } finally feat.unpersist()
  }

  test("broadcast-weights path (d > LiteralWeightMax) matches the reference exactly") {
    val docs = sf("sf0.001", "documents")
      .select(col("doc_id"), when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        col("text"))
    val local = docs.as[(Long, Long, String)].collect().toSeq
    val d = QualityTrain.LiteralWeightMax + 10 // forces the join form
    val model = QualityTrain.train(docs, "text", "doc_id", "y", d = d, iters = 2)
    val ref = referenceTrain(local, d = d, iters = 2, lrNum = 1L, lrDen = 1L)
    assert(model.weightsMicro.toSeq === ref.toSeq)
  }

  test("writeModel/readModel roundtrip is exact") {
    val docs = sf("sf0.001", "documents")
      .select(col("doc_id"), when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        col("text"))
    val m = QualityTrain.train(docs, "text", "doc_id", "y", d = 16, iters = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_qt_model_").toString
    QualityTrain.writeModel(spark, m, path)
    val back = QualityTrain.readModel(spark, path)
    assert(back.weightsMicro.toSeq === m.weightsMicro.toSeq)
    assert(back.d === m.d && back.iters === m.iters &&
      back.lrNum === m.lrNum && back.lrDen === m.lrDen &&
      back.nTrain === m.nTrain)
  }

  test("toScorer hands off to the shipped inference path") {
    val docs = sf("sf0.001", "documents")
      .select(col("doc_id"), when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        col("text"))
    val model = QualityTrain.train(docs, "text", "doc_id", "y", d = 64, iters = 2)
    val (wts, bias) = model.toScorer
    assert(wts.size === 64)
    val scored = TextStats.modelQualityScore(
      sf("sf0.001", "documents"), "text", "doc_id", wts, bias)
    val n = scored.count()
    assert(n === sf("sf0.001", "documents").count())
    // scores are probabilities
    val bad = scored.filter(col("q_score") < 0 || col("q_score") > 1).count()
    assert(bad === 0L)
  }

  test("calibration: hand-pinned reliability bins, floor semantics, top clamp") {
    // exact binary fractions (multiples of 1/16) — no float-boundary
    // ambiguity in the floor products
    val scored = Seq(
      (0.0625, 1L),               // bin 0, pm 62 (62.5 floors)
      (0.5625, 0L),               // bin 5, pm 562
      (0.625, 1L), (0.6875, 0L),  // bin 6, pm 625 / 687
      (1.0, 1L)                   // floor(1.0*10)=10 -> clamped to 9
    ).toDF("q", "y")
    val t = QualityTrain.calibration(scored, "q", "y", nBins = 10)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(t(0L) === ((0L, 1L, 1L, 1000L, 62L)))
    assert(t(5L) === ((5L, 1L, 0L, 0L, 562L)))
    // bin 6: rate 1000 div 2 = 500; pred = (625+687) div 2 = 656
    assert(t(6L) === ((6L, 2L, 1L, 500L, 656L)))
    // clamp: score 1.0 lands in bin 9 with pred 1000
    assert(t(9L) === ((9L, 1L, 1L, 1000L, 1000L)))
    assert(t.size === 4)
    intercept[IllegalArgumentException] {
      QualityTrain.calibration(scored, "q", "y", nBins = 0)
    }
  }
}
