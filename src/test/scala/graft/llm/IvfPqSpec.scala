package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfPqSpec extends SparkSpec {

  private lazy val sp = spark
  import sp.implicits._

  private lazy val emb = sf("sf0.001", "embeddings")

  private def tmpIdx(): String =
    java.nio.file.Files.createTempDirectory("graft_ivfpq_").toString

  test("planted near-twins are retrieved at rank 1 through the full index") {
    val planted = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), v => v + (v * lit(0.001f))).as("embedding"))
    val corpus = emb.select("vec_id", "embedding").unionByName(planted)
    val path = tmpIdx()
    IvfPq.write(corpus, "embedding", "vec_id", path,
      nCells = 8, m = 8, k = 16, iters = 3, corpusRows = Some(corpus.count()))
    val queries = emb.filter(col("vec_id") < 5)
    val top1 = IvfPq.topK(spark, path, queries, "embedding", "vec_id",
        k = 10, nProbe = 3)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toMap
    (0L until 5L).foreach { q =>
      assert(top1(q) === q + 100000L, s"query $q: rank-1 is ${top1(q)}, not its twin")
    }
  }

  test("stored xnormsq equals the driver-side reconstruction norm exactly") {
    val path = tmpIdx()
    IvfPq.write(emb, "embedding", "vec_id", path,
      nCells = 4, m = 4, k = 4, iters = 2, corpusRows = Some(emb.count()))
    val cents = spark.read.parquet(s"$path/_centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).sortBy(_._1)
    val bookRows = spark.read.parquet(s"$path/_codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toSeq).toMap
    val m = bookRows.keys.map(_._1).max + 1
    val dsub = bookRows((0, 0)).size
    val cidToOrd = cents.map(_._1).zipWithIndex.toMap
    val rows = spark.read.parquet(path)
      .select(col("id"), col("codes"), col("xnormsq"), col("cid").cast("long"))
      .as[(Long, Seq[Int], Double, Long)].collect()
    assert(rows.length === emb.count())
    rows.foreach { case (id, codes, stored, cid) =>
      val c = cents(cidToOrd(cid))._2.map(_.toDouble)
      val rhat = codes.zipWithIndex.flatMap { case (j, s) => bookRows((s, j)) }
      val xhat = c.zip(rhat).map { case (a, b) => a + b }
      val expect = xhat.map(x => x * x).sum
      assert(math.abs(stored - expect) < 1e-9,
        s"xnormsq $stored vs reconstruction $expect for vec $id")
    }
  }

  test("ADC score through the index equals the explicit reconstruction cosine") {
    val path = tmpIdx()
    IvfPq.write(emb, "embedding", "vec_id", path,
      nCells = 4, m = 4, k = 4, iters = 2, corpusRows = Some(emb.count()))
    val queries = emb.filter(col("vec_id") < 3)
    val adc = IvfPq.topK(spark, path, queries, "embedding", "vec_id",
        k = 5, nProbe = 2)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(adc.nonEmpty)
    val cents = spark.read.parquet(s"$path/_centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).sortBy(_._1)
    val bookRows = spark.read.parquet(s"$path/_codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toSeq).toMap
    val cidToOrd = cents.map(_._1).zipWithIndex.toMap
    val stored = spark.read.parquet(path)
      .select(col("id"), col("codes"), col("cid").cast("long"))
      .as[(Long, Seq[Int], Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    adc.foreach { case (qid, nid, score) =>
      val (codes, cid) = stored(nid)
      val c = cents(cidToOrd(cid))._2.map(_.toDouble)
      val rhat = codes.zipWithIndex.flatMap { case (j, s) => bookRows((s, j)) }
      val xhat = c.zip(rhat).map { case (a, b) => a + b }
      val q = vecs(qid).map(_.toDouble)
      val expect = q.zip(xhat).map { case (a, b) => a * b }.sum /
        (math.sqrt(q.map(x => x * x).sum) * math.sqrt(xhat.map(x => x * x).sum))
      assert(math.abs(score - expect) < 1e-5,
        s"ADC $score vs reconstruction $expect for ($qid, $nid)")
    }
  }

  test("serving scans only probed cells (planning-time PartitionFilter), codes only") {
    val path = tmpIdx()
    IvfPq.write(emb, "embedding", "vec_id", path,
      nCells = 16, m = 4, k = 4, iters = 1, corpusRows = Some(emb.count()))
    val queries = emb.filter(col("vec_id") < 10)
    val served = IvfPq.topK(spark, path, queries, "embedding", "vec_id",
      k = 10, nProbe = 4)
    val plan = served.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.exists(l => l.contains("cid") && l.contains("IN") && !l.contains("IN ()")),
      s"expected a cid IN (...) PartitionFilter, got: ${pf.mkString(" | ")}")
    // ADC never reads vectors: no embedding-typed column in the index scan
    assert(!plan.contains("neighbor_vec"),
      "index scan must carry codes, not vectors")
  }

  test("append: batch rows join the frozen layout; their twins are then served") {
    val path = tmpIdx()
    IvfPq.write(emb, "embedding", "vec_id", path,
      nCells = 8, m = 8, k = 16, iters = 3, corpusRows = Some(emb.count()))
    // appended batch = twins of queries 0-4 (cos≈1 positive multiples)
    val batch = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), v => v + (v * lit(0.001f))).as("embedding"))
    IvfPq.append(batch, "embedding", "vec_id", path)
    assert(spark.read.parquet(path).count() === emb.count() + 5)
    val queries = emb.filter(col("vec_id") < 5)
    val top1 = IvfPq.topK(spark, path, queries, "embedding", "vec_id",
        k = 10, nProbe = 3)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toMap
    (0L until 5L).foreach { q =>
      assert(top1(q) === q + 100000L, s"query $q: appended twin not served first")
    }
  }

  test("compact: N appends collapse to one file per cell; topK byte-identical; pruning preserved") {
    val path = tmpIdx()
    IvfPq.write(emb.filter(col("vec_id") >= 50), "embedding", "vec_id", path,
      nCells = 8, m = 4, k = 4, iters = 1,
      corpusRows = Some(emb.filter(col("vec_id") >= 50).count()))
    // 5 daily appends of 10 rows each -> small files accumulate per cell
    (0 until 5).foreach { day =>
      IvfPq.append(
        emb.filter(col("vec_id") >= day * 10L && col("vec_id") < (day + 1) * 10L),
        "embedding", "vec_id", path)
    }
    def dataFiles(): Seq[String] = {
      val root = java.nio.file.Paths.get(path)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala
        .map(_.toString)
        .filter(p => p.endsWith(".parquet") && p.contains("cid="))
        .toSeq
    }
    val queries = emb.filter(col("vec_id") < 5)
    def serve() = IvfPq.topK(spark, path, queries, "embedding", "vec_id",
        k = 10, nProbe = 3)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq

    val before = serve()
    val filesBefore = dataFiles()
    IvfPq.compact(spark, path)
    val filesAfter = dataFiles()
    assert(filesAfter.size < filesBefore.size,
      s"compact must shrink file count (${filesBefore.size} -> ${filesAfter.size})")
    // exactly one data file per surviving cell directory
    val perCell = filesAfter.groupBy(p => p.substring(p.indexOf("cid=")).split("/")(0))
    perCell.foreach { case (cell, fs) =>
      assert(fs.size === 1, s"$cell still has ${fs.size} files")
    }
    assert(serve() === before, "served top-k must be identical after compact")
    // pruning still works on the compacted layout
    val plan = IvfPq.topK(spark, path, queries, "embedding", "vec_id", 10, 3)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.exists(l => l.contains("cid") && l.contains("IN") && !l.contains("IN ()")),
      s"PartitionFilter lost after compact: ${pf.mkString(" | ")}")
    // a leftover old-dir from an interrupted compact fails loudly
    val fsys = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.mkdirs(new org.apache.hadoop.fs.Path(path + "__compact_old"))
    val e = intercept[IllegalArgumentException] { IvfPq.compact(spark, path) }
    assert(e.getMessage.contains("interrupted compact"), e.getMessage)
    fsys.delete(new org.apache.hadoop.fs.Path(path + "__compact_old"), true)
  }

  test("rerank: exact-cosine re-ranking of the stage-1 candidate pool, bit for bit") {
    val path = tmpIdx()
    IvfPq.write(emb, "embedding", "vec_id", path,
      nCells = 8, m = 8, k = 16, iters = 3, corpusRows = Some(emb.count()))
    val queries = emb.filter(col("vec_id") < 5)
    val k = 5; val refine = 3; val nProbe = 3
    val got = IvfPq.topKRerank(spark, path, queries, emb,
        "embedding", "vec_id", k, nProbe, refine)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // independent driver-side expectation: exact rounded cosine over the
    // stage-1 candidate ids, sorted (score DESC, id ASC), take k
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    val cand = IvfPq.topK(spark, path, queries, "embedding", "vec_id",
        k * refine, nProbe)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      BigDecimal(d / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    cand.foreach { case (q, ids) =>
      val expect = ids.map(i => (cos(vecs(q), vecs(i)), i))
        .sortBy { case (s, i) => (-s, i) }.take(k).map(_._2)
      assert(got(q) === expect, s"query $q rerank order")
    }
  }

  test("rerank recall is >= plain ADC recall against brute force, per query") {
    val path = tmpIdx()
    IvfPq.write(emb, "embedding", "vec_id", path,
      nCells = 8, m = 8, k = 16, iters = 3, corpusRows = Some(emb.count()))
    val queries = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .filter(brute.contains).groupBy(_._1).view.mapValues(_.length).toMap
        .withDefaultValue(0)
    val adc = recall(IvfPq.topK(spark, path, queries, "embedding", "vec_id", 10, 3))
    val rr = recall(IvfPq.topKRerank(spark, path, queries, emb,
      "embedding", "vec_id", 10, 3, 4))
    (0L until 10L).foreach { q =>
      assert(rr(q) >= adc(q), s"query $q: rerank ${rr(q)} < adc ${adc(q)}")
    }
  }

  test("rerank plan: candidate fetch is broadcast — the corpus is never sort-merge shuffled") {
    val path = tmpIdx()
    IvfPq.write(emb, "embedding", "vec_id", path,
      nCells = 4, m = 4, k = 4, iters = 1, corpusRows = Some(emb.count()))
    val queries = emb.filter(col("vec_id") < 3)
    val plan = IvfPq.topKRerank(spark, path, queries, emb,
        "embedding", "vec_id", 5, 2, 2)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("BroadcastHashJoin"), "vector fetch must broadcast the candidates")
    assert(!plan.contains("SortMergeJoin"),
      "rerank must not shuffle the vector table into a sort-merge join")
  }

  test("every corpus row lands in exactly one cell; ids are preserved") {
    val path = tmpIdx()
    IvfPq.write(emb, "embedding", "vec_id", path,
      nCells = 8, m = 4, k = 4, iters = 1, corpusRows = Some(emb.count()))
    val idx = spark.read.parquet(path)
    assert(idx.count() === emb.count())
    assert(idx.select("id").distinct().count() === emb.count())
    assert(idx.select(col("cid")).distinct().count() <= 8)
  }
}
