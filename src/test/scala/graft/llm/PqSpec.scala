package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {

  private lazy val sp = spark
  import sp.implicits._

  private lazy val emb = sf("sf0.001", "embeddings")

  test("fit is deterministic and independent of partitioning") {
    val a = Pq.fit(emb, "embedding", "vec_id", m = 4, k = 4, iters = 2)
    val b = Pq.fit(emb.repartition(7), "embedding", "vec_id", m = 4, k = 4, iters = 2)
    assert(a === b)
    assert(a.size === 4 && a.head.size === 4 && a.head.head.size === 16)
  }

  test("encode: codes in range, one per subspace, deterministic") {
    val books = Pq.fit(emb, "embedding", "vec_id", m = 4, k = 4, iters = 2)
    val codes = Pq.encode(emb, "embedding", "vec_id", books)
      .as[(Long, Seq[Int], Double)].collect().sortBy(_._1)
    assert(codes.length === emb.count())
    codes.foreach { case (_, cs, nsq) =>
      assert(cs.length === 4)
      assert(cs.forall(c => c >= 0 && c < 4))
      assert(nsq > 0.0)
    }
    val again = Pq.encode(emb, "embedding", "vec_id", books)
      .as[(Long, Seq[Int], Double)].collect().sortBy(_._1)
    assert(codes === again)
  }

  test("ADC score equals the explicit reconstruction cosine") {
    val books = Pq.fit(emb, "embedding", "vec_id", m = 4, k = 4, iters = 2)
    val queries = emb.filter(col("vec_id") < 3)
    val adc = Pq.topK(Pq.encode(emb, "embedding", "vec_id", books), books,
        queries, "embedding", "vec_id", k = 5)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    // reconstruct each doc from its codes on the driver and recompute
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    val codes = Pq.encode(emb, "embedding", "vec_id", books)
      .as[(Long, Seq[Int], Double)].collect()
      .map(r => r._1 -> r._2).toMap
    val dsub = books.head.head.size
    def recon(id: Long): Seq[Double] =
      codes(id).zipWithIndex.flatMap { case (c, s) => books(s)(c) }
    adc.foreach { case (qid, nid, score) =>
      val q = vecs(qid).map(_.toDouble)
      val r = recon(nid)
      val dot = q.zip(r).map { case (a, b) => a * b }.sum
      val expect = dot / (math.sqrt(q.map(x => x * x).sum) *
        math.sqrt(r.map(x => x * x).sum))
      assert(math.abs(score - expect) < 1e-5,
        s"ADC $score vs reconstruction $expect for ($qid, $nid)")
    }
  }

  test("planted near-twins are retrieved at rank 1 (the ANN regime)") {
    // Uniform-random embeddings are PQ's WORST case: true neighbors are
    // near-ties, so quantization noise scrambles the tail of the top-k.
    // The regime PQ serves is near-duplicate/cluster retrieval — plant a
    // cos≈1 twin per query (positive scalar multiple) and require the
    // twin at rank 1: the twin quantizes to the query's own codes, so its
    // ADC score is the maximum any document can reach.
    val planted = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), v => v + (v * lit(0.001f))).as("embedding"))
    val corpus = emb.select("vec_id", "embedding").unionByName(planted)
    val books = Pq.fit(corpus, "embedding", "vec_id", m = 8, k = 8, iters = 3)
    val queries = emb.filter(col("vec_id") < 5)
    val top1 = Pq.topK(Pq.encode(corpus, "embedding", "vec_id", books), books,
        queries, "embedding", "vec_id", k = 10)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toMap
    (0L until 5L).foreach { q =>
      assert(top1(q) === q + 100000L, s"query $q: rank-1 is ${top1(q)}, not its twin")
    }
  }

  test("native NearestCodewords kernel matches a driver-side argmin exactly") {
    val books = Pq.fit(emb, "embedding", "vec_id", m = 4, k = 4, iters = 2)
    val dsub = books.head.head.size
    val got = Pq.encode(emb, "embedding", "vec_id", books)
      .select("id", "codes").as[(Long, Seq[Int])].collect().toMap
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    vecs.foreach { case (id, v) =>
      val expect = books.indices.map { s =>
        val sub = v.slice(s * dsub, (s + 1) * dsub)
        // mirror the kernel arithmetic: double sums over float operands
        val dss = sub.map(x => x.toDouble * x.toDouble).sum
        books(s).zipWithIndex.map { case (c, j) =>
          val cf = c.map(_.toFloat)
          val dsc = sub.zip(cf).map { case (a, b) => a.toDouble * b.toDouble }.sum
          (dss - 2.0 * dsc + c.map(x => x * x).sum, j)
        }.min._2
      }
      assert(got(id) === expect, s"codes diverge for vec $id")
    }
  }

  test("fit clamps k to the corpus size instead of indexing past the seed sample") {
    val tiny = emb.filter(col("vec_id") < 3) // 3 rows, k = 8 requested
    val books = Pq.fit(tiny, "embedding", "vec_id", m = 4, k = 8, iters = 2)
    assert(books.head.size === 3) // kEff = |corpus|
    val codes = Pq.encode(tiny, "embedding", "vec_id", books)
      .select("codes").as[Seq[Int]].collect()
    codes.foreach(cs => assert(cs.forall(c => c >= 0 && c < 3)))
  }

  test("ragged and null vectors fail loudly") {
    val books = Pq.fit(emb, "embedding", "vec_id", m = 4, k = 4, iters = 1)
    val bad = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Pq.encode(bad, "embedding", "vec_id", books).collect()
    }
    assert(e.getMessage.contains("expected 64-dim vector"))
  }
}
