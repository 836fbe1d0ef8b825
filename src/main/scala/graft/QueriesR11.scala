package graft

import org.apache.spark.sql.functions._

/** Round-11 wave: the bucket-pruned (node, label) delta store — the
  * corpus-scale serving form of incremental connected components
  * (per-batch cost tracks touched buckets, not the label table) —
  * gated against the SAME recursive-closure DuckDB oracles as the
  * in-memory `cc_incremental` / `stream_cc` paths: the store is an
  * implementation detail of an identical labeling. */
object QueriesR11 {

  private def ccClosureOracle: String = s"""
        WITH RECURSIVE all_docs AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 200000, text FROM documents
          WHERE doc_id % 10 = 0 AND doc_id < 250),
        ${QueriesLlm.minhashCandCtes("all_docs")},
        p AS (
          SELECT ia id_a, ib id_b
          FROM cand JOIN hs x ON cand.ia = x.doc_id JOIN hs y ON cand.ib = y.doc_id
          WHERE CAST(len(list_intersect(x.h, y.h)) AS DOUBLE) /
                  len(list_distinct(x.h || y.h)) >= 0.8),
        e AS (SELECT id_a u, id_b v FROM p UNION SELECT id_b, id_a FROM p),
        cc(node, label) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM e)
          UNION
          SELECT e.u, cc.label FROM e JOIN cc ON cc.node = e.v)
        SELECT node, MIN(label) AS label
        FROM cc GROUP BY node
        ORDER BY node"""

  /** The link_graph HTML-fixture edge derivation over an arbitrary docs
    * relation — (src, dst, w) host edges, hosts hashed to BIGINT ids
    * (mirrors the Spark-side `edgesOf` in `stream_pagerank`). */
  private def linkEdgesSql(docsSql: String): String =
    s"""SELECT CAST('0x' || substr(md5(source || '.example.com'), 1, 8) AS BIGINT) AS src,
       |       CAST('0x' || substr(md5(dhost), 1, 8) AS BIGINT) AS dst,
       |       CAST(1 AS BIGINT) AS w
       |FROM (
       |  SELECT source,
       |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |      lower(regexp_extract(trim(href),
       |        '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)),
       |      '^.*@', ''), ':[0-9]*$$', ''), '\\.+$$', ''), '^www\\.', '') AS dhost
       |  FROM (
       |    SELECT source,
       |      unnest(regexp_extract_all(html, '<a\\s[^>]*href="([^"]*)"', 1)) AS href
       |    FROM (
       |      SELECT source,
       |        '<html><body><p>' || text || '</p>' ||
       |        '<a class="nav" href="https://src' ||
       |        CAST((doc_id % 20) + 1 AS VARCHAR) || '.example.com/p">x</a>' ||
       |        CASE WHEN doc_id % 2 = 0
       |          THEN '<a href="https://www.hub.example.com:443/h">hub</a>'
       |          ELSE '' END ||
       |        '<a href="/relative/path">r</a>' ||
       |        '<a href="mailto:a@b.c">m</a></body></html>' AS html
       |      FROM ($docsSql)) t1) t2) t3
       |WHERE dhost <> ''""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // ---- training wall-clock, honestly billed ----------------------------
    // quality_train / quality_train_audit / quality_model_artifact share
    // one memoized model per sf dir, so in the bench the training cost
    // lands on whichever sharing gate runs first in Map order (r10
    // verdict "What's wrong #3"). This gate trains FRESH on every call —
    // it owns the full fit wall-clock; the memoized gates are the warm
    // serving cost. Same weights, same oracle.
    QueryDef("quality_train_fit",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
          .withColumn("y", when(col("lang") === "en", 1L).otherwise(0L))
        val m = graft.llm.QualityTrain.train(docs, "text", "doc_id", "y",
          d = 64, iters = 3)
        graft.llm.QualityTrain.weightsDf(s, m).orderBy("bucket")
      },
      Some(graft.llm.QualityTrain.oracleSql(
        d = 64, iters = 3, lrNum = 1L, lrDen = 1L,
        labelExpr = "CASE WHEN lang = 'en' THEN 1 ELSE 0 END",
        finalSelect = "weights"))),

    // ---- incremental classifier maintenance: warm-start training --------
    // The deployed-model refresh shape: fit 2 iterations on yesterday's
    // labeled half (doc_id % 2 = 0), then CONTINUE 2 more from those
    // weights over the full grown corpus. Both phases replay bit-exact
    // in the two-phase unrolled oracle (phase-2 normalizer uses the new
    // corpus size, as trainFrom does).
    QueryDef("quality_train_warm",
      (s, dir) => {
        import graft.llm.QualityTrain
        val docs = Tables.read(s, dir, "documents")
          .withColumn("y", when(col("lang") === "en", 1L).otherwise(0L))
        val m0 = QualityTrain.train(docs.filter(col("doc_id") % 2 === 0),
          "text", "doc_id", "y", d = 64, iters = 2)
        val m = QualityTrain.trainFrom(m0, docs, "text", "doc_id", "y",
          iters = 2)
        QualityTrain.weightsDf(s, m).orderBy("bucket")
      },
      Some(graft.llm.QualityTrain.oracleSqlWarm(
        d = 64, iters1 = 2, iters2 = 2, lrNum = 1L, lrDen = 1L,
        labelExpr = "CASE WHEN lang = 'en' THEN 1 ELSE 0 END",
        where1 = "doc_id % 2 = 0"))),

    // ---- streaming labeled-set growth → warm model refresh ---------------
    // The third maintenance triad leg (edges→rankWarm, pairs→LabelStore,
    // labeled docs→trainFrom): yesterday's model fits on the corpus
    // slice; new labeled documents stream into an incremental table
    // (checkpointed exactly-once file progress — a re-run appends
    // nothing); the refresh CONTINUES descent from the deployed weights
    // over the grown set. Same two-phase oracle as quality_train_warm.
    QueryDef("stream_quality_train",
      (s, dir) => {
        import java.nio.file.Files
        import graft.llm.QualityTrain
        val docs = Tables.read(s, dir, "documents")
          .select("doc_id", "text", "lang")
        val corpus = docs.filter(col("doc_id") < 250)
        def label(d: org.apache.spark.sql.DataFrame) =
          d.withColumn("y", when(col("lang") === "en", 1L).otherwise(0L))
        val m0 = QualityTrain.train(label(corpus), "text", "doc_id", "y",
          d = 64, iters = 2)
        val srcDir = Files.createTempDirectory("graft_sqt_src_").toString
        docs.filter(col("doc_id") >= 250 && col("doc_id") % 2 === 0)
          .coalesce(1).write.mode("append").parquet(srcDir)
        docs.filter(col("doc_id") >= 250 && col("doc_id") % 2 === 1)
          .coalesce(1).write.mode("append").parquet(srcDir)
        val tgtDir = Files.createTempDirectory("graft_sqt_tgt_").toString
        val ckpt = Files.createTempDirectory("graft_sqt_ck_").toString
        val schema = s.read.parquet(srcDir).schema
        def runOnce(): Unit =
          graft.streaming.StreamingIncremental.incrementalAppend(
            s, srcDir, schema, tgtDir, ckpt).awaitTermination()
        runOnce()
        runOnce() // checkpointed: nothing new lands
        val grown = corpus.unionByName(s.read.parquet(tgtDir))
        val m = QualityTrain.trainFrom(m0, label(grown), "text", "doc_id", "y",
          iters = 2)
        QualityTrain.weightsDf(s, m).orderBy("bucket")
      },
      Some(graft.llm.QualityTrain.oracleSqlWarm(
        d = 64, iters1 = 2, iters2 = 2, lrNum = 1L, lrDen = 1L,
        labelExpr = "CASE WHEN lang = 'en' THEN 1 ELSE 0 END",
        where1 = "doc_id < 250"))),

    // ---- incremental authority: warm-start PageRank ----------------------
    // The growing-link-graph maintenance shape: rank yesterday's trade
    // graph (customer nations < 15) cold for 3 iterations, then today's
    // grown graph (< 20 — nations 15-19 are NEW sources) for 3 more
    // seeded from yesterday's vector. Both phases replay bit-exact in
    // the unrolled two-phase oracle; new nodes start at the cold init.
    QueryDef("pagerank_warm",
      (s, dir) => {
        def edges(maxNation: Int) = {
          val li = Tables.read(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
          val ord = Tables.read(s, dir, "orders").select("o_orderkey", "o_custkey")
          val cust = Tables.read(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey"))
            .filter(col("c_nationkey") < maxNation)
          val supp = Tables.read(s, dir, "supplier").select("s_suppkey", "s_nationkey")
          li.join(ord, col("l_orderkey") === col("o_orderkey"))
            .join(cust, col("o_custkey") === col("c_custkey"))
            .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
            .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        }
        val prev = graft.operators.PageRank.rank(edges(15), "src", "dst", iters = 3)
        graft.operators.PageRank
          .rankWarm(edges(20), prev, "src", "dst", iters = 3)
          .orderBy("node")
      },
      Some {
        def edgesSql(maxNation: Int) =
          s"""SELECT c.c_nationkey AS src, s.s_nationkey AS dst, CAST(1 AS BIGINT) AS w
             |FROM lineitem l
             |JOIN orders o ON l.l_orderkey = o.o_orderkey
             |JOIN customer c ON o.o_custkey = c.c_custkey
             |JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |WHERE c.c_nationkey < $maxNation""".stripMargin
        graft.operators.PageRank.oracleSqlWarm(
          edgesSql(15), iters1 = 3, edgesSql(20), iters2 = 3)
      }),

    // ---- streaming link-graph maintenance → warm authority refresh ------
    // The crawl-to-authority loop as a MAINTAINED pipeline: seed an
    // EdgeStore from the corpus crawl, rank it cold; stream two
    // micro-batches of new pages (fresh docs, then re-crawled clones of
    // corpus docs) whose host edges land in per-batch run slots
    // (exactly-once — a double-landed batch would BIAS the ranks);
    // refresh authority with a warm-start rank over the grown store.
    // Checkpointed re-run appends nothing. The oracle replays the cold
    // phase over the corpus edges and the warm phase over the union
    // corpus edges, bit-exact.
    QueryDef("stream_pagerank",
      (s, dir) => {
        import java.nio.file.Files
        import graft.llm.Curation
        import graft.operators.{EdgeStore, PageRank}
        def withHtml(d: org.apache.spark.sql.DataFrame) =
          d.withColumn("html", concat(
            lit("<html><body><p>"), col("text"), lit("</p>"),
            lit("<a class=\"nav\" href=\"https://src"),
            ((col("doc_id") % 20) + 1).cast("string"),
            lit(".example.com/p\">x</a>"),
            when(col("doc_id") % 2 === 0,
              lit("<a href=\"https://www.hub.example.com:443/h\">hub</a>"))
              .otherwise(lit("")),
            lit("<a href=\"/relative/path\">r</a>" +
              "<a href=\"mailto:a@b.c\">m</a></body></html>")))
        def h(c: org.apache.spark.sql.Column) =
          conv(substring(md5(c), 1, 8), 16, 10).cast("long")
        def edgesOf(d: org.apache.spark.sql.DataFrame) =
          Curation.linkHostEdges(withHtml(d), "html",
              concat(col("source"), lit(".example.com")))
            .select(h(col("src_host")).as("src"),
              h(col("dst_host")).as("dst"), col("w"))
        val docs = Tables.read(s, dir, "documents")
          .select("doc_id", "text", "source")
        val corpus = docs.filter(col("doc_id") < 250)
        val store = Files.createTempDirectory("graft_spr_store_").toString
        EdgeStore.write(edgesOf(corpus), "src", "dst", Some("w"), store,
          nBuckets = 16)
        val prev = PageRank.rank(EdgeStore.read(s, store), "src", "dst",
          Some("w"), iters = 3)
        val srcDir = Files.createTempDirectory("graft_spr_src_").toString
        docs.filter(col("doc_id") >= 250)
          .coalesce(1).write.mode("append").parquet(srcDir)
        docs.filter(pmod(col("doc_id"), lit(10L)) === 0 && col("doc_id") < 250)
          .withColumn("doc_id", col("doc_id") + 200000L)
          .coalesce(1).write.mode("append").parquet(srcDir)
        val ckpt = Files.createTempDirectory("graft_spr_ck_").toString
        val schema = s.read.parquet(srcDir).schema
        def runOnce(): Unit =
          graft.streaming.StreamingIncremental.streamingEdgeMaintenance(
            s, srcDir, schema, store, ckpt, edgesOf, "src", "dst", Some("w"),
            nBuckets = 16, maxFilesPerTrigger = Some(1)).awaitTermination()
        runOnce()
        runOnce() // checkpointed: no new batches, store untouched
        PageRank.rankWarm(EdgeStore.read(s, store), prev, "src", "dst",
          Some("w"), iters = 3).orderBy("node")
      },
      Some(graft.operators.PageRank.oracleSqlWarm(
        linkEdgesSql("SELECT doc_id, text, source FROM documents WHERE doc_id < 250"),
        iters1 = 3,
        linkEdgesSql("""SELECT doc_id, text, source FROM documents
                       |UNION ALL
                       |SELECT doc_id + 200000, text, source FROM documents
                       |WHERE doc_id % 10 = 0 AND doc_id < 250""".stripMargin),
        iters2 = 3))),

    // ---- ANN index lifecycle: quantizer-drift retrain --------------------
    // Frozen append-time centroids pack a DRIFTED batch (every
    // embedding shifted +2 per component) into one cell — the probe
    // pathology where serving scans half the corpus. retrain()
    // re-derives the quantizer from the stored vectors and rebuilds;
    // the gate audits: the bloat existed, retrain shrank the max cell,
    // every vector survived, and exhaustive-probe serving stays equal
    // to brute force. Exact counts cross as a corpus_rows guard.
    QueryDef("ann_ivf_retrain",
      (s, dir) => {
        import java.nio.file.Files
        import graft.llm.{IvfIndex, Similarity}
        val emb = Tables.read(s, dir, "embeddings")
        val a = emb.filter(col("vec_id") % 2 === 0)
          .select("vec_id", "embedding")
        val b = emb.filter(col("vec_id") % 2 === 1)
          .select(col("vec_id"),
            transform(col("embedding"), x => x + lit(2.0f)).as("embedding"))
        val all = a.unionByName(b).persist()
        val n = all.count()
        val idx = Files.createTempDirectory("graft_ivf_rt_gate_").toString
        IvfIndex.write(a, "embedding", "vec_id", idx, nCells = 8)
        IvfIndex.appendBatch(b, "embedding", "vec_id", idx, batchId = 0L)
        def maxCell() = s.read.parquet(idx).groupBy("cid").count()
          .agg(max("count")).first().getLong(0)
        val before = maxCell()
        IvfIndex.retrain(s, idx, nCells = 8)
        val after = maxCell()
        val kept = s.read.parquet(idx).count() == n
        val queries = b.filter(col("vec_id") < 10) // deterministic query set
        val served = IvfIndex.topK(s, idx, queries, "embedding", "vec_id",
            k = 5, nProbe = 8)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val brute = Similarity
          .bruteForceTopK(all, queries, "embedding", "vec_id", k = 5)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        all.unpersist()
        import s.implicits._
        Seq((n, before >= n / 2, after < before, kept, served == brute))
          .toDF("corpus_rows", "bloated_before", "rebalanced", "kept_all",
            "exact_serve")
      },
      Some("""
        SELECT CAST(COUNT(*) AS BIGINT) AS corpus_rows,
               TRUE AS bloated_before, TRUE AS rebalanced,
               TRUE AS kept_all, TRUE AS exact_serve
        FROM embeddings""")),

    // ---- bucketed label store, batch path --------------------------------
    // The cc_incremental construction routed through LabelStore:
    // seed from the corpus clustering, fold the fresh batch's pairs
    // via bucket-pruned reads + a changed-rows delta slot, read the
    // resolved table. Must be indistinguishable from the recursive
    // closure over ALL pairs of the union corpus.
    QueryDef("cc_store",
      (s, dir) => {
        import java.nio.file.Files
        import graft.llm.Dedup
        import graft.operators.{ConnectedComponents, LabelStore}
        val docs = Tables.read(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") < 250)
        val fresh = docs.filter(col("doc_id") >= 250)
          .unionByName(docs
            .filter(pmod(col("doc_id"), lit(10L)) === 0 && col("doc_id") < 250)
            .withColumn("doc_id", col("doc_id") + 200000L))
        val oldPairs = Dedup.minhashNearDupPairs(corpus, "text", "doc_id",
          jaccardThreshold = 0.8)
        val path = Files.createTempDirectory("graft_ccstore_").toString
        LabelStore.write(ConnectedComponents.run(oldPairs, "id_a", "id_b"),
          path, nBuckets = 16)
        val batchPairs = Dedup.minhashNearDupPairsIncremental(
          fresh, corpus, "text", "doc_id", jaccardThreshold = 0.8)
        LabelStore.applyStreamBatch(s, path, batchPairs, "id_a", "id_b", 0L)
        LabelStore.read(s, path).orderBy("node")
      },
      Some(ccClosureOracle)),

    // ---- bucketed label store, streaming path ----------------------------
    // The stream_cc loop with the delta store: two micro-batches
    // (fresh docs, then clones of INDEXED corpus docs), per batch a
    // bucket-pruned pair serve → run-slotted index append → run-
    // slotted delta fold. Checkpointed re-run is a no-op.
    QueryDef("stream_cc_bucketed",
      (s, dir) => {
        import java.nio.file.Files
        import graft.llm.{Dedup, MinHashIndex}
        import graft.operators.{ConnectedComponents, LabelStore}
        val docs = Tables.read(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") < 250)
        val idxPath = Files.createTempDirectory("graft_sccb_idx_").toString
        val storePath = Files.createTempDirectory("graft_sccb_lab_").toString
        val srcDir = Files.createTempDirectory("graft_sccb_src_").toString
        // index seed, label-store seed and source files are independent
        // fixture builds — bounded overlap (§2.6)
        graft.core.Par.run3(
          () => MinHashIndex.write(corpus, "text", "doc_id", idxPath,
            nBuckets = 16),
          () => LabelStore.write(
            ConnectedComponents.run(
              Dedup.minhashNearDupPairs(corpus, "text", "doc_id",
                jaccardThreshold = 0.8), "id_a", "id_b"),
            storePath, nBuckets = 16),
          () => {
            docs.filter(col("doc_id") >= 250).select("doc_id", "text")
              .coalesce(1).write.mode("append").parquet(srcDir)
            docs.filter(pmod(col("doc_id"), lit(10L)) === 0 &&
                col("doc_id") < 250)
              .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
              .coalesce(1).write.mode("append").parquet(srcDir)
          })
        val ckpt = Files.createTempDirectory("graft_sccb_ck_").toString
        val schema = s.read.parquet(srcDir).schema
        def runOnce(): Unit =
          graft.streaming.StreamingIncremental
            .streamingClusterMaintenanceBucketed(
              s, srcDir, schema, idxPath, storePath, ckpt, "text", "doc_id",
              jaccardThreshold = 0.8, nBuckets = 16,
              maxFilesPerTrigger = Some(1)).awaitTermination()
        runOnce()
        runOnce() // checkpointed: no new batches, store untouched
        LabelStore.read(s, storePath).orderBy("node")
      },
      Some(ccClosureOracle))
  )
}
