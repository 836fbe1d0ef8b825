package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Round-10 fourth wave: in-engine classifier TRAINING (the trained-
  * artifact side of the shipped quality-scorer inference), graph
  * centrality for domain curation, and mergeable-sketch stores. All
  * exact-integer constructions, replayed bit-for-bit by generated
  * DuckDB oracles ([[graft.llm.QualityTrain.oracleSql]] /
  * [[graft.operators.PageRank.oracleSql]] unroll the iteration CTEs). */
object QueriesR10b {

  // one trained model per sf dir (two gates share it — the dsir-model
  // memoization precedent; training is deterministic, so sharing only
  // saves the duplicate work)
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String, graft.llm.QualityTrain.Model]()
  private def trainedModel(s: SparkSession, dir: String): graft.llm.QualityTrain.Model =
    modelCache.computeIfAbsent(dir, _ => {
      val docs = Tables.read(s, dir, "documents")
        .withColumn("y", when(col("lang") === "en", 1L).otherwise(0L))
      graft.llm.QualityTrain.train(docs, "text", "doc_id", "y",
        d = 64, iters = 3)
    })

  private val TrainLabel = "CASE WHEN lang = 'en' THEN 1 ELSE 0 END"

  val all: Seq[QueryDef] = Seq(

    // ---- distributed classifier training --------------------------------
    // English-vs-rest from hashed bag-of-words — the trainable
    // language-ID/quality-model loop. 3 full-batch GD iterations,
    // d=64 hash buckets, all fixed-point micros; the oracle replays
    // every iteration in unrolled CTEs.
    QueryDef("quality_train",
      (s, dir) =>
        graft.llm.QualityTrain.weightsDf(s, trainedModel(s, dir))
          .orderBy("bucket"),
      Some(graft.llm.QualityTrain.oracleSql(
        d = 64, iters = 3, lrNum = 1L, lrDen = 1L,
        labelExpr = TrainLabel, finalSelect = "weights"))),

    // confusion matrix of the trained model over its own training
    // population (hard-sigmoid decision boundary z >= 0 — exact)
    QueryDef("quality_train_audit",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
          .withColumn("y", when(col("lang") === "en", 1L).otherwise(0L))
        graft.llm.QualityTrain.hardAudit(docs, "text", "doc_id", "y",
          trainedModel(s, dir))
      },
      Some(graft.llm.QualityTrain.oracleSql(
        d = 64, iters = 3, lrNum = 1L, lrDen = 1L,
        labelExpr = TrainLabel, finalSelect = "audit"))),

    // ---- domain authority: weighted PageRank ----------------------------
    // Nation-level trade graph (customer nation -> supplier nation per
    // lineitem, customer side restricted to nationkey < 20 so nations
    // 20-24 are genuinely DANGLING — they receive mass but emit none).
    // 5 fixed-point iterations; ranks in micros.
    QueryDef("domain_pagerank",
      (s, dir) => {
        val li = Tables.read(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
        val ord = Tables.read(s, dir, "orders").select("o_orderkey", "o_custkey")
        val cust = Tables.read(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
          .filter(col("c_nationkey") < 20)
        val supp = Tables.read(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val edges = li
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        graft.operators.PageRank.rank(edges, "src", "dst", iters = 5)
          .orderBy("node")
      },
      Some(graft.operators.PageRank.oracleSql(
        """SELECT c.c_nationkey AS src, s.s_nationkey AS dst, CAST(1 AS BIGINT) AS w
          |FROM lineitem l
          |JOIN orders o ON l.l_orderkey = o.o_orderkey
          |JOIN customer c ON o.o_custkey = c.c_custkey
          |JOIN supplier s ON l.l_suppkey = s.s_suppkey
          |WHERE c.c_nationkey < 20""".stripMargin,
        iters = 5))),

    // ---- train/eval hygiene: held-out audit -----------------------------
    // Train on the deterministic 'train' split (splitAssign seed 7,
    // 10/10 val/test), audit on the UNSEEN 'val' split — the ML-hygiene
    // loop with both populations' derivations replayed exactly in SQL.
    QueryDef("quality_train_holdout",
      (s, dir) => {
        import graft.llm.{QualityTrain, Sampling}
        val docs = Tables.read(s, dir, "documents")
          .withColumn("y", when(col("lang") === "en", 1L).otherwise(0L))
        val split = Sampling.splitAssign(docs, "doc_id", seed = 7L,
          valPct = 10, testPct = 10)
        val model = QualityTrain.train(split.filter(col("split") === "train"),
          "text", "doc_id", "y", d = 64, iters = 3)
        QualityTrain.hardAudit(split.filter(col("split") === "val"),
          "text", "doc_id", "y", model)
      },
      Some {
        val bucket =
          "CAST('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100"
        graft.llm.QualityTrain.oracleSql(
          d = 64, iters = 3, lrNum = 1L, lrDen = 1L,
          labelExpr = TrainLabel, finalSelect = "audit",
          trainWhere = Some(s"$bucket >= 20"),
          evalWhere = Some(s"$bucket >= 10 AND $bucket < 20"))
      }),

    // ---- warehouse small-file compaction --------------------------------
    // Four fragmented appends leave 4 files per day partition; compact
    // right-sizes every partition through the crash-safe swap and the
    // table content is invisible to the rewrite (relational oracle over
    // the source rows).
    QueryDef("compact_table",
      (s, dir) => {
        import graft.core.TableId
        val wh = new graft.warehouse.Warehouse(
          java.nio.file.Files.createTempDirectory("graft_cmpgate_").toString, s)
        val tid = TableId("proj", "maint", "events_daily")
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"),
            to_date(col("ts")).as("part_date"))
        (0 until 4).foreach(k =>
          wh.appendPartitioned(tid,
            ev.filter(pmod(col("event_id"), lit(4L)) === k).coalesce(1)))
        val rewritten = wh.compactPartitions(tid)
        wh.read(tid).groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
          .withColumn("all_compacted", lit(rewritten.nonEmpty))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(event_id) AS BIGINT) AS id_sum,
               TRUE AS all_compacted
        FROM events GROUP BY 1 ORDER BY 1""")),

    // ---- tokenizer artifact roundtrip -----------------------------------
    // writeMerges/readMerges must be invisible: segment the SAME tokens
    // as bpe_segment through a merge table that went through parquet —
    // same oracle (tools/bpe_reference.py pins).
    QueryDef("bpe_artifact",
      (s, dir) => {
        import graft.llm.{Bpe, Dedup}
        val mPath = java.nio.file.Files
          .createTempDirectory("graft_bpe_art_").toString
        Bpe.writeMerges(s, QueriesLlm.bpeMerges(s, dir), mPath)
        val merges = Bpe.readMerges(s, mPath)
        Tables.read(s, dir, "documents").filter(col("doc_id") < 5)
          .select(explode(Dedup.tokens(col("text"))).as("token"))
          .distinct()
          .select(col("token"),
            array_join(Bpe.segmentUdf(merges)(col("token")), "|").as("pieces"))
          .orderBy("token")
      },
      Some(QueriesLlm.BpeSegmentOracle)),

    // ---- HTML link graph → domain authority -----------------------------
    // The crawl-to-authority loop end to end: wrap each document in
    // deterministic markup with nav/hub/relative/mailto anchors,
    // extract hrefs, normalize to hosts (urlDomain: port + www + scheme
    // handling; hostless targets dropped), aggregate host edges, hash
    // hosts to node ids, rank. Both engines replay the whole chain.
    QueryDef("link_graph",
      (s, dir) => {
        import graft.llm.Curation
        val docs = Tables.read(s, dir, "documents")
        val html = concat(
          lit("<html><body><p>"), col("text"), lit("</p>"),
          lit("<a class=\"nav\" href=\"https://src"),
          ((col("doc_id") % 20) + 1).cast("string"),
          lit(".example.com/p\">x</a>"),
          when(col("doc_id") % 2 === 0,
            lit("<a href=\"https://www.hub.example.com:443/h\">hub</a>"))
            .otherwise(lit("")),
          lit("<a href=\"/relative/path\">r</a>" +
            "<a href=\"mailto:a@b.c\">m</a></body></html>"))
        val edges = Curation.linkHostEdges(
          docs.withColumn("html", html), "html",
          concat(col("source"), lit(".example.com")))
        def h(c: org.apache.spark.sql.Column) =
          conv(substring(md5(c), 1, 8), 16, 10).cast("long")
        val e = edges.select(h(col("src_host")).as("src"),
          h(col("dst_host")).as("dst"), col("w"))
        graft.operators.PageRank.rank(e, "src", "dst", Some("w"), iters = 4)
          .orderBy("node")
      },
      Some(graft.operators.PageRank.oracleSql(
        """SELECT CAST('0x' || substr(md5(source || '.example.com'), 1, 8) AS BIGINT) AS src,
          |       CAST('0x' || substr(md5(dhost), 1, 8) AS BIGINT) AS dst,
          |       CAST(1 AS BIGINT) AS w
          |FROM (
          |  SELECT source,
          |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          |      lower(regexp_extract(trim(href),
          |        '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)),
          |      '^.*@', ''), ':[0-9]*$', ''), '\.+$', ''), '^www\.', '') AS dhost
          |  FROM (
          |    SELECT source,
          |      unnest(regexp_extract_all(html, '<a\s[^>]*href="([^"]*)"', 1)) AS href
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
          |      FROM documents) t1) t2) t3
          |WHERE dhost <> ''""".stripMargin,
        iters = 4))),

    // ---- personalized (topic-seeded) PageRank ---------------------------
    // Authority as seen FROM region 0's nations: teleport and dangling
    // mass restricted to the seed set — the topic-focused domain
    // ranking (trusted-host seeding). Full trade graph, 5 iterations.
    QueryDef("topic_pagerank",
      (s, dir) => {
        val li = Tables.read(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
        val ord = Tables.read(s, dir, "orders").select("o_orderkey", "o_custkey")
        val cust = Tables.read(s, dir, "customer").select("c_custkey", "c_nationkey")
        val supp = Tables.read(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val edges = li
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        val seeds = Tables.read(s, dir, "nation")
          .filter(col("n_regionkey") === 0).select(col("n_nationkey").as("v"))
        graft.operators.PageRank.personalized(edges, seeds, "v",
            "src", "dst", iters = 5)
          .orderBy("node")
      },
      Some(graft.operators.PageRank.oracleSql(
        """SELECT c.c_nationkey AS src, s.s_nationkey AS dst, CAST(1 AS BIGINT) AS w
          |FROM lineitem l
          |JOIN orders o ON l.l_orderkey = o.o_orderkey
          |JOIN customer c ON o.o_custkey = c.c_custkey
          |JOIN supplier s ON l.l_suppkey = s.s_suppkey""".stripMargin,
        iters = 5,
        seedsSql = Some(
          "SELECT n_nationkey AS v FROM nation WHERE n_regionkey = 0")))),

    // ---- trained-model artifact roundtrip -------------------------------
    // writeModel/readModel must be invisible: the oracle is the SAME
    // unrolled training replay as quality_train, served from a model
    // that went through parquet.
    QueryDef("quality_model_artifact",
      (s, dir) => {
        import graft.llm.QualityTrain
        val mPath = java.nio.file.Files
          .createTempDirectory("graft_qmodel_").toString
        QualityTrain.writeModel(s, trainedModel(s, dir), mPath)
        QualityTrain.weightsDf(s, QualityTrain.readModel(s, mPath))
          .orderBy("bucket")
      },
      Some(graft.llm.QualityTrain.oracleSql(
        d = 64, iters = 3, lrNum = 1L, lrDen = 1L,
        labelExpr = TrainLabel, finalSelect = "weights"))),

    // ---- incremental connected components -------------------------------
    // The dedup_incremental fixture's cluster story: labels over the
    // corpus pairs (docs < 250), then the batch pairs (new docs +
    // planted clones) merged INCREMENTALLY — only touched components
    // recompute. The oracle is the full recursive transitive closure
    // over ALL pairs of the union corpus: incremental must be
    // indistinguishable from recompute.
    QueryDef("cc_incremental",
      (s, dir) => {
        import graft.llm.Dedup
        import graft.operators.ConnectedComponents
        val docs = Tables.read(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") < 250)
        val fresh = docs.filter(col("doc_id") >= 250)
          .unionByName(docs
            .filter(pmod(col("doc_id"), lit(10L)) === 0 && col("doc_id") < 250)
            .withColumn("doc_id", col("doc_id") + 200000L))
        val oldPairs = Dedup.minhashNearDupPairs(corpus, "text", "doc_id",
          jaccardThreshold = 0.8)
        val labels = ConnectedComponents.run(oldPairs, "id_a", "id_b")
        val batchPairs = Dedup.minhashNearDupPairsIncremental(
          fresh, corpus, "text", "doc_id", jaccardThreshold = 0.8)
        ConnectedComponents.incremental(labels, batchPairs, "id_a", "id_b")
          .orderBy("node")
      },
      Some(s"""
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
        ORDER BY node""")),

    // ---- streaming cluster maintenance ----------------------------------
    // The whole near-dup pipeline as a stream: corpus-seeded MinHash
    // index + corpus-seeded label table, two micro-batches (fresh docs,
    // then planted clones of INDEXED corpus docs — the cross-batch
    // case), per batch: bucket-pruned pair serve → index append →
    // incremental CC fold into the labels table. Final labels must be
    // indistinguishable from the full recursive closure over ALL pairs
    // of the union corpus.
    QueryDef("stream_cc",
      (s, dir) => {
        import java.nio.file.Files
        import graft.llm.{Dedup, MinHashIndex}
        import graft.operators.ConnectedComponents
        val docs = Tables.read(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") < 250)
        val idxPath = Files.createTempDirectory("graft_scc_idx_").toString
        val labelsPath = Files.createTempDirectory("graft_scc_lab_").toString
        val srcDir = Files.createTempDirectory("graft_scc_src_").toString
        // index seed, label seed and source files are independent
        // fixture builds — bounded overlap (§2.6)
        graft.core.Par.run3(
          () => MinHashIndex.write(corpus, "text", "doc_id", idxPath,
            nBuckets = 16),
          () => ConnectedComponents.run(
              Dedup.minhashNearDupPairs(corpus, "text", "doc_id",
                jaccardThreshold = 0.8), "id_a", "id_b")
            .write.mode("overwrite").parquet(labelsPath),
          () => {
            docs.filter(col("doc_id") >= 250).select("doc_id", "text")
              .coalesce(1).write.mode("append").parquet(srcDir)
            docs.filter(pmod(col("doc_id"), lit(10L)) === 0 &&
                col("doc_id") < 250)
              .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
              .coalesce(1).write.mode("append").parquet(srcDir)
          })
        val ckpt = Files.createTempDirectory("graft_scc_ck_").toString
        val schema = s.read.parquet(srcDir).schema
        def runOnce(): Unit =
          graft.streaming.StreamingIncremental.streamingClusterMaintenance(
            s, srcDir, schema, idxPath, labelsPath, ckpt, "text", "doc_id",
            jaccardThreshold = 0.8, nBuckets = 16,
            maxFilesPerTrigger = Some(1)).awaitTermination()
        runOnce()
        runOnce() // checkpointed: no new batches, labels untouched
        graft.streaming.StreamingIncremental.readLabels(s, labelsPath)
          .orderBy("node")
      },
      Some(s"""
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
        ORDER BY node""")),

    // ---- mergeable-sketch store -----------------------------------------
    // Daily HLL sketches built in two appends (backfill + increment),
    // then union-served over the full range AND a pruned day window —
    // distinct counts over arbitrary windows without re-reading raw
    // rows. Sketch-audit gate pattern: exact counts cross the oracle,
    // sketch accuracy as pinned TRUE flags.
    QueryDef("sketch_store_union",
      (s, dir) => {
        import graft.operators.SketchStore
        val ev = Tables.events(s, dir).withColumn("day", to_date(col("ts")))
        val mm = ev.agg(min("day"), max("day")).first()
        val (minD, maxD) = (mm.getDate(0).toLocalDate, mm.getDate(1).toLocalDate)
        val cutoff = java.sql.Date.valueOf(
          minD.plusDays(java.time.temporal.ChronoUnit.DAYS.between(minD, maxD) / 2))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_sketchstore_").toString
        SketchStore.build(ev.filter(col("day") <= lit(cutoff)),
          Seq("event_type"), "user_id", "day", tmp)
        SketchStore.build(ev.filter(col("day") > lit(cutoff)),
          Seq("event_type"), "user_id", "day", tmp)
        val winDays = ev.filter(col("day") <= lit(cutoff))
          .select(col("day").cast("string")).distinct()
          .collect().map(_.getString(0)).toSeq
        val full = SketchStore.estimateAudit(ev, Seq("event_type"), "user_id",
          s, tmp, None)
        val win = SketchStore.estimateAudit(ev.filter(col("day") <= lit(cutoff)),
            Seq("event_type"), "user_id", s, tmp, Some(winDays))
          .withColumnRenamed("n_exact", "n_exact_win")
          .withColumnRenamed("hll_ok", "hll_ok_win")
        full.join(win, "event_type").orderBy("event_type")
      },
      Some("""
        WITH d AS (SELECT event_type, user_id, CAST(ts AS DATE) AS day FROM events),
        cut AS (SELECT MIN(day) + CAST((MAX(day) - MIN(day)) // 2 AS INTEGER) AS c FROM d),
        f AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
              FROM d GROUP BY 1),
        w AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact_win
              FROM d WHERE day <= (SELECT c FROM cut) GROUP BY 1)
        SELECT f.event_type, f.n_exact, TRUE AS hll_ok,
               w.n_exact_win, TRUE AS hll_ok_win
        FROM f JOIN w USING (event_type)
        ORDER BY event_type""")),

    // ---- streaming sketch maintenance -----------------------------------
    // The daily-sketch store kept current by a stream: two source files
    // drip through AvailableNow (maxFilesPerTrigger=1), each micro-batch
    // appends its days' sketches; a checkpointed re-run adds nothing,
    // and even a REPLAYED batch couldn't move an estimate (HLL union is
    // duplicate-idempotent — at-least-once is exactly-once here).
    QueryDef("stream_sketch",
      (s, dir) => {
        import java.nio.file.Files
        val ev = Tables.events(s, dir)
          .select(to_date(col("ts")).as("day"), col("event_type"), col("user_id"))
        val srcDir = Files.createTempDirectory("graft_ssk_src_").toString
        val mid = ev.agg(min("day"), max("day")).first()
        val cutoff = java.sql.Date.valueOf(mid.getDate(0).toLocalDate.plusDays(
          java.time.temporal.ChronoUnit.DAYS.between(
            mid.getDate(0).toLocalDate, mid.getDate(1).toLocalDate) / 2))
        ev.filter(col("day") <= lit(cutoff)).coalesce(1)
          .write.mode("append").parquet(srcDir)
        ev.filter(col("day") > lit(cutoff)).coalesce(1)
          .write.mode("append").parquet(srcDir)
        val store = Files.createTempDirectory("graft_ssk_store_").toString
        val ckpt = Files.createTempDirectory("graft_ssk_ck_").toString
        val schema = s.read.parquet(srcDir).schema
        def runOnce(): Unit =
          graft.streaming.StreamingIncremental.streamingSketchMaintenance(
            s, srcDir, schema, store, ckpt,
            Seq("event_type"), "user_id", "day",
            maxFilesPerTrigger = Some(1)).awaitTermination()
        runOnce()
        runOnce() // checkpointed: no new batches
        graft.operators.SketchStore.estimateAudit(ev, Seq("event_type"),
            "user_id", s, store)
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
               TRUE AS hll_ok
        FROM events
        GROUP BY 1 ORDER BY 1""")),

    // ---- ingest drift monitor -------------------------------------------
    // Reference window = first half of the event days, current = the
    // rest; buckets = (event_type, value-band). Exact per-mille
    // proportions and the integer χ²-style contribution per bucket —
    // the pre-training ingest-health gate.
    QueryDef("drift_score",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("day", to_date(col("ts")))
        val mm = ev.agg(min("day"), max("day")).first()
        val cutoff = java.sql.Date.valueOf(
          mm.getDate(0).toLocalDate.plusDays(
            java.time.temporal.ChronoUnit.DAYS.between(
              mm.getDate(0).toLocalDate, mm.getDate(1).toLocalDate) / 2))
        val bucketed = ev.withColumn("bkt",
          concat(col("event_type"), lit(":"),
            least(floor(col("value") / 100).cast("long"), lit(5L)).cast("string")))
        graft.operators.DataQuality.distributionDrift(
            bucketed.filter(col("day") <= lit(cutoff)),
            bucketed.filter(col("day") > lit(cutoff)), "bkt")
          .orderBy("bucket")
      },
      Some("""
        WITH d AS (SELECT event_type || ':' ||
                     CAST(LEAST(CAST(floor(value / 100) AS BIGINT), 5) AS VARCHAR)
                       AS bucket,
                     CAST(ts AS DATE) AS day
                   FROM events),
        cut AS (SELECT MIN(day) + CAST((MAX(day) - MIN(day)) // 2 AS INTEGER) AS c
                FROM d),
        r AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) n_ref FROM d
              WHERE day <= (SELECT c FROM cut) GROUP BY 1),
        u AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) n_cur FROM d
              WHERE day > (SELECT c FROM cut) GROUP BY 1),
        tr AS (SELECT CAST(SUM(n_ref) AS BIGINT) t FROM r),
        tc AS (SELECT CAST(SUM(n_cur) AS BIGINT) t FROM u),
        j AS (SELECT COALESCE(r.bucket, u.bucket) AS bucket,
                COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
              FROM r FULL OUTER JOIN u ON r.bucket = u.bucket),
        p AS (SELECT bucket, n_ref, n_cur,
                (n_ref * 1000) // (SELECT t FROM tr) AS pm_ref,
                (n_cur * 1000) // (SELECT t FROM tc) AS pm_cur
              FROM j)
        SELECT bucket, n_ref, n_cur, pm_ref, pm_cur,
               CASE WHEN pm_ref + pm_cur > 0
                 THEN ((pm_ref - pm_cur) * (pm_ref - pm_cur) * 1000)
                        // (pm_ref + pm_cur)
                 ELSE CAST(0 AS BIGINT) END AS drift_contrib
        FROM p ORDER BY bucket""")),

    // ---- chunk-store corpus-version diff --------------------------------
    // Crawl-over-crawl snapshot diff straight off the manifests: write
    // v1, append edits + new docs (latest-run-wins), tombstone a
    // slice, then diff seq 1 vs live — per-status doc counts and
    // content-multiset chunk churn, no text reconstructed. The oracle
    // re-chunks BOTH versions (the cdc CTE chain, twice) and diffs in
    // SQL.
    QueryDef("chunkstore_diff",
      (s, dir) => {
        import graft.llm.ChunkStore
        val docs = Tables.read(s, dir, "documents").select("doc_id", "text")
        val root = java.nio.file.Files
          .createTempDirectory("graft_chunkdiff_").toString
        ChunkStore.write(docs, "text", "doc_id", root, nBuckets = 16) // seq 1
        val edited = docs.filter(col("doc_id") % 10 === 3)
          .select(col("doc_id"), concat(col("text"), lit(" EDITPATCH-ZZ")).as("text"))
        val newDocs = docs.filter(col("doc_id") % 10 === 1)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        ChunkStore.append(edited.unionByName(newDocs),
          "text", "doc_id", root, nBuckets = 16)                      // seq 2
        ChunkStore.deleteDocs(
          docs.filter(col("doc_id") % 10 === 7).select("doc_id"),
          "doc_id", root)                                             // seq 3
        ChunkStore.diff(s, root, seqA = 0L) // write() is the seq-0 baseline
          .groupBy("status")
          .agg(count(lit(1)).as("n_docs"),
            sum("chunks_added").as("chunks_added"),
            sum("chunks_removed").as("chunks_removed"))
          .orderBy("status")
      },
      Some("WITH v1 AS (SELECT doc_id, text FROM documents),\n" +
        """v2 AS (SELECT doc_id, text || ' EDITPATCH-ZZ' AS text
          |         FROM documents WHERE doc_id % 10 = 3
          |       UNION ALL
          |       SELECT doc_id, text FROM documents WHERE doc_id % 10 NOT IN (3, 7)
          |       UNION ALL
          |       SELECT doc_id + 1000000 AS doc_id, text
          |         FROM documents WHERE doc_id % 10 = 1),""".stripMargin +
        QueriesR9.cdcChunkCtes("v1", "a") + "," +
        QueriesR9.cdcChunkCtes("v2", "b") + "," +
        """ca AS (SELECT doc_id, h, CAST(COUNT(*) AS BIGINT) AS na FROM cha GROUP BY 1, 2),
          |cb AS (SELECT doc_id, h, CAST(COUNT(*) AS BIGINT) AS nb FROM chb GROUP BY 1, 2),
          |m AS (SELECT COALESCE(ca.doc_id, cb.doc_id) AS doc_id,
          |             COALESCE(na, 0) AS na, COALESCE(nb, 0) AS nb
          |      FROM ca FULL OUTER JOIN cb ON ca.doc_id = cb.doc_id AND ca.h = cb.h),
          |churn AS (SELECT doc_id, SUM(GREATEST(nb - na, 0)) AS c_add,
          |                 SUM(GREATEST(na - nb, 0)) AS c_rm
          |          FROM m GROUP BY 1),
          |st AS (SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
          |          CASE WHEN v1.doc_id IS NULL THEN 'added'
          |               WHEN v2.doc_id IS NULL THEN 'removed'
          |               WHEN v1.text = v2.text THEN 'unchanged'
          |               ELSE 'changed' END AS status
          |       FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
          |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
          |       CAST(SUM(COALESCE(churn.c_add, 0)) AS BIGINT) AS chunks_added,
          |       CAST(SUM(COALESCE(churn.c_rm, 0)) AS BIGINT) AS chunks_removed
          |FROM st LEFT JOIN churn USING (doc_id)
          |GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
