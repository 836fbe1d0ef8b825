package graft

import org.apache.spark.sql.functions._

/** Round-18 wave: the erasure story's remaining contract holes, closed
  * (r17 verdict). The takedown journal now records the declared STORE
  * SET and refuses mismatched resumes/audits (What's wrong #1);
  * warehouse erasures announce themselves in the table's own run-event
  * log (What's missing #2); completed journals have a GC (What's
  * missing #3); composite-key tables get real guards (What's missing
  * #4); and the drop-set joins on the erasure/audit paths degrade to
  * shuffles past the broadcast ceiling instead of a driver OOM
  * (What's wrong #2). */
object QueriesR18 {

  val all: Seq[QueryDef] = Seq(

    // ---- journaled store set: a subset resume/audit refuses ------------------
    // The r17 journal persisted the drop set and the run flags but NOT
    // the store set: a resume invoked with a SUBSET (a typo, a
    // refactored pipeline) ran only the declared steps and still wrote
    // _complete — the journal then claimed a finished takedown whose
    // missing stores were never erased, and auditStatus with the same
    // wrong subset read clean. Here the takedown is crashed mid-way,
    // the subset resume and the subset audit must BOTH refuse, the
    // correct resume completes, and the final state is oracle-pinned.
    QueryDef("forget_store_set",
      (s, dir) => {
        import java.nio.file.Files
        import graft.llm.{ChunkStore, Forget}
        import graft.operators.SampleStore
        val docs = Tables.read(s, dir, "documents")
        val base = Files.createTempDirectory("graft_fss_gate_").toString
        val (chP, smP) = (s"$base/chunk", s"$base/sample")
        graft.core.Par.run3(
          () => ChunkStore.write(docs.select("doc_id", "text"), "text",
            "doc_id", chP, nBuckets = 16),
          () => SampleStore.write(docs, Seq.empty, "doc_id", "source", smP,
            kMax = 40))
        val dropped = docs.select("doc_id").filter(col("doc_id") % 11 === 5)
        val stores = Forget.Stores(chunk = Some(chP), sample = Some(smP))
        val j = Forget.Journal(s"$base/journal", opId = "gate-ss")
        // crash after chunk: sample left incomplete
        Forget.stepFailpoint.set(1)
        val crashed =
          try { Forget.forgetDocs(s, dropped, "doc_id", stores,
            chunkCompact = true, journal = Some(j)); false }
          catch { case _: IllegalArgumentException => true }
          finally Forget.stepFailpoint.set(-1)
        require(crashed, "the failpoint must crash the takedown")
        // a resume declaring a SUBSET store set must refuse — running
        // it would write _complete with sample never erased
        val subset = Forget.Stores(chunk = Some(chP))
        val resumeRefused =
          try { Forget.resume(s, j, subset); false }
          catch { case e: IllegalArgumentException =>
            e.getMessage.contains("store set") }
        require(resumeRefused, "subset resume must refuse with the " +
          "journaled store set in the message")
        // ... and so must an audit over the subset (it would read
        // clean while the missing store leaks)
        val auditRefused =
          try { Forget.auditStatus(s, j, subset); false }
          catch { case e: IllegalArgumentException =>
            e.getMessage.contains("store set") }
        require(auditRefused, "subset auditStatus must refuse")
        // the correct resume completes; a second resume is a pure no-op
        Forget.resume(s, j, stores)
        val again = Forget.resume(s, j, stores)
        require(again.results.forall(_.removed == -2L),
          s"second resume must skip every step: $again")
        Forget.auditStatus(s, j, stores).orderBy("store")
      },
      Some("""
        WITH surv AS (SELECT doc_id FROM documents WHERE doc_id % 11 <> 5),
        survLen AS (
          SELECT s.doc_id FROM surv s JOIN documents d USING (doc_id)
          WHERE len(d.text) > 0)
        SELECT * FROM (VALUES
          ('chunk',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM survLen),
           CAST(0 AS BIGINT), 'clean'),
          ('chunk_manifest',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM survLen),
           CAST(0 AS BIGINT), 'clean'),
          ('sample',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM surv),
           CAST(0 AS BIGINT), 'clean')
        ) AS t(store, n_live, n_dropped, status)
        ORDER BY store""")),

    // ---- erasure events in the run-event log ---------------------------------
    // The event log is the operational history of every table build —
    // IncrementalLog writes started/succeeded per window — but a
    // deleteRows that rewrote partitions of that same logged table
    // recorded nothing there (provenance lived only in the _forget
    // journal, per-takedown and elsewhere on disk): an operator
    // diffing table history saw unexplained partition rewrites. The
    // takedown's warehouse step now appends one model_rows_erased
    // event (op id + removed count in the message) to the SAME log.
    // The window-lookup protocol filters on model_run_succeeded
    // exactly, so the erasure event must not move the incremental
    // lower bound.
    QueryDef("forget_erasure_event",
      (s, dir) => {
        import graft.core.{Env, ModelRef, TableId}
        import graft.materialize.{IncrementalLog, IncrementalLogConfig}
        val wh = new graft.warehouse.Warehouse(
          java.nio.file.Files.createTempDirectory("graft_fee_wh_").toString, s)
        val log = new graft.runlog.EventLog(wh, s)
        val il = new IncrementalLog(wh, log, s)
        val tbl = TableId("proj", "corpus", "evt_e")
        val ref = ModelRef("corpus", "events", "curated", "evt_e")
        val cfg = IncrementalLogConfig(runWindowColumn = "ts",
          partitionBy = Some("ts"))
        def model() = Tables.events(s, dir)
          .select("event_id", "ts", "event_type", "value")
        il.run(() => model(), tbl, ref, Env.Prod, cfg,
          now = () => "2024-01-15 00:00:00.000000 UTC")
        val logTable = log.logTableFor(tbl, ref.domain)
        val dropped = model()
          .filter(to_date(col("ts")) === lit("2024-01-10").cast("date"))
          .select("event_id")
        val nDropped = dropped.distinct().count()
        graft.llm.Forget.forgetDocs(s, dropped, "event_id",
          graft.llm.Forget.Stores(warehouse = Seq(
            graft.llm.Forget.WarehouseTarget(wh, tbl, "event_id",
              log = Some(graft.llm.Forget.ErasureLog(logTable, ref))))),
          denylist = true,
          journal = Some(graft.llm.Forget.Journal(
            s"${wh.root}/journal", opId = "ticket-ee")))
        val events = wh.read(logTable)
        // the erasure event carries the op id and the exact removed
        // count, against the erased table's own 3-part id
        val erased = events.filter(col("eventType") === "model_rows_erased")
          .select("bigQueryTableId", "eventMessage").collect()
        require(erased.length == 1, s"expected one erasure event, got " +
          s"${erased.length}")
        require(erased.head.getString(0) == tbl.fqn, erased.head.toString)
        require(erased.head.getString(1).contains("ticket-ee") &&
          erased.head.getString(1).contains(s"$nDropped rows erased"),
          erased.head.getString(1))
        // the incremental lower bound is untouched by the erasure event
        val w = log.lastSuccessfulRunWindowEnd(logTable, tbl, ref, Env.Prod)
        require(w == "2024-01-15 00:00:00.000000 UTC",
          s"erasure event moved the window lower bound: $w")
        events.groupBy(col("eventType").as("event_type"))
          .agg(count(lit(1)).as("n")).orderBy("event_type")
      },
      Some("""
        SELECT * FROM (VALUES
          ('model_rows_erased', CAST(1 AS BIGINT)),
          ('model_run_started', CAST(1 AS BIGINT)),
          ('model_run_succeeded', CAST(1 AS BIGINT))
        ) AS t(event_type, n)
        ORDER BY event_type""")),

    // ---- journal lifecycle: completed journals retire, crashed ones never ----
    QueryDef("forget_journal_gc",
      (s, dir) => {
        import java.nio.file.Files
        import graft.llm.Forget
        import graft.operators.SampleStore
        val docs = Tables.read(s, dir, "documents")
        val base = Files.createTempDirectory("graft_fgc_gate_").toString
        val smP = s"$base/sample"
        SampleStore.write(docs, Seq.empty, "doc_id", "source", smP,
          kMax = 40)
        val stores = Forget.Stores(sample = Some(smP))
        val jRoot = s"$base/journal"
        // two completed takedowns...
        Forget.forgetDocs(s, docs.select("doc_id").limit(3), "doc_id",
          stores, journal = Some(Forget.Journal(jRoot, "op-a")))
        Forget.forgetDocs(s, docs.select("doc_id").filter(col("doc_id") % 13 === 1),
          "doc_id", stores, journal = Some(Forget.Journal(jRoot, "op-b")))
        // ... and one CRASHED one (ids committed, no step ran)
        Forget.stepFailpoint.set(0)
        try { Forget.forgetDocs(s, docs.select("doc_id").limit(5), "doc_id",
          stores, journal = Some(Forget.Journal(jRoot, "op-c"))); () }
        catch { case _: IllegalArgumentException => () }
        finally Forget.stepFailpoint.set(-1)
        // retire every completed journal; the crashed one — the resume
        // worklist — must survive any keepCompleted
        val retired = Forget.gcJournals(s, jRoot, keepCompleted = 0)
        require(retired == Seq("op-a", "op-b"),
          s"gc must retire exactly the completed journals, got $retired")
        Forget.listJournals(s, jRoot)
          .select("op_id", "ids_committed", "complete").orderBy("op_id")
      },
      Some("""
        SELECT * FROM (VALUES ('op-c', true, false)
        ) AS t(op_id, ids_committed, complete)
        ORDER BY op_id""")),

    // ---- erasure-state maintenance: fold denylists, retire journals ----------
    // Every takedown with denylist=true appends one file per declared
    // key-carrying root, and completed journals accumulate forever.
    // One maintenance call folds each root's list to a single file and
    // retires completed journals — with NOTHING un-erased: the folded
    // lists still guard (both takedowns' ids keep being excluded) and
    // the crashed journal survives, still resumable.
    QueryDef("forget_maintenance",
      (s, dir) => {
        import java.nio.file.Files
        import graft.llm.{ChunkStore, Denylist, Forget}
        import graft.operators.SampleStore
        val docs = Tables.read(s, dir, "documents")
        val base = Files.createTempDirectory("graft_fm_gate_").toString
        val (chP, smP) = (s"$base/chunk", s"$base/sample")
        graft.core.Par.run3(
          () => ChunkStore.write(docs.select("doc_id", "text"), "text",
            "doc_id", chP, nBuckets = 16),
          () => SampleStore.write(docs, Seq.empty, "doc_id", "source", smP,
            kMax = 40))
        val stores = Forget.Stores(chunk = Some(chP), sample = Some(smP))
        val jRoot = s"$base/journal"
        val dropA = docs.select("doc_id").filter(col("doc_id") % 11 === 5)
        val dropB = docs.select("doc_id").filter(col("doc_id") % 13 === 1)
        Forget.forgetDocs(s, dropA, "doc_id", stores, chunkCompact = true,
          denylist = true, journal = Some(Forget.Journal(jRoot, "op-a")),
          overlapStores = 2)
        Forget.forgetDocs(s, dropB, "doc_id", stores, chunkCompact = true,
          denylist = true, journal = Some(Forget.Journal(jRoot, "op-b")),
          overlapStores = 2)
        // a crashed journal — maintenance must never touch it
        Forget.stepFailpoint.set(0)
        try { Forget.forgetDocs(s, docs.select("doc_id").limit(2), "doc_id",
          stores, journal = Some(Forget.Journal(jRoot, "op-c"))); () }
        catch { case _: IllegalArgumentException => () }
        finally Forget.stepFailpoint.set(-1)

        val (folded, retired) = Forget.maintenance(s, jRoot, stores,
          keepCompleted = 0)
        require(folded == Seq(chP, smP), s"folded $folded")
        require(retired == Seq("op-a", "op-b"), s"retired $retired")
        // each root's list folded to ONE data file, and it still guards
        Seq(chP, smP).foreach { p =>
          val fs = new org.apache.hadoop.fs.Path(p)
            .getFileSystem(s.sparkContext.hadoopConfiguration)
          val files = fs.listStatus(
            new org.apache.hadoop.fs.Path(s"$p/_denylist"))
            .count(_.getPath.getName.startsWith("part-"))
          require(files == 1, s"$p/_denylist holds $files data files")
        }
        require(Forget.listJournals(s, jRoot)
          .select("op_id").as[String](org.apache.spark.sql.Encoders.STRING)
          .collect().toSeq == Seq("op-c"), "crashed journal must survive")
        val denied = Denylist.readOpt(s, chP).get
        val excluded = Denylist.exclude(docs, "doc_id", s, chP)
        excluded.agg(
          count(lit(1)).as("n_live"),
          lit(0L).as("x")).select(col("n_live"))
          .withColumn("n_denied", lit(denied.distinct().count()))
          .orderBy("n_live")
      },
      Some("""
        SELECT CAST((SELECT COUNT(*) FROM documents
                     WHERE doc_id % 11 <> 5 AND doc_id % 13 <> 1) AS BIGINT)
                 AS n_live,
               CAST((SELECT COUNT(*) FROM documents
                     WHERE doc_id % 11 = 5 OR doc_id % 13 = 1) AS BIGINT)
                 AS n_denied
        ORDER BY n_live""")),

    // ---- composite-key takedown guard ----------------------------------------
    // A merge table whose uniqueKey is composite could previously be
    // guarded on one component only (armGuard enforces one key column;
    // the denylist is a single id list). The key SPEC "c1+c2" now arms
    // a guard over the U+001F-joined composite key: the takedown
    // erases by it, the armed guard excludes re-pushed batches by it
    // (config-less — the merge does not set denyIdColumn), and a
    // genuinely new key must still land.
    QueryDef("guard_composite_key",
      (s, dir) => {
        import graft.core.TableId
        import graft.materialize.{MergeConfig, MergeIntoPartitioned}
        val wh = new graft.warehouse.Warehouse(
          java.nio.file.Files.createTempDirectory("graft_gck_wh_").toString, s)
        val merge = new MergeIntoPartitioned(wh, s)
        val tbl = TableId("proj", "corpus", "evt_ck")
        val mCfg = MergeConfig(partitionField = "ts",
          uniqueKey = Seq("event_type", "event_id"))
        def model() = Tables.events(s, dir)
          .select("event_id", "ts", "event_type", "value")
        merge.run(model(), tbl, mCfg)
        val dropKeys = model()
          .filter(to_date(col("ts")) === lit("2024-01-10").cast("date"))
          .select(graft.llm.Denylist.compositeKey(
            Seq(col("event_type"), col("event_id"))).as("k"))
        val stores = graft.llm.Forget.Stores(warehouse = Seq(
          graft.llm.Forget.WarehouseTarget(wh, tbl, "event_type+event_id")))
        graft.llm.Forget.forgetDocs(s, dropKeys, "k", stores,
          denylist = true)
        // re-push the FULL corpus (dropped keys included) plus one new
        // key: the armed composite guard must drop the former and land
        // the latter — with no denyIdColumn configured anywhere
        val newRow = s.range(1).select(
          lit(10000019L).as("event_id"),
          lit("2024-02-15 00:00:02").cast("timestamp").as("ts"),
          lit("new_type").as("event_type"), lit(1.0).as("value"))
        merge.run(model().unionByName(newRow), tbl, mCfg)
        val audit = graft.llm.Forget.audit(s, dropKeys, "k", stores)
        require(audit.filter(col("n_dropped") =!= 0L).isEmpty,
          "a re-pushed batch re-landed a composite-key-denied row")
        audit.orderBy("store")
      },
      Some("""
        SELECT * FROM (VALUES
          ('warehouse:proj.corpus.evt_ck',
           CAST((SELECT COUNT(*) FROM events
                 WHERE CAST(ts AS DATE) <> DATE '2024-01-10') + 1 AS BIGINT),
           CAST(0 AS BIGINT))
        ) AS t(store, n_live, n_dropped)
        ORDER BY store""")),

    // ---- SHOW TABLES hides the warehouse's reserved sibling dirs -------------
    // The persistent <table>__takedown guard root and the transient
    // __replaced/__delete_tmp dirs of the rename/delete protocols
    // surfaced as phantom tables in SHOW TABLES (and loadTable on the
    // guard root failed — it holds no parquet).
    QueryDef("catalog_reserved_suffixes",
      (s, dir) => {
        import graft.core.TableId
        val wh = new graft.warehouse.Warehouse(
          java.nio.file.Files.createTempDirectory("graft_crs_wh_").toString, s)
        val id = TableId("proj", "demo", "docs_cat")
        wh.overwrite(id, Tables.read(s, dir, "documents")
          .select("doc_id", "source").limit(10))
        wh.armGuard(id, "doc_id") // creates docs_cat__takedown
        // simulated crash leftovers of the rename / deleteRows protocols
        val fs = new org.apache.hadoop.fs.Path(wh.root)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.mkdirs(new org.apache.hadoop.fs.Path(
          s"${wh.root}/proj/demo/docs_cat__replaced"))
        fs.mkdirs(new org.apache.hadoop.fs.Path(
          s"${wh.root}/proj/demo/docs_cat__delete_tmp"))
        s.conf.set(graft.sql.GraftMergeInto.RootConf, wh.root)
        s.sql("SHOW TABLES IN graft.proj.demo")
          .select(col("tableName").as("table_name")).orderBy("table_name")
      },
      Some("""
        SELECT * FROM (VALUES ('docs_cat')) AS t(table_name)
        ORDER BY table_name""")),

    // ---- bulk drop set: the shuffled (no-broadcast) erasure path is exact ----
    // Past the broadcast ceiling the erasure and audit joins degrade to
    // shuffles (r17 "What's wrong #2" closed deleteRows' and audit's
    // unconditional broadcasts). Forcing the ceiling to zero exercises
    // that path end to end at gate scale: deleteRows' discovery scan,
    // survivor rewrite, and the audit's leak counts must be exact with
    // NO broadcast hint anywhere.
    QueryDef("forget_shuffled_dropset",
      (s, dir) => {
        import graft.core.TableId
        val wh = new graft.warehouse.Warehouse(
          java.nio.file.Files.createTempDirectory("graft_fsd_wh_").toString, s)
        val tbl = TableId("proj", "corpus", "docs_sh")
        val docs = Tables.read(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text"),
            to_date(concat(lit("2024-01-0"),
              (col("doc_id") % 5 + 1).cast("string"))).as("part_date"))
        wh.overwritePartitioned(tbl, docs)
        val dropped = docs.select("doc_id").filter(col("doc_id") % 7 === 3)
        val stores = graft.llm.Forget.Stores(warehouse = Seq(
          graft.llm.Forget.WarehouseTarget(wh, tbl, "doc_id")))
        val prev = s.conf.getOption("spark.graft.denylist.broadcastMaxBytes")
        s.conf.set("spark.graft.denylist.broadcastMaxBytes", "0")
        try {
          val removed = wh.deleteRows(tbl, dropped, "doc_id")
          require(removed == dropped.count(),
            s"shuffled deleteRows removed $removed of ${dropped.count()}")
          graft.llm.Forget.audit(s, dropped, "doc_id", stores)
            .orderBy("store")
        } finally {
          prev match {
            case Some(v) => s.conf.set("spark.graft.denylist.broadcastMaxBytes", v)
            case None => s.conf.unset("spark.graft.denylist.broadcastMaxBytes")
          }
        }
      },
      Some("""
        SELECT * FROM (VALUES
          ('warehouse:proj.corpus.docs_sh',
           CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 7 <> 3) AS BIGINT),
           CAST(0 AS BIGINT))
        ) AS t(store, n_live, n_dropped)
        ORDER BY store"""))
  )
}
