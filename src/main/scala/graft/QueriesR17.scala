package graft

import org.apache.spark.sql.functions._

/** Round-17 wave: the takedown story extended to the WAREHOUSE layer —
  * the corpus tables everything else is built from (r16 verdict
  * "What's missing #1"). `Warehouse.deleteRows` is a partition-pruned
  * survivor rewrite touching only the day-partitions that contain the
  * dropped ids, and both materializations' append paths consult a
  * standing denylist at the table's sibling guardRoot, so neither an
  * at-least-once re-append nor an upsert nor a full refresh can
  * re-land a forgotten document. */
object QueriesR17 {

  val all: Seq[QueryDef] = Seq(

    // ---- warehouse-layer takedown --------------------------------------------
    // Build a log-driven incremental table AND a merge table over
    // events; forget every event of one day (2024-01-10) with
    // denylist = true; then push both legitimate re-landing routes —
    // an IncrementalLog window whose batch re-emits the forgotten ids
    // at fresh event times, and a merge upsert containing them — plus
    // one genuinely new id that MUST land (the guard must not
    // over-filter). The audit (extended with warehouse rows) must read
    // zero leaks, and every partition file the erasure had no business
    // touching must be BYTE-IDENTICAL (the partition-pruned shape is
    // the contract, not an optimization).
    QueryDef("forget_warehouse",
      (s, dir) => {
        import graft.core.{Env, ModelRef, TableId}
        import graft.materialize.{IncrementalLog, IncrementalLogConfig,
          MergeConfig, MergeIntoPartitioned}
        val wh = new graft.warehouse.Warehouse(
          java.nio.file.Files.createTempDirectory("graft_fw_wh_").toString, s)
        val log = new graft.runlog.EventLog(wh, s)
        val il = new IncrementalLog(wh, log, s)
        val merge = new MergeIntoPartitioned(wh, s)
        val inc = TableId("proj", "corpus", "evt_inc")
        val mrg = TableId("proj", "corpus", "evt_mrg")
        val ref = ModelRef("corpus", "events", "curated", "evt_inc")
        val cfg = IncrementalLogConfig(runWindowColumn = "ts",
          partitionBy = Some("ts"), denyIdColumn = Some("event_id"))
        val mCfg = MergeConfig(partitionField = "ts",
          uniqueKey = Seq("event_id"), denyIdColumn = Some("event_id"))
        def model() = Tables.events(s, dir)
          .select("event_id", "ts", "event_type", "value")
        // two ordinary windows build the incremental table; one CTAS +
        // noop-merge builds the merge table
        il.run(() => model(), inc, ref, Env.Prod, cfg,
          now = () => "2024-01-15 00:00:00.000000 UTC")
        il.run(() => model(), inc, ref, Env.Prod, cfg,
          now = () => "2024-02-01 00:00:00.000000 UTC")
        merge.run(model(), mrg, mCfg)

        // the takedown: one whole day of events, so exactly ONE
        // partition of each table is touched
        val dropped = model()
          .filter(to_date(col("ts")) === lit("2024-01-10").cast("date"))
          .select("event_id")
        val stores = graft.llm.Forget.Stores(warehouse = Seq(
          graft.llm.Forget.WarehouseTarget(wh, inc, "event_id"),
          graft.llm.Forget.WarehouseTarget(wh, mrg, "event_id")))

        def sig(id: TableId): Map[String, Long] = {
          val root = new org.apache.hadoop.fs.Path(wh.pathOf(id))
          val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
          def walk(p: org.apache.hadoop.fs.Path): Seq[(String, Long)] =
            fs.listStatus(p).toSeq.flatMap { st =>
              if (st.isDirectory) walk(st.getPath)
              else if (st.getPath.getName.startsWith("part-"))
                Seq((st.getPath.toString.stripPrefix(root.toString),
                  st.getLen ^ st.getModificationTime))
              else Nil
            }
          walk(root).toMap
        }
        val before = Seq(inc, mrg).map(id => id -> sig(id)).toMap

        graft.llm.Forget.forgetDocs(s, dropped, "event_id", stores,
          denylist = true)

        // both re-landing routes, each with the forgotten ids at fresh
        // event times plus one genuinely NEW id that must land
        val recrawlRows = dropped
          .withColumn("ts", lit("2024-02-15 00:00:01").cast("timestamp"))
          .withColumn("event_type", lit("recrawl"))
          .withColumn("value", lit(0.0))
          .select("event_id", "ts", "event_type", "value")
        val newRow = s.range(1).select(
          lit(10000019L).as("event_id"),
          lit("2024-02-15 00:00:02").cast("timestamp").as("ts"),
          lit("new").as("event_type"), lit(1.0).as("value"))
        il.run(() => model().unionByName(recrawlRows).unionByName(newRow),
          inc, ref, Env.Prod, cfg,
          now = () => "2024-03-01 00:00:00.000000 UTC")
        merge.run(recrawlRows.unionByName(newRow), mrg, mCfg)

        // partitions the erasure (and the re-crawl append) had no
        // business touching are byte-identical
        val touched = Set("part_date=2024-01-10", "part_date=2024-02-15")
        Seq(inc, mrg).foreach { id =>
          val after = sig(id)
          before(id).foreach { case (k, v) =>
            if (!touched.exists(k.contains))
              require(after.get(k) == Some(v),
                s"untouched partition file $k of ${id.identifier} changed")
          }
        }
        val audit = graft.llm.Forget.audit(s, dropped, "event_id", stores)
        require(audit.filter(col("n_dropped") =!= 0L).isEmpty,
          "a re-landing route leaked a forgotten id into the warehouse")
        audit.orderBy("store")
      },
      Some("""
        WITH dropd AS (
          SELECT event_id FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-10'),
        surv AS (
          SELECT event_id FROM events
          WHERE event_id NOT IN (SELECT event_id FROM dropd))
        SELECT * FROM (VALUES
          ('warehouse:proj.corpus.evt_inc',
           CAST((SELECT COUNT(*) FROM surv) + 1 AS BIGINT),
           CAST(0 AS BIGINT)),
          ('warehouse:proj.corpus.evt_mrg',
           CAST((SELECT COUNT(*) FROM surv) + 1 AS BIGINT),
           CAST(0 AS BIGINT))
        ) AS t(store, n_live, n_dropped)
        ORDER BY store""")),

    // ---- journaled takedown: crash, triage, resume ---------------------------
    // forgetDocs was an unjournaled multi-store sequence (r16 verdict
    // "What's missing #2"): a crash mid-takedown left no persisted
    // record of which stores completed, and the audit could not tell
    // "takedown still in progress" from "compliance breach". Here the
    // sequence is CRASHED by failpoint after two steps (denylist +
    // chunk done; edge and sample not), auditStatus must read the
    // incomplete stores as in_progress and NOTHING as leak, resume
    // must re-run only the missing steps, and the final audited state
    // is oracle-pinned to the surviving corpus.
    QueryDef("forget_resume",
      (s, dir) => {
        import java.nio.file.Files
        import graft.llm.{ChunkStore, Forget}
        import graft.operators.{EdgeStore, SampleStore}
        val docs = Tables.read(s, dir, "documents")
        val ids = docs.select("doc_id")
        val pairs = ids.as("a").join(ids.as("b"),
            col("b.doc_id") === col("a.doc_id") + 1 &&
              col("a.doc_id") % 10 =!= 9)
          .select(col("a.doc_id").as("u"), col("b.doc_id").as("v"))
        val base = Files.createTempDirectory("graft_fresume_gate_").toString
        val (chP, edP, smP) = (s"$base/chunk", s"$base/edge", s"$base/sample")
        // three independent store builds with bounded overlap (§2.6)
        graft.core.Par.run3(
          () => ChunkStore.write(docs.select("doc_id", "text"), "text",
            "doc_id", chP, nBuckets = 16),
          () => EdgeStore.write(pairs.withColumn("w", lit(1L)), "u", "v",
            Some("w"), edP, nBuckets = 8),
          () => SampleStore.write(docs, Seq.empty, "doc_id", "source", smP,
            kMax = 40))
        val dropped = ids.filter(col("doc_id") % 9 === 4)
        val stores = Forget.Stores(chunk = Some(chP), edge = Some(edP),
          sample = Some(smP))
        val j = Forget.Journal(s"$base/journal", opId = "gate")
        // crash after (denylist, chunk): edge + sample left incomplete
        Forget.stepFailpoint.set(2)
        val crashed =
          try { Forget.forgetDocs(s, dropped, "doc_id", stores,
            chunkCompact = true, denylist = true, journal = Some(j)); false }
          catch { case _: IllegalArgumentException => true }
          finally Forget.stepFailpoint.set(-1)
        require(crashed, "the failpoint must crash the takedown")
        // triage: residue of an unfinished takedown is NOT a leak
        val mid = Forget.auditStatus(s, j, stores)
        require(mid.filter(col("status") === "leak").isEmpty,
          "a crashed takedown must never read as a leak")
        require(mid.filter(col("status") === "in_progress").count() >= 2,
          "edge and sample must read in_progress mid-takedown")
        // resume re-runs ONLY the missing steps, under the journal's
        // own persisted flags
        val report = Forget.resume(s, j, stores, overlapStores = 3)
        require(report.results.count(_.removed == -2L) == 2,
          s"resume must skip exactly the two completed steps: $report")
        Forget.auditStatus(s, j, stores).orderBy("store")
      },
      Some("""
        WITH surv AS (SELECT doc_id FROM documents WHERE doc_id % 9 <> 4),
        survLen AS (
          SELECT s.doc_id FROM surv s JOIN documents d USING (doc_id)
          WHERE len(d.text) > 0),
        pr AS (
          SELECT a.doc_id AS u, b.doc_id AS v
          FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
          WHERE a.doc_id % 10 <> 9),
        sp AS (SELECT u, v FROM pr WHERE u % 9 <> 4 AND v % 9 <> 4)
        SELECT * FROM (VALUES
          ('chunk',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM survLen),
           CAST(0 AS BIGINT), 'clean'),
          ('chunk_manifest',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM survLen),
           CAST(0 AS BIGINT), 'clean'),
          ('edge',
           CAST((SELECT COUNT(*) FROM sp) AS BIGINT),
           CAST(0 AS BIGINT), 'clean'),
          ('sample',
           CAST((SELECT COUNT(*) FROM surv) AS BIGINT),
           CAST(0 AS BIGINT), 'clean')
        ) AS t(store, n_live, n_dropped, status)
        ORDER BY store"""))
  )
}
