package graft.tools

import org.apache.spark.sql.functions._

/** Round-17 plan audit — the warehouse-takedown shapes.
  *
  *  - `Warehouse.deleteRows`'s discovery scan must be COLUMN-PRUNED to
  *    (part_date, idCol) (ReadSchema carries nothing else — the wide
  *    corpus rows are never deserialized to find the touched
  *    partitions) and the drop-set probe must be a broadcast HASH
  *    semi/anti join, never an NLJ;
  *  - its survivor rewrite must read ONLY the touched partitions
  *    (PartitionFilters on part_date — a 100 TB table's erasure cost
  *    is O(partitions containing the ids), not O(table));
  *  - the materializations' denylist guard must stay a broadcast LEFT
  *    ANTI at takedown-list scale, and must DEGRADE to a shuffled anti
  *    join (no broadcast exchange) past the size ceiling instead of
  *    OOMing the driver. */
object PlansR17 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[8]", Some(8)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val docs = graft.Tables.read(spark, dir, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("graft_plans17_").toString
    var bad = false

    val wh = new graft.warehouse.Warehouse(s"$tmp/wh", spark)
    val id = graft.core.TableId("proj", "corpus", "docs")
    wh.overwritePartitioned(id, docs
      .withColumn("part_date",
        date_add(lit("2026-01-01").cast("date"),
          (col("doc_id") % 7).cast("int"))))
    val drop = broadcast(docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").cast("string").as("__graft_drop")).distinct())

    // 1. deleteRows discovery scan: column-pruned + broadcast semi
    val t = wh.read(id)
    val scan = t.select(col("part_date"), col("doc_id").cast("string").as("__id"))
      .join(drop, col("__id") === drop("__graft_drop"), "left_semi")
      .groupBy("part_date").agg(count(lit(1)))
    println("=== deleteRows discovery scan (pruned columns, broadcast semi) ===")
    scan.explain("formatted")
    val scanPlan = scan.queryExecution.executedPlan.toString
    val scanFmt = scan.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    if (!scanPlan.contains("BroadcastHashJoin") ||
        scanPlan.contains("BroadcastNestedLoopJoin")) {
      println("!!! deleteRows discovery is not a broadcast hash semi join")
      bad = true
    }
    if (!scanFmt.contains("ReadSchema: struct<doc_id:bigint>")) {
      println("!!! deleteRows discovery scan reads more than (part_date, doc_id)")
      bad = true
    }

    // 2. survivor rewrite: partition-pruned target read
    val touched = Seq(java.sql.Date.valueOf("2026-01-01"),
      java.sql.Date.valueOf("2026-01-03"))
    val part = wh.readPartitions(id, touched)
    val anti = part.join(drop,
      part("doc_id").cast("string") === drop("__graft_drop"), "left_anti")
    println("=== deleteRows survivor rewrite (PartitionFilters + broadcast anti) ===")
    anti.explain("formatted")
    val antiFmt = anti.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val antiPlan = anti.queryExecution.executedPlan.toString
    if (!antiFmt.contains("PartitionFilters: [part_date#") ||
        !antiFmt.contains(" IN (2026-01-01,2026-01-03)")) {
      println("!!! survivor rewrite read is not partition-pruned")
      bad = true
    }
    if (!(antiPlan.contains("BroadcastHashJoin") &&
          antiPlan.contains("LeftAnti")) ||
        antiPlan.contains("BroadcastNestedLoopJoin")) {
      println("!!! survivor anti-join is not a broadcast hash anti join")
      bad = true
    }

    // 3. the denylist guard on the materialization path: broadcast at
    //    takedown scale...
    graft.llm.Denylist.record(docs.filter(col("doc_id") % 50 === 0)
      .select("doc_id"), "doc_id", wh.guardRoot(id))
    val guarded = graft.llm.Denylist.exclude(docs, "doc_id", spark,
      wh.guardRoot(id))
    println("=== materialization denylist guard (broadcast LEFT ANTI) ===")
    guarded.explain("formatted")
    val gPlan = guarded.queryExecution.executedPlan.toString
    if (!(gPlan.contains("BroadcastHashJoin") && gPlan.contains("LeftAnti"))) {
      println("!!! denylist guard is not a broadcast anti join")
      bad = true
    }

    // 4. ...and a SHUFFLED anti join past the size ceiling (no driver
    //    cliff). Kill every automatic broadcast so only our hint could
    //    produce one, then force the guard's large path.
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.graft.denylist.broadcastMaxBytes", "0")
    val big = graft.llm.Denylist.exclude(docs, "doc_id", spark,
      wh.guardRoot(id))
    println("=== oversized denylist (shuffled LEFT ANTI, no broadcast) ===")
    big.explain("formatted")
    val bPlan = big.queryExecution.sparkPlan.toString
    if (bPlan.contains("Broadcast")) {
      println("!!! oversized denylist still broadcasts")
      bad = true
    }
    if (!bPlan.contains("LeftAnti")) {
      println("!!! oversized denylist lost the anti join")
      bad = true
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.graft.denylist.broadcastMaxBytes")

    spark.stop()
    if (bad) sys.exit(1)
    println("PLANSR17_OK")
  }
}
