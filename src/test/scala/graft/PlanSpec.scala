package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests (PLANS.md): the physical plans that make
  * these queries scale must not silently regress. Checked against the
  * formatted explain output at sf0.001. */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = graft.core.GraftSession.builder("local[4]", Some(4))
    .appName("plan-test").getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val q = Queries.all.find(_.name == name).get
    q.fn(spark, dir).queryExecution.explainString(FormattedMode)
  }

  test("q1: window filter pushed to the parquet scan; partial+final aggregation") {
    val p = planOf("q1_lineitem_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      "filter must reach the scan")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "partial+final aggregate expected")
  }

  test("q1: column pruning — scan reads only the needed columns") {
    val p = planOf("q1_lineitem_agg")
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_comment") && !read.contains("l_orderkey"),
      s"scan must not read unused columns: $read")
  }

  test("q3: dimension sides broadcast; limit compiles to TakeOrderedAndProject") {
    val p = planOf("q3_top_revenue")
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(!p.contains("SortMergeJoin"), "no SMJ expected on dim joins")
    assert(p.contains("TakeOrderedAndProject"), "top-k must not global-sort")
  }

  test("a1 window filter: both bounds pushed") {
    val p = planOf("a1_window_filter")
    assert(p.contains("GreaterThan(l_shipdate") && p.contains("LessThanOrEqual(l_shipdate"),
      "both window bounds must reach the scan")
  }

  test("ann_topk_brute: query side broadcast, corpus scanned once") {
    val p = planOf("ann_topk_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query side must broadcast")
    assert(p.contains("float_vec_dot"), "native kernel must be in the plan")
  }

  test("ann_topk_brute: bounded top-k partial agg — no single-reducer rank window") {
    val p = planOf("ann_topk_brute")
    assert(p.contains("bounded_top_k"), "BoundedTopK aggregate must be in the plan")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      "partial + final bounded top-k expected (map-side combine keeps <= k per task)")
    assert(!p.contains("Window"),
      "the all-scores-to-one-reducer rank window must be gone")
  }

  test("ann_topk_ivf: cell assignment is a projection — no Exchange/Window before the candidate join") {
    val p = planOf("ann_topk_ivf")
    assert(!p.contains("Window"), "assign + rank windows must be gone")
    assert(!p.contains("CartesianProduct") && !p.contains("crossJoin"),
      "no centroid crossJoin expected")
    assert(p.contains("bounded_top_k"), "final rank must be the bounded top-k aggregate")
    // corpus side: scan feeds the cid join through projections only; the
    // sole shuffles left are the top-k merge + recall-gate aggregations
    assert(p.contains("BroadcastHashJoin"), "candidate join must be broadcast on cid")
  }

  test("dedup_embedding_lsh: no all-pairs operator anywhere in the executed plan") {
    val p = planOf("dedup_embedding_lsh")
    assert(!p.contains("CartesianProduct"), "no cartesian pair enumeration")
    assert(!p.contains("BroadcastNestedLoopJoin"), "no broadcast all-pairs join")
    assert(p.contains("float_vec_dot"), "exact verify kernel must re-rank candidates")
  }

  test("dedup_minhash_lsh: single-pass signature kernel, evaluated once") {
    val p = planOf("dedup_minhash_lsh")
    assert(p.contains("minhash_sig"), "native MinHashSig kernel must be in the plan")
    assert(!p.contains("array_min"), "per-permutation HOF mins must be gone")
  }

  test("dedup_ngram_jaccard: verify tail uses the merge-walk intersect kernel") {
    val p = planOf("dedup_ngram_jaccard")
    assert(p.contains("sorted_long_intersect_count"),
      "pair verify must use the native kernel, not array_intersect/array_union")
    assert(!p.contains("array_intersect"), "HOF set algebra must be gone")
  }

  test("asof_enrich: union+window shape — no join operator in the plan") {
    val p = planOf("asof_enrich")
    assert(!p.contains("Join"), "as-of must compile to union+window, not a join")
    assert(p.contains("Window"), "forward-fill window expected")
  }

  test("range_join_alerts: bucketed equi-join, never nested-loop/cartesian") {
    val p = planOf("range_join_alerts")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range join must bucket to an equi-join")
  }

  test("interval_overlap: bucketed equi-join, never nested-loop/cartesian") {
    val p = planOf("interval_overlap")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "interval overlap must bucket to an equi-join")
  }

  test("resample: as-of fill stays join-free (grid + window only)") {
    val p = planOf("resample_hourly")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "the ffill must ride the as-of union+window, not a theta join")
  }

  test("vocab_topk: partial aggregation + bounded top-k, no global sort") {
    val p = planOf("vocab_topk")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "map-side partial agg expected")
    assert(p.contains("TakeOrderedAndProject"), "top-k must not global-sort")
  }

  test("tfidf_topk: bounded top-k aggregate — no per-query rank window") {
    val p = planOf("tfidf_topk")
    assert(p.contains("bounded_top_k"), "BoundedTopK aggregate must rank")
    assert(!p.contains("Window"), "no rank window stage expected")
    assert(!p.contains("CartesianProduct"), "no all-pairs operator")
  }

  test("dup_spans: equi-joins only; gram count has map-side partials") {
    val p = planOf("dup_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "gram flagging must stay an equi-join")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "gram occurrence count needs partial+final aggregation")
  }

  test("url_dedup / quality_filter: pure projection + aggregations, no join surprises") {
    val pu = planOf("url_dedup")
    assert("HashAggregate".r.findAllIn(pu).size >= 2,
      "canonical-url groupBy needs map-side partials")
    assert(!pu.contains("CartesianProduct"))
    val pq = planOf("quality_filter")
    assert(!pq.contains("CartesianProduct") && !pq.contains("SortMergeJoin"),
      "metric joins on doc id must broadcast/hash at gate scale")
  }

  test("decontaminate_bloom: map-side bloom prune feeds an exact semi-join verify") {
    val p = planOf("decontaminate_bloom")
    // the bloom probe must survive as a codegen'd Filter on the exploded
    // gram stream (the prune IS the operator's 100 TB value)...
    assert(p.contains("might_contain"), "bloom might_contain filter missing from the plan")
    // ...and the exact verification semi-join must still be there (bloom
    // false positives are re-verified, never trusted)
    assert(p.contains("LeftSemi"), "exact verification semi-join missing")
    assert(!p.contains("CartesianProduct"))
  }

  test("lm_score: equi-joins only, no window, no cartesian") {
    val p = planOf("lm_score")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(!p.contains("Window"), "scoring must not use a rank window")
  }

  test("ann_topk_sq: IntVecDot kernel scores; bounded top-k, no rank window") {
    val p = planOf("ann_topk_sq")
    assert(p.contains("int_vec_dot"), "native IntVecDot kernel missing from the plan")
    assert(p.contains("bounded_top_k"), "bounded top-k aggregate missing")
    assert(!p.contains("Window"), "per-query rank window would funnel all scores")
  }

  test("dedup_semantic: cell equi-join, nearest-codewords assignment, no cartesian") {
    val p = planOf("dedup_semantic")
    assert(p.contains("nearest_codewords"), "native assignment kernel missing")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("gram explode: shingle tree computed once (no inferred generate filter)") {
    // InferFiltersFromGenerate (excluded in GraftSession) would clone the
    // full shingle+md5 expression into an interpreted Filter below the
    // Generate — measured 8x slower on the gram scans. The md5 call must
    // appear in exactly one plan node.
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = graft.llm.Dedup.shingleHashSets(docs, "text", "doc_id", 3)
      .select(col("id"), explode(col("hs")).as("h"))
      .queryExecution.explainString(FormattedMode)
    assert("md5\\(".r.findAllIn(p).size <= 1,
      s"shingle expression duplicated in the plan:\n${p.take(3000)}")
  }

  // The gate forms end in a total ORDER BY (oracle plumbing — one range
  // Exchange); the shuffle-count pins below audit the raw OPERATORS.
  private def exchanges(p: String): Int =
    "Exchange \\(\\d+\\)".r.findAllIn(p).size // tree nodes, not detail repeats

  test("cdc_chunks: pure per-row projection — zero exchanges") {
    val p = graft.llm.Curation.cdcChunks(
        spark.read.parquet(s"$dir/documents.parquet"), "text", "doc_id")
      .queryExecution.explainString(FormattedMode)
    assert(exchanges(p) == 0, s"CDC chunking must not shuffle:\n${p.take(2000)}")
  }

  test("domain_centroid: one map-side-combinable aggregate, no window") {
    val p = graft.llm.Similarity.groupCentroids(
        spark.read.parquet(s"$dir/embeddings.parquet"), "embedding", "label")
      .queryExecution.explainString(FormattedMode)
    assert(exchanges(p) == 1, s"exactly one exchange expected:\n${p.take(2000)}")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "partial+final aggregate expected")
    assert(!p.contains("Window"), "no rank window expected")
  }

  test("mix_temperature: one exchange on source for the per-source rank") {
    val p = graft.llm.Sampling.temperatureMix(
        spark.read.parquet(s"$dir/documents.parquet")
          .select("doc_id", "source"), "doc_id", "source", 300L)
      .queryExecution.explainString(FormattedMode)
    assert(exchanges(p) == 1, s"exactly one exchange expected:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"))
  }

  test("cdc_dedup_stats: chunking subtree executes once — single scan, no crossJoin") {
    val p = planOf("cdc_dedup_stats")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1,
      s"documents must be scanned exactly once:\n${p.take(2500)}")
    assert(!p.contains("CartesianProduct"),
      "the two-branch crossJoin shape must stay gone")
  }

  // dsir_score's internal plan pin lives in LlmSpec (Dsir.scorePlan is
  // private[llm]; the public score() returns an eager checkpoint whose
  // plan is opaque by design — the cache-release contract)

  test("dedup_containment: equi-joins only, never cartesian") {
    val p = planOf("dedup_containment")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "containment must stay on the prefix-postings equi-join")
  }

  test("selection histogram: one partial+final aggregate, no window over corpus") {
    val p = graft.llm.Selection.histogram(
        spark.read.parquet(s"$dir/documents.parquet")
          .select(org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("text")).as("s")), "s")
      .queryExecution.explainString(FormattedMode)
    assert(exchanges(p) == 1, s"histogram = one map-combinable exchange:\n${p.take(2000)}")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "partial+final aggregate expected")
    assert(!p.contains("Window"), "no window over corpus rows")
  }

  test("keepTopFraction: served filter is a literal comparison — no join, no window, no sort") {
    val scored = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("toks", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")).cast("long"))
    val p = graft.llm.Selection.keepTopFraction(scored, "toks", 250)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Window") && !p.contains("Join") && !p.contains("Sort"),
      s"threshold filter must stay a pure scan+filter:\n${p.take(2000)}")
    assert(exchanges(p) == 0, "no shuffle in the served filter")
  }

  override def afterAll(): Unit = spark.stop()
}
