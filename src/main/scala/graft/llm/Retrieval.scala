package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse (lexical) retrieval over the corpus: an inverted index of term
  * postings with TF-IDF scoring and a bounded top-k rank — the classic
  * quality-filter / data-selection primitive ("find the corpus documents
  * most similar to this reference set") complementing the dense ANN path
  * in [[Similarity]].
  *
  * Numeric design: IDF is FIXED-POINT — `idf = (N * IdfScale) div df`
  * with integer division — so a document score is an exact BIGINT sum
  * `Σ tf·idf`. Integer addition is associative: the score is independent
  * of partition merge order (a double-precision Σ tf·log(N/df) would
  * change in the last bits under Spark's nondeterministic partial-agg
  * ordering and break both the cross-engine gate and run-to-run
  * reproducibility at scale). Log-free IDF ranks identically to log IDF
  * for single-term weighting monotonicity; relative term weighting is
  * slightly sharper, which the quality-filter use-case tolerates.
  *
  * Scale shape: postings and document frequencies are two hash
  * aggregations on content-uniform keys; the query-term join is an
  * equi-join on `term` where the query side is tiny (AQE broadcasts it);
  * the final rank reuses the BoundedTopK aggregate — map-side partials
  * keep ≤ k docs per query per task, never a full per-query score sort.
  */
object Retrieval {

  /** Fixed-point IDF scale: idf = (N * IdfScale) div df. */
  val IdfScale = 1000000L

  /** Term postings: one row per (term, doc) with the term frequency.
    * One explode + one map-side-combinable aggregation. */
  def postings(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(Dedup.tokens(col(textCol))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))

  /** TF-IDF top-k retrieval: for each query document, the k corpus
    * documents with the highest exact fixed-point score, ties broken by
    * lower doc id. Queries sharing no term with a corpus doc contribute
    * nothing (score 0 rows are never materialized).
    *
    * `nDocs` is the corpus document count for the IDF numerator; pass it
    * when already known, else one `count()` job derives it. */
  def tfidfTopK(
      docs: DataFrame, textCol: String, idCol: String,
      queries: DataFrame, qTextCol: String, qIdCol: String,
      k: Int = 10, nDocs: Option[Long] = None): DataFrame = {
    import graft.functions.VectorFunctions.boundedTopK
    val n = nDocs.getOrElse(docs.count())
    val p = postings(docs, textCol, idCol)
    // df = postings rows per term (already unique per (term, doc))
    val idf = p.groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"),
        expr(s"${n}L * ${IdfScale}L div df").as("idf"))
    val qTerms = queries.select(col(qIdCol).as("query_id"),
      explode(array_distinct(Dedup.tokens(col(qTextCol)))).as("term"))
    val scored = qTerms.join(p, "term").join(idf, "term")
      .groupBy("query_id", "doc_id")
      .agg(sum(col("tf") * col("idf")).as("score"))
    // exact BIGINT scores are < 2^53 for any realistic corpus (tf ≤ doc
    // length, idf ≤ N·IdfScale) — lossless through the double-typed heap
    scored.groupBy("query_id")
      .agg(boundedTopK(col("score").cast("double"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("e.id").as("doc_id"), col("e.score").cast("long").as("score"))
  }
}
