package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators beyond whole-document dedup: segment-level
  * global dedup (C4-style), benchmark decontamination, and within-document
  * repetition metrics (the Gopher quality-filter family).
  */
object Curation {

  /** Sliding-window retrieval chunking — the RAG-ingest step: split
    * each document into token windows of `size` with `overlap` tokens
    * shared between neighbors (stride = size − overlap), so no fact at
    * a window boundary is lost to both chunks. Returns one row per
    * chunk: (id, chunk_id 0-based, chunk_text, n_tokens). Boundary
    * contract (pinned in CurationSpec + gate `chunk_retrieval`):
    * docs with ≤ size tokens yield exactly ONE chunk (never a
    * degenerate tail-only window); otherwise ⌈(n − size)/stride⌉ + 1
    * chunks, the last one shorter; zero-token docs yield ZERO rows
    * (there is nothing to embed — emitting an empty chunk would index
    * noise). Distinct from `pack_sequences` (training-side packing to
    * a budget, no overlap) and `ChunkStore` (content-defined chunks
    * for storage dedup). Plan: one projection + one explode over a
    * per-doc integer sequence — no shuffle, no UDF; cost is output
    * rows. Exact integer arithmetic shared with the DuckDB oracle. */
  def chunkForRetrieval(docs: DataFrame, textCol: String, idCol: String,
                        size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      "chunkForRetrieval: need size > 0 and 0 <= overlap < size")
    val stride = size - overlap
    docs
      .select(col(idCol).as("id"),
        graft.llm.Dedup.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size_(col("__toks")))
      .withColumn("__nchunks",
        when(col("__n") === 0, lit(0L))
          .when(col("__n") <= size, lit(1L))
          .otherwise(expr(
            s"CAST((__n - $size + ${stride - 1}) div $stride + 1 AS BIGINT)")))
      .filter(col("__nchunks") > 0)
      .select(col("id"), col("__toks"),
        explode(sequence(lit(0L), col("__nchunks") - 1)).as("chunk_id"))
      .select(col("id"), col("chunk_id"),
        slice(col("__toks"),
          (col("chunk_id") * stride + 1).cast("int"), lit(size))
          .as("__chunk"))
      .select(col("id"), col("chunk_id"),
        array_join(col("__chunk"), " ").as("chunk_text"),
        size_(col("__chunk")).cast("long").as("n_tokens"))
  }

  // functions.size clashes with Seq.size under the wildcard import in
  // some call sites — a named alias keeps the chunker readable
  private def size_(c: Column): Column =
    org.apache.spark.sql.functions.size(c)

  /** HTML → text extraction — the ingest step in front of every text
    * operator here (crawl corpora arrive as markup). Order matters and is
    * load-bearing:
    *  1. script/style BLOCKS go first, content and all — their bodies
    *     legally contain bare `<` (`if (x < 3)`) that would break a
    *     naive tag regex;
    *  2. remaining tags strip to a space (block boundaries must not glue
    *     words together);
    *  3. entities decode via LITERAL replace (no regex metacharacter
    *     risk), `&amp;` strictly last so `&amp;lt;` decodes to the text
    *     "&lt;", not "<";
    *  4. whitespace collapses and trims.
    * All regexes are RE2-compatible, so the DuckDB oracle runs the
    * byte-identical pipeline. Pure projection — no shuffle, no UDF. */
  def htmlToText(html: Column): Column = {
    var s = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    s = regexp_replace(s, "(?is)<style[^>]*>.*?</style>", " ")
    s = regexp_replace(s, "(?s)<[^>]+>", " ")
    val entities = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    s = entities.foldLeft(s) { case (acc, (e, v)) => replace(acc, lit(e), lit(v)) }
    trim(regexp_replace(s, "\\s+", " "))
  }

  /** Every `<a href="...">` target in an HTML document, in document
    * order — the crawl-side primitive that turns pages into a LINK
    * GRAPH (feed the host edges to [[graft.operators.PageRank]] for
    * the Common-Crawl-style domain-authority signal). Double-quoted
    * hrefs only (the deterministic-fixture contract shared with
    * [[htmlToText]]); pure projection, zero shuffle. The tag name is
    * anchored with a whitespace boundary — `<a[^>]*` would also match
    * `<area href=...>` / `<audio ... href=...>` and inflate the link
    * graph beyond anchor tags. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit("<a\\s[^>]*href=\"([^\"]*)\""), lit(1))

  /** Host-level link edges from an HTML corpus: one (src_host,
    * dst_host, w) row per linking-host → linked-host pair, where the
    * destination host comes from [[urlDomain]] (scheme-only absolute
    * links; relative/mailto/javascript targets have no host and are
    * dropped). One explode + one map-side-combinable count — the edge
    * list is the only shuffle, and it is |host-pair|-sized, not
    * |anchor|-sized, after the combine. */
  def linkHostEdges(df: DataFrame, htmlCol: String,
                    srcHost: Column): DataFrame =
    df.select(srcHost.as("src_host"),
        explode(extractLinks(col(htmlCol))).as("href"))
      .select(col("src_host"), urlDomain(col("href")).as("dst_host"))
      .filter(col("dst_host") =!= "")
      .groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("w"))

  /** Query params dropped by [[canonicalizeUrl]]: tracking/attribution
    * noise that makes one page look like many distinct URLs. */
  val TrackingParamRe = "^(utm_[a-zA-Z0-9_]+|fbclid|gclid|ref)="

  /** URL canonicalization — the key for crawl-frontier and document-level
    * URL dedup (one page, many spellings). Deterministic rewrite chain:
    *  1. strip the fragment (`#...` is client-side only);
    *  2. lowercase scheme + authority (host names are case-insensitive;
    *     paths are NOT touched — they are case-significant);
    *  3. drop a leading `www.` and the default ports `:80`/`:443`;
    *  4. drop tracking query params (utm_*, fbclid, gclid, ref) and SORT
    *     the survivors (param order is semantically irrelevant);
    *  5. strip trailing slashes from the path.
    * Pure projection (regex + array HOFs, all RE2-safe and DuckDB-
    * replicable) — no shuffle, scale-free. */
  def canonicalizeUrl(url: Column): Column = {
    val u0 = regexp_replace(trim(url), "#.*", "")
    val headRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*"
    val head = regexp_replace(
      regexp_replace(lower(regexp_extract(u0, headRe, 0)), "^([a-z+.-]+://)www\\.", "$1"),
      ":(80|443)$", "")
    val rest = regexp_replace(u0, headRe, "")
    val path = regexp_replace(regexp_replace(rest, "\\?.*", ""), "/+$", "")
    val q = when(rest.contains("?"), regexp_replace(rest, "^[^?]*\\?", ""))
      .otherwise(lit(""))
    val kept = filter(split(q, "&"), p => length(p) > 0 && !p.rlike(TrackingParamRe))
    val sortedQ = array_join(array_sort(kept), "&")
    concat(head, path,
      when(length(sortedQ) > 0, concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /** URL-level dedup: group by canonical URL, keep the minimum id as the
    * survivor. Same hash-groupBy shape as Dedup.exact — partial map-side
    * min, one shuffle on the canonical key (uniform: hot hosts spread
    * across their distinct paths) — the canonical 100 TB crawl-dedup
    * move. Emits one row per GROUP: survivor id, canonical URL, copy
    * count. */
  def urlDedup(docs: DataFrame, urlCol: String, idCol: String): DataFrame =
    docs.groupBy(canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** The registrable-ish host of a URL: scheme stripped, lowercased,
    * userinfo (`user:pass@`), port, trailing root-dot(s), and leading
    * `www.` removed. The key crawl blocklists and per-domain quotas
    * group on. Userinfo and the FQDN trailing dot matter for an
    * ADVERSARIAL blocklist: `https://x@evil.com/` and
    * `https://evil.com./` must still resolve to `evil.com`, or both
    * evade the filter (and skew quota grouping). The authority capture
    * admits `:` so `user:pass@host` keeps its host; the port strip
    * runs after the userinfo strip and admits an EMPTY port
    * (`:[0-9]*$`, not `+`) — `http://evil.com:/` is a valid-per-RFC3986
    * empty-port authority that would otherwise normalize to `evil.com:`
    * and slip the blocklist. */
  def urlDomain(url: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            lower(regexp_extract(trim(url), "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)),
            "^.*@", ""),
          ":[0-9]*$", ""),
        "\\.+$", ""),
      "^www\\.", "")

  /** Domain-blocklist filtering: drop documents whose URL's domain (or
    * any registrable parent — `ads.evil.com` is blocked by `evil.com`)
    * appears in the blocklist. Production crawl blocklists run to
    * hundreds of thousands of domains, so the list is a DataFrame side,
    * not an `isin` literal.
    *
    * Shape: one BROADCAST HASH equi-join per suffix depth (2 ..
    * `maxLabels` labels — a matchable domain needs a dot), each an O(1)
    * probe per row; a doc is dropped iff any level matched. The corpus
    * never shuffles and never explodes (an explode + anti-join would
    * wrongly keep a doc via its non-matching suffix rows; an explode +
    * groupBy would shuffle the corpus; a disjunctive join condition
    * would degrade to a nested-loop scan of the whole blocklist per
    * row). Domains deeper than `maxLabels` labels match on their last
    * `maxLabels`-label suffixes — raise `maxLabels` if the blocklist
    * carries deeper entries. */
  def domainBlocklistFilter(
      docs: DataFrame, urlCol: String, blocklist: DataFrame,
      maxLabels: Int = 4): DataFrame = {
    require(maxLabels >= 2, "domainBlocklistFilter: maxLabels must be >= 2")
    require(blocklist.columns.contains("domain"),
      "domainBlocklistFilter: blocklist needs a 'domain' column")
    val bl = blocklist.select(lower(trim(col("domain"))).as("domain")).distinct()
    val labels = split(urlDomain(col(urlCol)), "\\.")
    val n = size(labels)
    val withSuf = (2 to maxLabels).foldLeft(docs) { (df, i) =>
      df.withColumn(s"__suf$i",
        when(n >= i, array_join(slice(labels, n - lit(i) + 1, lit(i)), ".")))
    }
    val joined = (2 to maxLabels).foldLeft(withSuf) { (df, i) =>
      df.join(broadcast(bl.withColumnRenamed("domain", s"__hit$i")),
        col(s"__suf$i") === col(s"__hit$i"), "left")
    }
    val blocked = (2 to maxLabels)
      .map(i => col(s"__hit$i").isNotNull)
      .reduce(_ || _)
    joined.filter(!blocked)
      .drop((2 to maxLabels).flatMap(i => Seq(s"__suf$i", s"__hit$i")): _*)
  }

  /** Per-domain quota capping (RefinedWeb-style "no domain dominates the
    * corpus"): keep at most `quota` documents per URL domain, chosen
    * deterministically (seedless md5 order — reproducible across
    * reruns, engines, and cluster layouts; ties to the lower id).
    *
    * Scale shape: the selection is the bounded top-k AGGREGATE per
    * domain, not a row_number window — map-side partials keep ≤ quota
    * docs per domain per task, so a hot domain (the exact case quotas
    * exist for) never funnels its full row set through one reducer;
    * the shuffle carries ≤ quota × tasks rows per domain. Survivors
    * rehydrate via a LEFT SEMI equi-join on the id. */
  def domainQuota(docs: DataFrame, urlCol: String, idCol: String,
                  quota: Int): DataFrame = {
    require(quota > 0, "domainQuota: quota must be positive")
    // boundedTopKLong carries the id as LONG: a non-integral id column
    // would implicitly cast to null, the aggregate would skip every null
    // id, and ALL challenged docs would silently vanish through the
    // left_semi against an empty keep-set. Fail loudly instead (the
    // KMeans null-vector policy); hash string ids to a long key upstream.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = docs.schema(idCol).dataType
    require(Seq(LongType, IntegerType, ShortType, ByteType).contains(idType),
      s"domainQuota: id column '$idCol' must be an integral type castable to " +
        s"LONG (got $idType) — a string id would silently null-cast inside the " +
        "per-domain bounded top-k and drop every challenged doc; hash string " +
        "ids to a long key (e.g. xxhash64) and rehydrate")
    import graft.functions.VectorFunctions.boundedTopKLong
    val dom = urlDomain(col(urlCol))
    // an unparseable/missing URL yields no domain; those docs BYPASS the
    // quota (otherwise every no-domain doc in the corpus would compete
    // inside one implicit "null domain" and quota-1 of them would be
    // silently dropped — a cap on a group that isn't a domain)
    val challenged = docs.filter(dom.isNotNull && length(dom) > 0)
    val exempt = docs.filter(dom.isNull || length(dom) === 0)
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val kept = challenged
      .select(dom.as("domain"), col(idCol).as("id"), (-h).as("neg_h"))
      .groupBy("domain")
      .agg(boundedTopKLong(col("neg_h"), col("id"), quota).as("top"))
      .select(explode(col("top.id")).as(idCol))
    challenged.join(kept, Seq(idCol), "left_semi").unionByName(exempt)
  }

  /** Within-document repeated-line removal (the Gopher/C4 repetition
    * TRANSFORM, complementing [[repetitionMetrics]] which only
    * measures): keep the first occurrence of each line, preserve order,
    * reassemble. Pure projection — the dedup is an indexed HOF filter
    * (`array_position` over the line prefix), O(lines²) per document
    * with line counts in the tens-to-hundreds, zero shuffle at any
    * corpus size. */
  def dedupLinesWithinDoc(docs: DataFrame, textCol: String,
                          idCol: String): DataFrame = {
    // null text scores (0, 0, "") like segmentDedup's contract, instead
    // of propagating nulls through every downstream column
    val bound = docs.withColumn("__lines",
      when(col(textCol).isNull, array().cast("array<string>"))
        .otherwise(split(col(textCol), "\n")))
    val lines = col("__lines")
    val kept = filter(lines, (x, i) =>
      array_position(slice(lines, lit(1), i), x) === 0)
    bound.select(col(idCol).as("doc_id"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, "\n").as("text_clean"))
  }

  /** Fixed-size word-chunk segmenter over an ALREADY-MATERIALIZED token
    * array (same binding contract as Dedup.wordGrams: pass a bound column,
    * not an inline split, or the token subtree is copied per chunk). For
    * natural multi-line text, `split(text, "\n")` is the usual segmenter;
    * chunking exists for corpora without line structure. */
  def wordChunks(toks: Column, n: Int): Column = {
    val nChunks = ceil(size(toks).cast("double") / n).cast("int")
    // sequence(0, -1) would count DOWN on an empty doc — guard to empty
    when(size(toks) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(toks, i * n + 1, lit(n)), " ")))
  }

  /** Segment-level global dedup (the C4 move: drop every repeated line
    * across the whole corpus, keep the first occurrence). First occurrence
    * = minimum (id, segment index); survivors are reassembled in original
    * order.
    *
    * Shape: posexplode → one window keyed on the segment text (shuffle is
    * hash(segment) — content-uniform, no hot key beyond genuinely viral
    * segments) → regroup by document. Two shuffles total, both on keys
    * that scale with data, no driver state.
    *
    * Output per document: n_seg, n_kept, text_clean (surviving segments
    * joined with `joinWith`; empty string when nothing survives). */
  def segmentDedup(
      docs: DataFrame, textCol: String, idCol: String,
      segmenter: Column => Column, joinWith: String = "\n"): DataFrame =
    segmentDedupBy(docs, textCol, idCol, segmenter, identity, joinWith)

  /** [[segmentDedup]] generalized over the DEDUP KEY: segments whose
    * `keyFn(seg)` collide are one duplicate class, first occurrence
    * (min doc id, then min position) survives, and the KEPT text is the
    * ORIGINAL segment — the CCNet paragraph-dedup shape (Wenzek et al.
    * 2020), where the key is a normalized form (lowercased,
    * punctuation/digit-stripped SHA1 in the paper) so trivially-edited
    * copies collapse while the surviving text keeps its formatting.
    * `keyFn = identity` is exact C4-style segment dedup.
    *
    * Scale shape is unchanged from [[segmentDedup]]: one shuffle by key
    * (inherent to GLOBAL dedup), one groupBy doc to reassemble. */
  def segmentDedupBy(
      docs: DataFrame, textCol: String, idCol: String,
      segmenter: Column => Column, keyFn: Column => Column,
      joinWith: String = "\n"): DataFrame = {
    val segs = docs
      .select(col(idCol).as("id"), segmenter(col(textCol)).as("segs"))
      .select(col("id"), posexplode(col("segs")).as(Seq("seg_idx", "seg")))
      .withColumn("key", keyFn(col("seg")))
    val firstSeen = Window.partitionBy("key").orderBy(col("id"), col("seg_idx"))
    val agg = segs.withColumn("kept", row_number().over(firstSeen) === 1)
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_seg"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            filter(
              // collect_list is order-nondeterministic; the unique per-doc
              // seg_idx leading the struct restores a total order
              array_sort(collect_list(struct(col("seg_idx").as("i"),
                when(col("kept"), col("seg")).as("s")))),
              x => x.getField("s").isNotNull),
            x => x.getField("s")),
          joinWith).as("text_clean"))
    // posexplode emits nothing for a zero-segment doc (empty text) — join
    // back so every input document appears in the output, per contract
    docs.select(col(idCol).as("id"))
      .join(agg, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_seg"), lit(0L)).as("n_seg"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** Benchmark decontamination: flag corpus documents sharing at least
    * `minHits` distinct word n-gram shingles with a blocklist corpus
    * (eval-set leakage scrubbing). Shingle spaces are hashed 32-bit
    * (engine-portable md5 prefix, see Dedup.shingleHashSets); the join is
    * an equi-join on the shingle hash — uniform keys, and AQE broadcasts
    * the blocklist side whenever the benchmark set is small (the common
    * case: benchmarks are MBs, corpora are TBs). */
  def decontaminate(
      corpus: DataFrame, blocklist: DataFrame,
      textCol: String, idCol: String,
      shingleN: Int = 3, minHits: Long = 1L): DataFrame = {
    val c = Dedup.shingleHashSets(corpus, textCol, idCol, shingleN)
      .select(col("id"), explode(col("hs")).as("h"))
    val b = Dedup.shingleHashSets(blocklist, textCol, idCol, shingleN)
      .select(explode(col("hs")).as("h")).distinct()
    val hits = c.join(b, Seq("h"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_contaminated"))
    corpus.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        (coalesce(col("n_contaminated"), lit(0L)) >= minHits).as("flagged"))
  }

  /** [[decontaminate]] with a BLOOM pre-filter — the 100 TB
    * shape when the blocklist gram set is too large for an exact
    * broadcast set but its bloom is not (100M grams at 1% FPP ≈ 120 MB vs
    * several GB exact): the corpus gram stream is pruned MAP-SIDE before
    * any shuffle, and only the surviving ~FPP fraction plus true hits pay
    * the exact verification semi-join, whose result makes the output
    * BIT-IDENTICAL to [[decontaminate]] (bloom false positives are
    * filtered out again; there are no false negatives). The bloom build
    * itself is distributed (`stat.bloomFilter` tree-aggregates per-
    * partition sketches); only the final ~`-ln(fpp)·n/ln²2` bits land on
    * the driver, and the probe ships the serialized sketch inside the
    * stage's task binary (itself torrent-broadcast), probed by Spark's
    * own codegen'd might_contain expression — no per-row boxing.
    * Explicit rather than relying on AQE runtime-filter
    * injection: the injected filter keys on the join column AFTER the
    * explode, with size thresholds an operator at this scale should not
    * have to gamble on. */
  def decontaminateBloom(
      corpus: DataFrame, blocklist: DataFrame,
      textCol: String, idCol: String,
      shingleN: Int = 3, minHits: Long = 1L,
      fpp: Double = 0.01): DataFrame = {
    val b = Dedup.shingleHashSets(blocklist, textCol, idCol, shingleN)
      .select(explode(col("hs")).as("h")).distinct()
    val bPersisted = b.persist()
    val nGrams = bPersisted.count() // bounded: |blocklist grams|, drives sizing
    val bloom = bPersisted.stat.bloomFilter("h", math.max(nGrams, 1L), fpp)
    val cand = Dedup.shingleHashSets(corpus, textCol, idCol, shingleN)
      .select(col("id"), explode(col("hs")).as("h"))
      // map-side prune, codegen'd (Spark's own might_contain expression
      // over the serialized sketch) — no shuffle, no boxing for misses
      .filter(graft.functions.VectorFunctions.bloomMightContainLong(bloom, col("h")))
    val hits = cand.join(bPersisted, Seq("h"), "left_semi") // exact verify
      .groupBy("id").agg(count(lit(1)).as("n_contaminated"))
    // bPersisted stays cached: the returned plan re-reads it for the
    // verification join (distributed, |blocklist grams| longs — the small
    // side by definition); it ages out under LRU or with the session
    corpus.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        (coalesce(col("n_contaminated"), lit(0L)) >= minHits).as("flagged"))
  }

  /** Persist a blocklist as a reusable decontamination ARTIFACT —
    * benchmarks are static (MMLU/GSM8K etc. change yearly, corpora get
    * scrubbed daily): shingle the blocklist ONCE and store
    *
    *  - `grams/` — the distinct 32-bit gram hashes (the exact
    *    verification side),
    *  - `_bloom` — the serialized bloom sketch over them (the map-side
    *    prune; MBs at web-benchmark sizes),
    *  - `_artifact_meta.json` — shingleN / fpp / gram count.
    *
    * [[decontaminateBloomFrom]] then scrubs any corpus shard without
    * re-shingling or re-sketching the blocklist — the fit-once /
    * serve-daily posture of [[Dsir.fit]] and [[ContainIndex]]. */
  def writeBlocklist(blocklist: DataFrame, textCol: String, idCol: String,
                     path: String, shingleN: Int = 3,
                     fpp: Double = 0.01): Unit = {
    require(fpp > 0 && fpp < 1, "writeBlocklist: fpp must be in (0, 1)")
    val spark = blocklist.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.delete(root, true)
    val b = Dedup.shingleHashSets(blocklist, textCol, idCol, shingleN)
      .select(explode(col("hs")).as("h")).distinct().persist()
    val nGrams = b.count()
    b.write.parquet(s"$path/grams")
    val bloom = b.stat.bloomFilter("h", math.max(nGrams, 1L), fpp)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$path/_bloom"), true)
    try bloom.writeTo(out) finally out.close()
    b.unpersist()
    val metaOut = fs.create(
      new org.apache.hadoop.fs.Path(s"$path/_artifact_meta.json"), true)
    try metaOut.write(
      s"""{"shingleN":$shingleN,"fpp":$fpp,"nGrams":$nGrams}""".getBytes("UTF-8"))
    finally metaOut.close()
  }

  /** [[decontaminateBloom]] against a persisted [[writeBlocklist]]
    * artifact: the stored sketch is the map-side prune, the stored gram
    * table the exact verify — BIT-IDENTICAL output to
    * [[decontaminate]]/[[decontaminateBloom]] over the same blocklist,
    * with zero blocklist shingling at serve time. */
  def decontaminateBloomFrom(
      spark: org.apache.spark.sql.SparkSession, path: String,
      corpus: DataFrame, textCol: String, idCol: String,
      minHits: Long = 1L): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaP = new org.apache.hadoop.fs.Path(s"$path/_artifact_meta.json")
    require(fs.exists(metaP), s"decontaminateBloomFrom: no artifact at $path")
    val in = fs.open(metaP)
    val txt = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      buf.toString("UTF-8")
    } finally in.close()
    val pat = """"shingleN"\s*:\s*(\d+)""".r.unanchored
    val shingleN = txt match {
      case pat(sn) => sn.toInt
      case _ => throw new IllegalStateException(
        s"decontaminateBloomFrom: unparseable artifact meta at $path: $txt")
    }
    val bloomIn = fs.open(new org.apache.hadoop.fs.Path(s"$path/_bloom"))
    val bloom = try org.apache.spark.util.sketch.BloomFilter.readFrom(bloomIn)
      finally bloomIn.close()
    val bGrams = spark.read.parquet(s"$path/grams")
    val cand = Dedup.shingleHashSets(corpus, textCol, idCol, shingleN)
      .select(col("id"), explode(col("hs")).as("h"))
      .filter(graft.functions.VectorFunctions.bloomMightContainLong(bloom, col("h")))
    val hits = cand.join(bGrams, Seq("h"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_contaminated"))
    corpus.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        (coalesce(col("n_contaminated"), lit(0L)) >= minHits).as("flagged"))
  }

  /** Contamination as a FRACTION, not a count: per document, the share
    * of its distinct word n-grams that appear in the blocklist corpus —
    * the overlap statistic the GPT-3 appendix-C style "dirty document"
    * definition thresholds on (a 13-gram hit in a 100k-token page means
    * something very different from the same hit in a 50-token page,
    * which a raw [[decontaminate]] count treats identically). Emitted as
    * an exact integer per-mille (`overlap_permille = ⌊1000·hits/total⌋`)
    * so the result hashes identically across engines; `flagged` is
    * `overlap_permille >= flagPermille`. Same join shape and cost as
    * [[decontaminate]] plus one map-side `size()` — the blocklist side
    * stays broadcast-small and the corpus side is never shuffled whole. */
  def contaminationScore(
      corpus: DataFrame, blocklist: DataFrame,
      textCol: String, idCol: String,
      shingleN: Int = 3, flagPermille: Long = 100L): DataFrame = {
    val sets = Dedup.shingleHashSets(corpus, textCol, idCol, shingleN)
    val totals = sets.select(col("id"), size(col("hs")).cast("long").as("n_grams"))
    val b = Dedup.shingleHashSets(blocklist, textCol, idCol, shingleN)
      .select(explode(col("hs")).as("h")).distinct()
    val hits = sets.select(col("id"), explode(col("hs")).as("h"))
      .join(b, Seq("h"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_contaminated"))
    totals.join(hits, Seq("id"), "left")
      .select(col("id").as(idCol),
        col("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      // integer div: exact, hash-stable, and total under ANSI (guarded)
      .withColumn("overlap_permille",
        when(col("n_grams") > 0,
          expr("(n_contaminated * 1000L) div n_grams")).otherwise(lit(0L)))
      .withColumn("flagged", col("overlap_permille") >= flagPermille)
  }

  // PII patterns — deliberately RE2-compatible (no backreferences, no
  // lookaround) so the DuckDB oracle runs the byte-identical regex.
  // Redaction order matters: emails first (their digits would otherwise
  // feed the phone pattern), then IPv4 (dotted digits also look
  // phone-ish), then phones over the already-scrubbed text.
  val PiiEmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PiiIpv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PiiPhoneRe = "\\+?[0-9][0-9() .-]{6,}[0-9]"

  /** Scrub emails / IPv4s / phone numbers, emitting per-type match
    * counts and the redacted text. Counts are taken on the progressively
    * redacted text (email count on raw, IP count after email scrub,
    * phone count after both), so one span is never counted twice. Pure
    * projection — no shuffle, scale-free. */
  def piiStats(docs: DataFrame, textCol: String, idCol: String,
               token: String = "<PII>"): DataFrame =
    docs.select(col(idCol), col(textCol).as("__t0"))
      .withColumn("n_email",
        size(regexp_extract_all(col("__t0"), lit(PiiEmailRe), lit(0))).cast("long"))
      .withColumn("__t1", regexp_replace(col("__t0"), PiiEmailRe, token))
      .withColumn("n_ipv4",
        size(regexp_extract_all(col("__t1"), lit(PiiIpv4Re), lit(0))).cast("long"))
      .withColumn("__t2", regexp_replace(col("__t1"), PiiIpv4Re, token))
      .withColumn("n_phone",
        size(regexp_extract_all(col("__t2"), lit(PiiPhoneRe), lit(0))).cast("long"))
      .select(col(idCol), col("n_email"), col("n_ipv4"), col("n_phone"),
        regexp_replace(col("__t2"), PiiPhoneRe, token).as("redacted"))

  /** Within-document repetition counts (Gopher-style quality signals):
    * token count, distinct-token count, and the occurrence count of the
    * most frequent word bigram. Emitted as integer counts — ratios
    * (dup-word fraction, top-bigram fraction) are one division away and
    * integer outputs cross the engine gate bit-exactly.
    *
    * Bigram counting goes through explode + two hash aggregations (per
    * (doc, bigram), then max per doc) — map-side combinable, no per-doc
    * quadratic HOF. */
  def repetitionMetrics(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = docs.select(col(idCol).as("id"), Dedup.tokens(col(textCol)).as("toks"))
    val base = t.select(col("id"),
      size(col("toks")).cast("long").as("n_words"),
      size(array_distinct(col("toks"))).cast("long").as("n_distinct_words"))
    // bigrams WITH multiplicity (wordGrams dedups — wrong tool here)
    val upper = size(col("toks")) - 1
    val bigramArr = when(upper < 1, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), upper), i =>
        concat_ws(" ", element_at(col("toks"), i.cast("int")),
          element_at(col("toks"), (i + 1).cast("int")))))
    val top = t.select(col("id"), explode(bigramArr).as("bg"))
      .groupBy("id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(max(col("c")).as("top_bigram_n"))
    base.join(top, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_words"), col("n_distinct_words"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"))
  }

  // bullet-start / ellipsis-end line shapes (RE2-compatible, so the
  // DuckDB oracle runs the byte-identical regex — same discipline as
  // the PII patterns above)
  val BulletLineRe = "^\\s*[-*•]"
  val EllipsisLineRe = "(\\.\\.\\.|…)\\s*$"

  /** LINE-level repetition and formatting signals — the other half of
    * the Gopher/MassiveText repetition rules (Rae et al. 2021, Table A1)
    * next to [[repetitionMetrics]]'s word-level half: duplicate-line
    * counts, the characters those duplicates waste, and the
    * bullet-start / ellipsis-end line counts the paper thresholds at
    * 90%/30%. Emitted as exact integer counts (ratios are one division
    * away); a duplicate line counts every occurrence BEYOND the first,
    * and its characters likewise.
    *
    * Pure per-document projection — split, HOF aggregates, two regex
    * filters — no shuffle, no explode; scales as a map-only pass at any
    * corpus size. */
  def lineStats(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    val distinctLines = array_distinct(lines)
    def charSum(arr: Column): Column =
      aggregate(arr, lit(0L), (acc, l) => acc + length(l))
    docs.select(col(idCol),
      size(lines).cast("long").as("n_lines"),
      (size(lines) - size(distinctLines)).cast("long").as("n_dup_lines"),
      charSum(lines).as("n_chars"),
      (charSum(lines) - charSum(distinctLines)).as("n_dup_chars"),
      size(filter(lines, l => l.rlike(BulletLineRe))).cast("long")
        .as("n_bullet_lines"),
      size(filter(lines, l => l.rlike(EllipsisLineRe))).cast("long")
        .as("n_ellipsis_lines"))
  }

  /** Control characters to strip in [[normalizeText]]: C0 controls except
    * tab/newline/carriage-return, plus DEL. Both Java regex and RE2 read
    * the `\xNN` escapes identically. */
  private val ControlCharRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Unicode + whitespace text normalization — the first cleaning pass of
    * every web-corpus pipeline (before tokenization, dedup, or LM
    * scoring, all of which key on exact bytes): NFC-compose the text
    * (so "e"+COMBINING ACUTE and precomposed "é" stop being distinct
    * dedup keys), strip C0 control characters (keeping tab/newline/CR),
    * collapse space/tab runs to one space, and trim. Mojibake counters
    * ride along: `n_ctrl` (control chars stripped), `n_repl` (U+FFFD
    * replacement chars — the scar left by a lossy transcode upstream,
    * the standard "drop or re-fetch" signal), `n_composed` (code points
    * removed by NFC composition), and a 0/1 `changed` flag for cheap
    * "fraction of corpus touched" reporting.
    *
    * Pure per-document projection over the [[UnicodeNormalize]] codegen
    * kernel (ASCII fast-path: no decode, no allocation) — no shuffle; a
    * map-only pass at any corpus size. */
  def normalizeText(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val nfc = graft.functions.TextFunctions.unicodeNormalize(col(textCol), "NFC")
    docs.select(col(idCol), nfc.as("nfc"), col(textCol).as("orig"))
      .select(col(idCol), col("nfc"),
        regexp_replace(col("nfc"), ControlCharRe, "").as("no_ctrl"), col("orig"))
      .select(col(idCol),
        trim(regexp_replace(col("no_ctrl"), "[ \\t]+", " ")).as("text_clean"),
        (length(col("nfc")) - length(col("no_ctrl"))).cast("long").as("n_ctrl"),
        (length(col("nfc")) -
          length(regexp_replace(col("nfc"), "\uFFFD", ""))).cast("long").as("n_repl"),
        (length(col("orig")) - length(col("nfc"))).cast("long").as("n_composed"),
        col("orig"))
      .select(col(idCol), col("text_clean"), col("n_ctrl"), col("n_repl"),
        col("n_composed"),
        when(col("text_clean") === col("orig"), lit(0L)).otherwise(lit(1L))
          .as("changed"))
  }

  /** Exact duplicated-span detection (the ExactSubstr move from
    * "Deduplicating Training Data Makes Language Models Better", Lee et
    * al. 2022, re-shaped for Spark): find every token position whose
    * `minLen`-gram occurs more than once ANYWHERE in the corpus
    * (including within the same document), then merge overlapping
    * duplicated positions into maximal spans per document.
    *
    * The paper builds one giant suffix array — inherently single-machine.
    * The distributed equivalent: fixed-length gram occurrence counting
    * (a duplicated substring of length >= minLen duplicates ALL its
    * minLen-grams, so gram-level flags reconstruct exactly the union of
    * duplicated regions) — one explode, one count-groupBy on the gram's
    * md5 (128-bit: no collision risk, constant 32-byte shuffle key), one
    * semi-join back, and a per-document gaps-and-islands pass. All keys
    * are content-uniform; per-doc window state is bounded by document
    * length. Integer outputs cross the engine gate bit-exactly.
    *
    * Output per document: n_tokens, n_dup_spans (maximal merged spans),
    * dup_tokens (token positions covered by any duplicated gram). */
  /** (id, pos, h): one row per token position with the md5 of its
    * `n`-gram (128-bit: no collision risk, constant 32-byte shuffle key).
    * Shared gram builder for [[duplicatedSpans]] and [[excisePassages]]. */
  private def positionedGramHashes(
      df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    val toks = Dedup.tokens(col(textCol))
    val upper = size(toks) - (n - 1)
    df.select(col(idCol).as("id"),
        when(upper < 1, array().cast("array<struct<pos:int,g:string>>"))
          .otherwise(transform(sequence(lit(1), upper), i =>
            struct(i.cast("int").as("pos"),
              array_join(slice(toks, i, lit(n)), " ").as("g")))).as("pg"))
      .select(col("id"), explode(col("pg")).as("pg"))
      .select(col("id"), col("pg.pos").as("pos"), md5(col("pg.g")).as("h"))
  }

  /** Gaps-and-islands over flagged gram START positions: merge intervals
    * [pos, pos+n-1] whose coverage touches or overlaps, yielding one row
    * per maximal span (id, span_id, s, e). Per-doc window state is
    * bounded by document length. Shared merge kernel. */
  private def mergeFlaggedSpans(flagged: DataFrame, n: Int): DataFrame = {
    val wOrd = Window.partitionBy("id").orderBy("pos")
    val prevMaxStart = max(col("pos"))
      .over(wOrd.rowsBetween(Window.unboundedPreceding, -1))
    flagged
      .withColumn("new_span",
        when(prevMaxStart.isNull || col("pos") > prevMaxStart + lit(n), 1L)
          .otherwise(0L))
      .withColumn("span_id", sum(col("new_span")).over(wOrd))
      .groupBy("id", "span_id")
      .agg(min(col("pos")).as("s"), (max(col("pos")) + lit(n - 1)).as("e"))
  }

  def duplicatedSpans(docs: DataFrame, textCol: String, idCol: String,
                      minLen: Int = 5): DataFrame = {
    val grams = positionedGramHashes(docs, textCol, idCol, minLen)
    // corpus-wide occurrence count per gram; >1 = duplicated
    val dupGrams = grams.groupBy("h").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).select("h")
    val flagged = grams.join(dupGrams, Seq("h"), "left_semi")
    val perDoc = mergeFlaggedSpans(flagged, minLen).groupBy("id")
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("e") - col("s") + 1).as("dup_tokens"))
    docs.select(col(idCol).as("id"),
        size(Dedup.tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_tokens"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
  }

  /** Passage EXCISION — decontamination that removes the leaked spans
    * instead of dropping whole documents (the surgical variant of
    * [[decontaminate]]: a 100k-token document with one leaked benchmark
    * question keeps its other 99.99%). Every corpus position whose
    * `n`-gram appears anywhere in the blocklist is flagged; flagged
    * positions merge to maximal spans (same gaps-and-islands kernel as
    * [[duplicatedSpans]]); the surviving tokens reassemble in order.
    *
    * Scale shape: blocklist grams are distinct-deduped and small (eval
    * sets are MBs) — AQE broadcasts them; the corpus side is one explode
    * + semi-join; covered positions per doc are bounded by document
    * length, so the per-doc regroup carries no skew beyond genuinely
    * contaminated giants.
    *
    * Output per document: n_tokens, n_removed, text_clean. */
  def excisePassages(
      corpus: DataFrame, blocklist: DataFrame,
      textCol: String, idCol: String, shingleN: Int = 5): DataFrame = {
    val bl = positionedGramHashes(blocklist, textCol, idCol, shingleN)
      .select("h").distinct()
    val flagged = positionedGramHashes(corpus, textCol, idCol, shingleN)
      .join(bl, Seq("h"), "left_semi")
    // per doc: the SPAN list (small — one entry per leak, not per token)
    // plus the removed-token total; reassembly tests each token against
    // the span list, O(tokens × spans), never O(tokens × covered)
    val spans = mergeFlaggedSpans(flagged, shingleN)
      .groupBy("id")
      .agg(collect_list(struct(col("s"), col("e"))).as("spans"),
        sum(col("e") - col("s") + 1).as("n_removed"))
    corpus.select(col(idCol).as("id"), Dedup.tokens(col(textCol)).as("toks"))
      .join(spans, Seq("id"), "left")
      .select(col("id").as(idCol),
        size(col("toks")).cast("long").as("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        array_join(
          filter(col("toks"), (t, i) =>
            col("spans").isNull || !exists(col("spans"), sp =>
              i + 1 >= sp.getField("s") && i + 1 <= sp.getField("e"))),
          " ").as("text_clean"))
  }

  /** Thresholds for [[gopherQualityFilter]]. Defaults follow the Gopher
    * paper's pretraining-filter family, loosened on the word-count floor
    * so short-but-clean docs are judged by the ratio rules instead of
    * being auto-rejected. */
  final case class QualityThresholds(
      minWords: Long = 5L,
      maxWords: Long = 100000L,
      minMeanWordLen: Double = 2.0,
      maxMeanWordLen: Double = 12.0,
      minStopHits: Long = 1L,
      maxDupWordFrac: Double = 0.5,
      maxTopBigramFrac: Double = 0.3)

  private val QualityStopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Gopher-style composite quality filter: five per-document rules —
    * word-count band, mean-word-length band, minimum stopword hits,
    * duplicate-word fraction cap, top-bigram fraction cap — each emitted
    * as its own boolean plus the conjunction `keep`, so a pipeline can
    * both filter and report WHY documents were rejected.
    *
    * Everything is integer counts and single IEEE divisions (no
    * transcendentals), so the DuckDB oracle reproduces every column
    * bit-exactly. One explode + two map-side-combinable aggregations for
    * the bigram signal (same shape as [[repetitionMetrics]]); the rest is
    * a pure projection. Scale: shuffle keys are (doc, bigram) — uniform,
    * no hot keys, no driver state.
    *
    * Mirrors the reference's validator pattern of named rule verdicts
    * (cf. /root/reference/macros/validate_dataproduct.sql) applied to
    * corpus curation. */
  def gopherQualityFilter(
      docs: DataFrame, textCol: String, idCol: String,
      t: QualityThresholds = QualityThresholds()): DataFrame = {
    val rep = repetitionMetrics(docs, textCol, idCol)
    val toks = Dedup.tokens(col(textCol))
    val base = docs.select(
      col(idCol),
      // total chars across tokens: concat of the token array, so runs of
      // separators never count (length(replace(text,' ','')) would agree
      // here but diverge on tabs/newlines if the tokenizer ever widens)
      length(concat_ws("", toks)).cast("long").as("tok_chars"),
      size(filter(toks, c => array_contains(typedLit(QualityStopwords), c)))
        .cast("long").as("stop_hits"))
    val j = base.join(rep, Seq(idCol))
    val nW = col("n_words").cast("double")
    val meanWl = when(col("n_words") > 0, col("tok_chars").cast("double") / nW)
      .otherwise(lit(0.0))
    val dupFrac = when(col("n_words") > 0,
      (nW - col("n_distinct_words").cast("double")) / nW).otherwise(lit(0.0))
    val nBigrams = greatest(col("n_words") - 1, lit(1L)).cast("double")
    val topBgFrac = col("top_bigram_n").cast("double") / nBigrams
    j.select(
        col(idCol), col("n_words"), meanWl.as("mean_word_len"),
        col("stop_hits"), dupFrac.as("dup_word_frac"),
        topBgFrac.as("top_bigram_frac"),
        (col("n_words") >= t.minWords && col("n_words") <= t.maxWords).as("r_words"),
        (meanWl >= t.minMeanWordLen && meanWl <= t.maxMeanWordLen).as("r_word_len"),
        (col("stop_hits") >= t.minStopHits).as("r_stopwords"),
        (dupFrac <= t.maxDupWordFrac).as("r_dup_words"),
        (topBgFrac <= t.maxTopBigramFrac).as("r_top_bigram"))
      .withColumn("keep",
        col("r_words") && col("r_word_len") && col("r_stopwords") &&
          col("r_dup_words") && col("r_top_bigram"))
  }

  // -- content-defined chunking -------------------------------------------

  /** Rolling-hash base/window for [[cdcChunks]]. The base must be ODD —
    * a power-of-two base makes every term but the newest a multiple of
    * any power-of-two divisor, so `H mod divisor` would see only the
    * last character and boundaries would (almost) never fire. 131 is an
    * odd prime; 131^3 · 2^16 < 2^38, so the window hash is exact in
    * BIGINT on both engines (the literal multipliers are unrolled, so
    * the DuckDB oracle reproduces the arithmetic term-for-term). */
  val CdcWindow = 4
  val CdcBase = 131L

  /** Content-defined chunking: split text at ROLLING-HASH boundaries
    * instead of fixed offsets, so an insertion or deletion only re-chunks
    * its local neighborhood — every chunk after the edit re-synchronizes
    * on the same content-determined cut points (the rsync/LBFS trick;
    * fixed-size blocks would shift every subsequent block and defeat
    * dedup). Chunk-level dedup on near-identical documents (crawl
    * re-fetches, versioned pages, boilerplate wrappers) then collapses
    * the shared runs to one stored copy.
    *
    * A position i (1-based, i >= window) ends a chunk iff the Karp-Rabin
    * hash of the trailing `window` characters ≡ 0 (mod divisor); the
    * final chunk always ends at the text end. Boundary decisions are
    * purely LOCAL (no min/max-length state machine), which is what makes
    * the operator a pure per-row projection — char array, HOF-filtered
    * boundary positions, substring reassembly — no shuffle, no UDF, no
    * state; expected chunk length ≈ divisor.
    *
    * Returns one row per chunk: (id, chunk_idx, chunk, chunk_hash).
    * Dedup/storage accounting is a hash-groupBy over `chunk_hash` — the
    * same canonical shape as exact document dedup. */
  def cdcChunks(docs: DataFrame, textCol: String, idCol: String,
                divisor: Int = 64): DataFrame = {
    require(divisor > 0, "cdcChunks: divisor must be positive")
    val w = CdcWindow
    // H_i = sum_{j=0..w-1} code(chars[i-j]) * base^j — newest char gets
    // weight 1. Exact integer arithmetic; engine-portable.
    def hashAt(cs: Column, i: Column): Column =
      (0 until w).map { j =>
        ascii(element_at(cs, (i - j).cast("int"))).cast("long") *
          lit((0 until j).map(_ => CdcBase).product)
      }.reduce(_ + _)
    val len = length(col(textCol))
    // sequence(w, len) counts DOWN when len < w — guard to empty
    val positions = when(len < w, array().cast("array<int>"))
      .otherwise(sequence(lit(w), len))
    val docsC = docs
      .select(col(idCol), col(textCol), split(col(textCol), "").as("__cs"))
      .withColumn("__cuts",
        filter(positions, i => pmod(hashAt(col("__cs"), i), lit(divisor)) === 0))
      // bounds = [0] ++ cuts (++ [len] unless already there); empty text
      // stays a single [0] bound -> zero chunks
      .withColumn("__bs",
        when(len === 0, array(lit(0)))
          .when(element_at(concat(array(lit(0)), col("__cuts")), -1) === len,
            concat(array(lit(0)), col("__cuts")))
          .otherwise(concat(array(lit(0)), col("__cuts"), array(len))))
    // sequence(1, 0) would count DOWN on the single-bound (empty text)
    // case — guard to an empty chunk list
    val ks = when(size(col("__bs")) <= 1, array().cast("array<int>"))
      .otherwise(sequence(lit(1), size(col("__bs")) - 1))
    docsC
      .select(col(idCol),
        posexplode(transform(ks, k =>
          substring(col(textCol), element_at(col("__bs"), k) + 1,
            element_at(col("__bs"), k + 1) - element_at(col("__bs"), k)))))
      .select(col(idCol), (col("pos") + 1).cast("long").as("chunk_idx"),
        col("col").as("chunk"), md5(col("col")).as("chunk_hash"))
  }
}
