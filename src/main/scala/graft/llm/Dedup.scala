package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All per-document signatures (shingles, minhash, simhash) are computed
  * with higher-order Column functions in a single projection — no explode,
  * no shuffle, no UDF — so signature computation is embarrassingly parallel
  * and survives any scale. Shuffles happen only where semantically required
  * (bucket joins on LSH keys / hash-groupBy), always on keys whose
  * cardinality grows with the data (no hot keys by construction: bucket
  * keys are hash-valued).
  *
  * Plan-shape rules learned from the sf0.1 bench (high background
  * similarity is the adversarial case for near-dup mining):
  *  - candidate generation shuffles ID PAIRS ONLY — never the shingle
  *    arrays; sets are joined back per-candidate from a compact (id, hs)
  *    side;
  *  - near-dup set algebra runs over distinct 32-bit shingle HASHES
  *    (longs), not strings — smaller rows, cheaper intersections, and the
  *    DuckDB oracle uses the identical hash space so results stay exact;
  *  - exact jaccard mining uses rarest-first prefix filtering (PPJoin
  *    prefix lemma — zero false negatives), so postings join on the RARE
  *    end of the frequency distribution.
  *
  * Hash base: md5 (byte-stable everywhere, incl. the DuckDB oracle). The
  * reference library's own hashing precedent is md5/sha1
  * (register_dataproduct_metadata.sql:95, uuid_generation.sql:36).
  */
object Dedup {

  // -- shared text primitives (single source of truth for oracles too) ----

  /** Distinct lowercase character n-gram shingles of a text column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val t = text.toString
    array_distinct(expr(
      s"transform(sequence(1, greatest(length(lower($t)) - ${n - 1}, 0)), i -> substring(lower($t), i, $n))"))
  }

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), c => length(c) > 0)

  /** Word n-grams from an ALREADY-MATERIALIZED token-array column — the
    * dedup unit of choice for natural text (cf. Gopher/RefinedWeb word-
    * 13-gram dedup): the shingle space grows combinatorially with
    * vocabulary, so document-frequency skew stays low and prefix/LSH
    * filtering keeps candidate sets sparse even on corpora with heavy
    * vocabulary overlap (char n-grams degenerate there — measured 5x+
    * candidate blowup on the harness corpus).
    *
    * `toks` MUST be a bound column reference, not an inline expression:
    * each `element_at` embeds a copy of the toks subtree, so an inline
    * `split()` would re-tokenize the text once per gram position × n
    * (measured 14x slowdown). Tokenize in a prior projection. */
  def wordGrams(toks: Column, n: Int = 3): Column = {
    val upper = size(toks) - lit(n - 1)
    val grams = transform(sequence(lit(1), upper), i =>
      concat_ws(" ", (0 until n).map(k => element_at(toks, (i + lit(k)).cast("int"))): _*))
    // sequence(1, upper) would count DOWN when upper < 1 — guard to empty
    array_distinct(when(upper < 1, array().cast("array<string>")).otherwise(grams))
  }

  /** Corpus-novelty score per document against a REFERENCE corpus held
    * as a [[graft.operators.BloomStore]] of its word n-grams: n_new =
    * how many of the doc's distinct n-grams are DEFINITELY absent from
    * the reference window, n_grams = its distinct n-gram count. High
    * n_new/n_grams ⇒ genuinely new text; near-zero ⇒ boilerplate or
    * memorized/contaminated content — the curation signal, with the
    * reference corpus held in bounded filter state instead of a
    * materialized gram table (at 100 TB the gram set IS the corpus).
    * One-sided like the filter itself: a false positive UNDERCOUNTS
    * novelty, never inflates it. Probes go through
    * [[graft.operators.BloomStore.mightContainBulk]] (corpus-scale
    * probe set — shuffle join, no broadcast). Docs with fewer than n
    * tokens report (0, 0). Exact oracle replay: gate `ngram_novelty`. */
  def ngramNovelty(spark: org.apache.spark.sql.SparkSession,
                   docs: DataFrame, textCol: String, idCol: String,
                   bloomPath: String, n: Int = 3,
                   parts: Option[Seq[String]] = None): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      tokens(col(textCol)).as("__toks"))
    val grams = toks.select(col("id"),
      explode(wordGrams(col("__toks"), n)).as("gram"))
    val verdicts = graft.operators.BloomStore.mightContainBulk(
      spark, bloomPath, grams.select("gram"), "gram", parts)
    val perDoc = grams
      .join(verdicts, grams("gram") === verdicts("key"))
      .groupBy("id")
      .agg(
        sum(when(!col("might_contain"), lit(1L)).otherwise(lit(0L)))
          .as("n_new"),
        count(lit(1)).as("n_grams"))
    docs.select(col(idCol).as("id")).distinct()
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"))
  }

  /** 32-bit hash of a string from its md5 prefix (engine-portable). */
  private[llm] def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** (id, hs) distinct SORTED 32-bit shingle-hash sets — the working
    * representation for all near-dup set algebra. Two projections: bind
    * the token array, then gram+hash it (see wordGrams perf note). Sorted
    * ascending ONCE PER DOCUMENT so the pair-verify stage can use the
    * allocation-free merge-walk intersection kernel; minhash and prefix
    * consumers are order-insensitive. */
  def shingleHashSets(docs: DataFrame, textCol: String, idCol: String,
                      shingleN: Int = 3): DataFrame =
    docs.select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"),
        array_sort(array_distinct(transform(wordGrams(col("toks"), shingleN), s => h32(s))))
          .as("hs"))

  // -- exact dedup --------------------------------------------------------

  /** Exact dedup by content hash: one survivor (minimum id) per distinct
    * text. A hash-groupBy: partial (map-side) min per hash, then one
    * shuffle on the hash — the canonical 100 TB exact-dedup shape. */
  def exact(docs: DataFrame, textCol: String, idCol: String,
            hash: Column => Column = md5): DataFrame =
    docs.groupBy(hash(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Join candidate id-pairs back to their hash-sets and compute exact
    * jaccard — shared verify tail. `cand` carries only (id_a, id_b).
    * The sets are sorted+distinct (shingleHashSets), so |∩| is the native
    * merge-walk kernel and |∪| = |a| + |b| − |∩| — same values as the
    * array_intersect/array_union HOF form, none of its per-pair hash-set
    * and result-array allocations (this join IS the profile of every
    * near-dup miner). */
  private[llm] def verifyJaccard(cand: DataFrame, sets: DataFrame,
                            threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions.sortedLongIntersectCount
    val a = sets.select(col("id").as("id_a"), col("hs").as("hs_a"))
    val b = sets.select(col("id").as("id_b"), col("hs").as("hs_b"))
    // `inter` is referenced twice by the jaccard formula; the explicit
    // select makes it a named projection output so the kernel runs ONCE
    // per pair (CollapseProject declines to inline multi-referenced
    // non-trivial expressions)
    cand.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        sortedLongIntersectCount(col("hs_a"), col("hs_b")).cast("double").as("inter"),
        (size(col("hs_a")) + size(col("hs_b"))).cast("double").as("tot"))
      .withColumn("jaccard", col("inter") / (col("tot") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // -- MinHash + LSH near-dedup ------------------------------------------

  /** MinHash parameters shared verbatim with the DuckDB oracle. */
  val MinhashA: Seq[Long] = Seq(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L)
  val MinhashB: Seq[Long] = Seq(3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L)
  val MinhashP: Long = 2038074743L // prime < 2^31; a*h < 2^37 — no overflow
  val MinhashBands = 2
  val MinhashRows = 4 // 2 bands x 4 rows: s-curve threshold ~0.84

  /** Per-doc minhash signature: k = 8 permutation-min values, each an
    * array_min over the shingle-hash array (pure projection, no shuffle). */
  def minhashSignature(hashesCol: Column): Seq[Column] =
    MinhashA.zip(MinhashB).map { case (a, b) =>
      array_min(transform(hashesCol, h => (h * lit(a) + lit(b)) % lit(MinhashP)))
    }

  /** Candidate pairs via banded LSH, then exact-Jaccard verification.
    * Plan: project signatures → explode to (band, key) — 2 small rows per
    * doc — → self-join on the band key → DISTINCT ID PAIRS (the only wide
    * shuffle, and it carries two longs per row) → join hash-sets back →
    * verify. Only candidates ever touch the arrays. */
  /** (id, band, key) LSH band rows from a shingle-hash-set DataFrame —
    * 2 small rows per doc. Signatures come from the single-pass native
    * MinHashSig kernel (one traversal for all k permutations instead of
    * k traversals + k intermediate arrays — same mins, oracle unaffected),
    * PROJECTED ONCE into a named column: the 8 element_at references then
    * point at one attribute, where inline use would copy the kernel per
    * reference (the CollapseProject gotcha, PLANS.md rule 11). */
  private[llm] def bandRows(sets: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.minHashSig
    sets.select(col("id"),
        minHashSig(col("hs"), MinhashA, MinhashB, MinhashP).as("__sig"))
      .select(col("id"),
        explode(array((0 until MinhashBands).map { b =>
          struct(lit(b).as("band"),
            concat_ws(":", (b * MinhashRows until (b + 1) * MinhashRows)
              .map(j => element_at(col("__sig"), j + 1)): _*).as("key"))
        }: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
  }

  def minhashNearDupPairs(
      docs: DataFrame, textCol: String, idCol: String,
      jaccardThreshold: Double = 0.8, shingleN: Int = 3): DataFrame = {
    // sets feeds three DAG branches (banding + both verify sides); without
    // materialization Spark recomputes the md5 shingling per branch.
    // Eager localCheckpoint, not persist: a cached plan is re-embedded
    // (and re-rendered by AQE's per-update explainString) once per
    // reference, so the three references would put the whole shingling
    // pipeline in every downstream plan 3x — the driver-side render
    // cost ProfileGate measured dominating the cc/dedup gates. Same
    // blocks, same results, one-node lineage.
    val sets = shingleHashSets(docs, textCol, idCol, shingleN)
      .localCheckpoint(true)
    val bands = bandRows(sets)

    val l = bands.select(col("band"), col("key"), col("id").as("id_a"))
    val r = bands.select(col("band"), col("key"), col("id").as("id_b"))
    val cand = l.join(r, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    verifyJaccard(cand, sets, jaccardThreshold)
  }

  /** Incremental near-dup: pairs touching a NEW batch — new-vs-corpus and
    * new-vs-new, never corpus-vs-corpus. The daily-crawl regime at
    * 100 TB: the historical corpus is NOT re-paired against itself each
    * run; its signatures are joined once against the (small) new batch's
    * band keys, so per-run cost scales with the batch, not the corpus.
    * (Here both sides are signed from text; in production the corpus
    * side's (id, hs) sets persist as a signature table maintained by
    * previous runs — `shingleHashSets` output is exactly that schema.)
    * Ids must be disjoint across the two inputs. */
  def minhashNearDupPairsIncremental(
      newDocs: DataFrame, corpus: DataFrame, textCol: String, idCol: String,
      jaccardThreshold: Double = 0.8, shingleN: Int = 3): DataFrame = {
    // allSets is the multi-referenced heavy frame (all-side band rows +
    // the verify join) — eager checkpoint for the
    // [[minhashNearDupPairs]] render reason. newSets stays a lazy
    // persist: it is embedded only once downstream (its band rows; the
    // union reference is swallowed by allSets' checkpoint, which also
    // fills this cache), and a second eager job here measurably cost
    // more than it saved on batch-sized inputs.
    val newSets = shingleHashSets(newDocs, textCol, idCol, shingleN).persist()
    val corpusSets = shingleHashSets(corpus, textCol, idCol, shingleN)
    val allSets = newSets.unionByName(corpusSets).localCheckpoint(true)

    val nb = bandRows(newSets).select(col("band"), col("key"), col("id").as("nid"))
    val ab = bandRows(allSets).select(col("band"), col("key"), col("id").as("oid"))
    val cand = nb.join(ab, Seq("band", "key"))
      .filter(col("nid") =!= col("oid"))
      .select(least(col("nid"), col("oid")).as("id_a"),
        greatest(col("nid"), col("oid")).as("id_b"))
      .dropDuplicates("id_a", "id_b")

    verifyJaccard(cand, allSets, jaccardThreshold)
  }

  // -- SimHash near-dedup (pigeonhole-exact) ------------------------------

  val SimhashBits = 60 // 15 md5 hex chars -> fits signed int64
  val SimhashChunks = 6 // 6 chunks of 10 bits: hamming<=5 guaranteed found

  /** 60-bit simhash over whitespace tokens (with multiplicity): bit i is
    * set iff Σ_tokens (2·bit_i(h(token)) − 1) > 0. Each token is md5-hashed
    * ONCE (the transform), then the native SimHashBits kernel keeps the 60
    * bit-counters in a local int[] inside WholeStageCodegen — one
    * projection per row, no shuffle, no per-token array allocation. */
  def simhash(text: Column): Column = {
    val hashes = transform(tokens(text), tok =>
      conv(substring(md5(tok), 1, 15), 16, 10).cast("long"))
    graft.functions.VectorFunctions.simhashBits(hashes, SimhashBits)
  }

  /** Near-dup pairs with hamming(simhash) <= maxHamming. EXACT, not
    * approximate: with 6 chunks of 10 bits, any pair within hamming 5 has
    * at least one identical chunk (pigeonhole), so the chunk-bucket join
    * has zero false negatives and the hamming verify removes all false
    * positives. Scales as a bucket join, not O(n²). */
  def simhashNearDupPairs(
      docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 5): DataFrame = {
    require(maxHamming < SimhashChunks,
      s"pigeonhole exactness requires maxHamming < $SimhashChunks chunks")
    val bitsPerChunk = SimhashBits / SimhashChunks
    // persisted: the self-join's two sides would otherwise each recompute
    // the simhash HOF over every document
    val withSig = docs.select(col(idCol).as("id"),
      simhash(col(textCol)).as("sig")).persist()

    val chunks = withSig.select(col("id"), col("sig"),
      explode(array((0 until SimhashChunks).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sig"), c * bitsPerChunk)
            .bitwiseAND(lit((1L << bitsPerChunk) - 1)).as("key"))
      }: _*)).as("ck"))
      .select(col("id"), col("sig"), col("ck.chunk"), col("ck.key"))

    val l = chunks.select(col("chunk"), col("key"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = chunks.select(col("chunk"), col("key"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  // -- exact n-gram Jaccard via prefix-filtered inverted index ------------

  /** Exact Jaccard >= t pairs, sub-quadratic via the PPJoin prefix lemma:
    * with every set sorted rarest-first by global document frequency, two
    * sets with overlap >= α must share an element within their first
    * (|X| − α + 1) elements; jaccard >= t implies overlap >= ceil(t·|X|),
    * so joining only the per-doc prefixes of length |X| − ceil(t·|X|) + 1
    * loses nothing. The prefix postings are the RARE shingles, so posting
    * lists stay short even on corpora with heavy background similarity.
    * Candidates (id pairs only) are then exact-verified. */
  def ngramJaccardPairs(
      docs: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.8, shingleN: Int = 3,
      orderByFrequency: Boolean = false): DataFrame = {
    // persisted: feeds postings, prefix build, and both verify sides
    val sets = shingleHashSets(docs, textCol, idCol, shingleN).persist()
    // The prefix lemma holds for ANY global total order. Default: order by
    // hash value — a pure per-row array_sort, zero shuffles. Rarest-first
    // (global document frequency) pays 3 extra shuffles (freq groupBy +
    // join + per-doc collect_list) and only wins on corpora with a skewed
    // shingle-frequency distribution (e.g. char n-grams / tiny vocab).
    val sorted = (if (orderByFrequency) {
      val posting = sets.select(col("id"), explode(col("hs")).as("s"))
      val freq = posting.groupBy("s").agg(count(lit(1)).as("df"))
      posting.join(freq, "s")
        .groupBy("id")
        .agg(expr("transform(array_sort(collect_list(struct(df, s))), x -> x.s)").as("sorted_hs"))
    } else {
      sets.select(col("id"), col("hs").as("sorted_hs")) // hs is already sorted
    })
      .withColumn("n", size(col("sorted_hs")))
      // required overlap = ceil(t·n); the 1e-9 back-off keeps a one-ulp
      // round-UP of the double product (t·n exactly integral) from
      // overshooting ceil by 1 and cutting the prefix one short — a
      // near-integer-from-below instead lengthens the prefix by one,
      // which only adds candidates, never loses a qualifying pair
      .withColumn("plen",
        (col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)).cast("int") + 1))
      .select(col("id"), expr("slice(sorted_hs, 1, plen)").as("prefix"))
    val prefPost = sorted.select(col("id"), explode(col("prefix")).as("s"))
    val l = prefPost.select(col("s"), col("id").as("id_a"))
    val r = prefPost.select(col("s"), col("id").as("id_b"))
    val cand = l.join(r, "s")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    verifyJaccard(cand, sets, threshold)
  }

  // -- exact n-gram CONTAINMENT via asymmetric prefix filter --------------

  /** Exact containment pairs: C(A→B) = |grams(A) ∩ grams(B)| / |grams(A)|
    * >= t, id_a != id_b. The asymmetric cousin of [[ngramJaccardPairs]]:
    * a short document pasted into a longer one (quote expansion,
    * boilerplate wrapping, article + appended footer) scores near-1
    * containment while its Jaccard collapses toward |A|/|B| — the dedup
    * signal Jaccard structurally cannot see.
    *
    * Candidate generation uses the one-sided prefix lemma: containment
    * >= t needs overlap α = ceil(t·|A|), and if A's sorted gram set had
    * its first |A| − α + 1 elements all missing from B, at most α − 1
    * could remain shared — so joining A-PREFIX postings against B's FULL
    * postings loses nothing (any total order; no bound needed on B).
    * The A-side explodes ~(1−t)·|A| grams per doc; the B side is the
    * full posting list — the inherent cost of asymmetric containment
    * (PPJoin's two-sided prefix shrink needs a lower bound on overlap
    * relative to BOTH sizes, which containment does not give). Hub grams
    * are naturally rare in the prefix (it holds the doc's globally
    * smallest hashes when `orderByFrequency`-style ordering is by hash —
    * uniform — so prefix postings stay short). Candidates are exact-
    * verified with the merge-walk intersection kernel; empty gram sets
    * (docs under `shingleN` tokens) are excluded before any division
    * (ANSI divide-by-zero discipline). */
  def containmentPairs(
      docs: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.9, shingleN: Int = 3): DataFrame = {
    import graft.functions.VectorFunctions.sortedLongIntersectCount
    require(threshold > 0 && threshold <= 1,
      "containmentPairs: threshold must be in (0, 1]")
    // persisted: feeds the prefix build, the full postings, and both
    // verify sides
    val sets = shingleHashSets(docs, textCol, idCol, shingleN)
      .filter(size(col("hs")) > 0).persist()
    val post = sets.select(col("id").as("id_b"), explode(col("hs")).as("s"))
      .persist()
    // Rarest-first prefix (NOT hash order): because the B side is the
    // FULL posting table, every hub gram that lands in an A-prefix
    // joins against its entire posting list. Ordering each set by
    // global document frequency puts the RAREST grams in the prefix —
    // the prefix postings are short AND each one meets a short B list.
    // Identical output (the prefix lemma holds for any fixed total
    // order; ties break on the hash). Measured (sf0.1, mild synthetic
    // skew): candidates 275k → 133k for 3 extra map-combinable
    // shuffles — near break-even here, but real-text shingle
    // frequencies are Zipfian, where hash-order prefixes keep hub
    // grams with million-doc posting lists and rarest-first is the
    // difference between hub-bound and output-bound candidate
    // generation. Unlike Jaccard (both sides prefix-bounded, frequency
    // ordering optional), containment's unbounded B side makes this
    // the only safe default at corpus scale.
    val freq = post.groupBy("s").agg(count(lit(1)).as("df"))
    val pref = post.select(col("id_b").as("id"), col("s")).join(freq, "s")
      .groupBy("id")
      .agg(expr("transform(array_sort(collect_list(struct(df, s))), x -> x.s)")
        .as("sorted_hs"), count(lit(1)).as("n"))
      // same 1e-9 ceil back-off as the Jaccard prefix: never one short
      .withColumn("plen",
        (col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)).cast("int") + 1))
      .select(col("id").as("id_a"),
        explode(expr("slice(sorted_hs, 1, plen)")).as("s"))
    val cand = pref.join(post, "s")
      .filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    val a = sets.select(col("id").as("id_a"), col("hs").as("hs_a"))
    val b = sets.select(col("id").as("id_b"), col("hs").as("hs_b"))
    cand.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        sortedLongIntersectCount(col("hs_a"), col("hs_b"))
          .cast("double").as("inter"),
        size(col("hs_a")).cast("double").as("na"))
      .withColumn("containment", col("inter") / col("na"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  // -- embedding cosine near-dup ------------------------------------------

  /** Exact cosine >= t pairs by brute-force self-join — the verification
    * baseline. Norms are precomputed per vector (n ops, not n²); the pair
    * stage computes only the dot product. O(n²) compute but distributed.
    *
    * Above `exactMaxRows` the unconditional cartesian is refused (r18
    * verdict #8 — an O(n²) self-join on a declared path is a 100 TB
    * foot-gun) and candidates route through [[embeddingNearDupPairsLsh]]
    * instead: hyperplane-LSH chunk bucketing, exact cosine verify.
    * Recall at near-dup thresholds (cos ≳ 0.9) is high but not 1.0 —
    * pairs whose vectors collide in no LSH chunk are missed; callers
    * needing the exact answer on a large corpus must raise the ceiling
    * deliberately (and pay the cartesian) or pre-collapse with
    * [[exact]]. Below the ceiling results are byte-identical to the
    * historical brute force. The one extra count() that sizes the input
    * is node-scale, never O(n²). */
  def embeddingNearDupPairs(
      emb: DataFrame, vecCol: String, idCol: String,
      threshold: Double, exactMaxRows: Long = 1L << 20): DataFrame = {
    import graft.functions.VectorFunctions.floatVecDot
    if (emb.count() > exactMaxRows)
      return embeddingNearDupPairsLsh(emb, vecCol, idCol, threshold)
    def norm(v: Column) = sqrt(floatVecDot(v, v))
    val l = emb.select(col(idCol).as("id_a"), col(vecCol).as("v_a"),
      norm(col(vecCol)).as("n_a"))
    val r = emb.select(col(idCol).as("id_b"), col(vecCol).as("v_b"),
      norm(col(vecCol)).as("n_b"))
    l.crossJoin(r)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        floatVecDot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b")
  }

  /** Scale path for embedding near-dup: hyperplane-LSH chunk bucketing for
    * candidates (a bucket join, sub-quadratic), exact cosine verify. For a
    * near-dup threshold (cos >= ~0.9+) chunk-collision probability is
    * ~(1-θ/π)^bits ≈ 0.9^4 per 4-bit chunk, so a handful of chunks gives
    * high recall exactly in the regime that matters; verified against the
    * exact operator in LlmSpec. */
  def embeddingNearDupPairsLsh(
      emb: DataFrame, vecCol: String, idCol: String,
      threshold: Double,
      nPlanes: Int = 16, nChunks: Int = 4, seed: Long = 42L,
      dim: Option[Int] = None): DataFrame = {
    import graft.functions.VectorFunctions.floatVecDot
    require(nPlanes % nChunks == 0)
    val bitsPerChunk = nPlanes / nChunks
    val planes = Similarity.hyperplanes(nPlanes,
      dim.getOrElse(Similarity.inferDim(emb, vecCol)), seed)
    val sig = Similarity.lshSignature(col(vecCol), planes)
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("v"), sig.as("sig"),
      sqrt(floatVecDot(col(vecCol), col(vecCol))).as("nrm")).persist()
    val chunks = base.select(col("id"),
      explode(array((0 until nChunks).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sig"), c * bitsPerChunk)
            .bitwiseAND(lit((1L << bitsPerChunk) - 1)).as("key"))
      }: _*)).as("ck"))
      .select(col("id"), col("ck.chunk"), col("ck.key"))
    val cand = chunks.select(col("chunk"), col("key"), col("id").as("id_a"))
      .join(chunks.select(col("chunk"), col("key"), col("id").as("id_b")), Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    val a = base.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val b = base.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("cosine",
        floatVecDot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b")
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): k-means-cluster
    * the embeddings, compare pairs only WITHIN a cluster, keep one
    * representative per near-dup group. Clustering bounds the quadratic:
    * with balanced clusters the pair work is n²/k, and near-dups (cos ≳
    * 0.9) land in the same cluster with high probability because they
    * are closer to each other than to any centroid gap.
    *
    * Shape: assignment is the zero-shuffle literal-centroid projection
    * ([[KMeans.assign]]); the pair stage is an EQUI-join on `cid` (no
    * cartesian — each cluster joins only itself); survivors come from
    * the same hash-groupBy min as [[exact]]. Returned: one row per doc
    * with its `keep` verdict and cluster, so the caller can filter or
    * audit. A doc is dropped iff some LOWER-id doc in its cluster is
    * within the threshold — the deterministic min-id survivor rule
    * (transitive chains collapse to the lowest id via the pair->min
    * reduction, matching the SemDeDup "keep one per group" contract
    * without a full connected-components pass; for exact CC semantics
    * compose with ConnectedComponents as dedup_pipeline does). */
  def semanticDedup(
      emb: DataFrame, vecCol: String, idCol: String,
      centroids: Seq[Seq[Double]], threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions.floatVecDot
    val assigned = KMeans.assign(
        emb.select(col(idCol).as("id"), col(vecCol).as("v")), "v", centroids)
      .withColumn("nrm", sqrt(floatVecDot(col("v"), col("v"))))
    val a = assigned.select(col("cid"), col("id").as("id_a"),
      col("v").as("v_a"), col("nrm").as("n_a"))
    val b = assigned.select(col("cid"), col("id").as("id_b"),
      col("v").as("v_b"), col("nrm").as("n_b"))
    // a zero-norm embedding (failed embed) satisfies dot >= t·0·0 at ANY
    // threshold — one low-id zero vector would silently drop its whole
    // cluster. Zero-norm docs are never near-dups of anything: exempt
    // both sides of the pair join (they fall through to keep=true).
    val dupOf = a.join(b, Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .filter(floatVecDot(col("v_a"), col("v_b")) >=
        lit(threshold) * col("n_a") * col("n_b"))
      .groupBy(col("id_b").as("id"))
      .agg(min(col("id_a")).as("dup_of"))
    assigned.join(dupOf, Seq("id"), "left")
      .select(col("id"), col("cid"), col("dup_of"),
        col("dup_of").isNull.as("keep"))
  }

  /** Daily-batch [[semanticDedup]] (the incremental companion, same
    * contract family as [[minhashNearDupPairsIncremental]]): test each
    * NEW document against the frozen corpus index and against
    * earlier-id batch members — never corpus-vs-corpus, so cost scales
    * with the batch, not the accumulated corpus.
    *
    * `corpusIndexed` is the STORED index shape: (id, vector, cid) with
    * cid from the same frozen `centroids` (e.g. the cell-partitioned
    * IvfIndex layout). The operator collects the batch's touched cell
    * ids (bounded: ≤ nCells longs, metadata not data) and filters the
    * corpus side with `isin` — against a cell-partitioned store that is
    * a PartitionFilter, so a 10-cell batch reads 10/nCells of a 100 TB
    * corpus. Candidates then meet in an EQUI-join on cid.
    *
    * Id convention: batch ids must sort after corpus ids (the append-log
    * convention, as the planted `+100000` gates use); `cand_id < id`
    * then yields corpus-preferred min-id survivors and earlier-batch
    * precedence in one rule. */
  def semanticDedupIncremental(
      corpusIndexed: DataFrame, batch: DataFrame,
      vecCol: String, idCol: String,
      centroids: Seq[Seq[Double]], threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions.floatVecDot
    val b = KMeans.assign(
        batch.select(col(idCol).as("id"), col(vecCol).as("v")), "v", centroids)
      .withColumn("nrm", sqrt(floatVecDot(col("v"), col("v"))))
      .persist()
    val touched = b.select("cid").distinct().collect().map(_.getInt(0)).sorted
    val corpusCand = corpusIndexed
      .filter(col("cid").isin(scala.collection.immutable.ArraySeq
        .unsafeWrapArray(touched.map(Integer.valueOf)): _*))
      .select(col("cid"), col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val cand = corpusCand
      .unionByName(b.select(col("cid"), col("id").as("cand_id"), col("v").as("cv")))
      .withColumn("cnrm", sqrt(floatVecDot(col("cv"), col("cv"))))
    // same zero-norm exemption as semanticDedup: 0 >= t·0·0 would pair a
    // failed embed with every candidate in its cell
    val dupOf = b.join(cand, Seq("cid"))
      .filter(col("cand_id") < col("id"))
      .filter(col("nrm") > 0 && col("cnrm") > 0)
      .filter(floatVecDot(col("v"), col("cv")) >=
        lit(threshold) * col("nrm") * col("cnrm"))
      .groupBy(col("id")).agg(min(col("cand_id")).as("dup_of"))
    b.select("id", "cid").join(dupOf, Seq("id"), "left")
      .select(col("id"), col("cid"), col("dup_of"),
        col("dup_of").isNull.as("keep"))
  }

  /** Corpus-level gram-set overlap report: how much of corpus A's
    * distinct n-gram vocabulary corpus B shares (and vice versa) — the
    * summary statistic behind source-mixing and dedup-efficacy decisions
    * ("is this crawl snapshot mostly a re-crawl of the last one?").
    * Returns ONE row: distinct-gram counts per side, the common count,
    * and exact integer per-mille Jaccard / containment-in-each-direction.
    *
    * Shape: both sides' exploded grams union into a single `groupBy(h)`
    * whose `max(flag)` partials are map-side combinable (a gram repeated
    * a million times on one side contributes one post-combine row), then
    * one global aggregate over |distinct grams| rows. No join, no
    * per-side distinct pass, corpus row counts never shuffle — at 100 TB
    * the exchange carries the gram VOCABULARY, not the corpus. */
  def corpusGramOverlap(
      a: DataFrame, b: DataFrame,
      textCol: String, idCol: String, shingleN: Int = 3): DataFrame = {
    def grams(df: DataFrame, ia: Int, ib: Int) =
      shingleHashSets(df, textCol, idCol, shingleN)
        .select(explode(col("hs")).as("h"),
          lit(ia.toLong).as("ia"), lit(ib.toLong).as("ib"))
    val flags = grams(a, 1, 0).unionByName(grams(b, 0, 1))
      .groupBy("h").agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
    flags.agg(
        sum(col("ia")).as("n_grams_a"),
        sum(col("ib")).as("n_grams_b"),
        sum(col("ia") * col("ib")).as("n_common"))
      .select(
        coalesce(col("n_grams_a"), lit(0L)).as("n_grams_a"),
        coalesce(col("n_grams_b"), lit(0L)).as("n_grams_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      // integer div, guarded: empty corpora yield 0, not a DIVIDE_BY_ZERO
      .withColumn("jaccard_permille",
        when(col("n_grams_a") + col("n_grams_b") - col("n_common") > 0,
          expr("(n_common * 1000L) div (n_grams_a + n_grams_b - n_common)"))
          .otherwise(lit(0L)))
      .withColumn("contain_a_permille",
        when(col("n_grams_a") > 0,
          expr("(n_common * 1000L) div n_grams_a")).otherwise(lit(0L)))
      .withColumn("contain_b_permille",
        when(col("n_grams_b") > 0,
          expr("(n_common * 1000L) div n_grams_b")).otherwise(lit(0L)))
  }
}
