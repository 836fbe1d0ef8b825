package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators: token counting, quality scoring, language
  * identification, document fingerprinting. All pure per-row projections
  * (higher-order Column functions, no UDF, no shuffle) — they hold
  * unchanged at any scale.
  *
  * Numeric note: every score is built from integer counts and single IEEE
  * divisions/multiplications (no transcendentals), so results are
  * bit-identical across engines — required by the DuckDB oracle gate.
  */
object TextStats {

  /** Whitespace token count (empties dropped). */
  def wsTokenCount(text: Column): Column =
    size(Dedup.tokens(text))

  /** BPE-ish subword token count: runs of letters, runs of digits, and
    * every other non-space char count as one token each — the standard
    * cheap pre-tokenizer shape. */
  def regexTokenCount(text: Column): Column =
    size(expr(s"regexp_extract_all(lower(${text.toString}), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    size(expr(s"regexp_extract_all(${text.toString}, '[.,!?;:]', 0)"))

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Quality metrics + a composite score in [0,1]:
    * 0.4·min(len,500)/500 + 0.3·stopword_ratio + 0.3·(1 − punct_ratio).
    * Long-enough, naturally-worded, low-punctuation-noise docs score high —
    * the usual pretraining-quality heuristic family. */
  def qualityMetrics(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("double")
    val nTok = wsTokenCount(t).cast("double")
    val stopHits = size(filter(Dedup.tokens(t), c => array_contains(typedLit(Stopwords), c)))
    val stopRatio = when(nTok > 0, stopHits.cast("double") / nTok).otherwise(lit(0.0))
    val punctRatio = when(nChars > 0, punctCount(t).cast("double") / nChars).otherwise(lit(0.0))
    val lenNorm = least(nChars, lit(500.0)) / lit(500.0)
    df.select(
      col(idCol),
      nChars.cast("long").as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      stopRatio.as("stopword_ratio"),
      punctRatio.as("punct_ratio"),
      (lit(0.4) * lenNorm + lit(0.3) * stopRatio + lit(0.3) * (lit(1.0) - punctRatio))
        .as("quality_score"))
  }

  /** Language profiles: marker tokens per language. A frequency-profile
    * mechanism demo — swap in real per-language n-gram profiles for
    * production use (the harness corpus shares one vocabulary across its
    * `lang` labels, so no profile can recover those labels). */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "value", "row", "fast"),
    "de" -> Seq("table", "hash", "batch", "window"),
    "es" -> Seq("data", "query", "scan", "stream"),
    "fr" -> Seq("order", "merge", "group", "line"),
    "zh" -> Seq("spark", "join", "column", "part"))

  /** Predicted language = argmax of marker-token hit count (with
    * multiplicity); ties break by profile order above (first wins). */
  def langId(text: Column): Column = {
    val toks = Dedup.tokens(text)
    val scores = LangProfiles.map { case (lang, markers) =>
      lang -> size(filter(toks, c => array_contains(typedLit(markers), c)))
    }
    // first profile with score >= all others wins (deterministic ties);
    // null text stays null instead of leaking the fold's default profile
    val maxScore = greatest(scores.map(_._2): _*)
    when(text.isNull, lit(null).cast("string")).otherwise(
      scores.foldRight(lit(LangProfiles.head._1)) { case ((lang, s), acc) =>
        when(s === maxScore, lit(lang)).otherwise(acc)
      })
  }

  // --- character-n-gram language ID (the production path) ---------------

  /** Per-language training samples: UDHR Article 1 (the standard langid
    * calibration text, public domain) plus one everyday sentence per
    * language. Profiles are derived from these at class-load — no
    * hand-tuned weights, and adding a language = adding a sample. */
  private[llm] val LangSamples: Seq[(String, String)] = Seq(
    "en" -> ("All human beings are born free and equal in dignity and rights. They are endowed " +
      "with reason and conscience and should act towards one another in a spirit of brotherhood. " +
      "The quick brown fox jumps over the lazy dog while the children watch with their friends. " +
      "Every morning the students read their books in the school library before their lessons begin. " +
      "This is a good question and we can talk about it when they come back from the city tomorrow."),
    "de" -> ("Alle Menschen sind frei und gleich an Würde und Rechten geboren. Sie sind mit " +
      "Vernunft und Gewissen begabt und sollen einander im Geist der Brüderlichkeit begegnen. " +
      "Der kleine Junge isst einen roten Apfel mit seinen Freunden im Garten des Hauses. " +
      "Jeden Morgen lesen die Schüler ihre Bücher in der Bibliothek der Schule vor dem Unterricht. " +
      "Das ist eine gute Frage und wir können morgen darüber sprechen wenn sie aus der Stadt zurückkommen."),
    "es" -> ("Todos los seres humanos nacen libres e iguales en dignidad y derechos y, dotados " +
      "como están de razón y conciencia, deben comportarse fraternalmente los unos con los otros. " +
      "El niño pequeño come una manzana roja con sus amigos en el jardín de la casa. " +
      "Cada mañana los estudiantes leen sus libros en la biblioteca de la escuela antes de las clases. " +
      "Esta es una buena pregunta y podemos hablar de ella cuando vuelvan de la ciudad mañana por la tarde."),
    "fr" -> ("Tous les êtres humains naissent libres et égaux en dignité et en droits. Ils sont " +
      "doués de raison et de conscience et doivent agir les uns envers les autres dans un esprit " +
      "de fraternité. Le petit garçon mange une pomme rouge avec ses amis dans le jardin de la maison. " +
      "Chaque matin les étudiants lisent leurs livres dans la bibliothèque de l'école avant les cours. " +
      "C'est une bonne question et nous pourrons en parler quand ils reviendront de la ville demain."),
    "it" -> ("Tutti gli esseri umani nascono liberi ed eguali in dignità e diritti. Essi sono " +
      "dotati di ragione e di coscienza e devono agire gli uni verso gli altri in spirito di " +
      "fratellanza. Il piccolo bambino mangia una mela rossa con i suoi amici nel giardino della casa. " +
      "Ogni mattina gli studenti leggono i loro libri nella biblioteca della scuola prima delle lezioni. " +
      "Questa è una buona domanda e possiamo parlarne quando torneranno dalla città domani sera per cena."),
    "pt" -> ("Todos os seres humanos nascem livres e iguais em dignidade e em direitos. Dotados " +
      "de razão e de consciência, devem agir uns para com os outros em espírito de fraternidade. " +
      "O menino pequeno come uma maçã vermelha com os seus amigos no jardim da casa. " +
      "Todas as manhãs os estudantes leem os seus livros na biblioteca da escola antes das aulas. " +
      "Esta é uma boa pergunta e podemos falar sobre ela quando eles voltarem da cidade amanhã à tarde."))

  private[llm] val NgramProfileSize = 128

  /** Cavnar–Trenkle-style profile: the sample's `n` most frequent padded
    * character trigrams, weighted n..1 by rank (count-desc, trigram-asc
    * ties — deterministic). */
  private[llm] def trigramProfile(sample: String, n: Int): Seq[(String, Int)] = {
    val s = " " + sample.toLowerCase.replaceAll("[^\\p{L}]+", " ").trim + " "
    (0 to s.length - 3).map(i => s.substring(i, i + 3))
      .groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (t, c) => (-c, t) }
      .take(n)
      .zipWithIndex.map { case ((t, _), r) => (t, n - r) }
  }

  /** Rank-weighted profiles with an integer IDF discount: a trigram
    * appearing in `df` of the `L` language profiles keeps weight
    * `w·L / df` (integer division; zeros dropped). Without the discount,
    * generic romance trigrams (" de", " la", "os ") let a high-coverage
    * profile out-score the true language on its own text — measured on
    * the held-out LlmSpec sentences (it→es without, all-correct with). */
  lazy val NgramProfiles: Seq[(String, Seq[(String, Int)])] = {
    val raw = LangSamples.map { case (lang, s) => lang -> trigramProfile(s, NgramProfileSize) }
    val df = raw.flatMap(_._2.map(_._1)).groupBy(identity).view.mapValues(_.size).toMap
    val nL = raw.size
    raw.map { case (lang, prof) =>
      lang -> prof.map { case (t, w) => (t, (w * nL) / df(t)) }.filter(_._2 > 0)
    }
  }

  /** Padded character trigrams of normalized text, as a Column. A text
    * shorter than 3 normalized chars yields one undersized token that
    * matches no profile (score 0) — same on both engines. */
  private[llm] def charTrigrams(text: Column): Column = {
    val norm = concat(lit(" "),
      trim(regexp_replace(lower(text), "[^\\p{L}]+", " ")), lit(" "))
    transform(sequence(lit(1), greatest(length(norm) - 2, lit(1))),
      i => norm.substr(i, lit(3)))
  }

  /** Character-trigram language ID: per language, the document's trigrams
    * are summed against the profile's rank weights (literal map — bounded
    * metadata, like the LSH hyperplanes); argmax wins, ties break by
    * profile order. A pure projection: no shuffle, no UDF, holds at any
    * scale. Unlike [[langId]]'s marker demo, this scores EVERY trigram of
    * the document against real per-language frequency profiles. */
  def langIdNgram(text: Column): Column = {
    val tris = charTrigrams(text)
    val scores = NgramProfiles.map { case (lang, prof) =>
      lang -> aggregate(tris, lit(0),
        (acc, t) => acc + coalesce(element_at(typedLit(prof.toMap), t), lit(0)))
    }
    val maxScore = greatest(scores.map(_._2): _*)
    // null text stays null (same contract as langId)
    when(text.isNull, lit(null).cast("string")).otherwise(
      scores.foldRight(lit(NgramProfiles.head._1)) { case ((lang, s), acc) =>
        when(s === maxScore, lit(lang)).otherwise(acc)
      })
  }

  /** Corpus vocabulary head: the k most frequent whitespace tokens.
    * The classic map-side-combinable shape — explode + hash aggregate
    * (partial per partition, one k-bounded exchange via
    * TakeOrderedAndProject) — so the shuffle carries one partial count
    * per distinct token per mapper, never the token stream. Ties break
    * on the token string, making the cut at rank k deterministic. */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(Dedup.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("token"))
      .limit(k)

  /** Corpus-wide word n-gram counts WITH multiplicity — the language-model
    * count-table primitive (KenLM-style estimation starts here). Same
    * map-side-combinable shape as [[topTokens]]: explode + hash aggregate,
    * so the shuffle carries one partial count per distinct gram per
    * mapper. The gram space grows combinatorially with n, which keeps
    * per-key counts low and the key distribution uniform — no hot keys
    * beyond genuinely viral phrases. */
  def ngramCounts(df: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n >= 1, "ngramCounts: n must be >= 1")
    val toks = Dedup.tokens(col(textCol))
    val upper = size(toks) - (n - 1)
    val grams = when(upper < 1, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), upper), i =>
        array_join(slice(toks, i, lit(n)), " ")))
    df.select(explode(grams).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("n"))
  }

  /** Model-based quality scoring (the CCNet/GPT-3-style quality-
    * classifier inference step): a linear model over HASHED bag-of-words
    * features — each token hashes into one of `weights.size` buckets,
    * the document feature is the MEAN bucket weight, and the score is
    * `sigmoid(bias + mean)`. The weights are a shipped artifact (like a
    * fasttext model), applied as a PURE PROJECTION: transform + aggregate
    * HOFs, no explode, no shuffle — the scoring pass is scan-speed at
    * any corpus size, which is the entire point of classifier-based
    * quality filtering at 100 TB. Feature hashing reuses the engine's
    * md5-prefix→BIGINT idiom (Dedup.shingleHashSets) so a DuckDB oracle
    * replays it bit-for-bit; score is rounded to 6 decimals (the ANN
    * gates' cross-engine rounding contract). An empty document scores
    * `sigmoid(bias)`. */
  def modelQualityScore(df: DataFrame, textCol: String, idCol: String,
                        weights: Seq[Double], bias: Double = 0.0,
                        threshold: Double = 0.5): DataFrame = {
    require(weights.nonEmpty, "modelQualityScore: empty weight vector")
    val d = weights.size
    val toks = Dedup.tokens(col(textCol))
    val bucket = (t: Column) =>
      (pmod(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), lit(d.toLong)) + 1)
        .cast("int")
    val mean = when(size(toks) > 0,
      aggregate(transform(toks, t => element_at(typedLit(weights), bucket(t))),
        lit(0.0), (a, v) => a + v) / size(toks))
      .otherwise(lit(0.0))
    df.select(col(idCol),
        round(lit(1.0) / (lit(1.0) + exp(lit(-1.0) * (lit(bias) + mean))), 6)
          .as("q_score"))
      .withColumn("keep", col("q_score") >= threshold)
  }

  /** Corpus composition report: per (lang, source) document counts, size
    * totals, and length percentiles-lite (min/max), with ROLLUP subtotals
    * and a grand total — the audit table every curation run publishes
    * before training. One map-side-combinable aggregation; ROLLUP adds
    * the subtotal groupings in the same shuffle (Spark expands grouping
    * sets in one exchange, not one pass per level). Sizes stay BIGINT —
    * exact, hash-stable cross-engine. */
  def corpusReport(
      docs: DataFrame, langCol: String, sourceCol: String,
      sizeCol: String): DataFrame =
    docs.rollup(col(langCol).as("lang"), col(sourceCol).as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).as("total_chars"),
        min(col(sizeCol)).as("min_chars"),
        max(col(sizeCol)).as("max_chars"))

  /** Windowed min-fingerprint (winnowing-lite): hash every `w`-char
    * window (md5 prefix standing in for a Rabin rolling hash — same
    * windowed-min structure, engine-portable), keep the minimum — a
    * locality-sensitive document fingerprint for clone detection. */
  def fingerprint(text: Column, window: Int = 8): Column = {
    val t = s"lower(${text.toString})"
    expr(
      s"""array_min(transform(
            sequence(1, greatest(length($t) - ${window - 1}, 1)),
            i -> cast(conv(substring(md5(substring($t, i, $window)), 1, 8), 16, 10) as bigint)))""")
  }
}
