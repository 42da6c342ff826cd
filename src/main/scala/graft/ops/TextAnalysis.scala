package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: term statistics, quality
  * scoring, language identification, token counting, and document
  * fingerprinting.
  *
  * Everything is built from codegen'd string/array built-ins plus staged
  * higher-order functions (see Dedup.shingleSets on staging); the only
  * shuffle in the module is the term-stats groupBy, which partial-aggregates
  * map-side. Every operator has an exact DuckDB twin for the oracle.
  */
object TextAnalysis {

  /** Corpus term statistics: per term, document frequency and total
    * occurrences. The explode → groupBy(term) shape is the canonical
    * map-side-combinable aggregation; at 100 TB the term key-space is
    * Zipf-bounded, and AQE handles the head terms' skew.
    */
  def termStats(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), Dedup.tokens(col("text")).alias("toks"))
      .select(col("doc_id"), explode(col("toks")).alias("term"))
      .groupBy(col("term"))
      .agg(
        countDistinct(col("doc_id")).alias("doc_freq"),
        count(lit(1)).alias("total_count"))

  /** Sketch-based term statistics: document frequency via HLL++
    * (`approx_count_distinct`) instead of an exact distinct. At 100 TB the
    * exact form must carry every (term, doc_id) pair through the shuffle
    * and de-duplicate them in the aggregation state; the sketch carries a
    * fixed register set per term regardless of corpus size — the standard
    * accuracy-for-memory trade (`rsd` = target relative standard
    * deviation). Engine-specific sketch → no DuckDB twin; the unit test
    * bounds its error against [[termStats]].
    *
    * Default `rsd` is Spark's 0.05 (~2^10 HLL registers per term key), not
    * 0.01 (~2^14): on a Zipf vocabulary almost every term has tiny doc
    * frequency, so at 0.01 the per-group sketch state dwarfs the exact
    * distinct it replaces and the sketch LOSES the memory trade it exists
    * for. The crossover: the sketch only beats exact on head terms whose
    * (term, doc_id) pair count exceeds the register footprint — at 0.05
    * that's ~1k pairs, at 0.01 it's ~16k. Callers profiling head terms
    * only may still pass a tighter rsd explicitly.
    */
  def termStatsSketch(docs: DataFrame, rsd: Double = 0.05): DataFrame =
    docs
      .select(col("doc_id"), Dedup.tokens(col("text")).alias("toks"))
      .select(col("doc_id"), explode(col("toks")).alias("term"))
      .groupBy(col("term"))
      .agg(
        approx_count_distinct(col("doc_id"), rsd).alias("doc_freq_approx"),
        count(lit(1)).alias("total_count"))

  /** Fully oracle-checkable audit of the term-stats sketch: per term, the
    * exact stats plus `within_tol` — whether the HLL doc-frequency
    * estimate sits within 3·rsd of the exact distinct (tiny cardinalities
    * get an absolute floor of 1). HLL++ is a deterministic,
    * partition-order-independent function of the input set, so the
    * boolean is stable; the oracle (no Spark-compatible sketch) pins it
    * to TRUE — the same bounded-error-contract upgrade as
    * Olap.dailyActiveUsersAudit. Join cost: two vocabulary-sized
    * aggregate tables, never the corpus.
    */
  def termStatsAudit(docs: DataFrame, rsd: Double = 0.05): DataFrame = {
    val approx = termStatsSketch(docs, rsd)
      .select(col("term"), col("doc_freq_approx"))
    termStats(docs)
      .join(approx, "term")
      .select(col("term"), col("doc_freq"), col("total_count"),
        (abs(col("doc_freq_approx") - col("doc_freq")) <=
          greatest(lit(1.0), col("doc_freq") * (3 * rsd))).alias("within_tol"))
  }

  /** Per-(document, term) TF-IDF: tf · ln(N / df). The corpus-level
    * weighting behind keyword extraction and lexical retrieval scoring.
    *
    * Scale shape: the explode feeds two map-side-combinable groupBys (tf
    * by (doc, term), df by term). The df side carries NO broadcast hint on
    * purpose: a clean vocabulary is Zipf-bounded and AQE will broadcast it
    * from its measured size, but a web corpus's distinct-term table
    * (typos, numbers, unicode junk) can run to billions of rows — forcing
    * the hint would OOM the driver exactly where a shuffle join is the
    * right plan. Only the 1-row corpus total is hint-broadcast.
    */
  def tfIdf(docs: DataFrame): DataFrame = {
    val ex = docs.select(col("doc_id"),
      explode(Dedup.tokens(col("text"))).alias("term"))
    val tf = ex.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("int").alias("tf"))
    val df = ex.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).alias("df"))
    val total = docs.agg(count(lit(1)).alias("n_docs"))
    tf.join(df, "term")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("term"), col("tf"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
          .alias("tfidf"))
  }

  /** Per-document KEYWORDS: the top-`k` TF-IDF terms of each doc — the
    * extraction face of [[tfIdf]] (tagging, retrieval snippets, topic
    * drift eyeballing). Deterministic (tfidf desc, term asc) rank; the
    * `rnk <= k` predicate pushes into the window exec as WindowGroupLimit,
    * so each map task keeps a k-heap per doc and the exchange carries
    * ≤ k·partitions rows per doc — never the full (doc, term) table twice.
    */
  def keywords(docs: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tfIdf(docs)
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("doc_id"), col("rnk").cast("int").alias("rnk"),
        col("term"), col("tfidf"))
  }

  /** Unigram language-model fluency score — the "perplexity-ish" quality
    * signal: each document's per-token mean log10 probability under the
    * corpus's OWN add-one-smoothed unigram distribution,
    * `avg over tokens w of log10((count(w)+1) / (total+|V|))`. Gibberish
    * and boilerplate-free natural text separate cleanly on this axis, which
    * is why it is a standard pretraining-corpus filter.
    *
    * Scale shape: one explode feeding a map-side-combinable term-count
    * groupBy, an equi-join of the token stream back to that vocabulary
    * (Zipf-bounded; no broadcast hint — the tfIdf reasoning), and a per-doc
    * average. The two corpus-wide scalars (total, |V|) ride a 1-row
    * broadcast. Empty/NULL documents keep their row: null score, 0 tokens.
    */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val ex = docs.select(col("doc_id"),
      explode(Dedup.tokens(col("text"))).alias("term"))
    val freq = ex.groupBy(col("term")).agg(count(lit(1)).alias("tc"))
    val consts = freq.agg(
      sum(col("tc")).alias("total"), count(lit(1)).alias("vocab"))
    val scored = ex.join(freq, "term")
      .crossJoin(broadcast(consts))
      .groupBy(col("doc_id"))
      .agg(
        // 6-dp rounding absorbs double-summation order across engines.
        round(avg(log10((col("tc") + 1).cast("double") /
          (col("total") + col("vocab")))), 6).alias("avg_logprob"),
        count(lit(1)).cast("int").alias("n_tokens"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("avg_logprob"),
        coalesce(col("n_tokens"), lit(0)).alias("n_tokens"))
  }

  /** BIGRAM language-model fluency score — the sharper sibling of
    * [[unigramLogProb]] and the shape of the KenLM-perplexity filter
    * pretraining pipelines actually rank by (CCNet, Wenzek et al. 2020,
    * arXiv:1911.00359 §3 scores documents with an n-gram LM; add-one
    * smoothing stands in for Kneser-Ney so the arithmetic stays exactly
    * SQL-expressible). Per document: the mean log10 of the add-one-smoothed
    * conditional probability of each adjacent token pair under the corpus's
    * OWN counts, `avg over (w1,w2) of log10((c(w1,w2)+1) / (c(w1)+|V|))`.
    * Word salad scores far below fluent text because its specific bigrams
    * never recur, while a unigram model cannot tell the two apart — exactly
    * the gap this signal exists to close.
    *
    * Scale shape: bigrams materialize map-side from the token array (pure
    * projection — the pair stream is the token stream shifted one, never a
    * self-join); they feed two map-side-combinable groupBys (pair counts;
    * context counts from the unigram stream) and join back by pair / by
    * context word. Both count tables are Zipf-bounded vocabularies, and
    * neither carries a broadcast hint — the [[tfIdf]] reasoning: AQE
    * broadcasts them from measured size on a clean corpus, while a web
    * corpus's pair table can reach billions of rows and a forced hint would
    * OOM the driver where a shuffle join is the right plan. Only the 1-row
    * vocabulary scalar rides an explicit broadcast. Documents with < 2
    * tokens keep their row: null score, 0 bigrams.
    */
  def bigramLogProb(docs: DataFrame): DataFrame = {
    val t = Dedup.tokens(col("text"))
    val pairStruct = transform(sequence(lit(1), size(col("t")) - 1),
      i => struct(
        element_at(col("t"), i).alias("w1"),
        element_at(col("t"), i + 1).alias("w2")))
    val pairs = docs
      .select(col("doc_id"), t.alias("t"))
      .where(size(col("t")) >= 2)
      .select(col("doc_id"), explode(pairStruct).alias("bg"))
      .select(col("doc_id"), col("bg.w1").alias("w1"), col("bg.w2").alias("w2"))
    val uni = docs.select(explode(t).alias("term"))
      .groupBy(col("term")).agg(count(lit(1)).alias("c1"))
    val bi = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).alias("c2"))
    val consts = uni.agg(count(lit(1)).alias("vocab"))
    val scored = pairs
      .join(bi, Seq("w1", "w2"))
      .join(uni.select(col("term").alias("w1"), col("c1")), Seq("w1"))
      .crossJoin(broadcast(consts))
      .groupBy(col("doc_id"))
      .agg(
        // 6-dp rounding absorbs double-summation order across engines.
        round(avg(log10((col("c2") + 1).cast("double") /
          (col("c1") + col("vocab")))), 6).alias("avg_logprob"),
        count(lit(1)).cast("int").alias("n_bigrams"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("avg_logprob"),
        coalesce(col("n_bigrams"), lit(0)).alias("n_bigrams"))
  }

  /** Gopher-style repetition signal: the share of a document's word
    * bigrams taken by its single most frequent bigram. Boilerplate, spam,
    * and degenerate generations repeat — natural text does not — which
    * makes this ratio a standard pretraining quality rule (Rae et al.,
    * Gopher, analyzes exactly this duplicate-n-gram family). Shape:
    * non-distinct bigrams explode into a two-level map-side-combinable
    * aggregation keyed by (doc, gram) then doc; the doc_id in every key
    * keeps the shuffle skew-free regardless of corpus-wide hot phrases.
    * Documents with no bigram (< 2 tokens) keep their row with a 0 ratio.
    */
  def repetition(docs: DataFrame): DataFrame = {
    val perGram = docs
      .select(col("doc_id"), Dedup.bigrams(col("text")).alias("grams"))
      .select(col("doc_id"), explode(col("grams")).alias("g"))
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).alias("c"))
    val perDoc = perGram.groupBy(col("doc_id"))
      .agg(sum(col("c")).alias("n_bigrams"), max(col("c")).alias("top_n"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).alias("n_bigrams"),
        coalesce(col("top_n"), lit(0L)).alias("top_bigram_n"),
        when(col("n_bigrams").isNotNull,
          round(col("top_n").cast("double") / col("n_bigrams"), 6))
          .otherwise(0.0).alias("top_bigram_share"))
  }

  /** A small function-word inventory per language — enough signal for a
    * corpus-curation language gate; swap in full profiles for production.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"),
    "de" -> Seq("der", "die", "und", "das", "ein", "ist", "nicht"))

  /** Language-ID heuristic: per language, the fraction of tokens that are
    * that language's function words; predicted = argmax (ties resolved by
    * the declaration order above, 'unknown' when nothing matches).
    */
  def langId(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"),
      Dedup.tokens(col("text")).alias("toks"))
    val scored = base.select(
      (col("doc_id") +: LangMarkers.map { case (lang, words) =>
        (graft.functions.CountInSet.countInSet(col("toks"), words)
          .cast("double") / greatest(size(col("toks")), lit(1)))
          .alias(s"${lang}_score")
      }): _*)
    val best = LangMarkers.map { case (lang, _) => col(s"${lang}_score") }
      .reduce(greatest(_, _))
    val predicted = LangMarkers.foldRight(lit("unknown")) {
      case ((lang, _), rest) =>
        when(col(s"${lang}_score") === best && best > 0, lit(lang))
          .otherwise(rest)
    }
    scored.select(
      (col("doc_id") +: predicted.alias("predicted_lang") +:
        LangMarkers.map { case (lang, _) =>
          round(col(s"${lang}_score"), 6).alias(s"${lang}_score")
        }): _*)
  }

  /** Zipf power-law fit over the corpus term distribution: least-squares
    * slope / intercept / R² of log10(count) against log10(rank) for the
    * top-N terms — the classic corpus-health diagnostic (natural language
    * sits near slope −1; a slope collapsing toward 0 means boilerplate
    * flooding, a cliff past the head means template text; Zipf 1949, and
    * standard in every corpus-statistics chapter since).
    *
    * Scale shape: the corpus-scale stage is the map-side-combined term
    * count (one [[termStats]]-shaped groupBy); the fit itself runs on a
    * TakeOrdered top-N (distributed k-heaps, no global sort) and one
    * window + aggregate over those ≤ topN rows. Closed-form regression
    * from the five sums, 6-dp rounded — log10 ulps across engines vanish
    * in the rounding, the [[unigramLogProb]] precedent. Degenerate inputs
    * (fewer than 2 distinct ranks) emit null fit columns on both engines.
    */
  def zipfFit(docs: DataFrame, topN: Int = 1000): DataFrame = {
    val top = docs
      .select(explode(Dedup.tokens(col("text"))).alias("term"))
      .groupBy(col("term")).agg(count(lit(1)).alias("c"))
      .orderBy(col("c").desc, col("term")).limit(topN)
    // Window over the ≤topN-row frame only — bounded, like revenue_share.
    val ranked = top.withColumn("r",
      row_number().over(Window.orderBy(col("c").desc, col("term"))))
    val pts = ranked.select(
      log10(col("r")).alias("x"), log10(col("c")).alias("y"))
    val s = pts.agg(
      count(lit(1)).alias("n"),
      sum(col("x")).alias("sx"), sum(col("y")).alias("sy"),
      sum(col("x") * col("x")).alias("sxx"),
      sum(col("x") * col("y")).alias("sxy"),
      sum(col("y") * col("y")).alias("syy"))
    val det = col("n") * col("sxx") - col("sx") * col("sx")
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val dety = col("n") * col("syy") - col("sy") * col("sy")
    s.select(
      col("n").cast("int").alias("n_terms"),
      when(det > 0, round(num / det, 6)).alias("slope"),
      when(det > 0, round((col("sy") - (num / det) * col("sx")) / col("n"), 6))
        .alias("intercept"),
      when(det > 0 && dety > 0, round((num * num) / (det * dety), 6))
        .alias("r2"))
  }

  /** Tokenizer fertility report per predicted language: document counts,
    * whitespace-word and BPE-ish token totals, fertility (subword tokens
    * per word) and chars per subword token — the table a tokenizer review
    * reads per language before committing a vocab (fertility ≫ 1 for a
    * language means its text costs disproportionate context budget; cf.
    * the multilingual-tokenizer analyses around XLM-R / BLOOM).
    *
    * Scale shape: language scores, word and subword counts all compute in
    * ONE scan projection (the langId/tokenCounts signals inlined — no
    * per-doc join), then a languages-sized groupBy. Ratios derive from the
    * grouped sums, 6-dp rounded.
    */
  def fertilityByLang(docs: DataFrame): DataFrame = {
    val bpeish = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
    val base = docs.select(col("doc_id"), col("text"),
      Dedup.tokens(col("text")).alias("toks"))
    val scored = base.select(
      (Seq(
        size(col("toks")).alias("ws_tokens"),
        coalesce(regexp_count(col("text"), lit(bpeish)), lit(0))
          .alias("bpeish_tokens"),
        coalesce(length(col("text")), lit(0)).alias("n_chars")) ++
        LangMarkers.map { case (lang, words) =>
          (graft.functions.CountInSet.countInSet(col("toks"), words)
            .cast("double") / greatest(size(col("toks")), lit(1)))
            .alias(s"${lang}_score")
        }): _*)
    val best = LangMarkers.map { case (lang, _) => col(s"${lang}_score") }
      .reduce(greatest(_, _))
    val predicted = LangMarkers.foldRight(lit("unknown")) {
      case ((lang, _), rest) =>
        when(col(s"${lang}_score") === best && best > 0, lit(lang))
          .otherwise(rest)
    }
    scored
      .select(predicted.alias("lang"), col("ws_tokens"),
        col("bpeish_tokens"), col("n_chars"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).alias("n_docs"),
        sum(col("ws_tokens")).alias("total_words"),
        sum(col("bpeish_tokens")).alias("total_subwords"),
        sum(col("n_chars")).alias("total_chars"))
      .select(col("lang"), col("n_docs"), col("total_words"),
        col("total_subwords"),
        round(col("total_subwords").cast("double") /
          greatest(col("total_words"), lit(1L)), 6).alias("fertility"),
        round(col("total_chars").cast("double") /
          greatest(col("total_subwords"), lit(1L)), 6)
          .alias("chars_per_subword"))
  }

  /** Characteristic character trigrams per language — the classic n-gram
    * language-ID profile, tiny edition.
    */
  val TrigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "ing", "ion", "and", "ent", "he ", " th"),
    "fr" -> Seq("les", "ent", "des", "que", "ais", "le ", " de"),
    "de" -> Seq("der", "ein", "ich", "sch", "und", "en ", " di"))

  /** Character-trigram language ID: per language, the fraction of the
    * document's char trigrams found in that language's profile; predicted =
    * argmax, 'unknown' when nothing matches. Complements [[langId]]'s
    * function-word gate — trigrams survive domains where function words are
    * rare (code, tables, short strings).
    */
  def charNgramLangId(docs: DataFrame): DataFrame = {
    // Fused zero-allocation kernel (graft.functions.NgramProfileCounts):
    // one pass over the text yields the total trigram count and each
    // profile's hits — no materialized trigram array (2 KB of text ≈ 2000
    // short-lived strings, pure GC pressure) and no per-position substring.
    // EvalOnce: the argmax CaseWhen below references the score columns from
    // every branch, and CollapseProject would inline the kernel into each
    // branch — codegen CSE does not reach into conditionals (the same
    // duplication the parse chain hits, see EvalOnce). The barrier pins ONE
    // kernel evaluation per row.
    val counts = docs.select(col("doc_id"),
      EvalOnce(graft.functions.NgramProfileCounts.ngramProfileCounts(
        lower(col("text")), 3, TrigramProfiles.map(_._2))).alias("pc"))
    val scored = counts.select(
      (col("doc_id") +: TrigramProfiles.zipWithIndex.map {
        case ((lang, _), i) =>
          (element_at(col("pc"), i + 2).cast("double") /
            greatest(element_at(col("pc"), 1), lit(1)))
            .alias(s"${lang}_tg")
      }): _*)
    val best = TrigramProfiles.map { case (lang, _) => col(s"${lang}_tg") }
      .reduce(greatest(_, _))
    val predicted = TrigramProfiles.foldRight(lit("unknown")) {
      case ((lang, _), rest) =>
        when(col(s"${lang}_tg") === best && best > 0, lit(lang))
          .otherwise(rest)
    }
    scored.select(
      (col("doc_id") +: predicted.alias("predicted_lang") +:
        TrigramProfiles.map { case (lang, _) =>
          round(col(s"${lang}_tg"), 6).alias(s"${lang}_score")
        }): _*)
  }

  /** Quality signals per document: length, token counts, mean token length,
    * stopword ratio, punctuation ratio — the standard cheap filters a
    * training-data pipeline gates on before expensive steps.
    */
  def quality(docs: DataFrame): DataFrame = {
    val stopwords = LangMarkers.flatMap(_._2)
    // Explicit char class (not [[:punct:]]) so Spark and DuckDB agree.
    val punct = "[.,!?;:]"
    docs
      .select(col("doc_id"), col("text"), Dedup.tokens(col("text")).alias("toks"))
      .select(
        col("doc_id"),
        length(col("text")).alias("n_chars"),
        size(col("toks")).alias("n_tokens"),
        round(
          aggregate(col("toks"), lit(0L), (a, w) => a + length(w))
            .cast("double") / greatest(size(col("toks")), lit(1)), 6)
          .alias("mean_token_len"),
        round(
          graft.functions.CountInSet.countInSet(col("toks"), stopwords)
            .cast("double") /
            greatest(size(col("toks")), lit(1)), 6)
          .alias("stopword_ratio"),
        round(
          (length(col("text")) -
            length(regexp_replace(col("text"), punct, ""))).cast("double") /
            greatest(length(col("text")), lit(1)), 6)
          .alias("punct_ratio"))
  }

  /** Token counting, two ways: whitespace words and a BPE-ish segmentation
    * (letter runs / digit runs / single other-symbols) — the cheap proxy
    * for "how many tokens will the tokenizer emit".
    */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val bpeish = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
    docs.select(
      col("doc_id"),
      size(Dedup.tokens(col("text"))).alias("ws_tokens"),
      regexp_count(col("text"), lit(bpeish)).alias("bpeish_tokens"),
      round(length(col("text")).cast("double") /
        greatest(size(Dedup.tokens(col("text"))), lit(1)), 6)
        .alias("chars_per_token"))
  }

  /** The corpus-curation gate: a first-match-wins rejection chain over the
    * quality signals (the text-domain sibling of the alert CaseWhen).
    * Emits every document with its verdict and the first failing rule, so
    * downstream can both filter (`WHERE passed`) and audit rejection
    * reasons at scale — one pass, no shuffle.
    */
  /** Default gate thresholds — single source of truth for both the Column
    * chain below and the DuckDB oracle twins (SparkEntry interpolates
    * these, so a threshold change cannot silently split the engines).
    */
  val GateMinChars = 64
  val GateMinTokens = 10
  val GateMaxStopwordRatio = 0.4
  val GateMaxPunctRatio = 0.1
  val GateMaxCharsPerToken = 12.0

  def qualityGate(
      docs: DataFrame,
      minChars: Int = GateMinChars,
      minTokens: Int = GateMinTokens,
      maxStopwordRatio: Double = GateMaxStopwordRatio,
      maxPunctRatio: Double = GateMaxPunctRatio,
      maxCharsPerToken: Double = GateMaxCharsPerToken): DataFrame = {
    val q = quality(docs)
    val cpt = q("n_chars").cast("double") / greatest(q("n_tokens"), lit(1))
    val reason =
      when(q("n_chars") < minChars, "too_short")
        .when(q("n_tokens") < minTokens, "too_few_tokens")
        .when(q("stopword_ratio") > maxStopwordRatio, "stopword_heavy")
        .when(q("punct_ratio") > maxPunctRatio, "punct_heavy")
        .when(cpt > maxCharsPerToken, "tokens_too_long")
        .otherwise(lit(null))
    q.select(
      col("doc_id"),
      reason.isNull.alias("passed"),
      reason.alias("reject_reason"))
  }

  /** Quality-classifier scoring dimension and weight table — the
    * fastText-style hashing trick (Joulin et al. 2016, arXiv:1607.01759):
    * each unigram/bigram hashes to one of [[QualityScoreDim]] buckets and
    * the model is one INTEGER weight per bucket, so the per-document sum
    * is exact under any partitioning. In production the weights come from
    * training; this fixed deterministic table (every residue class of 17,
    * centered on 0) keeps the operator oracle-checkable — swapping in
    * trained weights changes only this Seq. Shared verbatim with the
    * DuckDB twin via the same modular formula.
    */
  val QualityScoreDim = 64
  val QualityScoreWeights: Seq[Int] =
    (0 until QualityScoreDim).map(j => ((j.toLong * 1315423911L) % 17 - 8).toInt)

  /** fastText-style quality score per document: unigram + word-bigram
    * features → 60-bit hash → bucket weight → mean → logistic. The whole
    * chain (tokens, bigrams, hashes, weighted sum) is native codegen'd
    * kernels ([[graft.functions.Bigrams]], [[graft.functions.HashArray]],
    * [[graft.functions.BucketWeightSum]]) in ONE whole-stage-codegen map —
    * no explode, no shuffle, no driver state; at 100 TB this scores at
    * scan speed. `raw_score` is an exact long (bit-checkable); the
    * logistic output is rounded once at the end.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = Dedup.tokens(col("text"))
    docs
      .select(col("doc_id"),
        concat(toks, Dedup.bigramsOf(toks)).alias("grams"))
      .select(col("doc_id"), col("grams"),
        graft.functions.BucketWeightSum.bucketWeightSum(
          Dedup.hashArray60(col("grams")), QualityScoreWeights)
          .alias("raw_score"))
      .select(
        col("doc_id"),
        size(col("grams")).alias("n_grams"),
        col("raw_score"),
        round(lit(1.0) / (lit(1.0) +
          exp(-(col("raw_score").cast("double") /
            (greatest(size(col("grams")), lit(1)) * 8.0)))), 6)
          .alias("quality_score"))
  }

  /** Every curation signal — gate verdict, predicted language, token
    * counts — in ONE staged projection over a single corpus scan: the
    * fused form of [[qualityGate]] + [[langId]] + [[tokenCounts]] for
    * pipelines that need all three (a 100 TB curate must not read and
    * tokenize the corpus once per signal, nor shuffle three doc_id
    * joins). Signal-for-signal identical to the standalone ops — the
    * same expressions over the same staged token column.
    *
    * `passThrough` names input columns carried verbatim to the output
    * (appended after the signal columns) — the fused-scan hook composites
    * like [[graft.ops.Curation.curatePipeline]] use to keep source/flag
    * metadata on the SAME scan instead of joining it back by doc_id.
    * Names must not collide with the signal outputs.
    */
  def curationSignals(
      docs: DataFrame,
      minChars: Int = GateMinChars,
      minTokens: Int = GateMinTokens,
      maxStopwordRatio: Double = GateMaxStopwordRatio,
      maxPunctRatio: Double = GateMaxPunctRatio,
      maxCharsPerToken: Double = GateMaxCharsPerToken,
      passThrough: Seq[String] = Nil): DataFrame = {
    val signalOut = Set("doc_id", "passed", "reject_reason",
      "predicted_lang", "ws_tokens", "bpeish_tokens",
      // staged intermediates — a collision here breaks the inner select
      "text", "toks", "n_chars", "n_tokens", "stopword_ratio",
      "punct_ratio") ++ LangMarkers.map { case (l, _) => s"${l}_score" }
    val clash = passThrough.filter(signalOut)
    require(clash.isEmpty,
      s"curationSignals passThrough collides with signal outputs: " +
        s"${clash.mkString(", ")} — rename the input column(s) first")
    val stopwords = LangMarkers.flatMap(_._2)
    val punct = "[.,!?;:]"
    val bpeish = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
    val carry = passThrough.map(col)
    val nToksDen = greatest(size(col("toks")), lit(1))
    val scored = docs
      .select(Seq(col("doc_id"), col("text"),
        Dedup.tokens(col("text")).alias("toks")) ++ carry: _*)
      .select(Seq(
        col("doc_id"),
        length(col("text")).alias("n_chars"),
        size(col("toks")).alias("n_tokens"),
        round(
          graft.functions.CountInSet.countInSet(col("toks"), stopwords)
            .cast("double") / nToksDen, 6).alias("stopword_ratio"),
        round(
          (length(col("text")) -
            length(regexp_replace(col("text"), punct, ""))).cast("double") /
            greatest(length(col("text")), lit(1)), 6).alias("punct_ratio"),
        regexp_count(col("text"), lit(bpeish)).alias("bpeish_tokens")) ++
        LangMarkers.map { case (lang, words) =>
          (graft.functions.CountInSet.countInSet(col("toks"), words)
            .cast("double") / nToksDen).alias(s"${lang}_score")
        } ++ carry: _*)
    val cpt = col("n_chars").cast("double") / greatest(col("n_tokens"), lit(1))
    val reason =
      when(col("n_chars") < minChars, "too_short")
        .when(col("n_tokens") < minTokens, "too_few_tokens")
        .when(col("stopword_ratio") > maxStopwordRatio, "stopword_heavy")
        .when(col("punct_ratio") > maxPunctRatio, "punct_heavy")
        .when(cpt > maxCharsPerToken, "tokens_too_long")
        .otherwise(lit(null))
    val best = LangMarkers.map { case (lang, _) => col(s"${lang}_score") }
      .reduce(greatest(_, _))
    val predicted = LangMarkers.foldRight(lit("unknown")) {
      case ((lang, _), rest) =>
        when(col(s"${lang}_score") === best && best > 0, lit(lang))
          .otherwise(rest)
    }
    scored.select(Seq(
      col("doc_id"),
      reason.isNull.alias("passed"),
      reason.alias("reject_reason"),
      predicted.alias("predicted_lang"),
      col("n_tokens").alias("ws_tokens"),
      col("bpeish_tokens")) ++ carry: _*)
  }

  /** Classifier-AGREEMENT matrix between the two language identifiers:
    * function-word [[langId]] vs character-trigram [[charNgramLangId]]
    * votes cross-tabulated — the audit that finds where two cheap
    * classifiers disagree (those docs are exactly where a production
    * pipeline escalates to a real model). One scan per featurization
    * (they read different views of the text), a doc_id join, then a
    * languages²-bounded cell table with shares off the 1-row total.
    */
  def langAgreement(docs: DataFrame): DataFrame = {
    val a = langId(docs)
      .select(col("doc_id"), col("predicted_lang").alias("word_lang"))
    val b = charNgramLangId(docs)
      .select(col("doc_id"), col("predicted_lang").alias("trigram_lang"))
    val cells = Materialize(a.join(b, "doc_id")
      .groupBy(col("word_lang"), col("trigram_lang"))
      .agg(count(lit(1)).alias("n_docs")))
    val total = cells.agg(sum(col("n_docs")).alias("t"))
    cells.crossJoin(broadcast(total))
      .select(col("word_lang"), col("trigram_lang"), col("n_docs"),
        round(col("n_docs").cast("double") / greatest(col("t"), lit(1L)), 6)
          .alias("share"),
        (col("word_lang") === col("trigram_lang")).alias("agree"))
  }

  /** Lexical diversity per document: type-token ratio (distinct words /
    * words) and Guiraud's root TTR (types / √tokens — the length-
    * normalized form, since raw TTR shrinks mechanically with length) —
    * the cheap "word salad vs varied prose" diversity signal next to
    * [[repetition]]. Pure zero-shuffle projection.
    */
  def typeTokenRatio(docs: DataFrame): DataFrame = {
    val t = Dedup.tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(t).alias("n_tokens"),
      size(array_distinct(t)).alias("n_types"),
      round(size(array_distinct(t)).cast("double") /
        greatest(size(t), lit(1)), 6).alias("ttr"),
      round(size(array_distinct(t)).cast("double") /
        sqrt(greatest(size(t), lit(1)).cast("double")), 6).alias("root_ttr"))
  }

  /** Per-(language, verdict) QUALITY REPORT: how many docs each gate
    * verdict claims in each predicted language, with token totals and
    * the share within the language — the rejection-reason histogram a
    * curation review reads before touching thresholds. ONE corpus scan
    * (the fused [[curationSignals]] projection) → a languages×verdicts
    * bounded groupBy → a window over that tiny cell table.
    */
  def qualityReport(docs: DataFrame): DataFrame = {
    val cells = curationSignals(docs)
      .groupBy(col("predicted_lang"),
        coalesce(col("reject_reason"), lit("passed")).alias("verdict"))
      .agg(count(lit(1)).alias("n_docs"),
        sum(col("ws_tokens").cast("long")).alias("n_tokens"))
    val w = Window.partitionBy(col("predicted_lang"))
    cells.select(col("predicted_lang"), col("verdict"),
      col("n_docs"), col("n_tokens"),
      round(col("n_docs").cast("double") /
        sum(col("n_docs")).over(w), 6).alias("lang_share"))
  }

  /** Per-language EXACT quality percentiles — the distribution report a
    * curation run reads before picking gate thresholds (where does the
    * p99 of stopword density sit for German?). Exact `percentile` (sorted
    * + linear interpolation, the same definition DuckDB's `quantile_cont`
    * uses, so the twin matches) rather than `approx_percentile`: strata
    * counts are per-language, small enough to sort; flip to the approx
    * form at extreme cardinality — same plan shape, no oracle.
    */
  def qualityPercentiles(
      docs: DataFrame,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame =
    percentileReport(docs, ps,
      c => s"percentile($c, array(${ps.mkString(", ")}))")

  /** [[qualityPercentiles]] with the Greenwald-Khanna sketch
    * (`approx_percentile`) — the extreme-cardinality path: bounded memory
    * per stratum instead of a sort, the same report schema. Sketch
    * internals are engine-specific, so no DuckDB twin exists; the unit
    * test bounds its error against the exact form.
    */
  def qualityPercentilesApprox(
      docs: DataFrame,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99),
      accuracy: Int = 10000): DataFrame =
    percentileReport(docs, ps,
      c => s"approx_percentile($c, array(${ps.mkString(", ")}), $accuracy)")

  /** Shared body: ONE staged scan computes language + the quality ratios
    * together (the curationSignals discipline: never read and tokenize
    * the corpus once per signal, never join signals on doc_id) — the only
    * shuffle is the per-language aggregation itself, with the percentile
    * estimator pluggable.
    */
  /** Per-doc quality signals with the predicted language — ONE staged
    * scan shared by the percentile reports and their audit (the
    * curationSignals discipline: never tokenize the corpus once per
    * signal).
    */
  private def scoredQuality(docs: DataFrame): DataFrame = {
    val stopwords = LangMarkers.flatMap(_._2)
    val punct = "[.,!?;:]"
    val nToksDen = greatest(size(col("toks")), lit(1))
    val scored = docs
      .select(col("doc_id"), col("text"),
        Dedup.tokens(col("text")).alias("toks"))
      .select(Seq(
        size(col("toks")).alias("n_tokens"),
        round(
          graft.functions.CountInSet.countInSet(col("toks"), stopwords)
            .cast("double") / nToksDen, 6).alias("stopword_ratio"),
        round(
          (length(col("text")) -
            length(regexp_replace(col("text"), punct, ""))).cast("double") /
            greatest(length(col("text")), lit(1)), 6).alias("punct_ratio")) ++
        LangMarkers.map { case (lang, words) =>
          (graft.functions.CountInSet.countInSet(col("toks"), words)
            .cast("double") / nToksDen).alias(s"${lang}_score")
        }: _*)
    val best = LangMarkers.map { case (lang, _) => col(s"${lang}_score") }
      .reduce(greatest(_, _))
    val predicted = LangMarkers.foldRight(lit("unknown")) {
      case ((lang, _), rest) =>
        when(col(s"${lang}_score") === best && best > 0, lit(lang))
          .otherwise(rest)
    }
    scored.select(predicted.alias("predicted_lang"), col("n_tokens"),
      col("stopword_ratio"), col("punct_ratio"))
  }

  private def percentileReport(
      docs: DataFrame,
      ps: Seq[Double],
      pctSql: String => String): DataFrame = {
    val pcols = Seq("n_tokens", "stopword_ratio", "punct_ratio").flatMap { m =>
      ps.zipWithIndex.map { case (p, i) =>
        round(element_at(expr(pctSql(m)), i + 1).cast("double"), 6)
          .alias(s"p${(p * 100).toInt}_$m")
      }
    }
    scoredQuality(docs)
      .groupBy(col("predicted_lang"))
      .agg(count(lit(1)).alias("n_docs"), pcols: _*)
  }

  /** Oracle-checkable audit of the GK percentile sketch, with a RANK-space
    * bound (the space the sketch actually guarantees): per language, the
    * exact n_tokens percentiles plus one `pXX_ok` boolean per percentile
    * asserting the approx value lies between the exact order statistics
    * `±(⌈n/accuracy⌉ + 1)` ranks around the target — GK's rank error is
    * ≤ n/accuracy, and the extra rank absorbs the floor/ceil slack between
    * rank-definition conventions. Bounds come from the per-language sorted
    * value array, so no foldable-fraction gymnastics; that array is
    * exactly as affordable as the exact percentile (which also sorts per
    * group) — an audit-scale cost, not a default. The sketch is a
    * deterministic fold of the input, so the booleans are stable and the
    * oracle pins them TRUE alongside the exact percentile values.
    */
  def qualityPercentilesAudit(
      docs: DataFrame,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99),
      accuracy: Int = 10000): DataFrame = {
    val agg = scoredQuality(docs)
      .groupBy(col("predicted_lang"))
      .agg(
        count(lit(1)).alias("n_docs"),
        sort_array(collect_list(col("n_tokens"))).alias("arr"),
        expr(s"percentile(n_tokens, array(${ps.mkString(", ")}))").alias("ex"),
        expr(s"approx_percentile(n_tokens, array(${ps.mkString(", ")}), " +
          s"$accuracy)").alias("ap"))
    val slack = ceil(col("n_docs").cast("double") / accuracy).cast("long") + 1
    val out = ps.zipWithIndex.flatMap { case (p, i) =>
      // 1-based floor rank of the interpolation target p·(n−1).
      val target = (lit(p) * (col("n_docs") - 1)).cast("long") + 1
      val lo = greatest(lit(1L), target - slack).cast("int")
      val hi = least(col("n_docs"), target + 1 + slack).cast("int")
      val ap = element_at(col("ap"), i + 1).cast("double")
      Seq(
        round(element_at(col("ex"), i + 1).cast("double"), 6)
          .alias(s"p${(p * 100).toInt}_n_tokens"),
        (ap >= element_at(col("arr"), lo) && ap <= element_at(col("arr"), hi))
          .alias(s"p${(p * 100).toInt}_ok"))
    }
    agg.select(col("predicted_lang") +: col("n_docs") +: out: _*)
  }

  /** PII patterns shared verbatim with the oracle SQL — written to behave
    * identically under Java regex (Spark) and RE2 (DuckDB): no lookaround,
    * no backreferences, greedy quantifiers only. The IPv4 pattern is a
    * structural match (dotted quads), not a range check — redaction wants
    * recall, and "999.1.1.1" leaking is worse than over-masking it.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  /** 8+ chars of digits / spaces / hyphens, digit-anchored both ends —
    * phone numbers, account ids, card-ish runs.
    */
  val DigitRunPattern = "[0-9][0-9 -]{6,}[0-9]"

  /** Per-language heavy-hitter terms via the native Misra-Gries aggregate
    * ([[graft.functions.MisraGries]]): bounded counter state per group
    * where [[termStats]]' exact distinct table is corpus-sized. Output is
    * one row per (lang, rank ≤ k). Counts are ε-bounded lower estimates
    * (merge-order dependent within `true − n/(cap+1) ≤ est ≤ true`) — the
    * driver records rows-only; the MisraGriesSpec pins the bounds.
    *
    * The sketch runs at `capacity` (default 4k) counters and the output
    * truncates to the top k: MG merges can kill tied counters together, so
    * a capacity-k sketch may surface FEWER than k survivors depending on
    * partitioning — the headroom keeps ≥ k survivors under any realistic
    * merge order over natural-language (Zipf) data, making the emitted row
    * count (langs × min(k, distinct)) stable while estimates stay
    * merge-order dependent within the ε band. [[heavyTermsExact]] is the
    * oracle-checkable twin.
    */
  def heavyTerms(docs: DataFrame, k: Int = 10, capacity: Int = 40): DataFrame = {
    require(capacity >= k, s"sketch capacity $capacity must be ≥ k=$k")
    docs
      .select(col("lang"), explode(Dedup.tokens(col("text"))).alias("term"))
      .groupBy(col("lang"))
      .agg(graft.functions.MisraGries.topItems(col("term"), capacity)
        .alias("top"))
      .select(col("lang"), posexplode(slice(col("top"), 1, k)))
      .select(col("lang"), (col("pos") + 1).cast("int").alias("rank"),
        col("col.item").alias("term"), col("col.count_est"))
  }

  /** Exact per-language top-k terms — [[heavyTerms]]' oracle-checkable
    * twin: a (lang, term) count aggregate then a rank-k window, ties broken
    * by term so both engines agree bit-for-bit. The count table is
    * vocabulary-sized (Zipf-bounded, the [[termStats]] argument), so the
    * exact form is affordable wherever termStats is; the MG sketch remains
    * the extreme-cardinality path (billions of distinct tokens, bounded
    * state). The rank filter compiles to WindowGroupLimit: per-partition
    * top-k pruning before the window shuffle.
    */
  def heavyTermsExact(docs: DataFrame, k: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("term_count").desc, col("term"))
    docs
      .select(col("lang"), explode(Dedup.tokens(col("text"))).alias("term"))
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).alias("term_count"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("lang"), col("rank").cast("int").alias("rank"),
        col("term"), col("term_count"))
  }

  /** The fixed point-query list for the Count-Min demos: terms a corpus
    * monitor would watch (all present in every language of the synthetic
    * corpus, so the audit grid is dense). Fixed at plan time — the output
    * size is a constant, independent of the corpus. */
  val CmsWatchTerms: Seq[String] =
    Seq("hash", "join", "table", "row", "column", "query", "window", "scan")

  /** Per-language Count-Min frequency estimates for a fixed watch list —
    * the "how often did THESE terms occur" monitor that keeps
    * `depth × width` longs of state per language regardless of vocabulary
    * size, where the exact answer ([[termCountsExact]]) must aggregate the
    * full (lang, term) vocabulary first. The estimates are deterministic
    * (CMS state is a pure element-wise sum — merge-order independent,
    * pinned by CountMinSpec) but not SQL-expressible → rows-only;
    * [[termCountsCmsAudit]] is the oracle-checked contract.
    */
  def termCountsCms(
      docs: DataFrame,
      terms: Seq[String] = CmsWatchTerms,
      width: Int = 2048,
      depth: Int = 5): DataFrame =
    docs
      .select(col("lang"), explode(Dedup.tokens(col("text"))).alias("term"))
      .groupBy(col("lang"))
      .agg(graft.functions.CountMinEstimate
        .estimates(col("term"), terms, width, depth).alias("est"))
      .select(col("lang"), explode(col("est")))
      .select(col("lang"), col("col.item").alias("term"),
        col("col.count_est"))

  /** Oracle-checkable audit of [[termCountsCms]]: per (language, watched
    * term), the exact count plus two pinned booleans — `not_below`
    * (estimate ≥ exact: a CMS theorem, counters never under-count) and
    * `within_tol` (estimate ≤ exact + 2·⌈(e/width)·N_lang⌉). The ε·N
    * band is a PROBABILISTIC guarantee — it holds per counter with
    * probability 1−e^−depth (≈99.3%), not always — so the audit doubles
    * it: a flip of the doubled band on some future corpus/seed means the
    * sketch width needs re-tuning for that data, not that the sketch is
    * wrong. CMS estimates are deterministic functions of the value
    * multiset, so both booleans are stable and the oracle pins them to
    * TRUE — the same bounded-error-contract upgrade as termStatsAudit. Join cost: three
    * tiny aggregate tables (langs × watch-list, langs × vocab filtered to
    * the watch list, langs), never the corpus.
    */
  def termCountsCmsAudit(
      docs: DataFrame,
      terms: Seq[String] = CmsWatchTerms,
      width: Int = 2048,
      depth: Int = 5): DataFrame = {
    val toks = docs
      .select(col("lang"), explode(Dedup.tokens(col("text"))).alias("term"))
    val est = termCountsCms(docs, terms, width, depth)
    val exact = toks
      .where(col("term").isin(terms.map(lit): _*))
      .groupBy(col("lang").alias("xl"), col("term").alias("xt"))
      .agg(count(lit(1)).alias("term_count"))
    val totals = toks.groupBy(col("lang").alias("nl"))
      .agg(count(lit(1)).alias("n_toks"))
    val eps = scala.math.E / width
    est
      .join(broadcast(exact),
        col("lang") === col("xl") && col("term") === col("xt"), "left")
      .join(broadcast(totals), col("lang") === col("nl"))
      .select(col("lang"), col("term"),
        coalesce(col("term_count"), lit(0L)).alias("term_count"),
        (col("count_est") >= coalesce(col("term_count"), lit(0L)))
          .alias("not_below"),
        (col("count_est") <= coalesce(col("term_count"), lit(0L)) +
          lit(2L) * ceil(col("n_toks") * eps)).alias("within_tol"))
  }

  /** Canonical text normalization: lowercase, trim, collapse every
    * internal whitespace run to one space — the stage-zero cleanup of any
    * dedup/quality pipeline (exact-duplicate rates are meaningless on
    * un-normalized text: "A  b" and "a b" must hash equal). Pure
    * codegen'd projection — no shuffle, no UDF, embarrassingly parallel.
    */
  def normalize(docs: DataFrame): DataFrame = {
    val norm = lower(trim(
      regexp_replace(coalesce(col("text"), lit("")), "\\s+", " ")))
    docs.select(col("doc_id"), norm.alias("norm_text"),
      length(norm).alias("n_chars_norm"))
  }

  /** PII redaction — the scrub a training corpus runs before anything
    * else ships: emails → `<EMAIL>`, dotted-quad IPs → `<IP>`, long digit
    * runs → `<NUMBER>`, with per-document match counts (counted on the
    * ORIGINAL text, so counts do not depend on replacement order) for
    * audit dashboards. Pure per-row projection: codegen'd regexes, no
    * shuffle, embarrassingly parallel — the ideal 100 TB operator shape.
    * Replacement order is fixed (email, IP, digit-run) and mirrored in the
    * oracle; the patterns cannot overlap each other's replacement tokens.
    */
  def redact(docs: DataFrame): DataFrame = {
    val text = coalesce(col("text"), lit(""))
    docs.select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailPattern, "<EMAIL>"),
          Ipv4Pattern, "<IP>"),
        DigitRunPattern, "<NUMBER>").alias("redacted_text"),
      regexp_count(text, lit(EmailPattern)).alias("n_emails"),
      regexp_count(text, lit(Ipv4Pattern)).alias("n_ips"),
      regexp_count(text, lit(DigitRunPattern)).alias("n_digit_runs"))
  }

  /** Fingerprint modulus: the largest prime below 10^15, so `h*131 + t`
    * stays far inside Long/BIGINT range on both engines (no overflow —
    * DuckDB would raise where the JVM silently wraps).
    */
  val FingerprintMod = 999999999999989L

  /** Order-sensitive rolling polynomial fingerprint over token hashes:
    * h ← (h·131 + hash(token)) mod FingerprintMod. Unlike simhash/minhash
    * this distinguishes permutations — the right key for exact-ish
    * near-identity with cheap 8-byte state.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), Dedup.tokens(col("text")).alias("toks"))
      // Native bulk hash (HashArray), then a cheap interpreted mod — the
      // expensive md5 never runs inside a HOF lambda.
      .select(col("doc_id"),
        transform(Dedup.hashArray60(col("toks")),
          h => pmod(h, lit(FingerprintMod))).alias("hs"))
      .select(
        col("doc_id"),
        aggregate(col("hs"), lit(0L),
          (acc, h) => pmod(acc * 131 + h, lit(FingerprintMod)))
          .alias("fingerprint"))

  /** Okapi defaults (Robertson et al., TREC-3). */
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** The registry's fixed retrieval probe — head terms of the fixture
    * vocabulary, so tf saturation (the k1 curve) actually exercises.
    */
  val Bm25QueryTerms = Seq("hash", "join", "window")

  /** BM25 top-`k` retrieval: the classic sparse ranking function, the
    * quality-retrieval workhorse of training-data curation (find the docs
    * most about X, mine hard negatives, spot-check a topic's coverage).
    * `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))`
    * with `idf = ln(1 + (N − df + ½)/(df + ½))`.
    *
    * Scale shape: ONE corpus scan — the exploded term stream is filtered
    * to the query terms BEFORE any shuffle (a handful of terms survive per
    * doc), document frequency derives from the filtered tf table instead
    * of a second scan, and corpus stats (N, total length) broadcast as one
    * row. Per-(doc, term) scores are rounded to integer MICRO-units before
    * the per-doc sum, so the sum is a long — no float accumulation order
    * to diverge between engines (the engine-wide micro-unit discipline).
    * The final top-k is `TakeOrdered` (score desc, doc_id asc) — a k-heap
    * per partition, never a global sort.
    */
  def bm25TopK(
      docs: DataFrame,
      queryTerms: Seq[String] = Bm25QueryTerms,
      k: Int = 20,
      k1: Double = Bm25K1,
      b: Double = Bm25B): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    val toks = docs.select(col("doc_id"),
      Dedup.tokens(col("text")).alias("toks"))
    val lens = toks.select(col("doc_id"),
      size(col("toks")).cast("long").alias("dl"))
    val stats = lens.agg(count(lit(1)).alias("n_docs"),
      sum(col("dl")).alias("total_len"))
    val tf = toks
      .select(col("doc_id"), explode(col("toks")).alias("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).alias("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).alias("df"))
    // Expression shapes mirror the oracle twin token for token — double
    // ops are individually deterministic; only ORDER of combination could
    // diverge, so there is exactly one order.
    val avgdl = col("total_len").cast("double") / col("n_docs")
    val idf = log(lit(1) + (col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)))
    val tfp = (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1) - lit(b) + lit(b) * col("dl") / avgdl))
    val scored = tf
      .join(dfreq, "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(idf * tfp * lit(1000000), 0).cast("long").alias("s"))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).alias("n_hits"),
        sum(col("s")).alias("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }
}
