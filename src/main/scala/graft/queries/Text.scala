package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.harness.StandIn
import graft.ops.{AlertLifecycle, AlertRules, Aggregates, Bpe, Curation, Dedup, Html, Multimodal, Parse, Profile, Sessionize, Similarity, TextAnalysis, TextRules}
import graft.queries.QueryShared._

/** Text-analysis family: language id, quality scoring/gating/training, tf-idf, BPE encode faces, published rule-sets, term statistics and sketches.
  *
  * Registry contract: [[queries]] and [[oracleSql]] fold into
  * [[graft.SparkEntry]]; keys must stay globally unique across the
  * Queries* objects (asserted in QueryRegistrySpec).
  */
object QueriesText {

  private def textTfIdf(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfIdf(StandIn.documents(s, dir))

  private def textTermStatsSketch(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.termStatsSketch(StandIn.documents(s, dir))

  // Decontamination parameters shared with the oracle twin: benchmark =
  // every 10th doc, rare = gram df ≤ 20 (the synthetic corpus has a small
  // shared vocabulary — median gram df is 28 — so "rare" sits below that),
  // flag at ≥ 3 shared grams.

  private def textRedact(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.redact(StandIn.documents(s, dir))

  // Approx-quantile sketch variant of qualityPercentiles — the
  // extreme-cardinality path. Engine-specific sketch (Greenwald-Khanna in
  // Spark), so no DuckDB twin; rows-only driver check + an error-bound
  // unit test vs the exact percentiles (ProfileSpec).
  private def textQualityPercentilesApprox(
      s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityPercentilesApprox(StandIn.documents(s, dir), QualityPs)

  private val QualityPs = Seq(0.5, 0.9, 0.99)

  // Smoothing factor shared by the EWMA query and its oracle fold.

  private def textQualityPercentiles(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityPercentiles(StandIn.documents(s, dir), QualityPs)

  // Packing parameters shared with the oracle twin.

  /** Trained-table encode twin: the training chain's learned pairs land in
    * ONE `bests` row (a1..b${Bpe.NumMerges}); every document cross-joins
    * that row and the replace chain references its columns from inside the
    * per-word lambda — training AND encoding replayed in one statement. */
  // Learned-pair landing row + the trained replace chain — shared by the
  // trained-encode twin and the tokenizer-comparison twin.
  private val bpeBestsSql = (1 to Bpe.NumMerges).map { r =>
    s"(SELECT a FROM best$r) AS a$r, (SELECT b FROM best$r) AS b$r"
  }.mkString(", bests AS MATERIALIZED (SELECT ", ",\n  ", ")")

  private val bpeTrainedRepSql =
    (1 to Bpe.NumMerges).foldLeft(bpeSpacedSql("w")) { (acc, r) =>
      s"replace($acc, ' ' || a$r || ' ' || b$r || ' ', ' ' || a$r || b$r || ' ')"
    }

  // Byte-level siblings of the landing row + trained replace chain, on
  // the bbest* CTEs of bpeBytesTrainChainSql (three-tokenizer card).
  private val bpeBytesBestsSql = (1 to Bpe.NumMerges).map { r =>
    s"(SELECT a FROM bbest$r) AS ba$r, (SELECT b FROM bbest$r) AS bb$r"
  }.mkString(", bbests AS MATERIALIZED (SELECT ", ",\n  ", ")")

  private val bpeBytesTrainedRepSql =
    (1 to Bpe.NumMerges).foldLeft(bpeSpacedSql("w")) { (acc, r) =>
      s"replace($acc, ' ' || ba$r || ' ' || bb$r || ' ', " +
        s"' ' || ba$r || bb$r || ' ')"
    }

  private val bpeTrainedTokensOracle =
    s"""$bpeTrainChainSql$bpeBestsSql
       |SELECT doc_id,
       |  CAST(list_reduce(list_prepend(0, list_transform($bpeWordsSql,
       |    w -> len(string_split(trim($bpeTrainedRepSql), ' ')))),
       |    (x, y) -> x + y) AS INT) AS bpe_tokens
       |FROM documents CROSS JOIN bests""".stripMargin

  /** Comparison-card twin: BOTH training loops (ULM chain first — it owns
    * the `WITH RECURSIVE` head — then the BPE chain spliced in; the two
    * chains' CTE namespaces are disjoint) and BOTH trained encodes in one
    * statement, folded to exact integer totals. */
  private val tokenizerCompareOracle = {
    val R = graft.ops.Ulm.EmRounds
    s"""$ulmTrainChainSql, ${bpeTrainChainSql.stripPrefix("WITH ")}$bpeBestsSql, ${
        bpeBytesTrainChainSql.stripPrefix("WITH ")}$bpeBytesBestsSql${
        ulmScoreSql("uscc", s"uv$R")}, $ulmCorpusWordsSql${
        ulmUnkAugSql("usccu", "uscc")}
       |${ulmWalkSql("C", "ucw", "usccu", withCnt = false)}
       |, tok AS (
       |  SELECT d.doc_id,
       |         len($bpeWordsSql) AS nw,
       |         CAST(list_reduce(list_prepend(0, list_transform($bpeWordsSql,
       |           w -> len(string_split(trim($bpeTrainedRepSql), ' ')))),
       |           (x, y) -> x + y) AS INT) AS bpet
       |  FROM documents d CROSS JOIN bests
       |), btok AS (
       |  SELECT d.doc_id,
       |         CAST(list_reduce(list_prepend(0,
       |           list_transform($bpeBytesWordsSql,
       |             w -> len(string_split(trim($bpeBytesTrainedRepSql),
       |                      ' ')))),
       |           (x, y) -> x + y) AS INT) AS bpebt
       |  FROM documents d CROSS JOIN bbests
       |), utok AS (
       |  SELECT d.doc_id, CAST(coalesce(x.n, 0) AS INT) AS ulmt
       |  FROM documents d LEFT JOIN (
       |    SELECT o.doc_id, sum(b.np) AS n
       |    FROM (SELECT doc_id, t.w AS word FROM utoks,
       |            unnest(ws) AS t(w)) o
       |    JOIN ubestC b USING (word)
       |    GROUP BY 1) x USING (doc_id)
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(nw) AS BIGINT) AS n_words,
       |       CAST(sum(bpet) AS BIGINT) AS bpe_tokens,
       |       CAST(sum(ulmt) AS BIGINT) AS ulm_tokens,
       |       CAST(sum(bpebt) AS BIGINT) AS bpeb_tokens,
       |       round(sum(bpet) / CAST(greatest(sum(nw), 1) AS DOUBLE), 6)
       |         AS bpe_fertility,
       |       round(sum(ulmt) / CAST(greatest(sum(nw), 1) AS DOUBLE), 6)
       |         AS ulm_fertility,
       |       round(sum(bpebt) / CAST(greatest(sum(nw), 1) AS DOUBLE), 6)
       |         AS bpeb_fertility,
       |       round(sum(ulmt) / CAST(greatest(sum(bpet), 1) AS DOUBLE), 6)
       |         AS ulm_vs_bpe,
       |       CAST(${Bpe.NumMerges} AS INT) AS bpe_merges,
       |       CAST((SELECT count(*) FROM uv$R) AS INT) AS ulm_vocab
       |FROM tok JOIN utok USING (doc_id) JOIN btok USING (doc_id)"""
      .stripMargin
  }

  // Chunking parameters shared with the oracle twin.

  private def textTermStats(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.termStats(StandIn.documents(s, dir))

  private def textLangId(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langId(StandIn.documents(s, dir))

  private def textLangIdNgram(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.charNgramLangId(StandIn.documents(s, dir))

  private def textQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.quality(StandIn.documents(s, dir))

  private def textQualityGate(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityGate(StandIn.documents(s, dir))

  private def textTokenCounts(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(StandIn.documents(s, dir))

  private def textFingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprint(StandIn.documents(s, dir))

  // Frame-sampler parameters shared by the query and its oracle twin.

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tfidf"          -> ((s, d) => textTfIdf(s, d)),

    // HTML→text extraction family (ops/Html.scala): synthesized page per
    // doc (the fixture has no raw-HTML column; the page is derived
    // identically in the oracle), then zero-shuffle codegen projections.
    // The extract oracle constructs the EXPECTED clean text from the word
    // slices directly — an independent derivation, not a regex replay.
    "text_html_extract"   -> ((s, d) =>
      Html.extracted(StandIn.documents(s, d))),

    // jusText-shaped per-block link-density report (Html.blockReport):
    // integer micro-unit density, floor division both engines.
    "text_html_blocks"    -> ((s, d) =>
      Html.blockReport(StandIn.documents(s, d))),

    // Boilerplate-removed main text (Html.mainText): blockReport's flag
    // negated via exact integer cross-multiplication inside an array
    // filter — content blocks re-joined per row, still zero Exchanges.
    "text_html_main"      -> ((s, d) =>
      Html.mainText(StandIn.documents(s, d))),

    // BM25 top-k retrieval card: one filtered corpus scan, integer
    // micro-unit per-term scores so the per-doc sum is order-free, TakeOrdered
    // final k (TextAnalysis.bm25TopK scaladoc has the scale shape).
    "text_bm25_topk"      -> ((s, d) =>
      TextAnalysis.bm25TopK(StandIn.documents(s, d))),

    // Keyword extraction: top-3 TF-IDF terms per doc, WindowGroupLimit
    // per-doc k-heap (TextAnalysis.keywords).
    "text_keywords"       -> ((s, d) =>
      TextAnalysis.keywords(StandIn.documents(s, d))),

    // HLL++ sketch — engine-specific, so no DuckDB twin exists; the driver
    // records a rows-only check (TextAnalysisSpec bounds the error vs the
    // exact termStats).
    "text_term_stats_sketch" -> ((s, d) => textTermStatsSketch(s, d)),

    "text_bpe_symbols"    -> ((s, d) =>
      Bpe.encodeSymbols(StandIn.documents(s, d))),

    "text_bpe_tokens"     -> ((s, d) =>
      Bpe.tokenCounts(StandIn.documents(s, d))),

    "text_bpe_tokens_trained" -> ((s, d) =>
      Bpe.tokenCountsTrained(s, StandIn.documents(s, d))),

    // Byte-level (GPT-2) encode faces under the fixed byte-merge table:
    // byte-mapped pretokens (space ⇒ Ġ rides INTO tokens) through the
    // same codegen kernels (Bpe.encodeSymbolsBytes/tokenCountsBytes).
    "text_bpe_bytes_symbols" -> ((s, d) =>
      Bpe.encodeSymbolsBytes(StandIn.documents(s, d))),

    "text_bpe_bytes_tokens" -> ((s, d) =>
      Bpe.tokenCountsBytes(StandIn.documents(s, d))),

    // Fixture precondition GUARD for the byte-BPE oracle twins (r15
    // advice): those twins approximate the 256-entry byte→unicode map as
    // replace(' ','Ġ'), exact only while document text is pure printable
    // ASCII. The engine MEASURES the violation count; the oracle pins it
    // 0 — so a future fixture revision carrying any control/non-ASCII
    // byte fails this row at verify time instead of silently diverging
    // inside the twins.
    "text_bpe_ascii_guard" -> ((s, d) =>
      StandIn.documents(s, d).agg(
        count(lit(1)).alias("n_docs"),
        sum(when(!coalesce(col("text"), lit(""))
          .rlike("^[\\x20-\\x7E]*$"), 1L).otherwise(0L))
          .alias("n_nonascii"))),

    // Unigram-LM Viterbi encode under the fixed piece table — byte-exact
    // piece-stream evidence (codegen'd UlmSegment kernel, zero shuffles).
    "text_ulm_pieces"     -> ((s, d) =>
      graft.ops.Ulm.encodePieces(StandIn.documents(s, d))),

    // Count-only face of the same encode (UlmCount kernel).
    "text_ulm_tokens"     -> ((s, d) =>
      graft.ops.Ulm.tokenCounts(StandIn.documents(s, d))),

    // Train→encode end to end: counts under the vocabulary learned from
    // the SAME corpus (Ulm.tokenCountsTrained).
    "text_ulm_tokens_trained" -> ((s, d) =>
      graft.ops.Ulm.tokenCountsTrained(s, StandIn.documents(s, d))),

    // ...and the byte-exact piece-stream face of the trained encode.
    "text_ulm_pieces_trained" -> ((s, d) => {
      val docs = StandIn.documents(s, d)
      graft.ops.Ulm.encodePieces(docs,
        graft.ops.Ulm.train(docs).map(p => (p.piece, -p.scoreMicro)))
    }),

    // Tokenizer decision card: BPE vs ULM trained on the same corpus —
    // fertility, token totals, vocab sizes, one row (Ulm.compareWithBpe).
    "text_tokenizer_compare" -> ((s, d) =>
      graft.ops.Ulm.compareWithBpe(s, StandIn.documents(s, d))),

    "text_quality_train"  -> ((s, d) =>
      graft.ops.QualityModel.weightsTable(s, StandIn.documents(s, d))),

    "text_quality_train_scores" -> ((s, d) =>
      graft.ops.QualityModel.trainedScores(StandIn.documents(s, d))),

    // Precision/recall/F1 vs the rule-gate teacher across a 9-point
    // threshold sweep — the trained model's shipping evidence.
    "text_quality_eval"   -> ((s, d) =>
      graft.ops.QualityModel.evalCard(StandIn.documents(s, d))),

    // DSIR importance weights (Xie et al. 2023): per-doc mean log-ratio of
    // target vs raw hashed-gram distributions, target = the quality-gated
    // subset (Curation.dsirWeights scaladoc has the scale shape)...
    "text_dsir_weights"   -> ((s, d) =>
      Curation.dsirWeights(StandIn.documents(s, d))),

    "text_redact"         -> ((s, d) => textRedact(s, d)),

    // Compression-ratio signal (zlib level 6): engine-specific (no SQL
    // deflate) → rows-only; the audit twin carries the hash-checked
    // contract (TextRules.compressionSignal/compressionAudit).
    "text_compression"    -> ((s, d) =>
      TextRules.compressionSignal(StandIn.documents(s, d))),

    "text_compression_audit" -> ((s, d) =>
      TextRules.compressionAudit(StandIn.documents(s, d))),

    // Count-Min point estimates — deterministic (pure counter sums) but
    // not SQL-expressible → rows-only; the audit twin is the
    // oracle-checked bounded-error contract.
    "text_term_cms"       -> ((s, d) =>
      TextAnalysis.termCountsCms(StandIn.documents(s, d))),

    "text_term_cms_audit" -> ((s, d) =>
      TextAnalysis.termCountsCmsAudit(StandIn.documents(s, d))),

    "text_quality_percentiles" -> ((s, d) => textQualityPercentiles(s, d)),

    "text_quality_percentiles_audit" -> ((s, d) =>
      TextAnalysis.qualityPercentilesAudit(StandIn.documents(s, d), QualityPs)),

    // Lexical diversity: TTR + Guiraud root TTR, zero-shuffle projection
    // (TextAnalysis.typeTokenRatio).
    "text_ttr"            -> ((s, d) =>
      TextAnalysis.typeTokenRatio(StandIn.documents(s, d))),

    "text_normalize"      -> ((s, d) =>
      TextAnalysis.normalize(StandIn.documents(s, d))),

    // Misra-Gries heavy hitters — counts are merge-order-dependent lower
    // bounds (no SQL twin); rows-only (count stabilized by the 4k-capacity
    // sketch + top-k truncation) + bound-pinning unit tests in
    // MisraGriesSpec. text_heavy_terms_exact is the oracle-checked twin.
    "text_heavy_terms"    -> ((s, d) =>
      TextAnalysis.heavyTerms(StandIn.documents(s, d))),

    "text_heavy_terms_exact" -> ((s, d) =>
      TextAnalysis.heavyTermsExact(StandIn.documents(s, d))),

    "text_repetition"     -> ((s, d) =>
      TextAnalysis.repetition(StandIn.documents(s, d))),

    "text_quality_percentiles_approx" ->
      ((s, d) => textQualityPercentilesApprox(s, d)),

    "text_term_stats"     -> ((s, d) => textTermStats(s, d)),

    "text_term_stats_audit" -> ((s, d) =>
      TextAnalysis.termStatsAudit(StandIn.documents(s, d))),

    "text_langid"         -> ((s, d) => textLangId(s, d)),

    // Tokenizer fertility per language: subwords/word + chars/subword off
    // ONE scan (TextAnalysis.fertilityByLang).
    "text_fertility"      -> ((s, d) =>
      TextAnalysis.fertilityByLang(StandIn.documents(s, d))),

    // Zipf rank-frequency fit: corpus-health slope/intercept/R² over the
    // top-1000 terms (TextAnalysis.zipfFit).
    "text_zipf_fit"       -> ((s, d) =>
      TextAnalysis.zipfFit(StandIn.documents(s, d))),

    "text_langid_ngram"   -> ((s, d) => textLangIdNgram(s, d)),

    // Two-classifier agreement matrix: function-word vs char-trigram
    // language votes cross-tabulated (TextAnalysis.langAgreement) -
    // disagreement cells are the escalate-to-a-real-model set.
    "text_lang_agreement" -> ((s, d) =>
      TextAnalysis.langAgreement(StandIn.documents(s, d))),

    "text_quality"        -> ((s, d) => textQuality(s, d)),

    "text_unigram_logprob" -> ((s, d) =>
      TextAnalysis.unigramLogProb(StandIn.documents(s, d))),

    "text_quality_gate"   -> ((s, d) => textQualityGate(s, d)),

    // Rejection-reason histogram per predicted language: one fused scan,
    // languages-by-verdicts cell table (TextAnalysis.qualityReport).
    "text_quality_report" -> ((s, d) =>
      TextAnalysis.qualityReport(StandIn.documents(s, d))),

    // Bigram-LM fluency (the KenLM-filter shape, add-one smoothed so the
    // arithmetic has an exact SQL twin — TextAnalysis.bigramLogProb).
    "text_bigram_logprob" -> ((s, d) =>
      TextAnalysis.bigramLogProb(StandIn.documents(s, d))),

    // fastText-style hashed-gram linear scorer (fixed weight table) —
    // one whole-stage-codegen map, no shuffle (TextAnalysis.qualityScore).
    "text_quality_score"  -> ((s, d) =>
      TextAnalysis.qualityScore(StandIn.documents(s, d))),

    // Gopher rule report (Rae et al. 2021 Table A1): every thresholded
    // metric + verdicts in ONE codegen'd projection (TextRules.gopherReport).
    "text_gopher_rules"   -> ((s, d) =>
      TextRules.gopherReport(StandIn.documents(s, d))),

    // C4 cleanup (Raffel et al. 2020 §2.2) over the wrapped-line view
    // (the fixture corpus ships no newlines — same adapter as dedup_lines);
    // strict + relaxed line regimes from one projection.
    "text_c4_filters"     -> ((s, d) =>
      TextRules.c4Filters(Dedup.wrapTokenLines(StandIn.documents(s, d)))),

    // PMI collocations (Church & Hanks 1990): corpus top-k adjacent pairs
    // by pointwise mutual information — pair counts + two Zipf-bounded
    // unigram joins + distributed TakeOrdered (TextRules.pmiBigrams).
    "text_pmi_bigrams"    -> ((s, d) =>
      TextRules.pmiBigrams(StandIn.documents(s, d))),

    // Character-class Shannon entropy per doc: fixed 38-symbol alphabet +
    // "other" bucket, zero-shuffle projection (TextRules.charEntropy).
    "text_char_entropy"   -> ((s, d) =>
      TextRules.charEntropy(StandIn.documents(s, d))),

    // Stage-zero encoding-artifact screen: U+FFFD / control chars /
    // mojibake digrams / ASCII share (TextRules.encodingScreen).
    "text_encoding_screen" -> ((s, d) =>
      TextRules.encodingScreen(StandIn.documents(s, d))),

    "text_token_counts"   -> ((s, d) => textTokenCounts(s, d)),

    "text_fingerprint"    -> ((s, d) => textFingerprint(s, d)),
  )

  // Word-slice CTEs shared by the three HTML twins: the page pieces the
  // engine's Html.pageFromWords synthesizes, derived in DuckDB from the
  // SAME 1-based inclusive slices (list_slice is [begin, end] inclusive
  // where Spark's slice is (start, LENGTH) — offsets written per engine).
  private val htmlSliceSql =
    """d AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
      |), hp AS (
      |  SELECT doc_id,
      |         array_to_string(list_slice(w, 1, 3), ' ') AS title,
      |         array_to_string(list_slice(w, 1, 2), ' ') AS nav,
      |         array_to_string(list_slice(w, 4, len(w) // 2), ' ') AS p1,
      |         array_to_string(list_slice(w, len(w) // 2 + 1, len(w)), ' ')
      |           AS p2
      |  FROM d
      |)""".stripMargin

  // The five blocks' inner/anchor texts, derived from the slices (not
  // from the engine's regexes): h1, p1-paragraph, nav div, p2-paragraph,
  // footer — in page order.
  private val htmlBlocksSql =
    s"""$htmlSliceSql, hb AS (
       |  SELECT doc_id, unnest([1, 2, 3, 4, 5]) AS bi,
       |         unnest([title, p1 || ' & more', nav || ' menu link', p2,
       |                 'copyright © ' || nav]) AS inner_t,
       |         unnest(['', '', nav || ' menu link', '',
       |                 'copyright © ' || nav]) AS link_t
       |  FROM hp
       |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // HTML extraction twin: the expected clean text constructed directly
    // from the word slices — independent of the engine's strip regexes.
    "text_html_extract" ->
      s"""WITH $htmlSliceSql, he AS (
         |  SELECT doc_id,
         |         title || ' ' || title || ' ' || p1 || ' & more ' || nav
         |           || ' menu link ' || p2 || ' copyright © ' || nav
         |           AS text_clean
         |  FROM hp
         |)
         |SELECT doc_id, text_clean,
         |       CAST(length(text_clean) AS INT) AS n_chars
         |FROM he""".stripMargin,

    "text_html_blocks" ->
      s"""WITH $htmlBlocksSql
         |SELECT doc_id, CAST(bi AS INT) AS block_idx,
         |       CAST(length(inner_t) AS BIGINT) AS text_len,
         |       CAST(length(link_t) AS BIGINT) AS link_len,
         |       CAST(CASE WHEN length(inner_t) > 0
         |            THEN (1000000 * length(link_t)) // length(inner_t)
         |            ELSE 1000000 END AS BIGINT) AS link_density_micro,
         |       ((CASE WHEN length(inner_t) > 0
         |          THEN (1000000 * length(link_t)) // length(inner_t)
         |          ELSE 1000000 END) > ${Html.BoilerplateLinkDensityMicro}
         |        OR length(inner_t) < ${Html.BoilerplateMinChars})
         |         AS is_boilerplate
         |FROM hb""".stripMargin,

    // Main-text twin: keep rule replayed on the derived block texts
    // (density > 0.5 written as the same integer cross-multiplication),
    // kept inners joined in block order; docs with zero content blocks
    // keep an empty main_text via the LEFT JOIN.
    "text_html_main" ->
      s"""WITH $htmlBlocksSql, hk AS (
         |  SELECT doc_id, string_agg(inner_t, ' ' ORDER BY bi) AS mt
         |  FROM hb
         |  WHERE length(inner_t) >= ${Html.BoilerplateMinChars}
         |    AND 1000000 * length(link_t) <
         |        ${Html.BoilerplateLinkDensityMicro + 1} * length(inner_t)
         |  GROUP BY doc_id
         |)
         |SELECT hp.doc_id, coalesce(hk.mt, '') AS main_text,
         |       CAST(length(coalesce(hk.mt, '')) AS INT) AS n_chars
         |FROM hp LEFT JOIN hk USING (doc_id)""".stripMargin,
    // Quality-report twin (TextAnalysis.qualityReport): gate + language
    // CTE fragments shared with text_quality_gate / corpus_curate.
    "text_quality_report" ->
      s"""WITH $rawToksSql, $gateSql, scored AS (
         |  SELECT doc_id,
         |$langScoresSql
         |  FROM toks
         |), best AS (
         |  SELECT *, greatest(en_score, fr_score, de_score) AS top FROM scored
         |), lg AS (
         |  SELECT b.doc_id,
         |         CASE WHEN b.en_score = b.top AND b.top > 0 THEN 'en'
         |              WHEN b.fr_score = b.top AND b.top > 0 THEN 'fr'
         |              WHEN b.de_score = b.top AND b.top > 0 THEN 'de'
         |              ELSE 'unknown' END AS predicted_lang
         |  FROM best b
         |), qcells AS (
         |  SELECT lg.predicted_lang,
         |         coalesce(g.reject_reason, 'passed') AS verdict,
         |         count(*) AS n_docs,
         |         CAST(sum(len(k.t)) AS BIGINT) AS n_tokens
         |  FROM lg
         |  JOIN gated g ON g.doc_id = lg.doc_id
         |  JOIN toks k ON k.doc_id = lg.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT predicted_lang, verdict, n_docs, n_tokens,
         |       round(n_docs / CAST(sum(n_docs) OVER (
         |         PARTITION BY predicted_lang) AS DOUBLE), 6) AS lang_share
         |FROM qcells""".stripMargin,

    // Fixed-table encode twin: per word, chars → spaced string → the
    // FixedMerges replace chain; symbols re-joined in document order.
    "text_bpe_symbols" ->
      s"""SELECT doc_id,
         |  array_to_string(list_transform($bpeWordsSql,
         |    w -> $bpeWordSymsSql), ' ') AS bpe_symbols
         |FROM documents""".stripMargin,

    // Count-only face of the same encode (BpeCount kernel).
    "text_bpe_tokens" ->
      s"SELECT doc_id, $bpeTokensSql AS bpe_tokens\nFROM documents",

    // Train→encode twin: learned pairs + per-word replace chain in one
    // statement (see bpeTrainedTokensOracle).
    "text_bpe_tokens_trained" -> bpeTrainedTokensOracle,

    // Byte-level fixed-table encode twins: same per-pretoken replay with
    // the FixedByteMerges chain over byte-mapped pretokens.
    "text_bpe_bytes_symbols" ->
      s"""SELECT doc_id,
         |  array_to_string(list_transform($bpeBytesWordsSql,
         |    w -> $bpeBytesWordSymsSql), ' ') AS bpe_symbols
         |FROM documents""".stripMargin,

    "text_bpe_bytes_tokens" ->
      s"SELECT doc_id, $bpeBytesTokensSql AS bpeb_tokens\nFROM documents",

    // ASCII-precondition pin: n_docs replayed from the corpus, the
    // violation count pinned 0 — a non-ASCII fixture revision hash-fails
    // here (the engine side MEASURES it) before it can silently skew the
    // byte-BPE twins above.
    "text_bpe_ascii_guard" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(0 AS BIGINT) AS n_nonascii
        |FROM documents""".stripMargin,

    // Fixed-table unigram-LM encode twins: Viterbi replayed as
    // recursive-CTE path enumeration per DISTINCT corpus word (ulmWalkSql
    // — same (cost, np, seg) tiebreak as the kernel), best segmentations
    // re-joined to the document word stream in order.
    "text_ulm_pieces" ->
      s"""WITH RECURSIVE $ulmFixedVocabSql, $ulmCorpusWordsSql
         |${ulmWalkSql("F", "ucw", "uvoc", withCnt = false)}
         |SELECT d.doc_id, coalesce(x.s, '') AS ulm_pieces
         |FROM documents d LEFT JOIN (
         |  SELECT o.doc_id, string_agg(b.seg, ' ' ORDER BY o.i) AS s
         |  FROM (SELECT doc_id, ws[CAST(g.i AS INT)] AS word, g.i AS i
         |        FROM utoks,
         |             unnest(generate_series(1, len(ws))) AS g(i)) o
         |  JOIN ubestF b USING (word)
         |  GROUP BY 1) x USING (doc_id)""".stripMargin,

    "text_ulm_tokens" ->
      s"""WITH RECURSIVE $ulmFixedVocabSql, $ulmCorpusWordsSql
         |${ulmWalkSql("F", "ucw", "uvoc", withCnt = false)}
         |SELECT d.doc_id, CAST(coalesce(x.n, 0) AS INT) AS ulm_tokens
         |FROM documents d LEFT JOIN (
         |  SELECT o.doc_id, sum(b.np) AS n
         |  FROM (SELECT doc_id, t.w AS word FROM utoks,
         |          unnest(ws) AS t(w)) o
         |  JOIN ubestF b USING (word)
         |  GROUP BY 1) x USING (doc_id)""".stripMargin,

    // Trained piece-stream twin: the same chain, best segmentations
    // re-joined to the document word stream in order (string_agg).
    "text_ulm_pieces_trained" ->
      s"""$ulmTrainChainSql${ulmScoreSql("uscg",
              s"uv${graft.ops.Ulm.EmRounds}")}, $ulmCorpusWordsSql${
              ulmUnkAugSql("uscgu", "uscg")}
         |${ulmWalkSql("G", "ucw", "uscgu", withCnt = false)}
         |SELECT d.doc_id, coalesce(x.s, '') AS ulm_pieces
         |FROM documents d LEFT JOIN (
         |  SELECT o.doc_id, string_agg(b.seg, ' ' ORDER BY o.i) AS s
         |  FROM (SELECT doc_id, ws[CAST(g.i AS INT)] AS word, g.i AS i
         |        FROM utoks,
         |             unnest(generate_series(1, len(ws))) AS g(i)) o
         |  JOIN ubestG b USING (word)
         |  GROUP BY 1) x USING (doc_id)""".stripMargin,

    // Train→encode twin: the full EM chain + final-vocab costs + one more
    // Viterbi enumeration over the corpus words, in one statement.
    "text_ulm_tokens_trained" ->
      s"""$ulmTrainChainSql${ulmScoreSql("uscf",
              s"uv${graft.ops.Ulm.EmRounds}")}, $ulmCorpusWordsSql${
              ulmUnkAugSql("uscfu", "uscf")}
         |${ulmWalkSql("T", "ucw", "uscfu", withCnt = false)}
         |SELECT d.doc_id, CAST(coalesce(x.n, 0) AS INT) AS ulm_tokens
         |FROM documents d LEFT JOIN (
         |  SELECT o.doc_id, sum(b.np) AS n
         |  FROM (SELECT doc_id, t.w AS word FROM utoks,
         |          unnest(ws) AS t(w)) o
         |  JOIN ubestT b USING (word)
         |  GROUP BY 1) x USING (doc_id)""".stripMargin,

    // Both tokenizer families trained + encoded in ONE statement (see
    // tokenizerCompareOracle).
    "text_tokenizer_compare" -> tokenizerCompareOracle,

    // Compression-audit twin: the oracle PREDICTS every value (counts
    // from the corpus, TRUE for the invariants) — a deflate that
    // produced zero bytes, a long doc past the ratio bound, or an
    // inverted repetition ordering hash-mismatches (the recall-audit
    // pattern; DuckDB has no deflate to replay the sizes themselves).
    "text_compression_audit" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(count(*) AS BIGINT) AS n_positive,
         |       CAST(sum(CASE WHEN strlen(coalesce(text, ''))
         |                       >= ${TextRules.CompressionMinBytes}
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_long_docs,
         |       CAST(sum(CASE WHEN strlen(coalesce(text, ''))
         |                       >= ${TextRules.CompressionMinBytes}
         |                     THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_long_bounded,
         |       TRUE AS repetition_compresses_better
         |FROM documents""".stripMargin,

    // Trained-classifier twin: the full rounded-GD optimization unrolled
    // (see qmTrainChainSql) — every learned weight must match bit-for-bit.
    "text_quality_train" -> {
      val sel = graft.ops.QualityModel.FeatureNames.zipWithIndex.map {
        case (n, j) =>
          if (j == 0) s"SELECT '$n' AS feature, w$j AS weight FROM ws${graft.ops.QualityModel.Steps}"
          else s"SELECT '$n', w$j FROM ws${graft.ops.QualityModel.Steps}"
      }.mkString("\nUNION ALL\n")
      s"$qmTrainChainSql\n$sel"
    },

    // Train→score end to end: the optimization chain + one scoring pass
    // under the learned weights, in a single statement.
    "text_quality_train_scores" -> {
      val d = graft.ops.QualityModel.Dim
      val dot = (0 until d).map(j => s"w$j*x$j").mkString(" + ")
      s"""$qmTrainChainSql
         |SELECT doc_id, score, score >= 0.5 AS predicted FROM (
         |  SELECT doc_id,
         |         round(1.0 / (1.0 + exp(-($dot))), 6) AS score
         |  FROM qf, ws${graft.ops.QualityModel.Steps}
         |)""".stripMargin
    },

    // Eval-card twin: the SAME train chain + scoring pass, fanned ×9
    // against the threshold list into confusion counts and null-safe
    // precision/recall/F1 (nullif denominators, direct-form F1).
    "text_quality_eval" -> {
      val d = graft.ops.QualityModel.Dim
      val dot = (0 until d).map(j => s"w$j*x$j").mkString(" + ")
      s"""$qmTrainChainSql, qscored AS (
         |  SELECT doc_id, y,
         |         round(1.0 / (1.0 + exp(-($dot))), 6) AS score
         |  FROM qf, ws${graft.ops.QualityModel.Steps}
         |), qth AS (
         |  SELECT CAST(x AS DOUBLE) / CAST(10.0 AS DOUBLE) AS threshold
         |  FROM (SELECT unnest(range(1, 10)) AS x)
         |), qconf AS (
         |  SELECT threshold,
         |    CAST(sum(CASE WHEN score >= threshold AND y = 1.0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN score >= threshold AND y = 0.0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN score < threshold AND y = 1.0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |    CAST(sum(CASE WHEN score < threshold AND y = 0.0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM qscored, qth GROUP BY threshold
         |)
         |SELECT threshold, tp, fp, fn, tn,
         |       round(tp / CAST(nullif(tp + fp, 0) AS DOUBLE), 6) AS precision,
         |       round(tp / CAST(nullif(tp + fn, 0) AS DOUBLE), 6) AS recall,
         |       round(2 * tp / CAST(nullif(2 * tp + fp + fn, 0) AS DOUBLE), 6)
         |         AS f1
         |FROM qconf""".stripMargin
    },

    // Percentile twin (TextAnalysis.qualityPercentiles): DuckDB's
    // quantile_cont uses the same sorted-linear-interpolation definition
    // as Spark's exact percentile; both sides round to 6 dp.
    "text_quality_percentiles" -> {
      val pcols = Seq("n_tokens", "stopword_ratio", "punct_ratio").flatMap {
        m => QualityPs.map { p =>
          s"round(quantile_cont($m, $p), 6) AS p${(p * 100).toInt}_$m"
        }
      }.mkString(",\n       ")
      s"""WITH $rawToksSql, scored AS (
         |  SELECT doc_id,
         |$langScoresSql
         |  FROM toks
         |), best AS (
         |  SELECT *, greatest(en_score, fr_score, de_score) AS top FROM scored
         |), langed AS (
         |  SELECT doc_id,
         |         CASE WHEN en_score = top AND top > 0 THEN 'en'
         |              WHEN fr_score = top AND top > 0 THEN 'fr'
         |              WHEN de_score = top AND top > 0 THEN 'de'
         |              ELSE 'unknown' END AS predicted_lang
         |  FROM best
         |), $gateSql
         |SELECT predicted_lang, count(*) AS n_docs,
         |       $pcols
         |FROM langed JOIN q USING (doc_id)
         |GROUP BY predicted_lang""".stripMargin
    },

    // GK percentile audit twin (TextAnalysis.qualityPercentilesAudit):
    // exact n_tokens percentiles + the rank-space sketch contract pinned
    // TRUE per percentile.
    "text_quality_percentiles_audit" -> {
      val pcols = QualityPs.map { p =>
        s"""round(quantile_cont(n_tokens, $p), 6)
           |         AS p${(p * 100).toInt}_n_tokens,
           |       TRUE AS p${(p * 100).toInt}_ok""".stripMargin
      }.mkString(",\n       ")
      s"""WITH $rawToksSql, scored AS (
         |  SELECT doc_id,
         |$langScoresSql
         |  FROM toks
         |), best AS (
         |  SELECT *, greatest(en_score, fr_score, de_score) AS top FROM scored
         |), langed AS (
         |  SELECT doc_id,
         |         CASE WHEN en_score = top AND top > 0 THEN 'en'
         |              WHEN fr_score = top AND top > 0 THEN 'fr'
         |              WHEN de_score = top AND top > 0 THEN 'de'
         |              ELSE 'unknown' END AS predicted_lang
         |  FROM best
         |), $gateSql
         |SELECT predicted_lang, count(*) AS n_docs,
         |       $pcols
         |FROM langed JOIN q USING (doc_id)
         |GROUP BY predicted_lang""".stripMargin
    },

    // TTR twin (TextAnalysis.typeTokenRatio).
    "text_ttr" ->
      s"""WITH $rawToksSql
         |SELECT doc_id,
         |       CAST(len(t) AS INT) AS n_tokens,
         |       CAST(len(list_distinct(t)) AS INT) AS n_types,
         |       round(len(list_distinct(t))
         |             / CAST(greatest(len(t), 1) AS DOUBLE), 6) AS ttr,
         |       round(len(list_distinct(t))
         |             / sqrt(CAST(greatest(len(t), 1) AS DOUBLE)), 6)
         |         AS root_ttr
         |FROM toks""".stripMargin,

    // Normalization twin (TextAnalysis.normalize).
    "text_normalize" ->
      """SELECT doc_id,
        |       lower(trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g')))
        |         AS norm_text,
        |       length(lower(trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g'))))
        |         AS n_chars_norm
        |FROM documents""".stripMargin,

    // Redaction twin (TextAnalysis.redact): same patterns (valid and
    // equivalent in both Java regex and RE2 — no lookaround), same
    // replacement order, counts on the original text via
    // regexp_extract_all ('g' makes replace global like Spark's).
    "text_redact" ->
      s"""SELECT doc_id,
         |       regexp_replace(regexp_replace(regexp_replace(
         |         coalesce(text, ''),
         |         '${TextAnalysis.EmailPattern}', '<EMAIL>', 'g'),
         |         '${TextAnalysis.Ipv4Pattern}', '<IP>', 'g'),
         |         '${TextAnalysis.DigitRunPattern}', '<NUMBER>', 'g')
         |         AS redacted_text,
         |       CAST(len(regexp_extract_all(coalesce(text, ''),
         |         '${TextAnalysis.EmailPattern}')) AS INT) AS n_emails,
         |       CAST(len(regexp_extract_all(coalesce(text, ''),
         |         '${TextAnalysis.Ipv4Pattern}')) AS INT) AS n_ips,
         |       CAST(len(regexp_extract_all(coalesce(text, ''),
         |         '${TextAnalysis.DigitRunPattern}')) AS INT) AS n_digit_runs
         |FROM documents""".stripMargin,

    // TF-IDF twin (TextAnalysis.tfIdf): same ln-based weighting, 6-dp
    // rounding on both engines.
    "text_tfidf" ->
      s"""WITH $rawToksSql, ex AS (
         |  SELECT doc_id, unnest(t) AS term FROM toks
         |), tfs AS (
         |  SELECT doc_id, term, CAST(count(*) AS INT) AS tf
         |  FROM ex GROUP BY doc_id, term
         |), dfs AS (
         |  SELECT term, count(DISTINCT doc_id) AS df FROM ex GROUP BY term
         |), tot AS (
         |  SELECT count(*) AS n_docs FROM documents
         |)
         |SELECT doc_id, term, tf,
         |       round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
         |FROM tfs JOIN dfs USING (term), tot""".stripMargin,

    // Keywords twin (TextAnalysis.keywords): the tfidf CTE + the same
    // (tfidf desc, term) rank at the ROUNDED score.
    "text_keywords" ->
      s"""WITH $rawToksSql, ex AS (
         |  SELECT doc_id, unnest(t) AS term FROM toks
         |), tfs AS (
         |  SELECT doc_id, term, CAST(count(*) AS INT) AS tf
         |  FROM ex GROUP BY doc_id, term
         |), dfs AS (
         |  SELECT term, count(DISTINCT doc_id) AS df FROM ex GROUP BY term
         |), tot AS (
         |  SELECT count(*) AS n_docs FROM documents
         |), scored AS (
         |  SELECT doc_id, term,
         |         round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
         |  FROM tfs JOIN dfs USING (term), tot
         |)
         |SELECT doc_id, rnk, term, tfidf FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INT) AS rnk
         |  FROM scored)
         |WHERE rnk <= 3""".stripMargin,

    // Repetition twin (TextAnalysis.repetition): non-distinct bigrams,
    // two-level aggregation, same null→0 policy for short docs.
    "text_repetition" ->
      s"""WITH $rawToksSql, bg AS (
         |  SELECT doc_id,
         |         CASE WHEN len(t) >= 2
         |           THEN list_transform(range(1, len(t)),
         |                i -> concat(t[CAST(i AS INT)], ' ',
         |                            t[CAST(i AS INT) + 1]))
         |           ELSE [] END AS g
         |  FROM toks
         |), ex AS (
         |  SELECT doc_id, unnest(g) AS g FROM bg
         |), pg AS (
         |  SELECT doc_id, g, count(*) AS c FROM ex GROUP BY doc_id, g
         |), pd AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
         |         max(c) AS top_n
         |  FROM pg GROUP BY doc_id
         |)
         |SELECT d.doc_id,
         |       coalesce(n_bigrams, 0) AS n_bigrams,
         |       coalesce(top_n, 0) AS top_bigram_n,
         |       CASE WHEN n_bigrams IS NOT NULL
         |            THEN round(CAST(top_n AS DOUBLE) / n_bigrams, 6)
         |            ELSE 0.0 END AS top_bigram_share
         |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id""".stripMargin,

    // Gopher rule-report twin (TextRules.gopherReport): same metrics, same
    // Table-A1 thresholds (interpolated from the shared constants).
    "text_gopher_rules" -> {
      val stop = TextRules.GopherStopWords
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH $rawToksSql, gbase AS (
         |  SELECT d.doc_id, coalesce(d.text, '') AS s, k.t AS t,
         |         string_split(coalesce(d.text, ''), chr(10)) AS ls
         |  FROM documents d JOIN toks k ON d.doc_id = k.doc_id
         |), gm AS (
         |  SELECT doc_id,
         |         CAST(len(t) AS INT) AS n_words,
         |         round(CAST(coalesce(list_sum(list_transform(t,
         |                 w -> length(w))), 0) AS DOUBLE)
         |               / greatest(len(t), 1), 6) AS mean_word_len,
         |         round((length(s) - length(replace(s, '#', ''))
         |                + len(regexp_extract_all(s, '\\.\\.\\.'))
         |                + len(regexp_extract_all(s, '…')))
         |               / CAST(greatest(len(t), 1) AS DOUBLE), 6) AS symbol_ratio,
         |         round(len(list_filter(t, w -> regexp_matches(w, '[a-z]')))
         |               / CAST(greatest(len(t), 1) AS DOUBLE), 6) AS alpha_ratio,
         |         round(len(list_filter(ls, l -> starts_with(trim(l), '- ')
         |                 OR starts_with(trim(l), '* ')
         |                 OR starts_with(trim(l), '•')))
         |               / CAST(greatest(len(ls), 1) AS DOUBLE), 6)
         |           AS bullet_line_ratio,
         |         round(len(list_filter(ls, l -> ends_with(trim(l), '...')
         |                 OR ends_with(trim(l), '…')))
         |               / CAST(greatest(len(ls), 1) AS DOUBLE), 6)
         |           AS ellipsis_line_ratio,
         |         CAST(len(list_filter($stop, w -> list_contains(t, w))) AS INT)
         |           AS stop_hits
         |  FROM gbase
         |)
         |SELECT *,
         |       ok_words AND ok_mean_len AND ok_symbols AND ok_bullets
         |         AND ok_ellipsis AND ok_alpha AND ok_stops AS passed
         |FROM (
         |  SELECT *,
         |         n_words >= ${TextRules.GopherMinWords}
         |           AND n_words <= ${TextRules.GopherMaxWords} AS ok_words,
         |         mean_word_len >= ${TextRules.GopherMinMeanWordLen}
         |           AND mean_word_len <= ${TextRules.GopherMaxMeanWordLen}
         |           AS ok_mean_len,
         |         symbol_ratio <= ${TextRules.GopherMaxSymbolRatio} AS ok_symbols,
         |         bullet_line_ratio <= ${TextRules.GopherMaxBulletRatio}
         |           AS ok_bullets,
         |         ellipsis_line_ratio <= ${TextRules.GopherMaxEllipsisRatio}
         |           AS ok_ellipsis,
         |         alpha_ratio >= ${TextRules.GopherMinAlphaRatio} AS ok_alpha,
         |         stop_hits >= ${TextRules.GopherMinStopHits} AS ok_stops
         |  FROM gm
         |)""".stripMargin
    },

    // C4 cleanup twin (TextRules.c4Filters over the wrapped-line view):
    // same 10-token wrap as dedup_lines, same strict/relaxed line rules.
    "text_c4_filters" -> {
      val W = TextRules.C4MinLineWords
      val lw = s"len(list_filter(string_split_regex(trim(l), '\\s+'), " +
        s"w -> len(w) > 0))"
      s"""WITH $rawToksSql, wrapped AS (
         |  SELECT doc_id,
         |         CASE WHEN len(t) > 0 THEN
         |           array_to_string(list_transform(range(0, (len(t) + 9) // 10),
         |             i -> array_to_string(
         |               t[CAST(i*10+1 AS INT):CAST(i*10+10 AS INT)], ' ')),
         |             chr(10))
         |         ELSE '' END AS s
         |  FROM toks
         |), cbase AS (
         |  SELECT doc_id, s, string_split(s, chr(10)) AS ls FROM wrapped
         |), cm AS (
         |  SELECT doc_id,
         |         CAST(len(ls) AS INT) AS n_lines,
         |         CAST(len(list_filter(ls, l ->
         |             regexp_matches(trim(l), '[.!?"]$$') AND $lw >= $W))
         |           AS INT) AS n_kept_strict,
         |         CAST(len(list_filter(ls, l -> $lw >= $W)) AS INT)
         |           AS n_kept_relaxed,
         |         array_to_string(list_filter(ls, l -> $lw >= $W), chr(10))
         |           AS clean_text,
         |         contains(lower(s), 'lorem ipsum') AS has_lorem,
         |         contains(s, '{') AS has_brace,
         |         CAST(len(regexp_extract_all(s, '[.!?]')) AS INT)
         |           AS n_sentences
         |  FROM cbase
         |)
         |SELECT *, n_sentences >= ${TextRules.C4MinSentences} AS ok_sentences,
         |       NOT has_lorem AND NOT has_brace AS doc_pass
         |FROM cm""".stripMargin
    },

    // PMI collocation twin (TextRules.pmiBigrams): same pair/unigram
    // counts, same ln PMI, same (pmi desc, w1, w2) top-k.
    "text_pmi_bigrams" ->
      s"""WITH $rawToksSql, ex AS (
         |  SELECT unnest(t) AS term FROM toks
         |), uni AS (
         |  SELECT term, count(*) AS c1 FROM ex GROUP BY term
         |), tot AS (SELECT sum(c1) AS n_total FROM uni),
         |bg AS (
         |  SELECT unnest(list_transform(range(1, len(t)),
         |         i -> concat(t[CAST(i AS INT)], ' ',
         |                     t[CAST(i AS INT) + 1]))) AS g
         |  FROM toks WHERE len(t) >= 2
         |), pg AS (
         |  SELECT g, count(*) AS c_pair FROM bg GROUP BY g
         |  HAVING count(*) >= ${TextRules.PmiMinCount}
         |), sp AS (
         |  SELECT string_split(g, ' ')[1] AS w1,
         |         string_split(g, ' ')[2] AS w2, c_pair
         |  FROM pg
         |)
         |SELECT w1, w2, c_pair, u1.c1 AS c_w1, u2.c1 AS c_w2,
         |       round(ln(CAST(c_pair AS DOUBLE) * n_total
         |                / (CAST(u1.c1 AS DOUBLE) * u2.c1)), 6) AS pmi
         |FROM sp JOIN uni u1 ON sp.w1 = u1.term
         |        JOIN uni u2 ON sp.w2 = u2.term, tot
         |ORDER BY pmi DESC, w1, w2
         |LIMIT ${TextRules.PmiTopK}""".stripMargin,

    // Char-entropy twin (TextRules.charEntropy): identical fixed alphabet,
    // identical count formulas, identical left-to-right summation order.
    // Encoding-screen twin (TextRules.encodingScreen): identical substring
    // counts (length − length(replace)), the same RE2/Java-compatible
    // character classes, thresholds interpolated from the shared constants.
    "text_encoding_screen" -> {
      val moji = TextRules.MojibakeSignatures
        .map(sig =>
          s"(length(t) - length(replace(t, '$sig', ''))) // ${sig.length}")
        .mkString(" + ")
      s"""WITH eb AS (
         |  SELECT doc_id, coalesce(text, '') AS t FROM documents
         |), em AS (
         |  SELECT doc_id,
         |         length(t) AS n,
         |         length(t) - length(replace(t, '�', ''))
         |           AS n_replacement,
         |         length(t) - length(regexp_replace(t,
         |           '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'))
         |           AS n_control,
         |         length(t) - length(regexp_replace(t,
         |           '[\\x20-\\x7E]', '', 'g')) AS n_ascii,
         |         $moji AS n_mojibake
         |  FROM eb
         |)
         |SELECT doc_id,
         |       CAST(n AS INT) AS n_chars,
         |       CAST(n_replacement AS BIGINT) AS n_replacement,
         |       CAST(n_control AS BIGINT) AS n_control,
         |       CAST(n_mojibake AS BIGINT) AS n_mojibake,
         |       round(n_control / CAST(greatest(n, 1) AS DOUBLE), 6)
         |         AS control_ratio,
         |       round(n_ascii / CAST(greatest(n, 1) AS DOUBLE), 6)
         |         AS ascii_ratio,
         |       (n_replacement > 0 OR n_mojibake > 0
         |        OR round(n_control / CAST(greatest(n, 1) AS DOUBLE), 6)
         |           > ${TextRules.EncMaxControlRatio}) AS encoding_suspect
         |FROM em""".stripMargin
    },

    "text_char_entropy" -> {
      val cnts = TextRules.EntropyAlphabet
        .map(c => s"length(s) - length(replace(s, '$c', ''))")
        .mkString(", ")
      s"""WITH ebase AS (
         |  SELECT doc_id, lower(coalesce(text, '')) AS s FROM documents
         |), ec AS (
         |  SELECT doc_id, length(s) AS n, list_value($cnts) AS kc FROM ebase
         |), ee AS (
         |  SELECT doc_id, n,
         |         list_sum(list_transform(list_append(kc, n - list_sum(kc)),
         |           x -> CASE WHEN x > 0 THEN
         |                  -(x / CAST(greatest(n, 1) AS DOUBLE))
         |                    * log2(x / CAST(greatest(n, 1) AS DOUBLE))
         |                ELSE 0.0 END)) AS h
         |  FROM ec
         |)
         |SELECT doc_id, CAST(n AS INT) AS n_chars,
         |       round(CASE WHEN n > 0 THEN h ELSE 0.0 END, 6) AS char_entropy
         |FROM ee""".stripMargin
    },

    // Unigram-LM twin (TextAnalysis.unigramLogProb): same add-one-smoothed
    // distribution, 6-dp rounding absorbs double-summation order.
    "text_unigram_logprob" ->
      s"""WITH $rawToksSql, ex AS (
         |  SELECT doc_id, unnest(t) AS term FROM toks
         |), freq AS (
         |  SELECT term, count(*) AS tc FROM ex GROUP BY term
         |), consts AS (
         |  SELECT sum(tc) AS total, count(*) AS vocab FROM freq
         |), scored AS (
         |  SELECT doc_id,
         |         round(avg(log10(CAST(tc + 1 AS DOUBLE) / (total + vocab))),
         |               6) AS avg_logprob,
         |         CAST(count(*) AS INT) AS n_tokens
         |  FROM ex JOIN freq USING (term), consts
         |  GROUP BY doc_id
         |)
         |SELECT d.doc_id, avg_logprob,
         |       coalesce(n_tokens, 0) AS n_tokens
         |FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id""".stripMargin,

    // DSIR importance-weight twin (Curation.dsirWeights): same hashed
    // buckets, same gate-defined target, same smoothed mean log-ratio.
    "text_dsir_weights" ->
      s"""WITH $dsirCtesSql
         |SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens, dsir_logratio
         |FROM documents d LEFT JOIN dscored s ON d.doc_id = s.doc_id""".stripMargin,

    // Bigram-LM fluency twin (TextAnalysis.bigramLogProb): the pair stream
    // is the token list zipped with its own tail (two aligned unnests),
    // counts joined back by pair and by context word, add-one smoothing
    // over the unigram vocabulary — identical arithmetic, 6-dp rounded.
    "text_bigram_logprob" ->
      s"""WITH $rawToksSql, bg AS (
         |  SELECT doc_id, unnest(t[1:len(t)-1]) AS w1,
         |         unnest(t[2:len(t)]) AS w2
         |  FROM toks WHERE len(t) >= 2
         |), uni AS (
         |  SELECT unnest(t) AS term FROM toks
         |), uc AS (SELECT term, count(*) AS c1 FROM uni GROUP BY term),
         |bc AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
         |consts AS (SELECT count(*) AS vocab FROM uc),
         |scored AS (
         |  SELECT doc_id,
         |         round(avg(log10(CAST(c2 + 1 AS DOUBLE) / (c1 + vocab))),
         |               6) AS avg_logprob,
         |         CAST(count(*) AS INT) AS n_bigrams
         |  FROM bg JOIN bc USING (w1, w2) JOIN uc ON bg.w1 = uc.term, consts
         |  GROUP BY doc_id
         |)
         |SELECT d.doc_id, avg_logprob,
         |       coalesce(n_bigrams, 0) AS n_bigrams
         |FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id""".stripMargin,

    "text_term_stats" ->
      s"""WITH $rawToksSql, ex AS (
         |  SELECT doc_id, unnest(t) AS term FROM toks
         |)
         |SELECT term, count(DISTINCT doc_id) AS doc_freq,
         |       count(*) AS total_count
         |FROM ex GROUP BY term""".stripMargin,

    // HLL term-stats audit twin (TextAnalysis.termStatsAudit): exact term
    // stats + the within-3·rsd doc-frequency contract pinned to TRUE.
    "text_term_stats_audit" ->
      s"""WITH $rawToksSql, ex AS (
         |  SELECT doc_id, unnest(t) AS term FROM toks
         |)
         |SELECT term, count(DISTINCT doc_id) AS doc_freq,
         |       count(*) AS total_count, TRUE AS within_tol
         |FROM ex GROUP BY term""".stripMargin,

    // Count-Min audit twin (TextAnalysis.termCountsCmsAudit): exact counts
    // over the langs × watch-list grid + the two CMS contracts pinned to
    // TRUE (estimate ≥ exact always; ≤ exact + 2·⌈(e/width)·N_lang⌉, the
    // ε·N band doubled because it is probabilistic per counter —
    // deterministic for a fixed corpus, the sketch state is a pure sum).
    // The langs grid derives from the TOKENIZED side (ex), not documents:
    // explode drops empty token arrays, so a language whose docs all
    // tokenize to nothing never reaches the Spark audit either.
    "text_term_cms_audit" -> {
      val watchList = graft.ops.TextAnalysis.CmsWatchTerms
        .map(t => s"'$t'").mkString(", ")
      s"""WITH $rawToksSql, ex AS (
         |  SELECT d.lang, unnest(k.t) AS term
         |  FROM toks k JOIN documents d ON d.doc_id = k.doc_id
         |), watch AS (SELECT unnest([$watchList]) AS term),
         |langs AS (SELECT DISTINCT lang FROM ex),
         |exact AS (
         |  SELECT lang, term, count(*) AS term_count FROM ex
         |  WHERE term IN ($watchList) GROUP BY 1, 2
         |)
         |SELECT l.lang, w.term,
         |       coalesce(x.term_count, 0) AS term_count,
         |       TRUE AS not_below, TRUE AS within_tol
         |FROM langs l CROSS JOIN watch w
         |LEFT JOIN exact x ON x.lang = l.lang AND x.term = w.term""".stripMargin
    },

    // Exact heavy-terms twin (TextAnalysis.heavyTermsExact): same count
    // aggregate + rank window, term tie-break, so both engines agree
    // bit-for-bit. The MG sketch variant stays rows-only.
    "text_heavy_terms_exact" ->
      s"""WITH $rawToksSql, ex AS (
         |  SELECT d.lang, unnest(k.t) AS term
         |  FROM toks k JOIN documents d ON d.doc_id = k.doc_id
         |), counts AS (
         |  SELECT lang, term, count(*) AS term_count FROM ex GROUP BY 1, 2
         |)
         |SELECT lang,
         |       CAST(row_number() OVER (
         |         PARTITION BY lang ORDER BY term_count DESC, term) AS INT)
         |         AS rank,
         |       term, term_count
         |FROM counts
         |QUALIFY rank <= 10""".stripMargin,

    "text_langid" ->
      s"""WITH $rawToksSql, scored AS (
         |  SELECT doc_id,
         |$langScoresSql
         |  FROM toks
         |), best AS (
         |  SELECT *, greatest(en_score, fr_score, de_score) AS top FROM scored
         |)
         |SELECT doc_id,
         |       CASE WHEN en_score = top AND top > 0 THEN 'en'
         |            WHEN fr_score = top AND top > 0 THEN 'fr'
         |            WHEN de_score = top AND top > 0 THEN 'de'
         |            ELSE 'unknown' END AS predicted_lang,
         |       round(en_score, 6) AS en_score,
         |       round(fr_score, 6) AS fr_score,
         |       round(de_score, 6) AS de_score
         |FROM best""".stripMargin,

    // Fertility twin (TextAnalysis.fertilityByLang): same inlined lang
    // argmax, word/subword/char sums per language, ratios off the sums.
    "text_fertility" ->
      s"""WITH $rawToksSql, fsc AS (
         |  SELECT d.doc_id,
         |$langScoresSql,
         |         len(k.t) AS ws_tokens,
         |         coalesce(len(regexp_extract_all(d.text,
         |           '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')), 0) AS bpeish_tokens,
         |         coalesce(length(d.text), 0) AS n_chars
         |  FROM documents d JOIN toks k ON d.doc_id = k.doc_id
         |), fbest AS (
         |  SELECT *, greatest(en_score, fr_score, de_score) AS top FROM fsc
         |), flang AS (
         |  SELECT CASE WHEN en_score = top AND top > 0 THEN 'en'
         |              WHEN fr_score = top AND top > 0 THEN 'fr'
         |              WHEN de_score = top AND top > 0 THEN 'de'
         |              ELSE 'unknown' END AS lang,
         |         ws_tokens, bpeish_tokens, n_chars
         |  FROM fbest
         |)
         |SELECT lang, count(*) AS n_docs,
         |       CAST(sum(ws_tokens) AS BIGINT) AS total_words,
         |       CAST(sum(bpeish_tokens) AS BIGINT) AS total_subwords,
         |       round(CAST(sum(bpeish_tokens) AS DOUBLE)
         |         / greatest(sum(ws_tokens), 1), 6) AS fertility,
         |       round(CAST(sum(n_chars) AS DOUBLE)
         |         / greatest(sum(bpeish_tokens), 1), 6) AS chars_per_subword
         |FROM flang GROUP BY lang""".stripMargin,

    // Zipf-fit twin (TextAnalysis.zipfFit): same top-1000 cut, same rank
    // window, same closed-form least squares off the five sums.
    "text_zipf_fit" ->
      s"""WITH $rawToksSql, zex AS (
         |  SELECT unnest(t) AS term FROM toks
         |), ztc AS (SELECT term, count(*) AS c FROM zex GROUP BY term),
         |ztop AS (SELECT term, c FROM ztc ORDER BY c DESC, term LIMIT 1000),
         |zrk AS (
         |  SELECT c, row_number() OVER (ORDER BY c DESC, term) AS r
         |  FROM ztop
         |), zpt AS (SELECT log10(r) AS x, log10(c) AS y FROM zrk),
         |zs AS (
         |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         |         sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy
         |  FROM zpt
         |)
         |SELECT CAST(n AS INT) AS n_terms,
         |       CASE WHEN n*sxx - sx*sx > 0
         |            THEN round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) END
         |         AS slope,
         |       CASE WHEN n*sxx - sx*sx > 0
         |            THEN round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx)
         |                       / n, 6) END AS intercept,
         |       CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
         |            THEN round(((n*sxy - sx*sy) * (n*sxy - sx*sy))
         |                       / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) END
         |         AS r2
         |FROM zs""".stripMargin,

    "text_langid_ngram" -> {
      def prof(lang: String): String =
        TextAnalysis.TrigramProfiles.toMap.apply(lang)
          .map(t => s"'${t}'").mkString("[", ", ", "]")
      val scores = TextAnalysis.TrigramProfiles.map { case (lang, _) =>
        s"""len(list_filter(tg, t -> list_contains(${prof(lang)}, t)))
           |  / CAST(greatest(len(tg), 1) AS DOUBLE) AS ${lang}_tg"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH grams AS (
         |  SELECT doc_id,
         |         CASE WHEN length(lt) >= 3
         |           THEN list_transform(range(1, length(lt) - 1),
         |                i -> substr(lt, CAST(i AS INT), 3))
         |           ELSE [] END AS tg
         |  FROM (SELECT doc_id, lower(text) AS lt FROM documents)
         |), scored AS (
         |  SELECT doc_id,
         |$scores
         |  FROM grams
         |), best AS (
         |  SELECT *, greatest(en_tg, fr_tg, de_tg) AS top FROM scored
         |)
         |SELECT doc_id,
         |       CASE WHEN en_tg = top AND top > 0 THEN 'en'
         |            WHEN fr_tg = top AND top > 0 THEN 'fr'
         |            WHEN de_tg = top AND top > 0 THEN 'de'
         |            ELSE 'unknown' END AS predicted_lang,
         |       round(en_tg, 6) AS en_score,
         |       round(fr_tg, 6) AS fr_score,
         |       round(de_tg, 6) AS de_score
         |FROM best""".stripMargin
    },

    // Agreement-matrix twin: both classifiers' argmax CTEs joined and
    // cross-tabulated.
    "text_lang_agreement" -> {
      def prof(lang: String): String =
        TextAnalysis.TrigramProfiles.toMap.apply(lang)
          .map(t => s"'${t}'").mkString("[", ", ", "]")
      val tscores = TextAnalysis.TrigramProfiles.map { case (lang, _) =>
        s"""len(list_filter(tg, t -> list_contains(${prof(lang)}, t)))
           |  / CAST(greatest(len(tg), 1) AS DOUBLE) AS ${lang}_tg"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH $rawToksSql, wsc AS (
         |  SELECT doc_id,
         |$langScoresSql
         |  FROM toks
         |), wbest AS (
         |  SELECT *, greatest(en_score, fr_score, de_score) AS top FROM wsc
         |), wl AS (
         |  SELECT doc_id,
         |         CASE WHEN en_score = top AND top > 0 THEN 'en'
         |              WHEN fr_score = top AND top > 0 THEN 'fr'
         |              WHEN de_score = top AND top > 0 THEN 'de'
         |              ELSE 'unknown' END AS word_lang
         |  FROM wbest
         |), tgrams AS (
         |  SELECT doc_id,
         |         CASE WHEN length(lt) >= 3
         |           THEN list_transform(range(1, length(lt) - 1),
         |                i -> substr(lt, CAST(i AS INT), 3))
         |           ELSE [] END AS tg
         |  FROM (SELECT doc_id, lower(text) AS lt FROM documents)
         |), tsc AS (
         |  SELECT doc_id,
         |$tscores
         |  FROM tgrams
         |), tbest AS (
         |  SELECT *, greatest(en_tg, fr_tg, de_tg) AS top FROM tsc
         |), tl AS (
         |  SELECT doc_id,
         |         CASE WHEN en_tg = top AND top > 0 THEN 'en'
         |              WHEN fr_tg = top AND top > 0 THEN 'fr'
         |              WHEN de_tg = top AND top > 0 THEN 'de'
         |              ELSE 'unknown' END AS trigram_lang
         |  FROM tbest
         |), acells AS (
         |  SELECT word_lang, trigram_lang, count(*) AS n_docs
         |  FROM wl JOIN tl USING (doc_id)
         |  GROUP BY 1, 2
         |), atot AS (SELECT sum(n_docs) AS t FROM acells)
         |SELECT word_lang, trigram_lang, n_docs,
         |       round(n_docs / CAST(greatest(t, 1) AS DOUBLE), 6) AS share,
         |       (word_lang = trigram_lang) AS agree
         |FROM acells, atot""".stripMargin
    },

    "text_quality" -> {
      val stop = TextAnalysis.LangMarkers.flatMap(_._2)
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH $rawToksSql
         |SELECT d.doc_id,
         |       CAST(length(d.text) AS INT) AS n_chars,
         |       CAST(len(k.t) AS INT) AS n_tokens,
         |       round(CAST(coalesce(list_sum(list_transform(k.t, w -> len(w))), 0)
         |           AS DOUBLE)
         |         / greatest(len(k.t), 1), 6) AS mean_token_len,
         |       round(CAST(len(list_filter(k.t,
         |           w -> list_contains($stop, w))) AS DOUBLE)
         |         / greatest(len(k.t), 1), 6) AS stopword_ratio,
         |       round(CAST(length(d.text)
         |           - length(regexp_replace(d.text, '[.,!?;:]', '', 'g'))
         |         AS DOUBLE) / greatest(length(d.text), 1), 6) AS punct_ratio
         |FROM documents d JOIN toks k ON d.doc_id = k.doc_id""".stripMargin
    },

    "text_quality_gate" ->
      s"""WITH $rawToksSql, $gateSql
         |SELECT doc_id, reject_reason IS NULL AS passed, reject_reason
         |FROM gated""".stripMargin,

    // fastText-style hashed-gram scorer twin: unigrams + word bigrams,
    // each hashed to a bucket (the md5 family), bucket weight from the
    // SAME modular formula as TextAnalysis.QualityScoreWeights; exact
    // integer sum, then one logistic + round. Docs with no grams (empty/
    // null text) score sigmoid(0) = 0.5 via the left join's coalesce —
    // mirroring the Spark side's per-row kernel over an empty array.
    "text_quality_score" ->
      s"""WITH $qualityScoreCtesSql
         |SELECT doc_id, n_grams, raw_score, quality_score
         |FROM qsout""".stripMargin,

    "text_token_counts" ->
      s"""WITH $rawToksSql
         |SELECT d.doc_id,
         |       CAST(len(k.t) AS INT) AS ws_tokens,
         |       CAST(len(regexp_extract_all(d.text,
         |         '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS INT) AS bpeish_tokens,
         |       round(CAST(length(d.text) AS DOUBLE)
         |         / greatest(len(k.t), 1), 6) AS chars_per_token
         |FROM documents d JOIN toks k ON d.doc_id = k.doc_id""".stripMargin,

    "text_fingerprint" ->
      s"""WITH $rawToksSql, hs AS (
         |  SELECT doc_id,
         |         list_transform(t, w ->
         |           ${hashSql("'0:'")} % ${TextAnalysis.FingerprintMod}) AS h
         |  FROM toks
         |)
         |SELECT doc_id,
         |       list_reduce(list_prepend(CAST(0 AS BIGINT), h),
         |         (a, b) -> (a * 131 + b) % ${TextAnalysis.FingerprintMod})
         |         AS fingerprint
         |FROM hs""".stripMargin,

    // BM25 twin — expression shapes mirror TextAnalysis.bm25TopK token
    // for token (one combination order, micro-unit integer sums).
    "text_bm25_topk" -> {
      val terms = TextAnalysis.Bm25QueryTerms
        .map(t => s"'$t'").mkString(", ")
      val k1 = TextAnalysis.Bm25K1
      val b = TextAnalysis.Bm25B
      s"""WITH $rawToksSql, blen AS (
         |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
         |), bstat AS (
         |  SELECT count(*) AS n_docs, sum(dl) AS total_len FROM blen
         |), btf AS (
         |  SELECT doc_id, term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(t) AS term FROM toks)
         |  WHERE term IN ($terms)
         |  GROUP BY doc_id, term
         |), bdf AS (
         |  SELECT term, count(*) AS df FROM btf GROUP BY term
         |), bscore AS (
         |  SELECT btf.doc_id,
         |         CAST(round(
         |           ln(1 + (n_docs - df + 0.5) / (df + 0.5))
         |           * ((tf * (CAST($k1 AS DOUBLE) + 1))
         |              / (tf + CAST($k1 AS DOUBLE)
         |                 * (1 - CAST($b AS DOUBLE) + CAST($b AS DOUBLE) * dl
         |                    / (CAST(total_len AS DOUBLE) / n_docs))))
         |           * 1000000) AS BIGINT) AS s
         |  FROM btf
         |  JOIN bdf USING (term)
         |  JOIN blen USING (doc_id), bstat
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
         |       CAST(sum(s) AS BIGINT) AS score_micro
         |FROM bscore GROUP BY doc_id
         |ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin
    },
  )
}
