package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML→text extraction — the stage-zero ingest step every web-crawl LLM
  * corpus needs before any downstream rule (trafilatura/jusText shape:
  * strip script/style/comments/tags, decode entities, normalize
  * whitespace; then per-BLOCK link-density boilerplate rules). The
  * reference pipeline ingests clean JSON telemetry
  * (`/root/reference/spark_processing/data_persistance.py:75-99` parses
  * `from_json` on an already-structured payload), so this family is a
  * north-star extension, not parity.
  *
  * Everything here is a pure per-document projection built from
  * codegen'd string functions (`regexp_replace`/`replace`/`split`) —
  * ZERO shuffles, so extraction runs at scan speed on 100 TB of crawl.
  * Ratios are integer micro-units with floor division so the DuckDB
  * twins replay them bit-exactly (no float rounding seam).
  *
  * The fixture has no raw-HTML column, so [[pageFromWords]] synthesizes a
  * deterministic page from each document's own words — title/h1, two
  * paragraphs, a nav div of anchors, a footer, plus script/style/comment
  * traps (the script body contains a bare `<` — the classic naive
  * tag-strip breaker). The page is derived identically in the oracle's
  * SQL, and the extraction oracle then constructs the EXPECTED clean text
  * directly from the word slices — an independent derivation, not a
  * replay of the engine's regexes.
  */
object Html {

  /** Blocks with link density above this (micro-units) are boilerplate —
    * the jusText "good/bad" link-density cut. */
  val BoilerplateLinkDensityMicro: Long = 500000L

  /** Blocks shorter than this many extracted chars are boilerplate
    * regardless of link density (jusText length-low cut). */
  val BoilerplateMinChars: Int = 10

  // ── Synthetic page ──────────────────────────────────────────────────

  /** `(doc_id, html)`: deterministic single-line page from the doc's own
    * words. Word slices (1-based, inclusive): title = w[1..3],
    * nav = w[1..2], p1 = w[4..n/2], p2 = w[n/2+1..n]; fixture docs hold
    * ≥ 10 words at every sf, so every slice is non-empty. */
  def pageFromWords(docs: DataFrame): DataFrame = {
    val w = split(trim(col("text")), " ")
    val n = size(w)
    val half = (n / 2).cast("int") // n ≥ 10 > 0: truncation IS floor
    val title = array_join(slice(w, 1, 3), " ")
    val nav = array_join(slice(w, 1, 2), " ")
    val p1 = array_join(slice(w, lit(4), half - 3), " ")
    val p2 = array_join(slice(w, half + 1, n - half), " ")
    docs.select(
      col("doc_id"),
      concat(
        lit("<html><head><title>"), title, lit("</title>"),
        lit("<style>p { margin: 0; }</style>"),
        lit("<script>var t = 1 < 2 && \"x\";</script></head>"),
        lit("<body><!-- doc "), col("doc_id"), lit(" -->"),
        lit("<h1>"), title, lit("</h1>"),
        lit("<p>"), p1, lit(" &amp; more</p>"),
        lit("<div class=\"nav\"><a href=\"/a\">"), nav,
        lit("</a> <a href=\"/b\">menu link</a></div>"),
        lit("<p>"), p2, lit("</p>"),
        lit("<footer><a href=\"/c\">copyright &copy; "), nav,
        lit("</a></footer></body></html>")).alias("html"))
  }

  // ── Extraction primitives ───────────────────────────────────────────

  /** Decode the HTML entities the extractor guarantees (`&amp;` last so
    * double-encoded text never double-decodes). */
  def decodeEntities(c: Column): Column = {
    val steps = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&copy;" -> "©", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from),
        java.util.regex.Matcher.quoteReplacement(to))
    }
  }

  /** Full-page clean text: script/style blocks die WITH their content
    * (a bare `<` inside a script must not derail tag stripping), then
    * comments, then tags→space, entity decode, whitespace collapse.
    * All patterns are RE2-compatible (no backreferences/lookaround) so
    * the DuckDB block twin can replay them verbatim. */
  def extractText(html: Column): Column = {
    val noScript =
      regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    trim(regexp_replace(decodeEntities(noTags), "\\s+", " "))
  }

  /** `(doc_id, text_clean, n_chars)` over the synthesized pages — the
    * query face whose oracle derives the expectation independently. */
  def extracted(docs: DataFrame): DataFrame =
    pageFromWords(docs).select(
      col("doc_id"),
      extractText(col("html")).alias("text_clean"))
      .withColumn("n_chars", length(col("text_clean")).cast("int"))

  // ── Block-level boilerplate rules ───────────────────────────────────

  /** Block-level boundaries the page model recognizes. Alternation, not a
    * backreference (`</\1>` would be exact but RE2 — the oracle's engine —
    * has no backreferences). */
  val BlockPattern: String =
    "<h1>.*?</h1>|<p>.*?</p>|<div[^>]*>.*?</div>|<footer>.*?</footer>"

  /** jusText-shaped per-block report:
    * `(doc_id, block_idx, text_len, link_len, link_density_micro,
    * is_boilerplate)`. Density is `1e6·link_len // text_len` in integer
    * micro-units (empty block ⇒ 1e6: an all-markup block is pure
    * boilerplate); the flag trips on density > 0.5 or text under
    * [[BoilerplateMinChars]] chars. posexplode keeps 1-based block order
    * without any window, and the whole thing stays a projection —
    * zero Exchanges. */
  def blockReport(docs: DataFrame): DataFrame = {
    val blocks = regexp_extract_all(col("html"), lit(BlockPattern), lit(0))
    val inner = trim(regexp_replace(
      decodeEntities(regexp_replace(col("block"), "<[^>]+>", " ")),
      "\\s+", " "))
    val linkText = decodeEntities(trim(regexp_replace(
      array_join(
        regexp_extract_all(col("block"), lit("<a[^>]*>(.*?)</a>"), lit(1)),
        " "),
      "\\s+", " ")))
    pageFromWords(docs)
      .select(col("doc_id"), posexplode(blocks).as(Seq("i", "block")))
      .withColumn("block_idx", (col("i") + 1).cast("int"))
      .withColumn("text_len", length(inner).cast("long"))
      .withColumn("link_len", length(linkText).cast("long"))
      .withColumn("link_density_micro",
        when(col("text_len") > 0,
          expr("(1000000 * link_len) div text_len"))
          .otherwise(lit(1000000L)))
      .withColumn("is_boilerplate",
        col("link_density_micro") > BoilerplateLinkDensityMicro ||
          col("text_len") < BoilerplateMinChars)
      .select(col("doc_id"), col("block_idx"), col("text_len"),
        col("link_len"), col("link_density_micro"), col("is_boilerplate"))
  }

  /** Boilerplate-removed clean text per document — the composed ingest
    * output (content blocks only, joined in block order). Still a pure
    * projection: the block array is filtered and re-joined INSIDE one
    * row, never exploded, so nothing shuffles.
    *
    * The keep predicate is the [[blockReport]] flag negated, written as
    * exact integer CROSS-multiplication: `density_micro > bar` with
    * density = `⌊1e6·link/text⌋` is provably `1e6·link ≥ (bar+1)·text`
    * (floor(q) > K ⟺ q ≥ K+1 for integer K), so no division happens at
    * all and both engines agree bit-for-bit.
    *
    * The filter() lambda is interpreted (HOF CodegenFallback), but it
    * runs over ≤ 5 block strings per row — unlike the w=4 shingle HOF
    * this cannot dominate; the extraction regexes dwarf it. */
  def mainText(docs: DataFrame): DataFrame = {
    val blocks = regexp_extract_all(col("html"), lit(BlockPattern), lit(0))
    def innerLen(x: Column): Column = length(trim(regexp_replace(
      decodeEntities(regexp_replace(x, "<[^>]+>", " ")), "\\s+", " ")))
    def linkLen(x: Column): Column = length(decodeEntities(trim(
      regexp_replace(
        array_join(
          regexp_extract_all(x, lit("<a[^>]*>(.*?)</a>"), lit(1)), " "),
        "\\s+", " "))))
    val kept = filter(blocks, x =>
      innerLen(x) >= BoilerplateMinChars &&
        lit(1000000L) * linkLen(x) <
          lit(BoilerplateLinkDensityMicro + 1) * innerLen(x))
    pageFromWords(docs).select(
      col("doc_id"),
      extractText(array_join(kept, " ")).alias("main_text"))
      .withColumn("n_chars", length(col("main_text")).cast("int"))
  }
}
