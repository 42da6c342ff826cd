package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.harness.StandIn
import graft.ops.{AlertLifecycle, AlertRules, Aggregates, Bpe, Curation, Dedup, Multimodal, Parse, Profile, Sessionize, Similarity, TextAnalysis, TextRules}
import graft.queries.QueryShared._

/** Deduplication family: exact/content-hash, MinHash+LSH, SimHash, n-gram Jaccard, connected components, line/span/incremental dedup and their eval cards.
  *
  * Registry contract: [[queries]] and [[oracleSql]] fold into
  * [[graft.SparkEntry]]; keys must stay globally unique across the
  * Queries* objects (asserted in QueryRegistrySpec).
  */
object QueriesDedup {

  private val JaccardThreshold = 0.3

  private def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(StandIn.documents(s, dir))

  private def dedupContentHash(s: SparkSession, dir: String): DataFrame =
    Dedup.contentHash(StandIn.documents(s, dir))

  private def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashCandidates(StandIn.documents(s, dir),
      MinhashK, MinhashBands, MinhashEstThreshold)

  private def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash(StandIn.documents(s, dir))

  private def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(StandIn.documents(s, dir),
      MinhashK, MinhashBands, MinhashEstThreshold, JaccardThreshold)

  private def dedupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.clusters(StandIn.documents(s, dir),
      MinhashK, MinhashBands, MinhashEstThreshold)

  private def dedupSimhashNearDup(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDup(StandIn.documents(s, dir))

  private def dedupKeepers(s: SparkSession, dir: String): DataFrame =
    Curation.keepers(StandIn.documents(s, dir),
      MinhashK, MinhashBands, MinhashEstThreshold)

  // DuckDB twins of ops/Dedup.scala's hash family and tokenizer — keep in
  // lockstep with Dedup.tokens / Dedup.hashAt / Dedup.minhashSignature.
  // coalesce(text, ''): NULL text ≡ empty document on both engines (the
  // Dedup.tokens contract) — without it DuckDB propagates NULL token lists
  // where Spark now yields [].
  private val toksSql =
    """toks AS (
      |  SELECT doc_id,
      |         list_distinct(list_filter(
      |           string_split_regex(lower(coalesce(text, '')), '\s+'),
      |           w -> len(w) > 0)) AS t
      |  FROM documents
      |)""".stripMargin

  // Non-distinct twin of Dedup.tokens — term statistics and quality metrics
  // are multiset-based.

  // Shared twin of BOTH line-dedup regimes (lineDedup / lineDedupJoin):
  // one SQL string, so the broadcast-set and join-rebuild variants are
  // pinned to byte-identical output.
  private lazy val dedupLinesSql = {
    val L = graft.ops.Dedup.LineDedupMinChars
    val drop = s"p -> NOT (len(p) >= $L AND list_contains(dl, p))"
    s"""WITH $rawToksSql, wrapped AS (
       |  SELECT doc_id,
       |         CASE WHEN len(t) > 0 THEN
       |           array_to_string(list_transform(range(0, (len(t) + 9) // 10),
       |             i -> array_to_string(
       |               t[CAST(i*10+1 AS INT):CAST(i*10+10 AS INT)], ' ')),
       |             chr(10))
       |         ELSE '' END AS text
       |  FROM toks
       |), ln AS (
       |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line
       |  FROM wrapped
       |), dup AS (
       |  SELECT line FROM ln WHERE len(line) >= $L
       |  GROUP BY line HAVING count(*) >= 2
       |), dupset AS (SELECT coalesce(list(line), []) AS dl FROM dup),
       |parts AS (SELECT doc_id, string_split(text, chr(10)) AS ps
       |          FROM wrapped)
       |SELECT doc_id,
       |       CAST(len(ps) AS INT) AS n_lines,
       |       CAST(len(ps) - len(list_filter(ps, $drop)) AS INT)
       |         AS n_dropped,
       |       coalesce(array_to_string(list_filter(ps, $drop), chr(10)), '')
       |         AS text_dedup
       |FROM parts, dupset""".stripMargin
  }

  // Word-bigram shingle sets (Dedup.bigrams, distinct) — the minhash
  // shingling unit.

  // Shared by dedup_clusters / dedup_clusters_bigstar: both implement
  // "label every doc with its component's min id" over the SAME candidate
  // graph, so one recursive-CTE oracle checks both.
  private lazy val clustersOracle =
    s"""WITH RECURSIVE $gramsSql, $sigSql, $bucketsSql, $candidatePairsSql,
       |$componentsSql
       |SELECT doc_id, cluster_id FROM labels""".stripMargin

  // Shared by decontaminate / decontaminate_bloom: the Bloom variant's
  // output is exact, so one oracle serves both and they cannot drift.

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact"         -> ((s, d) => dedupExact(s, d)),

    "dedup_content_hash"  -> ((s, d) => dedupContentHash(s, d)),

    "dedup_minhash_lsh"   -> ((s, d) => dedupMinhashLsh(s, d)),

    // Incremental ingest screen: a deterministic 20% "new snapshot" slice
    // vs the remaining 80% "existing corpus" of the same table — the
    // fixture split scales with the data on both sides (it is a demo
    // partition, not a broadcast bound).
    "dedup_sim_histogram" -> ((s, d) =>
      Dedup.candidateSimHistogram(
        StandIn.documents(s, d), MinhashK, MinhashBands)),

    "dedup_incremental"   -> ((s, d) => {
      val docs = StandIn.documents(s, d)
      Dedup.crossCorpusCandidates(
        docs.where(col("doc_id") % 5 === 0),
        docs.where(col("doc_id") % 5 =!= 0),
        MinhashK, MinhashBands, MinhashEstThreshold)
    }),

    // Cross-snapshot EXACT dedup screen (Bloom-prefiltered content-hash
    // match; output ≡ the plain left join, so one oracle serves). The
    // fixture simulates snapshot N+1: a third of the corpus re-ingested
    // VERBATIM under new ids (must flag as dups) + a third re-ingested
    // with a deterministic edit (must read as novel).
    "dedup_incremental_exact" -> ((s, d) => {
      val docs = StandIn.documents(s, d)
      val reingest = docs.where(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 1000000L).alias("doc_id"), col("text"))
      val edited = docs.where(col("doc_id") % 3 === 1)
        .select((col("doc_id") + 2000000L).alias("doc_id"),
          concat(col("text"), lit(" v2")).alias("text"))
      Dedup.incrementalExact(reingest.unionAll(edited), docs)
    }),

    // Span-level exact-substring dedup: maximal cross-document verbatim
    // token spans (Dedup.substringSpans scaladoc has the shape).
    "dedup_substring_spans" -> ((s, d) =>
      Dedup.substringSpans(StandIn.documents(s, d))),

    // Longest duplicated span per doc PAIR (Lee-et-al suffix-array dedup
    // target): diagonal-aligned shingle runs merged to EXACT span
    // lengths, the longest kept per pair (Dedup.maxSpans scaladoc).
    "dedup_max_spans" -> ((s, d) =>
      Dedup.maxSpans(StandIn.documents(s, d))),

    // Span-dedup one-row report: spans / affected docs / duplicated-token
    // share of the corpus (folds substringSpans + one token-count pass).
    "dedup_span_report" -> ((s, d) => {
      val docs = StandIn.documents(s, d)
      val rep = Dedup.substringSpans(docs).agg(
        count(lit(1)).alias("n_spans"),
        countDistinct(col("doc_id")).alias("n_docs_affected"),
        sum(col("span_tokens").cast("long")).alias("dup_tokens"))
      val tot = docs
        .select(size(Dedup.tokens(col("text"))).cast("long").alias("nt"))
        .agg(sum(col("nt")).alias("n_corpus_tokens"))
      rep.crossJoin(broadcast(tot)).select(
        col("n_spans"), col("n_docs_affected"),
        coalesce(col("dup_tokens"), lit(0L)).alias("dup_tokens"),
        col("n_corpus_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          greatest(col("n_corpus_tokens"), lit(1L)), 6)
          .alias("dup_token_share"))
    }),

    // CCNet-style LINE-level dedup over a deterministic 10-token-per-line
    // re-wrap of the corpus (the fixture ships no newlines; the wrap is a
    // pure map-side projection both engines rebuild identically). Hashes
    // shuffle, a 1-row dup-set broadcasts, text rebuilds in place — no
    // Exchange ever carries a line (Dedup.lineDedup scaladoc).
    "dedup_lines"         -> ((s, d) =>
      Dedup.lineDedup(Dedup.wrapTokenLines(StandIn.documents(s, d)))),

    // Same op, unbounded-vocabulary regime: drop set stays distributed,
    // rebuild is a doc_id join (AQE broadcasts the dropped side from
    // measured size). SAME oracle as dedup_lines — regimes cannot drift.
    "dedup_lines_join"    -> ((s, d) =>
      Dedup.lineDedupJoin(Dedup.wrapTokenLines(StandIn.documents(s, d)))),

    "dedup_simhash"       -> ((s, d) => dedupSimhash(s, d)),

    // Duplicate-family size distribution: clusters folded to a
    // (cluster_size, n_clusters) histogram - "how big are my dup
    // families" (composes Dedup.clusters).
    "dedup_cluster_sizes" -> ((s, d) =>
      Dedup.clusters(StandIn.documents(s, d),
        MinhashK, MinhashBands, MinhashEstThreshold)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).alias("sz"))
        .groupBy(col("sz").cast("int").alias("cluster_size"))
        .agg(count(lit(1)).alias("n_clusters"))),

    // LSH precision eval card: candidates exact-verified in one pass,
    // reduced to (n_candidates, n_confirmed, precision) — the dedup
    // analogue of the ANN recall audits (Dedup.lshPrecision).
    "dedup_lsh_precision" -> ((s, d) =>
      Dedup.lshPrecision(StandIn.documents(s, d),
        MinhashK, MinhashBands, MinhashEstThreshold, JaccardThreshold)),

    "dedup_ngram_jaccard" -> ((s, d) => dedupNgramJaccard(s, d)),

    // Asymmetric doc-in-doc containment: |A∩B| / min(|A|,|B|) over
    // sampled-shingle candidates — the quote/excerpt detector MinHash-LSH
    // (tuned for symmetric Jaccard) structurally misses
    // (Dedup.containment scaladoc has the scale shape).
    "dedup_containment"   -> ((s, d) =>
      Dedup.containment(StandIn.documents(s, d))),

    "dedup_clusters"      -> ((s, d) => dedupClusters(s, d)),

    "dedup_clusters_bigstar" -> ((s, d) =>
      Dedup.clustersBigStar(StandIn.documents(s, d),
        MinhashK, MinhashBands, MinhashEstThreshold)),

    "dedup_simhash_pairs" -> ((s, d) => dedupSimhashNearDup(s, d)),

    "dedup_keepers"       -> ((s, d) => dedupKeepers(s, d)),

    // SemDeDup cluster-then-prune (seeded quantizer face — full hash
    // oracle): coarse cell + SRP bucket equi-join, greedy min-id prune.
    "dedup_semantic"      -> ((s, d) =>
      Similarity.semanticDedup(StandIn.embeddings(s, d), IvfCells, SrpBits,
        NearDupClusterCosine)),

    // The Lloyd-trained-cells face: imperative fit => no SQL twin
    // (rows-only), with every invariant hash-pinned by the _audit below.
    "dedup_semantic_trained" -> ((s, d) =>
      Similarity.semanticDedup(StandIn.embeddings(s, d), IvfCells, SrpBits,
        NearDupClusterCosine, trainedCells = true)),

    "dedup_semantic_trained_audit" -> ((s, d) =>
      Similarity.semanticDedupAudit(StandIn.embeddings(s, d), IvfCells,
        SrpBits, NearDupClusterCosine)),

    // PER-ROW membership contract for the trained face (r15 verdict item
    // 8): one hash-checked row per vector — coverage, the greedy rule
    // pointwise (kept ⇔ no smaller-id in-(cell,bucket) neighbor ≥
    // threshold), and the one-representative-per-clique property — so a
    // trained-path regression pins the exact vec_id instead of flipping
    // a corpus-wide boolean (Similarity.semanticDedupMemberAudit).
    "dedup_semantic_member_audit" -> ((s, d) =>
      Similarity.semanticDedupMemberAudit(StandIn.embeddings(s, d),
        IvfCells, SrpBits, NearDupClusterCosine)),

    // EXACT set-similarity self-join (AllPairs prefix filter): every pair
    // with shingle Jaccard >= SetSimThreshold, ZERO false negatives — the
    // audit-grade complement of the probabilistic LSH family
    // (Dedup.setSimJoin scaladoc carries the completeness proof and the
    // rare-first-prefix scale shape).
    "dedup_setsim_exact" -> ((s, d) =>
      Dedup.setSimJoin(StandIn.documents(s, d))),

    // Fixed-round integer PageRank over the VERIFIED near-dup graph: the
    // centrality face of keeper selection (most-linked variant = canonical
    // copy). Micro-unit floor arithmetic, so the recursive-CTE twin
    // replays all rounds bit-exactly (Dedup.pagerankFromPairs scaladoc).
    "dedup_pagerank" -> ((s, d) =>
      Dedup.pagerankFromPairs(
        dedupNgramJaccard(s, d).select(col("a_id"), col("b_id")))),

    // The dedup DECISION table: verified-graph components + centrality
    // keeper per cluster (highest PageRank, doc_id tie-break) — min-id's
    // arbitrary pick replaced by the most-representative variant
    // (Dedup.pagerankKeepers).
    "dedup_pagerank_keepers" -> ((s, d) =>
      Dedup.pagerankKeepers(StandIn.documents(s, d),
        MinhashK, MinhashBands, MinhashEstThreshold, JaccardThreshold)),

    // Cluster-safe split: the split hash cut on the VERIFIED near-dup
    // component label instead of the doc id, so train/val leakage is zero
    // by construction for every pair the LSH+verify chain sees
    // (Curation.splitClusterSafe).
    "corpus_split_cluster_safe" -> ((s, d) =>
      Curation.splitClusterSafe(StandIn.documents(s, d),
        ClusterSplitFractions, MinhashK, MinhashBands,
        MinhashEstThreshold, JaccardThreshold)),
  )

  private val ClusterSplitFractions =
    Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)

  def oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,

    "dedup_content_hash" ->
      """SELECT sha256(text) AS content_hash,
        |       min(doc_id) AS keeper_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "dedup_minhash_lsh" ->
      s"""WITH $gramsSql, $sigSql, $bucketsSql, $candidatePairsSql
         |SELECT a_id, b_id, est_sim FROM est
         |WHERE est_sim >= $MinhashEstThreshold""".stripMargin,

    // Exact-substring span twin: every L-token shingle with its offset,
    // hashes held by >= 2 distinct docs, gaps-and-islands merge of
    // adjacent duplicated offsets. Parallel unnests zip positionally
    // (offset list and hash list share length). L and the md5 hash family
    // come from the Scala side, so the engines stay in lockstep.
    "dedup_substring_spans" -> {
      val L = Dedup.SubstringShingleLen
      val shingle =
        s"array_to_string(t[(CAST(i AS INT) + 1):(CAST(i AS INT) + $L)], ' ')"
      s"""WITH $rawToksSql, sh0 AS (
         |  SELECT doc_id,
         |         unnest(range(0, greatest(len(t) - ${L - 1}, 0))) AS off,
         |         unnest(list_transform(
         |           range(0, greatest(len(t) - ${L - 1}, 0)),
         |           i -> ${hashSql("'0:'", shingle)})) AS h
         |  FROM toks
         |), sh AS (SELECT doc_id, CAST(off AS INT) AS off, h FROM sh0),
         |dup AS (
         |  SELECT h FROM (SELECT DISTINCT h, doc_id FROM sh)
         |  GROUP BY h HAVING count(*) > 1
         |), isl AS (
         |  SELECT doc_id, off,
         |         off - row_number()
         |           OVER (PARTITION BY doc_id ORDER BY off) AS grp
         |  FROM sh JOIN dup USING (h)
         |)
         |SELECT doc_id, min(off) AS span_start,
         |       CAST(max(off) + ${L - 1} AS INT) AS span_end,
         |       CAST(max(off) - min(off) + $L AS INT) AS span_tokens,
         |       count(*) AS n_shingles
         |FROM isl GROUP BY doc_id, grp""".stripMargin
    },

    // Longest-span-per-pair twin: the same shingle stream, pairs bounded
    // by the MaxDocsPerShingle boilerplate guard, islands per
    // (pair, diagonal), longest span per pair by the same tie-break.
    "dedup_max_spans" -> {
      val L = Dedup.SubstringShingleLen
      val cap = Dedup.MaxDocsPerShingle
      val shingle =
        s"array_to_string(t[(CAST(i AS INT) + 1):(CAST(i AS INT) + $L)], ' ')"
      s"""WITH $rawToksSql, sh0 AS (
         |  SELECT doc_id,
         |         unnest(range(0, greatest(len(t) - ${L - 1}, 0))) AS off,
         |         unnest(list_transform(
         |           range(0, greatest(len(t) - ${L - 1}, 0)),
         |           i -> ${hashSql("'0:'", shingle)})) AS h
         |  FROM toks
         |), sh AS (SELECT doc_id, CAST(off AS INT) AS off, h FROM sh0),
         |shared AS (
         |  SELECT h FROM (SELECT DISTINCT h, doc_id FROM sh)
         |  GROUP BY h HAVING count(*) > 1 AND count(*) <= $cap
         |), hits AS (SELECT sh.* FROM sh JOIN shared USING (h)),
         |pdiag AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.off AS a_off,
         |         a.off - b.off AS diag
         |  FROM hits a JOIN hits b USING (h)
         |  WHERE a.doc_id < b.doc_id
         |), pisl AS (
         |  SELECT a_id, b_id, diag, a_off,
         |         a_off - row_number() OVER (
         |           PARTITION BY a_id, b_id, diag ORDER BY a_off) AS grp
         |  FROM pdiag
         |), pruns AS (
         |  SELECT a_id, b_id, diag,
         |         min(a_off) AS a_start, max(a_off) AS a_max
         |  FROM pisl GROUP BY a_id, b_id, diag, grp
         |), pspans AS (
         |  SELECT a_id, b_id, a_start,
         |         CAST(a_max + ${L - 1} AS INT) AS a_end,
         |         CAST(a_start - diag AS INT) AS b_start,
         |         CAST(a_max - diag + ${L - 1} AS INT) AS b_end,
         |         CAST(a_max - a_start + $L AS INT) AS span_tokens
         |  FROM pruns
         |)
         |SELECT a_id, b_id, a_start, a_end, b_start, b_end, span_tokens
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY a_id, b_id
         |    ORDER BY span_tokens DESC, a_start, b_start) AS rn
         |  FROM pspans)
         |WHERE rn = 1""".stripMargin
    },

    // Span-report twin: the substring-span CTEs folded to one row plus
    // a corpus token total.
    "dedup_span_report" -> {
      val L = Dedup.SubstringShingleLen
      val shingle =
        s"array_to_string(t[(CAST(i AS INT) + 1):(CAST(i AS INT) + $L)], ' ')"
      s"""WITH $rawToksSql, sh0 AS (
         |  SELECT doc_id,
         |         unnest(range(0, greatest(len(t) - ${L - 1}, 0))) AS off,
         |         unnest(list_transform(
         |           range(0, greatest(len(t) - ${L - 1}, 0)),
         |           i -> ${hashSql("'0:'", shingle)})) AS h
         |  FROM toks
         |), sh AS (SELECT doc_id, CAST(off AS INT) AS off, h FROM sh0),
         |dup AS (
         |  SELECT h FROM (SELECT DISTINCT h, doc_id FROM sh)
         |  GROUP BY h HAVING count(*) > 1
         |), isl AS (
         |  SELECT doc_id, off,
         |         off - row_number()
         |           OVER (PARTITION BY doc_id ORDER BY off) AS grp
         |  FROM sh JOIN dup USING (h)
         |), sspans AS (
         |  SELECT doc_id,
         |         CAST(max(off) - min(off) + $L AS INT) AS span_tokens
         |  FROM isl GROUP BY doc_id, grp
         |), srep AS (
         |  SELECT count(*) AS n_spans,
         |         count(DISTINCT doc_id) AS n_docs_affected,
         |         CAST(coalesce(sum(span_tokens), 0) AS BIGINT) AS dup_tokens
         |  FROM sspans
         |), stot AS (
         |  SELECT CAST(sum(len(t)) AS BIGINT) AS n_corpus_tokens FROM toks
         |)
         |SELECT n_spans, n_docs_affected, dup_tokens, n_corpus_tokens,
         |       round(dup_tokens / CAST(greatest(n_corpus_tokens, 1)
         |             AS DOUBLE), 6) AS dup_token_share
         |FROM srep, stot""".stripMargin
    },

    // Line-level dedup twin (Dedup.lineDedup over wrapTokenLines): the
    // oracle re-wraps tokens 10-per-line, finds lines (≥ 10 chars) seen
    // ≥ 2× corpus-wide BY STRING (the Spark side's xxhash64 is an internal
    // shuffle-key optimization — same result barring a 64-bit collision),
    // and rebuilds each text with every occurrence of a duplicated line
    // removed, exactly as the engine does map-side.
    "dedup_lines" -> dedupLinesSql,

    // The unbounded-vocabulary regime (Dedup.lineDedupJoin: drop set stays
    // a DataFrame, rebuild is a doc_id join) checks against the IDENTICAL
    // oracle — the two regimes cannot drift (the clusters/bigstar pattern).
    "dedup_lines_join" -> dedupLinesSql,

    // Threshold-tuning curve twin (Dedup.candidateSimHistogram): pair
    // counts per exact 1/k similarity step over the threshold-0 candidates.
    "dedup_sim_histogram" ->
      s"""WITH $gramsSql, $sigSql, $bucketsSql, $candidatePairsSql
         |SELECT est_sim, count(*) AS n_pairs
         |FROM est GROUP BY est_sim""".stripMargin,

    // Cross-corpus twin (Dedup.crossCorpusCandidates): the shared buckets
    // CTE split into the two snapshot sides, pairs ACROSS sides only.
    "dedup_incremental" ->
      s"""WITH $gramsSql, $sigSql, $bucketsSql, cpairs AS (
         |  SELECT DISTINCT n.doc_id AS new_id, r.doc_id AS ref_id
         |  FROM buckets n
         |  JOIN buckets r ON n.band = r.band AND n.bucket = r.bucket
         |  WHERE n.doc_id % 5 = 0 AND r.doc_id % 5 <> 0
         |)
         |SELECT p.new_id, p.ref_id,
         |       len(list_filter(range(1, ${MinhashK + 1}),
         |           i -> sn.sig[CAST(i AS INT)] = sr.sig[CAST(i AS INT)]))
         |         / CAST($MinhashK AS DOUBLE) AS est_sim
         |FROM cpairs p
         |JOIN sigs sn ON sn.doc_id = p.new_id
         |JOIN sigs sr ON sr.doc_id = p.ref_id
         |WHERE len(list_filter(range(1, ${MinhashK + 1}),
         |        i -> sn.sig[CAST(i AS INT)] = sr.sig[CAST(i AS INT)]))
         |        / CAST($MinhashK AS DOUBLE) >= $MinhashEstThreshold"""
        .stripMargin,

    // Cross-snapshot exact-screen twin (Dedup.incrementalExact): the
    // Bloom prefilter is pure shuffle avoidance — the confirming join
    // makes the output identical to this plain text-equality left join.
    "dedup_incremental_exact" ->
      """WITH newsnap AS (
        |  SELECT doc_id + 1000000 AS new_id, text
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS new_id, concat(text, ' v2') AS text
        |  FROM documents WHERE doc_id % 3 = 1
        |), refh AS (
        |  SELECT text, min(doc_id) AS ref_id FROM documents GROUP BY text
        |)
        |SELECT n.new_id, r.ref_id, (r.ref_id IS NOT NULL) AS is_dup
        |FROM newsnap n LEFT JOIN refh r ON n.text = r.text""".stripMargin,

    "dedup_simhash" ->
      s"""WITH $toksSql, hashes AS (
         |  SELECT doc_id,
         |         list_transform(t, w -> ${hashSql("'0:'")}) AS h
         |  FROM toks
         |)
         |SELECT doc_id,
         |       CAST(list_sum(list_transform(range(0, 60), j ->
         |         CASE WHEN list_sum(list_transform(h,
         |                hv -> ((hv >> CAST(j AS INT)) & 1) * 2 - 1)) > 0
         |              THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
         |              ELSE 0 END)) AS BIGINT) AS simhash
         |FROM hashes""".stripMargin,

    // Containment twin: the same 30-bit base hash samples the shingle
    // universe (h % mod = 0), per-hash holders capped, exact asymmetric
    // overlap on the candidate set only.
    "dedup_containment" ->
      s"""WITH $gramsSql, chits AS (
         |  SELECT DISTINCT doc_id, h FROM (
         |    SELECT doc_id,
         |           (${hashSql("'0:'", "gram")} & 1073741823) AS h
         |    FROM (SELECT doc_id, unnest(g) AS gram FROM grams)
         |  ) WHERE h % ${Dedup.ContainmentSampleMod} = 0
         |), celig AS (
         |  SELECT h FROM chits GROUP BY h
         |  HAVING count(*) > 1 AND count(*) <= ${Dedup.MaxDocsPerShingle}
         |), cpair AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM chits a
         |  JOIN chits b ON a.h = b.h AND a.doc_id < b.doc_id
         |  JOIN celig e ON e.h = a.h
         |), cver AS (
         |  SELECT a_id, b_id,
         |         len(list_filter(ga.g, x -> list_contains(gb.g, x)))
         |           AS inter,
         |         len(ga.g) AS la, len(gb.g) AS lb
         |  FROM cpair
         |  JOIN grams ga ON ga.doc_id = a_id
         |  JOIN grams gb ON gb.doc_id = b_id
         |)
         |SELECT a_id, b_id, CAST(inter AS BIGINT) AS n_shared,
         |       round(inter / CAST(least(la, lb) AS DOUBLE), 6)
         |         AS containment,
         |       CASE WHEN lb < la THEN b_id ELSE a_id END AS contained_id
         |FROM cver
         |WHERE round(inter / CAST(least(la, lb) AS DOUBLE), 6)
         |        >= ${Dedup.ContainmentThreshold}""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH $gramsSql, $sigSql, $bucketsSql, $candidatePairsSql, verified AS (
         |  SELECT e.a_id, e.b_id,
         |         round(len(list_filter(ga.g, x -> list_contains(gb.g, x)))
         |           / CAST(len(ga.g) + len(gb.g)
         |               - len(list_filter(ga.g, x -> list_contains(gb.g, x)))
         |             AS DOUBLE), 6) AS jaccard
         |  FROM est e
         |  JOIN grams ga ON ga.doc_id = e.a_id
         |  JOIN grams gb ON gb.doc_id = e.b_id
         |  WHERE e.est_sim >= $MinhashEstThreshold
         |)
         |SELECT a_id, b_id, jaccard FROM verified
         |WHERE jaccard >= $JaccardThreshold""".stripMargin,

    // Cluster-size histogram twin: the components CTE double-folded.
    "dedup_cluster_sizes" ->
      s"""WITH RECURSIVE $gramsSql, $sigSql, $bucketsSql, $candidatePairsSql,
         |$componentsSql, csz AS (
         |  SELECT cluster_id, count(*) AS sz FROM labels GROUP BY cluster_id
         |)
         |SELECT CAST(sz AS INT) AS cluster_size, count(*) AS n_clusters
         |FROM csz GROUP BY sz""".stripMargin,

    // LSH-precision twin: the ngram-jaccard verify CTE folded to counts.
    "dedup_lsh_precision" ->
      s"""WITH $gramsSql, $sigSql, $bucketsSql, $candidatePairsSql, pverf AS (
         |  SELECT round(len(list_filter(ga.g, x -> list_contains(gb.g, x)))
         |           / CAST(len(ga.g) + len(gb.g)
         |               - len(list_filter(ga.g, x -> list_contains(gb.g, x)))
         |             AS DOUBLE), 6) AS jaccard
         |  FROM est e
         |  JOIN grams ga ON ga.doc_id = e.a_id
         |  JOIN grams gb ON gb.doc_id = e.b_id
         |  WHERE e.est_sim >= $MinhashEstThreshold
         |)
         |SELECT count(*) AS n_candidates,
         |       CAST(sum(CASE WHEN jaccard >= $JaccardThreshold
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_confirmed,
         |       round(sum(CASE WHEN jaccard >= $JaccardThreshold
         |                      THEN 1 ELSE 0 END)
         |             / CAST(greatest(count(*), 1) AS DOUBLE), 6)
         |         AS precision
         |FROM pverf""".stripMargin,

    // Bigram-shingle simhash + Hamming-band near-dup twin of
    // Dedup.simhashNearDup.
    "dedup_simhash_pairs" ->
      s"""WITH $gramsSql, hashes AS (
         |  SELECT doc_id, list_transform(g, w -> ${hashSql("'0:'")}) AS h
         |  FROM grams
         |), sh AS (
         |  SELECT doc_id,
         |         CAST(list_sum(list_transform(range(0, 60), j ->
         |           CASE WHEN list_sum(list_transform(h,
         |                  hv -> ((hv >> CAST(j AS INT)) & 1) * 2 - 1)) > 0
         |                THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
         |                ELSE 0 END)) AS BIGINT) AS simhash
         |  FROM hashes
         |), bands AS (
         |  SELECT doc_id, simhash, b.band AS band,
         |         (simhash >> CAST(b.band * 15 AS INT)) & 32767 AS bv
         |  FROM sh, (SELECT unnest(range(0, 4)) AS band) b
         |), spairs AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands a
         |  JOIN bands b ON a.band = b.band AND a.bv = b.bv
         |              AND a.doc_id < b.doc_id
         |)
         |SELECT p.a_id, p.b_id,
         |       CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
         |FROM spairs p
         |JOIN sh sa ON sa.doc_id = p.a_id
         |JOIN sh sb ON sb.doc_id = p.b_id
         |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 8""".stripMargin,

    // Recursive-CTE twin of Dedup.clusters: every label reachable over the
    // (bidirectional) candidate edges; component id = min reachable label.
    "dedup_clusters" -> clustersOracle,

    // Same contract, same parameters — the big-star variant must agree
    // with label propagation bit-for-bit, so ONE oracle serves both and
    // the two implementations cannot drift.
    "dedup_clusters_bigstar" -> clustersOracle,

    // Keeper = the doc whose id IS its component's min label.
    "dedup_keepers" ->
      s"""WITH RECURSIVE $gramsSql, $sigSql, $bucketsSql, $candidatePairsSql,
         |$componentsSql
         |SELECT doc_id FROM labels WHERE doc_id = cluster_id""".stripMargin,

    // SemDeDup twin (Similarity.semanticDedup, seeded face): one row per
    // vector; pruned iff a smaller-id (cell, bucket)-mate sits at
    // cosine ≥ threshold. ivf and bsim are 1:1 per vec_id, so the join
    // rebuilds the exact (cell, bucket) keying.
    "dedup_semantic" ->
      s"""WITH $prepSql, $bucketsSimSql, $ivfCellsSql, sd AS (
         |  SELECT i.vec_id, i.cell, b.bucket, i.vec, i.norm
         |  FROM ivf i JOIN bsim b ON b.vec_id = i.vec_id
         |), spruned AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM sd a
         |  JOIN sd b ON a.cell = b.cell AND a.bucket = b.bucket
         |           AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.vec", "a.norm", "b.vec", "b.norm")}
         |          >= $NearDupClusterCosine
         |)
         |SELECT s.vec_id, CAST(s.cell AS INT) AS cell,
         |       (p.vec_id IS NULL) AS keep
         |FROM sd s LEFT JOIN spruned p ON p.vec_id = s.vec_id""".stripMargin,

    // Trained-cells audit: n_total from the corpus, invariants pinned
    // TRUE — the Spark side PROVES them distributedly (see
    // Similarity.semanticDedupAudit scaladoc).
    "dedup_semantic_trained_audit" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
        |       TRUE AS partition_ok,
        |       TRUE AS pruned_witnessed,
        |       TRUE AS keepers_clean
        |FROM embeddings""".stripMargin,

    // Per-row member twin: every vec_id appears once with every
    // invariant TRUE — the Spark side re-derives each boolean from the
    // trained flags + pair frames per vector
    // (Similarity.semanticDedupMemberAudit scaladoc).
    "dedup_semantic_member_audit" ->
      """SELECT vec_id, CAST(1 AS BIGINT) AS n_rows,
        |       TRUE AS keep_consistent,
        |       TRUE AS keeper_clean
        |FROM embeddings""".stripMargin,

    // Exact AllPairs twin: the SAME rare-first prefix machinery (df asc,
    // 30-bit hash, shingle), so even the candidate sets match — and both
    // equal {(a,b) : J >= t} by the completeness lemma in the scaladoc.
    "dedup_setsim_exact" ->
      s"""WITH $setsimGramsSql, snz AS (
         |  SELECT doc_id, g FROM sgrams WHERE len(g) > 0
         |), sx AS (
         |  SELECT doc_id, len(g) AS sz, unnest(g) AS t FROM snz
         |), sdf AS (
         |  SELECT t, count(*) AS dfreq FROM sx GROUP BY t
         |), srk AS (
         |  SELECT sx.doc_id, sx.sz, sx.t,
         |         row_number() OVER (PARTITION BY sx.doc_id
         |           ORDER BY sdf.dfreq,
         |                    (${hashSql("'0:'", "sx.t")} & 1073741823),
         |                    sx.t) AS rk
         |  FROM sx JOIN sdf ON sdf.t = sx.t
         |), sprefix AS (
         |  SELECT doc_id, sz, t, rk FROM srk
         |  WHERE rk <= sz - ceil(${Dedup.SetSimThreshold} * sz) + 1
         |), scand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM sprefix a JOIN sprefix b ON a.t = b.t AND a.doc_id < b.doc_id
         |  WHERE b.sz * ${Dedup.SetSimThreshold} <= a.sz
         |    AND a.sz * ${Dedup.SetSimThreshold} <= b.sz
         |    AND 1 + least(a.sz - a.rk, b.sz - b.rk)
         |        >= ceil(CAST(${Dedup.SetSimThreshold /
                  (1 + Dedup.SetSimThreshold)} AS DOUBLE) * (a.sz + b.sz))
         |), sver AS (
         |  SELECT a_id, b_id,
         |         round(len(list_filter(ga.g, x -> list_contains(gb.g, x)))
         |           / CAST(len(ga.g) + len(gb.g)
         |               - len(list_filter(ga.g, x -> list_contains(gb.g, x)))
         |             AS DOUBLE), 6) AS jaccard
         |  FROM scand
         |  JOIN snz ga ON ga.doc_id = a_id
         |  JOIN snz gb ON gb.doc_id = b_id
         |)
         |SELECT a_id, b_id, jaccard FROM sver
         |WHERE jaccard >= ${Dedup.SetSimThreshold}""".stripMargin,

    // Integer-PageRank twin: recursive CTE with per-round GROUP BY, every
    // round floor-divided in micro-units — bit-exact across engines.
    // pverified is MATERIALIZED so the LSH candidate + exact-verify chain
    // runs ONCE, not once per recursion round (the sim_neardup_clusters
    // lesson from the sf1.0 sweep; hint affects evaluation only).
    "dedup_pagerank" ->
      s"""WITH RECURSIVE $gramsSql, $sigSql, $bucketsSql, $candidatePairsSql,
         |pverified AS MATERIALIZED (
         |  SELECT e.a_id, e.b_id
         |  FROM est e
         |  JOIN grams ga ON ga.doc_id = e.a_id
         |  JOIN grams gb ON gb.doc_id = e.b_id
         |  WHERE e.est_sim >= $MinhashEstThreshold
         |    AND round(len(list_filter(ga.g, x -> list_contains(gb.g, x)))
         |          / CAST(len(ga.g) + len(gb.g)
         |              - len(list_filter(ga.g, x -> list_contains(gb.g, x)))
         |            AS DOUBLE), 6) >= $JaccardThreshold
         |), predges AS (
         |  SELECT a_id AS src, b_id AS dst FROM pverified
         |  UNION ALL
         |  SELECT b_id, a_id FROM pverified
         |), prdeg AS (
         |  SELECT src, count(*) AS dg FROM predges GROUP BY src
         |), pr(it, doc_id, r) AS (
         |  SELECT 0, src, CAST(1000000 AS BIGINT) FROM prdeg
         |  UNION ALL
         |  SELECT it + 1, e.dst,
         |         CAST(150000 + 85 * sum(pr.r // d.dg) // 100 AS BIGINT)
         |  FROM pr
         |  JOIN predges e ON e.src = pr.doc_id
         |  JOIN prdeg d ON d.src = pr.doc_id
         |  WHERE it < ${Dedup.PagerankIters}
         |  GROUP BY it + 1, e.dst
         |)
         |SELECT doc_id, r AS rank_micro FROM pr
         |WHERE it = ${Dedup.PagerankIters}""".stripMargin,

    // Keeper-table twin: components (reach closure) and integer PageRank
    // BOTH recursive over the one MATERIALIZED verified pair set, then
    // the same NULLS LAST keeper window.
    "dedup_pagerank_keepers" ->
      s"""WITH RECURSIVE $gramsSql, $sigSql, $bucketsSql, $candidatePairsSql,
         |pverified AS MATERIALIZED (
         |  SELECT e.a_id, e.b_id
         |  FROM est e
         |  JOIN grams ga ON ga.doc_id = e.a_id
         |  JOIN grams gb ON gb.doc_id = e.b_id
         |  WHERE e.est_sim >= $MinhashEstThreshold
         |    AND round(len(list_filter(ga.g, x -> list_contains(gb.g, x)))
         |          / CAST(len(ga.g) + len(gb.g)
         |              - len(list_filter(ga.g, x -> list_contains(gb.g, x)))
         |            AS DOUBLE), 6) >= $JaccardThreshold
         |), kedges AS (
         |  SELECT a_id, b_id FROM pverified
         |  UNION ALL
         |  SELECT b_id, a_id FROM pverified
         |), kreach(doc_id, label) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a_id, r.label FROM kedges e JOIN kreach r
         |    ON r.doc_id = e.b_id
         |), klabels AS (
         |  SELECT doc_id, min(label) AS cluster_id FROM kreach
         |  GROUP BY doc_id
         |), prdeg AS (
         |  SELECT a_id AS src, count(*) AS dg FROM kedges GROUP BY a_id
         |), pr(it, doc_id, r) AS (
         |  SELECT 0, src, CAST(1000000 AS BIGINT) FROM prdeg
         |  UNION ALL
         |  SELECT it + 1, e.b_id,
         |         CAST(150000 + 85 * sum(pr.r // d.dg) // 100 AS BIGINT)
         |  FROM pr
         |  JOIN kedges e ON e.a_id = pr.doc_id
         |  JOIN prdeg d ON d.src = pr.doc_id
         |  WHERE it < ${Dedup.PagerankIters}
         |  GROUP BY it + 1, e.b_id
         |), pfinal AS (
         |  SELECT doc_id, r AS rank_micro FROM pr
         |  WHERE it = ${Dedup.PagerankIters}
         |)
         |SELECT doc_id, cluster_id, rank_micro, keeper_id,
         |       doc_id = keeper_id AS keep
         |FROM (
         |  SELECT k.doc_id, k.cluster_id, p.rank_micro,
         |         first_value(k.doc_id) OVER (PARTITION BY k.cluster_id
         |           ORDER BY p.rank_micro DESC NULLS LAST, k.doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING
         |             AND UNBOUNDED FOLLOWING) AS keeper_id
         |  FROM klabels k LEFT JOIN pfinal p USING (doc_id)
         |)""".stripMargin,

    // Cluster-safe split twin: the SAME verified-pair components closure
    // as the keeper oracle, then corpus_split's CASE cut on the CLUSTER
    // label (hash-family member SplitHashIndex, integer boundaries from
    // Curation.splitBounds — one definition on both engines).
    "corpus_split_cluster_safe" -> {
      val cases = ClusterSplitFractions.init
        .zip(Curation.splitBounds(ClusterSplitFractions).init)
        .map { case ((name, _), cut) => s"WHEN b < $cut THEN '$name'" }
        .mkString(" ")
      s"""WITH RECURSIVE $gramsSql, $sigSql, $bucketsSql, $candidatePairsSql,
         |cverified AS MATERIALIZED (
         |  SELECT e.a_id, e.b_id
         |  FROM est e
         |  JOIN grams ga ON ga.doc_id = e.a_id
         |  JOIN grams gb ON gb.doc_id = e.b_id
         |  WHERE e.est_sim >= $MinhashEstThreshold
         |    AND round(len(list_filter(ga.g, x -> list_contains(gb.g, x)))
         |          / CAST(len(ga.g) + len(gb.g)
         |              - len(list_filter(ga.g, x -> list_contains(gb.g, x)))
         |            AS DOUBLE), 6) >= $JaccardThreshold
         |), cedges AS (
         |  SELECT a_id, b_id FROM cverified
         |  UNION ALL
         |  SELECT b_id, a_id FROM cverified
         |), creach(doc_id, label) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a_id, r.label FROM cedges e JOIN creach r
         |    ON r.doc_id = e.b_id
         |), clabels AS (
         |  SELECT doc_id, min(label) AS cluster_id FROM creach
         |  GROUP BY doc_id
         |)
         |SELECT doc_id, cluster_id,
         |       CASE $cases
         |            ELSE '${ClusterSplitFractions.last._1}' END AS split
         |FROM (
         |  SELECT doc_id, cluster_id,
         |         ${hashSql(s"'${Curation.SplitHashIndex}:'",
                      "CAST(cluster_id AS VARCHAR)")} % 10000 AS b
         |  FROM clabels
         |)""".stripMargin
    },
  )
}
