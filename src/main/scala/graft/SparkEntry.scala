package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.harness.StandIn
import graft.ops.{AlertLifecycle, AlertRules, Aggregates, Bpe, Curation, Dedup, Multimodal, Parse, Profile, Sessionize, Similarity, TextAnalysis, TextRules}

/** Driver contract — batch-oracle surface of the engine.
  *
  * Every entry runs the SAME pure DataFrame=>DataFrame operators the
  * streaming pipeline uses (SURVEY §7.1), over the driver's parquet test
  * tables, with a DuckDB-executable oracle in [[oracleSql]]. Column names
  * and types are aligned on both sides (the driver sorts columns by name
  * and hash-compares values). Non-deterministic columns (current_timestamp)
  * are excluded from oracle outputs (SURVEY §7.5.4); floating aggregates
  * are rounded identically on both sides to absorb summation-order ulps.
  */
object SparkEntry {

  /** Flagship query on sf0.001 — the full reference alert chain
    * (JSON parse → flatten → 10-branch classify → enrich). */
  def entry(spark: SparkSession): DataFrame =
    alertsClassify(spark, "/root/testdata/sf0.001")

  // ─── reference-parity queries ──────────────────────────────────────────

  /** P1-P3 + C1-C4 + F1: the complete alert-detector chain
    * (reference: alert_detector.py:82-209), including a real JSON parse:
    * readings are serialized to A.1-shaped JSON and re-parsed through
    * Parse.jsonToReadings before classification. */
  private def alertsClassify(s: SparkSession, dir: String): DataFrame = {
    val readings = StandIn.readingsFromEvents(StandIn.events(s, dir))
    val parsed = Parse.jsonToReadings(Parse.readingsToJson(readings.drop("event_time")))
    AlertRules.detect(parsed)
  }

  /** P1-P3, P8-P9: JSON serialize → parse → flatten round-trip. */
  private def parseReadings(s: SparkSession, dir: String): DataFrame = {
    val readings = StandIn.readingsFromEvents(StandIn.events(s, dir))
    Parse.jsonToReadings(Parse.readingsToJson(readings.drop("event_time")))
  }

  /** A1-A4: tumbling 4-minute window, avg/min/max/count per sensor
    * (reference: data_agregator.py:74-95; batch-bucket oracle per SURVEY §5.3). */
  private def aggSensorStats(s: SparkSession, dir: String): DataFrame = {
    val readings = StandIn.readingsFromEvents(StandIn.events(s, dir))
    Aggregates.sensorStats(readings)
      .withColumn("avg_value", round(col("avg_value"), 4))
  }

  private def aggSlidingStats(s: SparkSession, dir: String): DataFrame =
    Aggregates.slidingStats(
      StandIn.readingsFromEvents(StandIn.events(s, dir)),
      timeCol = "event_time", keys = Seq("sensor_id", "sensor_type"),
      valueCol = "value")

  /** P2: bare from_json field extraction. */
  private def jsonParse(s: SparkSession, dir: String): DataFrame =
    StandIn.events(s, dir).select(
      col("event_id"),
      from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
        .getField("k").alias("k"))

  /** P9→P2: to_json/from_json round-trip is the identity. */
  private def jsonRoundtrip(s: SparkSession, dir: String): DataFrame =
    StandIn.events(s, dir)
      .select(to_json(struct(col("event_id"), col("event_type"), col("value"))).alias("j"))
      .select(from_json(col("j"), org.apache.spark.sql.types.StructType
        .fromDDL("event_id BIGINT, event_type STRING, value DOUBLE")).alias("d"))
      .select(col("d.event_id").alias("event_id"),
              col("d.event_type").alias("event_type"),
              col("d.value").alias("value"))

  /** P4: timestamp → string → timestamp casts. */
  private def castTimestamp(s: SparkSession, dir: String): DataFrame =
    StandIn.events(s, dir).select(
      col("event_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").cast("timestamp").alias("ts_rt"))

  /** F4: SQL LIKE (reference: alert_detector.py:172-173,200). */
  private def filterLike(s: SparkSession, dir: String): DataFrame =
    StandIn.table(s, dir, "part")
      .where(col("p_type").like("ECO%"))
      .select(col("p_partkey"), col("p_name"), col("p_type"))

  /** F2+F3: comparison predicates with boolean conjunction/disjunction
    * (reference: alert_detector.py:107-153 rule guards). */
  private def filterPredicates(s: SparkSession, dir: String): DataFrame =
    StandIn.table(s, dir, "lineitem")
      .where((col("l_quantity") > 45 || col("l_discount") < 0.02) &&
             col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
              col("l_discount"), col("l_returnflag"))

  /** Stateful lifecycle: flatMapGroupsWithState active→resolved transitions
    * over the events stand-in. The oracle recomputes the same transitions
    * declaratively (gaps-and-islands over lag windows) — an independent
    * cross-paradigm check of the state machine.
    */
  private def alertLifecycle(s: SparkSession, dir: String): DataFrame =
    AlertLifecycle.transitions(
      StandIn.readingsFromEvents(StandIn.events(s, dir))).toDF()

  /** F5: severity isin filter — the mail-notifier predicate
    * (reference: gestionnaire_mail.py:79-83), over real detected alerts. */
  private def alertsMailable(s: SparkSession, dir: String): DataFrame =
    alertsClassify(s, dir)
      .where(col("severity").isin("critical", "warning"))
      .select(col("sensor_id"), col("timestamp"), col("alert_type"),
              col("severity"), col("message"), col("actual_value"))

  // ─── north-star: deduplication over documents ──────────────────────────

  private val MinhashK = 16
  private val MinhashBands = 4
  private val MinhashEstThreshold = 0.5
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

  private def corpusCurate(s: SparkSession, dir: String): DataFrame =
    Curation.curate(StandIn.documents(s, dir),
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
  private val rawToksSql =
    """toks AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
      |           w -> len(w) > 0) AS t
      |  FROM documents
      |)""".stripMargin

  private def hashSql(prefixExpr: String, wVar: String = "w"): String =
    s"CAST(concat('0x', substr(md5(concat($prefixExpr, $wVar)), 1, 15)) AS BIGINT)"

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
  private val gramsSql =
    """grams AS (
      |  SELECT doc_id,
      |         list_distinct(CASE WHEN len(tt) >= 2
      |           THEN list_transform(range(1, len(tt)),
      |                i -> concat(tt[CAST(i AS INT)], ' ',
      |                            tt[CAST(i AS INT) + 1]))
      |           ELSE [] END) AS g
      |  FROM (SELECT doc_id,
      |          list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
      |            w -> len(w) > 0) AS tt
      |        FROM documents)
      |)""".stripMargin

  // Base-hash + affine family twin of Dedup.minhashSignatures: one md5 per
  // shingle, k affine transforms. Constants come from Dedup.affineParams so
  // both engines agree bit-for-bit.
  private val sigSql = {
    val entries = Dedup.affineParams(MinhashK).map { case (a, b) =>
      s"list_min(list_transform(hs, h -> (h * $a + $b) % ${Dedup.AffineMod}))"
    }.mkString(",\n    ")
    s"""bh AS (
       |  SELECT doc_id,
       |         list_transform(g, w -> ${hashSql("'0:'")} & ${(1L << 30) - 1})
       |           AS hs
       |  FROM grams
       |), sigs AS (
       |  SELECT doc_id, [
       |    $entries
       |  ] AS sig FROM bh
       |)""".stripMargin
  }

  private val bucketsSql = {
    val r = MinhashK / MinhashBands
    s"""buckets AS (
       |  SELECT doc_id, sig, b.band AS band,
       |         md5(array_to_string(list_transform(
       |           sig[b.band * $r + 1 : b.band * $r + $r],
       |           x -> CAST(x AS VARCHAR)), '-')) AS bucket
       |  FROM sigs, (SELECT unnest(range(0, $MinhashBands)) AS band) b
       |)""".stripMargin
  }

  private val candidatePairsSql =
    s"""pairs AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM buckets a
       |  JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
       |                AND a.doc_id < b.doc_id
       |), est AS (
       |  SELECT p.a_id, p.b_id,
       |         len(list_filter(range(1, ${MinhashK + 1}),
       |             i -> sa.sig[CAST(i AS INT)] = sb.sig[CAST(i AS INT)]))
       |           / ${MinhashK.toDouble} AS est_sim
       |  FROM pairs p
       |  JOIN sigs sa ON sa.doc_id = p.a_id
       |  JOIN sigs sb ON sb.doc_id = p.b_id
       |)""".stripMargin

  // Connected components of the LSH candidate graph (recursive twin of
  // Dedup.clusters): edges → transitive reach → min-label per doc. Shared
  // by dedup_clusters / dedup_keepers / corpus_curate so the three oracles
  // cannot drift apart.
  private val componentsSql =
    s"""edges AS (
       |  SELECT a_id, b_id FROM est WHERE est_sim >= $MinhashEstThreshold
       |  UNION ALL
       |  SELECT b_id, a_id FROM est WHERE est_sim >= $MinhashEstThreshold
       |), reach(doc_id, label) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.a_id, r.label FROM edges e JOIN reach r ON r.doc_id = e.b_id
       |), labels AS (
       |  SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id
       |)""".stripMargin

  // Quality-gate CTEs (twin of TextAnalysis.qualityGate, thresholds
  // interpolated from the shared constants); expects `toks` in scope.
  // Shared by text_quality_gate / corpus_curate.
  private val gateSql = {
    val stop = TextAnalysis.LangMarkers.flatMap(_._2)
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""q AS (
       |  SELECT d.doc_id,
       |         length(d.text) AS n_chars,
       |         len(k.t) AS n_tokens,
       |         round(len(list_filter(k.t, w -> list_contains($stop, w)))
       |           / CAST(greatest(len(k.t), 1) AS DOUBLE), 6) AS stopword_ratio,
       |         round((length(d.text)
       |           - length(regexp_replace(d.text, '[.,!?;:]', '', 'g')))
       |           / CAST(greatest(length(d.text), 1) AS DOUBLE), 6) AS punct_ratio,
       |         length(d.text)
       |           / CAST(greatest(len(k.t), 1) AS DOUBLE) AS cpt
       |  FROM documents d JOIN toks k ON d.doc_id = k.doc_id
       |), gated AS (
       |  SELECT doc_id,
       |         CASE WHEN n_chars < ${TextAnalysis.GateMinChars} THEN 'too_short'
       |              WHEN n_tokens < ${TextAnalysis.GateMinTokens} THEN 'too_few_tokens'
       |              WHEN stopword_ratio > ${TextAnalysis.GateMaxStopwordRatio} THEN 'stopword_heavy'
       |              WHEN punct_ratio > ${TextAnalysis.GateMaxPunctRatio} THEN 'punct_heavy'
       |              WHEN cpt > ${TextAnalysis.GateMaxCharsPerToken} THEN 'tokens_too_long'
       |              ELSE NULL END AS reject_reason
       |  FROM q
       |)""".stripMargin
  }

  // DSIR CTEs shared by text_dsir_weights / corpus_select_dsir: hashed
  // token buckets tagged with the inlined gate verdict, raw + target
  // histograms (≤ DsirBuckets rows each), add-one-smoothed mean log-ratio
  // per document — Curation.dsirWeights mirrored term for term.
  private lazy val dsirCtesSql = {
    val B = Curation.DsirBuckets
    s"""$rawToksSql, $gateSql, dex AS (
       |  SELECT doc_id, unnest(t) AS w FROM toks
       |), dbk AS (
       |  SELECT doc_id, ${hashSql("'0:'")} % $B AS b FROM dex
       |), tagged AS (
       |  SELECT dbk.doc_id, b, (g.reject_reason IS NULL) AS passed
       |  FROM dbk JOIN gated g ON dbk.doc_id = g.doc_id
       |), draw AS (SELECT b, count(*) AS cr FROM tagged GROUP BY b),
       |dtgt AS (SELECT b, count(*) AS ct FROM tagged WHERE passed GROUP BY b),
       |dtot AS (SELECT (SELECT sum(cr) FROM draw) AS nr,
       |                (SELECT sum(ct) FROM dtgt) AS nt),
       |dscored AS (
       |  SELECT doc_id, CAST(count(*) AS INT) AS n_tokens,
       |         round(avg(
       |           log10(CAST(coalesce(ct, 0) + 1 AS DOUBLE) / (nt + $B))
       |           - log10(CAST(cr + 1 AS DOUBLE) / (nr + $B))), 6)
       |           AS dsir_logratio
       |  FROM tagged JOIN draw USING (b) LEFT JOIN dtgt USING (b), dtot
       |  GROUP BY doc_id
       |)""".stripMargin
  }

  // ─── north-star: similarity search over embeddings ─────────────────────

  private val SrpBits = 6
  private val TopK = 5
  private val NearDupCosine = 0.25
  private val NearDupClusterCosine = 0.4

  private def simBruteTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(StandIn.embeddings(s, dir), TopK)

  private def simLshTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(StandIn.embeddings(s, dir), SrpBits, TopK)

  private def simCosineNearDup(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDup(StandIn.embeddings(s, dir), SrpBits, NearDupCosine)

  private val IvfCells = 8

  private def simIvfTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(StandIn.embeddings(s, dir), IvfCells, TopK)

  private def simIvfKmeans(s: SparkSession, dir: String): DataFrame =
    Similarity.kmeansIvfTopK(StandIn.embeddings(s, dir), IvfCells,
      iters = 3, k = TopK, nprobe = 2)

  // Recall@k of the trained-IVF result vs the exact brute force, as one
  // deterministic (hits, expected, recall) row over ONE shared prepared
  // frame. Both sides are deterministic, so the driver's rows-only check
  // pins the row COUNT and SimilaritySpec pins the recall floor; a
  // quantizer regression flips the unit test red instead of hiding behind
  // a rows-only count.
  private def simIvfRecall(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfRecallReport(StandIn.embeddings(s, dir),
      IvfCells, iters = 3, k = TopK, nprobe = 2)

  // The synthetic embeddings are near-uniform, where IVF recall is
  // structurally bounded near nprobe/cells (trained cells add a margin on
  // top): measured 0.48 at nprobe=2/cells=8, deterministically. 0.4 is a
  // regression floor, not a quality claim — SimilaritySpec holds the 0.8
  // floor on clustered data, the regime IVF exists for.
  private val RecallFloor = 0.4

  // Oracle-checked face of the recall report: (expected, floor_met) —
  // expected derives from the oracle's own query-draw CTE, floor_met is
  // pinned TRUE. A quantizer recall regression fails a hash-checked row.
  private def simIvfRecallAudit(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfRecallAudit(StandIn.embeddings(s, dir),
      IvfCells, iters = 3, k = TopK, nprobe = 2, floor = RecallFloor)

  // PQ/IVFPQ regression floors, same posture as RecallFloor: measured
  // 0.53 / 0.40 at the sf0.01 verify point (deterministic — driver-side
  // training on the fixed hash draw), floored with ~25% margin. These are
  // canaries against quantizer breakage (a broken encoder lands near
  // k/N ≈ 0.01), not quality claims — the clustered-data unit tests hold
  // the 0.8 quality floor in the regime PQ exists for.
  private def simPqRecallAudit(s: SparkSession, dir: String): DataFrame =
    Similarity.recallAudit(
      Similarity.pqRecallReport(StandIn.embeddings(s, dir), k = TopK),
      floor = 0.4)

  private def simIvfPqRecallAudit(s: SparkSession, dir: String): DataFrame =
    Similarity.recallAudit(
      Similarity.ivfPqRecallReport(StandIn.embeddings(s, dir),
        cells = IvfCells, k = TopK, nprobe = 2),
      floor = 0.3)

  private def simQuantize(s: SparkSession, dir: String): DataFrame =
    Similarity.quantizeStats(StandIn.embeddings(s, dir))

  private def sessionize(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessions(StandIn.events(s, dir))

  // Training-mix rates shared by the sampler query and its oracle CASE.
  private val SampleRates = Seq("en" -> 0.5, "fr" -> 0.25, "de" -> 0.25)
  private val SampleDefaultRate = 0.1

  private def corpusSample(s: SparkSession, dir: String): DataFrame =
    Curation.sampleByLanguage(StandIn.documents(s, dir),
      SampleRates.toMap, SampleDefaultRate)

  private def textTfIdf(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfIdf(StandIn.documents(s, dir))

  private def textTermStatsSketch(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.termStatsSketch(StandIn.documents(s, dir))

  // Decontamination parameters shared with the oracle twin: benchmark =
  // every 10th doc, rare = gram df ≤ 20 (the synthetic corpus has a small
  // shared vocabulary — median gram df is 28 — so "rare" sits below that),
  // flag at ≥ 3 shared grams.
  private def decontaminate(s: SparkSession, dir: String): DataFrame =
    Curation.contamination(StandIn.documents(s, dir),
      col("doc_id") % 10 === 0, minShared = 3, dfCap = 20)

  // Bloom-prefiltered decontamination: identical output (the Bloom filter
  // only prunes the shuffle; false positives die in the exact join), so it
  // shares decontaminate's oracle SQL verbatim.
  private def decontaminateBloom(s: SparkSession, dir: String): DataFrame =
    Curation.contaminationBloom(StandIn.documents(s, dir),
      col("doc_id") % 10 === 0, minShared = 3, dfCap = 20)

  // Split fractions shared with the oracle twin (integer bucket bounds).
  private val SplitFractions =
    Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)

  private def corpusSplit(s: SparkSession, dir: String): DataFrame =
    Curation.assignSplits(StandIn.documents(s, dir), SplitFractions)

  private val ShuffleShards = 16

  private def corpusShuffle(s: SparkSession, dir: String): DataFrame =
    Curation.shuffleShards(StandIn.documents(s, dir), ShuffleShards)

  // Per-language token targets shared with the oracle twin: sized against
  // the fixture's per-language token mass so the mix exercises both >1
  // whole epochs and a fractional remainder.
  private val MixTargets =
    Seq("en" -> 50000L, "fr" -> 12000L, "de" -> 4000L)

  private def corpusMix(s: SparkSession, dir: String): DataFrame =
    Curation.mixEpochs(StandIn.documents(s, dir), MixTargets.toMap)

  private def textRedact(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.redact(StandIn.documents(s, dir))

  private def profileEvents(s: SparkSession, dir: String): DataFrame =
    Profile.profile(StandIn.events(s, dir))

  // The 100 TB default: HLL distincts, no Expand, no per-column reshuffle
  // of the fact table. Sketch output → rows-only driver check; the exact
  // twin above keeps the bit-for-bit oracle.
  private def profileEventsApprox(s: SparkSession, dir: String): DataFrame =
    Profile.profile(StandIn.events(s, dir), exact = false)

  private def asofPurchaseView(s: SparkSession, dir: String): DataFrame =
    graft.ops.AsOf.purchasesWithLatestView(StandIn.events(s, dir))

  private def rangeSessionPurchases(s: SparkSession, dir: String): DataFrame =
    graft.ops.RangeJoin.purchasesInSessions(StandIn.events(s, dir))

  private def olapPivotEvents(s: SparkSession, dir: String): DataFrame =
    graft.ops.Olap.pivotEventCounts(StandIn.events(s, dir))

  private def windowMovingStats(s: SparkSession, dir: String): DataFrame =
    graft.ops.WindowOps.movingStats(StandIn.events(s, dir))

  private def olapCubeEvents(s: SparkSession, dir: String): DataFrame =
    graft.ops.Olap.cubeEventStats(StandIn.events(s, dir))

  private def windowLagLead(s: SparkSession, dir: String): DataFrame =
    graft.ops.WindowOps.lagLeadStats(StandIn.events(s, dir))

  private def funnelConversion(s: SparkSession, dir: String): DataFrame =
    graft.ops.Funnel.conversion(StandIn.events(s, dir))

  private def aggDistinctUsers(s: SparkSession, dir: String): DataFrame =
    graft.ops.Olap.dailyActiveUsers(StandIn.events(s, dir))

  private def aggDistinctHll(s: SparkSession, dir: String): DataFrame =
    graft.ops.Olap.dailyActiveUsersApprox(StandIn.events(s, dir))

  private def olapPricingSummary(s: SparkSession, dir: String): DataFrame =
    graft.ops.Olap.pricingSummary(StandIn.table(s, dir, "lineitem"))

  private def joinRevenueNation(s: SparkSession, dir: String): DataFrame =
    graft.ops.Olap.revenueByNation(
      StandIn.table(s, dir, "lineitem"),
      StandIn.table(s, dir, "orders"),
      StandIn.table(s, dir, "customer"),
      StandIn.table(s, dir, "nation"),
      StandIn.table(s, dir, "region"))

  private def olapRevenueShare(s: SparkSession, dir: String): DataFrame =
    graft.ops.Olap.revenueShareByNation(
      StandIn.table(s, dir, "lineitem"),
      StandIn.table(s, dir, "orders"),
      StandIn.table(s, dir, "customer"),
      StandIn.table(s, dir, "nation"),
      StandIn.table(s, dir, "region"))

  // Approx-quantile sketch variant of qualityPercentiles — the
  // extreme-cardinality path. Engine-specific sketch (Greenwald-Khanna in
  // Spark), so no DuckDB twin; rows-only driver check + an error-bound
  // unit test vs the exact percentiles (ProfileSpec).
  private def textQualityPercentilesApprox(
      s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityPercentilesApprox(StandIn.documents(s, dir), QualityPs)

  private def olapRollupEvents(s: SparkSession, dir: String): DataFrame =
    graft.ops.Olap.rollupEventStats(StandIn.events(s, dir))

  private val SkewTopK = 10

  private def profileKeySkew(s: SparkSession, dir: String): DataFrame =
    Profile.keySkew(StandIn.events(s, dir), "event_type", SkewTopK)

  // (column, is-numeric) of StandIn.events — drives the oracle's UNION.
  private val ProfileEventCols = Seq(
    "event_id" -> true, "ts" -> false, "user_id" -> true,
    "event_type" -> false, "value" -> true, "props" -> false)

  private val QualityPs = Seq(0.5, 0.9, 0.99)

  // Smoothing factor shared by the EWMA query and its oracle fold.
  private val EwmaAlpha = 0.3

  private def textQualityPercentiles(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityPercentiles(StandIn.documents(s, dir), QualityPs)

  // Packing parameters shared with the oracle twin.
  private val PackBudget = 2048
  private val PackBuckets = 8

  // ─── DuckDB twins of ops/Bpe.scala ────────────────────────────────────
  // Merge application replayed as space-delimited string replace: word →
  // ' c h a r s ', each merge (a,b) → replace(' a b ', ' ab ') — replace's
  // left-to-right non-overlapping scan IS BpeMerge.mergeOnce's semantics.

  /** Chain of `replace` calls applying [[Bpe.FixedMerges]] in table order
    * to a spaced symbol string. */
  private def bpeReplaceChain(inner: String): String =
    Bpe.FixedMerges.foldLeft(inner) { case (acc, (a, b)) =>
      s"replace($acc, ' $a $b ', ' $a$b ')"
    }

  /** Spaced code-point symbols of a word expression. */
  private def bpeSpacedSql(wVar: String): String =
    s"' ' || array_to_string(regexp_extract_all($wVar, '.'), ' ') || ' '"

  /** Per-document lowercase `[a-z]+` word list (Bpe.words). */
  private val bpeWordsSql =
    "regexp_extract_all(lower(coalesce(text, '')), '[a-z]+')"

  /** Encoded-symbol string of one word under the fixed table. */
  private val bpeWordSymsSql = s"trim(${bpeReplaceChain(bpeSpacedSql("w"))})"

  /** BPE chunk budget shared with the corpus_chunk_bpe twin. */
  private val ChunkBpeBudget = 64

  /** Per-document BPE token count under the fixed table (Bpe.tokenCounts):
    * sum of per-word symbol counts, 0 for wordless documents. */
  private val bpeTokensSql =
    s"""CAST(list_reduce(list_prepend(0, list_transform($bpeWordsSql,
       |    w -> len(string_split($bpeWordSymsSql, ' ')))),
       |    (a, b) -> a + b) AS INT)""".stripMargin

  // ─── DuckDB twins of ops/QualityModel.scala ───────────────────────────
  // The rounded-GD optimization replayed step by step: every literal is
  // CAST to DOUBLE (DuckDB bare `1.0` is DECIMAL — a silent cross-engine
  // type split), gradients and weights round to 6 decimals per step
  // exactly like the Spark loop, and ws{t} CTEs are MATERIALIZED (each is
  // referenced twice — next gradient + next update — so inlining would
  // expand the chain exponentially).

  /** Design-matrix CTEs (qf): TextAnalysis.quality signals + inlined gate
    * label, every feature rounded to 6 decimals on both engines. */
  private val qmFeaturesSql = {
    val stop = TextAnalysis.LangMarkers.flatMap(_._2)
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""qf0 AS (
       |  SELECT d.doc_id,
       |         length(d.text) AS n_chars,
       |         len(k.t) AS n_tokens,
       |         round(len(list_filter(k.t, w -> list_contains($stop, w)))
       |           / CAST(greatest(len(k.t), 1) AS DOUBLE), 6) AS x1,
       |         round((length(d.text)
       |           - length(regexp_replace(d.text, '[.,!?;:]', '', 'g')))
       |           / CAST(greatest(length(d.text), 1) AS DOUBLE), 6) AS x2,
       |         length(d.text)
       |           / CAST(greatest(len(k.t), 1) AS DOUBLE) AS cpt
       |  FROM documents d JOIN toks k ON d.doc_id = k.doc_id
       |), qf AS MATERIALIZED (
       |  SELECT doc_id, CAST(1.0 AS DOUBLE) AS x0, x1, x2,
       |         round(least(n_tokens, 20) / CAST(20.0 AS DOUBLE), 6) AS x3,
       |         round(least(cpt, CAST(24.0 AS DOUBLE))
       |           / CAST(24.0 AS DOUBLE), 6) AS x4,
       |         round(least(n_chars, 128) / CAST(128.0 AS DOUBLE), 6) AS x5,
       |         CASE WHEN n_chars >= ${TextAnalysis.GateMinChars}
       |                AND n_tokens >= ${TextAnalysis.GateMinTokens}
       |                AND x1 <= ${TextAnalysis.GateMaxStopwordRatio}
       |                AND x2 <= ${TextAnalysis.GateMaxPunctRatio}
       |                AND cpt <= ${TextAnalysis.GateMaxCharsPerToken}
       |              THEN CAST(1.0 AS DOUBLE)
       |              ELSE CAST(0.0 AS DOUBLE) END AS y
       |  FROM qf0
       |)""".stripMargin
  }

  /** The [[graft.ops.QualityModel.Steps]] unrolled GD updates; ends at
    * CTE `ws{Steps}` holding the final weight row (w0..w4). */
  private val qmTrainChainSql = {
    val d = graft.ops.QualityModel.Dim
    val dot = (0 until d).map(j => s"w$j*x$j").mkString(" + ")
    val init = (0 until d).map(j => s"CAST(0.0 AS DOUBLE) AS w$j")
      .mkString(", ")
    val steps = (1 to graft.ops.QualityModel.Steps).map { t =>
      val g = (0 until d).map(j =>
        s"round(avg((1.0 / (1.0 + exp(-($dot))) - y) * x$j), 6) AS g$j")
        .mkString(",\n         ")
      val w = (0 until d).map(j =>
        s"round(w$j - CAST(${graft.ops.QualityModel.Lr} AS DOUBLE) * g$j, 6) AS w$j")
        .mkString(",\n         ")
      s""", gs$t AS (
         |  SELECT $g
         |  FROM qf, ws${t - 1}
         |), ws$t AS MATERIALIZED (
         |  SELECT $w
         |  FROM ws${t - 1}, gs$t
         |)""".stripMargin
    }.mkString
    s"""WITH $rawToksSql, $qmFeaturesSql, ws0 AS (SELECT $init)$steps"""
  }

  /** Training replayed round by round: vocab{r} CTEs are MATERIALIZED —
    * each is referenced twice (next round's pair count + next vocab), so
    * inlining would expand the chain exponentially. Pair counts enumerate
    * ALL adjacent positions via list index unnest; the argmax tiebreak
    * (count desc, a, b) is binary-collation string order on both engines
    * for the `[a-z]+` alphabet. */
  private val bpeTrainChainSql = {
    val head =
      s"""WITH words AS (
         |  SELECT lower(t.w) AS word, count(*) AS cnt
         |  FROM documents d,
         |       unnest(regexp_extract_all(lower(coalesce(d.text, '')),
         |              '[a-z]+')) AS t(w)
         |  GROUP BY 1
         |), vocab0 AS MATERIALIZED (
         |  SELECT word, cnt, ${bpeSpacedSql("word")} AS spaced
         |  FROM words ORDER BY cnt DESC, word LIMIT ${Bpe.VocabCap}
         |)""".stripMargin
    val rounds = (1 to Bpe.NumMerges).map { r =>
      val p = r - 1
      s""", pl$r AS (
         |  SELECT string_split(trim(spaced), ' ') AS l, cnt FROM vocab$p
         |), pe$r AS (
         |  SELECT unnest(generate_series(1, len(l) - 1)) AS i, l, cnt
         |  FROM pl$r
         |), best$r AS (
         |  SELECT l[CAST(i AS INT)] AS a, l[CAST(i AS INT) + 1] AS b,
         |         sum(cnt) AS pc
         |  FROM pe$r GROUP BY 1, 2 ORDER BY pc DESC, a, b LIMIT 1
         |), vocab$r AS MATERIALIZED (
         |  SELECT word, cnt, replace(spaced,
         |    ' ' || (SELECT a FROM best$r) || ' ' ||
         |           (SELECT b FROM best$r) || ' ',
         |    ' ' || (SELECT a FROM best$r) ||
         |           (SELECT b FROM best$r) || ' ') AS spaced
         |  FROM vocab$p
         |)""".stripMargin
    }.mkString
    s"$head$rounds"
  }

  private val bpeTrainOracle = {
    val sel = (1 to Bpe.NumMerges).map { r =>
      s"""SELECT $r AS rank, (SELECT a FROM best$r) AS pair_a,
         |  (SELECT b FROM best$r) AS pair_b,
         |  (SELECT a || b FROM best$r) AS merged,
         |  (SELECT CAST(pc AS BIGINT) FROM best$r) AS pair_count""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"$bpeTrainChainSql\n$sel"
  }

  /** Trained-table encode twin: the training chain's learned pairs land in
    * ONE `bests` row (a1..b${Bpe.NumMerges}); every document cross-joins
    * that row and the replace chain references its columns from inside the
    * per-word lambda — training AND encoding replayed in one statement. */
  private val bpeTrainedTokensOracle = {
    val bests = (1 to Bpe.NumMerges).map { r =>
      s"(SELECT a FROM best$r) AS a$r, (SELECT b FROM best$r) AS b$r"
    }.mkString(", bests AS MATERIALIZED (SELECT ", ",\n  ", ")")
    val rep = (1 to Bpe.NumMerges).foldLeft(bpeSpacedSql("w")) { (acc, r) =>
      s"replace($acc, ' ' || a$r || ' ' || b$r || ' ', ' ' || a$r || b$r || ' ')"
    }
    s"""$bpeTrainChainSql$bests
       |SELECT doc_id,
       |  CAST(list_reduce(list_prepend(0, list_transform($bpeWordsSql,
       |    w -> len(string_split(trim($rep), ' ')))),
       |    (x, y) -> x + y) AS INT) AS bpe_tokens
       |FROM documents CROSS JOIN bests""".stripMargin
  }

  // Chunking parameters shared with the oracle twin.
  private val ChunkSize = 64
  private val ChunkStride = 48

  private def corpusPack(s: SparkSession, dir: String): DataFrame =
    Curation.packSequences(StandIn.documents(s, dir), PackBudget, PackBuckets)

  // DuckDB twins of ops/Similarity.scala. `list_reduce` folds left like
  // Spark's `aggregate`, so double summation order (and thus bits) match.
  private val prepSql =
    s"""prep AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      |  FROM embeddings
      |), prepn AS (
      |  SELECT vec_id, vec,
      |         sqrt(list_reduce(list_transform(vec, x -> x * x),
      |              (a, b) -> a + b)) AS norm
      |  FROM prep
      |), queries AS (
      |  SELECT vec_id AS q_id, vec AS q_vec, norm AS q_norm
      |  FROM prepn
      |  ORDER BY ${hashSql(s"'${Similarity.QueryHashMember}:'",
                            "CAST(vec_id AS VARCHAR)")}, vec_id
      |  LIMIT ${Similarity.NumQueries}
      |)""".stripMargin

  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, ${Similarity.Dim + 1}),
       |  i -> $a[CAST(i AS INT)] * $b[CAST(i AS INT)]), (x, y) -> x + y)"""
      .stripMargin

  private def planeLiteral(p: Seq[Double]): String =
    p.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")

  private val bucketsSimSql = {
    val bitTerms = Similarity.planes(SrpBits).zipWithIndex.map { case (p, j) =>
      s"""CASE WHEN round(${dotSql("vec", planeLiteral(p))}, 6) > 0
         |     THEN ${1 << j} ELSE 0 END""".stripMargin
    }.mkString(" + ")
    s"""bsim AS (
       |  SELECT vec_id, vec, norm, $bitTerms AS bucket FROM prepn
       |)""".stripMargin
  }

  private def cosSql(av: String, an: String, bv: String, bn: String): String =
    s"round(${dotSql(av, bv)} / ($an * $bn), 6)"

  // IVF coarse cells: argmax (first-wins) of rounded dots against the
  // seed-7 Rademacher vectors — twin of Similarity.ivfCell.
  private val ivfCellsSql = {
    val dots = Similarity.planes(IvfCells, seed = 7L)
      .map(p => s"round(${dotSql("vec", planeLiteral(p))}, 6)")
      .mkString("[", ",\n    ", "]")
    s"""ivf AS (
       |  SELECT vec_id, vec, norm,
       |         CAST(list_position(d, list_max(d)) AS INT) AS cell
       |  FROM (SELECT vec_id, vec, norm, $dots AS d FROM prepn)
       |)""".stripMargin
  }

  // ─── north-star: text analysis over documents ──────────────────────────

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
  private val FrameBytes = 32
  private val FrameEveryN = 3

  // Pixel-formula CTEs shared by the real-decode oracle twins — MUST stay
  // in lockstep with Multimodal.ImageCodec.syntheticPng. Sequential
  // unnests (xs then px) expand the w×h pixel grid per document; `ch`
  // carries the three channel values of every pixel.
  private val pngPixelCtesSql =
    """d AS (
      |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 9) % 9 AS h
      |  FROM documents
      |), xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
      |px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
      |ch AS (
      |  SELECT doc_id, w, h,
      |         (doc_id * 31 + x * 7 + y * 13) % 256 AS r,
      |         (doc_id * 17 + x * 11 + y * 5) % 256 AS g,
      |         (doc_id * 23 + x * 3 + y * 19) % 256 AS b
      |  FROM px
      |)""".stripMargin

  // Corpus-dashboard CTE fragments (need `toks` in scope) — shared by the
  // standalone twins and the corpus_report composite so they cannot drift.
  private lazy val corpusStatsCtesSql =
    """csd AS (
      |  SELECT count(*) AS n_docs,
      |         sum(CASE WHEN coalesce(length(text), 0) = 0
      |                  THEN 1 ELSE 0 END) AS n_empty,
      |         sum(coalesce(length(text), 0)) AS total_chars
      |  FROM documents
      |), cst AS (
      |  SELECT sum(len(t)) AS total_tokens FROM toks
      |), csv AS (
      |  SELECT count(DISTINCT w) AS distinct_terms
      |  FROM (SELECT unnest(t) AS w FROM toks)
      |)""".stripMargin

  // Train/val drift chain (Curation.tokenDrift twin): hashed buckets per
  // split, conditional histogram, Jelinek-Mercer smoothing, KL + JS sums
  // exposed via dfa (klp, jsp) and dft (ntr, nva, seen).
  private lazy val driftCtesSql = {
    val B = Curation.DsirBuckets
    val lam = Curation.DriftUniformMix
    val oneMinus = s"CAST(${1 - lam} AS DOUBLE)"
    val floorMass = s"CAST(${lam / B} AS DOUBLE)"
    val bounds = Curation.splitBounds(SplitFractions)
    val cases = SplitFractions.init.zip(bounds.init)
      .map { case ((name, _), cut) => s"WHEN sb < $cut THEN '$name'" }
      .mkString(" ")
    s"""dfx AS (
       |  SELECT doc_id, unnest(t) AS w FROM toks
       |), dfs AS (
       |  SELECT CASE $cases ELSE '${SplitFractions.last._1}' END AS split,
       |         ${hashSql("'0:'")} % $B AS b
       |  FROM (
       |    SELECT doc_id, w,
       |           ${hashSql(s"'${Curation.SplitHashIndex}:'",
                      "CAST(doc_id AS VARCHAR)")} % 10000 AS sb
       |    FROM dfx
       |  )
       |), dfc AS (
       |  SELECT b,
       |         sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS ctr,
       |         sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS cva
       |  FROM dfs WHERE split IN ('train', 'val') GROUP BY b
       |), dft AS (
       |  SELECT sum(ctr) AS ntr, sum(cva) AS nva, count(*) AS seen FROM dfc
       |), dfp AS (
       |  SELECT CAST(cva AS DOUBLE) / greatest(nva, 1) * $oneMinus
       |           + $floorMass AS pv,
       |         CAST(ctr AS DOUBLE) / greatest(ntr, 1) * $oneMinus
       |           + $floorMass AS pt
       |  FROM dfc, dft
       |), dfa AS (
       |  SELECT sum(pv * log10(pv / pt)) AS klp,
       |         sum(pv * log10(pv / ((pv + pt) / 2)) * 0.5
       |             + pt * log10(pt / ((pv + pt) / 2)) * 0.5) AS jsp
       |  FROM dfp
       |)""".stripMargin
  }

  // Length-histogram chain (Curation.lengthHistogram twin) grouped into
  // lhg (bucket, n_docs, total_tokens).
  private lazy val lengthHistCtesSql =
    """lh AS (
      |  SELECT coalesce(len(regexp_extract_all(text,
      |           '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')), 0) AS n
      |  FROM documents
      |), lb AS (
      |  SELECT n, CASE WHEN n = 0 THEN 0
      |                 ELSE length(bin(CAST(n AS BIGINT))) END AS bucket
      |  FROM lh
      |), lhg AS (
      |  SELECT bucket, count(*) AS n_docs, sum(n) AS total_tokens
      |  FROM lb GROUP BY bucket
      |)""".stripMargin

  // Perceptual-hash oracle CTEs — MUST stay in lockstep with
  // Multimodal.phash. Integer luma of the formula pixel at (sx, sy),
  // as a SQL fragment (each channel mod-256, summed, //3 — the same
  // integer arithmetic the Scala stage runs on the DECODED pixels).
  private def phashLumaSql(sx: String, sy: String): String =
    s"((doc_id * 31 + ($sx) * 7 + ($sy) * 13) % 256 + " +
      s"(doc_id * 17 + ($sx) * 11 + ($sy) * 5) % 256 + " +
      s"(doc_id * 23 + ($sx) * 3 + ($sy) * 19) % 256) // 3"

  // The 6×10 sampling grid per document, aHash bit threshold via a
  // per-doc window mean, dHash bits via 11-column adjacent comparisons;
  // both assembled into 60-bit BIGINTs (bit 59 max — constructible on
  // both engines, unlike bit 63).
  private lazy val phashCtesSql = {
    val aLuma = phashLumaSql("gx * w // 10", "gy * h // 6")
    val dLeft = phashLumaSql("gx * w // 11", "gy * h // 6")
    val dRight = phashLumaSql("(gx + 1) * w // 11", "gy * h // 6")
    s"""pd AS (
       |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 9) % 9 AS h
       |  FROM documents
       |), pgx AS (SELECT doc_id, w, h, unnest(range(0, 10)) AS gx FROM pd),
       |pg AS (SELECT doc_id, w, h, gx, unnest(range(0, 6)) AS gy FROM pgx),
       |asamp AS (
       |  SELECT doc_id, gy * 10 + gx AS pos, $aLuma AS luma FROM pg
       |), ah AS (
       |  SELECT doc_id,
       |         CAST(sum(CASE WHEN luma > m
       |           THEN (CAST(1 AS BIGINT) << CAST(pos AS INT))
       |           ELSE 0 END) AS BIGINT) AS ahash
       |  FROM (SELECT *, sum(luma) OVER (PARTITION BY doc_id) / 60.0 AS m
       |        FROM asamp) t
       |  GROUP BY doc_id
       |), dh AS (
       |  SELECT doc_id,
       |         CAST(sum(CASE WHEN ($dRight) > ($dLeft)
       |           THEN (CAST(1 AS BIGINT) << CAST(gy * 10 + gx AS INT))
       |           ELSE 0 END) AS BIGINT) AS dhash
       |  FROM pg GROUP BY doc_id
       |)""".stripMargin
  }

  /** The REAL-decode feature stage with a driver-sortable shape: one
    * double column per luminance-histogram bin, computed from pixels that
    * went through an actual PNG encode→ImageIO decode round-trip.
    * float→double widening is exact, and DuckDB reproduces the float
    * arithmetic with REAL casts over the synthetic pixel formula, so the
    * codec path is oracle-checked bit-for-bit.
    */
  private def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    val feats = Multimodal.extractFeatures(
      Multimodal.pngMedia(s, dir), Multimodal.ImageLumaExtractor)
    feats.select(col("media_id") +: (0 until 16).map(j =>
      element_at(col("features"), j + 1).cast("double").alias(s"f$j")): _*)
  }

  /** Exact-integer face of the real decode stage: dims, pixel count, and
    * per-channel sums as longs (bit-stable, no float accumulation), plus
    * the derived double means rounded once.
    */
  private def mmDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeImageStats(Multimodal.pngMedia(s, dir))
      .select(col("media_id"), col("decoded"), col("width_px"),
        col("height_px"), col("n_px"), col("r_sum"), col("g_sum"),
        col("b_sum"),
        round(col("r_sum").cast("double") / col("n_px"), 6).alias("r_mean"),
        round(col("g_sum").cast("double") / col("n_px"), 6).alias("g_mean"),
        round(col("b_sum").cast("double") / col("n_px"), 6).alias("b_mean"))

  /** The no-codec fallback path (mapPartitions byte histogram over opaque
    * text payloads) with the same sortable shape.
    */
  private def mmFeaturesBytes(s: SparkSession, dir: String): DataFrame = {
    val feats = Multimodal.extractFeatures(Multimodal.documentMedia(s, dir))
    feats.select(col("media_id") +: (0 until 16).map(j =>
      element_at(col("features"), j + 1).cast("double").alias(s"f$j")): _*)
  }

  /** The frame-sampling stage, frames compared as uppercase hex (DuckDB
    * cannot hash a BLOB, and a sliced frame need not be valid UTF-8).
    */
  private def mmFrames(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
      Multimodal.documentMedia(s, dir),
      new Multimodal.FixedSizeFrameSampler(FrameBytes, FrameEveryN))
      .select(col("media_id"), col("frame_idx"), col("frame_bytes"),
        hex(col("frame_payload")).alias("frame_hex"))

  private def langListSql(lang: String): String =
    TextAnalysis.LangMarkers.toMap.apply(lang)
      .map(w => s"'$w'").mkString("[", ", ", "]")

  private val langScoresSql = TextAnalysis.LangMarkers.map { case (lang, _) =>
    s"""len(list_filter(t, w -> list_contains(${langListSql(lang)}, w)))
       |  / CAST(greatest(len(t), 1) AS DOUBLE) AS ${lang}_score"""
      .stripMargin
  }.mkString(",\n")

  // ─── oracle SQL (DuckDB) ───────────────────────────────────────────────

  private val R = StandIn.readingsSql("events")

  private val classifySql =
    """CASE
      | WHEN sensor_type='temperature' AND unit='celsius' AND (value<15 OR value>30) THEN 'temperature_critical'
      | WHEN sensor_type='temperature' AND unit='celsius' AND value>27 THEN 'temperature_warning'
      | WHEN sensor_type='humidity' AND unit='percent' AND (value<30 OR value>70) THEN 'humidity_critical'
      | WHEN sensor_type='humidity' AND unit='percent' AND (value<35 OR value>60) THEN 'humidity_warning'
      | WHEN sensor_type='pressure' AND unit='hPa' AND (value<980 OR value>1040) THEN 'pressure_critical'
      | WHEN sensor_type='pressure' AND unit='hPa' AND (value<995 OR value>1030) THEN 'pressure_warning'
      | WHEN battery_level<20 THEN 'battery_critical'
      | WHEN battery_level<40 THEN 'battery_warning'
      | WHEN signal_strength<-75 THEN 'weak_signal_critical'
      | WHEN signal_strength<-70 THEN 'weak_signal_warning'
      | ELSE NULL END""".stripMargin

  private val enrichSql =
    """sensor_id, sensor_type, building, floor, room, timestamp,
      | battery_level, signal_strength, alert_type,
      | CASE WHEN alert_type LIKE '%critical%' THEN 'critical'
      |      WHEN alert_type LIKE '%warning%' THEN 'warning'
      |      ELSE 'info' END AS severity,
      | CASE alert_type WHEN 'temperature_critical' THEN 30
      |   WHEN 'temperature_warning' THEN 27
      |   WHEN 'humidity_critical' THEN 70
      |   WHEN 'humidity_warning' THEN 60
      |   WHEN 'pressure_critical' THEN 1040
      |   WHEN 'pressure_warning' THEN 1030
      |   WHEN 'battery_critical' THEN 20
      |   WHEN 'battery_warning' THEN 40
      |   WHEN 'weak_signal_critical' THEN -75
      |   WHEN 'weak_signal_warning' THEN -70
      |   ELSE NULL END AS threshold_value,
      | value AS actual_value,
      | CASE WHEN alert_type='temperature_critical' THEN 'Température CRITIQUE (>30°C ou <15°C)'
      |   WHEN alert_type='temperature_warning' THEN 'Température élevée (>27°C)'
      |   WHEN alert_type='humidity_critical' THEN 'Humidité CRITIQUE (<30% ou >70%)'
      |   WHEN alert_type='humidity_warning' THEN 'Humidité anormale (<35% ou >60%)'
      |   WHEN alert_type='pressure_critical' THEN 'Pression atmosphérique anormale (<980 ou >1040 hPa)'
      |   WHEN alert_type='pressure_warning' THEN 'Pression hors plage (<995 ou >1030 hPa)'
      |   WHEN alert_type='battery_critical' THEN 'Batterie CRITIQUE (<20%)'
      |   WHEN alert_type='battery_warning' THEN 'Batterie faible (<40%)'
      |   WHEN alert_type LIKE 'weak_signal_%' THEN 'Signal WiFi IoT faible'
      |   ELSE 'Anomalie détectée' END AS message,
      | event_time AS triggered_at,
      | CAST(NULL AS TIMESTAMP) AS resolved_at,
      | 'active' AS status""".stripMargin

  private val alertsClassifyOracle =
    s"""$R, classified AS (
       |  SELECT *, $classifySql AS alert_type FROM readings
       |)
       |SELECT $enrichSql
       |FROM classified WHERE alert_type IS NOT NULL""".stripMargin

  // ─── driver contract ───────────────────────────────────────────────────

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "alerts_classify"   -> ((s, d) => alertsClassify(s, d)),
    "parse_readings"    -> ((s, d) => parseReadings(s, d)),
    "agg_sensor_stats"  -> ((s, d) => aggSensorStats(s, d)),
    "agg_sliding_stats" -> ((s, d) => aggSlidingStats(s, d)),
    "json_parse"        -> ((s, d) => jsonParse(s, d)),
    "json_roundtrip"    -> ((s, d) => jsonRoundtrip(s, d)),
    "cast_timestamp"    -> ((s, d) => castTimestamp(s, d)),
    "filter_like"       -> ((s, d) => filterLike(s, d)),
    "filter_predicates" -> ((s, d) => filterPredicates(s, d)),
    "alerts_mailable"   -> ((s, d) => alertsMailable(s, d)),
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
    "sim_cos_histogram"   -> ((s, d) =>
      Similarity.cosineHistogram(StandIn.embeddings(s, d), SrpBits)),
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
    "dedup_clusters"      -> ((s, d) => dedupClusters(s, d)),
    "dedup_clusters_bigstar" -> ((s, d) =>
      Dedup.clustersBigStar(StandIn.documents(s, d),
        MinhashK, MinhashBands, MinhashEstThreshold)),
    "dedup_simhash_pairs" -> ((s, d) => dedupSimhashNearDup(s, d)),
    "dedup_keepers"       -> ((s, d) => dedupKeepers(s, d)),
    "corpus_curate"       -> ((s, d) => corpusCurate(s, d)),
    "sim_brute_topk"      -> ((s, d) => simBruteTopK(s, d)),
    "sim_lsh_topk"        -> ((s, d) => simLshTopK(s, d)),
    "sim_cosine_neardup"  -> ((s, d) => simCosineNearDup(s, d)),
    // Clusters run at a STRICTER threshold than the pairs query: 0.25 is
    // ~2σ of random cosine at dim 64, so on near-orthogonal synthetic
    // embeddings it admits the random tail and welds one sprawling
    // component whose diameter the CC loop then pays for round by round.
    // 0.4 (3σ+) keeps only strong-similarity edges — the semantics a
    // dedup cluster means, and an O(1)-diameter graph.
    "sim_neardup_clusters" -> ((s, d) =>
      Similarity.cosineNearDupClusters(
        StandIn.embeddings(s, d), SrpBits, NearDupClusterCosine)),
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
    "sim_ivf_topk"        -> ((s, d) => simIvfTopK(s, d)),
    // K-means training is an imperative iterative fit with no practical
    // SQL twin; the driver records a rows-only check and SimilaritySpec
    // bounds recall vs the exact brute force.
    "sim_ivf_kmeans"      -> ((s, d) => simIvfKmeans(s, d)),
    // Trained-quantizer recall vs brute force — rows-only (the IVF side
    // has no SQL twin) but 1-row deterministic; SimilaritySpec bounds it.
    "sim_ivf_recall"      -> ((s, d) => simIvfRecall(s, d)),
    "sim_ivf_recall_audit" -> ((s, d) => simIvfRecallAudit(s, d)),
    "sim_pq_recall_audit" -> ((s, d) => simPqRecallAudit(s, d)),
    "sim_ivfpq_recall_audit" -> ((s, d) => simIvfPqRecallAudit(s, d)),
    // PQ training is the same imperative fit — rows-only check;
    // SimilaritySpec bounds ADC recall against the exact baseline.
    "sim_pq_topk"         -> ((s, d) =>
      Similarity.pqTopK(StandIn.embeddings(s, d), k = TopK)),
    // IVFPQ (coarse cells + residual PQ, the FAISS IVFADC shape) — same
    // imperative-training caveat → rows-only + recall-bounded unit test.
    "sim_ivfpq"           -> ((s, d) =>
      Similarity.ivfPqTopK(StandIn.embeddings(s, d), IvfCells, k = TopK)),
    "sim_quantize"        -> ((s, d) => simQuantize(s, d)),
    // Johnson–Lindenstrauss random projection to 16 dims (Rademacher
    // planes, the SRP machinery reused): per-vector components + the
    // ‖y‖²/‖x‖² distortion report (Similarity.randomProjection).
    "sim_rp_project"      -> ((s, d) =>
      Similarity.randomProjection(StandIn.embeddings(s, d))),
    // RP-space vs full-space recall report (rows-only by design — the
    // recall value is engine-measured; the audit twin hash-checks its
    // floor): Similarity.rpRecallReport.
    "sim_rp_recall"       -> ((s, d) =>
      Similarity.rpRecallReport(StandIn.embeddings(s, d))),
    // Collapse-guard recall contract (floor 6× the random baseline —
    // see Similarity.RpRecallFloor scaladoc for the honest reading) +
    // the ACTUAL JL guarantee: pairwise-cosine distortion over the
    // constant draw, bounds hash-checked (Similarity.rpCosineAudit).
    "sim_rp_recall_audit" -> ((s, d) =>
      Similarity.rpRecallAudit(StandIn.embeddings(s, d))),
    // Density outlier screen over the SRP near-dup graph: vectors with
    // < 2 bucket-mates at the near-dup cosine (Similarity.densityOutliers).
    "sim_density_outliers" -> ((s, d) =>
      Similarity.densityOutliers(StandIn.embeddings(s, d),
        SrpBits, NearDupCosine)),
    "sim_rp_cosine"       -> ((s, d) =>
      Similarity.rpCosineReport(StandIn.embeddings(s, d))),
    "sim_rp_cosine_audit" -> ((s, d) =>
      Similarity.rpCosineAudit(StandIn.embeddings(s, d))),
    // k-NN label-agreement eval over the exact top-k: majority-vote
    // predictions vs true labels per drawn query — the embedding-quality
    // probe (Similarity.knnLabelEval).
    "sim_knn_label_eval"  -> ((s, d) =>
      Similarity.knnLabelEval(StandIn.embeddings(s, d))),
    "sessionize"          -> ((s, d) => sessionize(s, d)),
    "corpus_sample"       -> ((s, d) => corpusSample(s, d)),
    "text_tfidf"          -> ((s, d) => textTfIdf(s, d)),
    // Keyword extraction: top-3 TF-IDF terms per doc, WindowGroupLimit
    // per-doc k-heap (TextAnalysis.keywords).
    "text_keywords"       -> ((s, d) =>
      TextAnalysis.keywords(StandIn.documents(s, d))),
    // HLL++ sketch — engine-specific, so no DuckDB twin exists; the driver
    // records a rows-only check (TextAnalysisSpec bounds the error vs the
    // exact termStats).
    "text_term_stats_sketch" -> ((s, d) => textTermStatsSketch(s, d)),
    "decontaminate"       -> ((s, d) => decontaminate(s, d)),
    "decontaminate_bloom" -> ((s, d) => decontaminateBloom(s, d)),
    // Fuzzy decontamination: near-dup screen of corpus vs the benchmark
    // split (doc_id % 10 = 0), flags not drops — the paraphrased-eval
    // leak exact grams miss (Curation.contaminationNearDup).
    "decontaminate_neardup" -> ((s, d) => {
      val docs = StandIn.documents(s, d)
      Curation.contaminationNearDup(
        docs.where(col("doc_id") % 10 =!= 0),
        docs.where(col("doc_id") % 10 === 0),
        MinhashK, MinhashBands, MinhashEstThreshold)
    }),
    // Contamination dashboard: exact / fuzzy / union flag counts in ONE
    // row (Curation.contaminationReport) - the eval-card figure.
    "corpus_contamination_report" -> ((s, d) =>
      Curation.contaminationReport(StandIn.documents(s, d),
        col("doc_id") % 10 === 0, minShared = 3, dfCap = 20,
        MinhashK, MinhashBands, MinhashEstThreshold)),
    "corpus_pack"         -> ((s, d) => corpusPack(s, d)),
    // Packing-efficiency headline: fill rate vs the budget + overflow
    // share in ONE row (Curation.packEfficiency over the same layout).
    "corpus_pack_efficiency" -> ((s, d) =>
      Curation.packEfficiency(StandIn.documents(s, d),
        PackBudget, PackBuckets)),
    "corpus_bpe_train"    -> ((s, d) =>
      Bpe.trainTable(s, StandIn.documents(s, d))),
    "corpus_bpe_train_dist" -> ((s, d) =>
      Bpe.trainTableDistributed(s, StandIn.documents(s, d))),
    "text_bpe_symbols"    -> ((s, d) =>
      Bpe.encodeSymbols(StandIn.documents(s, d))),
    "text_bpe_tokens"     -> ((s, d) =>
      Bpe.tokenCounts(StandIn.documents(s, d))),
    "text_bpe_tokens_trained" -> ((s, d) =>
      Bpe.tokenCountsTrained(s, StandIn.documents(s, d))),
    "corpus_mix_bpe"      -> ((s, d) =>
      Bpe.mixEpochsBpe(StandIn.documents(s, d), MixTargets.toMap)),
    "text_quality_train"  -> ((s, d) =>
      graft.ops.QualityModel.weightsTable(s, StandIn.documents(s, d))),
    "text_quality_train_scores" -> ((s, d) =>
      graft.ops.QualityModel.trainedScores(StandIn.documents(s, d))),
    // Precision/recall/F1 vs the rule-gate teacher across a 9-point
    // threshold sweep — the trained model's shipping evidence.
    "text_quality_eval"   -> ((s, d) =>
      graft.ops.QualityModel.evalCard(StandIn.documents(s, d))),
    // Composition: trained quality scores as the A-ES sampling weight —
    // quality-proportional corpus draw (higher-scored docs more likely).
    "corpus_sample_quality" -> ((s, d) =>
      Curation.sampleWeighted(
        graft.ops.QualityModel.trainedScores(StandIn.documents(s, d))
          .select(col("doc_id"), col("score")),
        k = 50, weightCol = "score", seed = "graft-q1")),
    // DSIR importance weights (Xie et al. 2023): per-doc mean log-ratio of
    // target vs raw hashed-gram distributions, target = the quality-gated
    // subset (Curation.dsirWeights scaladoc has the scale shape)...
    "text_dsir_weights"   -> ((s, d) =>
      Curation.dsirWeights(StandIn.documents(s, d))),
    // ...and the deterministic selection face: top-k most target-like.
    "corpus_select_dsir"  -> ((s, d) =>
      Curation.selectByDsir(StandIn.documents(s, d))),
    "corpus_pack_bpe"     -> ((s, d) =>
      Bpe.packByBpe(StandIn.documents(s, d), Bpe.FixedMerges,
        PackBudget, PackBuckets)),
    "corpus_chunk_bpe"    -> ((s, d) =>
      Bpe.chunkByBpe(StandIn.documents(s, d), Bpe.FixedMerges,
        ChunkBpeBudget)),
    "corpus_split"        -> ((s, d) => corpusSplit(s, d)),
    "corpus_shuffle"      -> ((s, d) => corpusShuffle(s, d)),
    "corpus_mix"          -> ((s, d) => corpusMix(s, d)),
    "text_redact"         -> ((s, d) => textRedact(s, d)),
    "profile_events"      -> ((s, d) => profileEvents(s, d)),
    "profile_events_approx" -> ((s, d) => profileEventsApprox(s, d)),
    "profile_events_audit" -> ((s, d) =>
      Profile.profileAudit(StandIn.events(s, d))),
    "profile_key_skew"    -> ((s, d) => profileKeySkew(s, d)),
    // Per-dimension embedding health profile: n/mean/std/min/max per
    // coordinate, DECIMAL-exact sums (Profile.embeddingProfile).
    "profile_embeddings"  -> ((s, d) =>
      Profile.embeddingProfile(StandIn.embeddings(s, d))),
    "profile_constraints" -> ((s, d) =>
      Profile.checkConstraints(StandIn.events(s, d))),
    // HLL-uniqueness variant — engine-specific sketch metric → rows-only
    // (row count = the fixed check list; booleans deterministic, pinned
    // by ProfileSpec).
    "profile_constraints_approx" -> ((s, d) =>
      Profile.checkConstraints(StandIn.events(s, d), exact = false)),
    "corpus_sample_grouped" -> ((s, d) =>
      Curation.sampleGrouped(StandIn.documents(s, d))),
    "corpus_sample_weighted" -> ((s, d) =>
      Curation.sampleWeighted(StandIn.documents(s, d))),
    // Per-stratum weighted fixed-k: language quotas with in-quota length
    // bias — the sampler matrix's last cell (Curation.sampleGroupedWeighted).
    "corpus_sample_grouped_weighted" -> ((s, d) =>
      Curation.sampleGroupedWeighted(StandIn.documents(s, d))),
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
    "asof_purchase_view"  -> ((s, d) => asofPurchaseView(s, d)),
    // NEAREST-in-time as-of (either direction, backward-preferred ties,
    // microsecond arithmetic): AsOf.asofNearest via the one-exchange
    // double-window trick; oracle = the declarative per-key product.
    "asof_nearest_view"   -> ((s, d) =>
      graft.ops.AsOf.purchasesWithNearestView(StandIn.events(s, d))),
    "range_session_purchases" -> ((s, d) => rangeSessionPurchases(s, d)),
    // Interval×interval OVERLAP join (bin-bucketed, exactly-once via the
    // first-shared-bin rule — RangeJoin.intervalOverlap): user sessions
    // overlapped with global high-value activity bursts per event type
    // (Sessionize.typeBursts); oracle = DuckDB's declarative overlap join.
    "join_interval_overlap" -> ((s, d) => {
      val ev = StandIn.events(s, d)
      val sessions = Sessionize.sessions(ev)
        .select(col("user_id"), col("session_seq"),
          col("start_sec"), col("end_sec"))
      val bursts = Sessionize.typeBursts(ev)
        .select(col("event_type"), col("burst_seq"),
          col("b_start"), col("b_end"))
      graft.ops.RangeJoin.intervalOverlap(
        sessions, "start_sec", "end_sec", bursts, "b_start", "b_end")
        .select(col("user_id"), col("session_seq"),
          col("start_sec"), col("end_sec"),
          col("event_type"), col("burst_seq"), col("b_start"), col("b_end"),
          (least(col("end_sec"), col("b_end")) -
            greatest(col("start_sec"), col("b_start")) + 1)
            .alias("overlap_sec"))
    }),
    "olap_pivot_events"   -> ((s, d) => olapPivotEvents(s, d)),
    "olap_rollup_events"  -> ((s, d) => olapRollupEvents(s, d)),
    "olap_cube_events"    -> ((s, d) => olapCubeEvents(s, d)),
    "olap_grouping_sets"  -> ((s, d) =>
      graft.ops.Olap.groupingSetsStats(StandIn.events(s, d))),
    "olap_unpivot"        -> ((s, d) =>
      graft.ops.Olap.unpivotMeasures(StandIn.table(s, d, "lineitem"))),
    "json_props_stats"    -> ((s, d) =>
      Parse.propsKeyStats(StandIn.events(s, d))),
    "window_moving_stats" -> ((s, d) => windowMovingStats(s, d)),
    "window_lag_lead"     -> ((s, d) => windowLagLead(s, d)),
    "funnel_conversion"   -> ((s, d) => funnelConversion(s, d)),
    "funnel_stages"       -> ((s, d) =>
      graft.ops.Funnel.streamingConversion(StandIn.events(s, d)).toDF()),
    "agg_distinct_users"  -> ((s, d) => aggDistinctUsers(s, d)),
    // HLL++ sketch counts — engine-specific, so no DuckDB twin; rows-only
    // driver check (group keys are deterministic, so the row COUNT matches
    // the exact variant) + an error-bound unit test in OlapSpec.
    "agg_distinct_hll"    -> ((s, d) => aggDistinctHll(s, d)),
    // Bounded-error contract for the sketch above, fully oracle-checked:
    // exact keys/counts + a within-3·rsd boolean the oracle pins to TRUE.
    "agg_distinct_hll_audit" -> ((s, d) =>
      graft.ops.Olap.dailyActiveUsersAudit(StandIn.events(s, d))),
    // DataSketches HLL day→week union rollup — deterministic but
    // engine-specific → rows-only; the audit twin is the contract.
    "agg_distinct_hll_rollup" -> ((s, d) =>
      graft.ops.Olap.weeklyActiveUsersRollup(StandIn.events(s, d))),
    "agg_distinct_hll_rollup_audit" -> ((s, d) =>
      graft.ops.Olap.weeklyActiveUsersRollupAudit(StandIn.events(s, d))),
    "stat_quantile_bins"  -> ((s, d) =>
      Profile.quantileBins(StandIn.events(s, d))),
    // KLL-ish percentile sketch face — engine-specific edges → rows-only
    // (bin count deterministic; ProfileSpec bounds the drift vs exact).
    "stat_quantile_bins_approx" -> ((s, d) =>
      Profile.quantileBins(StandIn.events(s, d), exact = false)),
    "olap_pricing"        -> ((s, d) => olapPricingSummary(s, d)),
    "join_revenue_nation" -> ((s, d) => joinRevenueNation(s, d)),
    "window_topn"         -> ((s, d) =>
      graft.ops.WindowOps.topNPerUser(StandIn.events(s, d))),
    "join_anti_orders"    -> ((s, d) =>
      graft.ops.SetOps.customersWithoutBigOrders(
        StandIn.table(s, d, "customer"), StandIn.table(s, d, "orders"))),
    "set_except_users"    -> ((s, d) =>
      graft.ops.SetOps.clickersNotBuyers(StandIn.events(s, d))),
    "set_intersect_users" -> ((s, d) =>
      graft.ops.SetOps.clickersAlsoBuyers(StandIn.events(s, d))),
    "join_full_outer"     -> ((s, d) =>
      graft.ops.SetOps.dailyClickPurchaseMatrix(StandIn.events(s, d))),
    "stat_moments"        -> ((s, d) =>
      Profile.valueMoments(StandIn.table(s, d, "lineitem"))),
    "stat_pair_moments"   -> ((s, d) =>
      Profile.pairMoments(StandIn.table(s, d, "lineitem"))),
    "stat_zscore"         -> ((s, d) =>
      Profile.zscoreOutliers(StandIn.events(s, d))),
    "stat_corr_matrix"    -> ((s, d) =>
      Profile.correlationMatrix(StandIn.table(s, d, "lineitem"))),
    "olap_event_lift"     -> ((s, d) =>
      graft.ops.Olap.eventTypeLift(StandIn.events(s, d))),
    "stat_chisquare"      -> ((s, d) =>
      Profile.chiSquareCells(StandIn.events(s, d),
        col("event_type"), weekday(col("ts")).cast("int"))),
    // Exact two-sample Kolmogorov-Smirnov drift test between two event
    // types' value distributions; running CDFs over the bounded
    // distinct-value cell table (Profile.ksTest).
    "stat_ks_test"        -> ((s, d) =>
      Profile.ksTest(StandIn.events(s, d))),
    "stat_cramers_v"      -> ((s, d) =>
      Profile.chiSquareStat(StandIn.events(s, d),
        col("event_type"), weekday(col("ts")).cast("int"))),
    "olap_retention"      -> ((s, d) =>
      graft.ops.Olap.retentionCohorts(StandIn.events(s, d))),
    "olap_histogram"      -> ((s, d) =>
      graft.ops.Olap.valueHistogram(StandIn.events(s, d))),
    // Incremental aggregate maintenance: per-key state merged with the
    // delta; the oracle is the FULL recompute, so the hash check proves
    // the merge law (Olap.incrementalMerge).
    "agg_incremental_merge" -> ((s, d) =>
      graft.ops.Olap.incrementalMerge(StandIn.events(s, d))),
    // Z-order (Morton) layout key: codegen'd bit interleave of two
    // bounded dims - the multi-dimensional row-group-pruning layout
    // (graft.ops.Zorder scaladoc has the 100 TB story).
    "olap_zorder_key"     -> ((s, d) =>
      graft.ops.Zorder.eventKeys(StandIn.events(s, d))),
    // Week-over-week movement: daily counts + lag(7) over the bounded
    // (type, day) table, join-free, calendar-gap-safe (Olap.weekOverWeek).
    "olap_wow"            -> ((s, d) =>
      graft.ops.Olap.weekOverWeek(StandIn.events(s, d))),
    // Seasonal-naive forecast-baseline eval: MAE/MAPE of the week-back
    // predictor per type, composed on weekOverWeek's daily table
    // (Olap.seasonalNaiveEval).
    "ts_forecast_eval"    -> ((s, d) =>
      graft.ops.Olap.seasonalNaiveEval(StandIn.events(s, d))),
    // Benford first-digit screen: observed vs log10(1+1/d) expectation
    // per digit (Olap.benfordScreen).
    "stat_benford"        -> ((s, d) =>
      graft.ops.Olap.benfordScreen(StandIn.events(s, d))),
    // Lexical diversity: TTR + Guiraud root TTR, zero-shuffle projection
    // (TextAnalysis.typeTokenRatio).
    "text_ttr"            -> ((s, d) =>
      TextAnalysis.typeTokenRatio(StandIn.documents(s, d))),
    // Seasonality heatmap: (dow, hour, type) activity matrix, epoch
    // arithmetic only, DECIMAL-exact value sums (Olap.seasonality).
    "olap_seasonality"    -> ((s, d) =>
      graft.ops.Olap.seasonality(StandIn.events(s, d))),
    "olap_revenue_share"  -> ((s, d) => olapRevenueShare(s, d)),
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
    "ts_resample_ffill"   -> ((s, d) =>
      graft.ops.Resample.hourlyFfill(StandIn.events(s, d))),
    "ts_ewma"             -> ((s, d) =>
      graft.ops.Resample.ewma(StandIn.events(s, d), EwmaAlpha)),
    "stat_winsorize"      -> ((s, d) =>
      graft.ops.Resample.winsorize(StandIn.events(s, d))),
    // Streaming running-stats anomaly detector, batch-replay face: the
    // exact-decimal prefix sums make the replay reproduce the SQL
    // prefix-window oracle bit for bit (cross-paradigm, like funnel_stages).
    "stream_anomaly"      -> ((s, d) =>
      graft.ops.Anomaly.streamingOutliers(StandIn.events(s, d)).toDF()),
    "join_attribution"    -> ((s, d) =>
      graft.ops.StreamJoin.purchaseAttribution(StandIn.events(s, d))),
    "corpus_chunk"        -> ((s, d) =>
      Curation.chunkDocuments(StandIn.documents(s, d), ChunkSize, ChunkStride)),
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
    // Train/val token-distribution drift: smoothed KL + JS over hashed
    // buckets, unseen-bucket mass in closed form (Curation.tokenDrift).
    "corpus_token_drift"  -> ((s, d) =>
      Curation.tokenDrift(StandIn.documents(s, d))),
    // One-row snapshot dashboard (Curation.corpusStats).
    "corpus_stats"        -> ((s, d) =>
      Curation.corpusStats(StandIn.documents(s, d))),
    // Snapshot-report composite: dashboard + drift verdict + length
    // summaries in ONE row (Curation.corpusReport).
    "corpus_report"       -> ((s, d) =>
      Curation.corpusReport(StandIn.documents(s, d))),
    // Deduplication dashboard: exact / near / line-level duplication of
    // the snapshot in ONE row (Curation.dedupReport) — each figure reuses
    // the operator behind its standalone query.
    "corpus_dedup_report" -> ((s, d) =>
      Curation.dedupReport(StandIn.documents(s, d),
        MinhashK, MinhashBands, MinhashEstThreshold)),
    // Context-length distribution: power-of-two bins by BPE-ish count,
    // integer bit-length binning (Curation.lengthHistogram).
    "corpus_length_histogram" -> ((s, d) =>
      Curation.lengthHistogram(StandIn.documents(s, d))),
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
    "text_token_counts"   -> ((s, d) => textTokenCounts(s, d)),
    "text_fingerprint"    -> ((s, d) => textFingerprint(s, d)),
    "alert_lifecycle"     -> ((s, d) => alertLifecycle(s, d)),
    // S5 generator twin — xxhash64-seeded, so no DuckDB twin exists; the
    // driver records a rows-only check (unit tests pin determinism and
    // distributions, GeneratorSpec).
    "gen_readings"        -> ((s, d) =>
      graft.sim.Generator.batch(s, 24000).where(col("value").isNotNull)),
    // Contract audit of the generator: exact counts + pinned envelope /
    // rate booleans, oracle-literal (see Generator.batchAudit scaladoc).
    "gen_readings_audit"  -> ((s, d) =>
      graft.sim.Generator.batchAudit(s, 24000)),
    "mm_metadata"         -> ((s, d) =>
      Multimodal.metadata(Multimodal.documentMedia(s, d))),
    // REAL image decode: deterministic PNGs (pixel values a pure formula
    // of media_id) encoded with the JDK codec, decoded back with ImageIO,
    // and the luminance histogram of the DECODED pixels emitted as double
    // columns. PNG is lossless, so DuckDB re-derives the identical
    // histogram from the formula — a full hash oracle over a real codec
    // round-trip.
    "mm_features"         -> ((s, d) => mmFeatures(s, d)),
    // Exact integer statistics (dims + per-channel sums) of the decoded
    // pixels — the bit-exact face of the decode stage.
    "mm_decode"           -> ((s, d) => mmDecode(s, d)),
    // PNG IHDR dims parsed from the real encoded bytes WITHOUT decode —
    // pure codegen'd binary projection; oracle = the formula dims.
    "mm_png_header"       -> ((s, d) =>
      Multimodal.pngHeaderDims(Multimodal.pngMedia(s, d))),
    // The no-codec FALLBACK path (byte histogram over opaque payloads),
    // kept oracle-green via the hex-string nibble twin.
    "mm_features_bytes"   -> ((s, d) => mmFeaturesBytes(s, d)),
    "mm_frames"           -> ((s, d) => mmFrames(s, d)),
    // SECOND real modality: canonical-header RIFF/WAVE payloads whose PCM
    // samples are a closed-form formula of the id. Header fields parse as
    // a pure codegen'd LE binary projection (no decode)...
    "mm_wav_header"       -> ((s, d) =>
      Multimodal.wavHeaderInfo(Multimodal.wavMedia(s, d))),
    // ...and the decode stage runs the REAL JDK AudioSystem reader,
    // emitting exact integer sample stats; PCM is lossless, so the oracle
    // re-derives identical longs from the formula without seeing a byte.
    "mm_wav_decode"       -> ((s, d) =>
      Multimodal.decodeWavStats(Multimodal.wavMedia(s, d))),
    // LOSSY round-trip contract: the same pixel formula through the JDK's
    // real JPEG encoder and the same ImageIO decode stage as the PNG
    // family; dims + pixel count pinned exactly, channel means pinned as
    // bounded-drift booleans (the sketch-audit pattern).
    "mm_jpeg_decode"      -> ((s, d) =>
      Multimodal.jpegDecodeContract(Multimodal.jpegMedia(s, d))),
    // Audio features over the real decode: per-channel zero-crossings +
    // energy, exact integers — the silence/noise gate signals.
    "mm_wav_features"     -> ((s, d) =>
      Multimodal.wavFeatures(Multimodal.wavMedia(s, d))),
    // REAL multi-frame container: animated GIFs (indexed gray palette →
    // lossless) decoded frame-by-frame through ImageIO's sequence reader;
    // one exact stat row per frame (Multimodal.GifCodec scaladoc).
    "mm_gif_frames"       -> ((s, d) =>
      Multimodal.decodeGifFrameStats(Multimodal.gifMedia(s, d))),
    // Temporal motion over the real multi-frame decode: exact |dGray|
    // across consecutive frames - the still-vs-motion video-gate signal
    // (Multimodal.gifMotionStats).
    "mm_gif_motion"       -> ((s, d) =>
      Multimodal.gifMotionStats(Multimodal.gifMedia(s, d))),
    // Audio quality gate over the real decode: per-channel RMS/peak +
    // silence/clip shares from exact in-stage integer counters, pass
    // booleans at the documented thresholds (Multimodal.SilenceAmp etc.).
    "mm_wav_gate"         -> ((s, d) =>
      Multimodal.wavGate(Multimodal.wavMedia(s, d))),
    // Perceptual hashes over the REAL decode (60-bit aHash + dHash from
    // nearest-neighbor luma sampling) — the image-level dedup signature;
    // PNG losslessness makes both hashes formula-derivable by the oracle.
    "mm_phash"            -> ((s, d) =>
      Multimodal.phash(Multimodal.pngMedia(s, d))),
    // Image near-dup pairs: aHash through the SAME banded Hamming machine
    // as dedup_simhash_pairs (band equi-join + exact verify, no product).
    "mm_phash_pairs"      -> ((s, d) =>
      Multimodal.phashPairs(Multimodal.pngMedia(s, d))),
    // Image near-dup clusters: CC over the banded Hamming pair graph -
    // the image-dedup pipeline end to end (Multimodal.phashClusters).
    "mm_phash_clusters"   -> ((s, d) =>
      Multimodal.phashClusters(Multimodal.pngMedia(s, d),
        universeIds = Some(StandIn.documents(s, d).select(col("doc_id"))))),
    // Image quality gate over the real decode: dims / integer-exact
    // aspect / mean-RGB exposure rules from the in-stage pixel sums, pass
    // booleans at documented thresholds (the LAION-screen shape).
    "mm_image_gate"       -> ((s, d) =>
      Multimodal.imageGate(Multimodal.pngMedia(s, d)))
  )

  // Gaps-and-islands session CTEs (twin of Sessionize.sessions) — shared
  // by sessionize / range_session_purchases so the two cannot drift.
  private val sessionCtesSql =
    """ev AS (
      |  SELECT event_id, user_id,
      |         epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS ts_sec
      |  FROM events
      |  WHERE ts IS NOT NULL
      |), flagged AS (
      |  SELECT user_id, event_id, ts_sec,
      |         CASE WHEN lag(ts_sec) OVER
      |                (PARTITION BY user_id ORDER BY ts_sec, event_id)
      |                IS NULL
      |              OR ts_sec - lag(ts_sec) OVER
      |                (PARTITION BY user_id ORDER BY ts_sec, event_id)
      |                > 1800
      |              THEN 1 ELSE 0 END AS new_sess
      |  FROM ev
      |), sess AS (
      |  SELECT user_id, ts_sec,
      |         CAST(sum(new_sess) OVER
      |           (PARTITION BY user_id ORDER BY ts_sec, event_id)
      |           AS INT) AS session_seq
      |  FROM flagged
      |)""".stripMargin

  // Funnel stage CTEs — shared by funnel_conversion / funnel_stages so the
  // snapshot and incremental twins cannot drift.
  private val funnelCtes =
    """ev AS (
      |  SELECT user_id, event_type,
      |         epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS ts_sec
      |  FROM events WHERE ts IS NOT NULL
      |), v AS (
      |  SELECT *, min(CASE WHEN event_type = 'view' THEN ts_sec END)
      |              OVER (PARTITION BY user_id) AS view_s
      |  FROM ev
      |), c AS (
      |  SELECT *, min(CASE WHEN event_type = 'click' AND ts_sec >= view_s
      |                     THEN ts_sec END)
      |              OVER (PARTITION BY user_id) AS click_s
      |  FROM v
      |), p AS (
      |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_sec >= click_s
      |                     THEN ts_sec END)
      |              OVER (PARTITION BY user_id) AS purchase_s
      |  FROM c
      |)""".stripMargin

  // Shared by dedup_clusters / dedup_clusters_bigstar: both implement
  // "label every doc with its component's min id" over the SAME candidate
  // graph, so one recursive-CTE oracle checks both.
  private lazy val clustersOracle =
    s"""WITH RECURSIVE $gramsSql, $sigSql, $bucketsSql, $candidatePairsSql,
       |$componentsSql
       |SELECT doc_id, cluster_id FROM labels""".stripMargin

  // Shared by decontaminate / decontaminate_bloom: the Bloom variant's
  // output is exact, so one oracle serves both and they cannot drift.
  private val decontaminateOracle =
    s"""WITH $gramsSql, ex AS (
       |  SELECT doc_id, unnest(g) AS g FROM grams
       |), rare AS (
       |  SELECT g FROM (
       |    SELECT g, count(DISTINCT doc_id) AS gram_df FROM ex GROUP BY g
       |  ) WHERE gram_df <= 20
       |), rex AS (
       |  SELECT ex.doc_id, ex.g FROM ex JOIN rare USING (g)
       |)
       |SELECT c.doc_id, b.doc_id AS bench_id,
       |       CAST(count(DISTINCT c.g) AS INT) AS shared_grams
       |FROM rex c
       |JOIN rex b ON c.g = b.g
       |WHERE c.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
       |GROUP BY c.doc_id, b.doc_id
       |HAVING count(DISTINCT c.g) >= 3""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "alerts_classify" -> alertsClassifyOracle,

    "parse_readings" ->
      s"""$R
         |SELECT sensor_id, sensor_type, building, floor, room, timestamp,
         |       value, unit, battery_level, signal_strength
         |FROM readings""".stripMargin,

    // Timezone-independent window arithmetic: make_timestamp(µs) mirrors
    // Spark's epoch-aligned tumbling windows regardless of session TZ.
    "agg_sensor_stats" ->
      s"""$R
         |SELECT make_timestamp((epoch_us(event_time) // 240000000) * 240000000) AS window_start,
         |       make_timestamp((epoch_us(event_time) // 240000000) * 240000000 + 240000000) AS window_end,
         |       sensor_id, sensor_type,
         |       round(avg(value), 4) AS avg_value,
         |       min(value) AS min_value,
         |       max(value) AS max_value,
         |       count(*) AS count
         |FROM readings
         |GROUP BY 1, 2, 3, 4""".stripMargin,

    // Sliding-window twin (Aggregates.slidingStats): each event is
    // replicated into window/slide = 4 overlapping windows whose starts
    // are the slide-aligned epochs at or before it — the same window
    // assignment Spark's window(ts, dur, slide) performs.
    "agg_sliding_stats" ->
      s"""$R, wins AS (
         |  SELECT sensor_id, sensor_type, value,
         |         (epoch_us(event_time) // 60000000) * 60000000
         |           - k.k * 60000000 AS ws
         |  FROM readings
         |  CROSS JOIN (SELECT unnest(range(0, 4)) AS k) k
         |)
         |SELECT sensor_id, sensor_type,
         |       make_timestamp(ws) AS window_start,
         |       make_timestamp(ws + 240000000) AS window_end,
         |       round(avg(value), 4) AS avg_value,
         |       count(*) AS count
         |FROM wins
         |GROUP BY sensor_id, sensor_type, ws""".stripMargin,

    "json_parse" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events",

    "json_roundtrip" ->
      "SELECT event_id, event_type, value FROM events",

    "cast_timestamp" ->
      """SELECT event_id,
        |       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        |       CAST(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS TIMESTAMP) AS ts_rt
        |FROM events""".stripMargin,

    "filter_like" ->
      "SELECT p_partkey, p_name, p_type FROM part WHERE p_type LIKE 'ECO%'",

    "filter_predicates" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        |FROM lineitem
        |WHERE (l_quantity > 45 OR l_discount < 0.02) AND l_returnflag = 'R'""".stripMargin,

    "alerts_mailable" ->
      s"""$R, classified AS (
         |  SELECT *, $classifySql AS alert_type FROM readings
         |), alerts AS (
         |  SELECT $enrichSql
         |  FROM classified WHERE alert_type IS NOT NULL
         |)
         |SELECT sensor_id, timestamp, alert_type, severity, message, actual_value
         |FROM alerts WHERE severity IN ('critical', 'warning')""".stripMargin,

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

    // Embedding-space twin (Similarity.cosineHistogram): 0.1-wide integer
    // bins of the bit-identical rounded cosine over bucket-sharing pairs.
    "sim_cos_histogram" ->
      s"""WITH $prepSql, $bucketsSimSql
         |SELECT CAST(floor(${cosSql("a.vec", "a.norm", "b.vec", "b.norm")}
         |         * 10) AS INT) AS cos_bin,
         |       count(*) AS n_pairs
         |FROM bsim a
         |JOIN bsim b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |GROUP BY 1""".stripMargin,

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

    // Fuzzy-decontamination twin (Curation.contaminationNearDup): the
    // cross-side candidate/estimate CTEs of dedup_incremental with the
    // % 10 benchmark split, folded to one flag row per corpus document.
    "decontaminate_neardup" ->
      s"""WITH $gramsSql, $sigSql, $bucketsSql, cpairs AS (
         |  SELECT DISTINCT n.doc_id AS new_id, r.doc_id AS ref_id
         |  FROM buckets n
         |  JOIN buckets r ON n.band = r.band AND n.bucket = r.bucket
         |  WHERE n.doc_id % 10 <> 0 AND r.doc_id % 10 = 0
         |), cest AS (
         |  SELECT p.new_id,
         |         len(list_filter(range(1, ${MinhashK + 1}),
         |             i -> sn.sig[CAST(i AS INT)] = sr.sig[CAST(i AS INT)]))
         |           / CAST($MinhashK AS DOUBLE) AS est_sim
         |  FROM cpairs p
         |  JOIN sigs sn ON sn.doc_id = p.new_id
         |  JOIN sigs sr ON sr.doc_id = p.ref_id
         |), cfl AS (
         |  SELECT new_id AS doc_id, count(*) AS n_matches,
         |         max(est_sim) AS max_est_sim
         |  FROM cest WHERE est_sim >= $MinhashEstThreshold
         |  GROUP BY new_id
         |)
         |SELECT d.doc_id,
         |       cfl.max_est_sim IS NOT NULL AS contaminated,
         |       coalesce(cfl.n_matches, 0) AS n_matches,
         |       cfl.max_est_sim
         |FROM documents d LEFT JOIN cfl USING (doc_id)
         |WHERE d.doc_id % 10 <> 0""".stripMargin,

    // Contamination-dashboard twin: the decontaminate + neardup CTEs
    // (same thresholds as the standalone twins) folded to one count row.
    "corpus_contamination_report" ->
      s"""WITH $gramsSql, $sigSql, $bucketsSql, ex AS (
         |  SELECT doc_id, unnest(g) AS g FROM grams
         |), rare AS (
         |  SELECT g FROM (
         |    SELECT g, count(DISTINCT doc_id) AS gram_df FROM ex GROUP BY g
         |  ) WHERE gram_df <= 20
         |), rex AS (
         |  SELECT ex.doc_id, ex.g FROM ex JOIN rare USING (g)
         |), exact_ids AS (
         |  SELECT DISTINCT c.doc_id FROM rex c
         |  JOIN rex b ON c.g = b.g
         |  WHERE c.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
         |  GROUP BY c.doc_id, b.doc_id
         |  HAVING count(DISTINCT c.g) >= 3
         |), cpairs AS (
         |  SELECT DISTINCT n.doc_id AS new_id, r.doc_id AS ref_id
         |  FROM buckets n
         |  JOIN buckets r ON n.band = r.band AND n.bucket = r.bucket
         |  WHERE n.doc_id % 10 <> 0 AND r.doc_id % 10 = 0
         |), fuzzy_ids AS (
         |  SELECT DISTINCT p.new_id AS doc_id
         |  FROM cpairs p
         |  JOIN sigs sn ON sn.doc_id = p.new_id
         |  JOIN sigs sr ON sr.doc_id = p.ref_id
         |  WHERE len(list_filter(range(1, ${MinhashK + 1}),
         |          i -> sn.sig[CAST(i AS INT)] = sr.sig[CAST(i AS INT)]))
         |          / CAST($MinhashK AS DOUBLE) >= $MinhashEstThreshold
         |), ccounts AS (
         |  SELECT CAST(sum(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_bench,
         |         CAST(sum(CASE WHEN doc_id % 10 = 0 THEN 0 ELSE 1 END)
         |           AS BIGINT) AS n_corpus
         |  FROM documents
         |)
         |SELECT n_corpus, n_bench,
         |       (SELECT count(*) FROM exact_ids) AS exact_flagged,
         |       (SELECT count(*) FROM fuzzy_ids) AS fuzzy_flagged,
         |       (SELECT count(*) FROM
         |          (SELECT doc_id FROM exact_ids
         |           UNION SELECT doc_id FROM fuzzy_ids)) AS either_flagged,
         |       round((SELECT count(*) FROM
         |          (SELECT doc_id FROM exact_ids
         |           UNION SELECT doc_id FROM fuzzy_ids))
         |          / CAST(greatest(n_corpus, 1) AS DOUBLE), 6)
         |         AS flagged_share
         |FROM ccounts""".stripMargin,

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

    // The full curation composite: clusters (recursive CTE) + quality gate
    // + language scores + token counts, all sharing one `toks` CTE.
    "corpus_curate" ->
      s"""WITH RECURSIVE $gramsSql, $sigSql, $bucketsSql, $candidatePairsSql,
         |$componentsSql, $rawToksSql, $gateSql, scored AS (
         |  SELECT doc_id,
         |$langScoresSql
         |  FROM toks
         |), best AS (
         |  SELECT *, greatest(en_score, fr_score, de_score) AS top FROM scored
         |)
         |SELECT d.doc_id,
         |       CASE WHEN b.en_score = b.top AND b.top > 0 THEN 'en'
         |            WHEN b.fr_score = b.top AND b.top > 0 THEN 'fr'
         |            WHEN b.de_score = b.top AND b.top > 0 THEN 'de'
         |            ELSE 'unknown' END AS predicted_lang,
         |       CAST(len(k.t) AS INT) AS ws_tokens,
         |       CAST(len(regexp_extract_all(d.text,
         |         '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS INT) AS bpeish_tokens
         |FROM documents d
         |JOIN labels l ON l.doc_id = d.doc_id AND l.cluster_id = d.doc_id
         |JOIN gated g ON g.doc_id = d.doc_id AND g.reject_reason IS NULL
         |JOIN best b ON b.doc_id = d.doc_id
         |JOIN toks k ON k.doc_id = d.doc_id""".stripMargin,

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

    "sim_brute_topk" ->
      s"""WITH $prepSql, pairs AS (
         |  SELECT q.q_id, p.vec_id AS neighbor_id,
         |         ${cosSql("q.q_vec", "q.q_norm", "p.vec", "p.norm")} AS cos_sim
         |  FROM prepn p, queries q WHERE p.vec_id <> q.q_id
         |)
         |SELECT q_id, rank, neighbor_id, cos_sim FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
         |  FROM pairs)
         |WHERE rank <= $TopK""".stripMargin,

    // k-NN label-eval twin (Similarity.knnLabelEval): the brute-force
    // pairs CTE + the same (votes desc, label asc) majority tie-break.
    "sim_knn_label_eval" ->
      s"""WITH $prepSql, pairs AS (
         |  SELECT q.q_id, p.vec_id AS neighbor_id,
         |         ${cosSql("q.q_vec", "q.q_norm", "p.vec", "p.norm")} AS cos_sim
         |  FROM prepn p, queries q WHERE p.vec_id <> q.q_id
         |), topk AS (
         |  SELECT q_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS rank
         |    FROM pairs)
         |  WHERE rank <= $TopK
         |), votes AS (
         |  SELECT t.q_id, e.label AS n_label, count(*) AS votes
         |  FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
         |  GROUP BY t.q_id, e.label
         |), pred AS (
         |  SELECT q_id, n_label AS pred_label, votes FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY q_id ORDER BY votes DESC, n_label) AS rnk
         |    FROM votes)
         |  WHERE rnk = 1
         |)
         |SELECT p.q_id, e.label AS true_label, p.pred_label,
         |       CAST(p.votes AS INT) AS n_votes,
         |       (p.pred_label = e.label) AS correct
         |FROM pred p JOIN embeddings e ON e.vec_id = p.q_id""".stripMargin,

    // Trained-IVF recall audit (Similarity.ivfRecallAudit): expected is
    // queries × k from the oracle's own draw CTE; floor_met pinned TRUE
    // (training is deterministic — driver Lloyd over the fixed hash draw).
    "sim_ivf_recall_audit" ->
      s"""WITH $prepSql
         |SELECT CAST((SELECT count(*) FROM queries) * $TopK AS BIGINT)
         |         AS expected,
         |       TRUE AS floor_met""".stripMargin,

    "sim_pq_recall_audit" ->
      s"""WITH $prepSql
         |SELECT CAST((SELECT count(*) FROM queries) * $TopK AS BIGINT)
         |         AS expected,
         |       TRUE AS floor_met""".stripMargin,

    "sim_rp_recall_audit" ->
      s"""WITH $prepSql
         |SELECT CAST((SELECT count(*) FROM queries) * $TopK AS BIGINT)
         |         AS expected,
         |       TRUE AS floor_met""".stripMargin,

    // JL distortion contract: the oracle derives the pair count from its
    // own draw CTE and pins both error bounds TRUE.
    "sim_rp_cosine_audit" ->
      s"""WITH $prepSql, qc AS (SELECT count(*) AS c FROM queries)
         |SELECT CAST(c * (c - 1) / 2 AS BIGINT) AS n_pairs,
         |       TRUE AS mean_ok, TRUE AS max_ok
         |FROM qc""".stripMargin,

    "sim_ivfpq_recall_audit" ->
      s"""WITH $prepSql
         |SELECT CAST((SELECT count(*) FROM queries) * $TopK AS BIGINT)
         |         AS expected,
         |       TRUE AS floor_met""".stripMargin,

    // JL random-projection twin (Similarity.randomProjection): the same
    // seed-13 Rademacher planes interpolated as literals, the same fold
    // order, the ratio recomputed from the ROUNDED components.
    "sim_rp_project" -> {
      val k = Similarity.RpDims
      val scale = math.sqrt(k.toDouble)
      val ys = Similarity.planes(k, seed = Similarity.RpSeed).zipWithIndex
        .map { case (p, i) =>
          s"round(${dotSql("vec", planeLiteral(p))} / $scale, 6) AS y$i"
        }.mkString(",\n       ")
      val yn2 = (0 until k).map(i => s"y$i * y$i").mkString(" + ")
      s"""WITH rp AS (
         |  SELECT vec_id,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
         |  FROM embeddings
         |), ry AS (
         |  SELECT vec_id,
         |       $ys,
         |       ${dotSql("vec", "vec")} AS xn2
         |  FROM rp
         |), rr AS (
         |  SELECT * EXCLUDE (xn2),
         |         round(CASE WHEN xn2 > 0 THEN ($yn2) / xn2 END, 6)
         |           AS norm_ratio
         |  FROM ry
         |)
         |SELECT *,
         |       (norm_ratio IS NOT NULL
         |        AND norm_ratio >= ${Similarity.RpRatioMin}
         |        AND norm_ratio <= ${Similarity.RpRatioMax}) AS ok_distortion
         |FROM rr""".stripMargin
    },

    "sim_lsh_topk" ->
      s"""WITH $prepSql, $bucketsSimSql, pairs AS (
         |  SELECT q.q_id, p.vec_id AS neighbor_id,
         |         ${cosSql("q.q_vec", "q.q_norm", "p.vec", "p.norm")} AS cos_sim
         |  FROM bsim p
         |  JOIN (SELECT b.bucket, b.vec_id AS q_id, b.vec AS q_vec,
         |               b.norm AS q_norm
         |        FROM bsim b
         |        WHERE b.vec_id IN (SELECT q_id FROM queries)) q
         |    ON p.bucket = q.bucket AND p.vec_id <> q.q_id
         |)
         |SELECT q_id, rank, neighbor_id, cos_sim FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
         |  FROM pairs)
         |WHERE rank <= $TopK""".stripMargin,

    "sim_ivf_topk" ->
      s"""WITH $prepSql, $ivfCellsSql, pairs AS (
         |  SELECT q.q_id, p.vec_id AS neighbor_id,
         |         ${cosSql("q.q_vec", "q.q_norm", "p.vec", "p.norm")} AS cos_sim
         |  FROM ivf p
         |  JOIN (SELECT b.cell, b.vec_id AS q_id, b.vec AS q_vec,
         |               b.norm AS q_norm
         |        FROM ivf b
         |        WHERE b.vec_id IN (SELECT q_id FROM queries)) q
         |    ON p.cell = q.cell AND p.vec_id <> q.q_id
         |)
         |SELECT q_id, rank, neighbor_id, cos_sim FROM (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
         |  FROM pairs)
         |WHERE rank <= $TopK""".stripMargin,

    // Int8 quantization loss audit (Similarity.quantizeStats): same
    // symmetric scale, round-half-away-from-zero on both engines, and the
    // mean is the same left fold (list_reduce with a prepended 0).
    "sim_quantize" ->
      s"""WITH prep AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
         |  FROM embeddings
         |), scaled AS (
         |  SELECT vec_id, vec,
         |         greatest(list_max(list_transform(vec, x -> abs(x))) / 127.0,
         |                  1e-12) AS scale
         |  FROM prep
         |), errs AS (
         |  SELECT vec_id, scale, len(vec) AS n,
         |         list_transform(vec,
         |           x -> abs(round(x / scale, 0) * scale - x)) AS e
         |  FROM scaled
         |)
         |SELECT vec_id, round(scale, 6) AS scale,
         |       round(list_max(e), 6) AS max_abs_err,
         |       round(list_reduce(list_prepend(CAST(0 AS DOUBLE), e),
         |             (a, x) -> a + x) / greatest(n, 1), 6) AS mean_abs_err
         |FROM errs""".stripMargin,

    // Sequence-packing twin (Curation.packSequences): same md5-derived
    // bucket, same running-sum chop at the token budget.
    "corpus_pack" ->
      s"""WITH $rawToksSql, tc AS (
         |  SELECT d.doc_id, CAST(len(k.t) AS INT) AS ws_tokens,
         |         CAST(${hashSql("'0:'", "CAST(d.doc_id AS VARCHAR)")}
         |              % $PackBuckets AS INT) AS bucket
         |  FROM documents d JOIN toks k ON d.doc_id = k.doc_id
         |)
         |SELECT doc_id, bucket,
         |       CAST(floor((sum(ws_tokens) OVER
         |         (PARTITION BY bucket ORDER BY doc_id) - ws_tokens)
         |         / ${PackBudget.toDouble}) AS INT) AS pack_id,
         |       ws_tokens
         |FROM tc""".stripMargin,

    // Pack-efficiency twin: the corpus_pack CTEs folded to one row.
    "corpus_pack_efficiency" ->
      s"""WITH $rawToksSql, tc AS (
         |  SELECT d.doc_id, CAST(len(k.t) AS INT) AS ws_tokens,
         |         CAST(${hashSql("'0:'", "CAST(d.doc_id AS VARCHAR)")}
         |              % $PackBuckets AS INT) AS bucket
         |  FROM documents d JOIN toks k ON d.doc_id = k.doc_id
         |), pk AS (
         |  SELECT bucket,
         |         CAST(floor((sum(ws_tokens) OVER
         |           (PARTITION BY bucket ORDER BY doc_id) - ws_tokens)
         |           / ${PackBudget.toDouble}) AS INT) AS pack_id,
         |         ws_tokens
         |  FROM tc
         |), pt AS (
         |  SELECT bucket, pack_id,
         |         CAST(sum(ws_tokens) AS BIGINT) AS pack_tokens
         |  FROM pk GROUP BY bucket, pack_id
         |)
         |SELECT count(*) AS n_packs,
         |       CAST(sum(pack_tokens) AS BIGINT) AS total_tokens,
         |       round(sum(pack_tokens)
         |             / CAST(greatest(count(*) * $PackBudget, 1) AS DOUBLE),
         |             6) AS fill_rate,
         |       round(sum(CASE WHEN pack_tokens > $PackBudget
         |                      THEN 1 ELSE 0 END)
         |             / CAST(greatest(count(*), 1) AS DOUBLE), 6)
         |         AS overflow_share
         |FROM pt""".stripMargin,

    // BPE training twin: the merge loop replayed in unrolled SQL (see
    // bpeTrainOracle) — every learned (rank, pair, count) must match.
    "corpus_bpe_train" -> bpeTrainOracle,

    // The DISTRIBUTED trainer (Materialize-loop over a vocab DataFrame)
    // checks against the SAME oracle — the two architectures cannot drift.
    "corpus_bpe_train_dist" -> bpeTrainOracle,

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

    // Quality-weighted A-ES draw: the trained-score chain feeding the
    // corpus_sample_weighted key, same hash member and seed scheme.
    "corpus_sample_quality" -> {
      val d = graft.ops.QualityModel.Dim
      val dot = (0 until d).map(j => s"w$j*x$j").mkString(" + ")
      s"""$qmTrainChainSql, scoredq AS (
         |  SELECT doc_id,
         |         round(1.0 / (1.0 + exp(-($dot))), 6) AS score
         |  FROM qf, ws${graft.ops.QualityModel.Steps}
         |)
         |SELECT doc_id, score
         |FROM scoredq
         |WHERE score > 0
         |ORDER BY ln((${hashSql("'0:'",
              "concat('graft-q1:', CAST(doc_id AS VARCHAR))")} + 0.5) /
         |         1152921504606846976.0) / score DESC, doc_id
         |LIMIT 50""".stripMargin
    },

    // BPE-budget epoch mixing: corpus_mix's twin with the subword count
    // as the budget unit.
    "corpus_mix_bpe" -> {
      val targetCase = MixTargets
        .map { case (l, t) => s"WHEN '$l' THEN $t" }.mkString(" ")
      s"""WITH $rawToksSql, btc AS (
         |  SELECT doc_id, $bpeTokensSql AS bpe_tokens FROM documents
         |), scored AS (
         |  SELECT doc_id,
         |$langScoresSql
         |  FROM toks
         |), best AS (
         |  SELECT *, greatest(en_score, fr_score, de_score) AS top FROM scored
         |), langed AS (
         |  SELECT s.doc_id, c.bpe_tokens,
         |         CASE WHEN s.en_score = s.top AND s.top > 0 THEN 'en'
         |              WHEN s.fr_score = s.top AND s.top > 0 THEN 'fr'
         |              WHEN s.de_score = s.top AND s.top > 0 THEN 'de'
         |              ELSE 'unknown' END AS predicted_lang
         |  FROM best s JOIN btc c USING (doc_id)
         |), totals AS (
         |  SELECT predicted_lang, sum(bpe_tokens) AS lang_tokens
         |  FROM langed GROUP BY predicted_lang
         |), mixed AS (
         |  SELECT l.doc_id, l.predicted_lang, l.bpe_tokens, t.lang_tokens,
         |         CAST(CASE l.predicted_lang $targetCase ELSE 0 END AS BIGINT)
         |           AS target,
         |         ${hashSql(s"'${Curation.MixHashIndex}:'",
                      "CAST(l.doc_id AS VARCHAR)")} % 10000 AS b
         |  FROM langed l JOIN totals t USING (predicted_lang)
         |)
         |SELECT doc_id, predicted_lang, bpe_tokens,
         |       CAST(CASE WHEN lang_tokens > 0 THEN
         |         target // lang_tokens
         |         + CASE WHEN b * lang_tokens <
         |                     (target - (target // lang_tokens)
         |                       * lang_tokens) * 10000
         |                THEN 1 ELSE 0 END
         |         ELSE 0 END AS INT) AS n_epochs
         |FROM mixed""".stripMargin
    },

    // Budget-quantized chunking twin: per word, BPE count → running sum →
    // floor(cum_before/budget) group; chunk text re-joined in word order.
    // (The Spark side computes the identical grouping inside ONE row —
    // functions/BpeChunks — this window formulation is the oracle's.)
    "corpus_chunk_bpe" ->
      s"""WITH wl AS (
         |  SELECT doc_id, $bpeWordsSql AS l FROM documents
         |), wi AS (
         |  SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i FROM wl
         |), wc AS (
         |  SELECT doc_id, i, l[CAST(i AS INT)] AS word,
         |         len(string_split(
         |           trim(${bpeReplaceChain(bpeSpacedSql("l[CAST(i AS INT)]"))}),
         |           ' ')) AS c
         |  FROM wi
         |), cums AS (
         |  SELECT doc_id, i, word, c,
         |         sum(c) OVER (PARTITION BY doc_id ORDER BY i) - c AS cum0
         |  FROM wc
         |)
         |SELECT doc_id,
         |       CAST(cum0 // $ChunkBpeBudget AS INT) AS chunk_id,
         |       CAST(sum(c) AS INT) AS n_chunk_bpe,
         |       string_agg(word, ' ' ORDER BY i) AS chunk_text
         |FROM cums
         |GROUP BY doc_id, cum0 // $ChunkBpeBudget""".stripMargin,

    // BPE-budget sequence packing: corpus_pack's twin with the subword
    // count as the packed unit.
    "corpus_pack_bpe" ->
      s"""WITH tc AS (
         |  SELECT doc_id, $bpeTokensSql AS bpe_tokens,
         |    CAST(${hashSql("'0:'", "CAST(doc_id AS VARCHAR)")}
         |         % $PackBuckets AS INT) AS bucket
         |  FROM documents
         |)
         |SELECT doc_id, bucket,
         |       CAST(floor((sum(bpe_tokens) OVER
         |         (PARTITION BY bucket ORDER BY doc_id) - bpe_tokens)
         |         / ${PackBudget.toDouble}) AS INT) AS pack_id,
         |       bpe_tokens
         |FROM tc""".stripMargin,

    // Decontamination twin (Curation.contamination): same rare-gram
    // df-cap, same benchmark predicate, same ≥3-shared-grams flag.
    "decontaminate" -> decontaminateOracle,

    // The Bloom-prefiltered variant produces IDENTICAL rows (the filter
    // only prunes shuffle traffic; the exact join removes false
    // positives), so it checks against the very same oracle.
    "decontaminate_bloom" -> decontaminateOracle,

    // Split-assignment twin (Curation.assignSplits): same hash-family
    // member, same INTEGER bucket boundaries (interpolated from
    // Curation.splitBounds so float cumulative sums can never split the
    // engines on a boundary bucket).
    "corpus_split" -> {
      val bounds = Curation.splitBounds(SplitFractions)
      val cases = SplitFractions.init.zip(bounds.init)
        .map { case ((name, _), cut) => s"WHEN b < $cut THEN '$name'" }
        .mkString(" ")
      s"""SELECT doc_id,
         |       CASE $cases ELSE '${SplitFractions.last._1}' END AS split
         |FROM (
         |  SELECT doc_id,
         |         ${hashSql(s"'${Curation.SplitHashIndex}:'",
                      "CAST(doc_id AS VARCHAR)")} % 10000 AS b
         |  FROM documents
         |)""".stripMargin
    },

    // Shuffle-shard twin (Curation.shuffleShards): same two hash-family
    // members, same row_number ordering with doc_id tie-break.
    "corpus_shuffle" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |         CAST(${hashSql(s"'${Curation.ShardHashIndex}:'",
                      "CAST(doc_id AS VARCHAR)")} % $ShuffleShards AS INT)
         |           AS shard,
         |         ${hashSql(s"'${Curation.OrderHashIndex}:'",
                      "CAST(doc_id AS VARCHAR)")} AS ord
         |  FROM documents
         |)
         |SELECT doc_id, shard,
         |       CAST(row_number() OVER
         |         (PARTITION BY shard ORDER BY ord, doc_id) AS INT) AS pos
         |FROM h""".stripMargin,

    // Mix-epochs twin (Curation.mixEpochs): same language scores, same
    // integer whole-epoch division and cross-multiplied fractional draw —
    // BIGINT arithmetic end to end, no float boundary anywhere.
    "corpus_mix" -> {
      val targetCase = MixTargets
        .map { case (l, t) => s"WHEN '$l' THEN $t" }.mkString(" ")
      s"""WITH $rawToksSql, scored AS (
         |  SELECT doc_id, CAST(len(t) AS INT) AS ws_tokens,
         |$langScoresSql
         |  FROM toks
         |), best AS (
         |  SELECT *, greatest(en_score, fr_score, de_score) AS top FROM scored
         |), langed AS (
         |  SELECT doc_id, ws_tokens,
         |         CASE WHEN en_score = top AND top > 0 THEN 'en'
         |              WHEN fr_score = top AND top > 0 THEN 'fr'
         |              WHEN de_score = top AND top > 0 THEN 'de'
         |              ELSE 'unknown' END AS predicted_lang
         |  FROM best
         |), totals AS (
         |  SELECT predicted_lang, sum(ws_tokens) AS lang_tokens
         |  FROM langed GROUP BY predicted_lang
         |), mixed AS (
         |  SELECT l.doc_id, l.predicted_lang, l.ws_tokens, t.lang_tokens,
         |         CAST(CASE l.predicted_lang $targetCase ELSE 0 END AS BIGINT)
         |           AS target,
         |         ${hashSql(s"'${Curation.MixHashIndex}:'",
                      "CAST(l.doc_id AS VARCHAR)")} % 10000 AS b
         |  FROM langed l JOIN totals t USING (predicted_lang)
         |)
         |SELECT doc_id, predicted_lang, ws_tokens,
         |       CAST(CASE WHEN lang_tokens > 0 THEN
         |         target // lang_tokens
         |         + CASE WHEN b * lang_tokens <
         |                     (target - (target // lang_tokens)
         |                       * lang_tokens) * 10000
         |                THEN 1 ELSE 0 END
         |         ELSE 0 END AS INT) AS n_epochs
         |FROM mixed""".stripMargin
    },

    // Profiler twin (Profile.profile): one UNION ALL branch per column —
    // the declarative restatement of the one-pass Expand aggregate.
    "profile_events" -> {
      val branches = ProfileEventCols.map { case (c, num) =>
        val mn = if (num) s"CAST(min($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        val mx = if (num) s"CAST(max($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
           |       count(*) - count($c) AS n_null,
           |       count(DISTINCT $c) AS n_distinct,
           |       $mn AS min_value, $mx AS max_value FROM ev""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ev AS (
         |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
         |         event_type, value, props
         |  FROM events
         |)
         |$branches""".stripMargin
    },

    // HLL-profile audit twin (Profile.profileAudit): exact per-column
    // stats + the within-3·rsd contract the oracle pins to TRUE.
    "profile_events_audit" -> {
      val branches = ProfileEventCols.map { case (c, num) =>
        val mn = if (num) s"CAST(min($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        val mx = if (num) s"CAST(max($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
           |       count(*) - count($c) AS n_null,
           |       count(DISTINCT $c) AS n_distinct,
           |       $mn AS min_value, $mx AS max_value,
           |       TRUE AS within_tol FROM ev""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ev AS (
         |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
         |         event_type, value, props
         |  FROM events
         |)
         |$branches""".stripMargin
    },

    // Key-skew twin (Profile.keySkew): identical top-k, ties by key value.
    "profile_key_skew" ->
      s"""WITH c AS (
         |  SELECT CAST(event_type AS VARCHAR) AS key_value,
         |         count(*) AS n
         |  FROM events GROUP BY event_type
         |), tot AS (SELECT count(*) AS t FROM events)
         |SELECT CAST(row_number() OVER (ORDER BY n DESC, key_value) AS INT)
         |         AS rank,
         |       key_value, n,
         |       round(n / CAST(greatest(t, 1) AS DOUBLE), 6) AS share
         |FROM c, tot
         |ORDER BY n DESC, key_value LIMIT $SkewTopK""".stripMargin,

    // Embedding-profile twin (Profile.embeddingProfile): same DECIMAL
    // staging of the sums, same variance formula and clamps.
    "profile_embeddings" ->
      """WITH pe0 AS (
        |  SELECT unnest(range(1, len(embedding) + 1)) AS i, embedding
        |  FROM embeddings
        |), pe AS (
        |  SELECT CAST(i - 1 AS INT) AS dim,
        |         CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
        |  FROM pe0
        |), pa AS (
        |  SELECT dim, count(*) AS n,
        |         CAST(sum(CAST(x AS DECIMAL(18,9))) AS DOUBLE) AS s1,
        |         CAST(sum(CAST(x AS DECIMAL(18,9))
        |                   * CAST(x AS DECIMAL(18,9))) AS DOUBLE) AS s2,
        |         min(x) AS mn, max(x) AS mx
        |  FROM pe GROUP BY dim
        |), pv AS (
        |  SELECT dim, n, s1, s2, mn, mx,
        |         CASE WHEN n > 1 THEN greatest(
        |           (s2 - s1 * s1 / n) / (n - 1), 0.0) END AS var_x
        |  FROM pa
        |)
        |SELECT dim, n,
        |       round(s1 / n, 6) AS mean,
        |       round(var_x, 6) AS variance,
        |       round(sqrt(var_x), 6) AS std,
        |       round(mn, 6) AS min_x,
        |       round(mx, 6) AS max_x
        |FROM pv""".stripMargin,

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

    // Pivot twin (Olap.pivotEventCounts): conditional aggregation — the
    // declarative restatement of an explicit-values pivot.
    "olap_pivot_events" -> {
      val cols = graft.ops.Olap.EventTypes.map(t =>
        s"count(*) FILTER (event_type = '$t') AS n_$t").mkString(",\n       ")
      s"""SELECT user_id,
         |       $cols
         |FROM events GROUP BY user_id""".stripMargin
    },

    // Rollup twin (Olap.rollupEventStats): GROUP BY ROLLUP with grouping
    // flags; sum rounded to 4 dp on both sides to absorb float summation
    // order (the agg_sensor_stats precedent).
    "olap_rollup_events" ->
      """SELECT event_type, value_band,
        |       CAST(grouping(event_type) AS INT) AS g_type,
        |       CAST(grouping(value_band) AS INT) AS g_band,
        |       count(*) AS n,
        |       round(sum(value), 4) AS sum_value
        |FROM (
        |  SELECT event_type, CAST(floor(value / 10) AS INT) AS value_band,
        |         value
        |  FROM events WHERE value IS NOT NULL
        |)
        |GROUP BY ROLLUP (event_type, value_band)""".stripMargin,

    // Cube twin (Olap.cubeEventStats): GROUP BY CUBE, same flags/rounding
    // as the rollup twin.
    "olap_cube_events" ->
      """SELECT event_type, value_band,
        |       CAST(grouping(event_type) AS INT) AS g_type,
        |       CAST(grouping(value_band) AS INT) AS g_band,
        |       count(*) AS n,
        |       round(sum(value), 4) AS sum_value
        |FROM (
        |  SELECT event_type, CAST(floor(value / 10) AS INT) AS value_band,
        |         value
        |  FROM events WHERE value IS NOT NULL
        |)
        |GROUP BY CUBE (event_type, value_band)""".stripMargin,

    // Grouping-sets twin (Olap.groupingSetsStats): leaf + both one-key
    // slices, no grand total — the lattice rollup/cube cannot express.
    "olap_grouping_sets" ->
      """SELECT event_type, value_band,
        |       CAST(grouping(event_type) AS INT) AS g_type,
        |       CAST(grouping(value_band) AS INT) AS g_band,
        |       count(*) AS n,
        |       round(sum(value), 4) AS sum_value
        |FROM (
        |  SELECT event_type, CAST(floor(value / 10) AS INT) AS value_band,
        |         value
        |  FROM events WHERE value IS NOT NULL
        |)
        |GROUP BY GROUPING SETS ((event_type, value_band), (event_type),
        |                        (value_band))""".stripMargin,

    // Props-extraction twin (Parse.propsKeyStats): the same single-path
    // regex probe, no JSON extension required.
    "json_props_stats" ->
      """WITH x AS (
        |  SELECT event_type,
        |         CASE WHEN regexp_extract(props, '"k":\s*(-?\d+)', 1) <> ''
        |              THEN CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1)
        |                        AS INT) END AS k
        |  FROM events
        |)
        |SELECT event_type, count(*) AS n, count(k) AS n_with_k,
        |       count(*) - count(k) AS n_missing,
        |       CAST(sum(k) AS BIGINT) AS sum_k,
        |       min(k) AS min_k, max(k) AS max_k
        |FROM x GROUP BY event_type""".stripMargin,

    // Unpivot twin (Olap.unpivotMeasures): portable UNION ALL melt.
    "olap_unpivot" ->
      """WITH m AS (
        |  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS value
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
        |)
        |SELECT l_returnflag, measure, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(14,4))) AS DOUBLE)
        |         AS sum_value
        |FROM m GROUP BY l_returnflag, measure""".stripMargin,

    // Ranking-family twin (WindowOps.lagLeadStats): one shared WINDOW
    // spec; the event_id tie-break makes ntile/percent_rank deterministic.
    "window_lag_lead" ->
      """SELECT event_id, user_id,
        |       epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS ts_sec,
        |       lag(event_type) OVER w AS prev_type,
        |       lead(event_type) OVER w AS next_type,
        |       CAST(row_number() OVER w AS INT) AS rn,
        |       CAST(ntile(4) OVER w AS INT) AS quartile,
        |       round(percent_rank() OVER w, 6) AS pct_rank,
        |       round(cume_dist() OVER w, 6) AS cume
        |FROM events WHERE ts IS NOT NULL
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) // 1000000,
        |                      event_id)""".stripMargin,

    // Funnel twin (Funnel.conversion): the same three chained
    // whole-partition window minimums, collapsed per user.
    "funnel_conversion" ->
      s"""WITH $funnelCtes
         |SELECT user_id,
         |       max(view_s) AS first_view_s,
         |       max(click_s) AS first_click_s,
         |       max(purchase_s) AS first_purchase_s,
         |       CAST(CASE WHEN max(purchase_s) IS NOT NULL THEN 3
         |                 WHEN max(click_s) IS NOT NULL THEN 2
         |                 WHEN max(view_s) IS NOT NULL THEN 1
         |                 ELSE 0 END AS INT) AS stage
         |FROM p GROUP BY user_id""".stripMargin,

    // Streaming-funnel twin (Funnel.streamingConversion, batch-run): on a
    // complete replay the stage advances are exactly the batch funnel's
    // non-null stage timestamps — the same CTEs, unioned per stage. A
    // cross-paradigm check of the state machine, like alert_lifecycle.
    "funnel_stages" ->
      s"""WITH $funnelCtes, f AS (
         |  SELECT user_id,
         |         max(view_s) AS v, max(click_s) AS c, max(purchase_s) AS pu
         |  FROM p GROUP BY user_id
         |)
         |SELECT user_id, 1 AS stage, v AS at_s FROM f WHERE v IS NOT NULL
         |UNION ALL
         |SELECT user_id, 2 AS stage, c AS at_s FROM f WHERE c IS NOT NULL
         |UNION ALL
         |SELECT user_id, 3 AS stage, pu AS at_s FROM f WHERE pu IS NOT NULL"""
        .stripMargin,

    // Q1-style pricing twin (Olap.pricingSummary): identical DECIMAL
    // intermediates make every sum exact and order-independent on both
    // engines — the averages derive from the exact sums.
    "olap_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(5,2)))
        |       AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(5,2)) *
        |           CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(5,2)))
        |       AS DOUBLE) AS sum_charge,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |        / count(*), 6) AS avg_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |        / count(*), 6) AS avg_price,
        |  round(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
        |        / count(*), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    // Q5-style twin (Olap.revenueByNation): declarative joins; DuckDB
    // picks its own join order — agreement checks the RESULT, not the plan.
    "join_revenue_nation" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(5,2)))
        |       AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,

    // Top-N twin (WindowOps.topNPerUser): same rank, same tie-break.
    "window_topn" ->
      """SELECT user_id, event_id, value, rnk FROM (
        |  SELECT user_id, event_id, value,
        |         CAST(row_number() OVER (PARTITION BY user_id
        |              ORDER BY value DESC, event_id) AS INT) AS rnk
        |  FROM events WHERE value IS NOT NULL
        |) WHERE rnk <= 3""".stripMargin,

    // Anti-join twin (SetOps.customersWithoutBigOrders): NOT EXISTS.
    "join_anti_orders" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)"""
        .stripMargin,

    // EXCEPT twin (SetOps.clickersNotBuyers): identical set semantics.
    "set_except_users" ->
      """SELECT user_id FROM events
        |WHERE event_type = 'click' AND value > 95
        |EXCEPT
        |SELECT user_id FROM events
        |WHERE event_type = 'purchase' AND value > 95""".stripMargin,

    // INTERSECT twin (SetOps.clickersAlsoBuyers): identical set semantics.
    "set_intersect_users" ->
      """SELECT user_id FROM events
        |WHERE event_type = 'click' AND value > 95
        |INTERSECT
        |SELECT user_id FROM events
        |WHERE event_type = 'purchase' AND value > 95""".stripMargin,

    // Full-outer twin (SetOps.dailyClickPurchaseMatrix).
    "join_full_outer" ->
      """WITH c AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |         count(*) AS n_clicks
        |  FROM events WHERE event_type = 'click' AND ts IS NOT NULL
        |  GROUP BY 1, 2
        |), p AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |         count(*) AS n_purchases
        |  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
        |  GROUP BY 1, 2
        |)
        |SELECT coalesce(c.user_id, p.user_id) AS user_id,
        |       CAST(coalesce(c.day, p.day) AS VARCHAR) AS day,
        |       coalesce(c.n_clicks, 0) AS n_clicks,
        |       coalesce(p.n_purchases, 0) AS n_purchases
        |FROM c FULL OUTER JOIN p
        |  ON c.user_id = p.user_id AND c.day = p.day""".stripMargin,

    // Moments twin (Profile.valueMoments): the same exact decimal Σx/Σx²,
    // the same one double expression for the derived moments.
    "stat_moments" ->
      """SELECT l_returnflag, n,
        |       round(s1 / n, 6) AS mean_qty,
        |       round(CASE WHEN n > 1
        |             THEN greatest((s2 - s1 * s1 / n) / (n - 1), 0)
        |             END, 6) AS var_qty,
        |       round(sqrt(CASE WHEN n > 1
        |             THEN greatest((s2 - s1 * s1 / n) / (n - 1), 0)
        |             END), 6) AS std_qty
        |FROM (
        |  SELECT l_returnflag, count(*) AS n,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s1,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) *
        |                  CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s2
        |  FROM lineitem GROUP BY l_returnflag
        |)""".stripMargin,

    // Pair-moments twin (Profile.pairMoments): the same exact decimal
    // Σx/Σy/Σxy/Σx²/Σy², the same one double expression for cov/corr.
    "stat_pair_moments" ->
      """SELECT l_returnflag, n,
        |       round(CASE WHEN n > 1
        |             THEN (sxy - sx * sy / n) / (n - 1) END, 4)
        |         AS cov_qty_price,
        |       round(CASE WHEN n > 1
        |              AND greatest((sxx - sx * sx / n) / (n - 1), 0) > 0
        |              AND greatest((syy - sy * sy / n) / (n - 1), 0) > 0
        |             THEN ((sxy - sx * sy / n) / (n - 1)) /
        |                  sqrt(greatest((sxx - sx * sx / n) / (n - 1), 0) *
        |                       greatest((syy - sy * sy / n) / (n - 1), 0))
        |             END, 6) AS corr_qty_price
        |FROM (
        |  SELECT l_returnflag, count(*) AS n,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |         CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) *
        |                  CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sxy,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) *
        |                  CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
        |         CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |                  CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag
        |)""".stripMargin,

    // Z-score twin (Profile.zscoreOutliers): exact decimal(14,4) sums →
    // identical mean/std doubles → identical flagged set on both engines.
    "stat_zscore" ->
      """WITH stats AS (
        |  SELECT event_type AS t,
        |         s1 / n AS mean_v,
        |         sqrt(CASE WHEN n > 1
        |              THEN greatest((s2 - s1 * s1 / n) / (n - 1), 0)
        |              END) AS std_v
        |  FROM (
        |    SELECT event_type, count(*) AS n,
        |           CAST(sum(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS s1,
        |           CAST(sum(CAST(value AS DECIMAL(14,4)) *
        |                    CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS s2
        |    FROM events WHERE value IS NOT NULL GROUP BY event_type
        |  )
        |)
        |SELECT event_id, event_type, value,
        |       round((value - mean_v) / std_v, 6) AS zscore
        |FROM events JOIN stats ON event_type = t
        |WHERE value IS NOT NULL AND std_v > 0
        |  AND abs((value - mean_v) / std_v) > 3.0""".stripMargin,

    // Correlation-matrix twin (Profile.correlationMatrix): the same exact
    // decimal sums for every column and pair, the same one double
    // expression per correlation, one UNION ALL branch per pair.
    "stat_corr_matrix" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for {
        i <- cols.indices; j <- cols.indices if i < j
      } yield (i, j)
      def dsum(c: String) =
        s"CAST(sum(CAST($c AS DECIMAL(18,4))) AS DOUBLE)"
      // DuckDB does not auto-widen decimal products (18+18 > 38 errors);
      // 19,4 × 19,4 → DECIMAL(38,8), the same exact product Spark computes.
      def dprod(a: String, b: String) =
        s"CAST(sum(CAST($a AS DECIMAL(19,4)) * CAST($b AS DECIMAL(19,4)))" +
          " AS DOUBLE)"
      val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(s"${dsum(c)} AS sx_$i", s"${dprod(c, c)} AS ss_$i")
      } ++ pairs.map { case (i, j) =>
        s"${dprod(cols(i), cols(j))} AS sp_${i}_$j"
      }
      val branches = pairs.map { case (i, j) =>
        val vx = s"greatest((ss_$i - sx_$i * sx_$i / n) / (n - 1), 0)"
        val vy = s"greatest((ss_$j - sx_$j * sx_$j / n) / (n - 1), 0)"
        val cov = s"(sp_${i}_$j - sx_$i * sx_$j / n) / (n - 1)"
        s"""SELECT '${cols(i)}' AS col_x, '${cols(j)}' AS col_y, n,
           |       round(CASE WHEN n > 1 AND $vx > 0 AND $vy > 0
           |             THEN $cov / sqrt($vx * $vy) END, 6) AS corr
           |FROM s""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH s AS (
         |  SELECT count(*) AS n,
         |         ${aggs.mkString(",\n         ")}
         |  FROM lineitem
         |)
         |$branches""".stripMargin
    },

    // Event-lift twin (Olap.eventTypeLift): identical distinct frame,
    // self-join, marginals, and one double lift expression.
    "olap_event_lift" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |         count(*) AS n_both
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |   AND a.event_type < b.event_type
        |  GROUP BY 1, 2
        |), m AS (SELECT event_type, count(*) AS m FROM ut GROUP BY 1),
        |tot AS (SELECT count(DISTINCT user_id) AS n_users FROM ut)
        |SELECT type_a, type_b, n_both, ma.m AS n_a, mb.m AS n_b,
        |       round(CAST(n_both AS DOUBLE) * n_users /
        |             (CAST(ma.m AS DOUBLE) * mb.m), 6)
        |         AS lift
        |FROM pairs JOIN m ma ON ma.event_type = type_a
        |           JOIN m mb ON mb.event_type = type_b
        |           CROSS JOIN tot""".stripMargin,

    // KS twin (Profile.ksTest): same cell table, same running-CDF max,
    // same classical 5% critical value; D and crit compared at their
    // rounded values so the verdict is bit-stable.
    "stat_ks_test" ->
      """WITH kf AS (
        |  SELECT value, event_type FROM events
        |  WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL
        |), kc AS (
        |  SELECT value,
        |         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS na,
        |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           AS nb
        |  FROM kf GROUP BY value
        |), kt AS (
        |  SELECT CAST(sum(na) AS BIGINT) AS ta,
        |         CAST(sum(nb) AS BIGINT) AS tb,
        |         count(*) AS n_values
        |  FROM kc
        |), kr AS (
        |  SELECT sum(na) OVER (ORDER BY value) AS ca,
        |         sum(nb) OVER (ORDER BY value) AS cb
        |  FROM kc
        |), kd AS (
        |  SELECT max(abs(ca / CAST(ta AS DOUBLE) - cb / CAST(tb AS DOUBLE)))
        |           AS d,
        |         max(ta) AS ta, max(tb) AS tb, max(n_values) AS n_values
        |  FROM kr, kt
        |)
        |SELECT ta AS n_a, tb AS n_b, n_values,
        |       round(d, 6) AS ks_d,
        |       round(1.358 * sqrt((ta + tb)
        |             / (CAST(ta AS DOUBLE) * tb)), 6) AS crit_05,
        |       (round(d, 6) <= round(1.358 * sqrt((ta + tb)
        |             / (CAST(ta AS DOUBLE) * tb)), 6)) AS same_dist_05
        |FROM kd""".stripMargin,

    // χ² cell twin (Profile.chiSquareCells): same exact integer marginals,
    // same one double expression per cell. Spark weekday (0 = Monday) ≡
    // DuckDB isodow − 1.
    "stat_chisquare" ->
      """WITH obs AS (
        |  SELECT event_type AS a, CAST(isodow(ts) - 1 AS INT) AS b,
        |         count(*) AS observed
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2
        |), rt AS (
        |  SELECT a, CAST(sum(observed) AS BIGINT) AS row_total
        |  FROM obs GROUP BY a
        |), ct AS (
        |  SELECT b, CAST(sum(observed) AS BIGINT) AS col_total
        |  FROM obs GROUP BY b
        |), n AS (SELECT CAST(sum(observed) AS BIGINT) AS n_total FROM obs)
        |SELECT a, b, observed,
        |       round(CAST(row_total AS DOUBLE) * col_total /
        |               CAST(n_total AS DOUBLE), 6) AS expected,
        |       round(pow(observed - CAST(row_total AS DOUBLE) * col_total /
        |               CAST(n_total AS DOUBLE), 2) /
        |             (CAST(row_total AS DOUBLE) * col_total /
        |               CAST(n_total AS DOUBLE)), 6)
        |         AS contrib
        |FROM obs JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN n""".stripMargin,

    // χ² scalar twin (Profile.chiSquareStat): statistic, dof, Cramér's V
    // from the same unrounded cell contributions.
    "stat_cramers_v" ->
      """WITH obs AS (
        |  SELECT event_type AS a, CAST(isodow(ts) - 1 AS INT) AS b,
        |         count(*) AS observed
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2
        |), rt AS (
        |  SELECT a, CAST(sum(observed) AS BIGINT) AS row_total
        |  FROM obs GROUP BY a
        |), ct AS (
        |  SELECT b, CAST(sum(observed) AS BIGINT) AS col_total
        |  FROM obs GROUP BY b
        |), n AS (SELECT CAST(sum(observed) AS BIGINT) AS n_total FROM obs),
        |cells AS (
        |  SELECT a, b, n_total,
        |         pow(observed - CAST(row_total AS DOUBLE) * col_total /
        |             CAST(n_total AS DOUBLE), 2) /
        |         (CAST(row_total AS DOUBLE) * col_total /
        |             CAST(n_total AS DOUBLE)) AS contrib
        |  FROM obs JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN n
        |)
        |SELECT round(sum(contrib), 6) AS chi2,
        |       (count(DISTINCT a) - 1) * (count(DISTINCT b) - 1) AS dof,
        |       max(n_total) AS n,
        |       round(sqrt(sum(contrib) /
        |             (max(n_total) *
        |              (least(count(DISTINCT a), count(DISTINCT b)) - 1))), 6)
        |         AS cramers_v
        |FROM cells""".stripMargin,

    // Constraint-suite twin (Profile.checkConstraints, exact face): one
    // metrics CTE, one UNION ALL row per check — same metric expressions,
    // same pass predicates.
    "profile_constraints" ->
      """WITH m AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |         count(user_id) AS nn_user, count(value) AS nn_value,
        |         count(DISTINCT event_id) AS nd_id,
        |         count(CASE WHEN event_type IN
        |           ('click','error','purchase','signup','view')
        |           THEN 1 END) AS in_dom,
        |         count(CASE WHEN value > 0 AND value <= 1000
        |           THEN 1 END) AS in_rng
        |  FROM events
        |)
        |SELECT 'row_count' AS check_name, '*' AS column_name,
        |       round(n, 6) AS metric, n >= 1 AS passed FROM m
        |UNION ALL SELECT 'completeness', 'user_id',
        |       round(nn_user / n, 6), nn_user / n = 1.0 FROM m
        |UNION ALL SELECT 'completeness', 'value',
        |       round(nn_value / n, 6), nn_value / n = 1.0 FROM m
        |UNION ALL SELECT 'uniqueness', 'event_id',
        |       round(nd_id / n, 6), nd_id / n = 1.0 FROM m
        |UNION ALL SELECT 'domain', 'event_type',
        |       round(in_dom / n, 6), in_dom / n = 1.0 FROM m
        |UNION ALL SELECT 'range', 'value',
        |       round(in_rng / n, 6), in_rng / n = 1.0 FROM m""".stripMargin,

    // Retention twin (Olap.retentionCohorts).
    "olap_retention" ->
      """WITH dated AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
        |  FROM events WHERE ts IS NOT NULL
        |), first_seen AS (
        |  SELECT user_id, min(d) AS cohort_d FROM dated GROUP BY user_id
        |)
        |SELECT CAST(f.cohort_d AS VARCHAR) AS cohort_day,
        |       CAST(datediff('day', f.cohort_d, t.d) AS INT) AS day_offset,
        |       count(DISTINCT t.user_id) AS active_users
        |FROM dated t JOIN first_seen f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    // Z-order twin (Zorder.eventKeys): the same shift/mask interleave,
    // term for term.
    "olap_zorder_key" ->
      """WITH zz AS (
        |  SELECT event_id,
        |         user_id % 1024 AS za,
        |         least(greatest(CAST(floor(value) AS BIGINT), 0), 1023)
        |           AS zb
        |  FROM events WHERE value IS NOT NULL
        |)
        |SELECT event_id, za, zb,
        |       CAST((((za >> 0) & 1) << 1) | (((zb >> 0) & 1) << 0) | (((za >> 1) & 1) << 3) | (((zb >> 1) & 1) << 2) | (((za >> 2) & 1) << 5) | (((zb >> 2) & 1) << 4) | (((za >> 3) & 1) << 7) | (((zb >> 3) & 1) << 6) | (((za >> 4) & 1) << 9) | (((zb >> 4) & 1) << 8) | (((za >> 5) & 1) << 11) | (((zb >> 5) & 1) << 10) | (((za >> 6) & 1) << 13) | (((zb >> 6) & 1) << 12) | (((za >> 7) & 1) << 15) | (((zb >> 7) & 1) << 14) | (((za >> 8) & 1) << 17) | (((zb >> 8) & 1) << 16) | (((za >> 9) & 1) << 19) | (((zb >> 9) & 1) << 18) AS BIGINT) AS zkey
        |FROM zz""".stripMargin,

    // Incremental-merge twin: the FULL-history aggregate — Spark builds
    // it as state ⊕ delta, so equality IS the merge-law proof.
    "agg_incremental_merge" ->
      """SELECT user_id, event_type,
        |       count(*) AS n,
        |       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
        |         AS total_value,
        |       min(value) AS min_value,
        |       max(value) AS max_value,
        |       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |             / count(*), 6) AS avg_value
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY user_id, event_type""".stripMargin,

    // Week-over-week twin (Olap.weekOverWeek): same day arithmetic,
    // same lag-7 + calendar-week guard over the daily CTE.
    "olap_wow" ->
      """WITH wd AS (
        |  SELECT event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 86400 AS day,
        |         count(*) AS n_events
        |  FROM events WHERE ts IS NOT NULL
        |  GROUP BY 1, 2
        |), wl AS (
        |  SELECT event_type, day, n_events,
        |         lag(n_events, 7) OVER w AS prev_week,
        |         lag(day, 7) OVER w AS prev_day
        |  FROM wd
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day)
        |), wg AS (
        |  SELECT event_type, day, n_events,
        |         CASE WHEN prev_day = day - 7 THEN prev_week END AS baseline
        |  FROM wl
        |)
        |SELECT event_type, day, n_events,
        |       baseline AS prev_week_events,
        |       round(CASE WHEN baseline > 0
        |             THEN (n_events - baseline) / CAST(baseline AS DOUBLE)
        |             END, 6) AS wow_change
        |FROM wg""".stripMargin,

    // Forecast-eval twin: the olap_wow CTEs folded to per-type MAE/MAPE
    // with the same DECIMAL-staged ratio average.
    "ts_forecast_eval" ->
      """WITH wd AS (
        |  SELECT event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 86400 AS day,
        |         count(*) AS n_events
        |  FROM events WHERE ts IS NOT NULL
        |  GROUP BY 1, 2
        |), wl AS (
        |  SELECT event_type, day, n_events,
        |         lag(n_events, 7) OVER w AS prev_week,
        |         lag(day, 7) OVER w AS prev_day
        |  FROM wd
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day)
        |), ev AS (
        |  SELECT event_type, n_events,
        |         CASE WHEN prev_day = day - 7 THEN prev_week END AS baseline
        |  FROM wl
        |), fe AS (
        |  SELECT event_type,
        |         count(*) AS n_eval,
        |         sum(abs(n_events - baseline)) AS abs_err_sum,
        |         sum(CAST(round(abs(n_events - baseline)
        |               / CAST(baseline AS DOUBLE), 8) AS DECIMAL(20,8)))
        |           AS r8_sum
        |  FROM ev WHERE baseline IS NOT NULL AND baseline > 0
        |  GROUP BY event_type
        |)
        |SELECT event_type, n_eval,
        |       round(CAST(abs_err_sum AS DOUBLE) / n_eval, 6) AS mae,
        |       round(CAST(r8_sum / n_eval AS DOUBLE), 6) AS mape
        |FROM fe""".stripMargin,

    // Benford twin (Olap.benfordScreen): leading digit via the same
    // first-character extraction, same literal expectation.
    "stat_benford" ->
      """WITH bd AS (
        |  SELECT CAST(substr(CAST(abs(value) AS VARCHAR), 1, 1) AS INT)
        |           AS digit,
        |         count(*) AS n
        |  FROM events WHERE value IS NOT NULL AND abs(value) >= 1
        |  GROUP BY 1
        |), bt AS (SELECT sum(n) AS t FROM bd)
        |SELECT digit, n,
        |       round(n / CAST(t AS DOUBLE), 6) AS observed,
        |       round(log10(1.0 + 1.0 / digit), 6) AS expected,
        |       round(abs(round(n / CAST(t AS DOUBLE), 6)
        |             - round(log10(1.0 + 1.0 / digit), 6)), 6) AS abs_dev
        |FROM bd, bt""".stripMargin,

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

    // Seasonality twin (Olap.seasonality): identical epoch div/mod
    // bucketing (Thursday-anchored dow), DECIMAL-staged value sums.
    "olap_seasonality" ->
      """WITH se AS (
        |  SELECT event_type, value,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS s
        |  FROM events WHERE ts IS NOT NULL
        |), sa AS (
        |  SELECT CAST((s // 86400 + 4) % 7 AS INT) AS dow,
        |         CAST((s // 3600) % 24 AS INT) AS hour,
        |         event_type,
        |         count(*) AS n_events,
        |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        |  FROM se GROUP BY 1, 2, 3
        |)
        |SELECT dow, hour, event_type, n_events,
        |       round(sv, 6) AS total_value,
        |       round(sv / n_events, 6) AS avg_value
        |FROM sa""".stripMargin,

    // Histogram twin (Olap.valueHistogram): lo=0, hi=100, bins=20 → width 5.
    "olap_histogram" ->
      """WITH c AS (
        |  SELECT least(19, greatest(0,
        |           CAST(floor((value - 0.0) / 5.0) AS INT))) AS bin,
        |         count(*) AS n
        |  FROM events WHERE value IS NOT NULL GROUP BY 1
        |), t AS (SELECT sum(n) AS t FROM c)
        |SELECT bin, round(0.0 + bin * 5.0, 6) AS bin_lo, n,
        |       round(n / CAST(t.t AS DOUBLE), 6) AS share
        |FROM c, t""".stripMargin,

    // Revenue-share twin (Olap.revenueShareByNation): the Q5 aggregate
    // plus percent-of-total over the 5-row result.
    "olap_revenue_share" ->
      """WITH r AS (
        |  SELECT n_name,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |             CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(5,2)))
        |         AS DOUBLE) AS revenue,
        |    count(*) AS n_items
        |  FROM lineitem
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation   ON c_nationkey = n_nationkey
        |  JOIN region   ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'
        |  GROUP BY n_name
        |)
        |SELECT n_name, revenue, n_items,
        |       round(revenue / sum(revenue) OVER (), 6) AS share
        |FROM r""".stripMargin,

    // Streaming-anomaly twin (Anomaly.streamingOutliers batch replay):
    // prefix-window decimal sums → the same one double expression.
    "stream_anomaly" ->
      """WITH ordered AS (
        |  SELECT event_id, event_type, value,
        |         row_number() OVER w - 1 AS n_seen,
        |         CAST(sum(CAST(value AS DECIMAL(14,4))) OVER wp AS DOUBLE)
        |           AS s1,
        |         CAST(sum(CAST(value AS DECIMAL(14,4)) *
        |                  CAST(value AS DECIMAL(14,4))) OVER wp AS DOUBLE)
        |           AS s2
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        |  WINDOW w AS (PARTITION BY event_type
        |               ORDER BY CAST(ts AS TIMESTAMP), event_id),
        |         wp AS (PARTITION BY event_type
        |                ORDER BY CAST(ts AS TIMESTAMP), event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |), scored AS (
        |  SELECT event_id, event_type, value, n_seen,
        |         s1 / n_seen AS mean_v,
        |         (s2 - s1 * s1 / n_seen) / (n_seen - 1) AS var_v
        |  FROM ordered WHERE n_seen >= 10
        |)
        |SELECT event_id, event_type, value, n_seen,
        |       CASE WHEN var_v > 0
        |            THEN round((value - mean_v) / sqrt(var_v), 6)
        |            END AS z_score
        |FROM scored
        |WHERE (var_v > 0 AND abs((value - mean_v) / sqrt(var_v)) > 3.0)
        |   OR (var_v <= 0 AND value <> mean_v)""".stripMargin,

    // Resample twin (Resample.hourlyFfill): each observed bucket
    // generates its own filled rows up to the next observed bucket —
    // the same join-free lead+generate shape as the operator.
    // EWMA twin (Resample.ewma): list_reduce folds left seeded with the
    // first element — exactly s₁ = x₁ then sᵢ = α·xᵢ + (1−α)·sᵢ₋₁, the
    // same left-to-right double fold as the Spark aggregate, hence
    // bit-identical.
    "ts_ewma" ->
      s"""WITH ordered AS (
         |  SELECT event_type,
         |         list(value ORDER BY CAST(ts AS TIMESTAMP), event_id) AS s
         |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
         |  GROUP BY event_type
         |)
         |SELECT event_type,
         |       CAST(len(s) AS INT) AS n_points,
         |       round(s[-1], 6) AS last_value,
         |       round(list_reduce(s,
         |         (acc, x) -> $EwmaAlpha * x + ${1 - EwmaAlpha} * acc), 6)
         |         AS ewma_value
         |FROM ordered""".stripMargin,

    "ts_resample_ffill" ->
      """WITH obs AS (
        |  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
        |         round(CAST(sum(CAST(value AS DECIMAL(14,4))) AS DOUBLE)
        |               / count(*), 6) AS avg_v
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2
        |), led AS (
        |  SELECT user_id, h, avg_v,
        |         lead(h) OVER (PARTITION BY user_id ORDER BY h) AS next_h
        |  FROM obs
        |), gen AS (
        |  SELECT user_id, h, avg_v,
        |         unnest(generate_series(
        |           h, coalesce(next_h - INTERVAL 1 HOUR, h),
        |           INTERVAL 1 HOUR)) AS gh
        |  FROM led
        |)
        |SELECT user_id, CAST(gh AS VARCHAR) AS hour,
        |       gh = h AS observed, avg_v AS value_ffill
        |FROM gen""".stripMargin,

    // Winsorize twin (Resample.winsorize): quantile_cont matches Spark's
    // exact interpolated percentile (same selection-based definition).
    "stat_winsorize" ->
      """WITH bounds AS (
        |  SELECT event_type AS t,
        |         quantile_cont(value, 0.05) AS lo,
        |         quantile_cont(value, 0.95) AS hi
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type
        |)
        |SELECT event_id, event_type, value,
        |       round(least(greatest(value, lo), hi), 6) AS clipped_value,
        |       (value < lo OR value > hi) AS was_clipped
        |FROM events JOIN bounds ON event_type = t
        |WHERE value IS NOT NULL""".stripMargin,

    // Normalization twin (TextAnalysis.normalize).
    "text_normalize" ->
      """SELECT doc_id,
        |       lower(trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g')))
        |         AS norm_text,
        |       length(lower(trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g'))))
        |         AS n_chars_norm
        |FROM documents""".stripMargin,

    // Daily-active-users twin (Olap.dailyActiveUsers): exact distinct.
    "agg_distinct_users" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |       event_type,
        |       count(DISTINCT user_id) AS n_users,
        |       count(*) AS n_events
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,

    // HLL audit twin (Olap.dailyActiveUsersAudit): the oracle has no
    // Spark-compatible sketch, so it asserts the CONTRACT — every group's
    // estimate within 3·rsd of exact — which the Spark side computes from
    // its own deterministic (register-max) sketch.
    "agg_distinct_hll_audit" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |       event_type,
        |       count(DISTINCT user_id) AS n_users,
        |       count(*) AS n_events,
        |       TRUE AS within_tol
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,

    // Sketch-rollup audit twin (Olap.weeklyActiveUsersRollupAudit): exact
    // weekly distincts + day counts, the union-estimate contract pinned
    // TRUE (DataSketches HLL registers are per-bucket maxima — sketch and
    // union are order-independent, so the boolean is stable).
    "agg_distinct_hll_rollup_audit" ->
      """SELECT strftime(date_trunc('week', CAST(ts AS TIMESTAMP)),
        |                '%Y-%m-%d') AS week,
        |       count(DISTINCT user_id) AS n_users,
        |       count(DISTINCT strftime(CAST(ts AS TIMESTAMP),
        |                '%Y-%m-%d')) AS n_days,
        |       TRUE AS within_tol
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1""".stripMargin,

    // Quantile-bin twin (Profile.quantileBins, exact face): DuckDB's
    // quantile_cont interpolates identically to Spark's exact percentile;
    // the same strictly-greater edge comparison assigns bins.
    "stat_quantile_bins" -> {
      val qs = (1 until 10).map(i => s"quantile_cont(value, 0.$i)")
        .mkString(", ")
      s"""WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
         |e AS (SELECT [$qs] AS edges FROM v),
         |b AS (
         |  SELECT 1 + len(list_filter(edges, x -> value > x)) AS bin
         |  FROM v CROSS JOIN e
         |), c AS (SELECT bin, count(*) AS n_events FROM b GROUP BY bin)
         |SELECT CAST(bin AS INT) AS bin, n_events,
         |       round(n_events / CAST(sum(n_events) OVER () AS DOUBLE), 6)
         |         AS share
         |FROM c""".stripMargin
    },

    // Moving-window twin (WindowOps.movingStats): identical frame spec;
    // 6-dp rounding absorbs sliding-aggregation summation order.
    "window_moving_stats" ->
      """SELECT event_id, user_id,
        |       epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS ts_sec,
        |       round(avg(value) OVER
        |         (PARTITION BY user_id
        |          ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) // 1000000, event_id
        |          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS ma5,
        |       round(value - lag(value) OVER
        |         (PARTITION BY user_id
        |          ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) // 1000000, event_id),
        |         6) AS delta
        |FROM events WHERE ts IS NOT NULL""".stripMargin,

    // AS-OF twin (AsOf.purchasesWithLatestView): DuckDB's NATIVE ASOF
    // LEFT JOIN checks the union-window implementation against an
    // independent algorithm — same inclusive `l.ts >= r.ts` semantics,
    // same (user_id, ts)-dedup of the view side by max event_id.
    "asof_purchase_view" ->
      """WITH ev AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
        |         event_type, value
        |  FROM events WHERE ts IS NOT NULL
        |), p AS (
        |  SELECT event_id AS purchase_id, user_id, ts
        |  FROM ev WHERE event_type = 'purchase'
        |), v0 AS (
        |  SELECT event_id AS view_id, user_id, ts, value AS view_value,
        |         row_number() OVER (PARTITION BY user_id, ts
        |                            ORDER BY event_id DESC) AS rn
        |  FROM ev WHERE event_type = 'view'
        |), v AS (
        |  SELECT view_id, user_id, ts, view_value FROM v0 WHERE rn = 1
        |)
        |SELECT p.purchase_id, p.user_id, p.ts AS purchase_ts,
        |       v.view_id, v.view_value
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND p.ts >= v.ts""".stripMargin,

    // Nearest-as-of twin (AsOf.purchasesWithNearestView): DuckDB states
    // nearest declaratively (per-key product + (distance, backward
    // -preferred) rank) — checking the double-window implementation
    // against the definition. Micros arithmetic on both sides.
    "asof_nearest_view" ->
      """WITH ev AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
        |         event_type, value
        |  FROM events WHERE ts IS NOT NULL
        |), p AS (
        |  SELECT event_id AS purchase_id, user_id, ts
        |  FROM ev WHERE event_type = 'purchase'
        |), v0 AS (
        |  SELECT event_id AS view_id, user_id, ts, value AS view_value,
        |         row_number() OVER (PARTITION BY user_id, ts
        |                            ORDER BY event_id DESC) AS rn
        |  FROM ev WHERE event_type = 'view'
        |), v AS (
        |  SELECT view_id, user_id, ts, view_value FROM v0 WHERE rn = 1
        |), cand AS (
        |  SELECT p.purchase_id, v.view_id, v.view_value,
        |         epoch_us(v.ts) - epoch_us(p.ts) AS dt_us,
        |         row_number() OVER (
        |           PARTITION BY p.purchase_id
        |           ORDER BY abs(epoch_us(v.ts) - epoch_us(p.ts)),
        |                    (v.ts <= p.ts) DESC) AS rn
        |  FROM p JOIN v ON p.user_id = v.user_id
        |)
        |SELECT p.purchase_id, p.user_id, p.ts AS purchase_ts,
        |       c.view_id, c.view_value, c.dt_us,
        |       CASE WHEN c.view_id IS NULL THEN NULL
        |            WHEN c.dt_us <= 0 THEN 'backward'
        |            ELSE 'forward' END AS direction
        |FROM p LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
        |  USING (purchase_id)""".stripMargin,

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

    // Attribution twin (StreamJoin.purchaseAttribution, batch face): the
    // same inclusive time-range join, declaratively.
    "join_attribution" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |  FROM events WHERE ts IS NOT NULL
        |)
        |SELECT p.event_id AS purchase_id, p.user_id,
        |       epoch_us(p.ts) // 1000000 AS purchase_s,
        |       v.event_id AS view_id,
        |       epoch_us(v.ts) // 1000000 AS view_s,
        |       epoch_us(p.ts) // 1000000 - epoch_us(v.ts) // 1000000 AS lag_s
        |FROM ev p JOIN ev v
        |  ON p.user_id = v.user_id
        | AND v.ts >= p.ts - INTERVAL 60 MINUTE
        | AND v.ts <= p.ts
        |WHERE p.event_type = 'purchase' AND v.event_type = 'view'""".stripMargin,

    // Chunking twin (Curation.chunkDocuments): same token windows —
    // DuckDB's inclusive 1-based list slice mirrors Spark's slice(t, s+1, k).
    "corpus_chunk" ->
      s"""WITH $rawToksSql, nn AS (
         |  SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0
         |), st AS (
         |  SELECT doc_id, t, unnest(range(0, n, $ChunkStride)) AS s FROM nn
         |)
         |SELECT doc_id,
         |       CAST(s // $ChunkStride AS INT) AS chunk_id,
         |       CAST(len(t[s + 1 : s + $ChunkSize]) AS INT) AS n_chunk_tokens,
         |       array_to_string(t[s + 1 : s + $ChunkSize], ' ') AS chunk_text
         |FROM st""".stripMargin,

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

    // Deterministic DSIR selection twin: top-k by (ratio desc, doc_id) —
    // the 6-dp rounded ratio plus the id tie-break makes the cut
    // bit-stable on both engines.
    "corpus_select_dsir" ->
      s"""WITH $dsirCtesSql
         |SELECT doc_id, n_tokens, dsir_logratio
         |FROM dscored
         |WHERE dsir_logratio IS NOT NULL
         |ORDER BY dsir_logratio DESC, doc_id
         |LIMIT 50""".stripMargin,

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

    // Deterministic stratified sampler twin (Curation.sampleByLanguage):
    // same md5-derived bucket, same per-language CASE of rates. The CAST
    // AS DOUBLE matters: DuckDB parses 0.07 as DECIMAL, whose exact ·10000
    // differs from Spark's binary-double product on the boundary bucket.
    "corpus_sample" -> {
      val rateCase = SampleRates
        .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
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
         |)
         |SELECT doc_id, predicted_lang FROM langed
         |WHERE (${hashSql("'0:'", "CAST(doc_id AS VARCHAR)")} % 10000)
         |      < CAST((CASE predicted_lang $rateCase
         |              ELSE $SampleDefaultRate END) AS DOUBLE) * 10000""".stripMargin
    },

    // Fixed-k stratified sample twin (Curation.sampleGrouped): identical
    // seeded-md5 ranking, doc_id tie-break, identical rank cutoff.
    "corpus_sample_grouped" ->
      """SELECT lang, CAST(sample_rank AS INT) AS sample_rank, doc_id,
        |       source, n_chars
        |FROM (
        |  SELECT lang, doc_id, source, n_chars,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY md5(concat('graft-v1:',
        |             CAST(doc_id AS VARCHAR))), doc_id) AS sample_rank
        |  FROM documents
        |)
        |WHERE sample_rank <= 20""".stripMargin,

    // Weighted A-ES sample twin (Curation.sampleWeighted): the same
    // hash-uniform u and ln(u)/w ranking key, doc_id tie-break.
    "corpus_sample_weighted" ->
      s"""SELECT doc_id, n_chars
         |FROM documents
         |WHERE n_chars > 0
         |ORDER BY ln((${hashSql("'0:'",
              "concat('graft-w1:', CAST(doc_id AS VARCHAR))")} + 0.5) /
         |         1152921504606846976.0) / n_chars DESC, doc_id
         |LIMIT 50""".stripMargin,

    // Per-stratum weighted twin (Curation.sampleGroupedWeighted): the
    // sampleGrouped window with sampleWeighted's A-ES key inside it.
    "corpus_sample_grouped_weighted" ->
      s"""SELECT lang, CAST(sample_rank AS INT) AS sample_rank, doc_id,
         |       n_chars
         |FROM (
         |  SELECT lang, doc_id, n_chars,
         |         row_number() OVER (PARTITION BY lang
         |           ORDER BY ln((${hashSql("'0:'",
              "concat('graft-gw1:', CAST(doc_id AS VARCHAR))")} + 0.5) /
         |             1152921504606846976.0) / n_chars DESC, doc_id)
         |           AS sample_rank
         |  FROM documents WHERE n_chars > 0
         |)
         |WHERE sample_rank <= 20""".stripMargin,

    // Gaps-and-islands sessionization twin (Sessionize.sessions): epoch
    // seconds by integer division on both engines, event_id tie-break,
    // running sum over the same unique ordering.
    "sessionize" ->
      s"""WITH $sessionCtesSql
         |SELECT user_id, session_seq, CAST(count(*) AS INT) AS n_events,
         |       min(ts_sec) AS start_sec, max(ts_sec) AS end_sec
         |FROM sess GROUP BY user_id, session_seq""".stripMargin,

    // Range-join twin (RangeJoin.pointInInterval over sessions): DuckDB
    // expresses the interval containment DIRECTLY (join ... BETWEEN),
    // checking the bin-bucketed equi-join implementation against the
    // declarative definition. Shares the sessionize CTEs so the interval
    // source cannot drift between the two oracles.
    "range_session_purchases" ->
      s"""WITH $sessionCtesSql, sessions AS (
         |  SELECT user_id, session_seq,
         |         min(ts_sec) AS start_sec, max(ts_sec) AS end_sec
         |  FROM sess GROUP BY user_id, session_seq
         |), pp AS (
         |  SELECT event_id, user_id,
         |         epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS ts_sec
         |  FROM events
         |  WHERE ts IS NOT NULL AND event_type = 'purchase'
         |)
         |SELECT p.event_id, p.user_id, s.session_seq
         |FROM pp p
         |JOIN sessions s
         |  ON p.user_id = s.user_id
         | AND p.ts_sec BETWEEN s.start_sec AND s.end_sec""".stripMargin,

    // Interval-overlap twin (RangeJoin.intervalOverlap): DuckDB states
    // the overlap DIRECTLY; the bin-bucketed first-shared-bin equi-join
    // must reproduce it pair for pair. Sessions share the sessionize
    // CTEs; bursts re-derive Sessionize.typeBursts declaratively.
    "join_interval_overlap" ->
      s"""WITH $sessionCtesSql, sessions AS (
         |  SELECT user_id, session_seq,
         |         min(ts_sec) AS start_sec, max(ts_sec) AS end_sec
         |  FROM sess GROUP BY user_id, session_seq
         |), hv AS (
         |  SELECT event_id, event_type,
         |         epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS ts_sec
         |  FROM events WHERE ts IS NOT NULL AND value > 250
         |), bflag AS (
         |  SELECT event_type, ts_sec,
         |         CASE WHEN lag(ts_sec) OVER
         |                (PARTITION BY event_type ORDER BY ts_sec, event_id)
         |                IS NULL
         |              OR ts_sec - lag(ts_sec) OVER
         |                (PARTITION BY event_type ORDER BY ts_sec, event_id)
         |                > 21600
         |              THEN 1 ELSE 0 END AS nb,
         |         event_id
         |  FROM hv
         |), bseq AS (
         |  SELECT event_type, ts_sec,
         |         CAST(sum(nb) OVER
         |           (PARTITION BY event_type ORDER BY ts_sec, event_id)
         |           AS INT) AS burst_seq
         |  FROM bflag
         |), bursts AS (
         |  SELECT event_type, burst_seq,
         |         min(ts_sec) AS b_start, max(ts_sec) AS b_end
         |  FROM bseq GROUP BY event_type, burst_seq
         |)
         |SELECT s.user_id, s.session_seq, s.start_sec, s.end_sec,
         |       b.event_type, b.burst_seq, b.b_start, b.b_end,
         |       least(s.end_sec, b.b_end) - greatest(s.start_sec, b.b_start)
         |         + 1 AS overlap_sec
         |FROM sessions s
         |JOIN bursts b
         |  ON s.start_sec <= b.b_end AND b.b_start <= s.end_sec""".stripMargin,

    // Density-outlier twin (Similarity.densityOutliers): the
    // sim_cosine_neardup pair CTEs folded to per-vector degrees.
    "sim_density_outliers" ->
      s"""WITH $prepSql, $bucketsSimSql, dpairs AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM bsim a
         |  JOIN bsim b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.vec", "a.norm", "b.vec", "b.norm")}
         |        >= $NearDupCosine
         |), ddeg AS (
         |  SELECT vec_id, count(*) AS n_neighbors FROM (
         |    SELECT a_id AS vec_id FROM dpairs
         |    UNION ALL SELECT b_id FROM dpairs)
         |  GROUP BY vec_id
         |)
         |SELECT e.vec_id,
         |       coalesce(d.n_neighbors, 0) AS n_neighbors,
         |       coalesce(d.n_neighbors, 0) < 2 AS is_outlier
         |FROM embeddings e LEFT JOIN ddeg d ON d.vec_id = e.vec_id""".stripMargin,

    "sim_cosine_neardup" ->
      s"""WITH $prepSql, $bucketsSimSql
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |       ${cosSql("a.vec", "a.norm", "b.vec", "b.norm")} AS cos_sim
         |FROM bsim a
         |JOIN bsim b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.vec", "a.norm", "b.vec", "b.norm")} >= $NearDupCosine"""
        .stripMargin,

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

    // Embedding-space CC twin (Similarity.cosineNearDupClusters): the
    // cosine pair set above fed through the same recursive-CTE components
    // shape as dedup_clusters — an independent algorithm from the engine's
    // label-propagation loop.
    "sim_neardup_clusters" ->
      s"""WITH RECURSIVE $prepSql, $bucketsSimSql, cpairs AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM bsim a
         |  JOIN bsim b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.vec", "a.norm", "b.vec", "b.norm")}
         |          >= $NearDupClusterCosine
         |), cedges AS (
         |  SELECT a_id, b_id FROM cpairs
         |  UNION ALL
         |  SELECT b_id, a_id FROM cpairs
         |), creach(vec_id, label) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT e.a_id, r.label FROM cedges e JOIN creach r
         |    ON r.vec_id = e.b_id
         |)
         |SELECT vec_id, min(label) AS cluster_id
         |FROM creach GROUP BY vec_id""".stripMargin,

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

    // Token-drift twin (Curation.tokenDrift): inlined split CASE, same
    // Jelinek-Mercer smoothing staged in the same literal order (the λ/B
    // floor interpolates as the Scala double's shortest round-trip
    // representation, so both engines mix the identical double). Unseen
    // buckets contribute exactly 0 under interpolation — no tail term.
    "corpus_token_drift" ->
      s"""WITH $rawToksSql, $driftCtesSql
         |SELECT CAST(seen AS INT) AS n_buckets_seen,
         |       CAST(ntr AS BIGINT) AS train_tokens,
         |       CAST(nva AS BIGINT) AS val_tokens,
         |       round(klp, 6) AS kl_val_train,
         |       round(jsp, 6) AS js
         |FROM dfa, dft""".stripMargin,

    // Dashboard twin (Curation.corpusStats).
    "corpus_stats" ->
      s"""WITH $rawToksSql, $corpusStatsCtesSql
         |SELECT CAST(n_docs AS BIGINT) AS n_docs,
         |       CAST(n_empty AS BIGINT) AS n_empty,
         |       CAST(total_chars AS BIGINT) AS total_chars,
         |       CAST(total_tokens AS BIGINT) AS total_tokens,
         |       CAST(distinct_terms AS BIGINT) AS distinct_terms,
         |       round(CAST(total_tokens AS DOUBLE) / greatest(n_docs, 1), 6)
         |         AS avg_doc_tokens
         |FROM csd, cst, csv""".stripMargin,

    // Dedup-dashboard twin (Curation.dedupReport): exact distincts +
    // cluster keepers (the recursive-CTE components) + duplicated-line
    // totals over the wrapped view, one row.
    "corpus_dedup_report" -> {
      val L = graft.ops.Dedup.LineDedupMinChars
      s"""WITH RECURSIVE $gramsSql, $sigSql, $bucketsSql, $candidatePairsSql,
         |$componentsSql, $rawToksSql, wrapped AS (
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
         |), ddup AS (
         |  SELECT line FROM ln WHERE len(line) >= $L
         |  GROUP BY line HAVING count(*) >= 2
         |), lstats AS (
         |  SELECT (SELECT count(*) FROM ln) AS total_lines,
         |         (SELECT count(*) FROM ln
         |          WHERE len(line) >= $L
         |            AND line IN (SELECT line FROM ddup)) AS dup_lines
         |), estats AS (
         |  SELECT count(*) AS n_docs,
         |         count(DISTINCT text) AS n_distinct_texts
         |  FROM documents
         |), kstats AS (
         |  SELECT count(*) AS n_keepers FROM labels WHERE doc_id = cluster_id
         |)
         |SELECT n_docs,
         |       n_docs - n_distinct_texts AS exact_dup_docs,
         |       n_docs - n_keepers AS near_dup_prunable,
         |       round((n_docs - n_keepers)
         |             / CAST(greatest(n_docs, 1) AS DOUBLE), 6)
         |         AS near_dup_share,
         |       total_lines, dup_lines,
         |       round(dup_lines / CAST(greatest(total_lines, 1) AS DOUBLE), 6)
         |         AS dup_line_share
         |FROM estats, kstats, lstats""".stripMargin
    },

    // Snapshot-report composite (Curation.corpusReport): the dashboard
    // row + the drift verdict + two length-histogram summaries, composed
    // from the SAME CTE fragments as the standalone twins so the report
    // and its parts cannot drift.
    "corpus_report" ->
      s"""WITH $rawToksSql, $corpusStatsCtesSql, $driftCtesSql,
         |$lengthHistCtesSql, modal AS (
         |  SELECT CAST(bucket AS INT) AS modal_bucket
         |  FROM lhg ORDER BY n_docs DESC, bucket LIMIT 1
         |), longs AS (
         |  SELECT round(CAST(sum(CASE WHEN bucket >= ${Curation.LongDocBucket}
         |             THEN total_tokens ELSE 0 END) AS DOUBLE)
         |           / greatest(sum(total_tokens), 1), 6)
         |           AS long_doc_token_share
         |  FROM lhg
         |)
         |SELECT CAST(n_docs AS BIGINT) AS n_docs,
         |       CAST(n_empty AS BIGINT) AS n_empty,
         |       CAST(total_chars AS BIGINT) AS total_chars,
         |       CAST(total_tokens AS BIGINT) AS total_tokens,
         |       CAST(distinct_terms AS BIGINT) AS distinct_terms,
         |       round(CAST(total_tokens AS DOUBLE) / greatest(n_docs, 1), 6)
         |         AS avg_doc_tokens,
         |       round(klp, 6) AS kl_val_train,
         |       round(jsp, 6) AS js,
         |       (round(jsp, 6) <= CAST(${Curation.DriftJsAlarm} AS DOUBLE))
         |         AS drift_ok,
         |       modal_bucket,
         |       long_doc_token_share
         |FROM csd, cst, csv, dfa, dft, modal, longs""".stripMargin,

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

    // Length-histogram twin (Curation.lengthHistogram): identical integer
    // bit-length binning — length(bin(n)) on both engines — so no float
    // log2 ever touches a bin boundary.
    "corpus_length_histogram" ->
      s"""WITH $lengthHistCtesSql
         |SELECT CAST(bucket AS INT) AS bucket,
         |       CAST(CASE WHEN bucket = 0 THEN 0
         |                 ELSE power(2, bucket - 1) END AS BIGINT) AS len_lo,
         |       CAST(CASE WHEN bucket = 0 THEN 0
         |                 ELSE power(2, bucket) - 1 END AS BIGINT) AS len_hi,
         |       n_docs,
         |       CAST(total_tokens AS BIGINT) AS total_tokens
         |FROM lhg""".stripMargin,

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
    "text_quality_score" -> {
      val d = TextAnalysis.QualityScoreDim
      s"""WITH $rawToksSql, g AS (
         |  SELECT doc_id,
         |         list_concat(t, CASE WHEN len(t) >= 2
         |           THEN list_transform(range(1, len(t)),
         |                i -> concat(t[CAST(i AS INT)], ' ',
         |                            t[CAST(i AS INT) + 1]))
         |           ELSE [] END) AS g
         |  FROM toks
         |), ex AS (SELECT doc_id, unnest(g) AS w FROM g),
         |scored AS (
         |  SELECT doc_id, count(*) AS n_grams,
         |         sum(((${hashSql("'0:'")} % $d) * 1315423911) % 17 - 8)
         |           AS raw
         |  FROM ex GROUP BY 1
         |)
         |SELECT g.doc_id,
         |       CAST(coalesce(s.n_grams, 0) AS INT) AS n_grams,
         |       CAST(coalesce(s.raw, 0) AS BIGINT) AS raw_score,
         |       round(1.0 / (1.0 + exp(-(coalesce(s.raw, 0) /
         |         (greatest(coalesce(s.n_grams, 0), 1) * 8.0)))), 6)
         |         AS quality_score
         |FROM g LEFT JOIN scored s USING (doc_id)""".stripMargin
    },

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

    // Declarative twin of the flatMapGroupsWithState lifecycle: runs of
    // equal alert_type per sensor (gaps-and-islands); an 'active' row opens
    // each non-null run, a 'resolved' row closes it at the first row of the
    // next run.
    "alert_lifecycle" ->
      s"""$R, classified AS (
         |  SELECT sensor_id, event_time, $classifySql AS alert_type
         |  FROM readings
         |), lagged AS (
         |  SELECT sensor_id, event_time, alert_type,
         |         lag(alert_type) OVER
         |           (PARTITION BY sensor_id ORDER BY event_time) AS prev
         |  FROM classified
         |), seq AS (
         |  SELECT sensor_id, event_time, alert_type,
         |         count(CASE WHEN alert_type IS DISTINCT FROM prev
         |                    THEN 1 END)
         |           OVER (PARTITION BY sensor_id ORDER BY event_time
         |                 ROWS UNBOUNDED PRECEDING) AS run_id
         |  FROM lagged
         |), runs AS (
         |  SELECT sensor_id, run_id, alert_type,
         |         min(event_time) AS run_start
         |  FROM seq GROUP BY 1, 2, 3
         |), actives AS (
         |  SELECT sensor_id, alert_type, 'active' AS status,
         |         run_start AS triggered_at,
         |         CAST(NULL AS TIMESTAMP) AS resolved_at
         |  FROM runs WHERE alert_type IS NOT NULL
         |), resolveds AS (
         |  SELECT r.sensor_id, p.alert_type, 'resolved' AS status,
         |         p.run_start AS triggered_at,
         |         r.run_start AS resolved_at
         |  FROM runs r
         |  JOIN runs p ON p.sensor_id = r.sensor_id
         |             AND p.run_id = r.run_id - 1
         |  WHERE p.alert_type IS NOT NULL
         |)
         |SELECT * FROM actives UNION ALL SELECT * FROM resolveds"""
        .stripMargin,

    // Generator contract audit twin: the readings are xxhash64-seeded (no
    // SQL can reproduce the draws) but the CONTRACT is literal — exact
    // per-type counts (24000 % 3 split), 8 sensors each, the unit map, and
    // the five envelope/rate booleans pinned TRUE. A generator regression
    // flips a hash-checked bit even though the oracle never sees a draw.
    "gen_readings_audit" ->
      """SELECT t.sensor_type, CAST(8000 AS BIGINT) AS n_rows,
        |       CAST(8 AS BIGINT) AS n_sensors, t.unit,
        |       TRUE AS unit_uniform, TRUE AS vals_in_envelope,
        |       TRUE AS battery_in_range, TRUE AS signal_in_range,
        |       TRUE AS anomalies_present, TRUE AS anomaly_rate_bounded
        |FROM (VALUES ('temperature', 'celsius'), ('humidity', 'percent'),
        |             ('pressure', 'hPa')) AS t(sensor_type, unit)"""
        .stripMargin,

    // Payload bytes are the documents' UTF-8 text, so byte-prefix sniffs
    // reduce to string prefixes (0x89/0xff can never begin valid UTF-8).
    // coalesce(text,'') mirrors fromDocuments' NULL ≡ empty-payload contract.
    "mm_metadata" ->
      """SELECT doc_id AS media_id,
        |       'text-blob' AS kind,
        |       CAST(octet_length(encode(coalesce(text, ''))) AS INT) AS n_bytes,
        |       sha256(coalesce(text, '')) AS payload_sha256,
        |       CASE WHEN starts_with(coalesce(text, ''), 'RIFF') THEN 'riff-wav'
        |            ELSE 'unknown' END AS sniffed_format
        |FROM documents""".stripMargin,

    // Shared pixel-formula CTEs for the real-decode twins: the synthetic
    // PNGs' pixels are a pure modular formula of (doc_id, x, y) and PNG is
    // lossless, so DuckDB reconstructs exactly what ImageIO decodes —
    // without ever seeing the bytes. Sequential unnests (xs then px) build
    // the w×h grid per document.
    "mm_decode" ->
      s"""WITH $pngPixelCtesSql
         |SELECT doc_id AS media_id, TRUE AS decoded,
         |       CAST(max(w) AS INT) AS width_px,
         |       CAST(max(h) AS INT) AS height_px,
         |       CAST(max(w) * max(h) AS BIGINT) AS n_px,
         |       CAST(sum(r) AS BIGINT) AS r_sum,
         |       CAST(sum(g) AS BIGINT) AS g_sum,
         |       CAST(sum(b) AS BIGINT) AS b_sum,
         |       round(CAST(sum(r) AS DOUBLE) / (max(w) * max(h)), 6) AS r_mean,
         |       round(CAST(sum(g) AS DOUBLE) / (max(w) * max(h)), 6) AS g_mean,
         |       round(CAST(sum(b) AS DOUBLE) / (max(w) * max(h)), 6) AS b_mean
         |FROM ch GROUP BY doc_id""".stripMargin,

    // ImageLumaExtractor twin: 16-bin histogram of integer luminance
    // (r+g+b)//3 over the decoded pixels, L1-normalized with float32
    // division (REAL casts — both engines IEEE single-precision, then
    // exact double widening).
    "mm_features" -> {
      val bins = (0 until 16).map { j =>
        s"""CAST(CAST(sum(CASE WHEN (r + g + b) // 3 // 16 = $j
           |  THEN 1 ELSE 0 END) AS REAL)
           |  / CAST(max(w) * max(h) AS REAL) AS DOUBLE) AS f$j""".stripMargin
      }.mkString(",\n")
      s"""WITH $pngPixelCtesSql
         |SELECT doc_id AS media_id,
         |$bins
         |FROM ch GROUP BY doc_id""".stripMargin
    },

    // pngHeaderDims twin: the Spark side parses IHDR width/height out of
    // the REAL encoded bytes; the oracle knows only the formula dims —
    // a hash match proves the payloads are genuine PNGs of those dims.
    "mm_png_header" ->
      """SELECT doc_id AS media_id,
        |       CAST(8 + doc_id % 9 AS INT) AS width_px,
        |       CAST(8 + (doc_id // 9) % 9 AS INT) AS height_px
        |FROM documents""".stripMargin,

    // ByteHistogramExtractor twin (the no-codec fallback): bin j of a byte
    // is its upper nibble, which in hex(payload) is the character at odd
    // positions — so the histogram is a per-hex-digit count over those
    // characters. REAL casts reproduce the extractor's float32 division
    // exactly (both engines do IEEE-754 single-precision divide; the
    // double output is then the exact widening on both sides —
    // bit-for-bit, no rounding).
    "mm_features_bytes" -> {
      val bins = "0123456789ABCDEF".zipWithIndex.map { case (c, j) =>
        s"""CAST(CAST(len(list_filter(hi, c -> c = '$c')) AS REAL)
           |  / CAST(greatest(n, 1) AS REAL) AS DOUBLE) AS f$j""".stripMargin
      }.mkString(",\n")
      s"""WITH hx AS (
         |  SELECT doc_id, hex(encode(coalesce(text, ''))) AS h,
         |         octet_length(encode(coalesce(text, ''))) AS n
         |  FROM documents
         |), nib AS (
         |  SELECT doc_id, n,
         |         list_transform(range(0, n),
         |           i -> substr(h, CAST(2*i+1 AS INT), 1)) AS hi
         |  FROM hx
         |)
         |SELECT doc_id AS media_id,
         |$bins
         |FROM nib""".stripMargin
    },

    // WAV header twin (Multimodal.wavHeaderInfo): the Spark side parses
    // channels/rate/bits/data-size out of the REAL little-endian RIFF
    // header bytes; the oracle knows only the WavCodec formula — a hash
    // match proves the payloads are genuine canonical-header WAVs.
    "mm_wav_header" ->
      """SELECT doc_id AS media_id,
        |       CAST(1 + doc_id % 2 AS INT) AS n_channels,
        |       CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
        |       CAST(16 AS INT) AS bits,
        |       CAST(64 + doc_id % 33 AS BIGINT) AS n_frames,
        |       CAST((64 + doc_id % 33) * 1000
        |            // (8000 + (doc_id % 4) * 4000) AS BIGINT) AS duration_ms
        |FROM documents""".stripMargin,

    // WAV decode twin (Multimodal.decodeWavStats): PCM is lossless, so the
    // AudioSystem-decoded per-channel sums / min / max equal the closed-form
    // sample formula re-derived here over the (frame, channel) grid —
    // channel c of frame i is (id·31 + i·7 + c·13) mod 65536 − 32768,
    // mono docs have no channel 1 (sum pinned 0, extrema coalesce away).
    "mm_wav_decode" ->
      """WITH wd AS (
        |  SELECT doc_id, 1 + doc_id % 2 AS nch,
        |         8000 + (doc_id % 4) * 4000 AS rate,
        |         64 + doc_id % 33 AS nf
        |  FROM documents
        |), fr AS (
        |  SELECT doc_id, nch, rate, nf, unnest(range(0, nf)) AS i FROM wd
        |), smp AS (
        |  SELECT doc_id, nch, rate, nf,
        |         (doc_id * 31 + i * 7) % 65536 - 32768 AS s0,
        |         CASE WHEN nch = 2
        |              THEN (doc_id * 31 + i * 7 + 13) % 65536 - 32768
        |         END AS s1
        |  FROM fr
        |)
        |SELECT doc_id AS media_id, TRUE AS decoded,
        |       CAST(max(rate) AS INT) AS sample_rate,
        |       CAST(max(nch) AS INT) AS n_channels,
        |       CAST(max(nf) AS BIGINT) AS n_frames,
        |       CAST(sum(s0) AS BIGINT) AS ch0_sum,
        |       CAST(coalesce(sum(s1), 0) AS BIGINT) AS ch1_sum,
        |       CAST(least(min(s0), coalesce(min(s1), 32767)) AS INT) AS v_min,
        |       CAST(greatest(max(s0), coalesce(max(s1), -32768)) AS INT) AS v_max
        |FROM smp GROUP BY doc_id""".stripMargin,

    // WAV feature twin (Multimodal.wavFeatures): zero-crossings count sign
    // flips between consecutive frames per channel (lag window); energy is
    // Σs² — all exact integers from the sample formula. Mono docs have no
    // channel 1: its zero-sum CASE and coalesced energy pin 0, matching
    // the decode stage's zeroed stereo slots.
    "mm_wav_features" ->
      """WITH wd AS (
        |  SELECT doc_id, 1 + doc_id % 2 AS nch, 64 + doc_id % 33 AS nf
        |  FROM documents
        |), fr AS (
        |  SELECT doc_id, nch, nf, unnest(range(0, nf)) AS i FROM wd
        |), smp AS (
        |  SELECT doc_id, nch, nf, i,
        |         (doc_id * 31 + i * 7) % 65536 - 32768 AS s0,
        |         CASE WHEN nch = 2
        |              THEN (doc_id * 31 + i * 7 + 13) % 65536 - 32768
        |         END AS s1
        |  FROM fr
        |), lagged AS (
        |  SELECT doc_id, nf, s0, s1,
        |         lag(s0) OVER (PARTITION BY doc_id ORDER BY i) AS p0,
        |         lag(s1) OVER (PARTITION BY doc_id ORDER BY i) AS p1
        |  FROM smp
        |)
        |SELECT doc_id AS media_id, TRUE AS decoded,
        |       CAST(max(nf) AS BIGINT) AS n_frames,
        |       CAST(sum(CASE WHEN p0 IS NOT NULL AND (p0 < 0) <> (s0 < 0)
        |                     THEN 1 ELSE 0 END) AS BIGINT)
        |         AS ch0_zero_crossings,
        |       CAST(sum(CASE WHEN p1 IS NOT NULL AND (p1 < 0) <> (s1 < 0)
        |                     THEN 1 ELSE 0 END) AS BIGINT)
        |         AS ch1_zero_crossings,
        |       CAST(sum(s0 * s0) AS BIGINT) AS ch0_energy,
        |       CAST(coalesce(sum(s1 * s1), 0) AS BIGINT) AS ch1_energy
        |FROM lagged GROUP BY doc_id""".stripMargin,

    // Audio-gate twin (Multimodal.wavGate): exact integer counters from
    // the sample formula, double division + 6-dp rounds staged exactly as
    // the engine stages them, thresholds as DOUBLE casts so boundary
    // comparisons agree bit-for-bit.
    "mm_wav_gate" ->
      s"""WITH wd AS (
         |  SELECT doc_id, 1 + doc_id % 2 AS nch, 64 + doc_id % 33 AS nf
         |  FROM documents
         |), fr AS (
         |  SELECT doc_id, nch, nf, unnest(range(0, nf)) AS i FROM wd
         |), smp AS (
         |  SELECT doc_id, nch, nf,
         |         (doc_id * 31 + i * 7) % 65536 - 32768 AS s0,
         |         CASE WHEN nch = 2
         |              THEN (doc_id * 31 + i * 7 + 13) % 65536 - 32768
         |         END AS s1
         |  FROM fr
         |), wagg AS (
         |  SELECT doc_id, max(nch) AS nch, max(nf) AS nf,
         |         sum(s0 * s0) AS sq0, coalesce(sum(s1 * s1), 0) AS sq1,
         |         max(abs(s0)) AS peak0, coalesce(max(abs(s1)), 0) AS peak1,
         |         sum(CASE WHEN abs(s0) < ${Multimodal.SilenceAmp}
         |               THEN 1 ELSE 0 END)
         |           + sum(CASE WHEN abs(s1) < ${Multimodal.SilenceAmp}
         |               THEN 1 ELSE 0 END) AS silent,
         |         sum(CASE WHEN s0 IN (32767, -32768) THEN 1 ELSE 0 END)
         |           + sum(CASE WHEN s1 IN (32767, -32768) THEN 1 ELSE 0 END)
         |           AS clipped
         |  FROM smp GROUP BY doc_id
         |), wg AS (
         |  SELECT doc_id, nch, nf,
         |         round(sqrt(sq0 / nf), 6) AS ch0_rms,
         |         round(sqrt(sq1 / nf), 6) AS ch1_rms,
         |         peak0, peak1,
         |         round(silent / (nf * nch), 6) AS silence_share,
         |         round(clipped / (nf * nch), 6) AS clipped_share
         |  FROM wagg
         |), wb AS (
         |  SELECT *,
         |         (ch0_rms >= CAST(${Multimodal.LevelMinRms} AS DOUBLE)
         |           AND (nch < 2
         |             OR ch1_rms >= CAST(${Multimodal.LevelMinRms} AS DOUBLE)))
         |           AS pass_level,
         |         (silence_share <= CAST(${Multimodal.SilenceMaxShare}
         |            AS DOUBLE)) AS pass_silence,
         |         (clipped_share <= CAST(${Multimodal.ClipMaxShare}
         |            AS DOUBLE)) AS pass_clip
         |  FROM wg
         |)
         |SELECT doc_id AS media_id, TRUE AS decoded,
         |       CAST(nch AS INT) AS n_channels, CAST(nf AS BIGINT) AS n_frames,
         |       ch0_rms, ch1_rms,
         |       CAST(peak0 AS INT) AS ch0_peak, CAST(peak1 AS INT) AS ch1_peak,
         |       silence_share, clipped_share,
         |       pass_level, pass_silence, pass_clip,
         |       (pass_level AND pass_silence AND pass_clip) AS pass
         |FROM wb""".stripMargin,

    // Image-gate twin (Multimodal.imageGate): same thresholds from the
    // shared constants, aspect as the same integer cross-multiplication,
    // exposure compared at the same rounded mean — all re-derived from
    // the pixel formula; PNG losslessness makes the match exact.
    "mm_image_gate" -> {
      val m = Multimodal
      s"""WITH $pngPixelCtesSql, ist AS (
         |  SELECT doc_id, max(w) AS w, max(h) AS h,
         |         sum(r) + sum(g) + sum(b) AS rgb,
         |         max(w) * max(h) AS n
         |  FROM ch GROUP BY doc_id
         |), ig AS (
         |  SELECT doc_id,
         |         CAST(w AS INT) AS width_px, CAST(h AS INT) AS height_px,
         |         round(rgb / (3.0 * greatest(n, 1)), 6) AS rgb_mean,
         |         (w >= ${m.ImgMinSide} AND h >= ${m.ImgMinSide}) AS ok_dims,
         |         (${m.ImgAspectDen} * greatest(w, h)
         |            <= ${m.ImgAspectNum} * least(w, h)) AS ok_aspect
         |  FROM ist
         |)
         |SELECT doc_id AS media_id, TRUE AS decoded,
         |       width_px, height_px, rgb_mean, ok_dims, ok_aspect,
         |       (rgb_mean >= ${m.ImgMeanMin} AND rgb_mean <= ${m.ImgMeanMax})
         |         AS ok_exposure,
         |       (ok_dims AND ok_aspect
         |        AND rgb_mean >= ${m.ImgMeanMin}
         |        AND rgb_mean <= ${m.ImgMeanMax}) AS pass
         |FROM ig""".stripMargin
    },

    // JPEG contract twin (Multimodal.jpegDecodeContract): the lossy
    // round-trip pins container dims + pixel count exactly and the
    // channel-mean drift as booleans the oracle fixes at TRUE — the same
    // bounded-error-contract shape as the sketch audits.
    "mm_jpeg_decode" ->
      """SELECT doc_id AS media_id, TRUE AS decoded,
        |       CAST(8 + doc_id % 9 AS INT) AS width_px,
        |       CAST(8 + (doc_id // 9) % 9 AS INT) AS height_px,
        |       CAST((8 + doc_id % 9) * (8 + (doc_id // 9) % 9) AS BIGINT)
        |         AS n_px,
        |       TRUE AS r_ok, TRUE AS g_ok, TRUE AS b_ok
        |FROM documents""".stripMargin,

    // Multi-frame container twin (Multimodal.decodeGifFrameStats): the
    // indexed-gray GIF is lossless, so the per-frame decoded stats equal
    // the closed-form gray formula re-derived over the (frame, x, y)
    // grid — the oracle never sees a byte; a hash match proves genuine
    // animated GIFs round-tripped frame by frame.
    "mm_gif_frames" ->
      """WITH gd AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 9) % 9 AS h,
        |         2 + doc_id % 4 AS nf
        |  FROM documents
        |), gf AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS f FROM gd),
        |gx AS (SELECT doc_id, w, h, f, unnest(range(0, w)) AS x FROM gf),
        |gp AS (SELECT doc_id, w, h, f, x, unnest(range(0, h)) AS y FROM gx),
        |gv AS (
        |  SELECT doc_id, w, h, f,
        |         (doc_id * 31 + f * 41 + x * 7 + y * 13) % 256 AS v
        |  FROM gp
        |)
        |SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
        |       TRUE AS decoded,
        |       CAST(max(w) AS INT) AS width_px,
        |       CAST(max(h) AS INT) AS height_px,
        |       CAST(max(w) * max(h) AS BIGINT) AS n_px,
        |       CAST(sum(v) AS BIGINT) AS gray_sum,
        |       CAST(min(v) AS INT) AS gray_min,
        |       CAST(max(v) AS INT) AS gray_max
        |FROM gv GROUP BY doc_id, f""".stripMargin,

    // Perceptual-hash twin (Multimodal.phash): both 60-bit hashes
    // re-derived from the pixel formula alone — a hash match proves the
    // Spark side sampled REAL decoded pixels at the same grid points.
    "mm_phash" ->
      s"""WITH $phashCtesSql
         |SELECT pd.doc_id AS media_id, TRUE AS decoded, ahash, dhash
         |FROM pd JOIN ah ON ah.doc_id = pd.doc_id
         |JOIN dh ON dh.doc_id = pd.doc_id""".stripMargin,

    // Image near-dup pairs twin: the aHash through the SAME 4×15-bit
    // band join + exact bit_count verify as dedup_simhash_pairs.
    "mm_phash_pairs" ->
      s"""WITH $phashCtesSql, pbands AS (
         |  SELECT doc_id, ahash, b.band AS band,
         |         (ahash >> CAST(b.band * 15 AS INT)) & 32767 AS bv
         |  FROM ah, (SELECT unnest(range(0, 4)) AS band) b
         |), ppairs AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM pbands a
         |  JOIN pbands b ON a.band = b.band AND a.bv = b.bv
         |              AND a.doc_id < b.doc_id
         |)
         |SELECT p.a_id, p.b_id,
         |       CAST(bit_count(xor(sa.ahash, sb.ahash)) AS INT) AS hamming
         |FROM ppairs p
         |JOIN ah sa ON sa.doc_id = p.a_id
         |JOIN ah sb ON sb.doc_id = p.b_id
         |WHERE bit_count(xor(sa.ahash, sb.ahash)) <= 8""".stripMargin,

    // Image-cluster twin: the mm_phash_pairs CTEs + the recursive-CTE
    // components the text/embedding cluster oracles use.
    "mm_phash_clusters" ->
      s"""WITH RECURSIVE $phashCtesSql, pbands AS (
         |  SELECT doc_id, ahash, b.band AS band,
         |         (ahash >> CAST(b.band * 15 AS INT)) & 32767 AS bv
         |  FROM ah, (SELECT unnest(range(0, 4)) AS band) b
         |), ppairs AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM pbands a
         |  JOIN pbands b ON a.band = b.band AND a.bv = b.bv
         |              AND a.doc_id < b.doc_id
         |), pverified AS (
         |  SELECT p.a_id, p.b_id
         |  FROM ppairs p
         |  JOIN ah sa ON sa.doc_id = p.a_id
         |  JOIN ah sb ON sb.doc_id = p.b_id
         |  WHERE bit_count(xor(sa.ahash, sb.ahash)) <= 8
         |), pedges AS (
         |  SELECT a_id, b_id FROM pverified
         |  UNION ALL
         |  SELECT b_id, a_id FROM pverified
         |), preach(media_id, label) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a_id, r.label FROM pedges e JOIN preach r
         |    ON r.media_id = e.b_id
         |)
         |SELECT media_id, min(label) AS cluster_id
         |FROM preach GROUP BY media_id""".stripMargin,

    // Motion twin: consecutive-frame |delta| re-derived from the gray
    // formula over the (frame-pair, x, y) grid - lossless round-trip
    // makes the match exact.
    "mm_gif_motion" ->
      """WITH md AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 9) % 9 AS h,
        |         2 + doc_id % 4 AS nf
        |  FROM documents
        |), mf AS (SELECT doc_id, w, h, nf,
        |                 unnest(range(0, nf - 1)) AS f FROM md),
        |mx AS (SELECT doc_id, w, h, nf, f, unnest(range(0, w)) AS x FROM mf),
        |mp AS (SELECT doc_id, w, h, nf, f, x, unnest(range(0, h)) AS y
        |       FROM mx),
        |mv AS (
        |  SELECT doc_id, nf,
        |         abs(((doc_id * 31 + (f + 1) * 41 + x * 7 + y * 13) % 256)
        |           - ((doc_id * 31 + f * 41 + x * 7 + y * 13) % 256)) AS dv
        |  FROM mp
        |)
        |SELECT doc_id AS media_id, TRUE AS decoded,
        |       CAST(max(nf) AS INT) AS n_frames,
        |       CAST(sum(dv) AS BIGINT) AS delta_sum,
        |       CAST(count(*) AS BIGINT) AS n_deltas,
        |       round(CAST(sum(dv) AS DOUBLE)
        |             / greatest(count(*), 1), 6) AS mean_abs_delta
        |FROM mv GROUP BY doc_id""".stripMargin,

    // FixedSizeFrameSampler twin: byte windows sliced on the hex string
    // (2 chars/byte — DuckDB has no BLOB substring and a frame need not be
    // valid UTF-8, so frames are compared as uppercase hex on both sides).
    "mm_frames" ->
      s"""WITH b AS (
         |  SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
         |         octet_length(encode(coalesce(text, ''))) AS n
         |  FROM documents
         |), fr AS (
         |  SELECT doc_id, hx,
         |         unnest(list_filter(range(0, CAST(ceil(n / $FrameBytes.0) AS BIGINT)),
         |           i -> i % $FrameEveryN = 0)) AS grp
         |  FROM b
         |)
         |SELECT doc_id AS media_id,
         |       CAST(grp // $FrameEveryN AS INT) AS frame_idx,
         |       CAST(octet_length(unhex(substr(hx, CAST(grp*${2 * FrameBytes}+1 AS INT), ${2 * FrameBytes}))) AS INT)
         |         AS frame_bytes,
         |       substr(hx, CAST(grp*${2 * FrameBytes}+1 AS INT), ${2 * FrameBytes}) AS frame_hex
         |FROM fr""".stripMargin
  )
}
