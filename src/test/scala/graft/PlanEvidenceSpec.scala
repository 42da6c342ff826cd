package graft

/** Physical-plan evidence for the scale story: filters reach the parquet
  * scan and unused columns never leave it. These queries are the ones the
  * driver benches — a regression that blocks pushdown or pruning (a stray
  * barrier, a select *, a non-deterministic wrapper too early) fails here
  * long before it shows up as a 100 TB scan reading every byte.
  */
class PlanEvidenceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def scanLine(q: String): String = {
    val plan = SparkEntry.queries(q)(spark, dir)
      .queryExecution.executedPlan.toString
    plan.linesIterator.find(_.contains("FileScan parquet"))
      .getOrElse(fail(s"no FileScan in $q plan"))
  }

  test("filter_predicates: predicates pushed into the lineitem scan, columns pruned") {
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    val scan = scanLine("filter_predicates")
    // The compound predicate reached the scan...
    assert(scan.contains("DataFilters: [isnotnull(l_returnflag"))
    assert(scan.contains("l_quantity") && scan.contains("l_discount"))
    // ...and the 6 untouched lineitem columns never leave the reader.
    for (c <- Seq("l_extendedprice", "l_tax", "l_shipdate", "l_partkey"))
      assert(!scan.contains(c), s"unused column $c not pruned from scan")
  }

  test("agg_sensor_stats: events scan reads only the aggregated columns") {
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val scan = scanLine("agg_sensor_stats")
    assert(scan.contains("ts#") && scan.contains("value"))
    // event_id and the wide props map stay in the file.
    for (c <- Seq("event_id", "props"))
      assert(!scan.contains(c), s"unused column $c not pruned from scan")
  }

  test("text queries: documents scan is (doc_id, text) and nothing more") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val scan = scanLine("text_token_counts")
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
    // The ULM Viterbi encodes are the same shape: one pruned scan, the
    // kernel in the projection, no operator shuffle.
    for (q <- Seq("text_ulm_tokens", "text_ulm_pieces")) {
      val s2 = scanLine(q)
      assert(s2.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
        s"$q scan reads more than (doc_id, text): $s2")
    }
  }

  test("corpus_split_leakage: every operator exchange carries hashes, not text") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    // The leakage screen reduces grams to xxhash64 IN the scan projection;
    // any Exchange hash-partitioned on a string column would mean gram or
    // document text entered a shuffle.
    val plan = SparkEntry.queries("corpus_split_leakage")(spark, dir)
      .queryExecution.executedPlan.toString
    val badExchange = plan.linesIterator.filter(_.contains("hashpartitioning"))
      .exists(l => l.contains("text#") || l.contains("gs#") || l.contains(", string"))
    assert(!badExchange, s"leakage shuffles text/gram strings:\n$plan")
  }

  test("corpus_split / corpus_shuffle: scans read ONLY doc_id — text never leaves the file") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    // Pure id-hash operators: at 100 TB the difference between reading a
    // bigint column and reading the documents is the whole game.
    for (q <- Seq("corpus_split", "corpus_shuffle")) {
      val scan = scanLine(q)
      assert(scan.contains("ReadSchema: struct<doc_id:bigint>"),
        s"$q scan reads more than doc_id: $scan")
    }
  }

  test("corpus_shuffle: exactly one exchange — the per-shard rank shuffle") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    // Over a raw scan (StandIn adds a round-robin repartition to spread
    // the tiny fixture, which is harness, not operator): the only shuffle
    // the operator itself needs is the hash exchange feeding the window.
    val plan = graft.ops.Curation.shuffleShards(
      spark.read.parquet(s"$dir/documents.parquet"), 16)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1, s"expected 1 shuffle, saw $exchanges:\n$plan")
  }

  test("olap_pricing: shipdate predicate pushed, key columns pruned from scan") {
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    val scan = scanLine("olap_pricing")
    // The cutoff reaches the parquet reader (row-group pruning at scale)...
    assert(scan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"shipdate filter not pushed:\n$scan")
    assert(scan.contains("LessThanOrEqual(l_shipdate"),
      s"shipdate cutoff not pushed:\n$scan")
    // ...and join keys / unused columns never leave the file.
    for (c <- Seq("l_orderkey", "l_partkey", "l_suppkey"))
      assert(!scan.contains(c), s"unused column $c not pruned from scan")
  }

  test("join_revenue_nation: dims broadcast, facts hash-join, no cartesian") {
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    val plan = SparkEntry.queries("join_revenue_nation")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dims must broadcast:\n$plan")
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      s"no product joins allowed:\n$plan")
    // The region filter prunes inside the dimension scan, not post-join.
    assert(plan.contains("r_name"), plan)
  }

  test("window_topn: the rank predicate pushes into the window as a group limit") {
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val plan = SparkEntry.queries("window_topn")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rnk<=n must run as a running per-key top-N:\n$plan")
  }

  test("bucketed tables co-locate: the fact-fact join plans ZERO exchanges") {
    import spark.implicits._
    // The 100 TB co-location story: two tables bucketed on the join key
    // into the same bucket count join WITHOUT any shuffle — the bucket
    // layout IS the exchange, paid once at write time and amortized over
    // every subsequent join. Broadcast is disabled so the test can't pass
    // by broadcasting the small fixture.
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thresholdKey)
    spark.conf.set(thresholdKey, "-1")
    try {
      (1 to 100).map(i => (i.toLong, s"a$i")).toDF("k", "va")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bkt_a")
      (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bkt_b")
      val q = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      assert(q.count() === 100L)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join over bucketed scans:\n$plan")
    } finally {
      spark.conf.set(thresholdKey, prev)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("join_full_outer: both sides aggregate before the join, never fact-to-fact") {
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val plan = SparkEntry.queries("join_full_outer")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"must plan a full outer join:\n$plan")
    // Two partial+final aggregate pairs feed the join — the events table
    // itself never meets itself.
    val aggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 4, s"both sides must pre-aggregate ($aggs aggs):\n$plan")
    assert(!plan.contains("Cartesian"), s"no product join:\n$plan")
  }

  test("round-8 queries: scans read only the columns they aggregate") {
    assume(new java.io.File(s"$dir/events.parquet").exists())
    // Histogram touches ONE column; retention two; zscore three + the id.
    // A regression that drags props (the wide column) or event_id into
    // these scans multiplies the 100 TB read volume for nothing.
    val histogram = scanLine("olap_histogram")
    assert(histogram.contains("ReadSchema: struct<value:double>"),
      s"histogram must scan value only: $histogram")
    val retention = scanLine("olap_retention")
    assert(retention.contains("ts#") && retention.contains("user_id"))
    for (c <- Seq("event_id", "props", "value"))
      assert(!retention.contains(c), s"retention scan reads $c: $retention")
    val zscore = scanLine("stat_zscore")
    for (c <- Seq("props", "user_id"))
      assert(!zscore.contains(c), s"zscore scan reads $c: $zscore")
    val resample = scanLine("ts_resample_ffill")
    for (c <- Seq("event_id", "props", "event_type"))
      assert(!resample.contains(c), s"resample scan reads $c: $resample")
    val normalize = scanLine("text_normalize")
    assert(normalize.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"normalize must scan (doc_id, text) only: $normalize")
  }

  test("round-9 queries: cross-side candidates join on buckets, never a product") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    for (q <- Seq("dedup_incremental", "sim_neardup_clusters")) {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      for (bad <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
        assert(!plan.contains(bad), s"$q plans a $bad:\n$plan")
    }
    // The snapshot split predicates reach both documents scans.
    val plan = SparkEntry.queries("dedup_incremental")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("% 5)"),
      s"snapshot split predicate not pushed into a scan:\n$plan")
  }

  test("dedup_substring_spans: shingle-hash equi-join, never a product; text dies at the map stage") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val plan = SparkEntry.queries("dedup_substring_spans")(spark, dir)
      .queryExecution.executedPlan.toString
    for (bad <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!plan.contains(bad), s"substring spans plan a $bad:\n$plan")
    // Only (doc_id, text) leave the scan — and text never reaches an
    // exchange: the shuffles carry (doc_id, off, h) / island keys only.
    val scan = plan.linesIterator
      .find(l => l.contains("ReadSchema") && l.contains("documents"))
      .getOrElse(plan.linesIterator.find(_.contains("ReadSchema")).get)
    assert(scan.contains("doc_id") && scan.contains("text"), scan)
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty && exchanges.forall(!_.contains("text#")),
      s"document text crosses a shuffle:\n${exchanges.mkString("\n")}")
  }

  test("dedup_max_spans: diagonal pair join stays equi, text never crosses an exchange") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val plan = SparkEntry.queries("dedup_max_spans")(spark, dir)
      .queryExecution.executedPlan.toString
    for (bad <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!plan.contains(bad), s"max spans plan a $bad:\n$plan")
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty && exchanges.forall(!_.contains("text#")),
      s"document text crosses a shuffle:\n${exchanges.mkString("\n")}")
  }

  test("BPE encode/count: shuffle-free projection, kernel inside whole-stage codegen") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    // Over a raw scan (no StandIn fan-out): encoding is a pure per-row
    // kernel — at 100 TB it must plan as scan → project, nothing else.
    val raw = spark.read.parquet(s"$dir/documents.parquet")
    for (df <- Seq(graft.ops.Bpe.tokenCounts(raw),
                   graft.ops.Bpe.encodeSymbols(raw))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"BPE projection shuffles:\n$plan")
      // Codegen stages print as `*(n) Project ...` in executedPlan toString.
      assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
        s"BPE kernel fell out of codegen:\n$plan")
      val scan = plan.linesIterator.find(_.contains("ReadSchema"))
        .getOrElse(fail(s"no scan in plan:\n$plan"))
      assert(scan.contains("doc_id") && scan.contains("text"), scan)
    }
    // packByBpe adds exactly the per-bucket window sort — ONE exchange,
    // carrying (doc_id, bucket, count) scalars, never the text.
    val pack = graft.ops.Bpe.packByBpe(raw).queryExecution.executedPlan.toString
    val exchanges = pack.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.size == 1 && !exchanges.head.contains("text#"),
      s"packByBpe exchanges:\n${exchanges.mkString("\n")}")
    // chunkByBpe runs the whole chunker inside the row: scan → project →
    // explode, ZERO shuffles — the window-over-exploded-words shape would
    // shuffle every word of a 100 TB corpus.
    val chunk = graft.ops.Bpe.chunkByBpe(raw).queryExecution.executedPlan.toString
    assert(!chunk.contains("Exchange"), s"chunkByBpe shuffles:\n$chunk")
    assert(!chunk.contains("Window"), s"chunkByBpe plans a window:\n$chunk")
  }

  test("decontaminate_bloom: bench-side scan carries the pushed benchmark predicate") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val plan = SparkEntry.queries("decontaminate_bloom")(spark, dir)
      .queryExecution.executedPlan.toString
    // The bloom build reads ONLY benchmark rows: the doc_id % 10 = 0
    // predicate must appear as a pushed data filter on some documents scan.
    assert(plan.contains("(doc_id#") && plan.contains("% 10)"),
      s"benchmark predicate not pushed into a scan:\n$plan")
  }

  test("corpus_sample_grouped: the rank cutoff runs as a per-stratum group limit") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val plan = SparkEntry.queries("corpus_sample_grouped")(spark, dir)
      .queryExecution.executedPlan.toString
    // WindowGroupLimit = each map task keeps a k-sized heap per stratum
    // BEFORE the shuffle; the exchange carries ≤ k·partitions rows per
    // stratum, never the corpus.
    assert(plan.contains("WindowGroupLimit"),
      s"sample_rank<=k must run as a running per-stratum top-k:\n$plan")
  }

  test("corpus_cap_source: the per-source cap runs as a group limit") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val plan = SparkEntry.queries("corpus_cap_source")(spark, dir)
      .queryExecution.executedPlan.toString
    // Same contract as sampleGrouped: cap_rank<=cap must compile to
    // WindowGroupLimit so a mega-domain's overflow dies in the map task,
    // and the text column must never be selected at all.
    assert(plan.contains("WindowGroupLimit"),
      s"cap_rank<=cap must run as a running per-source top-k:\n$plan")
    assert(!plan.contains("text#"),
      s"document text must not enter the cap plan:\n$plan")
  }

  test("corpus_source_mix: one corpus scan, top-5 is TakeOrdered") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val df = SparkEntry.queries("corpus_source_mix")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // The corpus is touched once (the materialized per-source counts
    // serve every downstream consumer) and the top-5 draw is a
    // distributed top-k, not a global sort.
    assert(plan.linesIterator.count(_.contains("FileScan parquet")) <= 1,
      s"source mix must scan the corpus at most once:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-5 sources must plan a distributed top-k:\n$plan")
  }

  test("corpus_sample_weighted: global top-k is TakeOrdered, no sort, no window") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val plan = SparkEntry.queries("corpus_sample_weighted")(spark, dir)
      .queryExecution.executedPlan.toString
    // Per-partition k-heaps + one k-row driver merge; a global Sort or a
    // single-partition Window here would funnel the corpus through one
    // task at 100 TB.
    assert(plan.contains("TakeOrderedAndProject"),
      s"weighted sample must plan a distributed top-k:\n$plan")
    assert(!plan.linesIterator.exists(l =>
      l.trim.startsWith("+- Sort") || l.trim.startsWith("Sort")),
      s"no global sort allowed:\n$plan")
  }

  test("dedup_lines: hashes shuffle, dup set broadcasts, no line text in any Exchange") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val plan = SparkEntry.queries("dedup_lines")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"product join:\n$plan")
    // The dup-line set reaches the rebuild as a 1-row broadcast …
    assert(plan.contains("BroadcastExchange"),
      s"dup set must broadcast:\n$plan")
    // … and every shuffle carries hashes/counts only — neither the wrapped
    // text nor an exploded line string ever crosses an Exchange.
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty && exchanges.forall(l =>
      !l.contains("text#") && !l.contains("line#")),
      s"line text crosses a shuffle:\n${exchanges.mkString("\n")}")
  }

  test("dedup_incremental safety net: AQE skew-join split FIRES on a degenerate hot bucket") {
    import spark.implicits._
    // crossCorpusCandidates deliberately does not salt (salting would
    // decorrelate the two sides — Dedup scaladoc); its stated fallback
    // for an unsalted hot bucket is AQE's runtime skew split. This is the
    // runtime evidence: a corpus where EVERY doc shares one (band, bucket)
    // key, so the bucket join is maximally skewed, must come back from
    // execution with the skew split marked in the final adaptive plan.
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val newDocs = (0L until 300L).map(i => (i, text)).toDF("doc_id", "text")
    val refDocs = (1000L until 1300L).map(i => (i, text)).toDF("doc_id", "text")
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // Fixture-sized thresholds: the production defaults (256 MB) only
      // trip on real skew; the mechanism under test is identical.
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val cands = graft.ops.Dedup.crossCorpusCandidates(
        newDocs, refDocs, k = 16, bands = 4, threshold = 0.5)
      // Execute THIS frame (count() would build a separate query tree and
      // leave cands' adaptive plan unfinalized), then read the final plan.
      assert(cands.collect().length === 300 * 300)
      val finalPlan = cands.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true") || finalPlan.contains("skewed"),
        s"AQE skew split did not fire on the degenerate bucket:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dsir: bucket histograms broadcast onto the token stream; selection is TakeOrdered") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val weights = SparkEntry.queries("text_dsir_weights")(spark, dir)
      .queryExecution.executedPlan.toString
    // The ≤4096-row distribution table must reach the token stream as a
    // broadcast — a shuffle join here would re-partition the whole
    // corpus token stream by bucket at 100 TB.
    assert(weights.contains("BroadcastHashJoin"),
      s"bucket histograms must broadcast:\n$weights")
    assert(!weights.contains("CartesianProduct"), weights)
    // One-pass histogram shape: the scoring DAG scans documents exactly
    // twice (doc_id spine + token stream). Before the conditional-sum
    // rewrite the raw/target/totals subtrees each replayed the token
    // explode — 6 scans in this plan.
    val scans = weights.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans === 2,
      s"expected doc_id spine + token stream only, saw $scans scans:\n$weights")
    val select = SparkEntry.queries("corpus_select_dsir")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(select.contains("TakeOrderedAndProject"),
      s"DSIR selection must plan a distributed top-k:\n$select")
  }

  test("dedup_semantic: (cell, bucket) equi-join, no all-pairs product") {
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    for (q <- Seq("dedup_semantic", "dedup_semantic_trained")) {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$q must stay a cell equi-join:\n$plan")
    }
  }

  test("mm_phash_pairs: banded equi-join, no all-pairs product") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val plan = SparkEntry.queries("mm_phash_pairs")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"image near-dup pairs must stay a band equi-join:\n$plan")
  }

  test("mm_phash_band_audit: clique join keys on (bv, seg) — a sampled " +
      "bucket's pairs spread over PhashAuditSegments tasks, not one") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    // r18 verdict finding 2: the audit's self-join on bv alone put each
    // sampled bucket's whole C(n,2) clique on ONE shuffle key (~40M
    // pairs/bucket at sf10, ~4B a decade later). The r19 shape segments
    // the left side on a_id % S and replicates the right side per
    // segment; the join's partitioning must therefore hash BOTH bv and
    // seg. Asserted on the pre-AQE plan string: the SortMergeJoin /
    // ShuffledHashJoin keys include seg.
    // Keys, not physical strategy: at fixture scale the tiny sigs frame
    // broadcasts (BroadcastHashJoin); at sf10 it shuffles. Either way
    // the EQUI-JOIN KEYS decide how a bucket's clique parallelizes once
    // the shuffle path engages, so the pin is on the keys.
    // sparkPlan, not executedPlan: AQE's AdaptiveSparkPlanExec hides its
    // inner tree from collect until execution.
    val qe = SparkEntry.queries("mm_phash_band_audit")(spark, dir)
      .queryExecution
    val joins = qe.sparkPlan.collectWithSubqueries {
      case j: org.apache.spark.sql.execution.joins.HashJoin =>
        j.leftKeys.map(_.sql).mkString(",")
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        j.leftKeys.map(_.sql).mkString(",")
    }
    assert(joins.exists(k => k.contains("bv") && k.contains("seg")),
      "the clique join must key on (bv, seg) — single-key bucket join " +
        s"regressed; equi-join keys seen: $joins")
  }

  test("stat_chisquare: ONE fact scan — marginals derive from the cell table") {
    assume(new java.io.File(s"$dir/events.parquet").exists())
    for (q <- Seq("stat_chisquare", "stat_cramers_v")) {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
      assert(scans === 1,
        s"$q must scan the facts exactly once, saw $scans:\n$plan")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$q plans a product join:\n$plan")
    }
    // The scan reads only the two analyzed columns.
    val scan = scanLine("stat_chisquare")
    for (c <- Seq("event_id", "props", "user_id", "value"))
      assert(!scan.contains(c), s"chisquare scan reads $c: $scan")
  }

  test("rule reports (gopher/c4/entropy): zero-Exchange projections over one scan") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    // The whole point of a fixed-alphabet / per-doc rule design: every
    // report runs at scan speed — no shuffle ever touches the documents.
    for (q <- Seq("text_gopher_rules", "text_c4_filters", "text_char_entropy")) {
      val p = (q match {
        case "text_gopher_rules" => graft.ops.TextRules.gopherReport(
          spark.read.parquet(s"$dir/documents.parquet"))
        case "text_c4_filters" => graft.ops.TextRules.c4Filters(
          graft.ops.Dedup.wrapTokenLines(
            spark.read.parquet(s"$dir/documents.parquet")))
        case _ => graft.ops.TextRules.charEntropy(
          spark.read.parquet(s"$dir/documents.parquet"))
      }).queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"$q shuffles:\n$p")
      assert(p.linesIterator.count(_.contains("FileScan parquet")) === 1,
        s"$q must scan documents exactly once:\n$p")
    }
  }

  test("dedup_incremental_exact: Bloom probe gates the new side inside codegen; no text in wide plan") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val plan = SparkEntry.queries("dedup_incremental_exact")(spark, dir)
      .queryExecution.executedPlan.toString
    // The native might_contain literal probes map-side BEFORE any join —
    // at scale the new snapshot drops to its candidate sliver pre-shuffle.
    assert(plan.toLowerCase.contains("might_contain"),
      s"bloom prefilter missing from the new-side scan path:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"product join in the exact screen:\n$plan")
    // Only hashes and ids shuffle — document text never enters an Exchange.
    for (l <- plan.linesIterator if l.contains("Exchange hashpartitioning"))
      assert(!l.contains("text#"), s"text in a shuffle: $l")
  }

  test("join_interval_overlap: overlap runs as a bin equi-join, never a nested loop") {
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val plan = SparkEntry.queries("join_interval_overlap")(spark, dir)
      .queryExecution.executedPlan.toString
    // The inequality overlap predicate must ride a hash/merge equi-join
    // on the bin — the declarative BETWEEN formulation would plan the
    // per-pair nested loop this operator exists to avoid.
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"overlap join planned as a product:\n$plan")
    assert(plan.contains("__bin"),
      s"bin bucketing missing from the overlap join:\n$plan")
  }

  test("text_keywords: per-doc top-k runs as WindowGroupLimit") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val plan = SparkEntry.queries("text_keywords")(spark, dir)
      .queryExecution.executedPlan.toString
    // rnk <= k must push into the window exec: map tasks keep a k-heap
    // per doc, the exchange never carries the full (doc, term) table
    // a second time.
    assert(plan.contains("WindowGroupLimit"),
      s"keywords must plan a per-doc group limit:\n$plan")
  }

  test("new cell-table reports: ONE fact scan; windows run over bounded cells") {
    assume(new java.io.File(s"$dir/events.parquet").exists())
    // ks/wow/forecast: the running-CDF / lag windows must consume the
    // AGGREGATED cell table — a window over raw events would funnel the
    // fact table through sorts at 100 TB.
    for (q <- Seq("stat_ks_test", "olap_wow", "ts_forecast_eval")) {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
      // ≤ 1: a Materialize'd cell table (ks) ran its single corpus pass
      // eagerly, so the final DAG shows zero file scans; what the assert
      // forbids is a REPLAYED scan per consumer.
      assert(scans <= 1, s"$q replays the events scan, saw $scans:\n$plan")
      val lines = plan.linesIterator.toSeq
      val winIdx = lines.indexWhere(l =>
        l.contains("Window ") || l.trim.endsWith("Window"))
      assert(winIdx >= 0, s"$q plans no Window:\n$plan")
      // Below the window: the (aggregated or checkpointed) cell table,
      // never the raw fact scan.
      assert(!lines.drop(winIdx + 1).exists(_.contains("FileScan parquet")) ||
        lines.drop(winIdx + 1).exists(_.contains("HashAggregate")),
        s"$q window consumes the raw fact scan:\n$plan")
    }
  }

  test("stat_benford: the digit count runs once, not once per consumer") {
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val plan = SparkEntry.queries("stat_benford")(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans === 0, // materialized digit table: the single corpus
      // pass ran eagerly; any FileScan here is a replay.
      s"benford replays the events scan, saw $scans:\n$plan")
  }

  test("stat_ttest: both cohorts' six sums come off ONE events scan") {
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val plan = SparkEntry.queries("stat_ttest")(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans === 1,
      s"conditional aggregation must not scan per cohort, saw $scans:\n$plan")
  }

  test("stat_autocorr: all three lags share one scan and one window sort") {
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val plan = SparkEntry.queries("stat_autocorr")(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans === 1,
      s"lag shifts must not re-scan the facts, saw $scans:\n$plan")
    val windows = plan.linesIterator.count(_.contains(" Window ["))
    assert(windows === 1,
      s"the three lag columns must share ONE Window operator:\n$plan")
  }

  test("ts_resample_interp: grid generation rides the ffill shape — one scan, no join") {
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val plan = SparkEntry.queries("ts_resample_interp")(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans === 1, s"join-free fill must scan once, saw $scans:\n$plan")
    assert(!plan.contains("Join"),
      s"generate-based fill must not plan a grid join:\n$plan")
  }

  test("corpus_pipeline: two eager corpus passes, zero replayed scans") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    // The funnel's corpus reads are the two Materialize'd passes (fused
    // signal scan; keeper machinery) that ran eagerly when the frame was
    // built — the final DAG must consume ONLY checkpointed frames. Any
    // FileScan here means a stage re-reads the corpus per consumer.
    val plan = SparkEntry.queries("corpus_pipeline")(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans === 0,
      s"pipeline funnel replays a corpus scan, saw $scans:\n$plan")
  }

  test("text_quality_report: one fused corpus scan feeds the verdict histogram") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val plan = SparkEntry.queries("text_quality_report")(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans === 1,
      s"quality report must not re-scan per signal, saw $scans:\n$plan")
  }

  test("text_pmi_bigrams: top-k is TakeOrdered; unigrams computed once, not per consumer") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val plan = SparkEntry.queries("text_pmi_bigrams")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"PMI top-k must be a distributed TakeOrdered:\n$plan")
    // The only nested-loop join allowed is the 1-row n_total scalar (the
    // bounded crossJoin(broadcast) pattern); never a CartesianProduct.
    assert(!plan.contains("CartesianProduct"), s"PMI plans a product:\n$plan")
    // The unigram table feeds both joins AND the total: materialized once,
    // so the final DAG scans the corpus only for the pair stream — three
    // unigram replays would each re-scan + re-aggregate the corpus.
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans <= 1,
      s"PMI must not replay the corpus per unigram consumer, saw $scans scans:\n$plan")
  }

  test("dedup_containment: hash equi-join only; text never enters an Exchange") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val plan = SparkEntry.queries("dedup_containment")(spark, dir)
      .queryExecution.executedPlan.toString
    // Candidates come from the sampled-shingle-hash equi-join — the
    // whole point is that doc-in-doc detection never plans a product.
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"containment candidates planned as a product:\n$plan")
    // Exchanges carry ids and 30-bit hashes; the gram arrays attach from
    // the materialized shingle pass, raw text dies at its scan.
    for (l <- plan.linesIterator if l.contains("Exchange hashpartitioning"))
      assert(!l.contains("text#"), s"text in a shuffle: $l")
  }

  test("stat_psi: facts aggregate in ONE conditional pass; no shuffle by value key") {
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val plan = SparkEntry.queries("stat_psi")(spark, dir)
      .queryExecution.executedPlan.toString
    // The timeline bounds broadcast back to the facts — the corpus-scale
    // side must never hash-exchange on a data-dependent key.
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"psi bounds must broadcast back to the fact scan:\n$plan")
    // Two fact scans at most (bounds + binning); the bin/spine/total
    // folds run over the constant 20-row frame.
    val scans = plan.linesIterator
      .count(l => l.contains("FileScan parquet") && l.contains("events"))
    assert(scans <= 2,
      s"psi must not replay the fact table per consumer, saw $scans:\n$plan")
  }

  test("sim_centroid_drift: one corpus-scale aggregation, second fold over cells only") {
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val plan = SparkEntry.queries("sim_centroid_drift")(spark, dir)
      .queryExecution.executedPlan.toString
    // posexplode → partial-aggregated (cell, dim) groupBy: exactly one
    // scan of the embedding table feeds the whole report.
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1,
      s"centroid drift must read the corpus exactly once, saw $scans:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"centroid drift plans a product:\n$plan")
  }

  test("dedup_setsim_exact: prefix-filtered equi-join, never a product; " +
    "text stays out of every Exchange") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val plan = SparkEntry.queries("dedup_setsim_exact")(spark, dir)
      .queryExecution.executedPlan.toString
    // The whole point of AllPairs prefix filtering: EXACT output without
    // an all-pairs plan shape.
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"exact set-sim join planned as a product:\n$plan")
    for (l <- plan.linesIterator if l.contains("Exchange hashpartitioning"))
      assert(!l.contains("text#"), s"text in a shuffle: $l")
  }

  test("sim_sq8_topk: per-dim stats broadcast back; no product anywhere") {
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val plan = SparkEntry.queries("sim_sq8_topk")(spark, dir)
      .queryExecution.executedPlan.toString
    // The (mins, maxs) single row and the constant query draw are the
    // ONLY things that may cross a broadcast; the corpus never
    // hash-exchanges on a data key before the shortlist window.
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"sq8 bounds/queries must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"sq8 scan planned a Cartesian product:\n$plan")
  }

  test("olap_compaction_plan: one manifest aggregation, window per " +
    "part_key — metadata only, no second documents scan") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val plan = SparkEntry.queries("olap_compaction_plan")(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1,
      s"compaction planner must read the table once, saw $scans:\n$plan")
    // The bin cut is a per-part_key running sum — the window must
    // partition by part_key (parallel across partitions), never be a
    // single global sort.
    assert(plan.contains("windowspecdefinition(part_key"),
      s"compaction window not partitioned by part_key:\n$plan")
    // The text column feeds nothing: only n_chars and the grouping keys
    // may leave the scan.
    val scan = plan.linesIterator.find(_.contains("FileScan parquet")).get
    assert(!scan.contains("text"), s"manifest scan reads text: $scan")
  }

  test("corpus_split_cluster_safe: the split CASE is a projection on the " +
    "component label; text dies at the shingling pass") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val plan = SparkEntry.queries("corpus_split_cluster_safe")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"cluster-safe split planned a product:\n$plan")
    for (l <- plan.linesIterator if l.contains("Exchange hashpartitioning"))
      assert(!l.contains("text#"), s"text in a shuffle: $l")
  }

  test("cdc_compact_gc: bounds broadcast back, top-1 pushes to " +
    "WindowGroupLimit, one keyed Exchange") {
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val plan = SparkEntry.queries("cdc_compact_gc")(spark, dir)
      .queryExecution.executedPlan.toString
    // The watermark is one broadcast bounds row — the facts must never
    // hash-exchange for the cut.
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"GC watermark bounds must broadcast:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"rn=1 must push into the window exec:\n$plan")
    val keyed = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(keyed <= 1, s"compaction needs ONE keyed Exchange, saw $keyed")
  }

  test("corpus_length_buckets: one scan, token counts die in the " +
    "projection — no Exchange carries text") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val plan = SparkEntry.queries("corpus_length_buckets")(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1,
      s"length buckets must read the corpus once, saw $scans:\n$plan")
    for (l <- plan.linesIterator if l.contains("Exchange hashpartitioning"))
      assert(!l.contains("text#"), s"text in a shuffle: $l")
  }

  test("text_bm25_topk: query-term filter lands before the tf shuffle; " +
    "final k is TakeOrdered, not a global sort") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val df = SparkEntry.queries("text_bm25_topk")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"bm25 top-k must be a TakeOrdered, got:\n$plan")
    // The term IN (...) predicate must run map-side under the explode —
    // only matching (doc, term) rows may reach the tf Exchange. Evidence:
    // the filter sits in the plan and no Exchange carries the raw text.
    assert(plan.contains(" IN "), s"query-term filter missing:\n$plan")
    for (l <- plan.linesIterator if l.contains("Exchange hashpartitioning"))
      assert(!l.contains("text#"), s"text in a shuffle: $l")
  }
}
