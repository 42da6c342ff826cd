package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming set-similarity / containment screens vs their batch twins
  * (r15 verdict item 5): the streaming output over a MemoryStream feed
  * must equal the batch certifier over the same documents — the
  * batch-equivalence contract that makes the arrival-time screen
  * trustworthy (zero false negatives is inherited from the prefix
  * lemma; equality to the batch join checks zero false positives and
  * exact scores too).
  */
class StreamScreenSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  // Reference corpus: two strongly-overlapping docs and one unrelated.
  private val refDocs = Seq(
    (100L, "alpha beta gamma delta epsilon zeta eta theta"),
    (101L, "alpha beta gamma delta epsilon zeta eta iota"),
    (102L, "one two three four five six seven eight"))

  // Arrivals: d1 near-dups ref 100/101; d2 is half benchmark text (high
  // containment, sub-threshold jaccard vs the longer ref); d3 novel.
  private val arrivals = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta kappa", ts(0)),
    (2L, "alpha beta gamma delta epsilon lambda", ts(1)),
    (3L, "red green blue cyan magenta yellow black white", ts(2)))

  private def runStream(
      mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      name: String): Array[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val screened = mk(input.toDF().toDF("doc_id", "text", "event_time")
      .withWatermark("event_time", "10 minutes"))
    val q = screened.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // Two batches: the screen must behave identically across batch
      // boundaries (state only for the within-horizon pair dedup).
      input.addData(arrivals.take(2))
      q.processAllAvailable()
      input.addData(arrivals.drop(2))
      q.processAllAvailable()
      spark.table(name).collect()
    } finally q.stop()
  }

  test("streamingSetSimScreen equals the batch setSimJoinCross over the " +
    "same documents (scores included)") {
    val ref = refDocs.toDF("doc_id", "text")
    val got = runStream(
      s => Dedup.streamingSetSimScreen(s, ref, threshold = 0.5), "sss_sink")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Dedup.setSimJoinCross(
      arrivals.map(a => (a._1, a._2)).toDF("doc_id", "text"), ref,
      threshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.nonEmpty, "fixture must produce at least one pair")
    assert(got === want)
  }

  test("streamingContainmentScreen equals a brute-force containment " +
    "computation over the same documents") {
    val ref = refDocs.toDF("doc_id", "text")
    val tau = 0.5
    val got = runStream(
      s => Dedup.streamingContainmentScreen(s, ref, threshold = tau),
      "scs_sink")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // Brute force: every (arrival, ref) pair's |s∩r|/|s| over the SAME
    // shingle sets the engine uses, rounded the same way.
    def grams(docs: Seq[(Long, String)]): Map[Long, Set[String]] =
      Dedup.shingleSetsW(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val sg = grams(arrivals.map(a => (a._1, a._2)))
    val rg = grams(refDocs)
    val want = (for {
      (sid, s) <- sg.toSeq if s.nonEmpty
      (rid, r) <- rg.toSeq
      c = s.intersect(r).size.toDouble / s.size
      if c >= tau
    } yield (sid, rid,
      BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)).toSet
    assert(want.nonEmpty, "fixture must produce at least one containment")
    // d2 must be caught by containment (its jaccard vs ref 100 is below
    // the set-sim bar — the screen's reason to exist).
    assert(want.exists(_._1 == 2L))
    assert(got === want)
  }

  test("streamingSetSimScreen plan: static prefix index broadcast to the " +
    "stream side, no cartesian product, dedup state before the verify " +
    "join") {
    import org.apache.spark.sql.execution.streaming.runtime.{MemoryStream, StreamingQueryWrapper}
    val ref = refDocs.toDF("doc_id", "text")
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val q = Dedup.streamingSetSimScreen(
      input.toDF().toDF("doc_id", "text", "event_time")
        .withWatermark("event_time", "10 minutes"), ref, threshold = 0.5)
      .writeStream.format("noop").outputMode("append").start()
    try {
      input.addData(arrivals)
      q.processAllAvailable()
      val plan = q.asInstanceOf[StreamingQueryWrapper].streamingQuery
        .lastExecution.executedPlan.toString
      // The static reference sides (prefix index + verify grams) join the
      // stream as broadcasts at this size — the stream side never
      // shuffles to meet a static table...
      assert(plan.contains("BroadcastHashJoin"),
        s"static sides should broadcast:\n$plan")
      // ...nothing degenerates to a product...
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoop"),
        s"screen must stay equi-join only:\n$plan")
      // ...and the watermark-bounded pair dedup runs BEFORE the verify
      // join (dedup feeds the join, not the other way around), so each
      // candidate pair verifies once per horizon.
      val dedupIdx = plan.indexOf("StreamingDeduplicateWithinWatermark")
      assert(dedupIdx >= 0, s"expected streaming dedup operator:\n$plan")
      // Plan strings print root-first: the verify join consumes the
      // dedup's output, so it must sit ABOVE it (earlier in the string),
      // while the candidate prefix join sits below (later).
      assert(plan.indexOf("BroadcastHashJoin") < dedupIdx,
        s"verify join must consume the deduped pairs:\n$plan")
      assert(plan.lastIndexOf("BroadcastHashJoin") > dedupIdx,
        s"candidate prefix join must feed the dedup:\n$plan")
    } finally q.stop()
  }

  // Boilerplate flood (r16 verdict item 1): every ref doc carries the
  // same trailing block, so its grams exceed a df cap of 2 and route
  // through the HOT fallback arm. The capped screens must still equal
  // the uncapped batch certifiers — including the pure-boilerplate
  // arrival whose ENTIRE overlap is hot grams (the fallback's reason to
  // exist: no cold gram witnesses it).
  private val boiler = "please subscribe cookie banner terms apply"
  private val floodRefs = (0 until 10).map { i =>
    (200L + i, s"unique$i words about topic number $i entirely distinct $boiler")
  } :+ (299L, boiler)
  private val floodArrivals = Seq(
    (11L, s"unique1 words about topic number 1 entirely changed $boiler", ts(0)),
    (12L, boiler, ts(1)), // boilerplate-dominated: all-hot overlap
    (13L, "red green blue cyan magenta yellow black white", ts(2)))

  private def runFloodStream(
      mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      name: String): Set[(Long, Long, Double)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val q = mk(input.toDF().toDF("doc_id", "text", "event_time")
      .withWatermark("event_time", "10 minutes"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(floodArrivals.take(2))
      q.processAllAvailable()
      input.addData(floodArrivals.drop(2))
      q.processAllAvailable()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    } finally q.stop()
  }

  test("capped streamingSetSimScreen under a boilerplate flood equals the " +
    "uncapped batch certifier — incl. the all-hot-overlap pair via the " +
    "fallback arm") {
    val ref = floodRefs.toDF("doc_id", "text")
    val got = runFloodStream(
      s => Dedup.streamingSetSimScreen(s, ref, threshold = 0.5,
        maxDocsPerGram = 2), "sss_flood")
    val want = Dedup.setSimJoinCross(
      floodArrivals.map(a => (a._1, a._2)).toDF("doc_id", "text"), ref,
      threshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.exists(p => p._1 == 12L && p._2 == 299L),
      "fixture must contain an all-hot-overlap pair (12, 299)")
    assert(got === want)
  }

  test("capped streamingContainmentScreen under a boilerplate flood equals " +
    "brute force — the pure-boilerplate arrival is contained in EVERY " +
    "flooded ref via the fallback arm") {
    val ref = floodRefs.toDF("doc_id", "text")
    val tau = 0.5
    val got = runFloodStream(
      s => Dedup.streamingContainmentScreen(s, ref, threshold = tau,
        maxDocsPerGram = 2), "scs_flood")
    def grams(docs: Seq[(Long, String)]): Map[Long, Set[String]] =
      Dedup.shingleSetsW(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val sg = grams(floodArrivals.map(a => (a._1, a._2)))
    val rg = grams(floodRefs.map(r => (r._1, r._2)))
    val want = (for {
      (sid, s) <- sg.toSeq if s.nonEmpty
      (rid, r) <- rg.toSeq
      c = s.intersect(r).size.toDouble / s.size
      if c >= tau
    } yield (sid, rid,
      BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)).toSet
    // Arrival 12 is pure boilerplate: containment 1.0 in every ref that
    // carries the block — all its witnesses are HOT grams.
    assert(want.count(_._1 == 12L) === floodRefs.size)
    assert(got === want)
  }

  test("screens reject a threshold outside (0, 1] instead of silently " +
    "emitting nothing") {
    val ref = refDocs.toDF("doc_id", "text")
    val s = spark.range(0).select(col("id").alias("doc_id"),
      lit("x").alias("text"),
      lit(Timestamp.valueOf("2026-01-01 00:00:00")).alias("event_time"))
    intercept[IllegalArgumentException] {
      Dedup.streamingSetSimScreen(s, ref, threshold = 1.5)
    }
    intercept[IllegalArgumentException] {
      Dedup.streamingContainmentScreen(s, ref, threshold = 0.0)
    }
  }

  test("streaming screens emit a pair once per watermark horizon " +
    "(re-arrival inside the horizon is deduped)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ref = refDocs.toDF("doc_id", "text")
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val q = Dedup.streamingSetSimScreen(
      input.toDF().toDF("doc_id", "text", "event_time")
        .withWatermark("event_time", "10 minutes"), ref, threshold = 0.5)
      .writeStream.format("memory").queryName("sss_once")
      .outputMode("append").start()
    try {
      input.addData(Seq(arrivals.head))
      q.processAllAvailable()
      input.addData(Seq(arrivals.head)) // same doc re-arrives in-horizon
      q.processAllAvailable()
      val rows = spark.table("sss_once").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.length === rows.distinct.length,
        s"in-horizon re-arrival must not duplicate pairs: ${rows.toSeq}")
      assert(rows.nonEmpty)
    } finally q.stop()
  }
}
