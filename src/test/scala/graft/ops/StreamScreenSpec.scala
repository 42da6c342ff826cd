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
