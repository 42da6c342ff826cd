package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

/** Spec for gaps-and-islands sessionization. */
class SessionizeSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toSeq.map { case (eid, uid, t) => (eid, uid, ts(t)) }
      .toDF("event_id", "user_id", "ts")
  }

  test("gaps over the horizon split sessions; ties and order don't matter") {
    val out = Sessionize.sessions(events(
      // user 1: two events 10 min apart, then a 50-min gap
      (3L, 1L, "2026-01-01 10:10:00"), // out-of-order input on purpose
      (1L, 1L, "2026-01-01 10:00:00"),
      (4L, 1L, "2026-01-01 11:00:00"),
      // user 2: a single event
      (9L, 2L, "2026-01-01 09:00:00")))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(
      (1L, 1) -> ((2, ts("2026-01-01 10:00:00").getTime / 1000,
        ts("2026-01-01 10:10:00").getTime / 1000)),
      (1L, 2) -> ((1, ts("2026-01-01 11:00:00").getTime / 1000,
        ts("2026-01-01 11:00:00").getTime / 1000)),
      (2L, 1) -> ((1, ts("2026-01-01 09:00:00").getTime / 1000,
        ts("2026-01-01 09:00:00").getTime / 1000))))
  }

  test("a gap of exactly the horizon stays in the same session") {
    val out = Sessionize.sessions(events(
      (1L, 1L, "2026-01-01 10:00:00"),
      (2L, 1L, "2026-01-01 10:30:00")), gapSeconds = 1800)
      .collect()
    assert(out.length === 1)
    assert(out.head.getInt(2) === 2) // both events, one session
  }

  test("null timestamps are dropped, not sessioned by engine-specific null order") {
    import spark.implicits._
    val withNull = Seq(
      (1L, 1L, Some(ts("2026-01-01 10:00:00"))),
      (2L, 1L, None: Option[Timestamp]))
      .toDF("event_id", "user_id", "ts")
    val out = Sessionize.sessions(withNull).collect()
    assert(out.length === 1)
    assert(out.head.getInt(2) === 1) // only the timestamped event counted
  }

  test("streaming: session windows merge within the gap and emit on watermark") {
    import java.nio.file.Files
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp)](spark)
    val events = input.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "1 minute")
    val query = Sessionize.streamingSessions(events, "30 minutes")
      .writeStream.format("memory").queryName("session_sink")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sessions").toString)
      .start()
    try {
      // Two events 10 min apart merge into one session; the third, 40 min
      // later, opens another. The late 13:00 event advances the watermark
      // past both windows' ends so both emit.
      input.addData((1L, ts("2026-01-01 10:00:00")),
        (1L, ts("2026-01-01 10:10:00")))
      query.processAllAvailable()
      input.addData((1L, ts("2026-01-01 10:50:00")))
      query.processAllAvailable()
      input.addData((2L, ts("2026-01-01 13:00:00")))
      query.processAllAvailable()
      val rows = spark.table("session_sink").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getInt(3))).toSet
      assert(rows === Set(
        (1L, ts("2026-01-01 10:00:00"), ts("2026-01-01 10:40:00"), 2),
        (1L, ts("2026-01-01 10:50:00"), ts("2026-01-01 11:20:00"), 1)))
    } finally query.stop()
  }

  test("one shuffle: the session groupBy reuses the window's partitioning") {
    val plan = Sessionize.sessions(events((1L, 1L, "2026-01-01 10:00:00")))
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1, s"expected a single shuffle, plan:\n$plan")
  }
}
