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

  test("one shuffle: the session groupBy reuses the window's partitioning") {
    val plan = Sessionize.sessions(events((1L, 1L, "2026-01-01 10:00:00")))
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1, s"expected a single shuffle, plan:\n$plan")
  }
}
