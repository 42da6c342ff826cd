package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

/** Unit spec for the attribution join (batch face). */
class StreamJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events = {
    import spark.implicits._
    Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2026-01-01 10:30:00"), 1L, "purchase"),  // 30 min after view
      (3L, ts("2026-01-01 09:30:00"), 1L, "view"),      // exactly 1h before: inclusive
      (4L, ts("2026-01-01 08:00:00"), 1L, "view"),      // outside horizon
      (5L, ts("2026-01-01 10:30:00"), 1L, "view"),      // same instant: inclusive
      (6L, ts("2026-01-01 10:31:00"), 1L, "view"),      // after purchase: excluded
      (7L, ts("2026-01-01 10:15:00"), 2L, "view"))      // other user
      .toDF("event_id", "ts", "user_id", "event_type")
  }

  test("attribution: inclusive hour window per user, hand-checked") {
    val out = StreamJoin.purchaseAttribution(events).collect()
      .map(r => (r.getLong(3), r.getLong(5))).toSet // (view_id, lag_s)
    assert(out === Set(
      (1L, 1800L),  // 30 min prior
      (3L, 3600L),  // exactly at the horizon boundary
      (5L, 0L)))    // same instant
  }

  test("attribution plans an equi-join on user, never a cartesian") {
    val plan = StreamJoin.purchaseAttribution(events)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      s"the user key must drive the join:\n$plan")
  }
}
