package graft.ops

import graft.SparkSpec

/** Unit spec for the ordered funnel and the ranking-window family. */
class FunnelSpec extends SparkSpec {

  import java.sql.Timestamp
  private def ts(s: String) = Timestamp.valueOf(s)

  private def events = {
    import spark.implicits._
    Seq(
      // user 1: full funnel in order.
      (1L, ts("2026-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2026-01-01 10:01:00"), 1L, "click"),
      (3L, ts("2026-01-01 10:02:00"), 1L, "purchase"),
      // user 2: purchase BEFORE any click — stops at view.
      (4L, ts("2026-01-01 09:00:00"), 2L, "purchase"),
      (5L, ts("2026-01-01 10:00:00"), 2L, "view"),
      (6L, ts("2026-01-01 09:30:00"), 2L, "click"), // click before view too
      // user 3: click then view, never a click after the view.
      (7L, ts("2026-01-01 08:00:00"), 3L, "click"),
      (8L, ts("2026-01-01 09:00:00"), 3L, "view"),
      // user 4: no funnel events at all.
      (9L, ts("2026-01-01 07:00:00"), 4L, "refund"))
      .toDF("event_id", "ts", "user_id", "event_type")
  }

  test("conversion: stage ordering is enforced, not just event presence") {
    val out = Funnel.conversion(events).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getInt(4)))).toMap
    val t0 = ts("2026-01-01 10:00:00").getTime / 1000
    assert(out(1L) === ((Some(t0), Some(t0 + 60), Some(t0 + 120), 3)))
    assert(out(2L)._4 === 1) // purchase/click precede the first view
    assert(out(3L)._4 === 1) // click only before the view
    assert(out(4L) === ((None, None, None, 0)))
  }

  test("conversion: a same-second stage pair counts (at-or-after)") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2026-01-01 10:00:00"), 1L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    assert(Funnel.conversion(ev).collect().head.getInt(4) === 2)
  }

  test("conversion plans exactly one exchange — stages chain, not rejoin") {
    val plan = Funnel.conversion(events).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"funnel must not self-join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected one hash exchange, got $exchanges:\n$plan")
  }

  test("streamingConversion on a batch replay equals the snapshot funnel") {
    val advances = Funnel.streamingConversion(events).collect()
      .map(a => (a.user_id, a.stage, a.at_s)).toSet
    val snapshot = Funnel.conversion(events).collect().flatMap { r =>
      Seq(1, 2, 3).flatMap { s =>
        Option(r.get(s)).map(t => (r.getLong(0), s, t.asInstanceOf[Long]))
      }
    }.toSet
    assert(advances === snapshot)
    assert(advances.exists(_._2 == 3)) // user 1 completes
  }

  test("streamingConversion: a completed funnel does not reopen on a later view") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2026-01-01 10:01:00"), 1L, "click"),
      (3L, ts("2026-01-01 10:02:00"), 1L, "purchase"),
      (4L, ts("2026-01-01 11:00:00"), 1L, "view")) // after completion
      .toDF("event_id", "ts", "user_id", "event_type")
    val advances = Funnel.streamingConversion(ev).collect()
      .map(a => (a.stage, a.at_s))
    assert(advances.length === 3) // no phantom second journey
  }

  test("lagLeadStats: neighbors, rank, ntile and normalized positions") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, "view", 0.0),
      (2L, ts("2026-01-01 10:01:00"), 1L, "click", 0.0),
      (3L, ts("2026-01-01 10:02:00"), 1L, "purchase", 0.0),
      (4L, ts("2026-01-01 10:03:00"), 1L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = WindowOps.lagLeadStats(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(Option(out(1L).getString(3)).isEmpty)        // no prev
    assert(out(1L).getString(4) === "click")            // next
    assert(out(2L).getString(3) === "view")
    assert(out(1L).getInt(5) === 1 && out(4L).getInt(5) === 4) // row_number
    assert(out(1L).getInt(6) === 1 && out(4L).getInt(6) === 4) // ntile(4), n=4
    assert(out(1L).getDouble(7) === 0.0)                 // percent_rank
    assert(out(4L).getDouble(7) === 1.0)
    assert(out(2L).getDouble(8) === 0.5)                 // cume_dist
  }

  test("lagLeadStats plans a single Window operator off one sort") {
    val plan = WindowOps.lagLeadStats(events
      .withColumn("value", org.apache.spark.sql.functions.lit(0.0)))
      .queryExecution.executedPlan.toString
    assert("Window ".r.findAllIn(plan).size === 1,
      s"all ranking metrics must share one Window operator:\n$plan")
  }
}
