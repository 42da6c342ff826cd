package graft.ops

import graft.SparkSpec

/** Unit spec for the bin-bucketed interval-containment join. */
class RangeJoinSpec extends SparkSpec {

  test("pointInInterval: inclusive bounds, exact recall across bins, no dups") {
    import spark.implicits._
    // Interval spans 3 bins of 10 (15..35); points probe the boundaries.
    val intervals = Seq((1L, 15L, 35L, 7), (2L, 0L, 5L, 8))
      .toDF("k", "s", "e", "iv")
    val points = Seq(
      (100L, 1L, 15L), // on start: matches
      (101L, 1L, 35L), // on end: matches
      (102L, 1L, 25L), // interior, different bin than endpoints
      (103L, 1L, 36L), // just outside
      (104L, 2L, 3L),  // other key
      (105L, 1L, 3L))  // in [0,5] range but key 1: no match
      .toDF("pid", "k", "t")
    val out = RangeJoin.pointInInterval(
      points, intervals, "k", "t", "s", "e", binSize = 10L)
      .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Int]("iv")))
    assert(out.toSet === Set((100L, 7), (101L, 7), (102L, 7), (104L, 8)))
    assert(out.length === 4) // exactly-once: no cross-bin duplicates
  }

  test("pointInInterval plans equi-joins only — no nested loop") {
    import spark.implicits._
    val intervals = Seq((1L, 0L, 10L)).toDF("k", "s", "e")
    val points = Seq((1L, 1L, 5L)).toDF("pid", "k", "t")
    val plan = RangeJoin.pointInInterval(
      points, intervals, "k", "t", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("Cartesian"), plan)
  }

  test("a sentinel-wide interval fails loudly instead of exploding the stage") {
    import spark.implicits._
    val intervals = Seq((1L, 0L, Long.MaxValue)).toDF("k", "s", "e")
    val points = Seq((1L, 1L, 5L)).toDF("pid", "k", "t")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, intervals, "k", "t", "s", "e").count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("widen binSize")), ex.toString)
  }

  test("intervalOverlap: exactly one row per overlapping pair across shared bins") {
    import spark.implicits._
    // binSize 10. Pair (L1, R1) shares bins 1..3 — exactly-once must hold
    // without a distinct; touching endpoints overlap (inclusive); disjoint
    // and adjacent-bin-but-disjoint pairs must not match.
    val left = Seq((1L, 12L, 38L), (2L, 50L, 55L), (3L, 70L, 71L))
      .toDF("lid", "ls", "le")
    val right = Seq(
      (10L, 15L, 60L), // overlaps L1 (bins 1..3 shared) AND L2
      (11L, 38L, 40L), // touches L1's end exactly → overlap
      (12L, 56L, 58L), // same bin as L2 but disjoint → no match
      (13L, 100L, 110L)) // far away
      .toDF("rid", "rs", "re")
    val out = RangeJoin.intervalOverlap(left, "ls", "le", right, "rs", "re",
      binSize = 10L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.sorted.toSeq === Seq((1L, 10L), (1L, 11L), (2L, 10L)))
  }

  test("intervalOverlap with a key joins within the key only") {
    import spark.implicits._
    val left = Seq(("a", 0L, 10L), ("b", 0L, 10L)).toDF("k", "ls", "le")
    val right = Seq(("a", 5L, 15L)).toDF("k", "rs", "re")
    val out = RangeJoin.intervalOverlap(left, "ls", "le", right, "rs", "re",
      binSize = 10L, key = Some("k")).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("k") === "a")
  }

  test("purchasesInSessions: every purchase lands in exactly one session") {
    import java.sql.Timestamp
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, "view", 1.0),
      (2L, ts("2026-01-01 10:10:00"), 1L, "purchase", 2.0),
      (3L, ts("2026-01-01 12:00:00"), 1L, "purchase", 3.0), // new session
      (4L, ts("2026-01-01 09:00:00"), 2L, "purchase", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = RangeJoin.purchasesInSessions(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out === Set((2L, 1L, 1), (3L, 1L, 2), (4L, 2L, 1)))
  }
}
