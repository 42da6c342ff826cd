package graft.ops

import graft.SparkSpec

/** Unit spec for the union-window AS-OF join. */
class AsOfSpec extends SparkSpec {

  import java.sql.Timestamp
  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: latest right at-or-before, per key, left-outer") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, ts("2026-01-01 10:00:00")),
      (101L, 1L, ts("2026-01-01 10:05:00")),
      (102L, 2L, ts("2026-01-01 09:00:00"))) // user 2 has no prior right row
      .toDF("lid", "user_id", "ts")
    val right = Seq(
      (200L, 1L, ts("2026-01-01 09:59:00"), 1.0),
      (201L, 1L, ts("2026-01-01 10:05:00"), 2.0), // equal ts: matches (inclusive)
      (202L, 2L, ts("2026-01-01 09:30:00"), 3.0)) // after user 2's left row
      .toDF("rid", "user_id", "ts", "v")
    val out = AsOf.asofJoin(left, right, "user_id", "ts", Seq("rid", "v"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4))))).toMap
    assert(out(100L) === ((Some(200L), Some(1.0))))
    assert(out(101L) === ((Some(201L), Some(2.0)))) // inclusive >= semantics
    assert(out(102L) === ((None, None)))            // left-outer null match
  }

  test("asofJoin plans one exchange — no range-join explosion") {
    import spark.implicits._
    val left = Seq((1L, 1L, ts("2026-01-01 10:00:00"))).toDF("lid", "user_id", "ts")
    val right = Seq((2L, 1L, ts("2026-01-01 09:00:00"), 1.0))
      .toDF("rid", "user_id", "ts", "v")
    val plan = AsOf.asofJoin(left, right, "user_id", "ts", Seq("rid", "v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(!plan.contains("Cartesian"))
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1, s"expected the single window exchange:\n$plan")
  }

  test("NULL keys never match — SQL join semantics, not window-partition grouping") {
    import spark.implicits._
    val left = Seq(
      (100L, Some(1L), ts("2026-01-01 10:00:00")),
      (101L, None, ts("2026-01-01 10:00:00"))) // NULL-keyed left row
      .toDF("lid", "user_id", "ts")
    val right = Seq(
      (200L, None, ts("2026-01-01 09:00:00"), 1.0), // NULL-keyed right row
      (201L, Some(1L), ts("2026-01-01 09:30:00"), 2.0))
      .toDF("rid", "user_id", "ts", "v")
    val out = AsOf.asofJoin(left, right, "user_id", "ts", Seq("rid", "v"))
      .collect().map(r => r.getLong(0) ->
        Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out(100L) === Some(201L))
    assert(out(101L) === None) // passes through unmatched, not NULL=NULL
  }

  test("latestPerKeyTs keeps the highest tie-break per (key, ts)") {
    import spark.implicits._
    val r = Seq(
      (10L, 1L, ts("2026-01-01 10:00:00")),
      (11L, 1L, ts("2026-01-01 10:00:00")),
      (12L, 1L, ts("2026-01-01 11:00:00")))
      .toDF("rid", "user_id", "ts")
    val kept = AsOf.latestPerKeyTs(r, "user_id", "ts", "rid")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(11L, 12L))
  }

  test("asofNearest: picks the closer side, backward on ties, left-outer") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, ts("2026-01-01 10:00:00")), // back 1 min vs fwd 3 min → back
      (101L, 1L, ts("2026-01-01 10:02:30")), // back 3.5 min vs fwd 30 s → fwd
      (102L, 2L, ts("2026-01-01 09:00:00")), // only a future right row → fwd
      (103L, 3L, ts("2026-01-01 09:00:00"))) // no right rows at all
      .toDF("lid", "user_id", "ts")
    val right = Seq(
      (200L, 1L, ts("2026-01-01 09:59:00"), 1.0),
      (201L, 1L, ts("2026-01-01 10:03:00"), 2.0),
      (202L, 2L, ts("2026-01-01 09:30:00"), 3.0))
      .toDF("rid", "user_id", "ts", "v")
    val out = AsOf.asofNearest(left, right, "user_id", "ts", Seq("rid", "v"))
      .collect().map(r => r.getAs[Long]("lid") -> r).toMap
    assert(out(100L).getAs[Long]("nearest_rid") === 200L)
    assert(out(100L).getAs[String]("nearest_dir") === "backward")
    assert(out(100L).getAs[Long]("nearest_dt_us") === -60L * 1000000)
    assert(out(101L).getAs[Long]("nearest_rid") === 201L)
    assert(out(101L).getAs[String]("nearest_dir") === "forward")
    assert(out(101L).getAs[Long]("nearest_dt_us") === 30L * 1000000)
    assert(out(102L).getAs[Long]("nearest_rid") === 202L)
    assert(out(102L).getAs[String]("nearest_dir") === "forward")
    assert(out(103L).isNullAt(out(103L).fieldIndex("nearest_rid")))
    assert(out(103L).isNullAt(out(103L).fieldIndex("nearest_dir")))
  }

  test("asofNearest: exact tie prefers the backward sample") {
    import spark.implicits._
    val left = Seq((1L, 7L, ts("2026-01-01 12:00:00"))).toDF("lid", "user_id", "ts")
    val right = Seq(
      (10L, 7L, ts("2026-01-01 11:59:00"), 1.0),
      (11L, 7L, ts("2026-01-01 12:01:00"), 2.0))
      .toDF("rid", "user_id", "ts", "v")
    val r = AsOf.asofNearest(left, right, "user_id", "ts", Seq("rid")).head()
    assert(r.getAs[Long]("nearest_rid") === 10L)
    assert(r.getAs[String]("nearest_dir") === "backward")
  }
}
