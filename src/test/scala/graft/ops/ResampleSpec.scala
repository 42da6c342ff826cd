package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

/** Unit spec for time-series regularization and winsorization. */
class ResampleSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("hourlyFfill: grid spans first→last hour, gaps carry the last average") {
    import spark.implicits._
    // User 1: 10:xx twice (avg 15.0), nothing at 11, 12:xx once → the 11:00
    // bucket is synthetic and carries 15.0 forward. User 2: single hour.
    val ev = Seq(
      (1L, t("2026-01-01 10:10:00"), 1L, "click", 10.0),
      (2L, t("2026-01-01 10:50:00"), 1L, "click", 20.0),
      (3L, t("2026-01-01 12:05:00"), 1L, "click", 7.0),
      (4L, t("2026-01-01 09:00:00"), 2L, "view", 5.0),
      (5L, null.asInstanceOf[Timestamp], 3L, "view", 1.0)) // null ts dropped
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Resample.hourlyFfill(ev).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getBoolean(2), r.getDouble(3)))).toMap
    assert(out.size === 4)
    assert(out((1L, "2026-01-01 10:00:00")) === ((true, 15.0)))
    assert(out((1L, "2026-01-01 11:00:00")) === ((false, 15.0))) // gap filled
    assert(out((1L, "2026-01-01 12:00:00")) === ((true, 7.0)))
    assert(out((2L, "2026-01-01 09:00:00")) === ((true, 5.0)))
  }

  test("hourlyInterpolate: gaps take the straight line, no extrapolation") {
    import spark.implicits._
    // User 1: 10:00 avg 10.0, gap at 11/12, 13:00 avg 40.0 → the 3-hour
    // gap interpolates to 20.0 and 30.0. Trailing bucket emits itself.
    val ev = Seq(
      (1L, t("2026-01-01 10:10:00"), 1L, "click", 10.0),
      (2L, t("2026-01-01 13:05:00"), 1L, "click", 40.0),
      (3L, t("2026-01-01 09:00:00"), 2L, "view", 5.0)) // single obs
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Resample.hourlyInterpolate(ev).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getBoolean(2), r.getDouble(3)))).toMap
    assert(out.size === 5)
    assert(out((1L, "2026-01-01 10:00:00")) === ((true, 10.0)))
    assert(out((1L, "2026-01-01 11:00:00")) === ((false, 20.0)))
    assert(out((1L, "2026-01-01 12:00:00")) === ((false, 30.0)))
    assert(out((1L, "2026-01-01 13:00:00")) === ((true, 40.0)))
    assert(out((2L, "2026-01-01 09:00:00")) === ((true, 5.0)))
  }

  test("ewma: seeded with the first value, folds in event-time order") {
    import spark.implicits._
    // click series 10, 20, 40 at alpha 0.5:
    // s1=10, s2=0.5·20+0.5·10=15, s3=0.5·40+0.5·15=27.5.
    // The 09:00 event is third by event_id but FIRST by ts — order must be
    // event-time, not insertion or id order.
    val ev = Seq(
      (2L, t("2026-01-01 10:00:00"), 1L, "click", 20.0),
      (3L, t("2026-01-01 11:00:00"), 1L, "click", 40.0),
      (1L, t("2026-01-01 09:00:00"), 1L, "click", 10.0),
      (4L, t("2026-01-01 09:00:00"), 2L, "view", 5.0),
      (5L, null.asInstanceOf[Timestamp], 3L, "view", 1.0)) // dropped
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Resample.ewma(ev, alpha = 0.5).collect()
      .map(r => r.getString(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("click") === ((3, 40.0, 27.5)))
    assert(out("view") === ((1, 5.0, 5.0))) // single point: ewma = x1
  }

  test("winsorize: values clip to the per-type percentile bounds, rows kept") {
    import spark.implicits._
    // 1..20 for clicks: p05 = 1.95, p95 = 19.05 (exact interpolation).
    val ev = (1 to 20).map(i =>
      (i.toLong, t("2026-01-01 10:00:00"), 1L, "click", i.toDouble))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Resample.winsorize(ev).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out.size === 20) // clipping never drops rows
    assert(out(1L) === ((1.95, true)))
    assert(out(20L) === ((19.05, true)))
    assert(out(10L) === ((10.0, false)))
    assert(out.values.count(_._2) === 2)
  }

  test("hourlyFfill: join and fill window reuse the grid's partitioning") {
    import spark.implicits._
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thresholdKey)
    spark.conf.set(thresholdKey, "-1") // force the at-scale join strategy
    try {
      val ev = (1 to 50).map(i =>
        (i.toLong, t(f"2026-01-01 ${9 + i % 3}%02d:00:00"), (i % 5).toLong,
          "click", i.toDouble))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val plan = Resample.hourlyFfill(ev)
        .queryExecution.executedPlan.toString
      // obs agg (user,h) + the lead window (user) — and nothing more: the
      // fill rows are GENERATED map-side from each bucket, so there is no
      // grid join and no third shuffle.
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      assert(exchanges === 2, s"expected 2 shuffles, saw $exchanges:\n$plan")
      assert(!plan.contains("Join"), s"fill must be join-free:\n$plan")
    } finally spark.conf.set(thresholdKey, prev)
  }

  test("winsorize: per-type stats broadcast back, facts never shuffle") {
    import spark.implicits._
    val ev = (1 to 20).map(i =>
      (i.toLong, t("2026-01-01 10:00:00"), 1L, "click", i.toDouble))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val plan = Resample.winsorize(ev).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bounds must broadcast onto the fact scan:\n$plan")
  }
}
