package graft.ops

import graft.SparkSpec

/** Unit spec for anti-join / set-operation ops and the top-N window. */
class SetOpsSpec extends SparkSpec {

  test("customersWithoutBigOrders: anti join honors the pushed threshold") {
    import spark.implicits._
    val cust = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("c_custkey", "c_name")
    val ord = Seq((10L, 1L, 400000.0), (11L, 1L, 100.0), (12L, 3L, 50.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    // 3's only order is small, 2 has none → both qualify; 1 does not.
    val q = SetOps.customersWithoutBigOrders(cust, ord)
    val out = q.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSet === Set((2L, "b"), (3L, "c")))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"must plan an anti join:\n$plan")
  }

  test("customersWithUrgentOrders: semi join emits each match once, no fan-out") {
    import spark.implicits._
    val cust = Seq((1L, "a", 5.0), (2L, "b", 6.0), (3L, "c", 7.0))
      .toDF("c_custkey", "c_name", "c_acctbal")
    val ord = Seq(
      (10L, 1L, "1-URGENT"), (11L, 1L, "1-URGENT"), // two matches, one row out
      (12L, 2L, "5-LOW"), (13L, 9L, "1-URGENT")) // 9 has no customer row
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val q = SetOps.customersWithUrgentOrders(cust, ord)
    val out = q.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "a"))) // ONE row despite two urgent orders
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"must plan a semi join:\n$plan")
  }

  test("valueRanks: ties share a rank, dense_rank closes the gap") {
    import spark.implicits._
    val ev = Seq(
      (1L, "click", 30.0), (2L, "click", 20.0), (3L, "click", 20.0),
      (4L, "click", 10.0), (5L, "view", 9.0))
      .toDF("event_id", "event_type", "value")
    val out = WindowOps.valueRanks(ev).collect()
      .map(r => r.getLong(0) -> ((r.getInt(3), r.getInt(4)))).toMap
    assert(out(1L) === ((1, 1)))
    assert(out(2L) === ((2, 2))) // tied pair: same rank both ways
    assert(out(3L) === ((2, 2)))
    assert(out(4L) === ((4, 3))) // rank gaps, dense_rank doesn't
    assert(out(5L) === ((1, 1))) // partitions are independent
  }

  test("clickersNotBuyers: EXCEPT distinct semantics over the value carve") {
    import spark.implicits._
    val ev = Seq(
      (1L, "click", 99.0), (1L, "click", 98.0), // duplicate clicker collapses
      (2L, "click", 99.0), (2L, "purchase", 99.0),
      (3L, "purchase", 99.0), (4L, "view", 99.0),
      (5L, "click", 10.0)) // below the carve
      .toDF("user_id", "event_type", "value")
    val out = SetOps.clickersNotBuyers(ev).collect().map(_.getLong(0))
    assert(out.toSeq.sorted === Seq(1L)) // one row despite two clicks
  }

  test("clickersAlsoBuyers: INTERSECT distinct semantics, semi-join plan") {
    import spark.implicits._
    val ev = Seq(
      (1L, "click", 99.0), (1L, "click", 98.0), // clicker only
      (2L, "click", 99.0), (2L, "purchase", 99.0), // both → qualifies
      (2L, "purchase", 97.0), // duplicate buyer collapses
      (3L, "purchase", 99.0), (4L, "view", 99.0),
      (5L, "click", 99.0), (5L, "purchase", 10.0)) // purchase below carve
      .toDF("user_id", "event_type", "value")
    val q = SetOps.clickersAlsoBuyers(ev)
    val out = q.collect().map(_.getLong(0))
    assert(out.toSeq.sorted === Seq(2L)) // one row despite duplicates
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"must plan a semi join:\n$plan")
  }

  test("dailyClickPurchaseMatrix: full outer keeps one-sided days, zero-filled") {
    import java.sql.Timestamp
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2026-01-01 10:00:00"), 1L, "click", 1.0),
      (2L, t("2026-01-01 11:00:00"), 1L, "click", 1.0),
      (3L, t("2026-01-01 12:00:00"), 1L, "purchase", 1.0), // both-sides day
      (4L, t("2026-01-02 10:00:00"), 1L, "click", 1.0),    // click-only day
      (5L, t("2026-01-03 10:00:00"), 1L, "purchase", 1.0), // purchase-only day
      (6L, t("2026-01-01 10:00:00"), 2L, "view", 1.0))     // never appears
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = SetOps.dailyClickPurchaseMatrix(ev).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      (1L, "2026-01-01") -> ((2L, 1L)),
      (1L, "2026-01-02") -> ((1L, 0L)),
      (1L, "2026-01-03") -> ((0L, 1L))))
  }

  test("streamingTopN on a batch replay equals the batch rank-and-filter") {
    import java.sql.Timestamp
    import spark.implicits._
    val ev = ((1 to 10).map(i =>
      (i.toLong, Timestamp.valueOf(s"2026-01-01 10:00:0${i % 10}"), 7L,
        (i % 5).toDouble)) :+
      ((99L, Timestamp.valueOf("2026-01-01 11:00:00"), 8L, 5.0)))
      .toDF("event_id", "ts", "user_id", "value")
    val stream = WindowOps.streamingTopN(ev, n = 3).collect()
      .map(r => (r.user_id, r.rnk, r.event_id, r.value)).toSet
    val batch = WindowOps.topNPerUser(ev, n = 3).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(stream === batch)
  }

  test("topNPerUser keeps n rows per user with a pushed group limit") {
    import spark.implicits._
    val ev = (1 to 10).map(i => (7L, i.toLong, i.toDouble)) :+
      ((8L, 99L, 5.0))
    val df = ev.toDF("user_id", "event_id", "value")
    val out = WindowOps.topNPerUser(df, n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(out.count(_._1 == 7L) === 3)
    assert(out.filter(_._1 == 7L).map(_._2).toSet === Set(10L, 9L, 8L))
    assert(out.count(_._1 == 8L) === 1)
    // The rank filter must push into the window as a running group limit —
    // the O(N)-state-per-key shape, not rank-everything-then-filter.
    val plan = WindowOps.topNPerUser(df, n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rnk<=n must push into the window exec:\n$plan")
  }
}
