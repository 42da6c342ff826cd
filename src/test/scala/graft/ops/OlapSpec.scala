package graft.ops

import graft.SparkSpec

/** Unit spec for the pivot / rollup reshaping ops. */
class OlapSpec extends SparkSpec {

  private def events =  {
    import spark.implicits._
    Seq(
      (1L, "click", 5.0), (1L, "click", 15.0), (1L, "view", 7.0),
      (2L, "purchase", 25.0), (2L, "refund", 1.0)) // refund: unlisted type
      .toDF("user_id", "event_type", "value")
  }

  test("pivot: one row per user, one count column per listed type, 0-filled") {
    val out = pivotRows
    assert(out(1L) === ((2L, 1L, 0L)))
    assert(out(2L) === ((0L, 0L, 1L))) // refund not pivoted; user still present
  }

  private def pivotRows =
    Olap.pivotEventCounts(events).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("rollup: leaf rows, per-type subtotals, grand total, grouping flags") {
    val rows = Olap.rollupEventStats(events).collect()
      .map(r => (Option(r.getString(0)), Option(r.get(1)),
        r.getInt(2), r.getInt(3), r.getLong(4)))
    // Grand total: both keys null, both grouping flags set, n = 5.
    assert(rows.count { case (t, b, gt, gb, n) =>
      t.isEmpty && b.isEmpty && gt == 1 && gb == 1 && n == 5L } === 1)
    // click subtotal: type present, band rolled up, n = 2.
    assert(rows.count { case (t, b, gt, gb, n) =>
      t.contains("click") && b.isEmpty && gt == 0 && gb == 1 && n == 2L } === 1)
    // Leaf: click band 0 (value 5.0) and band 1 (value 15.0), one each.
    assert(rows.count { case (t, b, gt, gb, n) =>
      t.contains("click") && b.contains(0) && gt == 0 && gb == 0 && n == 1L }
      === 1)
    assert(rows.count { case (t, b, _, _, _) => t.contains("click") && b.contains(1) } === 1)
  }

  test("rollup plans one Expand aggregation, not a union of scans") {
    val plan = Olap.rollupEventStats(events)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    assert(!plan.contains("Union"), s"rollup must not union per-level scans:\n$plan")
  }

  test("cube adds the per-band slice rollup lacks, same grand total") {
    val rows = Olap.cubeEventStats(events).collect()
      .map(r => (Option(r.getString(0)), Option(r.get(1)),
        r.getInt(2), r.getInt(3), r.getLong(4)))
    // The cube-only grouping set: band present, type rolled up.
    assert(rows.count { case (t, b, gt, gb, n) =>
      t.isEmpty && b.contains(0) && gt == 1 && gb == 0 && n == 3L } === 1)
    // Grand total identical to rollup's.
    assert(rows.count { case (t, b, gt, gb, n) =>
      t.isEmpty && b.isEmpty && gt == 1 && gb == 1 && n == 5L } === 1)
    assert(!Olap.cubeEventStats(events)
      .queryExecution.executedPlan.toString.contains("Union"))
  }

  test("unpivot: measures melt to rows, Expand plan, exact sums") {
    import spark.implicits._
    val li = Seq(("A", 2.0, 0.1, 0.05), ("A", 3.0, 0.2, 0.05))
      .toDF("l_returnflag", "l_quantity", "l_discount", "l_tax")
    val q = Olap.unpivotMeasures(li)
    val out = q.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out === Map(
      ("A", "l_quantity") -> ((2L, 5.0)),
      ("A", "l_discount") -> ((2L, 0.3)),
      ("A", "l_tax") -> ((2L, 0.1))))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"unpivot must plan as Expand:\n$plan")
    assert(!plan.contains("Union"), s"not a union of scans:\n$plan")
  }

  test("groupingSets: leaf + both one-key slices, no grand total, one Expand") {
    val rows = Olap.groupingSetsStats(events).collect()
      .map(r => (Option(r.getString(0)), Option(r.get(1)),
        r.getInt(2), r.getInt(3), r.getLong(4)))
    // The cube-only band slice IS present (type rolled up, band 0 → n=3)...
    assert(rows.count { case (t, b, gt, gb, n) =>
      t.isEmpty && b.contains(0) && gt == 1 && gb == 0 && n == 3L } === 1)
    // ...the per-type slice too (click across bands → n=2)...
    assert(rows.count { case (t, b, gt, gb, n) =>
      t.contains("click") && b.isEmpty && gt == 0 && gb == 1 && n == 2L } === 1)
    // ...but NO grand total — the set neither rollup nor cube can express.
    assert(rows.count { case (t, b, _, _, _) =>
      t.isEmpty && b.isEmpty } === 0)
    // Leaf cells intact.
    assert(rows.count { case (t, b, gt, gb, n) =>
      t.contains("click") && b.contains(1) && gt == 0 && gb == 0 && n == 1L }
      === 1)
    val plan = Olap.groupingSetsStats(events)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand") && !plan.contains("Union"),
      s"grouping sets must plan one Expand aggregate:\n$plan")
  }

  private def tsEvents = {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, "click"),
      (2L, ts("2026-01-01 11:00:00"), 1L, "click"),  // same user, same day
      (3L, ts("2026-01-01 12:00:00"), 2L, "click"),
      (4L, ts("2026-01-02 10:00:00"), 1L, "click"),
      (5L, ts("2026-01-02 10:00:00"), 1L, "view"),
      (6L, null.asInstanceOf[Timestamp], 9L, "click")) // null ts dropped
      .toDF("event_id", "ts", "user_id", "event_type")
  }

  test("dailyActiveUsers: exact distinct per (day, type), null ts dropped") {
    val out = Olap.dailyActiveUsers(tsEvents).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      ("2026-01-01", "click") -> ((2L, 3L)),  // users {1,2}, 3 events
      ("2026-01-02", "click") -> ((1L, 1L)),
      ("2026-01-02", "view")  -> ((1L, 1L))))
  }

  test("pricingSummary: exact decimal sums and derived averages") {
    import spark.implicits._
    import java.sql.Timestamp
    val li = Seq(
      (Timestamp.valueOf("1997-01-01 00:00:00"), "R", "F", 10.0, 100.10, 0.05, 0.02),
      (Timestamp.valueOf("1997-06-01 00:00:00"), "R", "F", 20.0, 200.20, 0.10, 0.04),
      (Timestamp.valueOf("1999-01-01 00:00:00"), "R", "F", 99.0, 999.99, 0.00, 0.00)) // past cutoff
      .toDF("l_shipdate", "l_returnflag", "l_linestatus",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val r = Olap.pricingSummary(li).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Double]("sum_qty") === 30.0)
    assert(row.getAs[Double]("sum_base_price") === 300.30)
    // 100.10·0.95 + 200.20·0.90 = 95.095 + 180.18 = 275.275 — exact.
    assert(row.getAs[Double]("sum_disc_price") === 275.275)
    // 95.095·1.02 + 180.18·1.04 = 96.9969 + 187.3872 = 284.3841 — exact.
    assert(row.getAs[Double]("sum_charge") === 284.3841)
    assert(row.getAs[Double]("avg_qty") === 15.0)
    assert(row.getAs[Double]("avg_disc") === 0.075)
    assert(row.getAs[Long]("count_order") === 2L)
  }

  test("revenueByNation broadcasts the dims and joins facts by hash") {
    import spark.implicits._
    import java.sql.Timestamp
    val li = Seq((1L, Timestamp.valueOf("1997-01-01 00:00:00"), 100.0, 0.10))
      .toDF("l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
    val ord = Seq((1L, 7L)).toDF("o_orderkey", "o_custkey")
    val cust = Seq((7L, 3)).toDF("c_custkey", "c_nationkey")
    val nat = Seq((3, "NATION_3", 2)).toDF("n_nationkey", "n_name", "n_regionkey")
    val reg = Seq((2, "ASIA"), (4, "EUROPE")).toDF("r_regionkey", "r_name")
    val q = Olap.revenueByNation(li, ord, cust, nat, reg)
    val out = q.collect()
    assert(out.length === 1)
    assert(out.head.getString(0) === "NATION_3")
    assert(out.head.getDouble(1) === 90.0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dims must broadcast:\n$plan")
    assert(!plan.contains("Cartesian"), s"no cartesian allowed:\n$plan")
  }

  test("retentionCohorts: users land in their first-day cohort at each offset") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    // u1: days 1,1,3 → cohort d1, offsets 0 and 2. u2: days 1,2 → cohort
    // d1, offsets 0 and 1. u3: day 2 only → cohort d2, offset 0.
    val ev = Seq(
      (1L, t("2026-01-01 09:00:00"), 1L, "view", 1.0),
      (2L, t("2026-01-01 18:00:00"), 1L, "click", 1.0),
      (3L, t("2026-01-03 09:00:00"), 1L, "view", 1.0),
      (4L, t("2026-01-01 09:00:00"), 2L, "view", 1.0),
      (5L, t("2026-01-02 09:00:00"), 2L, "view", 1.0),
      (6L, t("2026-01-02 09:00:00"), 3L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Olap.retentionCohorts(ev).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("2026-01-01", 0) -> 2L, ("2026-01-01", 1) -> 1L,
      ("2026-01-01", 2) -> 1L, ("2026-01-02", 0) -> 1L))
  }

  test("valueHistogram: bins, clamped edges, shares summing to one") {
    import spark.implicits._
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2026-01-01 10:00:00")
    // -5 clamps into bin 0, 250 into bin 19; 12 → bin 2, 14 → bin 2.
    val ev = Seq(-5.0, 250.0, 12.0, 14.0, 3.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, t0, 1L, "click", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Olap.valueHistogram(ev).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(0) === ((0.0, 2L, 0.4)))   // -5 clamped + 3.0
    assert(out(2) === ((10.0, 2L, 0.4)))  // 12, 14
    assert(out(19) === ((95.0, 1L, 0.2))) // 250 clamped
    assert(math.abs(out.values.map(_._3).sum - 1.0) < 1e-9)
  }

  test("revenueShareByNation: shares sum to one over the regional total") {
    import spark.implicits._
    val li = Seq((10L, 100.0, 0.0), (20L, 300.0, 0.0))
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
    val ord = Seq((10L, 1L), (20L, 2L)).toDF("o_orderkey", "o_custkey")
    val cust = Seq((1L, 11L), (2L, 12L)).toDF("c_custkey", "c_nationkey")
    val nat = Seq((11L, 1L, "FRANCE"), (12L, 1L, "GERMANY"))
      .toDF("n_nationkey", "n_regionkey", "n_name")
    val reg = Seq((1L, "EUROPE")).toDF("r_regionkey", "r_name")
    val out = Olap.revenueShareByNation(li, ord, cust, nat, reg, "EUROPE")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out === Map("FRANCE" -> 0.25, "GERMANY" -> 0.75))
  }

  test("HLL daily-active sketch tracks the exact counts within its rsd") {
    import spark.implicits._
    import java.sql.Timestamp
    // 500 distinct users on one day — enough cardinality that a broken
    // sketch misses by far more than the 5% rsd bound tested here.
    val ev = (1 to 500).map(u =>
      (u.toLong, Timestamp.valueOf("2026-01-01 10:00:00"), u.toLong, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val exact = Olap.dailyActiveUsers(ev).collect().head.getLong(2)
    val approx = Olap.dailyActiveUsersApprox(ev).collect().head.getLong(2)
    assert(exact === 500L)
    assert(math.abs(approx - exact).toDouble / exact <= 0.15,
      s"sketch $approx vs exact $exact drifted past 3×rsd")
  }

  test("dailyActiveUsersAudit: exact keys/counts with within_tol true") {
    val out = Olap.dailyActiveUsersAudit(tsEvents).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out === Map(
      ("2026-01-01", "click") -> ((2L, 3L, true)),
      ("2026-01-02", "click") -> ((1L, 1L, true)),
      ("2026-01-02", "view")  -> ((1L, 1L, true))))
  }

  test("eventTypeLift: hand-checked pair counts and lift, repeats collapse") {
    import spark.implicits._
    // Users 1,2 click+view; user 3 clicks twice (repeat must not inflate);
    // user 4 only views. U=4, n_click=3, n_view=3, n_both=2.
    // lift(click,view) = 2*4/(3*3) = 0.888889.
    val ev = Seq(
      (1L, "click"), (1L, "view"),
      (2L, "click"), (2L, "view"),
      (3L, "click"), (3L, "click"),
      (4L, "view"))
      .toDF("user_id", "event_type").repartition(3)
    val out = Olap.eventTypeLift(ev).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "click" && r.getString(1) === "view")
    assert(r.getLong(2) === 2L && r.getLong(3) === 3L && r.getLong(4) === 3L)
    assert(r.getDouble(5) === 0.888889)
  }

  test("weeklyActiveUsersRollup: daily sketches union to the weekly distinct") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // Week of Mon 2025-12-29: user 1 active on two days (must count once
    // after the union), users 2 and 3 on one day each. Next week: user 1
    // again (a sketch rollup must NOT dedup across week groups).
    val ev = Seq(
      (1L, ts("2025-12-29 10:00:00"), 1L, "click"),
      (2L, ts("2025-12-30 10:00:00"), 1L, "click"),
      (3L, ts("2025-12-30 11:00:00"), 2L, "view"),
      (4L, ts("2025-12-31 12:00:00"), 3L, "click"),
      (5L, ts("2026-01-05 09:00:00"), 1L, "click"),
      (6L, null.asInstanceOf[Timestamp], 9L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type").repartition(3)
    val out = Olap.weeklyActiveUsersRollup(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // At these cardinalities the HLL sketch is still exact.
    assert(out === Map(
      "2025-12-29" -> ((3L, 3L)),
      "2026-01-05" -> ((1L, 1L))))
    val audit = Olap.weeklyActiveUsersRollupAudit(ev).collect()
    assert(audit.length === 2)
    assert(audit.forall(_.getBoolean(3)), "union estimate must hold its tol")
  }

  test("seasonality: epoch bucketing is exact and timezone-free") {
    import spark.implicits._
    import java.sql.Timestamp
    // 1970-01-01 (Thursday) 01:30 UTC -> dow 4, hour 1;
    // 1970-01-04 (Sunday) 23:10 UTC -> dow 0, hour 23.
    val ev = Seq(
      (1L, new Timestamp(1L * 3600000 + 1800000), 7L, "view", 10.0, ""),
      (2L, new Timestamp(3L * 86400000 + 23L * 3600000 + 600000), 7L, "view", 2.5, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Olap.seasonality(ev).collect()
      .map(r => (r.getAs[Int]("dow"), r.getAs[Int]("hour")) -> r).toMap
    assert(out.keySet === Set((4, 1), (0, 23)))
    assert(out((4, 1)).getAs[Double]("total_value") === 10.0)
    assert(out((0, 23)).getAs[Double]("avg_value") === 2.5)
  }

  test("incrementalMerge: state ⊕ delta handles one-sided keys exactly") {
    import spark.implicits._
    import java.sql.Timestamp
    val cut = 1705363200L // 2024-01-16T00:00:00Z
    val ev = Seq(
      // user 1: rows on both sides of the cut
      (1L, new Timestamp((cut - 100) * 1000), 1L, "view", 10.0, ""),
      (2L, new Timestamp((cut + 100) * 1000), 1L, "view", 30.0, ""),
      // user 2: state-only (dormant after the cut)
      (3L, new Timestamp((cut - 50) * 1000), 2L, "view", 7.0, ""),
      // user 3: delta-only (brand-new)
      (4L, new Timestamp((cut + 50) * 1000), 3L, "view", 5.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Olap.incrementalMerge(ev, cut).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(1L).getAs[Long]("n") === 2L)
    assert(out(1L).getAs[Double]("total_value") === 40.0)
    assert(out(1L).getAs[Double]("min_value") === 10.0)
    assert(out(1L).getAs[Double]("max_value") === 30.0)
    assert(out(1L).getAs[Double]("avg_value") === 20.0)
    assert(out(2L).getAs[Long]("n") === 1L)
    assert(out(2L).getAs[Double]("total_value") === 7.0)
    assert(out(3L).getAs[Long]("n") === 1L)
    assert(out(3L).getAs[Double]("max_value") === 5.0)
  }

  test("weekOverWeek: lag(7) only counts as baseline across a true calendar week") {
    import spark.implicits._
    import java.sql.Timestamp
    // 14 consecutive days of 'view' with a known jump, then a day series
    // WITH A GAP for 'click' where row-7-back is NOT day-7-back.
    val ev = ((0 until 14).map(i => (i.toLong, new Timestamp(i * 86400000L),
      1L, "view", 1.0, "")) ++
      Seq(0, 1, 2, 3, 4, 5, 6, 9).zipWithIndex.map { case (d, i) =>
        (100L + i, new Timestamp(d * 86400000L), 1L, "click", 1.0, "")
      }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Olap.weekOverWeek(ev).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")) -> r)
      .toMap
    // view day 7 has view day 0 as a true week-back baseline.
    assert(out(("view", 7L)).getAs[Long]("prev_week_events") === 1L)
    assert(out(("view", 7L)).getAs[Double]("wow_change") === 0.0)
    // click day 9: 7 rows back is day 0, which is NOT day 2 — no baseline.
    assert(out(("click", 9L)).isNullAt(
      out(("click", 9L)).fieldIndex("prev_week_events")))
  }

  test("benfordScreen: shares sum to 1 and expectation is the Benford law") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = Seq(1.5, 19.0, 190.0, 2.0, 31.0, 0.5, 9.0).zipWithIndex.map {
      case (v, i) => (i.toLong, new Timestamp(1000L), 1L, "view", v, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Olap.benfordScreen(ev).collect()
    // 0.5 is excluded (< 1); digits: 1->3, 2->1, 3->1, 9->1 of 6 rows.
    assert(out.map(_.getAs[Long]("n")).sum === 6L)
    val d1 = out.find(_.getAs[Int]("digit") === 1).get
    assert(d1.getAs[Long]("n") === 3L)
    assert(d1.getAs[Double]("observed") === 0.5)
    assert(d1.getAs[Double]("expected") === 0.30103)
    // observed shares are 6-dp rounded, so the sum carries up to
    // n_digits*5e-7 of rounding residue.
    assert(math.abs(out.map(_.getAs[Double]("observed")).sum - 1.0) < 1e-5)
  }

  test("compactionPlan: size-desc next-fit bins, per-partition, " +
    "deterministic ties; bins rollup agrees") {
    import spark.implicits._
    val manifest = Seq(
      // part "a": sizes desc 900, 500, 500, 300, 100 → cum-before
      // 0, 900, 1400, 1900, 2200 → bins at target 1000: 0, 0, 1, 1, 2.
      ("a", 1L, 500L), ("a", 2L, 900L), ("a", 3L, 500L),
      ("a", 4L, 300L), ("a", 5L, 100L),
      // part "b": one oversized file is alone in bin 0; the next starts
      // its own bin (cum-before 2500 → bin 2).
      ("b", 1L, 2500L), ("b", 2L, 10L)
    ).toDF("part_key", "file_id", "bytes")
    val out = Olap.compactionPlan(manifest, 1000L).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(3)).toMap
    assert(out === Map(
      ("a", 2L) -> 0, ("a", 1L) -> 0, ("a", 3L) -> 1,
      ("a", 4L) -> 1, ("a", 5L) -> 2,
      ("b", 1L) -> 0, ("b", 2L) -> 2))
    // Equal sizes cut by file_id: (a,1) before (a,3) — pinned above.
    val bins = Olap.compactionBins(manifest, 1000L).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getInt(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(bins(("a", 0)) === ((2, 1400L, true)))
    assert(bins(("a", 1)) === ((2, 800L, false)))
    assert(bins(("a", 2)) === ((1, 100L, false)))
    assert(bins(("b", 0)) === ((1, 2500L, true)))
    assert(bins(("b", 2)) === ((1, 10L, false)))
  }
}
