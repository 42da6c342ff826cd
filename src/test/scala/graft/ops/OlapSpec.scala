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
}
