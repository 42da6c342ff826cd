package graft.ops

import graft.SparkSpec

/** Unit spec for the one-pass table profiler. */
class ProfileSpec extends SparkSpec {

  test("profile: counts, nulls, distincts, numeric min/max per column") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(2.5), Some("a")),
      (2L, None, Some("b")),
      (3L, Some(-1.0), Some("a")),
      (4L, Some(2.5), None)).toDF("id", "x", "s")
    val out = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("id", "x", "s"))
    val id = out("id")
    assert(id.getLong(1) === 4L && id.getLong(2) === 0L && id.getLong(3) === 4L)
    assert(id.getDouble(4) === 1.0 && id.getDouble(5) === 4.0)
    val x = out("x")
    assert(x.getLong(2) === 1L)      // one null
    assert(x.getLong(3) === 2L)      // distinct ignores null: {2.5, -1.0}
    assert(x.getDouble(4) === -1.0 && x.getDouble(5) === 2.5)
    val s = out("s")
    assert(s.getLong(2) === 1L && s.getLong(3) === 2L)
    assert(s.isNullAt(4) && s.isNullAt(5)) // non-numeric: no min/max
  }

  test("profile handles column names containing dots") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("user.id", "payload.body")
    val out = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out === Map("user.id" -> 2L, "payload.body" -> 2L))
  }

  test("profile is a single aggregation: one scan, one shuffle stage pair") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val plan = Profile.profile(df).queryExecution.executedPlan.toString
    // Multiple exact distincts plan as ONE aggregate over an Expand —
    // not one aggregation per column.
    assert(plan.contains("Expand"))
    assert(!plan.contains("Join"), s"profiler must not join per-column:\n$plan")
  }

  test("approx profile: no Expand in the plan, counts exact, distincts close") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, (i % 37).toString))
      .toDF("id", "s")
    val q = Profile.profile(df, exact = false)
    val plan = q.queryExecution.executedPlan.toString
    // The whole point of the approx path: the n_cols-fold Expand (and with
    // it the per-column reshuffle of every row) is gone.
    assert(!plan.contains("Expand"),
      s"approx profile must not Expand the input:\n$plan")
    assert(!plan.contains("Join"), s"profiler must not join per-column:\n$plan")
    val out = q.collect().map(r => r.getString(0) -> r).toMap
    // Row/null counts and min/max stay exact — only distincts are sketched.
    assert(out("id").getLong(1) === 500L && out("id").getLong(2) === 0L)
    assert(out("id").getDouble(4) === 1.0 && out("id").getDouble(5) === 500.0)
    // HLL++ at default rsd (5 %): both true cardinalities are tiny enough
    // that a loose ±10 % band would only fail on a real sketch bug.
    assert(math.abs(out("id").getLong(3) - 500L) <= 50,
      s"id distinct estimate too far: ${out("id").getLong(3)}")
    assert(math.abs(out("s").getLong(3) - 37L) <= 4,
      s"s distinct estimate too far: ${out("s").getLong(3)}")
  }

  test("profileAudit: exact stats carried through, sketch within tolerance") {
    import spark.implicits._
    val df = (1 to 300).map(i => (i.toLong, (i % 7).toString)).toDF("id", "s")
    val out = Profile.profileAudit(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("id", "s"))
    assert(out("id").getLong(1) === 300L && out("id").getLong(3) === 300L)
    assert(out("s").getLong(3) === 7L)
    assert(out.values.forall(_.getBoolean(6)),
      "HLL estimates drifted past 3·rsd of exact")
  }

  test("keySkew ranks the heaviest key values with deterministic ties") {
    import spark.implicits._
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++
      Seq.fill(3)("tepid") ++ Seq("cold")).map(Tuple1(_)).toDF("k")
    val out = Profile.keySkew(df, "k", k = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1, "hot", 6L, 0.461538),     // 6/13
      (2, "tepid", 3L, 0.230769),   // tie with warm → key order
      (3, "warm", 3L, 0.230769)))
  }

  test("approx percentiles track the exact report within sketch tolerance") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 200 English docs with linearly growing token counts — enough spread
    // that a grossly wrong sketch would miss by far more than the bound.
    val docs = (1 to 200).map(i =>
      (i.toLong, "the and for are with this that have from they " + "w " * i))
      .toDF("doc_id", "text")
    def report(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      f(docs).where(col("predicted_lang") === "en").collect().head
    val exact = report(TextAnalysis.qualityPercentiles(_))
    val approx = report(TextAnalysis.qualityPercentilesApprox(_))
    for (c <- Seq("p50_n_tokens", "p90_n_tokens", "p99_n_tokens")) {
      val e = exact.getAs[Double](c); val a = approx.getAs[Double](c)
      // GK sketch at accuracy 10000 over 200 rows is near-exact; the
      // bound below is loose (±1 rank step of ~2 tokens) on purpose.
      assert(math.abs(e - a) <= 4.0, s"$c: exact $e vs approx $a")
    }
  }

  test("qualityPercentilesAudit: exact percentiles with the rank contract true") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = (1 to 200).map(i =>
      (i.toLong, "the and for are with this that have from they " + "w " * i))
      .toDF("doc_id", "text")
    val row = TextAnalysis.qualityPercentilesAudit(docs)
      .where(col("predicted_lang") === "en").collect().head
    assert(row.getAs[Long]("n_docs") === 200L)
    // Exact values match the exact report (same staging, same estimator).
    val exact = TextAnalysis.qualityPercentiles(docs)
      .where(col("predicted_lang") === "en").collect().head
    for (c <- Seq("p50_n_tokens", "p90_n_tokens", "p99_n_tokens"))
      assert(row.getAs[Double](c) === exact.getAs[Double](c), c)
    for (c <- Seq("p50_ok", "p90_ok", "p99_ok"))
      assert(row.getAs[Boolean](c), s"$c: GK estimate outside the rank bracket")
  }

  test("valueMoments: exact moments from decimal sums, hand-checked") {
    import spark.implicits._
    // Quantities 2, 4, 6 → mean 4, sample variance 4, stddev 2.
    val li = Seq(("R", 2.0), ("R", 4.0), ("R", 6.0), ("A", 5.0))
      .toDF("l_returnflag", "l_quantity")
    val out = Profile.valueMoments(li).collect()
      .map(r => r.getString(0) -> r).toMap
    val rrow = out("R")
    assert(rrow.getLong(1) === 3L)
    assert(rrow.getDouble(2) === 4.0)
    assert(rrow.getDouble(3) === 4.0)
    assert(rrow.getDouble(4) === 2.0)
    // Single-row group: variance is null (n-1 = 0), not a crash.
    assert(out("A").isNullAt(3) && out("A").isNullAt(4))
  }

  test("valueMoments: zero-variance group is exactly 0, never NaN") {
    import spark.implicits._
    // Two equal 0.1 rows: s1*s1/n = 0.020000000000000004 > s2 = 0.02 in
    // doubles — unclamped, variance goes -3.5e-18 and sqrt turns NaN (and
    // the DuckDB twin ERRORS on a negative sqrt).
    val li = Seq(("R", 0.1), ("R", 0.1)).toDF("l_returnflag", "l_quantity")
    val row = Profile.valueMoments(li).collect().head
    assert(row.getDouble(3) === 0.0)
    assert(row.getDouble(4) === 0.0)
  }

  test("valueMoments fast path: double sums agree with exact at small scale") {
    import spark.implicits._
    val li = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 5.0))
      .toDF("l_returnflag", "l_quantity")
    def rows(exact: Boolean) = Profile.valueMoments(li, exact).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), Option(r.get(3))))).toMap
    assert(rows(exact = true) === rows(exact = false))
    assert(rows(exact = false)("A") === ((3L, 2.0, Some(1.0))))
  }

  test("pairMoments: covariance and correlation from exact sums, hand-checked") {
    import spark.implicits._
    // Group A: (1,2),(2,4),(3,6) — perfectly linear → corr 1, cov 2.
    // Group B: (1,10),(2,10) — zero y-variance → corr null, cov 0.
    // Group C: single row — both null.
    val li = Seq(
      ("A", 1.0, 2.0), ("A", 2.0, 4.0), ("A", 3.0, 6.0),
      ("B", 1.0, 10.0), ("B", 2.0, 10.0),
      ("C", 5.0, 5.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val out = Profile.pairMoments(li).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out("A") === ((3L, Some(2.0), Some(1.0))))
    assert(out("B") === ((2L, Some(0.0), None)))
    assert(out("C") === ((1L, None, None)))
  }

  test("zscoreOutliers flags only beyond-threshold rows, stats broadcast") {
    import spark.implicits._
    import java.sql.Timestamp
    // 10 clicks at 10.0 and one at 1000.0: the spike's z is ~3.02σ (the
    // outlier inflates σ itself), the baseline rows sit at ~-0.3σ.
    val t0 = Timestamp.valueOf("2026-01-01 10:00:00")
    val ev = ((1 to 10).map(i => (i.toLong, t0, i.toLong, "click", 10.0)) :+
      ((99L, t0, 99L, "click", 1000.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Profile.zscoreOutliers(ev, threshold = 3.0)
    val out = q.collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(out.length === 1)
    assert(out.head._1 === 99L)
    assert(out.head._2 > 3.0 && out.head._2 < 3.2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"per-type stats must broadcast back, not shuffle the facts:\n$plan")
  }

  test("robustOutliers: MAD screen flags the spike z-score misses, guards MAD=0") {
    import spark.implicits._
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2026-01-01 10:00:00")
    // Group "click": med=12.5, MAD=1.5 → spike robust_z ≈ 444 (flagged);
    // the same spike's classic z is only ~2.2σ because it inflates σ.
    // Group "view": all-equal values → MAD=0 → guarded out entirely.
    val ev = (Seq(10.0, 11.0, 12.0, 13.0, 14.0, 1000.0).zipWithIndex.map {
      case (v, i) => ((i + 1).toLong, t0, 1L, "click", v)
    } ++ (1 to 5).map(i => ((100 + i).toLong, t0, 2L, "view", 7.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Profile.robustOutliers(ev)
    val out = q.collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(out.length === 1)
    assert(out.head._1 === 6L)
    assert(out.head._2 > 400 && out.head._2 < 500)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"median/MAD tables must broadcast back, not shuffle the facts:\n$plan")
  }

  test("psi: identical halves score 0; a full bin shift crosses the drift bar") {
    import spark.implicits._
    import java.sql.Timestamp
    def ev(rows: (Long, Double)*) = rows.zipWithIndex.map {
      case ((sec, v), i) =>
        ((i + 1).toLong, new Timestamp(sec * 1000L), 1L, "click", v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    // lo=0 s, hi=103 s → integer-µs midpoint 51.5 s: the first four rows
    // are the base window, the last four the current one.
    val same = ev((0L, 10.0), (1L, 10.0), (2L, 10.0), (3L, 10.0),
      (100L, 10.0), (101L, 10.0), (102L, 10.0), (103L, 10.0))
    val r0 = Profile.psi(same).collect().head
    assert(r0.getLong(0) === 4L && r0.getLong(1) === 4L)
    assert(r0.getInt(2) === Profile.PsiBins)
    assert(r0.getDouble(3) === 0.0)
    assert(r0.getBoolean(4) && !r0.getBoolean(5)) // stable, not drifted
    // Current half moves wholesale from bin 0 to bin 10: hand PSI =
    // 2 · (4/14) · ln 9 (two mirrored occupied bins; empty bins cancel
    // because the side totals are equal) = 1.255557 at the nano round.
    val moved = ev((0L, 10.0), (1L, 10.0), (2L, 10.0), (3L, 10.0),
      (100L, 510.0), (101L, 510.0), (102L, 510.0), (103L, 510.0))
    val r1 = Profile.psi(moved).collect().head
    assert(r1.getDouble(3) === 1.255557)
    assert(!r1.getBoolean(4) && r1.getBoolean(5)) // drifted
  }

  test("tTest: Welch statistic and df match the hand computation") {
    import spark.implicits._
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2026-01-01 10:00:00")
    // view: 10,12,14 → n=3, mean=12, var=4; purchase: 20,20,20 → var=0.
    // se² = 4/3; t = −8/√(4/3) ≈ −6.928203; df = (4/3)²/((4/3)²/2) = 2.
    val ev = (Seq(10.0, 12.0, 14.0).zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, t0, 1L, "view", v)
    } ++ Seq(20.0, 20.0, 20.0).zipWithIndex.map { case (v, i) =>
      ((10 + i).toLong, t0, 2L, "purchase", v)
    } :+ ((99L, t0, 3L, "click", 1e9))) // other types never contaminate
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Profile.tTest(ev).head()
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 3L)
    assert(r.getAs[Double]("mean_a") === 12.0)
    assert(r.getAs[Double]("mean_b") === 20.0)
    assert(math.abs(r.getAs[Double]("t_stat") - -6.928203) < 1e-6)
    assert(r.getAs[Double]("welch_df") === 2.0)
    assert(!r.getAs[Boolean]("same_mean_05"))
  }

  test("autocorrelation: linear series reads 1.0 at every lag, constant reads null") {
    import spark.implicits._
    import java.sql.Timestamp
    def hr(i: Int) = Timestamp.valueOf(f"2026-01-01 ${9 + i}%02d:00:00")
    // click: one event per hour, value = hour index (linear ⇒ r = 1 at
    // every lag); view: constant series ⇒ zero variance ⇒ null r.
    val ev = ((0 until 6).map(i =>
      ((i + 1).toLong, hr(i), 1L, "click", i.toDouble)) ++
      (0 until 5).map(i => ((20 + i).toLong, hr(i), 2L, "view", 7.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Profile.autocorrelation(ev).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    assert(out(("click", 1)) === ((5L, Some(1.0))))
    assert(out(("click", 2)) === ((4L, Some(1.0))))
    assert(out(("click", 3)) === ((3L, Some(1.0))))
    assert(out(("view", 1)) === ((4L, None))) // vx = 0 → guarded null
  }

  test("movingStats: frame average and lag delta, deterministic tie order") {
    import java.sql.Timestamp
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, "view", 10.0),
      (2L, ts("2026-01-01 10:00:30"), 1L, "view", 20.0),
      (3L, ts("2026-01-01 10:01:00"), 1L, "view", 60.0),
      (9L, ts("2026-01-01 10:00:00"), 2L, "view", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = WindowOps.movingStats(events).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Double]("ma5"), Option(r.get(4)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(out(1L) === ((10.0, None)))          // first row: no lag
    assert(out(2L) === ((15.0, Some(10.0))))    // avg(10,20), delta 20-10
    assert(out(3L) === ((30.0, Some(40.0))))    // avg(10,20,60)
    assert(out(9L) === ((5.0, None)))           // other user isolated
  }

  test("qualityPercentiles: exact interpolated percentiles per language") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 4 English docs with token counts 12, 14, 16, 18 → p50 = 15 (midpoint
    // interpolation), p90 = 17.4, p99 = 17.94.
    val docs = Seq(
      (1L, "the and for are with this that have from they " + "w " * 2),
      (2L, "the and for are with this that have from they " + "w " * 4),
      (3L, "the and for are with this that have from they " + "w " * 6),
      (4L, "the and for are with this that have from they " + "w " * 8))
      .toDF("doc_id", "text")
    val row = TextAnalysis.qualityPercentiles(docs)
      .where(col("predicted_lang") === "en").collect().head
    assert(row.getAs[Long]("n_docs") === 4L)
    assert(row.getAs[Double]("p50_n_tokens") === 15.0)
    assert(math.abs(row.getAs[Double]("p90_n_tokens") - 17.4) < 1e-9)
    assert(math.abs(row.getAs[Double]("p99_n_tokens") - 17.94) < 1e-9)
  }

  test("chiSquareCells: observed/expected/contrib hand-checked on a 2x2") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // N=100; rows x=40, y=60; cols u=40, v=60 → expected xu=16, xv=24,
    // yu=24, yv=36; contrib = (obs-exp)²/exp.
    val df = (Seq.fill(30)(("x", "u")) ++ Seq.fill(10)(("x", "v")) ++
      Seq.fill(10)(("y", "u")) ++ Seq.fill(50)(("y", "v")))
      .toDF("ca", "cb").repartition(4)
    val cells = Profile.chiSquareCells(df, col("ca"), col("cb")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(cells(("x", "u")) === ((30L, 16.0, 12.25)))
    assert(cells(("x", "v")) === ((10L, 24.0, 8.166667)))
    assert(cells(("y", "u")) === ((10L, 24.0, 8.166667)))
    assert(cells(("y", "v")) === ((50L, 36.0, 5.444444)))
  }

  test("chiSquareStat: statistic, dof, Cramér's V; exact independence → 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dep = (Seq.fill(30)(("x", "u")) ++ Seq.fill(10)(("x", "v")) ++
      Seq.fill(10)(("y", "u")) ++ Seq.fill(50)(("y", "v")))
      .toDF("ca", "cb")
    val s = Profile.chiSquareStat(dep, col("ca"), col("cb")).collect().head
    assert(s.getDouble(0) === 34.027778) // Σ of the four contributions
    assert(s.getLong(1) === 1L && s.getLong(2) === 100L)
    assert(s.getDouble(3) === 0.583333) // √(χ²/N·1)
    // Proportional counts (independence): χ² and V are exactly 0.
    val ind = (Seq.fill(20)(("x", "u")) ++ Seq.fill(40)(("x", "v")) ++
      Seq.fill(10)(("y", "u")) ++ Seq.fill(20)(("y", "v")))
      .toDF("ca", "cb")
    val i = Profile.chiSquareStat(ind, col("ca"), col("cb")).collect().head
    assert(i.getDouble(0) === 0.0 && i.getDouble(3) === 0.0)
  }

  test("checkConstraints: clean table passes all checks, violations flagged") {
    import spark.implicits._
    val clean = (1L to 50L)
      .map(i => (i, Some(i % 7), "click", 1.0 + i))
      .toDF("event_id", "user_id", "event_type", "value")
    val ok = Profile.checkConstraints(clean).collect()
    assert(ok.length === 6)
    assert(ok.forall(_.getBoolean(3)), s"clean table must pass all checks")
    // One duplicate id, one null user, one bogus type, one out-of-range
    // value → uniqueness, completeness(user_id), domain, range fail;
    // row_count and completeness(value) still pass.
    val dirty = clean.union(Seq(
      (1L, Option.empty[Long], "bogus", -5.0))
      .toDF("event_id", "user_id", "event_type", "value"))
    val verdicts = Profile.checkConstraints(dirty).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(3)).toMap
    assert(verdicts(("uniqueness", "event_id")) === false)
    assert(verdicts(("completeness", "user_id")) === false)
    assert(verdicts(("domain", "event_type")) === false)
    assert(verdicts(("range", "value")) === false)
    assert(verdicts(("row_count", "*")) === true)
    assert(verdicts(("completeness", "value")) === true)
  }

  test("correlationMatrix: one pass, hand-checked pairs, null on zero variance") {
    import spark.implicits._
    // y = 2x (corr 1), z anti-correlated with x, w constant (variance 0).
    val df = Seq(
      (1.0, 2.0, 3.0, 5.0), (2.0, 4.0, 2.0, 5.0), (3.0, 6.0, 1.0, 5.0))
      .toDF("x", "y", "z", "w").repartition(2)
    val out = Profile.correlationMatrix(df, Seq("x", "y", "z", "w"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out.size === 6) // 4 choose 2
    assert(out(("x", "y")) === Some(1.0))
    assert(out(("x", "z")) === Some(-1.0))
    assert(out(("y", "z")) === Some(-1.0))
    assert(out(("x", "w")) === None) // zero variance → null, never NaN
    // Single aggregation: no join, one Expand-free agg over one scan.
    val plan = Profile.correlationMatrix(df, Seq("x", "y", "z"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"matrix must not join per pair:\n$plan")
  }

  test("quantileBins: equal-frequency bins on a uniform column, shares sum to 1") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("e", i.toDouble)).toDF("pad", "value")
      .repartition(5)
    val out = Profile.quantileBins(df, nBins = 4).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // Edges p25/p50/p75 = 25.75/50.5/75.25 → four bins of exactly 25.
    assert(out === Map(
      1 -> ((25L, 0.25)), 2 -> ((25L, 0.25)),
      3 -> ((25L, 0.25)), 4 -> ((25L, 0.25))))
    // Approx face: same bin count, all rows assigned, shares sum to 1.
    val approx = Profile.quantileBins(df, nBins = 4, exact = false).collect()
    assert(approx.length === 4)
    assert(approx.map(_.getLong(1)).sum === 100L)
    assert(math.abs(approx.map(_.getDouble(2)).sum - 1.0) < 1e-6)
  }

  test("checkConstraints approx: HLL uniqueness passes within tolerance, no Expand") {
    import spark.implicits._
    val clean = (1L to 500L)
      .map(i => (i, Some(i % 7), "view", 2.0))
      .toDF("event_id", "user_id", "event_type", "value")
    val out = Profile.checkConstraints(clean, exact = false)
    assert(out.collect().forall(_.getBoolean(3)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"approx constraints must not Expand the scan:\n$plan")
  }

  test("embeddingProfile: closed-form per-dimension stats") {
    import spark.implicits._
    // dim0: {1.0, 3.0} -> mean 2, var 2; dim1: {2.0, 2.0} -> var 0.
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val out = Profile.embeddingProfile(df).collect()
      .map(r => r.getAs[Int]("dim") -> r).toMap
    assert(out(0).getAs[Long]("n") === 2L)
    assert(out(0).getAs[Double]("mean") === 2.0)
    assert(out(0).getAs[Double]("variance") === 2.0)
    assert(out(0).getAs[Double]("min_x") === 1.0)
    assert(out(0).getAs[Double]("max_x") === 3.0)
    assert(out(1).getAs[Double]("variance") === 0.0)
    assert(out(1).getAs[Double]("std") === 0.0)
  }

  test("ksTest: closed-form D on separated samples; shift detected at 5%") {
    import spark.implicits._
    import java.sql.Timestamp
    // view values {1..10}, purchase values {11..20}: fully separated ->
    // D = 1.0, far above crit.
    val ev = ((1 to 10).map(i => (i.toLong, new Timestamp(i * 1000L), 1L,
      "view", i.toDouble, "")) ++
      (1 to 10).map(i => (100L + i, new Timestamp(i * 1000L), 1L,
        "purchase", 10.0 + i, "")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Profile.ksTest(ev).head()
    assert(r.getAs[Double]("ks_d") === 1.0)
    assert(!r.getAs[Boolean]("same_dist_05"))
    assert(r.getAs[Long]("n_a") === 10L && r.getAs[Long]("n_b") === 10L)
  }

  test("ksTest: identical samples give D = 0 and pass") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = (1 to 8).flatMap(i => Seq(
      (i.toLong, new Timestamp(i * 1000L), 1L, "view", i.toDouble, ""),
      (50L + i, new Timestamp(i * 1000L), 1L, "purchase", i.toDouble, "")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Profile.ksTest(ev).head()
    assert(r.getAs[Double]("ks_d") === 0.0)
    assert(r.getAs[Boolean]("same_dist_05"))
  }
}
