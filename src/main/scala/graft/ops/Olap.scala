package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic OLAP reshaping over the event stream: pivot (long → wide) and
  * rollup (hierarchical subtotals). Both are single-aggregation plans —
  * pivot with EXPLICIT value lists (an implicit pivot runs a distinct
  * scan first and cannot be planned in one pass; at 100 TB the value
  * list is schema knowledge, not data discovery), rollup as one Expand
  * aggregate rather than a UNION of per-level scans.
  */
object Olap {

  /** The event types pivoted into columns — schema knowledge shared with
    * the oracle twin.
    */
  val EventTypes = Seq("click", "view", "purchase")

  /** Events long → wide: one row per user, one count column per event
    * type. Explicit values keep it one aggregation pass.
    */
  def pivotEventCounts(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .select(col("user_id") +: EventTypes.map(t =>
        col(s"`$t`").alias(s"n_$t")): _*)

  /** Wide → long, [[pivotEventCounts]]' inverse: the lineitem measure
    * columns melt into (measure, value) rows and aggregate per
    * (returnflag, measure) — the reshape feeding any "one metric per row"
    * report or metric store. `unpivot` plans as an Expand (map-side row
    * replication, factor = #measures, no shuffle of its own); the only
    * exchange is the few-group aggregate after it. Sums are decimal-exact
    * per the usual cross-engine argument.
    */
  def unpivotMeasures(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_returnflag"), col("l_quantity"), col("l_discount"),
        col("l_tax"))
      .unpivot(
        ids = Array(col("l_returnflag")),
        values = Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        variableColumnName = "measure",
        valueColumnName = "value")
      .groupBy(col("l_returnflag"), col("measure"))
      .agg(
        count(lit(1)).alias("n"),
        sum(col("value").cast("decimal(14,4)")).cast("double")
          .alias("sum_value"))

  /** Hierarchical subtotals: (event_type, value-band) → event_type →
    * grand total, in ONE pass (Expand), with `grouping(...)` flags so a
    * consumer can tell a subtotal row from a data row whose key is null.
    */
  def rollupEventStats(events: DataFrame): DataFrame =
    events
      .where(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") / 10).cast("int").alias("value_band"),
        col("value"))
      .rollup(col("event_type"), col("value_band"))
      // grouping() is only resolvable INSIDE the rollup aggregation.
      .agg(
        grouping(col("event_type")).cast("int").alias("g_type"),
        grouping(col("value_band")).cast("int").alias("g_band"),
        count(lit(1)).alias("n"),
        round(sum(col("value")), 4).alias("sum_value"))
      .select(col("event_type"), col("value_band"),
        col("g_type"), col("g_band"), col("n"), col("sum_value"))

  /** Every subtotal combination — rollup's lattice completed with the
    * per-band-across-types slice. Same one-Expand plan (4 grouping sets
    * instead of rollup's 3); the Expand factor is the number of sets, so
    * cube's cost grows 2^keys — keep the key list short by design.
    */
  def cubeEventStats(events: DataFrame): DataFrame =
    events
      .where(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") / 10).cast("int").alias("value_band"),
        col("value"))
      .cube(col("event_type"), col("value_band"))
      .agg(
        grouping(col("event_type")).cast("int").alias("g_type"),
        grouping(col("value_band")).cast("int").alias("g_band"),
        count(lit(1)).alias("n"),
        round(sum(col("value")), 4).alias("sum_value"))
      .select(col("event_type"), col("value_band"),
        col("g_type"), col("g_band"), col("n"), col("sum_value"))

  /** Arbitrary subtotal sets — the general form rollup and cube are
    * special cases of: here (type, band) leaf cells plus BOTH one-key
    * slices, but NO grand total — a lattice neither rollup (no band
    * slice) nor cube (forces the grand total) can express. Still ONE
    * Expand aggregate; the Expand factor is the number of sets (3), so
    * cost is explicit and chosen, not 2^keys.
    */
  def groupingSetsStats(events: DataFrame): DataFrame = {
    val typed = events
      .where(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") / 10).cast("int").alias("value_band"),
        col("value"))
    typed
      .groupingSets(
        Seq(
          Seq(col("event_type"), col("value_band")),
          Seq(col("event_type")),
          Seq(col("value_band"))),
        col("event_type"), col("value_band"))
      .agg(
        grouping(col("event_type")).cast("int").alias("g_type"),
        grouping(col("value_band")).cast("int").alias("g_band"),
        count(lit(1)).alias("n"),
        round(sum(col("value")), 4).alias("sum_value"))
      .select(col("event_type"), col("value_band"),
        col("g_type"), col("g_band"), col("n"), col("sum_value"))
  }

  /** Daily active users: per (day, event_type), the exact distinct user
    * count plus raw event count. Spark plans the distinct as two
    * aggregations (partial on (day, type, user), then the final count) —
    * both map-side-combinable, so the shuffle carries one row per distinct
    * triple, not one per event. The exact twin of [[dailyActiveUsersApprox]].
    */
  def dailyActiveUsers(events: DataFrame): DataFrame =
    events.where(col("ts").isNotNull)
      .select(date_format(col("ts"), "yyyy-MM-dd").alias("day"),
        col("event_type"), col("user_id"))
      .groupBy(col("day"), col("event_type"))
      .agg(countDistinct(col("user_id")).alias("n_users"),
        count(lit(1)).alias("n_events"))

  /** Week-over-week movement per event type: daily activity compared to
    * the same weekday one week earlier — the period-over-period report
    * behind "is this Tuesday normal", computed join-free: ONE map-side-
    * combined daily groupBy, then `lag(7)` over the bounded (type × day)
    * table (a self-join formulation would shuffle the day table twice).
    * Day buckets are pure epoch arithmetic (timezone-free); the change
    * ratio is null for the first week (no baseline), never a fake 0.
    */
  def weekOverWeek(events: DataFrame): DataFrame = {
    val daily = events.where(col("ts").isNotNull)
      .groupBy(col("event_type"),
        expr("CAST(CAST(ts AS LONG) div 86400 AS BIGINT)").alias("day"))
      .agg(count(lit(1)).alias("n_events"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .withColumn("prev_week", lag(col("n_events"), 7).over(w))
      .withColumn("prev_day", lag(col("day"), 7).over(w))
      // lag(7) is "7 rows back": only a true calendar week counts as a
      // baseline — gaps in the day sequence must not masquerade as one.
      .withColumn("baseline",
        when(col("prev_day") === col("day") - 7, col("prev_week")))
      .select(col("event_type"), col("day"), col("n_events"),
        col("baseline").alias("prev_week_events"),
        round(when(col("baseline") > 0,
          (col("n_events") - col("baseline")).cast("double") /
            col("baseline")), 6).alias("wow_change"))
  }

  /** Seasonal-naive FORECAST BASELINE evaluation: predict each day's
    * activity with the same weekday one week earlier (the baseline every
    * forecasting effort must beat) and report per-type MAE/MAPE over the
    * evaluable days — composed directly on [[weekOverWeek]]'s daily
    * table, so the baseline definition cannot drift from the report.
    * MAE derives from exact integer error sums; MAPE stages the per-day
    * ratio through an 8-dp DECIMAL so the average is order-independent
    * (a raw double sum of fractions would hash-drift with partitioning).
    */
  def seasonalNaiveEval(events: DataFrame): DataFrame = {
    val err = abs(col("n_events") - col("prev_week_events"))
    val r8 = round(err.cast("double") / col("prev_week_events"), 8)
      .cast("decimal(20,8)")
    weekOverWeek(events)
      .where(col("prev_week_events").isNotNull &&
        col("prev_week_events") > 0)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).alias("n_eval"),
        sum(err).alias("abs_err_sum"),
        sum(r8).alias("r8_sum"))
      .select(col("event_type"), col("n_eval"),
        round(col("abs_err_sum").cast("double") / col("n_eval"), 6)
          .alias("mae"),
        round((col("r8_sum") / col("n_eval")).cast("double"), 6)
          .alias("mape"))
  }

  /** Benford first-digit screen over the value column: observed share of
    * each leading digit vs Benford's log10(1 + 1/d) expectation, with
    * per-digit deviation — the classic fabricated-numbers / broken-ETL
    * smell test. ONE map-side-combined groupBy on a 9-value key; the
    * expectation is a literal, so everything after the count is free.
    * (The synthetic uniform fixture does NOT follow Benford — the report
    * honestly shows the deviation; the operator's job is measurement.)
    */
  def benfordScreen(events: DataFrame): DataFrame = {
    // Digit derived ARITHMETICALLY (value / 10^floor(log10 value)), not
    // from the engine's double→string rendering: the string form only
    // agreed across engines by accident of their formatters and breaks
    // on non-finite values. Non-finite inputs are filtered, not clamped
    // (abs(x) <= MaxValue is false for ±Inf; isnan catches NaN).
    val av = abs(col("value"))
    val digit = floor(av / pow(lit(10.0), floor(log10(av)))).cast("int")
    // Materialized: the 9-row digit table feeds both the total and the
    // report — without it the corpus-scale count replays per consumer.
    val counts = Materialize(events
      .where(col("value").isNotNull && !isnan(col("value")) &&
        abs(col("value")) <= Double.MaxValue && abs(col("value")) >= 1)
      .groupBy(digit.alias("digit"))
      .agg(count(lit(1)).alias("n")))
    val total = counts.agg(sum(col("n")).alias("t"))
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("t"), 6).alias("observed"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 6).alias("expected"))
      .withColumn("abs_dev",
        round(abs(col("observed") - round(log10(lit(1.0) + lit(1.0) /
          col("digit")), 6)), 6))
  }

  /** Incremental aggregate MAINTENANCE: yesterday's per-key state merged
    * with today's delta — the pattern that turns a daily 100 TB full
    * rescan into a delta-sized job. Only mergeable aggregates ride the
    * state (count/sum/min/max; avg DERIVES from the merged sums — an avg
    * column itself would not merge), sums DECIMAL-staged so
    * state + delta = full-history exactly.
    *
    * The registered query's oracle is the FULL recompute over all
    * history, so the hash check proves the merge law itself: merging the
    * two partial aggregates reproduces the scan-everything answer bit for
    * bit. The full-outer key join handles keys that exist on one side
    * only (a brand-new user in the delta, a dormant one in the state).
    */
  def incrementalMerge(
      events: DataFrame,
      cutSec: Long = 1705363200L): DataFrame = {
    val v = col("value").cast("decimal(18,6)")
    val ev = events.where(col("ts").isNotNull)
      .select(col("user_id"), col("event_type"), col("value"),
        col("ts").cast("long").alias("s"))
    def part(df: DataFrame, tag: String): DataFrame =
      df.groupBy(col("user_id"), col("event_type")).agg(
        count(lit(1)).alias(s"n_$tag"), sum(v).alias(s"sv_$tag"),
        min(col("value")).alias(s"mn_$tag"),
        max(col("value")).alias(s"mx_$tag"))
    val merged = part(ev.where(col("s") < cutSec), "a")
      .join(part(ev.where(col("s") >= cutSec), "b"),
        Seq("user_id", "event_type"), "full_outer")
    val n = coalesce(col("n_a"), lit(0L)) + coalesce(col("n_b"), lit(0L))
    val sv = when(col("sv_a").isNull && col("sv_b").isNull,
      lit(null).cast("decimal(28,6)"))
      .otherwise(coalesce(col("sv_a"), lit(0).cast("decimal(18,6)")) +
        coalesce(col("sv_b"), lit(0).cast("decimal(18,6)")))
    merged.select(col("user_id"), col("event_type"),
      n.alias("n"),
      round(sv.cast("double"), 6).alias("total_value"),
      least(col("mn_a"), col("mn_b")).alias("min_value"),
      greatest(col("mx_a"), col("mx_b")).alias("max_value"),
      round(sv.cast("double") / n, 6).alias("avg_value"))
  }

  /** Seasonality heatmap: activity and value by (day-of-week, hour-of-day,
    * event type) — the traffic-shape matrix behind capacity planning and
    * "is this Tuesday normal" checks. Day/hour derive from pure epoch
    * arithmetic (`div`/`%`, Thursday-anchored dow), never calendar
    * functions, so the bucketing is timezone-free and engine-identical;
    * value sums go through DECIMAL per the [[pricingSummary]] exactness
    * argument. ONE map-side-combined groupBy over a 7×24×|types|-bounded
    * key space.
    */
  def seasonality(events: DataFrame): DataFrame = {
    val v = col("value").cast("decimal(18,6)")
    events.where(col("ts").isNotNull)
      .select(col("event_type"), col("value"),
        col("ts").cast("long").alias("s"))
      .groupBy(
        expr("CAST((s div 86400 + 4) % 7 AS INT)").alias("dow"),
        expr("CAST((s div 3600) % 24 AS INT)").alias("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).alias("n_events"),
        sum(v).cast("double").alias("sv"))
      .select(col("dow"), col("hour"), col("event_type"), col("n_events"),
        round(col("sv"), 6).alias("total_value"),
        round(col("sv") / col("n_events"), 6).alias("avg_value"))
  }

  /** TPC-H Q1-style pricing summary over `lineitem` — the canonical
    * scan-heavy aggregate (a handful of groups over the whole fact table).
    * Money/quantity columns are summed as DECIMAL, not double: a
    * four-group sum over a 100 TB fact table accumulates ~n·ε·Σ|x| of
    * float error — far beyond any rounding a result column could absorb —
    * while decimal sums are exact, order-independent, and identical on
    * every engine. The per-group averages then derive from the exact sums
    * (one division, not a second aggregate). Plan: partial aggregation
    * map-side, a 6-row shuffle — the scan is the whole cost, as it should
    * be.
    */
  def pricingSummary(
      lineitem: DataFrame,
      shipdateCutoff: String = "1998-09-02"): DataFrame = {
    val qty = col("l_quantity").cast("decimal(12,2)")
    val price = col("l_extendedprice").cast("decimal(12,2)")
    // 2-dp inputs → (1−disc)/(1+tax) are exactly 2-dp; the explicit cast
    // pins the intermediate type so both engines multiply identical
    // decimals (Spark would otherwise widen the literal 1 to decimal(10,0)
    // and overflow 38 digits in the triple product, losing exactness).
    val discFactor = (lit(1) - col("l_discount").cast("decimal(4,2)"))
      .cast("decimal(5,2)")
    val taxFactor = (lit(1) + col("l_tax").cast("decimal(4,2)"))
      .cast("decimal(5,2)")
    lineitem
      .where(col("l_shipdate") <= lit(shipdateCutoff).cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qty).cast("double").alias("sum_qty"),
        sum(price).cast("double").alias("sum_base_price"),
        sum(price * discFactor).cast("double").alias("sum_disc_price"),
        sum(price * discFactor * taxFactor).cast("double").alias("sum_charge"),
        sum(col("l_discount").cast("decimal(4,2)")).cast("double")
          .alias("sum_disc"),
        count(lit(1)).alias("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        col("sum_qty"), col("sum_base_price"), col("sum_disc_price"),
        col("sum_charge"),
        round(col("sum_qty") / col("count_order"), 6).alias("avg_qty"),
        round(col("sum_base_price") / col("count_order"), 6).alias("avg_price"),
        round(col("sum_disc") / col("count_order"), 6).alias("avg_disc"),
        col("count_order"))
  }

  /** TPC-H Q5-style revenue by nation for one region — the canonical
    * fact-to-fact shuffle join with broadcast dimensions. Join order and
    * strategy are the 100 TB shape: lineitem⋈orders shuffles on orderkey,
    * ⋈customer on custkey (both fact-sized, hash exchange each), while
    * nation/region ride explicit `broadcast()` hints — dimension tables
    * never justify an exchange. The region filter prunes before the
    * broadcast (Catalyst pushes it into the dimension scan). Revenue sums
    * as DECIMAL for the same exactness argument as [[pricingSummary]].
    */
  def revenueByNation(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame,
      region: DataFrame,
      regionName: String = "ASIA"): DataFrame = {
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val discFactor = (lit(1) - col("l_discount").cast("decimal(4,2)"))
      .cast("decimal(5,2)")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === regionName)
      .groupBy(col("n_name"))
      .agg(
        sum(price * discFactor).cast("double").alias("revenue"),
        count(lit(1)).alias("n_items"))
  }

  /** Cohort retention: users grouped by first-activity day (their cohort),
    * counted on each later activity day as a day offset — the
    * product-analytics retention triangle, and the training-data analogue
    * of "how much of each crawl snapshot survives into later epochs".
    *
    * Shape: two aggregations and one join, ALL keyed by or through
    * user_id — the first-seen groupBy partitions by user_id and the
    * events-side join reuses that key, so the fact table shuffles once on
    * user_id and once on the (cohort, offset) pair (tiny: days²/2 groups).
    * No window over the whole table, no self-join on the fact.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val dated = events.where(col("ts").isNotNull)
      .select(col("user_id"), to_date(col("ts")).alias("d"))
    val firstSeen = dated.groupBy(col("user_id"))
      .agg(min(col("d")).alias("cohort_d"))
    dated
      .join(firstSeen, "user_id")
      .groupBy(col("cohort_d"),
        datediff(col("d"), col("cohort_d")).alias("day_offset"))
      .agg(countDistinct(col("user_id")).alias("active_users"))
      .select(col("cohort_d").cast("string").alias("cohort_day"),
        col("day_offset"), col("active_users"))
  }

  /** Fixed-width histogram of `value` with each bin's share of the total —
    * the distribution report every threshold decision starts from.
    * Out-of-range values clamp into the edge bins (a histogram that
    * silently drops rows misreports the distribution it exists to show).
    *
    * Shape: one scan, a map-side-combinable groupBy on the bin id
    * (`bins` groups), and the 1-row total broadcast back for the share —
    * the same bounded scalar-broadcast pattern as [[Profile.keySkew]].
    */
  def valueHistogram(
      events: DataFrame,
      lo: Double = 0.0,
      hi: Double = 100.0,
      bins: Int = 20): DataFrame = {
    require(bins > 0 && hi > lo, s"bad histogram params: [$lo,$hi)/$bins")
    val width = (hi - lo) / bins
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((col("value") - lit(lo)) / lit(width)).cast("int")))
    val counts = events.where(col("value").isNotNull)
      .groupBy(bin.alias("bin"))
      .agg(count(lit(1)).alias("n"))
    val total = counts.agg(sum(col("n")).alias("t"))
    counts.crossJoin(broadcast(total))
      .select(col("bin"),
        round(lit(lo) + col("bin") * lit(width), 6).alias("bin_lo"),
        col("n"),
        round(col("n") / col("t").cast("double"), 6).alias("share"))
  }

  /** [[revenueByNation]] extended with each nation's share of the regional
    * total — percent-of-total over an aggregate via ONE unpartitioned
    * window. Safe ONLY because it runs over the aggregated frame (one row
    * per nation, dimension-bounded); the same window over a fact table
    * would funnel 100 TB through one partition.
    */
  def revenueShareByNation(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame,
      region: DataFrame,
      regionName: String = "ASIA"): DataFrame = {
    val byNation = revenueByNation(
      lineitem, orders, customer, nation, region, regionName)
    // No orderBy → the frame is the whole (nation-count-bounded) partition.
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    byNation.select(col("n_name"), col("revenue"), col("n_items"),
      round(col("revenue") / sum(col("revenue")).over(w), 6).alias("share"))
  }

  /** [[dailyActiveUsers]] with an HLL++ sketch instead of the exact
    * distinct: ONE aggregation pass whose state is a fixed-size sketch per
    * group — at 100 TB the exact variant's expanded (day, type, user)
    * shuffle is the dominant cost and the sketch removes it entirely, at
    * `rsd` relative error. Engine-specific sketch, so no DuckDB twin;
    * OlapSpec bounds the error against the exact counts.
    */
  def dailyActiveUsersApprox(events: DataFrame, rsd: Double = 0.05): DataFrame =
    events.where(col("ts").isNotNull)
      .select(date_format(col("ts"), "yyyy-MM-dd").alias("day"),
        col("event_type"), col("user_id"))
      .groupBy(col("day"), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).alias("n_users_approx"),
        count(lit(1)).alias("n_events"))

  /** Fully oracle-checkable audit of the HLL sketch: per (day, event_type),
    * the exact keys/counts plus `within_tol` — whether the sketch estimate
    * sits within 3·rsd of the exact distinct count. HLL++ merges by
    * register max, so the estimate is a deterministic, partition-order-
    * independent function of the input SET; the oracle (which has no
    * Spark-compatible sketch) asserts `TRUE` for every group, turning the
    * engine-specific sketch into a hash-checkable bounded-error contract
    * instead of a rows-only count. The join runs over the two (day × type)
    * aggregate tables — bounded by the key vocabulary, never by the facts.
    */
  def dailyActiveUsersAudit(events: DataFrame, rsd: Double = 0.05): DataFrame = {
    val approx = dailyActiveUsersApprox(events, rsd)
      .select(col("day"), col("event_type"), col("n_users_approx"))
    dailyActiveUsers(events)
      .join(approx, Seq("day", "event_type"))
      .select(col("day"), col("event_type"), col("n_users"), col("n_events"),
        (abs(col("n_users_approx") - col("n_users")) <=
          greatest(lit(1.0), col("n_users") * (3 * rsd))).alias("within_tol"))
  }

  /** Event-type co-occurrence lift (market-basket association over user
    * behavior): for every unordered pair of event types, the number of
    * users who performed BOTH and the lift
    * `P(a ∧ b) / (P(a)·P(b)) = n_both·U / (n_a·n_b)` — lift > 1 means the
    * behaviors attract, < 1 they repel; the screen behind "do clickers
    * buy?" ([[graft.ops.SetOps]] answers it for one hand-picked pair,
    * this ranks every pair).
    *
    * Plan shape at 100 TB: the one full pass is the (user, type) distinct;
    * everything downstream — the per-user self-join (≤ |types|² rows per
    * user, type vocabularies are small), the marginals, the grand total —
    * runs on that users × types frame. Marginals are vocabulary-sized and
    * broadcast onto the pair counts; all counts are exact longs, the lift
    * one double expression — bit-stable.
    */
  def eventTypeLift(events: DataFrame): DataFrame = {
    val ut = events.select(col("user_id"), col("event_type")).distinct()
    val both = ut.alias("a")
      .join(ut.alias("b"), "user_id")
      .where(col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").alias("type_a"),
        col("b.event_type").alias("type_b"))
      .agg(count(lit(1)).alias("n_both"))
    val marginal = ut.groupBy(col("event_type")).agg(count(lit(1)).alias("m"))
    val total = ut.agg(countDistinct(col("user_id")).alias("n_users"))
    both
      .join(broadcast(marginal.select(col("event_type").alias("type_a"),
        col("m").alias("n_a"))), "type_a")
      .join(broadcast(marginal.select(col("event_type").alias("type_b"),
        col("m").alias("n_b"))), "type_b")
      .crossJoin(broadcast(total))
      .select(col("type_a"), col("type_b"), col("n_both"), col("n_a"),
        col("n_b"),
        // Both products promote to double BEFORE multiplying: long×long
        // n_both·n_users (or n_a·n_b) wraps silently past 2^63 in Spark
        // while the oracle's BIGINT raises — the engines would diverge
        // instead of failing loudly at extreme user counts.
        round(col("n_both").cast("double") * col("n_users") /
          (col("n_a").cast("double") * col("n_b")), 6)
          .alias("lift"))
  }

  /** Weekly active users by RE-AGGREGATING daily DataSketches HLL
    * sketches (`hll_sketch_agg` per day → `hll_union_agg` per week →
    * estimate) — the rollup pattern `approx_count_distinct` cannot
    * express: its sketch is consumed inside one aggregation, while a
    * materialized sketch column unions upward (day → week → month →
    * all-time) without ever rescanning the facts. At 100 TB this is THE
    * distinct-rollup design: persist per-day sketches (a few KB per
    * group), answer any coarser period from sketches alone. Estimates are
    * deterministic — HLL registers are per-bucket maxima, so sketch and
    * union are both order-independent — but engine-specific → rows-only;
    * [[weeklyActiveUsersRollupAudit]] is the oracle-checked contract.
    */
  def weeklyActiveUsersRollup(events: DataFrame, lgK: Int = 12): DataFrame = {
    val daily = events.where(col("ts").isNotNull)
      .select(date_trunc("week", col("ts")).alias("wk"),
        date_format(col("ts"), "yyyy-MM-dd").alias("day"), col("user_id"))
      .groupBy(col("wk"), col("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).alias("sk"))
    daily
      .groupBy(date_format(col("wk"), "yyyy-MM-dd").alias("week"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .alias("n_users_est"),
        count(lit(1)).alias("n_days"))
  }

  /** Oracle-checkable audit of the sketch rollup: per week, the exact
    * distinct users and day count plus `within_tol` — the unioned
    * estimate within 3·(1.04/√2^lgK) relative error (the published HLL
    * standard error for the sketch's register count, floor 1 absolute).
    * Deterministic for a fixed input set, so the oracle pins TRUE.
    */
  def weeklyActiveUsersRollupAudit(
      events: DataFrame, lgK: Int = 12): DataFrame = {
    val approx = weeklyActiveUsersRollup(events, lgK)
      .select(col("week"), col("n_users_est"), col("n_days"))
    val tol = 3 * 1.04 / math.sqrt(math.pow(2, lgK))
    events.where(col("ts").isNotNull)
      .select(date_format(date_trunc("week", col("ts")), "yyyy-MM-dd")
        .alias("week"), col("user_id"))
      .groupBy(col("week"))
      .agg(countDistinct(col("user_id")).alias("n_users"))
      .join(approx, Seq("week"))
      .select(col("week"), col("n_users"), col("n_days"),
        (abs(col("n_users_est") - col("n_users")) <=
          greatest(lit(1.0), col("n_users") * tol)).alias("within_tol"))
  }

  /** File-compaction planner — the lakehouse answer to the SMALL-FILES
    * problem (a 100 TB table written by thousands of streaming
    * micro-batches accumulates millions of KB-scale files; every one
    * costs a scan-task schedule, a footer read, and a namenode entry).
    * Input is a file MANIFEST `(part_key, file_id, bytes)` — metadata,
    * ~millions of rows at 100 TB, never the data itself. Per table
    * partition, files are laid out size-descending (file_id tie-break)
    * and cut into bins at every `targetBytes` of cumulative size: a
    * file's bin is `floor(preceding_bytes / targetBytes)` — the
    * streaming next-fit grouping every compactor (Delta OPTIMIZE,
    * Iceberg rewriteDataFiles) uses, deterministic and rescan-free.
    * Size-descending order packs the big files first so the tail bins
    * collect the small-file long tail into full rewrites.
    *
    * Shape: one window per part_key over scalar metadata — parallel
    * across partitions, no data file is ever read. Integer `div` so both
    * engines cut identically.
    */
  def compactionPlan(files: DataFrame, targetBytes: Long): DataFrame = {
    require(targetBytes > 0,
      s"compaction target must be positive, got $targetBytes")
    val w = Window.partitionBy(col("part_key"))
      .orderBy(col("bytes").desc, col("file_id"))
    files
      .select(col("part_key"), col("file_id"), col("bytes"))
      .withColumn("cum", sum(col("bytes")).over(w))
      .withColumn("bin",
        expr(s"(cum - bytes) div ${targetBytes}L").cast("int"))
      .drop("cum")
  }

  /** Per-bin rollup of [[compactionPlan]] — the compactor's work list:
    * file count, total bytes, and whether the bin reached the target
    * (the last bin per partition is usually a remainder; `is_full = false`
    * bins smaller than one file need no rewrite at all when n_files = 1).
    */
  def compactionBins(files: DataFrame, targetBytes: Long): DataFrame =
    compactionPlan(files, targetBytes)
      .groupBy(col("part_key"), col("bin"))
      .agg(count(lit(1)).cast("int").alias("n_files"),
        sum(col("bytes")).alias("bin_bytes"))
      .withColumn("is_full", col("bin_bytes") >= targetBytes)
}
