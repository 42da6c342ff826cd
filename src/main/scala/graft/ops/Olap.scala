package graft.ops

import org.apache.spark.sql.DataFrame
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
}
