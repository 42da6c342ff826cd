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
}
