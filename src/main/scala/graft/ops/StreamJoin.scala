package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream attribution join — the last-touch marketing staple: each
  * purchase joins every view by the same user in the preceding
  * `horizonMinutes`. One operator, two execution faces:
  *
  *   - BATCH: a plain equi-join on user plus the time-range predicate —
  *     Catalyst plans the user-key shuffle and filters the range inside
  *     the joined partitions (per-user event counts are small, so the
  *     within-key product is bounded).
  *   - STREAMING: callers put `withWatermark` on BOTH sides and Spark
  *     runs it as a watermarked stream-stream inner join; the time-range
  *     condition bounds each side's state — a view is held only until the
  *     watermark passes `view_ts + horizon`, which is exactly the state
  *     eviction story a 100 TB/day stream needs (unbounded state is the
  *     stream-join failure mode, and the range predicate is what prevents
  *     it).
  */
object StreamJoin {

  /** (purchase_id, user_id, purchase_s, view_id, view_s, lag_s) — one row
    * per (purchase, qualifying prior view), inclusive on both ends:
    * views at the purchase instant attribute (same-second semantics as
    * the funnel's at-or-after rule).
    */
  def purchaseAttribution(
      events: DataFrame,
      horizonMinutes: Int = 60): DataFrame = {
    require(horizonMinutes > 0,
      s"attribution horizon must be positive, got $horizonMinutes")
    val purchases = events
      .where(col("event_type") === "purchase" && col("ts").isNotNull)
      .select(col("event_id").alias("purchase_id"),
        col("user_id"), col("ts").alias("p_ts"))
    val views = events
      .where(col("event_type") === "view" && col("ts").isNotNull)
      .select(col("event_id").alias("view_id"),
        col("user_id").alias("v_user"), col("ts").alias("v_ts"))
    purchases
      .join(views,
        col("user_id") === col("v_user") &&
          col("v_ts") >= col("p_ts") - expr(s"INTERVAL $horizonMinutes MINUTES") &&
          col("v_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("user_id"),
        col("p_ts").cast("long").alias("purchase_s"),
        col("view_id"), col("v_ts").cast("long").alias("view_s"),
        (col("p_ts").cast("long") - col("v_ts").cast("long")).alias("lag_s"))
  }
}
