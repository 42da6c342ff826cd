package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analytics: how far does each user progress through the
  * view → click → purchase sequence, where every stage must occur at or
  * after the stage before it? The product-analytics staple over an event
  * stream.
  *
  * Plan shape: the stage timestamps are computed as THREE chained
  * whole-partition window aggregates over the SAME `user_id` hash
  * partitioning — each stage's predicate references the previous stage's
  * column, which is exactly what the sequential window chain expresses
  * without re-shuffling (one Exchange, three Window operators, and the
  * final per-user collapse reuses the partitioning). No joins, no second
  * shuffle; at 100 TB the cost is one hash exchange of
  * (user_id, type, ts) triples.
  */
object Funnel {

  /** Per user: epoch-second of the first view, the first click at/after
    * that view, the first purchase at/after that click, and the funnel
    * stage reached (0 = none, 3 = purchased). Unreached stages are null.
    */
  def conversion(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val ev = events.where(col("ts").isNotNull)
      .select(col("user_id"), col("event_type"),
        col("ts").cast("long").alias("ts_sec"))
    val staged = ev
      .withColumn("view_s",
        min(when(col("event_type") === "view", col("ts_sec"))).over(w))
      .withColumn("click_s",
        min(when(col("event_type") === "click" &&
          col("ts_sec") >= col("view_s"), col("ts_sec"))).over(w))
      .withColumn("purchase_s",
        min(when(col("event_type") === "purchase" &&
          col("ts_sec") >= col("click_s"), col("ts_sec"))).over(w))
    // The stage columns are constant within a user; max() collapses the
    // per-event rows to one row per user without another distinct pass.
    staged.groupBy(col("user_id"))
      .agg(
        max(col("view_s")).alias("first_view_s"),
        max(col("click_s")).alias("first_click_s"),
        max(col("purchase_s")).alias("first_purchase_s"))
      .select(col("user_id"), col("first_view_s"), col("first_click_s"),
        col("first_purchase_s"),
        when(col("first_purchase_s").isNotNull, 3)
          .when(col("first_click_s").isNotNull, 2)
          .when(col("first_view_s").isNotNull, 1)
          .otherwise(0).cast("int").alias("stage"))
  }
}
