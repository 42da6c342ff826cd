package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered window analytics over the event stream — the moving-average /
  * delta family every monitoring dashboard computes. One shuffle (the
  * window partition), one sort, every metric from the same frame; ordering
  * ties broken by event_id so results are deterministic across engines
  * and partitionings.
  */
object WindowOps {

  /** Per user: 5-row moving average of `value` and the delta vs the
    * previous event, ordered by (ts, event_id). Rounded to 6 dp — the
    * sliding-frame average may sum in different orders across engines
    * (segment trees vs running recompute), which 6 dp absorbs.
    */
  def movingStats(events: DataFrame, frameRows: Int = 5): DataFrame = {
    require(frameRows > 0, s"frame must be positive, got $frameRows")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    val frame = w.rowsBetween(-(frameRows - 1), Window.currentRow)
    events
      .where(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("ts").cast("long").alias("ts_sec"), col("value"))
      .select(
        col("event_id"), col("user_id"), col("ts_sec"),
        round(avg(col("value")).over(frame), 6).alias(s"ma$frameRows"),
        round(col("value") - lag(col("value"), 1).over(w), 6).alias("delta"))
  }

  /** Per user, ordered by (ts_sec, event_id): neighbor context (lag/lead
    * of the event type), absolute position (row_number), quartile bucket
    * (ntile 4) and normalized position (percent_rank, cume_dist) — the
    * full ranking-function family off ONE shuffle and ONE sort; every
    * metric shares the same window spec, so Catalyst plans a single
    * Window operator. The event_id tie-break keeps ntile/rank assignment
    * deterministic across engines and partitionings.
    */
  def lagLeadStats(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    events
      .where(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("ts").cast("long").alias("ts_sec"), col("event_type"))
      .select(
        col("event_id"), col("user_id"), col("ts_sec"),
        lag(col("event_type"), 1).over(w).alias("prev_type"),
        lead(col("event_type"), 1).over(w).alias("next_type"),
        row_number().over(w).alias("rn"),
        // Fixed at 4 tiles — the column NAME carries the bucket semantics
        // (and the oracle twin pins the same constant).
        ntile(4).over(w).alias("quartile"),
        round(percent_rank().over(w), 6).alias("pct_rank"),
        round(cume_dist().over(w), 6).alias("cume"))
  }

  /** Top-N events by value per user — the classic rank-and-filter. The
    * `rnk <= n` predicate pushes INTO the window exec (Spark's
    * WindowGroupLimit): each partition keeps a running top-N heap instead
    * of materializing and ranking every row, which is the difference
    * between O(N) and O(rows) state per key at 100 TB. The event_id
    * tie-break keeps the cut deterministic.
    */
  def topNPerUser(events: DataFrame, n: Int = 3): DataFrame = {
    require(n > 0, s"top-N must be positive, got $n")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    events
      .where(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= n)
  }
}
