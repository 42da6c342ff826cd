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
}
