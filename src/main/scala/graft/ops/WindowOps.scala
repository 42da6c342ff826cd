package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Gap-aware ranking with TIES — `rank` and `dense_rank` per event
    * type by descending value, the two window members [[lagLeadStats]]'s
    * family doesn't cover (row_number breaks ties arbitrarily; these two
    * give tied values the SAME rank, which is what leaderboards and
    * percentile cuts actually want). No tie-break column on purpose:
    * both functions depend only on the ORDER values, so each output row
    * is deterministic under any partitioning even when values tie —
    * exactly why the pair can be oracle-hashed while a bare row_number
    * over the same spec could not.
    */
  def valueRanks(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc)
    events
      .where(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("value"))
      .select(col("event_id"), col("event_type"), col("value"),
        rank().over(w).alias("rnk"),
        dense_rank().over(w).alias("dense_rnk"))
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

  case class ScoredEvent(
      user_id: Long, event_id: Long, value: Double, event_time: Timestamp)

  /** One refreshed leaderboard row; `as_of_s` stamps the key's event-time
    * high-water mark at emission (max event-time seen so far across ALL
    * events, board-changing or not) — monotone per key, so downstream
    * consumers can order snapshots by it.
    */
  case class RankedEntry(
      user_id: Long, rnk: Int, event_id: Long, value: Double, as_of_s: Long)

  /** Streaming leaderboard — the streaming face of [[topNPerUser]]:
    * per-key top-N by value maintained incrementally in
    * `flatMapGroupsWithState`. State per key is the N (value, event_id)
    * pairs plus one high-water event-time — BOUNDED regardless of stream
    * length, the property that makes a per-key leaderboard viable at
    * 100 TB/day (rank windows are unsupported over unbounded streams for
    * exactly this reason; the bounded heap is the standard workaround).
    * Emits the FULL refreshed top-N whenever a batch changes it, nothing
    * when it doesn't. Same (value desc, event_id asc) tie order as the
    * batch operator.
    *
    * The high-water mark is tracked SEPARATELY from the board entries and
    * advances on every incoming event — including events that don't make
    * the board. That keeps two promises the board-derived timestamp can't:
    * (1) with `idleTimeout` set, a key receiving a steady stream of
    * non-qualifying events is still "active" and never evicted; (2)
    * `as_of_s` is monotone per key even when a displacing event carries an
    * older timestamp than the entry it evicts.
    *
    * STATE-FORMAT NOTE: the GroupState encoder changed in round 8 from
    * `Seq[(Double, Long, Long)]` (per-entry timestamps) to
    * `(Seq[(Double, Long)], Long)` (board + separate high-water mark).
    * Spark's state store cannot migrate encoder layouts: a query restarted
    * from a checkpoint written by the old shape will fail or misdecode —
    * discard pre-round-8 streamingTopN checkpoints (or start the restarted
    * query under a new checkpoint path).
    */
  def streamingTopN(
      events: DataFrame,
      n: Int = 3,
      idleTimeout: Option[Long] = None): Dataset[RankedEntry] = {
    require(n > 0, s"top-N must be positive, got $n")
    val spark = events.sparkSession
    import spark.implicits._

    // State = (board of (value, event_id), high-water event-time seconds).
    def step(
        userId: Long,
        batch: Iterator[ScoredEvent],
        state: GroupState[(Seq[(Double, Long)], Long)]): Iterator[RankedEntry] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val incoming = batch.toSeq
      val (prevBoard, prevHwm) =
        state.getOption.getOrElse((Seq.empty[(Double, Long)], Long.MinValue))
      val hwmS =
        (prevHwm +: incoming.map(_.event_time.getTime / 1000)).max
      // Merge, re-rank, cap: value desc, event_id asc — the batch
      // operator's exact tie order.
      val merged = (prevBoard ++ incoming.map(e => (e.value, e.event_id)))
        .sortBy { case (v, id) => (-v, id) }
        .take(n)
      state.update((merged, hwmS))
      idleTimeout.foreach { ms =>
        state.setTimeoutTimestamp(
          math.max(hwmS * 1000 + ms, state.getCurrentWatermarkMs() + 1))
      }
      if (merged == prevBoard) Iterator.empty
      else merged.zipWithIndex.iterator.map { case ((v, id), i) =>
        RankedEntry(userId, i + 1, id, v, hwmS)
      }
    }

    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .where(col("value").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), col("value"),
        col("ts").alias("event_time"))
      .as[ScoredEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(step)
  }
}
