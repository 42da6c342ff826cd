package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  case class FunnelEvent(
      user_id: Long, event_time: Timestamp, event_type: String)

  /** `lastSeenMs` is the per-key event-time high-water mark — the idle
    * timeout arms from it, so a batch of purely LATE events (older than
    * anything already seen) can never re-arm the timeout EARLIER and evict
    * state sooner than "last-seen event + idleTimeout" promises.
    */
  case class FunnelState(
      viewS: Option[Long], clickS: Option[Long], purchaseS: Option[Long],
      lastSeenMs: Long = Long.MinValue)

  /** One row per stage ADVANCE: the user reached `stage` at epoch-second
    * `at_s`. The incremental face of [[conversion]]'s snapshot.
    */
  case class StageAdvance(user_id: Long, stage: Int, at_s: Long)

  // Same-timestamp events process in funnel order (view, click, purchase),
  // mirroring the batch operator's at-or-after (>=) stage semantics.
  private val StageRank = Map("view" -> 0, "click" -> 1, "purchase" -> 2)

  private def step(idleTimeoutMs: Option[Long])(
      userId: Long,
      events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[StageAdvance] = {
    // Idle eviction (streaming only): a user silent past the horizon drops
    // their funnel state — completed or not — so state stays bounded by
    // ACTIVE users, not every user ever seen.
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    // Impose event-time order within the micro-batch (iterators carry no
    // ordering guarantee); buffer is one user × one trigger — bounded by
    // per-user rate, not corpus. Cross-batch late arrivals cannot rewind a
    // stage already advanced — the documented forward-only semantics of
    // the incremental funnel (the batch op recomputes globally instead).
    val sorted = events.toSeq.sortBy(e =>
      (e.event_time.getTime, StageRank.getOrElse(e.event_type, 9)))
    var st = state.getOption.getOrElse(FunnelState(None, None, None))
    val out = scala.collection.mutable.Buffer[StageAdvance]()
    sorted.foreach { e =>
      val t = e.event_time.getTime / 1000
      e.event_type match {
        case "view" if st.viewS.isEmpty =>
          st = st.copy(viewS = Some(t))
          out += StageAdvance(userId, 1, t)
        case "click" if st.clickS.isEmpty &&
            st.viewS.exists(t >= _) =>
          st = st.copy(clickS = Some(t))
          out += StageAdvance(userId, 2, t)
        case "purchase" if st.purchaseS.isEmpty &&
            st.clickS.exists(t >= _) =>
          st = st.copy(purchaseS = Some(t))
          out += StageAdvance(userId, 3, t)
        case _ => // duplicate stage, out-of-funnel order, or other type
      }
    }
    // Completed funnels KEEP their state (prevents a later view from
    // opening a phantom second journey) until the idle timeout evicts it.
    // The high-water mark takes max(stored, batch max): sorted is
    // event-time ordered, so sorted.last is this batch's max.
    val hwm = math.max(st.lastSeenMs,
      sorted.lastOption.map(_.event_time.getTime).getOrElse(Long.MinValue))
    st = st.copy(lastSeenMs = hwm)
    state.update(st)
    idleTimeoutMs.foreach { ms =>
      val base = if (hwm == Long.MinValue) state.getCurrentWatermarkMs()
                 else hwm
      state.setTimeoutTimestamp(
        math.max(base + ms, state.getCurrentWatermarkMs() + 1))
    }
    out.iterator
  }

  /** Incremental funnel over an event stream: emits a [[StageAdvance]] the
    * moment a user reaches a stage, `flatMapGroupsWithState` keyed by
    * user. On a complete in-order replay this emits exactly the non-null
    * stage timestamps of [[conversion]] (the oracle-checked equivalence);
    * under cross-batch out-of-order arrival it is forward-only — a late
    * earlier view cannot rewind stages already granted, the standard
    * real-time funnel trade. Streaming callers pass `idleTimeout` (ms, with
    * an upstream `withWatermark`) to evict silent users' state.
    */
  def streamingConversion(
      events: DataFrame,
      idleTimeout: Option[Long] = None): Dataset[StageAdvance] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .where(col("ts").isNotNull)
      .select(col("user_id"), col("ts").alias("event_time"),
        col("event_type"))
      // .as[FunnelEvent], not .map — a typed map would drop the watermark
      // tag EventTimeTimeout requires (see AlertLifecycle.transitions).
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, timeoutConf)(step(idleTimeout))
  }
}
