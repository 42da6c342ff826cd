package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands sessionization of an event stream: consecutive events
  * of a user belong to one session while the inter-event gap stays within
  * `gapSeconds`; a larger gap opens the next session. The behavioral
  * staple of training-data pipelines (session-level sampling, dialogue
  * turn grouping, activity bucketing).
  *
  * Scale shape: ONE shuffle, on user_id — the running-sum window sorts
  * within each user's partition, and the session-level groupBy reuses the
  * same hash partitioning (its keys start with user_id), so no second
  * exchange. Per-user event history is the sort unit; a pathologically
  * hot user (bot traffic) is the skew caveat — cap or pre-split such
  * users upstream.
  */
object Sessionize {

  def sessions(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    require(gapSeconds > 0, s"session gap must be positive, got $gapSeconds")
    // Epoch seconds: timestamp→long truncates micros, matching the
    // oracle's integer division of epoch_us. Null timestamps are dropped
    // explicitly — they cannot be ordered into a session, and leaving them
    // to the window's null ordering silently diverges between engines
    // (Spark sorts NULLS FIRST ascending, most SQL engines NULLS LAST).
    val prep = events
      .where(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("ts").cast("long").alias("ts_sec"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id")) // event_id breaks ts ties
    val newSess =
      when(lag(col("ts_sec"), 1).over(w).isNull
        .or(col("ts_sec") - lag(col("ts_sec"), 1).over(w) > gapSeconds), 1)
        .otherwise(0)
    prep
      .select(col("user_id"), col("ts_sec"), newSess.alias("new_sess"),
        col("event_id"))
      .select(col("user_id"), col("ts_sec"),
        sum(col("new_sess")).over(w).cast("int").alias("session_seq"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).cast("int").alias("n_events"),
        min(col("ts_sec")).alias("start_sec"),
        max(col("ts_sec")).alias("end_sec"))
  }

  /** High-value activity BURSTS per event type — gaps-and-islands keyed
    * by `event_type` over events with `value > minValue`: the global
    * "incident window" table an ops/curation pipeline overlaps sessions
    * against. Same engine as [[sessions]] (one shuffle, the groupBy
    * reuses the window partitioning); the event-type key keeps the window
    * parallel across the dimension-bounded type set — never a
    * single-partition sort.
    */
  def typeBursts(
      events: DataFrame,
      minValue: Double = 250.0,
      gapSeconds: Long = 21600): DataFrame = {
    require(gapSeconds > 0, s"burst gap must be positive, got $gapSeconds")
    val prep = events
      .where(col("ts").isNotNull && col("value") > minValue)
      .select(col("event_id"), col("event_type"),
        col("ts").cast("long").alias("ts_sec"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts_sec"), col("event_id"))
    val newBurst =
      when(lag(col("ts_sec"), 1).over(w).isNull
        .or(col("ts_sec") - lag(col("ts_sec"), 1).over(w) > gapSeconds), 1)
        .otherwise(0)
    prep
      .select(col("event_type"), col("ts_sec"), newBurst.alias("nb"),
        col("event_id"))
      .select(col("event_type"), col("ts_sec"),
        sum(col("nb")).over(w).cast("int").alias("burst_seq"))
      .groupBy(col("event_type"), col("burst_seq"))
      .agg(
        count(lit(1)).cast("int").alias("n_burst_events"),
        min(col("ts_sec")).alias("b_start"),
        max(col("ts_sec")).alias("b_end"))
  }

  /** Streaming sessionization on Spark's native session windows: state
    * merges events within `gap` of each other per user and the window
    * closes (emits, evicts) once the watermark passes its end — bounded
    * state for free, the same property [[AlertLifecycle]] needed explicit
    * timeout plumbing for. Callers must `withWatermark` upstream and use
    * Append output.
    *
    * Boundary nuance vs the batch [[sessions]]: a session window spans
    * `[first, last + gap)`, so an event arriving at exactly `gap` after
    * the last one opens a NEW window, where the batch gaps-and-islands
    * form (`diff > gap` splits) keeps it. Streaming emits
    * (user_id, window start/end, n_events).
    */
  def streamingSessions(
      events: DataFrame,
      gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).cast("int").alias("n_events"))
      .select(col("user_id"),
        col("session_window.start").alias("session_start"),
        col("session_window.end").alias("session_end"),
        col("n_events"))
}
