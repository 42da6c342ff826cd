package graft.ops

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming statistical anomaly detection — the streaming face of
  * [[Profile.zscoreOutliers]]: per event_type, running prefix statistics
  * live in `flatMapGroupsWithState` state (a count + two exact decimal
  * sums + a timestamp — O(1) per key forever), and each arriving event is
  * scored against the statistics ACCUMULATED SO FAR, before it updates
  * them.
  *
  * Semantics are deliberately prefix-based, not global: the batch operator
  * re-scores every event against full-corpus statistics, the streaming
  * operator against what was known at arrival — the standard real-time
  * monitoring trade (you cannot score today's event against tomorrow's
  * mean). Early events per key go unscored until `minN` observations
  * exist; a zero-variance prefix flags any departure from the constant
  * with `z_score = null` (infinitely surprising) rather than dividing by
  * zero or silently dropping.
  *
  * The state keeps Σv and Σv² as EXACT decimals (value rounded to 4 dp,
  * HALF_UP — the decimal-cast semantics both engines share) and derives
  * mean/variance in one double expression, so a batch replay reproduces a
  * SQL prefix-window oracle bit for bit — the same cross-paradigm check
  * the funnel and lifecycle ops carry. Integer headroom: DecimalType's 38
  * digits bound |Σv²| below ~10^20, far past any realistic key's stream.
  */
object Anomaly {

  case class ValuedEvent(
      event_id: Long, event_time: Timestamp, event_type: String, value: Double)

  /** Prefix sums + the idle-eviction high-water mark (armed from
    * `lastSeenMs`, never from a batch's own max — a purely-late batch must
    * not rewind the deadline; see Funnel.FunnelState).
    */
  case class RunningStats(
      n: Long, s1: JBigDecimal, s2: JBigDecimal, lastSeenMs: Long)

  /** One flagged event; `z_score` is null when the prefix variance was 0. */
  case class FlaggedEvent(
      event_id: Long, event_type: String, value: Double,
      n_seen: Long, z_score: Option[Double])

  private def step(threshold: Double, minN: Long, idleTimeoutMs: Option[Long])(
      eventType: String,
      events: Iterator[ValuedEvent],
      state: GroupState[RunningStats]): Iterator[FlaggedEvent] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    // Event-time order within the batch: scoring is prefix-dependent, so
    // arrival-order nondeterminism inside a trigger must not change which
    // events flag. Full sub-millisecond resolution (getTime alone drops
    // the µs the SQL oracle orders by); buffer = one key × one trigger.
    val sorted = events.toSeq.sortBy(e =>
      (e.event_time.getTime / 1000, e.event_time.getNanos, e.event_id))
    var st = state.getOption.getOrElse(
      RunningStats(0L, JBigDecimal.ZERO, JBigDecimal.ZERO, Long.MinValue))
    val out = scala.collection.mutable.Buffer[FlaggedEvent]()
    sorted.foreach { e =>
      if (st.n >= minN) {
        // The one double expression the SQL oracle also computes — branch
        // decisions (variance > 0, |z| > threshold) run on identical
        // doubles on both engines.
        val s1d = st.s1.doubleValue
        val s2d = st.s2.doubleValue
        val mean = s1d / st.n
        val variance = (s2d - s1d * s1d / st.n) / (st.n - 1)
        if (variance > 0) {
          val z = (e.value - mean) / math.sqrt(variance)
          if (math.abs(z) > threshold)
            out += FlaggedEvent(e.event_id, eventType, e.value, st.n,
              Some(new JBigDecimal(z).setScale(6, RoundingMode.HALF_UP)
                .doubleValue))
        } else if (e.value != mean) {
          out += FlaggedEvent(e.event_id, eventType, e.value, st.n, None)
        }
      }
      // Update AFTER scoring: an event never scores against statistics it
      // contributed to. HALF_UP 4-dp = the decimal(14,4) cast both engines
      // apply; the sums stay exact from there.
      val v4 = new JBigDecimal(e.value).setScale(4, RoundingMode.HALF_UP)
      st = RunningStats(st.n + 1, st.s1.add(v4), st.s2.add(v4.multiply(v4)),
        math.max(st.lastSeenMs, e.event_time.getTime))
    }
    state.update(st)
    idleTimeoutMs.foreach { ms =>
      val base = if (st.lastSeenMs == Long.MinValue)
        state.getCurrentWatermarkMs() else st.lastSeenMs
      state.setTimeoutTimestamp(
        math.max(base + ms, state.getCurrentWatermarkMs() + 1))
    }
    out.iterator
  }

  /** Incremental anomaly stream keyed by event_type. Streaming callers
    * pass `idleTimeout` (with an upstream watermark) to drop a silent
    * key's statistics; batch invocation replays the whole input as one
    * ordered prefix — the oracle-checked face.
    */
  def streamingOutliers(
      events: DataFrame,
      threshold: Double = 3.0,
      minN: Long = 10L,
      idleTimeout: Option[Long] = None): Dataset[FlaggedEvent] = {
    require(threshold > 0 && minN >= 2, s"bad params: $threshold/$minN")
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .where(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_id"), col("ts").alias("event_time"),
        col("event_type"), col("value"))
      .as[ValuedEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(
        OutputMode.Append, timeoutConf)(step(threshold, minN, idleTimeout))
  }
}
