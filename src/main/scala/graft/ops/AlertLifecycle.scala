package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Alert lifecycle state machine: active → resolved.
  *
  * The reference declares the lifecycle but never implements it — every
  * alert row carries `status='active'`, `resolved_at=NULL` forever
  * (alert_detector.py:205-206; SURVEY §1.1). This operator completes the
  * design with `flatMapGroupsWithState` keyed by sensor: an alert becomes
  * ACTIVE when its rule first fires, and RESOLVED (with `resolved_at`) when
  * the sensor's readings return to normal or switch to a different alert
  * type. State per key is one small case class — bounded by sensor count,
  * not traffic — and the same code path runs in batch (single-invocation
  * state) and streaming (checkpointed state across micro-batches).
  */
object AlertLifecycle {

  case class ReadingEvent(
      sensor_id: String,
      event_time: Timestamp,
      alert_type: Option[String])

  case class ActiveAlert(alert_type: String, triggered_at: Timestamp)

  case class Transition(
      sensor_id: String,
      alert_type: String,
      status: String, // "active" | "resolved"
      triggered_at: Timestamp,
      resolved_at: Option[Timestamp])

  private def step(idleTimeoutMs: Option[Long])(
      sensorId: String,
      events: Iterator[ReadingEvent],
      state: GroupState[ActiveAlert]): Iterator[Transition] = {
    // Idle-sensor eviction (streaming only — batch never times out): a
    // sensor that stopped reporting while an alert was active gets a
    // synthetic resolve stamped at the watermark (the engine's "as of"
    // time), and its state is dropped — otherwise silent sensors leak
    // state forever at fleet scale.
    if (state.hasTimedOut) {
      val out = state.getOption.map { a =>
        Transition(sensorId, a.alert_type, "resolved", a.triggered_at,
          Some(new Timestamp(state.getCurrentWatermarkMs())))
      }
      state.remove()
      return out.iterator
    }
    // Micro-batch iterators carry no ordering guarantee; impose event time.
    // This buffers ONE sensor's events for ONE micro-batch — bounded by
    // per-sensor ingest rate × trigger interval (the reference fleet emits
    // a reading every 3 s per sensor), not by corpus size.
    // (ms, nanos), not getTime alone: java.sql.Timestamp.getTime is
    // MILLISECOND-granular, so µs-apart readings in the same millisecond
    // would tie and keep arbitrary iterator encounter order — found by the
    // sf1.0 sweep, where +c µs copy jitter puts 10 same-ms events on every
    // sensor and the transition stream went partition-order-dependent.
    val sorted = events.toSeq
      .sortBy(e => (e.event_time.getTime, e.event_time.getNanos))
    val out = scala.collection.mutable.Buffer[Transition]()
    var cur = state.getOption
    sorted.foreach { e =>
      (e.alert_type, cur) match {
        case (Some(t), Some(a)) if a.alert_type == t => // still active: no-op
        case (Some(t), Some(a)) => // type switch: resolve old, open new
          out += Transition(sensorId, a.alert_type, "resolved",
            a.triggered_at, Some(e.event_time))
          out += Transition(sensorId, t, "active", e.event_time, None)
          cur = Some(ActiveAlert(t, e.event_time))
        case (Some(t), None) =>
          out += Transition(sensorId, t, "active", e.event_time, None)
          cur = Some(ActiveAlert(t, e.event_time))
        case (None, Some(a)) => // back to normal: resolve
          out += Transition(sensorId, a.alert_type, "resolved",
            a.triggered_at, Some(e.event_time))
          cur = None
        case (None, None) => // normal reading, nothing active
      }
    }
    cur match {
      case Some(a) =>
        state.update(a)
        // Arm the idle clock only while an alert is active: timeout fires
        // when the watermark passes the sensor's last event + horizon.
        // (max with watermark+1: Spark rejects a timeout at or below the
        // current watermark, which a late-arriving group could produce.)
        idleTimeoutMs.foreach { ms =>
          val last = sorted.lastOption.map(_.event_time.getTime)
            .getOrElse(a.triggered_at.getTime)
          state.setTimeoutTimestamp(
            math.max(last + ms, state.getCurrentWatermarkMs() + 1))
        }
      case None => if (state.exists) state.remove()
    }
    out.iterator
  }

  /** Flat readings (+`event_time`) → lifecycle transitions.
    *
    * `idleTimeout`: streaming callers pass the idle horizon (ms) to evict
    * state for sensors that go silent — requires an upstream
    * `withWatermark` (Spark's precondition for event-time timeouts) and
    * emits a synthetic resolve stamped at the watermark. Batch callers
    * (and the DuckDB oracle twin) leave it None: batch executions process
    * the whole input in one invocation, so timeouts can never fire there —
    * and batch plans drop watermark nodes, which makes the timeout API
    * itself unavailable.
    */
  def transitions(
      readings: DataFrame,
      idleTimeout: Option[Long] = None): Dataset[Transition] = {
    val spark = readings.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    AlertRules.classify(readings)
      .select(col("sensor_id"), col("event_time"),
        col("alert_type"))
      // .as[ReadingEvent] (not .map): a typed map would rebuild the
      // event_time attribute and drop its watermark tag, and Spark then
      // rejects EventTimeTimeout ("watermark must be specified").
      .as[ReadingEvent]
      .groupByKey(_.sensor_id)
      .flatMapGroupsWithState(
        OutputMode.Append, timeoutConf)(step(idleTimeout))
  }
}
