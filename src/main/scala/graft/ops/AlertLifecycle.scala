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

  private def step(
      sensorId: String,
      events: Iterator[ReadingEvent],
      state: GroupState[ActiveAlert]): Iterator[Transition] = {
    // Micro-batch iterators carry no ordering guarantee; impose event time.
    val sorted = events.toSeq.sortBy(_.event_time.getTime)
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
      case Some(a) => state.update(a)
      case None => if (state.exists) state.remove()
    }
    out.iterator
  }

  /** Flat readings (+`event_time`) → lifecycle transitions. Works on batch
    * and streaming frames alike; streaming callers should watermark
    * upstream and use Append output.
    */
  def transitions(readings: DataFrame): Dataset[Transition] = {
    val spark = readings.sparkSession
    import spark.implicits._
    AlertRules.classify(readings)
      .select(col("sensor_id"), col("event_time"),
        col("alert_type"))
      .as[(String, Timestamp, Option[String])]
      .map { case (id, t, at) => ReadingEvent(id, t, at) }
      .groupByKey(_.sensor_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }
}
