package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kafka alert payload: re-nest location/metadata structs and serialize to
  * JSON, keyed by sensor_id (reference: alert_detector.py:212-243).
  *
  * P8 (struct re-nesting) + P9 (to_json). Pure projection — codegen'd,
  * shuffle-free. The payload intentionally omits resolved_at/created_at,
  * matching the reference's struct list (alert_detector.py:216-240).
  */
object AlertPayload {

  /** Enriched alerts → (key, value) frame ready for a Kafka sink. */
  def toKafka(alerts: DataFrame): DataFrame =
    alerts.select(
      col("sensor_id").cast("string").alias("key"),
      to_json(struct(
        col("sensor_id"),
        col("sensor_type"),
        col("timestamp"),
        struct(col("building"), col("floor"), col("room")).alias("location"),
        struct(col("battery_level"), col("signal_strength")).alias("metadata"),
        col("alert_type"),
        col("severity"),
        col("threshold_value"),
        col("actual_value"),
        col("message"),
        col("triggered_at"),
        col("status")
      )).alias("value"))
}
