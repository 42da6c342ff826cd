package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** Ingest parsing: raw bytes → JSON string → flat typed readings.
  *
  * Reference behavior: spark_processing/data_persistance.py:75-89,
  * spark_processing/alert_detector.py:82-97,
  * spark_processing/data_agregator.py:64-72.
  *
  * Every function is a pure DataFrame => DataFrame so the exact same code
  * path runs in (a) the streaming pipeline, (b) the batch oracle harness,
  * and (c) unit tests (SURVEY §7.1 design rule). Catalyst collapses the
  * chained projections into a single whole-stage-codegen'd Project, so
  * splitting into small functions costs nothing at runtime.
  */
object Parse {

  /** P1: Kafka's binary `value` column → JSON string.
    * (reference: data_persistance.py:75). */
  def kafkaValueToJson(df: DataFrame): DataFrame =
    df.selectExpr("CAST(value AS STRING) AS json_str")

  /** P2+P3: JSON string → flat reading columns. Default PERMISSIVE mode:
    * malformed documents become all-null rows rather than errors, matching
    * the reference's from_json usage (alert_detector.py:84). */
  def jsonToReadings(df: DataFrame, jsonCol: String = "json_str"): DataFrame =
    df.select(EvalOnce(from_json(col(jsonCol), Schemas.sensorReading)).alias("data"))
      .select(
        col("data.sensor_id").alias("sensor_id"),
        col("data.sensor_type").alias("sensor_type"),
        col("data.location.building").alias("building"),
        col("data.location.floor").alias("floor"),
        col("data.location.room").alias("room"),
        col("data.timestamp").alias("timestamp"),
        col("data.value").alias("value"),
        col("data.unit").alias("unit"),
        col("data.metadata.battery_level").alias("battery_level"),
        col("data.metadata.signal_strength").alias("signal_strength"))

  /** Full ingest parse: Kafka frame → flat readings. */
  def fromKafka(df: DataFrame): DataFrame = jsonToReadings(kafkaValueToJson(df))

  /** P4: raw ISO-8601 string timestamp → TimestampType `event_time`
    * (reference: data_persistance.py:89, alert_detector.py:204). Kept as a
    * separate column so the raw string survives to the sinks, which is
    * observable reference behavior (SURVEY §2.9.8). */
  def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("event_time", col("timestamp").cast("timestamp"))

  /** P8+P9 inverse of the flatten: flat readings → A.1-shaped JSON string.
    * Used by the simulator twin and the JSON round-trip checks. */
  def readingsToJson(df: DataFrame): DataFrame =
    df.select(to_json(struct(
      col("sensor_id"),
      col("sensor_type"),
      struct(col("building"), col("floor"), col("room")).alias("location"),
      col("timestamp"),
      col("value"),
      col("unit"),
      struct(col("battery_level"), col("signal_strength")).alias("metadata")
    )).alias("json_str"))

  /** Semi-structured extraction over the fact table: pull the integer `k`
    * out of the events `props` JSON and aggregate per event_type — the
    * "query the payload you never flattened" pattern. Extraction is a
    * codegen'd regex on purpose (portable to the oracle with no JSON
    * extension, and at 100 TB a single-path probe beats a full JSON parse
    * by the width of the document); rows whose payload lacks the path
    * count as `n_missing` instead of silently vanishing.
    */
  def propsKeyStats(events: DataFrame): DataFrame = {
    val k = regexp_extract(col("props"), "\"k\":\\s*(-?\\d+)", 1)
    val kInt = when(k =!= "", k.cast("int"))
    events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).alias("n"),
        count(kInt).alias("n_with_k"),
        (count(lit(1)) - count(kInt)).alias("n_missing"),
        sum(kInt).alias("sum_k"),
        min(kInt).alias("min_k"),
        max(kInt).alias("max_k"))
  }
}
