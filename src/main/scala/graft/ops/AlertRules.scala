package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The alert rule engine: a 10-branch first-match-wins classification over
  * flat readings, plus severity / threshold / message enrichment.
  *
  * Reference behavior: spark_processing/alert_detector.py:100-209. Semantics
  * reproduced exactly (SURVEY §2.9.1):
  *   - at most ONE alert per reading; priority temperature > humidity >
  *     pressure > battery > signal, critical before warning within a type
  *     (a reading with temp 32 °C AND battery 10 % → temperature_critical);
  *   - environmental rules guard BOTH sensor_type AND unit;
  *   - strict inequalities (value exactly 30/27/70/... does not fire);
  *   - the `info` severity branch is kept although unreachable, for parity.
  *
  * Implemented as one Catalyst CaseWhen per derived column — fully
  * whole-stage-codegen'd, no UDFs, trivially parallel at any scale (pure
  * per-row projection; no shuffle, no state).
  */
object AlertRules {

  // Thresholds (reference: alert_detector.py:106-155).
  val TempCritLow     = 15.0
  val TempCritHigh    = 30.0
  val TempWarnHigh    = 27.0
  val HumidCritLow    = 30.0
  val HumidCritHigh   = 70.0
  val HumidWarnLow    = 35.0
  val HumidWarnHigh   = 60.0
  val PressCritLow    = 980.0
  val PressCritHigh   = 1040.0
  val PressWarnLow    = 995.0
  val PressWarnHigh   = 1030.0
  val BatteryCrit     = 20
  val BatteryWarn     = 40
  val SignalCrit      = -75
  val SignalWarn      = -70

  // Human messages, byte-exact (reference: alert_detector.py:192-202).
  val Messages: Map[String, String] = Map(
    "temperature_critical" -> "Température CRITIQUE (>30°C ou <15°C)",
    "temperature_warning"  -> "Température élevée (>27°C)",
    "humidity_critical"    -> "Humidité CRITIQUE (<30% ou >70%)",
    "humidity_warning"     -> "Humidité anormale (<35% ou >60%)",
    "pressure_critical"    -> "Pression atmosphérique anormale (<980 ou >1040 hPa)",
    "pressure_warning"     -> "Pression hors plage (<995 ou >1030 hPa)",
    "battery_critical"     -> "Batterie CRITIQUE (<20%)",
    "battery_warning"      -> "Batterie faible (<40%)")
  val WeakSignalMessage   = "Signal WiFi IoT faible"
  val FallbackMessage     = "Anomalie détectée"

  /** C1: the 10-branch classification CaseWhen
    * (reference: alert_detector.py:102-156). */
  def alertTypeColumn: Column = {
    val v = col("value"); val t = col("sensor_type"); val u = col("unit")
    when(t === "temperature" && u === "celsius" &&
         (v < TempCritLow || v > TempCritHigh), lit("temperature_critical"))
    .when(t === "temperature" && u === "celsius" &&
          v > TempWarnHigh, lit("temperature_warning"))
    .when(t === "humidity" && u === "percent" &&
          (v < HumidCritLow || v > HumidCritHigh), lit("humidity_critical"))
    .when(t === "humidity" && u === "percent" &&
          (v < HumidWarnLow || v > HumidWarnHigh), lit("humidity_warning"))
    .when(t === "pressure" && u === "hPa" &&
          (v < PressCritLow || v > PressCritHigh), lit("pressure_critical"))
    .when(t === "pressure" && u === "hPa" &&
          (v < PressWarnLow || v > PressWarnHigh), lit("pressure_warning"))
    .when(col("battery_level") < BatteryCrit, lit("battery_critical"))
    .when(col("battery_level") < BatteryWarn, lit("battery_warning"))
    .when(col("signal_strength") < SignalCrit, lit("weak_signal_critical"))
    .when(col("signal_strength") < SignalWarn, lit("weak_signal_warning"))
    .otherwise(lit(null))
  }

  /** C2: severity derivation (reference: alert_detector.py:172-175). The
    * `info` branch is dead but kept for expression parity. */
  def severityColumn: Column =
    when(col("alert_type").like("%critical%"), "critical")
      .when(col("alert_type").like("%warning%"), "warning")
      .otherwise("info")

  /** C3: threshold lookup (reference: alert_detector.py:177-188). Integer
    * literals, exactly as declared. */
  def thresholdColumn: Column =
    when(col("alert_type") === "temperature_critical", lit(30))
      .when(col("alert_type") === "temperature_warning", lit(27))
      .when(col("alert_type") === "humidity_critical", lit(70))
      .when(col("alert_type") === "humidity_warning", lit(60))
      .when(col("alert_type") === "pressure_critical", lit(1040))
      .when(col("alert_type") === "pressure_warning", lit(1030))
      .when(col("alert_type") === "battery_critical", lit(20))
      .when(col("alert_type") === "battery_warning", lit(40))
      .when(col("alert_type") === "weak_signal_critical", lit(-75))
      .when(col("alert_type") === "weak_signal_warning", lit(-70))
      .otherwise(lit(null))

  /** C4: French message templating (reference: alert_detector.py:192-202);
    * branch order follows the reference exactly. */
  def messageColumn: Column =
    when(col("alert_type") === "temperature_critical", lit(Messages("temperature_critical")))
      .when(col("alert_type") === "temperature_warning", lit(Messages("temperature_warning")))
      .when(col("alert_type") === "humidity_critical", lit(Messages("humidity_critical")))
      .when(col("alert_type") === "humidity_warning", lit(Messages("humidity_warning")))
      .when(col("alert_type") === "pressure_critical", lit(Messages("pressure_critical")))
      .when(col("alert_type") === "pressure_warning", lit(Messages("pressure_warning")))
      .when(col("alert_type") === "battery_critical", lit(Messages("battery_critical")))
      .when(col("alert_type") === "battery_warning", lit(Messages("battery_warning")))
      .when(col("alert_type").like("weak_signal_%"), lit(WeakSignalMessage))
      .otherwise(FallbackMessage)

  /** Adds `alert_type` to flat readings (reference: alert_detector.py:100-156). */
  def classify(readings: DataFrame): DataFrame =
    readings.withColumn("alert_type", alertTypeColumn)

  /** F1 + the full alert projection (reference: alert_detector.py:157-208).
    *
    * @param withCreatedAt when true, adds the non-deterministic
    *   `created_at = current_timestamp()` column (streaming/parity path);
    *   the batch oracle path leaves it off (SURVEY §7.5.4).
    */
  def enrich(classified: DataFrame, withCreatedAt: Boolean = false): DataFrame = {
    val base = classified
      .where(col("alert_type").isNotNull)
      .select(
        col("sensor_id"),
        col("sensor_type"),
        col("building"),
        col("floor"),
        col("room"),
        col("timestamp"),
        col("battery_level"),
        col("signal_strength"),
        col("alert_type"),
        severityColumn.alias("severity"),
        thresholdColumn.alias("threshold_value"),
        col("value").alias("actual_value"),
        messageColumn.alias("message"),
        col("timestamp").cast("timestamp").alias("triggered_at"),
        lit(null).cast("timestamp").alias("resolved_at"),
        lit("active").alias("status"))
    if (withCreatedAt) base.withColumn("created_at", current_timestamp()) else base
  }

  /** Whole alert stage: readings → enriched alerts. */
  def detect(readings: DataFrame, withCreatedAt: Boolean = false): DataFrame =
    enrich(classify(readings), withCreatedAt)
}
