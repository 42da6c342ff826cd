package graft.ops

import graft.SparkSpec
import graft.model.Schemas.FlatReading

/** Unit spec for the C1-C4 rule chain (reference semantics:
  * alert_detector.py:102-209; boundary fixtures: FIXTURES.md §A.6).
  */
class AlertRulesSpec extends SparkSpec {

  private def reading(
      sensorType: String = "temperature",
      unit: String = "celsius",
      value: Double = 22.0,
      battery: Int = 90,
      signal: Int = -50): FlatReading =
    FlatReading(
      sensor_id = s"A_1_100_$sensorType", sensor_type = sensorType,
      building = "A", floor = Some(1), room = Some(100),
      timestamp = "2026-01-01 12:00:00.000000", value = Some(value),
      unit = unit, battery_level = Some(battery),
      signal_strength = Some(signal))

  private def classifyOne(r: FlatReading): Option[String] = {
    import spark.implicits._
    AlertRules.classify(Seq(r).toDS.toDF)
      .select("alert_type").collect().map(row => Option(row.getString(0))).head
  }

  test("first-match-wins: temp 32°C + battery 10% → temperature_critical only") {
    assert(classifyOne(reading(value = 32.0, battery = 10)) ===
      Some("temperature_critical"))
  }

  test("critical precedes warning in overlapping bands (humidity 75%)") {
    assert(classifyOne(reading("humidity", "percent", value = 75.0)) ===
      Some("humidity_critical"))
  }

  test("strict boundaries do not fire") {
    // Inequalities are strict (alert_detector.py:106-155): a value exactly
    // at the weakest applicable threshold emits nothing.
    assert(classifyOne(reading(value = 27.0)) === None)
    assert(classifyOne(reading(value = 15.0)) === None)
    assert(classifyOne(reading("humidity", "percent", value = 60.0)) === None)
    assert(classifyOne(reading("humidity", "percent", value = 35.0)) === None)
    assert(classifyOne(reading("pressure", "hPa", value = 995.0)) === None)
    assert(classifyOne(reading("pressure", "hPa", value = 1030.0)) === None)
    assert(classifyOne(reading(battery = 40)) === None)
    assert(classifyOne(reading(signal = -70)) === None)
  }

  test("values exactly at a critical threshold fall through to the weaker band") {
    // e.g. temp 30.0 is not >30 (critical) but IS >27 (warning).
    assert(classifyOne(reading(value = 30.0)) === Some("temperature_warning"))
    assert(classifyOne(reading("humidity", "percent", value = 70.0)) ===
      Some("humidity_warning"))
    assert(classifyOne(reading("pressure", "hPa", value = 980.0)) ===
      Some("pressure_warning"))
    assert(classifyOne(reading("pressure", "hPa", value = 1040.0)) ===
      Some("pressure_warning"))
    assert(classifyOne(reading(battery = 20)) === Some("battery_warning"))
    assert(classifyOne(reading(signal = -75)) === Some("weak_signal_warning"))
  }

  test("band edges just past the threshold fire the expected type") {
    assert(classifyOne(reading(value = 30.1)) === Some("temperature_critical"))
    assert(classifyOne(reading(value = 14.9)) === Some("temperature_critical"))
    assert(classifyOne(reading(value = 27.1)) === Some("temperature_warning"))
    assert(classifyOne(reading("humidity", "percent", value = 34.9)) ===
      Some("humidity_warning"))
    assert(classifyOne(reading("pressure", "hPa", value = 1030.1)) ===
      Some("pressure_warning"))
    assert(classifyOne(reading(battery = 19)) === Some("battery_critical"))
    assert(classifyOne(reading(battery = 39)) === Some("battery_warning"))
    assert(classifyOne(reading(signal = -76)) === Some("weak_signal_critical"))
    assert(classifyOne(reading(signal = -71)) === Some("weak_signal_warning"))
  }

  test("unit guard suppresses environmental rules (temperature in percent)") {
    assert(classifyOne(reading(unit = "percent", value = 35.0)) === None)
  }

  test("enrich: severity, threshold, message, status columns") {
    import spark.implicits._
    val alerts = AlertRules.detect(
      Seq(reading(value = 32.0), reading("humidity", "percent", value = 20.0),
          reading(signal = -80), reading(value = 22.0)).toDS.toDF)
    val rows = alerts
      .select("alert_type", "severity", "threshold_value", "message", "status")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getInt(2), r.getString(3), r.getString(4))).toSet
    assert(rows === Set(
      ("temperature_critical", "critical", 30,
        "Température CRITIQUE (>30°C ou <15°C)", "active"),
      ("humidity_critical", "critical", 70,
        "Humidité CRITIQUE (<30% ou >70%)", "active"),
      ("weak_signal_critical", "critical", -75,
        "Signal WiFi IoT faible", "active")))
  }

  test("detect filters non-alerting rows and emits at most one alert per reading") {
    import spark.implicits._
    val in = Seq(
      reading(value = 32.0, battery = 5, signal = -90), // 3 rules match
      reading())                                        // none match
    assert(AlertRules.detect(in.toDS.toDF).count() === 1L)
  }
}
