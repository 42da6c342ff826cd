package graft.ops

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Spec for the active→resolved alert state machine. */
class AlertLifecycleSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def readings(rows: (String, String, Double, Int)*) = {
    import spark.implicits._
    // (sensor_id suffix-type, time, value, battery)
    rows.toSeq.map { case (t, time, v, batt) =>
      (s"A_1_100_$t", t, "A", 1, 100, time, v,
        Map("temperature" -> "celsius", "humidity" -> "percent",
          "pressure" -> "hPa")(t), batt, -50)
    }.toDF("sensor_id", "sensor_type", "building", "floor", "room",
      "timestamp", "value", "unit", "battery_level", "signal_strength")
      .selectExpr("*", "CAST(timestamp AS TIMESTAMP) AS event_time")
  }

  test("batch: alert opens, persists, and resolves on return to normal") {
    val out = AlertLifecycle.transitions(readings(
      ("temperature", "2026-01-01 10:00:00", 32.0, 90), // critical fires
      ("temperature", "2026-01-01 10:01:00", 33.0, 90), // still critical: no-op
      ("temperature", "2026-01-01 10:02:00", 22.0, 90)) // back to normal
    ).collect().sortBy(_.triggered_at.getTime)
    assert(out.length === 2)
    assert(out(0).status === "active")
    assert(out(0).alert_type === "temperature_critical")
    assert(out(0).triggered_at === ts("2026-01-01 10:00:00"))
    assert(out(0).resolved_at === None)
    assert(out(1).status === "resolved")
    assert(out(1).triggered_at === ts("2026-01-01 10:00:00"))
    assert(out(1).resolved_at === Some(ts("2026-01-01 10:02:00")))
  }

  test("batch: alert-type switch resolves the old and opens the new") {
    val out = AlertLifecycle.transitions(readings(
      ("temperature", "2026-01-01 10:00:00", 32.0, 90), // critical
      ("temperature", "2026-01-01 10:01:00", 28.0, 90)) // warning band
    ).collect().sortBy(r => (r.triggered_at.getTime, r.status))
    assert(out.map(t => (t.alert_type, t.status)).toSeq === Seq(
      ("temperature_critical", "active"),
      ("temperature_critical", "resolved"),
      ("temperature_warning", "active")))
  }

  test("streaming: checkpoint recovery — a restarted query resumes offsets and state") {
    import spark.implicits._
    val input = MemoryStream[(String, Timestamp, Double)](spark)
    val readings = input.toDF().toDF("sid", "event_time", "value")
      .selectExpr("sid AS sensor_id", "'temperature' AS sensor_type",
        "'A' AS building", "1 AS floor", "100 AS room",
        "CAST(event_time AS STRING) AS timestamp", "value",
        "'celsius' AS unit", "90 AS battery_level", "-50 AS signal_strength",
        "event_time")
    val cp = Files.createTempDirectory("graft-recovery").toString
    val transitions = AlertLifecycle.transitions(readings).toDF()

    val batch1 = scala.collection.mutable.Buffer[org.apache.spark.sql.Row]()
    val q1 = transitions.writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batch1.synchronized { batch1 ++= df.collect() }; ()
      }.start()
    try {
      input.addData(("s1", ts("2026-01-01 10:00:00"), 32.0)) // alert fires
      q1.processAllAvailable()
      assert(batch1.map(_.getAs[String]("status")) === Seq("active"))
    } finally q1.stop()

    // Data arriving while the query is down…
    input.addData(("s1", ts("2026-01-01 10:05:00"), 21.0)) // back to normal

    val batch2 = scala.collection.mutable.Buffer[org.apache.spark.sql.Row]()
    val q2 = transitions.writeStream.outputMode("append")
      .option("checkpointLocation", cp) // SAME checkpoint → resume
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batch2.synchronized { batch2 ++= df.collect() }; ()
      }.start()
    try {
      q2.processAllAvailable()
      // Only the resolution is emitted (offsets resumed, batch 1 not
      // replayed), and its triggered_at proves the state store recovered
      // the alert opened before the restart.
      assert(batch2.map(_.getAs[String]("status")) === Seq("resolved"))
      assert(batch2.head.getAs[Timestamp]("triggered_at") ===
        ts("2026-01-01 10:00:00"))
      assert(batch2.head.getAs[Timestamp]("resolved_at") ===
        ts("2026-01-01 10:05:00"))
    } finally q2.stop()
  }

  test("streaming: idle sensor's state is evicted by the event-time timeout") {
    import spark.implicits._
    val input = MemoryStream[(String, Timestamp, Double)](spark)
    val readings = input.toDF().toDF("sid", "event_time", "value")
      .selectExpr("sid AS sensor_id", "'temperature' AS sensor_type",
        "'A' AS building", "1 AS floor", "100 AS room",
        "CAST(event_time AS STRING) AS timestamp", "value",
        "'celsius' AS unit", "90 AS battery_level", "-50 AS signal_strength",
        "event_time")
      .withWatermark("event_time", "1 minute")
    val query = AlertLifecycle.transitions(readings,
        idleTimeout = Some(10 * 60 * 1000L)) // 10-minute idle horizon
      .writeStream.format("memory").queryName("lifecycle_evict")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-evict").toString)
      .start()
    try {
      input.addData(("s1", ts("2026-01-01 10:00:00"), 32.0)) // alert opens
      query.processAllAvailable()
      // s1 goes silent; another sensor's (normal) traffic advances the
      // watermark to 10:59, past s1's last event + horizon (10:10) → the
      // no-data timeout batch emits a synthetic resolve stamped at the
      // watermark and drops s1's state.
      input.addData(("s2", ts("2026-01-01 11:00:00"), 21.0))
      query.processAllAvailable()
      // s1 reports critical again: eviction must not block a fresh open.
      input.addData(("s1", ts("2026-01-01 11:30:00"), 33.0))
      query.processAllAvailable()
      val rows = spark.table("lifecycle_evict").collect()
        .map(r => (r.getAs[String]("sensor_id"), r.getAs[String]("status"),
          r.getAs[Timestamp]("triggered_at"),
          Option(r.getAs[Timestamp]("resolved_at"))))
      assert(rows.toSet === Set(
        ("s1", "active", ts("2026-01-01 10:00:00"), None),
        ("s1", "resolved", ts("2026-01-01 10:00:00"),
          Some(ts("2026-01-01 10:59:00"))),
        ("s1", "active", ts("2026-01-01 11:30:00"), None)))
    } finally query.stop()
  }

  test("streaming: state persists across micro-batches") {
    import spark.implicits._
    val input = MemoryStream[(String, Timestamp, Double)](spark)
    val readings = input.toDF().toDF("sid", "event_time", "value")
      .selectExpr("sid AS sensor_id", "'temperature' AS sensor_type",
        "'A' AS building", "1 AS floor", "100 AS room",
        "CAST(event_time AS STRING) AS timestamp", "value",
        "'celsius' AS unit", "90 AS battery_level", "-50 AS signal_strength",
        "event_time")
    val query = AlertLifecycle.transitions(readings)
      .writeStream.format("memory").queryName("lifecycle_sink")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-lifecycle").toString)
      .start()
    try {
      input.addData(("s1", ts("2026-01-01 10:00:00"), 32.0))
      query.processAllAvailable()
      assert(spark.table("lifecycle_sink").count() === 1) // active emitted

      // Next micro-batch: back to normal → resolution uses the state saved
      // from the previous batch.
      input.addData(("s1", ts("2026-01-01 10:05:00"), 21.0))
      query.processAllAvailable()
      val rows = spark.table("lifecycle_sink").collect()
        .map(r => (r.getAs[String]("status"),
          Option(r.getAs[Timestamp]("resolved_at"))))
      assert(rows.toSet === Set(
        ("active", None),
        ("resolved", Some(ts("2026-01-01 10:05:00")))))
    } finally query.stop()
  }
}
