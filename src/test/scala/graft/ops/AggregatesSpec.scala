package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

/** Unit spec for A1-A4 (reference: data_agregator.py:74-95): 4-minute
  * tumbling windows tile event time with no gaps or overlap, and the
  * multi-aggregate matches hand-computed values.
  */
class AggregatesSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def readings(rows: (String, String, Double)*) = {
    import spark.implicits._
    rows.toSeq.toDF("ts_str", "sensor_id", "value")
      .selectExpr("CAST(ts_str AS TIMESTAMP) AS event_time", "sensor_id",
        "'temperature' AS sensor_type", "value")
  }

  test("4-minute windows are epoch-aligned, half-open [start, end)") {
    val df = readings(
      ("2026-01-01 00:00:00", "s1", 1.0),   // window [00:00, 00:04)
      ("2026-01-01 00:03:59.999999", "s1", 2.0), // same window
      ("2026-01-01 00:04:00", "s1", 3.0))   // NEXT window
    val out = Aggregates.sensorStats(df)
      .orderBy("window_start").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Timestamp]("window_start") === ts("2026-01-01 00:00:00"))
    assert(out(0).getAs[Timestamp]("window_end") === ts("2026-01-01 00:04:00"))
    assert(out(0).getAs[Long]("count") === 2L)
    assert(out(1).getAs[Timestamp]("window_start") === ts("2026-01-01 00:04:00"))
    assert(out(1).getAs[Long]("count") === 1L)
  }

  test("windows tile: every event lands in exactly one bucket") {
    val events = (0 until 600 by 7).map(i =>
      (f"2026-01-01 01:${i / 60}%02d:${i % 60}%02d", "s1", i.toDouble))
    val out = Aggregates.sensorStats(readings(events: _*))
    val total = out.agg(org.apache.spark.sql.functions.sum("count"))
      .collect().head.getLong(0)
    assert(total === events.size.toLong)
  }

  test("avg/min/max/count per (window, sensor_id, sensor_type)") {
    val df = readings(
      ("2026-01-01 00:00:10", "s1", 10.0),
      ("2026-01-01 00:01:10", "s1", 20.0),
      ("2026-01-01 00:02:10", "s2", 5.0))
    val rows = Aggregates.sensorStats(df).collect()
      .map(r => r.getAs[String]("sensor_id") ->
        ((r.getAs[Double]("avg_value"), r.getAs[Double]("min_value"),
          r.getAs[Double]("max_value"), r.getAs[Long]("count")))).toMap
    assert(rows("s1") === ((15.0, 10.0, 20.0, 2L)))
    assert(rows("s2") === ((5.0, 5.0, 5.0, 1L)))
  }

  test("streaming arm adds an event-time watermark node") {
    // Watermarks are erased from batch plans by the analyzer, so assert on
    // a genuine streaming source (rate) instead of a local frame.
    val stream = spark.readStream.format("rate").load()
      .selectExpr("timestamp AS event_time", "'s1' AS sensor_id",
        "'temperature' AS sensor_type", "CAST(value AS DOUBLE) AS value")
    val agg = Aggregates.sensorStats(stream, streaming = true)
    assert(agg.isStreaming)
    val plan = agg.queryExecution.analyzed.toString
    assert(plan.contains("EventTimeWatermark"))
    assert(plan.contains("1 minutes") || plan.contains("1 minute"))
  }

  test("sliding windows: each event lands in window/slide overlapping buckets") {
    val df = readings(("2026-01-01 00:05:30", "s1", 8.0))
    val out = Aggregates.slidingStats(df, "event_time",
      Seq("sensor_id", "sensor_type"), "value").collect()
    // 4-minute window sliding by 1 minute: starts 00:02..00:05 cover 00:05:30.
    assert(out.length === 4)
    val starts = out.map(_.getAs[Timestamp]("window_start").toString).sorted
    assert(starts === Array(
      "2026-01-01 00:02:00.0", "2026-01-01 00:03:00.0",
      "2026-01-01 00:04:00.0", "2026-01-01 00:05:00.0"))
    assert(out.forall(_.getAs[Double]("avg_value") === 8.0))
  }

  test("sliding windows stream in append mode: finalized windows emit once") {
    import java.nio.file.Files
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Double)](spark)
    val stream = input.toDF().toDF("event_time", "value")
      .selectExpr("event_time", "'s1' AS sensor_id",
        "'temperature' AS sensor_type", "value")
    val query = Aggregates.slidingStats(stream, "event_time",
      Seq("sensor_id", "sensor_type"), "value",
      watermarkDelay = Some("1 minute"))
      .writeStream.format("memory").queryName("sliding_sink")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sliding").toString)
      .start()
    try {
      input.addData((ts("2026-01-01 00:05:30"), 8.0))
      query.processAllAvailable()
      // Advance the watermark far past every window containing 00:05:30.
      input.addData((ts("2026-01-01 01:00:00"), 1.0))
      query.processAllAvailable()
      val rows = spark.table("sliding_sink").collect()
      assert(rows.length === 4) // the four finalized overlapping windows
      assert(rows.forall(_.getAs[Double]("avg_value") === 8.0))
    } finally query.stop()
  }
}
