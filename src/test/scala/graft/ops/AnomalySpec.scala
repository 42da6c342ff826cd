package graft.ops

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Unit + e2e spec for the streaming running-stats anomaly detector. */
class AnomalySpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("batch replay: prefix scoring, warmup unscored, zero-variance flags null z") {
    import spark.implicits._
    val ev = Seq(
      // click: warmup 10,12,11 → stats n=3 mean=11 var=1; then z=0 at 11;
      // then 100 flags against n=4 prefix stats.
      (1L, t("2026-01-01 10:00:00"), 1L, "click", 10.0),
      (2L, t("2026-01-01 10:01:00"), 1L, "click", 12.0),
      (3L, t("2026-01-01 10:02:00"), 1L, "click", 11.0),
      (4L, t("2026-01-01 10:03:00"), 1L, "click", 11.0),
      (5L, t("2026-01-01 10:04:00"), 1L, "click", 100.0),
      // view: constant prefix then a departure → null z.
      (6L, t("2026-01-01 10:00:00"), 2L, "view", 5.0),
      (7L, t("2026-01-01 10:01:00"), 2L, "view", 5.0),
      (8L, t("2026-01-01 10:02:00"), 2L, "view", 5.0),
      (9L, t("2026-01-01 10:03:00"), 2L, "view", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Anomaly.streamingOutliers(ev, threshold = 2.0, minN = 3L)
      .collect().map(f => f.event_id -> f).toMap
    assert(out.keySet === Set(5L, 9L))
    val spike = out(5L)
    assert(spike.n_seen === 4L && spike.z_score.exists(_ > 100.0))
    val dep = out(9L)
    assert(dep.n_seen === 3L && dep.z_score.isEmpty)
  }

  test("streaming: Welford state persists across micro-batches") {
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, String, Double)](spark)
    val events = input.toDF().toDF("event_id", "ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
    val q = Anomaly.streamingOutliers(events, threshold = 2.0, minN = 3L,
        idleTimeout = Some(3600000L)).toDF()
      .writeStream.format("memory").queryName("anomaly_sink")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-anomaly-ckpt").toString)
      .start()
    try {
      // Batch 1 builds the baseline; nothing can flag yet.
      input.addData(
        (1L, t("2026-01-01 10:00:00"), "click", 10.0),
        (2L, t("2026-01-01 10:01:00"), "click", 12.0),
        (3L, t("2026-01-01 10:02:00"), "click", 11.0))
      q.processAllAvailable()
      assert(spark.table("anomaly_sink").count() === 0)
      // Batch 2: the spike scores against the batch-1 statistics — state
      // crossed the trigger boundary.
      input.addData((4L, t("2026-01-01 10:03:00"), "click", 100.0))
      q.processAllAvailable()
      val rows = spark.table("anomaly_sink").collect()
        .map(r => (r.getLong(0), r.getLong(3)))
      assert(rows.toSeq === Seq((4L, 3L)))
    } finally q.stop()
  }
}
