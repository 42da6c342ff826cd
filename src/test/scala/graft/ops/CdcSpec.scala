package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

/** Unit spec for the CDC compactions: latest-wins apply and SCD2 history. */
class CdcSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def events(rows: (Long, Long, Long, String, Double)*) = {
    import spark.implicits._
    rows.map { case (id, t, u, ty, v) => (id, ts(t), u, ty, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("applyLatest: latest wins, trailing tombstone deletes, upsert resurrects") {
    val ev = events(
      (1L, 10L, 1L, "view", 1.0), (2L, 20L, 1L, "click", 2.0), // 1 → click
      (3L, 10L, 2L, "view", 3.0), (4L, 20L, 2L, "error", 0.0), // 2 deleted
      (5L, 10L, 3L, "error", 0.0), (6L, 20L, 3L, "signup", 4.0)) // resurrected
    val out = Cdc.applyLatest(ev).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSet === Set(
      (1L, "click", 2.0, 20L), (3L, "signup", 4.0, 20L)))
  }

  test("applyLatest: equal-ts tie breaks on event_id desc; top-1 pushes to WindowGroupLimit") {
    val ev = events(
      (7L, 10L, 1L, "view", 1.0), (9L, 10L, 1L, "click", 2.0),
      (8L, 10L, 1L, "signup", 3.0))
    val q = Cdc.applyLatest(ev)
    val out = q.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "click"))) // event_id 9 wins the tie
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rn=1 must push into the window exec:\n$plan")
  }

  test("compactChangelog: tombstones survive past the watermark as delete " +
    "markers, older ones vanish with their key") {
    // Timeline [10, 90] → midpoint watermark (10+90+1) div 2 = 50.
    val ev = events(
      (1L, 10L, 1L, "view", 1.0), (2L, 80L, 1L, "click", 2.0), // live key
      (3L, 10L, 2L, "view", 3.0), (4L, 20L, 2L, "error", 0.0), // old tomb → GC'd
      (5L, 10L, 3L, "view", 5.0), (6L, 90L, 3L, "error", 0.0), // fresh tomb → kept
      (7L, 60L, 4L, "signup", 7.0))
    val out = Cdc.compactChangelog(ev).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(3), r.getBoolean(4))).toMap
    assert(out === Map(
      1L -> (("click", 80L, false)),
      3L -> (("error", 90L, true)), // explicit delete marker, not dropped
      4L -> (("signup", 60L, false))))
    // Key 2's latest is a pre-watermark tombstone: fully compacted away.
    assert(!out.contains(2L))
  }

  test("scd2History: repeats collapse, intervals chain half-open, last is current") {
    val ev = events(
      (1L, 10L, 1L, "view", 1.0), (2L, 20L, 1L, "view", 1.0), // collapses
      (3L, 30L, 1L, "click", 1.0), (4L, 40L, 1L, "view", 1.0), // reopens
      (5L, 10L, 2L, "signup", 1.0))
    val out = Cdc.scd2History(ev).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getBoolean(5)))
    assert(out.toSet === Set(
      (1L, "view", 1, 10L, 30L, false),
      (1L, "click", 2, 30L, 40L, false),
      (1L, "view", 3, 40L, -1L, true), // same state re-opens a NEW version
      (2L, "signup", 1, 10L, -1L, true)))
  }

  test("scd2AsOfProbe: exactly one version per event, half-open boundaries") {
    val ev = events(
      (1L, 10L, 1L, "view", 1.0), // opens v1 [10, 30)
      (2L, 20L, 1L, "view", 1.0), // inside v1
      (3L, 30L, 1L, "click", 1.0), // opens v2 [30, ∞) — boundary event
      (4L, 40L, 1L, "click", 1.0)) // inside v2
    val q = Cdc.scd2AsOfProbe(ev)
    val out = q.collect()
      .map(r => r.getLong(0) -> ((r.getString(3), r.getInt(4)))).toMap
    assert(out.size === 4) // every event matched exactly once
    assert(out(1L) === (("view", 1)))
    assert(out(2L) === (("view", 1)))
    assert(out(3L) === (("click", 2))) // boundary lands in the NEW version
    assert(out(4L) === (("click", 2)))
    // Equality conjunct anchors a real join — never a nested-loop product.
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"probe must plan an equi join with range post-filter:\n$plan")
  }

  test("streamingApply: register survives batches, stale rows emit nothing") {
    import java.nio.file.Files
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val ev = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Cdc.streamingApply(ev).toDF()
      .writeStream.format("memory").queryName("cdc_sink")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cdc-ckpt").toString)
      .start()
    def rows() = spark.table("cdc_sink").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getBoolean(4)))
    try {
      // Batch 1: two upserts for key 1 in one batch → ONE emission (max).
      input.addData((1L, ts(10L), 1L, "view", 1.0), (2L, ts(20L), 1L, "click", 2.0))
      q.processAllAvailable()
      assert(rows().toSeq === Seq((1L, "click", 20L, false)))
      // Batch 2: stale event (older than register) → no new emission.
      input.addData((3L, ts(15L), 1L, "signup", 9.0))
      q.processAllAvailable()
      assert(rows().length === 1)
      // Batch 3: tombstone advances the register → deleted emission.
      input.addData((4L, ts(30L), 1L, "error", 0.0))
      q.processAllAvailable()
      assert(rows().toSeq.last === ((1L, "error", 30L, true)))
    } finally q.stop()
  }

  test("streamingApply: tombstone-then-resurrect across trigger boundaries") {
    import java.nio.file.Files
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val ev = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Cdc.streamingApply(ev).toDF()
      .writeStream.format("memory").queryName("cdc_lifecycle_sink")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cdc-lc-ckpt").toString)
      .start()
    def rows() = spark.table("cdc_lifecycle_sink").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getBoolean(4)))
    try {
      input.addData((1L, ts(10L), 1L, "view", 1.0)) // b1: live register
      q.processAllAvailable()
      input.addData((2L, ts(20L), 1L, "error", 0.0)) // b2: tombstone
      q.processAllAvailable()
      // b3: stale upsert BEHIND the tombstone, arriving a batch later —
      // the tombstone shadows it across the trigger boundary (forward-
      // only), so nothing re-emits.
      input.addData((3L, ts(15L), 1L, "signup", 9.0))
      q.processAllAvailable()
      assert(rows().toSeq === Seq(
        (1L, "view", 10L, false), (1L, "error", 20L, true)))
      // b4: genuinely newer upsert resurrects the key.
      input.addData((4L, ts(30L), 1L, "signup", 4.0))
      q.processAllAvailable()
      assert(rows().toSeq.last === ((1L, "signup", 30L, false)))
    } finally q.stop()
  }

  test("streamingApplyExpiring: idle register evicted at watermark, resurrects fresh") {
    import java.nio.file.Files
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val ev = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Cdc.streamingApplyExpiring(ev, idleRetentionSec = 60L).toDF()
      .writeStream.format("memory").queryName("cdc_exp_sink")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cdc-exp-ckpt").toString)
      .start()
    def rows() = spark.table("cdc_exp_sink").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getBoolean(4)))
    def stateRows() = q.lastProgress.stateOperators.head.numRowsTotal
    try {
      input.addData((1L, ts(100L), 1L, "view", 1.0)) // b1: key 1 register
      q.processAllAvailable()
      assert(rows().toSeq === Seq((1L, "view", 100L, false)))
      // b2: key 2 far in the future — watermark advances to 9990, far
      // past key 1's expiry (100 + 60); the watermark-advance no-data
      // microbatch fires the timeout before processAllAvailable returns.
      input.addData((2L, ts(10000L), 2L, "view", 2.0))
      q.processAllAvailable()
      assert(stateRows() === 1L,
        "idle register must be evicted once the watermark passes expiry")
      assert(rows().count(_._1 == 1L) === 1,
        "eviction must be silent - no extra key-1 emission")
      // b3: key 1 returns after eviction → accepted as a FRESH register
      // (the documented TTL trade).
      input.addData((3L, ts(10002L), 1L, "signup", 4.0))
      q.processAllAvailable()
      assert(rows().toSeq.last === ((1L, "signup", 10002L, false)))
    } finally q.stop()
  }

  test("streamingApply single-batch replay equals applyLatest (deleted ↔ absent)") {
    val ev = events(
      (1L, 10L, 1L, "view", 1.0), (2L, 20L, 1L, "click", 2.0),
      (3L, 10L, 2L, "view", 3.0), (4L, 20L, 2L, "error", 0.0),
      (5L, 10L, 3L, "error", 0.0), (6L, 20L, 3L, "signup", 4.0))
    val stream = Cdc.streamingApply(ev).collect()
      .map(u => (u.user_id, u.event_type, u.value, u.as_of_s, u.deleted))
    val batch = Cdc.applyLatest(ev).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), false))
    assert(stream.filterNot(_._5).toSet === batch.toSet)
    assert(stream.filter(_._5).map(_._1).toSeq === Seq(2L)) // tombstoned key
  }

  test("scd2History: both windows share one Exchange (one shuffle total)") {
    val ev = events((1L, 10L, 1L, "view", 1.0), (2L, 20L, 1L, "click", 1.0))
    val plan = Cdc.scd2History(ev).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1,
      s"second window must reuse the first's partitioning:\n$plan")
  }

  test("exactly-once CDC sink: forced replay across a restart applies no " +
    "duplicates; final table state equals the batch oracle") {
    replayProof("cdc_register_log", providerClass = None)
  }

  // The same proof under RocksDB (r15 verdict item 6): the replay-skip
  // path commits state through the provider (the r15 stall was exactly
  // a provider-side commit-validation), so the e2e must hold under BOTH
  // the default HDFS-backed store and the RocksDB one StreamBench
  // measures.
  test("exactly-once CDC sink under RocksDB state store: forced replay " +
    "applies no duplicates; final state equals the batch oracle") {
    replayProof("cdc_register_log_rdb", providerClass = Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
  }

  private def replayProof(
      table: String, providerClass: Option[String]): Unit = {
    import java.nio.file.Files
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.config.JdbcConfig
    import graft.io.Sinks
    import spark.implicits._

    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    providerClass.foreach(
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    try {

    System.setProperty("derby.system.home",
      Files.createTempDirectory("graft-derby-cdc").toString)
    val db = Files.createTempDirectory("graft-cdc-db").resolve("db")
    val cfg = JdbcConfig(
      url = s"jdbc:derby:$db;create=true", user = "", password = "",
      driver = "org.apache.derby.jdbc.EmbeddedDriver",
      readingsTable = "r", alertsTable = "a", aggregatesTable = "g")
    val ckpt = Files.createTempDirectory("graft-cdc-replay").toString
    def readLog() = spark.read.format("jdbc").option("url", cfg.url)
      .option("dbtable", table).option("driver", cfg.driver).load()

    val input = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    def startQuery() = Cdc.streamingApplyExpiring(
        input.toDF().toDF("user_id", "ts", "event_id", "event_type", "value"),
        idleRetentionSec = 1000000L)
      .toDF()
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, bid: Long) =>
        if (!df.isEmpty) Sinks.idempotentBatchWriter(cfg, table)(df, bid)
      }
      .start()

    val q1 = startQuery()
    try {
      input.addData((1L, ts(10), 1L, "view", 1.0),
        (2L, ts(10), 2L, "view", 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(readLog().count() === 2L)

    // The epoch that actually appended rows, from the sink's own marker
    // table (watermark-advance no-data epochs may follow it).
    val dataEpoch = readLog().sparkSession.read.format("jdbc")
      .option("url", cfg.url).option("dbtable", s"${table}_commits")
      .option("driver", cfg.driver).load()
      .collect().map(_.getLong(0)).max
    // FORCE a replay of that epoch: prune the checkpoint to the shape of
    // a crash right after the sink write — its commit file (and anything
    // later) gone, its offsets entry the newest. On restart Spark
    // re-executes the epoch with the SAME batch id against the
    // rolled-back state store; only the marker table stands between the
    // sink and a duplicate apply.
    for (d <- Seq("commits", "offsets")) {
      new java.io.File(s"$ckpt/$d").listFiles().foreach { f =>
        // Each log entry N pairs with a hidden Hadoop checksum ".N.crc";
        // a stale CRC left behind makes the restarted query's rename fail.
        val name = f.getName.stripPrefix(".").stripSuffix(".crc")
        if (name.forall(_.isDigit) && name.nonEmpty) {
          val id = name.toLong
          if ((d == "commits" && id >= dataEpoch) ||
              (d == "offsets" && id > dataEpoch)) assert(f.delete())
        }
      }
    }

    val q2 = startQuery()
    try {
      q2.processAllAvailable() // replays the data epoch
      assert(readLog().count() === 2L,
        "replayed epoch must be skipped by the batch marker")
      input.addData((1L, ts(20), 3L, "click", 5.0),
        (3L, ts(20), 4L, "signup", 7.0))
      q2.processAllAvailable()
    } finally q2.stop()

    // Register state reconstructed from the log (latest per user) must
    // equal the batch oracle over the full event history.
    val logLatest = readLog().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("as_of_s"),
        r.getAs[String]("event_type"), r.getAs[Double]("value")))
      .groupBy(_._1).map { case (u, rs) =>
        val last = rs.maxBy(_._2)
        (u, last._3, last._4, last._2)
      }.toSet
    val oracle = Cdc.applyLatest(events(
      (1L, 10L, 1L, "view", 1.0), (2L, 10L, 2L, "view", 2.0),
      (3L, 20L, 1L, "click", 5.0), (4L, 20L, 3L, "signup", 7.0)))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(logLatest === oracle)

    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
