package graft.io

import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, Row, SaveMode}

import graft.config.{JdbcConfig, PipelineConfig}
import graft.ops.AlertPayload

/** Sinks (K1-K6) and the single-query dual-sink that fixes the reference's
  * double-Kafka-read hazard.
  *
  * Delivery posture (SURVEY §2.9.3): every streaming query gets a
  * checkpoint (the reference checkpoints only its Kafka alert sink,
  * alert_detector.py:251, and uses `latest` offsets everywhere — restart
  * silently drops data). With checkpoints + append-mode JDBC writes the
  * pipeline is at-least-once into idempotent-keyed tables; duplicates on
  * retry are possible and documented, loss is not.
  */
object Sinks {

  /** K1-K3 batch half: one micro-batch → JDBC append
    * (reference: data_persistance.py:39-58, alert_detector.py:38-60,
    * data_agregator.py:28-47). Connection-per-partition is Spark's JDBC
    * writer behavior; at high fan-in bound writer parallelism upstream
    * with `coalesce` on the BATCH frame if the database is the bottleneck.
    */
  def jdbcAppend(df: DataFrame, jdbc: JdbcConfig, table: String): Unit =
    df.write
      .format("jdbc")
      .option("url", jdbc.url)
      .option("dbtable", table)
      .option("user", jdbc.user)
      .option("password", jdbc.password)
      .option("driver", jdbc.driver)
      .mode(SaveMode.Append)
      .save()

  /** A5 + K6: the per-batch guard and diagnostics. `isEmpty` scans at most
    * one partition-row, unlike the reference's double `count()`
    * (SURVEY §2.9.5).
    */
  private def nonEmpty(df: DataFrame, batchId: Long, what: String): Boolean =
    if (df.isEmpty) { log(s"[batch $batchId] no $what to write"); false }
    else true

  private def log(msg: String): Unit = println(msg)

  /** Wrap a stream in a checkpointed foreachBatch JDBC append (K1/K3). */
  def jdbcStream(
      stream: DataFrame,
      jdbc: JdbcConfig,
      table: String,
      checkpoint: String,
      queryName: String,
      writer: (DataFrame, String) => Unit = null): StreamingQuery = {
    val write: (DataFrame, String) => Unit =
      if (writer != null) writer else (df, t) => jdbcAppend(df, jdbc, t)
    stream.writeStream
      .queryName(queryName)
      .outputMode("append")
      .option("checkpointLocation", s"$checkpoint/$queryName")
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        if (nonEmpty(df, batchId, table)) write(df, table)
      }
      .start()
  }

  /** Replay-safe JDBC batch writer — the commit-marker upgrade of plain
    * [[jdbcAppend]]. Epoch replays are the COMMON duplicate source in
    * `foreachBatch` sinks: after a crash between a successful write and
    * the checkpoint commit, Structured Streaming re-delivers the same
    * `batchId` with the same data. This writer records every committed
    * batch id in `<table>_commits` and SKIPS a batch it has already
    * written, so replays become no-ops instead of duplicate rows.
    *
    * Honest guarantee ladder (documented, not hand-waved): this is
    * effectively-once, not exactly-once — a failure in the window AFTER
    * the data append but BEFORE the marker insert still re-appends on
    * retry. Closing that window needs the marker and the data in ONE
    * database transaction, which Spark's parallel JDBC writer cannot join
    * (each partition writes on its own connection); production schemas
    * close it with idempotent keys or a staging-table swap. What this
    * buys over plain append: restart-after-successful-write — by far the
    * dominant replay path — no longer duplicates.
    *
    * The marker table is created on first use; marker reads/writes are
    * single-row driver-side JDBC (the data itself still streams through
    * Spark's writer).
    */
  /** @param afterAppend crash-injection seam for tests: invoked between
    *                     the data append and the marker insert — throwing
    *                     here simulates the documented append→marker
    *                     failure window (the at-least-once floor of the
    *                     guarantee ladder). Production callers leave the
    *                     default no-op. */
  def idempotentBatchWriter(
      jdbc: JdbcConfig, table: String,
      afterAppend: () => Unit = () => ())(
      df: DataFrame, batchId: Long): Unit = {
    val commits = s"${table}_commits"
    val conn = java.sql.DriverManager.getConnection(
      jdbc.url, jdbc.user, jdbc.password)
    try {
      // Create-and-tolerate-exists instead of a metadata probe: JDBC
      // getTables is a trap here — Derby folds unquoted identifiers to
      // UPPER while PostgreSQL folds to lower and matches the pattern
      // case-sensitively, so a probe that passes on the embedded test DB
      // silently never finds the table on the production target (and '_'
      // in the pattern is a wildcard on top). Issuing CREATE TABLE and
      // swallowing only the already-exists SQLState is dialect-portable:
      // X0Y32 = Derby "object already exists", 42P07 = PostgreSQL
      // "duplicate_table", 42S01 = SQL-standard/MySQL "table exists".
      val st = conn.createStatement()
      try st.executeUpdate(
        s"CREATE TABLE $commits (batch_id BIGINT NOT NULL PRIMARY KEY)")
      catch {
        case e: java.sql.SQLException
            if Set("X0Y32", "42P07", "42S01").contains(e.getSQLState) => ()
      } finally st.close()
      val check = conn.prepareStatement(
        s"SELECT 1 FROM $commits WHERE batch_id = ?")
      val already = try {
        check.setLong(1, batchId)
        val rs = check.executeQuery()
        val hit = rs.next(); rs.close(); hit
      } finally check.close()
      if (already) {
        // Skip the EXTERNAL write, not the computation: a stateful
        // upstream (fMGWS/windowed agg) commits its state stores inside
        // this batch's partition tasks, and Spark 4 validates that every
        // partition committed — an unconsumed replay fails the batch
        // exactly where exactly-once matters (recovery). The noop write
        // materializes all partitions with no side effect.
        df.write.format("noop").mode("overwrite").save()
        log(s"[batch $batchId] already committed to $table — replay skipped")
      } else {
        jdbcAppend(df, jdbc, table)
        afterAppend()
        val mark = conn.prepareStatement(
          s"INSERT INTO $commits (batch_id) VALUES (?)")
        try { mark.setLong(1, batchId); mark.executeUpdate() }
        finally mark.close()
      }
    } finally conn.close()
  }

  /** [[jdbcStream]] with the replay-safe writer wired in. */
  def jdbcIdempotentStream(
      stream: DataFrame,
      jdbc: JdbcConfig,
      table: String,
      checkpoint: String,
      queryName: String): StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .outputMode("append")
      .option("checkpointLocation", s"$checkpoint/$queryName")
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        if (nonEmpty(df, batchId, table))
          idempotentBatchWriter(jdbc, table)(df, batchId)
      }
      .start()

  /** K2+K4 fused: ONE streaming query whose foreachBatch writes alerts to
    * both JDBC and Kafka.
    *
    * The reference starts two independent queries off the same lineage
    * (alert_detector.py:246-262), so Kafka is consumed twice, the CaseWhen
    * chain is computed twice, and the two sinks can diverge on failure
    * (SURVEY §2.9.4). Here the batch is computed once, persisted for the
    * two writes, and both sinks share one checkpointed offset log. Write
    * order is JDBC then Kafka: a failure between the two re-runs the batch,
    * re-appending to JDBC (at-least-once) rather than ever publishing an
    * alert that was not persisted.
    *
    * @param writeJdbc  batch writer (default: real JDBC append); injectable
    *                   so tests can collect
    * @param writeKafka batch writer for the (key, value) payload frame
    *                   (default: real Kafka append)
    */
  def alertsDualSink(
      alerts: DataFrame,
      cfg: PipelineConfig,
      writeJdbc: DataFrame => Unit = null,
      writeKafka: DataFrame => Unit = null): StreamingQuery = {
    val jdbcW: DataFrame => Unit =
      if (writeJdbc != null) writeJdbc
      else df => jdbcAppend(df, cfg.jdbc, cfg.jdbc.alertsTable)
    val kafkaW: DataFrame => Unit =
      if (writeKafka != null) writeKafka
      else df =>
        df.write
          .format("kafka")
          .option("kafka.bootstrap.servers", cfg.kafka.bootstrapServers)
          .option("topic", cfg.kafka.alertTopic)
          .save()
    alerts.writeStream
      .queryName("alerts_dual_sink")
      .outputMode("append")
      .option("checkpointLocation", s"${cfg.checkpointRoot}/alerts_dual_sink")
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        if (nonEmpty(df, batchId, "alerts")) {
          df.persist()
          try {
            jdbcW(df)
            kafkaW(AlertPayload.toKafka(df))
            log(s"[batch $batchId] wrote alerts to jdbc+kafka")
          } finally df.unpersist()
        }
      }
      .start()
  }

  /** Hard cap on driver-side email materialization per micro-batch. Alerts
    * are ~0.9 % of readings (SURVEY §6) and severity-filtered, so a normal
    * batch is far below this; the cap exists for the abnormal one — a
    * threshold misconfig turning every reading into an alert would
    * otherwise `collect()` the whole batch onto the driver. Past the cap
    * the overflow is counted and logged loudly, not mailed: an operator
    * drowning in 10k emails learns less than one reading "capped, 9900
    * dropped".
    */
  val MaxEmailsPerBatch = 100

  /** K5 stream half: mailable alerts → notifier. The collect() is the one
    * deliberate driver-side hop in the engine, and it is BOUNDED: at most
    * [[MaxEmailsPerBatch]] rows cross to the driver regardless of batch
    * size (limit runs on the executors before the collect).
    */
  def notifierSink(
      mailableAlerts: DataFrame,
      cfg: PipelineConfig,
      notifier: AlertNotifier,
      checkpoint: String = null): StreamingQuery = {
    val cp = if (checkpoint != null) checkpoint
             else s"${cfg.checkpointRoot}/mail_notifier"
    val recipient = cfg.smtp.recipient
    mailableAlerts.writeStream
      .queryName("mail_notifier")
      .outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        if (nonEmpty(df, batchId, "mailable alerts")) {
          val sent = df.limit(MaxEmailsPerBatch).collect()
          sent.foreach { row: Row =>
            notifier.send(AlertEmail.fromAlertRow(row, recipient))
          }
          if (sent.length == MaxEmailsPerBatch) {
            val total = df.count()
            if (total > MaxEmailsPerBatch)
              log(s"[batch $batchId] ALERT STORM: $total mailable alerts, " +
                s"capped at $MaxEmailsPerBatch emails, " +
                s"${total - MaxEmailsPerBatch} dropped")
          }
        }
      }
      .start()
  }

  /** Streaming parquet archive sink: the data-lake landing zone the
    * reference lacks (Postgres was its only durable store). Append-mode
    * file sink with its own checkpoint; partition by a low-cardinality
    * column (sensor_type) so downstream scans prune.
    */
  def parquetArchive(
      stream: DataFrame,
      dir: String,
      checkpoint: String,
      partitionBy: Seq[String] = Seq("sensor_type")): StreamingQuery = {
    val writer = stream.writeStream
      .queryName("parquet_archive")
      .format("parquet")
      .option("path", dir)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .start()
  }

  /** Debug console sink (K6). */
  def console(stream: DataFrame, numRows: Int = 20): DataStreamWriter[Row] =
    stream.writeStream.format("console")
      .option("numRows", numRows).outputMode("append")

  /** Micro-batch trigger shared by the pipeline queries; the reference uses
    * the default as-fast-as-possible trigger, kept here as the default.
    */
  def defaultTrigger: Trigger = Trigger.ProcessingTime(0L)
}
