package graft.harness

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.{Anomaly, Cdc, Dedup, Sessionize, WindowOps}

/** Streaming-throughput micro-bench (r14 verdict item 7): the stateful
  * operator families are e2e-correct but were never MEASURED, so a
  * state-store regression (a provider change, an accidental per-row
  * state rewrite, a timeout storm) would ship invisibly. Each family
  * gets a MemoryStream-fed run — warm-up batch, then `batches` timed
  * batches of `rowsPerBatch` rows through a noop sink — under BOTH
  * state-store providers (HDFS-backed and RocksDB), reporting rows/sec
  * and the final state-row count.
  *
  * These are micro-bench numbers on synthetic keys (1000 hot keys,
  * event time advancing 10 min per batch so watermark eviction work is
  * included); they track RELATIVE drift round over round, not absolute
  * cluster throughput.
  */
object StreamBench {

  /** `stateRows` is −1 when `rowsTracked` is false: the RocksDB runs pin
    * `trackTotalNumberOfRows=false` (the get-before-put the exact gauge
    * costs doubled the write ops on the big-state screen — see the
    * provider-pin comment below), which removes the metric AT THE SOURCE,
    * so Spark's `numRowsTotal` reports 0. Stamping that 0 as a real count
    * made the r17 artifact read "RocksDB holds no state" next to the HDFS
    * twin's 3.36M on the same workload (r17 verdict finding 1) — −1 plus
    * the explicit flag keeps the artifact honest: the state is the same
    * by construction (read the HDFS twin's count), only the gauge is off.
    */
  final case class Result(
      op: String, provider: String, rows: Long, secs: Double,
      rowsPerSec: Double, stateRows: Long, stateBytes: Long,
      outputRows: Long, rowsTracked: Boolean)

  private val Providers = Seq(
    "hdfs" ->
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "rocksdb" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  private val Keys = 1000
  private val BaseMs = Timestamp.valueOf("2026-01-01 00:00:00").getTime

  /** Event time: +10 min per batch (watermarks advance, sessions close,
    * dedup state ages out), spread over 60 s inside a batch. */
  private def ts(batch: Int, i: Int): Timestamp =
    new Timestamp(BaseMs + (batch + 1).toLong * 600000L +
      (i % 60000).toLong)

  private def bench[A](
      spark: SparkSession, name: String, provider: String,
      rowsPerBatch: Int, batches: Int, ckptRoot: java.nio.file.Path,
      rowsTracked: Boolean = true)(
      mk: DataFrame => DataFrame)(gen: (Int, Int) => Seq[A])(
      implicit enc: Encoder[A]): Result = {
    val input = MemoryStream[A](spark)
    val q = mk(input.toDF()).writeStream
      .format("noop")
      .outputMode("append")
      .option("checkpointLocation",
        ckptRoot.resolve(s"$name-$provider").toString)
      .start()
    try {
      input.addData(gen(-1, 100)) // warm-up: codegen + state-store init
      q.processAllAvailable()
      def sunkRows: Long = q.recentProgress
        .map(_.sink.numOutputRows).filter(_ > 0).sum
      val outBefore = sunkRows
      val t0 = System.nanoTime()
      (0 until batches).foreach { b =>
        input.addData(gen(b, rowsPerBatch))
        q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val rows = batches.toLong * rowsPerBatch
      val (state, stateBytes) = Option(q.lastProgress)
        .map(p => (p.stateOperators.map(_.numRowsTotal).sum,
          p.stateOperators.map(_.memoryUsedBytes).sum))
        .getOrElse((0L, 0L))
      Result(name, provider, rows, secs,
        if (secs > 0) rows / secs else 0d,
        if (rowsTracked) state else -1L, stateBytes,
        sunkRows - outBefore, rowsTracked)
    } finally q.stop()
  }

  /** Every conf key [[pinProvider]] touches — snapshotted/restored as a
    * set (r18 advice: only providerClass was restored, so the two
    * RocksDB tuning confs leaked into the caller's session and silently
    * re-tuned any later streaming work it ran).
    */
  private val PinnedConfs = Seq(
    "spark.sql.streaming.stateStore.providerClass",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
    "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows")

  /** Run `body` with the provider confs snapshotted, restoring every
    * pinned key (set or unset) afterwards. */
  private def withConfSnapshot[A](spark: SparkSession)(body: => A): A = {
    val prev = PinnedConfs.map(k => k -> spark.conf.getOption(k))
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Recursive delete with the walk stream CLOSED (r18 advice: the
    * unclosed `Files.walk` leaked a directory handle per sweep). A
    * failed delete is surfaced, not swallowed — a RocksDB file still
    * held open would silently re-leak the temp tree this cleanup exists
    * to stop accumulating (r16 advice).
    */
  private def deleteTree(root: java.nio.file.Path): Unit =
    try {
      val s = Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally s.close()
    } catch {
      case t: Throwable =>
        System.err.println(
          s"[streambench] checkpoint cleanup failed, $root leaked: $t")
    }

  /** One full sweep: every family × every provider, sequentially (the
    * point is comparable numbers, not total wall time). */
  def run(
      spark: SparkSession,
      rowsPerBatch: Int = 20000,
      batches: Int = 3): Seq[Result] = {
    // ONE parent temp dir per run, recursively deleted afterwards — the
    // per-op×provider checkpoint dirs (incl. RocksDB state files)
    // otherwise pile up in /tmp across repeated bench invocations (r15
    // advice).
    val ckptRoot = Files.createTempDirectory("graft-streambench")
    try withConfSnapshot(spark) {
      runProviders(spark, rowsPerBatch, batches, ckptRoot)
    } finally deleteTree(ckptRoot)
  }

  /** Pin a provider plus the measured-best RocksDB options; returns
    * whether the provider's `numRowsTotal` gauge stays exact (see
    * [[Result]].rowsTracked).
    */
  private def pinProvider(
      spark: SparkSession, pclass: String): Boolean = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", pclass)
    // Changelog checkpointing (r16 verdict item 5): without it RocksDB
    // uploads a FULL state snapshot at every micro-batch commit, which
    // is exactly what made it 1.6× slower than the HDFS provider on
    // the 3.36M-row set-sim screen while winning every small-state
    // family. With changelog mode only the batch's delta is persisted
    // (snapshots amortize in the background maintenance thread) —
    // exactly-once semantics are unchanged.
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    // trackTotalNumberOfRows does a get-before-put on EVERY state write
    // to keep the numRowsTotal metric exact — on the 3.36M-write screen
    // that is 2× the RocksDB ops for a gauge. Measured on the carried
    // set-sim screen fixture (this box, r17): base 1904 →
    // changelog 2246 → changelog+notrack 2898 rows/s vs HDFS 2731 — the
    // whole r16 gap was metric bookkeeping. Cost: the gauge is gone, so
    // RocksDB rows stamp state_rows=-1 / rows_tracked=false; read the
    // HDFS twin's state_rows (same state by construction) and RocksDB's
    // state_bytes instead.
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows",
      "false")
    !pclass.contains("RocksDB")
  }

  private def runProviders(
      spark: SparkSession,
      rowsPerBatch: Int,
      batches: Int,
      ckptRoot: java.nio.file.Path): Seq[Result] = {
    import spark.implicits._
    Providers.flatMap { case (pname, pclass) =>
      val tracked = pinProvider(spark, pclass)
      val cdc = bench[(Long, Timestamp, Long, String, Double)](
        spark, "cdc_register", pname, rowsPerBatch, batches, ckptRoot, tracked) { df =>
        Cdc.streamingApplyExpiring(
          df.toDF("user_id", "ts", "event_id", "event_type", "value"),
          idleRetentionSec = 3600L).toDF()
      } { (b, n) =>
        (0 until n).map(i => ((i % Keys).toLong, ts(b, i),
          b.toLong * n + i, if (i % 97 == 0) "error" else "view",
          i.toDouble))
      }
      val sess = bench[(Long, Timestamp)](
        spark, "sessions", pname, rowsPerBatch, batches, ckptRoot, tracked) { df =>
        Sessionize.streamingSessions(
          df.toDF("user_id", "ts").withWatermark("ts", "1 minute"),
          gap = "5 minutes")
      } { (b, n) =>
        (0 until n).map(i => ((i % Keys).toLong, ts(b, i)))
      }
      val topn = bench[(Long, Timestamp, Long, Double)](
        spark, "top_n", pname, rowsPerBatch, batches, ckptRoot, tracked) { df =>
        WindowOps.streamingTopN(
          df.toDF("event_id", "ts", "user_id", "value")
            .withWatermark("ts", "10 minutes"), n = 3).toDF()
      } { (b, n) =>
        (0 until n).map(i => (b.toLong * n + i, ts(b, i),
          (i % Keys).toLong, (i % 1009).toDouble))
      }
      val anom = bench[(Long, Timestamp, String, Double)](
        spark, "anomaly", pname, rowsPerBatch, batches, ckptRoot, tracked) { df =>
        Anomaly.streamingOutliers(
          df.toDF("event_id", "ts", "event_type", "value")
            .withWatermark("ts", "10 minutes"),
          threshold = 3.0, minN = 10L).toDF()
      } { (b, n) =>
        (0 until n).map(i => (b.toLong * n + i, ts(b, i),
          s"t${i % 16}", (i % 101).toDouble))
      }
      val dedup = bench[(String, Timestamp)](
        spark, "windowed_distinct", pname, rowsPerBatch, batches, ckptRoot, tracked) { df =>
        Dedup.streamingExact(
          df.toDF("payload", "event_time")
            .withWatermark("event_time", "10 minutes"),
          Seq("payload"))
      } { (b, n) =>
        // Every 3rd row duplicates its predecessor — real dedup work.
        (0 until n).map(i => (s"p-$b-${i - i % 3}", ts(b, i)))
      }
      // Arrival-time set-sim screen vs a 1000-doc static reference: texts
      // cycle 64 word-pool sentences with a per-row tail word, so a
      // steady fraction of arrivals hits the prefix index and survives
      // to the verify join — the screen's full path (prefix explode,
      // stream-static join, watermarked pair dedup, verify) does real
      // work every batch instead of filtering everything at the join.
      val wordPool = Vector("alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "eta", "theta", "iota", "kappa", "lam", "mu")
      def sentence(seed: Int): String =
        (0 until 8).map(j => wordPool((seed + j * j) % wordPool.size))
          .mkString(" ")
      val refDocs = {
        import spark.implicits._
        (0 until 1000)
          .map(i => (100000L + i, sentence(i % 64)))
          .toDF("doc_id", "text")
      }
      val screen = bench[(Long, String, Timestamp)](
        spark, "setsim_screen", pname, rowsPerBatch, batches, ckptRoot, tracked) { df =>
        Dedup.streamingSetSimScreen(
          df.toDF("doc_id", "text", "event_time")
            .withWatermark("event_time", "10 minutes"),
          refDocs, threshold = 0.5)
      } { (b, n) =>
        (0 until n).map { i =>
          val id = b.toLong * n + i
          (id, sentence(i % 64) + s" w${i % 7}", ts(b, i))
        }
      }
      val Seq(screenFlood, contFlood) = floodFamilies(
        spark, pname, tracked, rowsPerBatch, batches, ckptRoot,
        nRefs = 1000, suffix = "")
      Seq(cdc, sess, topn, anom, dedup, screen, screenFlood, contFlood)
    }
  }

  // Boilerplate-FLOOD screens (r16 verdict items 1 + 4): every
  // reference doc trails the same 8-word block, so the block's
  // interior shingles are held by all `nRefs` refs — far over the df
  // cap — while content sentences draw from a synthetic vocabulary
  // mostly unmatched by arrivals. This is the shape that made the
  // uncapped screens the repo's scale-killer: each arrival's prefix
  // hit the boilerplate postings and fanned into ~nRefs candidate
  // pairs (a state row each). With the cap, boilerplate grams are
  // HOT: content-dominated arrivals never touch them, and only the
  // rare boilerplate-dominated arrival (1/1999 here) takes the
  // fallback arm — whose emissions are true output, not fan-out.

  private val Boiler =
    "subscribe newsletter cookie banner terms privacy policy apply"

  private def floodSentence(seed: Int): String =
    (0 until 8).map(j => s"w${(seed * 7 + j * 13) % 9973}").mkString(" ")

  /** The two flood-screen families at a given reference-corpus size.
    * Arrivals: 1-in-50 is a near-dup of a reference (content seed
    * reused + a tail word — the true-positive path), 1-in-1999 is
    * pure boilerplate (the fallback-arm path), the rest are novel
    * content + the boilerplate block (the fan-out hazard path).
    */
  private def floodFamilies(
      spark: SparkSession, pname: String, tracked: Boolean,
      rowsPerBatch: Int, batches: Int, ckptRoot: java.nio.file.Path,
      nRefs: Int, suffix: String): Seq[Result] = {
    import spark.implicits._
    val floodRefs = (0 until nRefs)
      .map(i => (200000L + i, floodSentence(i) + " " + Boiler))
      .toDF("doc_id", "text")
    def floodArrival(b: Int, n: Int, i: Int): (Long, String, Timestamp) = {
      val id = b.toLong * n + i
      val text =
        if (i % 1999 == 0) Boiler
        else if (i % 50 == 0)
          floodSentence(i / 50 % nRefs) + " " + Boiler + s" w${i % 7}"
        else floodSentence(10000 + (b * n + i) % 100000) + " " + Boiler
      (id, text, ts(b, i))
    }
    val screenFlood = bench[(Long, String, Timestamp)](
      spark, s"setsim_screen_flood$suffix", pname, rowsPerBatch, batches,
      ckptRoot, tracked) { df =>
      Dedup.streamingSetSimScreen(
        df.toDF("doc_id", "text", "event_time")
          .withWatermark("event_time", "10 minutes"),
        floodRefs, threshold = 0.5)
    } { (b, n) => (0 until n).map(i => floodArrival(b, n, i)) }
    val contFlood = bench[(Long, String, Timestamp)](
      spark, s"containment_screen_flood$suffix", pname, rowsPerBatch,
      batches, ckptRoot, tracked) { df =>
      Dedup.streamingContainmentScreen(
        df.toDF("doc_id", "text", "event_time")
          .withWatermark("event_time", "10 minutes"),
        floodRefs, threshold = 0.5)
    } { (b, n) => (0 until n).map(i => floodArrival(b, n, i)) }
    Seq(screenFlood, contFlood)
  }

  /** Decade-scale flood sweep (r17 verdict item 3): the SAME gram
    * geometry as the carried flood families at 10× both axes — 10,000
    * reference docs (boilerplate df 10k vs the 64 cap; content-gram df
    * still ~8, far under the cap, so the hot/cold knee sits in the same
    * place) and 600k arrivals (30 batches × 20k). The hot/cold split's
    * scale claim is that per-arrival fan-out is bounded by the cap, not
    * by nRefs — so rows/s here must hold within ~2× of the 1k-ref
    * families and state must grow with OUTPUT (the near-dup and
    * boilerplate-arrival pair emissions), not with refs×arrivals.
    * Emitted with family suffix `10x` into the same artifact.
    */
  def runDecade(
      spark: SparkSession,
      rowsPerBatch: Int = 20000,
      batches: Int = 30,
      nRefs: Int = 10000): Seq[Result] = {
    val ckptRoot = Files.createTempDirectory("graft-streambench-10x")
    try withConfSnapshot(spark) {
      Providers.flatMap { case (pname, pclass) =>
        val tracked = pinProvider(spark, pclass)
        floodFamilies(spark, pname, tracked, rowsPerBatch, batches,
          ckptRoot, nRefs, suffix = "10x")
      }
    } finally deleteTree(ckptRoot)
  }
}
