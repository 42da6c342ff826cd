package graft.harness

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic mapping from the driver's `events` test table onto the
  * engine's canonical sensor-reading shape (FIXTURES.md §B.1), so every
  * reference operator can be oracle-checked by DuckDB over the same parquet.
  *
  * Mapping (mirrored 1:1 by [[readingsSql]], which oracle queries inline as
  * a CTE — keep the two in lockstep):
  *   sensor_type    = click→temperature, view→humidity, purchase→pressure,
  *                    else event_type verbatim
  *   unit           = celsius / percent / hPa per mapped type, else 'count'
  *   building       = 'A';  floor = user_id%2+1;  room = 100+user_id%4
  *   sensor_id      = A_<floor>_<room>_<sensor_type>
  *   timestamp      = ts formatted 'yyyy-MM-dd HH:mm:ss.SSSSSS' (raw-string
  *                    timestamp semantics of the reference, SURVEY §2.9.8)
  *   value          = value
  *   battery_level  = props JSON field k (0..99)
  *   signal_strength= -k  (dBm-like, so the <-75/-70 rules fire)
  */
object StandIn {

  /** Per-(session, path) memo of the PLAN returned by
    * `spark.read.parquet` — file listing + footer schema only, exactly
    * what a catalog table caches between queries. Every action over the
    * returned frame still scans the parquet data; no rows or results are
    * ever cached here. Without this, a 264-query bench pass re-lists and
    * re-infers the same three static files once per query invocation.
    * Keyed by session so tests with many short-lived sessions never see
    * another session's resolved plan.
    */
  private val readCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def readParquet(spark: SparkSession, path: String): DataFrame =
    readCache.computeIfAbsent((spark, path),
      _ => spark.read.parquet(path))

  /** The driver's events.parquet has shipped `ts` in two layouts across
    * rounds: INT64 TIMESTAMP(NANOS) (which Spark 4.x refuses by default,
    * PARQUET_TYPE_ILLEGAL — read as a nanos long and truncate to µs) and,
    * since round 10, plain TIMESTAMP(MICROS) NTZ. Normalize both to
    * TimestampType µs. The session timezone is pinned to UTC everywhere
    * (Verify/Bench/SparkSpec builders), so the NTZ→TimestampType cast is
    * value-identical and DuckDB's `CAST(ts AS TIMESTAMP)` stays in
    * lockstep for either physical layout. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    eventsFannedBy(spark, sfDir, Nil)

  private def eventsFannedBy(
      spark: SparkSession, sfDir: String,
      keys: Seq[org.apache.spark.sql.Column]): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = readParquet(spark, s"$sfDir/events.parquet")
    // Exhaustive on the layouts actually shipped; anything else (a future
    // epoch-micros INT64 without the nanos flag, a VARCHAR ts) must FAIL
    // here with the observed type rather than silently mis-scale — a wrong
    // divisor corrupts every downstream timestamp with no error anywhere.
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))      // legacy INT64 nanos
      case org.apache.spark.sql.types.TimestampType =>
        col("ts")                                  // µs timestamp (TZ)
      case org.apache.spark.sql.types.TimestampNTZType =>
        col("ts").cast("timestamp")                // µs timestamp (NTZ)
      case other => throw new IllegalStateException(
        s"events.parquet ts column has unhandled type $other; " +
          "add an explicit mapping (see StandIn.events scaladoc)")
    }
    fanOut(spark, raw, keys).withColumn("ts", ts)
  }

  /** [[events]] with the harness fan-out HASH-KEYED by `user_id` instead
    * of round-robin (r20, guide §2.4) — for the ts/window/sessionize/
    * cdc/asof/funnel family, whose first re-key is by user_id: the same
    * bytes move through the same harness-only exchange, but
    * EnsureRequirements then elides every downstream exchange whose
    * clustering includes user_id (HashPartitioning on a subset of the
    * grouping keys satisfies the distribution), so the agg AND the
    * window run in place — ts_resample_interp went from 3 exchanges to 1
    * and 1.79 s to 0.55 s at sf0.1. This is the bucketed-input idiom: a
    * production events table bucketed by entity yields the same plan.
    * Deliberately a SEPARATE accessor: keying [[events]] itself would
    * drag user_id into the ReadSchema of every events scan — queries
    * that never touch user_id (value histograms, chi-square) would lose
    * column pruning, which PlanEvidenceSpec pins as a first-class scale
    * property. Results are partitioning-invariant by engine-wide
    * construction (decimal/integer aggregation, 6-dp rounding); the
    * driver already re-benches at a different core count, a bigger
    * partitioning change than this.
    */
  def eventsByUser(spark: SparkSession, sfDir: String): DataFrame =
    eventsFannedBy(spark, sfDir, Seq(col("user_id")))

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    // Same entity-keyed fan-out as events (doc_id): signal frames and
    // keeper/split joins all re-key by doc_id downstream; gram/band-keyed
    // stages pay the same exchange either way.
    fanOut(spark, readParquet(spark, s"$sfDir/documents.parquet"),
      Seq(col("doc_id")))

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    fanOut(spark, readParquet(spark, s"$sfDir/embeddings.parquet"))

  /** HARNESS-ONLY remedy: the driver's testdata files each hold ONE parquet
    * row group, so a scan cannot split below one task and every post-scan
    * stage (JSON round-trips, signatures) would run on a single core. A
    * cheap round-robin shuffle of the few-MB input restores parallelism.
    * Do NOT copy this into engine paths — production inputs have many row
    * groups/files and repartitioning 100 TB after scan would be a
    * full-data shuffle for nothing.
    */
  private def fanOut(
      spark: SparkSession, df: DataFrame,
      keys: Seq[org.apache.spark.sql.Column] = Nil): DataFrame =
    if (keys.isEmpty)
      df.repartition(spark.sparkContext.defaultParallelism)
    else
      df.repartition(spark.sparkContext.defaultParallelism, keys: _*)

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    readParquet(spark, s"$sfDir/$name.parquet")

  /** events → flat canonical readings (+ `event_time` TimestampType). */
  def readingsFromEvents(ev: DataFrame): DataFrame = {
    val sensorType = expr(
      """CASE event_type WHEN 'click' THEN 'temperature'
        |  WHEN 'view' THEN 'humidity'
        |  WHEN 'purchase' THEN 'pressure'
        |  ELSE event_type END""".stripMargin)
    val floorC = expr("CAST(user_id % 2 + 1 AS INT)")
    val roomC  = expr("CAST(100 + user_id % 4 AS INT)")
    val batt   = expr("CAST(get_json_object(props, '$.k') AS INT)")
    ev.select(
      concat_ws("_", lit("A"), floorC, roomC, sensorType).alias("sensor_id"),
      sensorType.alias("sensor_type"),
      lit("A").alias("building"),
      floorC.alias("floor"),
      roomC.alias("room"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("timestamp"),
      col("value"),
      expr(
        """CASE event_type WHEN 'click' THEN 'celsius'
          |  WHEN 'view' THEN 'percent'
          |  WHEN 'purchase' THEN 'hPa'
          |  ELSE 'count' END""".stripMargin).alias("unit"),
      batt.alias("battery_level"),
      (-batt).cast("int").alias("signal_strength"),
      col("ts").alias("event_time"))
  }

  /** DuckDB CTE mirroring [[readingsFromEvents]] byte-for-byte in values. */
  def readingsSql(eventsTable: String = "events"): String =
    s"""WITH readings AS (
       |  SELECT
       |    concat_ws('_', 'A', CAST(user_id % 2 + 1 AS INT),
       |              CAST(100 + user_id % 4 AS INT),
       |              CASE event_type WHEN 'click' THEN 'temperature'
       |                WHEN 'view' THEN 'humidity'
       |                WHEN 'purchase' THEN 'pressure'
       |                ELSE event_type END) AS sensor_id,
       |    CASE event_type WHEN 'click' THEN 'temperature'
       |      WHEN 'view' THEN 'humidity'
       |      WHEN 'purchase' THEN 'pressure'
       |      ELSE event_type END AS sensor_type,
       |    'A' AS building,
       |    CAST(user_id % 2 + 1 AS INT) AS floor,
       |    CAST(100 + user_id % 4 AS INT) AS room,
       |    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS timestamp,
       |    value,
       |    CASE event_type WHEN 'click' THEN 'celsius'
       |      WHEN 'view' THEN 'percent'
       |      WHEN 'purchase' THEN 'hPa'
       |      ELSE 'count' END AS unit,
       |    CAST(json_extract_string(props, '$$.k') AS INT) AS battery_level,
       |    CAST(-CAST(json_extract_string(props, '$$.k') AS INT) AS INT) AS signal_strength,
       |    CAST(ts AS TIMESTAMP) AS event_time
       |  FROM $eventsTable
       |)""".stripMargin
}
