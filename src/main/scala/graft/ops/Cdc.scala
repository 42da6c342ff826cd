package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Change-data-capture compaction over the event changelog — the two
  * standard shapes a lakehouse ingest pipeline applies before anything
  * downstream reads the table (Delta/Iceberg `MERGE INTO` latest-wins
  * compaction, and the SCD Type-2 history dimension build).
  *
  * The reference pipeline persists every reading append-only
  * (data_persistance.py:48-73); these operators are the read-side
  * compactions of exactly such a log. The event stream is treated as a
  * changelog keyed by `user_id`: each event upserts the user's register
  * (its `event_type` + `value`), ordered by event time with `event_id`
  * as the deterministic tie-break; `error` events act as tombstones
  * (the CDC delete marker).
  *
  * Scale shape: both operators are ONE hash-partition of the changelog by
  * key and ONE sort per partition — the minimum any keyed compaction can
  * do. [[applyLatest]]'s `rn = 1` filter pushes into the window exec as
  * WindowGroupLimit (per-partition top-1 heap, O(keys) state instead of
  * O(rows)); [[scd2History]]'s second window reuses the first's
  * partitioning and sort (same key, same order — no second Exchange),
  * which is what keeps a 100 TB history rebuild at one shuffle.
  */
object Cdc {

  private val tsSec = col("ts").cast("long").alias("ts_sec")

  /** Latest-wins CDC apply: the current snapshot after replaying the
    * changelog — per key, the most recent non-tombstone register, and
    * nothing for keys whose latest entry is a tombstone. This is
    * `MERGE INTO` / Kafka log-compaction semantics: later writes shadow
    * earlier ones, a trailing delete removes the key entirely (a delete
    * followed by a later upsert resurrects it).
    *
    * The tombstone test runs AFTER the top-1 cut, not before — filtering
    * tombstones first would resurrect every deleted key's stale
    * penultimate version, the classic CDC-apply bug.
    */
  def applyLatest(events: DataFrame, tombstoneType: String = "error"): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec").desc, col("event_id").desc)
    events
      .where(col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), tsSec,
        col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("event_type") =!= tombstoneType)
      .select(col("user_id"), col("event_type"), col("value"),
        col("ts_sec").alias("as_of_s"))
  }

  /** Changelog compaction WITH tombstone garbage collection — the
    * Kafka-log-compaction `delete.retention.ms` / Delta-CDC VACUUM
    * semantics [[applyLatest]] deliberately skips: the compacted log
    * keeps one row per key (latest wins), and a key whose latest entry
    * is a TOMBSTONE stays in the log as an explicit delete marker until
    * the GC watermark passes it — downstream incremental consumers that
    * have not read past the watermark yet still need the delete; only
    * tombstones older than the watermark vanish (with their key). The
    * watermark is the integer midpoint of the event timeline (the
    * [[graft.ops.Profile]] PSI cut convention) so the query is
    * scale-invariant; production callers pass their retention cut the
    * same way.
    *
    * Shape: one bounds aggregate broadcast back (the facts never shuffle
    * for the cut), then the [[applyLatest]] top-1 window — one Exchange
    * on the key. The midpoint is `shiftright(lo+hi+1, 1)` — arithmetic
    * shift IS floor division by 2 on two's-complement longs, matching
    * DuckDB's flooring `//` even on pre-1970 (negative epoch-second)
    * timelines where Spark's `div` would truncate toward zero instead
    * (the same floorDiv discipline as [[streamingApply]]).
    */
  def compactChangelog(
      events: DataFrame, tombstoneType: String = "error"): DataFrame = {
    val rows = events
      .where(col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), tsSec,
        col("event_type"), col("value"))
    val bounds = rows.agg(min(col("ts_sec")).alias("lo"),
      max(col("ts_sec")).alias("hi"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec").desc, col("event_id").desc)
    rows.crossJoin(broadcast(bounds))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .withColumn("is_tombstone", col("event_type") === lit(tombstoneType))
      .where(!col("is_tombstone") ||
        col("ts_sec") >= expr("shiftright(lo + hi + 1, 1)"))
      .select(col("user_id"), col("event_type"), col("value"),
        col("ts_sec").alias("as_of_s"), col("is_tombstone"))
  }

  /** SCD Type-2 history: the user's `event_type` register compressed into
    * validity intervals. Consecutive repeats collapse (a version opens
    * only when the state CHANGES); each version carries `valid_from_s`
    * (inclusive), `valid_to_s` (exclusive start of the successor; null on
    * the open current version), a 1-based `version` ordinal, and
    * `is_current`. Half-open intervals mean an as-of probe
    * `valid_from_s <= t < valid_to_s` matches exactly one version per key
    * — the contract a dimension join needs.
    *
    * Both windows share the key and sort order, so Catalyst plans one
    * Exchange + one Sort; the change-row filter between them only shrinks
    * partitions, never re-distributes them.
    */
  def scd2History(events: DataFrame): DataFrame = {
    val wAll = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    val changes = events
      .where(col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), tsSec, col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(wAll))
      .where(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
    val wChg = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    val validTo = lead(col("ts_sec"), 1).over(wChg)
    changes.select(
      col("user_id"), col("event_type"),
      row_number().over(wChg).alias("version"),
      col("ts_sec").alias("valid_from_s"),
      validTo.alias("valid_to_s"),
      validTo.isNull.alias("is_current"))
  }

  /** Point-in-time (as-of) probe against [[scd2History]] — the query the
    * history dimension exists FOR: enrich each event with the state
    * version that was current at its event time. The half-open contract
    * (`valid_from_s <= t < valid_to_s`, null valid_to = open) guarantees
    * EXACTLY one version matches per probe, so the join can never dup or
    * drop facts — the property a dimension join must have and a naive
    * BETWEEN (closed-closed) silently breaks at boundaries.
    *
    * Scale shape: an EQUI join on the key carries the range predicate as
    * a post-join filter — Spark plans SortMergeJoin on `user_id`, never
    * a nested-loop product, because the equality conjunct anchors it;
    * versions per key are bounded by that key's change count, so the
    * per-row filter fan-in stays small. Probing events against their OWN
    * history is self-consistency: every event must land in exactly one
    * version (asserted by the oracle's row count equality).
    */
  def scd2AsOfProbe(events: DataFrame): DataFrame = {
    val hist = scd2History(events)
      .select(col("user_id").alias("h_uid"), col("event_type").alias("state"),
        col("version"), col("valid_from_s"), col("valid_to_s"))
    events
      .where(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), tsSec)
      .join(hist,
        col("user_id") === col("h_uid") &&
          col("ts_sec") >= col("valid_from_s") &&
          (col("valid_to_s").isNull || col("ts_sec") < col("valid_to_s")))
      .select(col("event_id"), col("user_id"), col("ts_sec"),
        col("state"), col("version"))
  }

  case class CdcEvent(
      user_id: Long, event_time: Timestamp, event_id: Long,
      event_type: String, value: Double)

  /** Per-key register: the current (ts, event_id)-max entry. ONE fixed-
    * size record per key — bounded state however long the stream runs. */
  case class CdcRegister(
      tsSec: Long, eventId: Long, eventType: String, value: Double)

  /** One emitted snapshot delta: the key's new current row, or
    * `deleted = true` when a tombstone took the register. */
  case class CdcUpdate(
      user_id: Long, event_type: String, value: Double, as_of_s: Long,
      deleted: Boolean)

  /** Streaming face of [[applyLatest]] — the register maintained
    * incrementally in `flatMapGroupsWithState`, emitting one
    * [[CdcUpdate]] per key per batch that CHANGES it (nothing when a
    * batch only brings stale rows). On a complete single-batch replay
    * the emission per key is exactly [[applyLatest]]'s row — with
    * `deleted = true` standing in for the batch face's absent row — the
    * cross-paradigm equivalence CdcSpec pins. Cross-batch late data is
    * forward-only: an event older than the register cannot rewind it,
    * the same trade every log-compaction consumer makes (and the reason
    * the batch face exists for reconciliation).
    *
    * State is ONE register per key (two longs, a string, a double) —
    * bounded regardless of stream length; keyed shuffle only, no window,
    * no sort beyond the per-batch per-key group.
    */
  def streamingApply(
      events: DataFrame,
      tombstoneType: String = "error"): Dataset[CdcUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    def step(
        userId: Long,
        batch: Iterator[CdcEvent],
        state: GroupState[CdcRegister]): Iterator[CdcUpdate] = {
      // (ts, event_id) lexicographic max of the batch — one pass, no sort.
      var st = state.getOption.orNull
      var changed = false
      batch.foreach { e =>
        // floorDiv, not /: Java's / truncates toward zero, so pre-1970
        // timestamps would round the OPPOSITE way from applyLatest's
        // cast-to-long (floor) and break the single-batch equivalence.
        val t = Math.floorDiv(e.event_time.getTime, 1000L)
        if (st == null || t > st.tsSec ||
            (t == st.tsSec && e.event_id > st.eventId)) {
          st = CdcRegister(t, e.event_id, e.event_type, e.value)
          changed = true
        }
      }
      if (!changed) Iterator.empty
      else {
        state.update(st)
        Iterator.single(CdcUpdate(userId, st.eventType, st.value,
          st.tsSec, deleted = st.eventType == tombstoneType))
      }
    }
    events
      .where(col("ts").isNotNull)
      .select(col("user_id"), col("ts").alias("event_time"),
        col("event_id"), col("event_type"), col("value"))
      .as[CdcEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }

  /** [[streamingApply]] with IDLE-STATE EVICTION — the face for unbounded
    * key spaces, where "one register per key" still grows without bound
    * as keys go cold: a register whose key has been silent for
    * `idleRetentionSec` of EVENT time (measured by the stream's
    * watermark, so wall-clock stalls don't evict) is dropped silently.
    * The documented trade: after eviction, the next event for the key —
    * even one older than the evicted register — is accepted as a fresh
    * register, exactly the contract every TTL'd log-compaction consumer
    * makes. Cross-batch shadowing within the retention window is
    * unchanged (stale rows cannot rewind a live register).
    *
    * State per key stays ONE register + one timeout timestamp; eviction
    * work is proportional to expired keys per trigger, not state size.
    */
  def streamingApplyExpiring(
      events: DataFrame,
      tombstoneType: String = "error",
      idleRetentionSec: Long = 3600L,
      watermarkDelay: String = "10 seconds"): Dataset[CdcUpdate] = {
    require(idleRetentionSec > 0,
      s"idle retention must be positive, got $idleRetentionSec")
    val spark = events.sparkSession
    import spark.implicits._
    def step(
        userId: Long,
        batch: Iterator[CdcEvent],
        state: GroupState[CdcRegister]): Iterator[CdcUpdate] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        var st = state.getOption.orNull
        var changed = false
        batch.foreach { e =>
          val t = Math.floorDiv(e.event_time.getTime, 1000L)
          if (st == null || t > st.tsSec ||
              (t == st.tsSec && e.event_id > st.eventId)) {
            st = CdcRegister(t, e.event_id, e.event_type, e.value)
            changed = true
          }
        }
        if (st != null) {
          state.update(st)
          // Expiry must sit past the current watermark or Spark rejects
          // it; a register already older than retention evicts next
          // trigger instead of throwing.
          state.setTimeoutTimestamp(Math.max(
            (st.tsSec + idleRetentionSec) * 1000L,
            state.getCurrentWatermarkMs() + 1L))
        }
        if (!changed) Iterator.empty
        else Iterator.single(CdcUpdate(userId, st.eventType, st.value,
          st.tsSec, deleted = st.eventType == tombstoneType))
      }
    }
    events
      .where(col("ts").isNotNull)
      .select(col("user_id"), col("ts").alias("event_time"),
        col("event_id"), col("event_type"), col("value"))
      .withWatermark("event_time", watermarkDelay)
      .as[CdcEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)
  }
}
