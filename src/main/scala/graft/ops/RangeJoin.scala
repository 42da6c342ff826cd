package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: match each point to the interval(s)
  * of the same key that contain it — the other time-series join Spark has
  * no native operator for. The naive formulation (`p.ts BETWEEN i.start
  * AND i.end` as a join condition) plans a per-key nested loop: quadratic
  * in the key's row count, hopeless at scale.
  *
  * Implemented with BIN BUCKETING: time is cut into fixed bins, every
  * interval is exploded to the bins it overlaps, every point maps to its
  * single bin, and the match becomes a hash equi-join on (key, bin)
  * followed by the exact BETWEEN filter. A point's bin is covered by every
  * interval containing it, so recall is exact; a point matches a
  * containing interval in EXACTLY one bin (its own), so no dedup is
  * needed. Cost: shuffle of points + intervals×(span/binSize) rows —
  * choose `binSize` near the typical interval span so the explosion
  * factor stays O(1) (a bin much smaller than intervals multiplies the
  * interval side; much larger, and each bin holds many intervals and the
  * post-filter does the work).
  */
object RangeJoin {

  /** Points `(key, ts, ...)` joined to intervals `(key, start, end, ...)`
    * with `start ≤ ts ≤ end` (inclusive both ends). All of `ts`, `start`,
    * `end` are epoch-second longs; interval columns are carried through
    * unprefixed, so callers project/rename beforehand to avoid collisions.
    */
  /** Per-interval explosion cap: an interval spanning more bins than this
    * (a sentinel end like Long.MaxValue, or a binSize wildly smaller than
    * real spans) fails LOUDLY at that row instead of OOMing the stage or
    * silently multiplying the interval side thousands-fold.
    */
  val MaxBinsPerInterval = 10000L

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      ts: String,
      start: String,
      end: String,
      binSize: Long = 3600L,
      maxBins: Long = MaxBinsPerInterval): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    require(maxBins > 0, s"maxBins must be positive, got $maxBins")
    val binned = intervals.withColumn("__bin",
      explode(guardedBins(start, end, binSize, maxBins)))
    val pts = points.withColumn("__bin", expr(s"$ts div $binSize"))
    pts.join(binned, Seq(key, "__bin"))
      .where(col(ts) >= col(start) && col(ts) <= col(end))
      .drop("__bin")
  }

  /** The bins an interval overlaps, as a sequence column. The explosion
    * guard lives INSIDE the sequence bound so column pruning cannot drop
    * it: raise_error fires on the offending row, naming the span.
    */
  private def guardedBins(
      start: String, end: String, binSize: Long, maxBins: Long): Column = {
    val startBin = expr(s"$start div $binSize")
    val endBin = expr(s"$end div $binSize")
    val endBinGuarded = when(endBin - startBin < lit(maxBins), endBin)
      .otherwise(raise_error(concat(
        lit(s"interval spans ≥ $maxBins bins of $binSize s (start="),
        col(start), lit(", end="), col(end),
        lit(") — widen binSize or split the interval"))).cast("long"))
    sequence(startBin, endBinGuarded)
  }

  /** Interval–interval OVERLAP join: every `(left, right)` pair whose
    * [start, end] ranges intersect (inclusive ends) — the join behind
    * concurrency analysis, maintenance-window attribution, and
    * session×incident overlap, which Spark would otherwise plan as a
    * nested loop over the inequality condition.
    *
    * Same bin-bucketing engine as [[pointInInterval]], with BOTH sides
    * exploded to their overlapped bins and the pair match made a hash
    * equi-join on the bin. An overlapping pair shares every bin of its
    * intersection, so it would match once per shared bin; the
    * FIRST-SHARED-BIN rule — keep the match only in bin
    * `max(l_start div b, r_start div b)`, the earliest bin both cover —
    * makes the join exactly-once BY CONSTRUCTION (no distinct pass, which
    * would shuffle the matched pairs a second time).
    *
    * `key` optionally co-partitions both sides (e.g. per-user overlap);
    * without it the join keys on the bin alone, which is the right shape
    * when one side is a small global interval set (incidents, deploy
    * windows) — at 100 TB put the BIG side on the left and keep the
    * global side bounded, or supply a key.
    */
  def intervalOverlap(
      left: DataFrame,
      lStart: String,
      lEnd: String,
      right: DataFrame,
      rStart: String,
      rEnd: String,
      binSize: Long = 3600L,
      maxBins: Long = MaxBinsPerInterval,
      key: Option[String] = None): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    require(maxBins > 0, s"maxBins must be positive, got $maxBins")
    val lb = left.withColumn("__bin",
      explode(guardedBins(lStart, lEnd, binSize, maxBins)))
    val rb = right.withColumn("__bin",
      explode(guardedBins(rStart, rEnd, binSize, maxBins)))
    lb.join(rb, key.toSeq :+ "__bin")
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__bin") === greatest(
          expr(s"$lStart div $binSize"), expr(s"$rStart div $binSize")))
      .drop("__bin")
  }

  /** The benchmark query: purchase events matched to the gaps-and-islands
    * session containing them (sessions from [[Sessionize.sessions]] of the
    * SAME event stream, so every purchase lands in exactly one session —
    * the join is a total function here, and the oracle checks it against
    * DuckDB's declarative BETWEEN join).
    */
  def purchasesInSessions(events: DataFrame): DataFrame = {
    val sessions = Sessionize.sessions(events)
      .select(col("user_id"), col("session_seq"),
        col("start_sec"), col("end_sec"))
    val purchases = events
      .where(col("ts").isNotNull && col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("long").alias("ts_sec"))
    pointInInterval(purchases, sessions,
      key = "user_id", ts = "ts_sec", start = "start_sec", end = "end_sec",
      binSize = 1800L)
      .select(col("event_id"), col("user_id"), col("session_seq"))
  }
}
