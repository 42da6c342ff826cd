package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — for every left row, the latest right row at-or-before its
  * timestamp with the same key. The classic time-series operator Spark has
  * no native form of (and the naive `l.ts >= r.ts` range join devolves to
  * a per-key cartesian).
  *
  * Implemented with the UNION-WINDOW trick, per the engine's custom-op
  * preference order (compose existing operators first): tag right rows 0
  * and left rows 1, union them, and running-`last(right_payload,
  * ignoreNulls)` over `(key ORDER BY ts, side)` — at each left row that
  * is exactly "the latest right row at-or-before me" (ties on ts resolve
  * right-before-left, i.e. an equal-timestamp right row DOES match,
  * matching DuckDB's `ON l.ts >= r.ts` ASOF semantics). Cost: ONE shuffle
  * of `|L|+|R|` rows and a per-key sort — O(n log n) where the range join
  * is O(n²) per key; this is how you as-of join at 100 TB.
  */
object AsOf {

  /** Generic as-of join. `payload` columns are taken from `right` and
    * appear nulled on unmatched left rows (left-outer semantics). Right
    * rows must be unique per (key, ts) — pre-dedupe upstream (see
    * [[latestPerKeyTs]]) so "the latest right row" is well defined; the
    * window tie-break would otherwise pick silently.
    *
    * NULL keys follow SQL join semantics: a NULL-keyed right row matches
    * nothing (window partitioning would group NULLs together, which is
    * NOT what `ON l.k = r.k` means), and a NULL-keyed left row passes
    * through unmatched.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String]): DataFrame = {
    val pStruct = struct(payload.map(right(_)): _*)
    val lStruct = struct(left.columns.map(left(_)).toSeq: _*)
    val pType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c)))
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rU = right.where(right(key).isNotNull).select(
      right(key).alias("__k"), right(ts).alias("__t"),
      lit(0).alias("__side"), pStruct.alias("__p"),
      lit(null).cast(lType).alias("__l"))
    val lU = left.select(
      left(key).alias("__k"), left(ts).alias("__t"),
      lit(1).alias("__side"), lit(null).cast(pType).alias("__p"),
      lStruct.alias("__l"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leftCols = left.columns.toSeq.map(c => col(s"__l.`$c`").alias(c))
    val matchCols = payload.map(c => col(s"__m.`$c`").alias(s"asof_$c"))
    rU.union(lU)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols ++ matchCols: _*)
  }

  /** NEAREST-in-time as-of join — for every left row, the right row of
    * the same key closest in time in EITHER direction (ties prefer the
    * backward match, the standard sensor-alignment semantics). The
    * operator behind "align each reading with the closest calibration
    * sample", which backward-only as-of gets wrong whenever the next
    * sample is closer than the previous one.
    *
    * Same union trick as [[asofJoin]], run BOTH ways over ONE exchange:
    * the backward window (ts asc) carries the latest right row at-or-
    * before each left row, the forward window (ts desc) the earliest
    * at-or-after — the true nearest is provably one of those two — and a
    * codegen'd comparison picks the closer in MICROSECONDS (second-
    * truncated arithmetic would break ties differently than the oracle).
    * Two sorts, one shuffle, O(n log n) per key; the declarative
    * formulation is a per-key product.
    *
    * Right rows must be unique per (key, ts) ([[latestPerKeyTs]]).
    * Emits left columns + `nearest_<payload>` + `nearest_dt_us` (signed:
    * negative = matched backward) + `nearest_dir`.
    */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String]): DataFrame = {
    val pStruct = struct(
      (right(ts).alias("__rt") +: payload.map(right(_))): _*)
    val lStruct = struct(left.columns.map(left(_)).toSeq: _*)
    val pType = org.apache.spark.sql.types.StructType(
      right.schema(ts).copy(name = "__rt") +:
        payload.map(c => right.schema(c)))
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rU = right.where(right(key).isNotNull).select(
      right(key).alias("__k"), right(ts).alias("__t"),
      lit(0).alias("__side"), pStruct.alias("__p"),
      lit(null).cast(lType).alias("__l"))
    val lU = left.select(
      left(key).alias("__k"), left(ts).alias("__t"),
      lit(1).alias("__side"), lit(null).cast(pType).alias("__p"),
      lStruct.alias("__l"))
    val wB = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Desc pass: at equal ts the right row (side 0) must sort BEFORE the
    // left row so a same-instant sample is visible forward too.
    val wF = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t = unix_micros(col("__t"))
    val bt = unix_micros(col("__fb.__rt"))
    val ft = unix_micros(col("__ff.__rt"))
    val chooseBack = col("__fb").isNotNull &&
      (col("__ff").isNull || (t - bt) <= (ft - t))
    val chosen = when(chooseBack, col("__fb")).otherwise(col("__ff"))
    val leftCols = left.columns.toSeq.map(c => col(s"__l.`$c`").alias(c))
    val matchCols = payload.map(c =>
      col(s"__c.`$c`").alias(s"nearest_$c"))
    rU.union(lU)
      .withColumn("__fb", last(col("__p"), ignoreNulls = true).over(wB))
      .withColumn("__ff", last(col("__p"), ignoreNulls = true).over(wF))
      .where(col("__side") === 1)
      .withColumn("__c", chosen)
      .select(leftCols ++ matchCols ++ Seq(
        (unix_micros(col("__c.__rt")) - t).alias("nearest_dt_us"),
        when(col("__c").isNull, lit(null).cast("string"))
          .when(chooseBack, lit("backward")).otherwise(lit("forward"))
          .alias("nearest_dir")): _*)
  }

  /** One right row per (key, ts): the highest `tieBreak` wins — makes the
    * as-of target deterministic before the join.
    */
  def latestPerKeyTs(
      right: DataFrame, key: String, ts: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(key), col(ts))
      .orderBy(col(tieBreak).desc)
    right.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** The benchmark query: each purchase event joined to the user's latest
    * view at-or-before it (views deduped per (user, ts) by max event_id).
    */
  def purchasesWithLatestView(events: DataFrame): DataFrame = {
    val ev = events.where(col("ts").isNotNull)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").alias("purchase_id"), col("user_id"), col("ts"))
    val views = latestPerKeyTs(
      ev.where(col("event_type") === "view"), "user_id", "ts", "event_id")
      .select(col("event_id").alias("view_id"), col("user_id"),
        col("ts"), col("value").alias("view_value"))
    asofJoin(purchases, views, "user_id", "ts", Seq("view_id", "view_value"))
      .select(col("purchase_id"), col("user_id"),
        col("ts").alias("purchase_ts"),
        col("asof_view_id").alias("view_id"),
        col("asof_view_value").alias("view_value"))
  }

  /** The nearest-variant benchmark query: each purchase joined to the
    * user's CLOSEST view in either direction.
    */
  def purchasesWithNearestView(events: DataFrame): DataFrame = {
    val ev = events.where(col("ts").isNotNull)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").alias("purchase_id"), col("user_id"), col("ts"))
    val views = latestPerKeyTs(
      ev.where(col("event_type") === "view"), "user_id", "ts", "event_id")
      .select(col("event_id").alias("view_id"), col("user_id"),
        col("ts"), col("value").alias("view_value"))
    asofNearest(purchases, views, "user_id", "ts",
      Seq("view_id", "view_value"))
      .select(col("purchase_id"), col("user_id"),
        col("ts").alias("purchase_ts"),
        col("nearest_view_id").alias("view_id"),
        col("nearest_view_value").alias("view_value"),
        col("nearest_dt_us").alias("dt_us"),
        col("nearest_dir").alias("direction"))
  }
}
