package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** One-pass table profiling: per column, row/null/distinct counts and
  * numeric min/max — the ANALYZE-style scan an engine runs before
  * planning a curation job over an unknown 100 TB input.
  *
  * Shape: ONE aggregation over the table computes every column's stats
  * together, then the single result row unpivots into one row per column.
  */
object Profile {

  /** @param exact `true` (the oracle face) counts distincts exactly: the
    *   plan Expands the input `n_cols`-fold map-side and shuffles every
    *   row once per column — bit-checkable, but the wrong default against
    *   100 TB, where a distinct over a unique key (event_id) reshuffles
    *   the whole table. `exact = false` swaps in `approx_count_distinct`
    *   (HyperLogLog++ at `rsd` target error): the Expand disappears, the
    *   shuffle carries only n_cols fixed-size sketches, and the scan is
    *   the only full pass — the profile you actually run before planning
    *   a job.
    */
  def profile(
      df: DataFrame, exact: Boolean = true, rsd: Double = 0.05): DataFrame = {
    val fields = df.schema.fields.toSeq
    require(fields.nonEmpty, "cannot profile a zero-column frame")
    // Backtick-quote every reference: a profiler exists for UNKNOWN input
    // tables, where a column named "user.name" must profile as a column,
    // not misparse as a nested-field path.
    def q(name: String) = col(s"`$name`")
    val aggs = fields.flatMap { f =>
      val c = q(f.name)
      val (mn, mx) =
        if (f.dataType.isInstanceOf[NumericType])
          (min(c).cast("double"), max(c).cast("double"))
        else
          (min(lit(null).cast("double")), max(lit(null).cast("double")))
      Seq(
        count(c).alias(s"${f.name}__nn"),
        (if (exact) countDistinct(c) else approx_count_distinct(c, rsd))
          .alias(s"${f.name}__nd"),
        mn.alias(s"${f.name}__min"),
        mx.alias(s"${f.name}__max"))
    }
    val one = df.agg(count(lit(1)).alias("__n"), aggs: _*)
    val entries = fields.map { f =>
      struct(
        lit(f.name).alias("column_name"),
        col("__n").alias("n_rows"),
        (col("__n") - col(s"`${f.name}__nn`")).alias("n_null"),
        col(s"`${f.name}__nd`").alias("n_distinct"),
        col(s"`${f.name}__min`").alias("min_value"),
        col(s"`${f.name}__max`").alias("max_value"))
    }
    one.select(explode(array(entries: _*)).alias("p")).select(col("p.*"))
  }

  /** Fully oracle-checkable audit of the approx profile: per column, the
    * exact stats plus `within_tol` — whether the HLL distinct estimate
    * sits within 3·rsd of the exact count (absolute floor 1). HLL++ is a
    * deterministic, partition-order-independent function of the column's
    * value set, so the boolean is stable and the oracle pins it to TRUE,
    * turning the sketch path into a hash-checked bounded-error contract.
    * Costs one pass per profile variant — an audit, not the default.
    */
  def profileAudit(df: DataFrame, rsd: Double = 0.05): DataFrame = {
    val approx = profile(df, exact = false, rsd)
      .select(col("column_name"), col("n_distinct").alias("nd_approx"))
    profile(df)
      .join(approx, "column_name")
      .select(col("column_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_value"), col("max_value"),
        (abs(col("nd_approx") - col("n_distinct")) <=
          greatest(lit(1.0), col("n_distinct") * (3 * rsd)))
          .alias("within_tol"))
  }

  /** Key-skew report: the top-`k` heaviest values of a prospective
    * shuffle/join key with their share of the table — the diagnostic run
    * before choosing a partitioning (a key whose top value holds 30 % of
    * 100 TB needs salting — see Dedup.saltHotBuckets — or a broadcast,
    * and it is far cheaper to learn that here than from a straggler
    * task). One partial-aggregating groupBy then a top-k over the tiny
    * (distinct-key-sized) count table; ties break by key value so the
    * report is deterministic.
    */
  def keySkew(df: DataFrame, key: String, k: Int = 10): DataFrame = {
    require(k > 0, s"top-k must be positive, got $k")
    val counts = df.groupBy(col(s"`$key`").cast("string").alias("key_value"))
      .agg(count(lit(1)).alias("n"))
    // The groupBy partitions the table, so the total row count is the sum
    // of the (distinct-key-sized) count table — ONE pass over the data,
    // not a separate count() action. The 1-row total broadcasts back.
    val total = counts.agg(sum(col("n")).alias("t"))
    // limit-after-sort plans a distributed TakeOrdered — the count table
    // (distinct-key-sized, potentially huge) never funnels through one
    // partition; the rank window then runs over only the k survivors.
    counts
      .orderBy(col("n").desc, col("key_value"))
      .limit(k)
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("key_value"))))
      .select(col("rank"), col("key_value"), col("n"),
        round(col("n") / greatest(col("t"), lit(1L)).cast("double"), 6)
          .alias("share"))
  }

  /** Exact single-pass PAIR moments of (l_quantity, l_extendedprice) per
    * return flag: n, sample covariance, Pearson correlation. Same design
    * as [[valueMoments]]: the five sums (Σx, Σy, Σxy, Σx², Σy²) accumulate
    * as DECIMAL — exact and order-independent at any scale, where
    * `covar_samp`/`corr` built-ins use streaming co-moment formulas that
    * drift with partial-aggregation order and differ engine to engine —
    * then covariance and correlation derive from the exact sums in one
    * double expression identical on both engines. One scan, map-side
    * partial sums, a few-group shuffle.
    */
  def pairMoments(lineitem: DataFrame): DataFrame = {
    val x = col("l_quantity").cast("decimal(12,2)")
    val y = col("l_extendedprice").cast("decimal(14,2)")
    val cov = when(col("n") > 1,
      (col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1))
    // Zero-variance guards: clamp the tiny negative float residue (see
    // valueMoments) and null the correlation when either variance is 0.
    val vx = greatest(
      (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1),
      lit(0.0))
    val vy = greatest(
      (col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1),
      lit(0.0))
    val corr = when(col("n") > 1 && vx > 0 && vy > 0,
      cov / sqrt(vx * vy))
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).alias("n"),
        sum(x).cast("double").alias("sx"),
        sum(y).cast("double").alias("sy"),
        sum(x * y).cast("double").alias("sxy"),
        sum(x * x).cast("double").alias("sxx"),
        sum(y * y).cast("double").alias("syy"))
      .select(col("l_returnflag"), col("n"),
        round(cov, 4).alias("cov_qty_price"),
        round(corr, 6).alias("corr_qty_price"))
  }

  /** Z-score outliers: events whose `value` sits more than `threshold`
    * sample standard deviations from their event_type's mean — the
    * distribution-based anomaly screen (the statistical face of the alert
    * engine's fixed thresholds). Per-group mean/std derive from exact
    * DECIMAL sums ([[valueMoments]]'s argument), so the flagged set is
    * deterministic across engines and partitionings.
    *
    * Shape: one aggregation pass builds the per-type stats (a handful of
    * rows — groups are bounded by the type vocabulary), which broadcast
    * back onto the fact scan; the facts themselves never shuffle.
    */
  def zscoreOutliers(events: DataFrame, threshold: Double = 3.0): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val v = col("value").cast("decimal(14,4)")
    val variance = when(col("n") > 1, greatest(
      (col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1),
      lit(0.0)))
    val stats = events.where(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).alias("n"),
        sum(v).cast("double").alias("s1"),
        sum(v * v).cast("double").alias("s2"))
      .select(col("event_type").alias("t"),
        (col("s1") / col("n")).alias("mean_v"),
        sqrt(variance).alias("std_v"))
    val z = (col("value") - col("mean_v")) / col("std_v")
    events.where(col("value").isNotNull)
      .join(broadcast(stats), col("event_type") === col("t"))
      .where(col("std_v") > 0 && abs(z) > threshold)
      .select(col("event_id"), col("event_type"), col("value"),
        round(z, 6).alias("zscore"))
  }

  /** Single-pass distribution moments of `l_quantity` per return flag:
    * n, mean, sample variance, stddev. The sums (Σx, Σx²) accumulate as
    * DECIMAL — exact and order-independent across any partitioning, where
    * a naive double Σx² over a 100 TB fact table drifts with
    * partial-aggregation order and `var_samp`'s streaming formula differs
    * engine to engine. The moments then derive from the two exact sums in
    * ONE double expression (identical on both engines), so the report is
    * bit-stable: same data, same answer, any cluster size. Shape: one scan,
    * map-side partial sums, a few-group shuffle.
    *
    * @param exact decimal-exact sums (default: bit-stable across engines
    *   and partitionings — the oracle face). `exact = false` accumulates
    *   plain doubles — ~4× cheaper per row (no BigDecimal path) at the
    *   cost of partial-aggregation-order jitter in the last float bits;
    *   the right choice for interactive profiling where the report is
    *   read by humans, not hash-compared.
    */
  def valueMoments(lineitem: DataFrame, exact: Boolean = true): DataFrame = {
    val q =
      if (exact) col("l_quantity").cast("decimal(12,2)")
      else col("l_quantity").cast("double")
    // Explicit n>1 gate: a single-row group reports null variance instead
    // of tripping ANSI divide-by-zero on (n-1). The 0 clamp matters for
    // zero-variance groups: the double expression can land at -1e-18,
    // where sqrt gives NaN on Spark and an ERROR in DuckDB.
    val variance = when(col("n") > 1, greatest(
      (col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1),
      lit(0.0)))
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).alias("n"),
        sum(q).cast("double").alias("s1"),
        sum(q * q).cast("double").alias("s2"))
      .select(col("l_returnflag"), col("n"),
        round(col("s1") / col("n"), 6).alias("mean_qty"),
        round(variance, 6).alias("var_qty"),
        round(sqrt(variance), 6).alias("std_qty"))
  }
}
