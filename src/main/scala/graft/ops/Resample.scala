package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto a
  * fixed per-key grid and forward-fill the gaps — the prep step between
  * raw sensor/event data and anything windowed (models, dashboards,
  * joins on aligned timestamps all want a regular grid).
  *
  * Scale shape: one groupBy builds the observed buckets (map-side
  * combinable, (key, bucket)-sized output), one tiny per-key span
  * aggregate generates the grid rows map-side via `sequence`/`explode`
  * (grid size = keys × span/resolution — the resolution is chosen so the
  * grid is SMALLER than the raw stream, which is the point of
  * resampling), and the gap-fill window rides the same (key) hash
  * partitioning as the grid join — two shuffles total, none fact-sized
  * after the first aggregate.
  */
object Resample {

  /** Hourly grid per user over each user's own [first, last] observed
    * hour: `observed` marks buckets with real data, `value_ffill` carries
    * the last observed hourly average forward across gaps (the leading
    * bucket is always observed by construction of the span).
    *
    * The hourly average is derived from an exact DECIMAL sum ÷ count, not
    * `avg(double)` — partial-aggregation order would otherwise make the
    * filled values drift between engines/partitionings (see
    * Profile.valueMoments for the full argument).
    *
    * JOIN-FREE fill: `lead(h)` tells each observed bucket exactly how far
    * its value carries (up to the next observed bucket), so each bucket
    * GENERATES its own filled rows via `sequence`/`explode` — the
    * grid-join-then-window formulation needs a third shuffle of the
    * grid itself (the largest intermediate) because co-partitioned joins
    * hash the full key set; this shape is two exchanges total — the
    * bucket aggregate and the per-key lead window — and the generate
    * stage is map-side.
    */
  def hourlyFfill(events: DataFrame): DataFrame = {
    val v = col("value").cast("decimal(14,4)")
    val observed = events
      .where(col("ts").isNotNull && col("value").isNotNull)
      .select(col("user_id"), date_trunc("hour", col("ts")).alias("h"), v)
      .groupBy(col("user_id"), col("h"))
      .agg(round(sum(v).cast("double") / count(lit(1)), 6).alias("avg_v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
    observed
      .withColumn("next_h", lead(col("h"), 1).over(w))
      .select(col("user_id"), col("h"), col("avg_v"),
        explode(sequence(
          col("h"),
          coalesce(col("next_h") - expr("interval 1 hour"), col("h")),
          expr("interval 1 hour"))).alias("gh"))
      .select(col("user_id"), col("gh").cast("string").alias("hour"),
        (col("gh") === col("h")).alias("observed"),
        col("avg_v").alias("value_ffill"))
  }

  /** Linear-interpolation resample — [[hourlyFfill]]'s other standard
    * fill policy: gap buckets take the straight line between the two
    * enclosing observations (`v0 + (v1−v0)·Δt/gap`) instead of carrying
    * v0 flat. Forward-fill is right for step-like state (a sensor's last
    * known mode); interpolation is right for continuously-varying
    * measures (temperature, price) where a flat fill biases every
    * downstream average low or high for the whole gap.
    *
    * Same join-free two-exchange shape as [[hourlyFfill]]: `posexplode`
    * gives each generated row its hour offset into the gap, so the
    * interpolation fraction is a pure map-side expression; the trailing
    * bucket (no successor) emits only itself — no extrapolation.
    *
    * DETERMINISM: the line is evaluated in exact integer micro-units,
    * not rounded doubles. `round(x/gap, 6)` ties at the half-ulp
    * boundary whenever the 6 dp endpoint values divide evenly by the gap
    * (…8125 at the 7th decimal is common with 2–4 hour gaps), and Spark
    * and DuckDB break those ties differently. Instead the endpoints lift
    * to exact ×1e6 longs (exact: they ARE 6 dp values), the lerp
    * numerator `v0·(gap−idx) + v1·idx` stays integral (≤ ~5e10, far
    * inside the 2^53 double-exact range), and `floor(num / gap)` is
    * bit-identical on any IEEE engine because a rational n/g is either
    * an exact integer or ≥ 1/g away from one — no tie exists to break.
    * The final ÷1e6 is one correctly-rounded IEEE divide of an exact
    * integer: same bits on both engines.
    */
  def hourlyInterpolate(events: DataFrame): DataFrame = {
    val v = col("value").cast("decimal(14,4)")
    val observed = events
      .where(col("ts").isNotNull && col("value").isNotNull)
      .select(col("user_id"), date_trunc("hour", col("ts")).alias("h"), v)
      .groupBy(col("user_id"), col("h"))
      .agg(round(sum(v).cast("double") / count(lit(1)), 6).alias("avg_v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
    val gap = ((col("next_h").cast("long") - col("h").cast("long")) / 3600L)
      .cast("long")
    val v0e = round(col("avg_v") * 1e6).cast("long")
    val v1e = round(col("next_v") * 1e6).cast("long")
    val lerpE6 = floor(
      (v0e * (gap - col("idx")) + v1e * col("idx")).cast("double") /
        gap.cast("double"))
    observed
      .withColumn("next_h", lead(col("h"), 1).over(w))
      .withColumn("next_v", lead(col("avg_v"), 1).over(w))
      .select(col("user_id"), col("h"), col("avg_v"),
        col("next_h"), col("next_v"),
        posexplode(sequence(
          col("h"),
          coalesce(col("next_h") - expr("interval 1 hour"), col("h")),
          expr("interval 1 hour"))).as(Seq("idx", "gh")))
      .select(col("user_id"), col("gh").cast("string").alias("hour"),
        (col("gh") === col("h")).alias("observed"),
        (when(col("idx") === 0, v0e).otherwise(lerpE6)
          .cast("double") / 1e6).alias("value_interp"))
  }

  /** Winsorization: clip `value` to its event_type's [p_lo, p_hi] exact
    * interpolated percentiles — the outlier treatment a feature pipeline
    * applies before normalization (clipping preserves row count where a
    * filter would bias the sample). Exact `percentile` interpolation is
    * selection-based — deterministic under any partitioning, and it
    * matches DuckDB's `quantile_cont` to within 1 ulp (the same property
    * TextAnalysis.qualityPercentiles relies on). NOT bit for bit: the
    * r14 sf1.0 sweep caught a value sitting exactly ON an interpolated
    * bound whose last ulp differed between the two engines' lerp shapes,
    * flipping `was_clipped` alone (clip + round-6 masked the ulp). The
    * flag therefore compares in the same round-6 space the output values
    * live in — boundary semantics are defined at the engine's published
    * 6-decimal precision, not at float-ulp knife edges. The per-type
    * bounds (vocabulary-sized) broadcast back onto the fact scan; the
    * facts never shuffle.
    */
  def winsorize(
      events: DataFrame,
      pLo: Double = 0.05,
      pHi: Double = 0.95): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, s"bad percentiles: $pLo/$pHi")
    val bounds = events.where(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        percentile(col("value"), lit(pLo)).alias("lo"),
        percentile(col("value"), lit(pHi)).alias("hi"))
      .withColumnRenamed("event_type", "t")
    val clipped = least(greatest(col("value"), col("lo")), col("hi"))
    events.where(col("value").isNotNull)
      .join(broadcast(bounds), col("event_type") === col("t"))
      .select(col("event_id"), col("event_type"), col("value"),
        round(clipped, 6).alias("clipped_value"),
        (round(col("value"), 6) < round(col("lo"), 6) ||
          round(col("value"), 6) > round(col("hi"), 6))
          .alias("was_clipped"))
  }

  /** Exponential smoothing summary: per event_type, the EWMA of the
    * (ts, event_id)-ordered value series — `s₁ = x₁;
    * sᵢ = α·xᵢ + (1−α)·sᵢ₋₁` — plus the series length and last raw value.
    * The recurrence is inherently sequential, so it computes as ONE
    * per-key fold over the sorted series (`sort_array` + `aggregate` —
    * codegen'd, same left-to-right double fold as DuckDB's `list_reduce`,
    * hence bit-identical without rounding tricks). Scale posture: the
    * whole series is held per key during the fold — the same cost class
    * as the exact per-group percentile/winsorize sorts, acceptable for
    * bounded-cardinality keys (sensor types, bounded series); for
    * unbounded per-key history the streaming anomaly operator's running
    * state is the incremental form of the same recurrence.
    */
  def ewma(events: DataFrame, alpha: Double = 0.3): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    val series = sort_array(collect_list(struct(
      col("ts"), col("event_id"), col("value"))))
    events.where(col("ts").isNotNull && col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(series.alias("s"))
      .select(col("event_type"),
        size(col("s")).alias("n_points"),
        round(element_at(col("s"), -1).getField("value"), 6)
          .alias("last_value"),
        round(
          aggregate(
            slice(col("s"), lit(2), greatest(size(col("s")) - 1, lit(0))),
            element_at(col("s"), 1).getField("value"),
            (acc, x) =>
              lit(alpha) * x.getField("value") + lit(1 - alpha) * acc),
          6).alias("ewma_value"))
  }
}
