package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    // ONE aggregation computes the exact stats AND the HLL estimate per
    // column — the audit previously ran profile() twice (two full scans,
    // two Expand shuffles) and joined the results; both aggregates are
    // functions of the same value set, so fusing them changes nothing in
    // the output and halves the passes over the table.
    val fields = df.schema.fields.toSeq
    require(fields.nonEmpty, "cannot profile a zero-column frame")
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
        countDistinct(c).alias(s"${f.name}__nd"),
        approx_count_distinct(c, rsd).alias(s"${f.name}__nda"),
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
        col(s"`${f.name}__max`").alias("max_value"),
        (abs(col(s"`${f.name}__nda`") - col(s"`${f.name}__nd`")) <=
          greatest(lit(1.0), col(s"`${f.name}__nd`") * (3 * rsd)))
          .alias("within_tol"))
    }
    one.select(explode(array(entries: _*)).alias("p")).select(col("p.*"))
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

  /** Full Pearson correlation matrix over `cols` in ONE aggregation pass:
    * every per-column Σx/Σx² and every pairwise Σxy ride the same
    * map-side-combined aggregate, so k columns cost k(k+3)/2 + 1
    * accumulators on ONE scan — not one job per pair, the difference
    * between a single pass and k²/2 passes over 100 TB. Sums accumulate
    * as DECIMAL (exact, partitioning-independent — [[valueMoments]]'s
    * argument) and each correlation derives from its five sums in one
    * double expression, so the matrix is bit-stable across engines. The
    * pair rows unpivot map-side from the 1-row aggregate ([[profile]]'s
    * explode trick). Zero-variance columns yield null correlations, never
    * NaN.
    */
  def correlationMatrix(
      df: DataFrame,
      cols: Seq[String] = Seq(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax")): DataFrame = {
    require(cols.size > 1, s"need at least 2 columns, got ${cols.size}")
    def d(name: String) = col(name).cast("decimal(18,4)")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (i, j)
    val aggs =
      cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(sum(d(c)).cast("double").alias(s"sx_$i"),
          sum(d(c) * d(c)).cast("double").alias(s"ss_$i"))
      } ++ pairs.map { case (i, j) =>
        sum(d(cols(i)) * d(cols(j))).cast("double").alias(s"sp_${i}_$j")
      }
    val one = df.agg(count(lit(1)).alias("n"), aggs: _*)
    def variance(i: Int) = greatest(
      (col(s"ss_$i") - col(s"sx_$i") * col(s"sx_$i") / col("n")) /
        (col("n") - 1), lit(0.0))
    val rows = pairs.map { case (i, j) =>
      val cov = (col(s"sp_${i}_$j") - col(s"sx_$i") * col(s"sx_$j") /
        col("n")) / (col("n") - 1)
      val corr = when(col("n") > 1 && variance(i) > 0 && variance(j) > 0,
        cov / sqrt(variance(i) * variance(j)))
      struct(
        lit(cols(i)).alias("col_x"),
        lit(cols(j)).alias("col_y"),
        col("n").alias("n"),
        round(corr, 6).alias("corr"))
    }
    one.select(explode(array(rows: _*)).alias("c")).select(col("c.*"))
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

  /** Robust (median/MAD) outlier screen — [[zscoreOutliers]]'s
    * breakdown-resistant sibling. The z-score screen's own mean and
    * stddev are dragged by the very outliers it hunts (one 1e9 reading
    * inflates σ until nothing else flags); median and MAD have a 50%
    * breakdown point, so the screen stays calibrated on exactly the
    * contaminated data it exists for. `robust_z = 0.6745·(x−med)/MAD`
    * (the consistency constant makes it σ-comparable under normality),
    * flagged at |z| > `threshold` (3.5 is Iglewicz–Hoban's recommended
    * cut).
    *
    * The threshold compares the ROUNDED score on both engines, so a
    * last-ulp interpolation difference in the two medians can never flip
    * a boundary row's membership between Spark and the oracle.
    *
    * Shape: two grouped exact-percentile passes over the facts (groups
    * bounded by the type vocabulary) whose tiny results broadcast back
    * onto the scan — the facts themselves never shuffle. Exact
    * `percentile` buffers per-group values, the price of a hash-stable
    * oracle face; at corpus scale swap in `approx_percentile` exactly as
    * [[quantileBins]]'s `exact = false` arm does.
    */
  def robustOutliers(events: DataFrame, threshold: Double = 3.5): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val v = events.where(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("value"))
    val med = v.groupBy(col("event_type")).agg(
      percentile(col("value"), lit(0.5)).alias("med_v"))
      .select(col("event_type").alias("t1"), col("med_v"))
    val mad = v.join(broadcast(med), col("event_type") === col("t1"))
      .groupBy(col("event_type")).agg(
        percentile(abs(col("value") - col("med_v")), lit(0.5)).alias("mad_v"))
      .select(col("event_type").alias("t2"), col("mad_v"))
    val z = round(lit(0.6745) * (col("value") - col("med_v")) / col("mad_v"), 6)
    v.join(broadcast(med), col("event_type") === col("t1"))
      .join(broadcast(mad), col("event_type") === col("t2"))
      .where(col("mad_v") > 0 && abs(z) > threshold)
      .select(col("event_id"), col("event_type"), col("value"),
        z.alias("robust_z"))
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

  /** χ² contingency table of two categorical columns — per cell: observed
    * count, expected count under independence (row·col marginals / N), and
    * the cell's χ² contribution. The screen a feature pipeline runs before
    * trusting "event mix is stable across weekdays" (or devices, or
    * cohorts): a big contribution pinpoints WHICH cell breaks
    * independence, which the scalar statistic alone cannot.
    *
    * Plan shape at 100 TB: ONE full-table pass (the groupBy on both keys);
    * everything after runs on the cell table, which is bounded by
    * |dom(a)|·|dom(b)| — categorical vocabularies, not data size — with
    * the marginals as windows over that tiny table (see [[chiSquareBase]]).
    * Expected counts promote one marginal to double BEFORE the product:
    * a long×long `row_total*col_total` overflows silently past 2^63 while
    * the oracle's BIGINT raises, so the engines would diverge instead of
    * failing loudly. Null categories are excluded up front, so dof counts
    * exactly the groups the cell sum ranges over.
    */
  /** Shared cell table: (a, b, observed, row/col/grand totals) with the
    * marginals as windows OVER THE CELL TABLE — the facts aggregate once
    * (the one full-table pass) and every total derives from the tiny
    * |dom(a)|·|dom(b)|-row result, structurally guaranteeing a single
    * fact scan (re-aggregating the cells per marginal would plan three
    * more subtrees and lean on exchange reuse to avoid re-scanning).
    * The empty-partition window for the grand total funnels ONLY the
    * cell table through one task — bounded by vocabulary sizes, never
    * data size.
    */
  private def chiSquareBase(df: DataFrame, a: Column, b: Column): DataFrame =
    df.filter(a.isNotNull && b.isNotNull)
      .groupBy(a.alias("a"), b.alias("b"))
      .agg(count(lit(1)).alias("observed"))
      .select(col("a"), col("b"), col("observed"),
        sum(col("observed")).over(Window.partitionBy(col("a")))
          .alias("row_total"),
        sum(col("observed")).over(Window.partitionBy(col("b")))
          .alias("col_total"),
        sum(col("observed")).over(Window.partitionBy())
          .alias("n_total"))

  private def expectedCol: Column =
    col("row_total").cast("double") * col("col_total") /
      col("n_total").cast("double")

  def chiSquareCells(df: DataFrame, a: Column, b: Column): DataFrame =
    chiSquareBase(df, a, b)
      .select(col("a"), col("b"), col("observed"),
        round(expectedCol, 6).alias("expected"),
        round(pow(col("observed") - expectedCol, 2) / expectedCol, 6)
          .alias("contrib"))

  /** The scalar face of [[chiSquareCells]]: one row with the χ²
    * statistic, degrees of freedom, N, and Cramér's V (the [0,1]
    * effect-size normalization `√(χ²/(N·min(r−1,c−1)))` — comparable
    * across tables of different size, which raw χ² is not). Aggregates
    * the cell table, so it costs nothing beyond the cells' single pass.
    * V is computed from the UNROUNDED per-cell contributions and rounded
    * once at the end, so the oracle can reproduce it bit-for-bit.
    */
  def chiSquareStat(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = chiSquareBase(df, a, b)
      .select(col("a"), col("b"), col("n_total"),
        (pow(col("observed") - expectedCol, 2) / expectedCol)
          .alias("contrib"))
    val dof = (countDistinct(col("a")) - 1) * (countDistinct(col("b")) - 1)
    val minSide = least(countDistinct(col("a")), countDistinct(col("b"))) - 1
    cells.agg(
      round(sum(col("contrib")), 6).alias("chi2"),
      dof.alias("dof"),
      max(col("n_total")).alias("n"),
      round(sqrt(sum(col("contrib")) /
        (max(col("n_total")) * minSide)), 6).alias("cramers_v"))
  }

  /** Equal-frequency (quantile) binning of a numeric column: `nBins`
    * buckets whose edges are the interior 1/n…(n−1)/n percentiles, with
    * per-bin counts and shares — the feature-bucketizer a training
    * pipeline runs to discretize a heavy-tailed value column where
    * equal-WIDTH buckets (`width_bucket`) would put 99 % of rows in one
    * bucket. A row's bin is 1 + (number of edges strictly below its
    * value), computed map-side against the broadcast 1-row edge array —
    * the facts never shuffle; only `nBins` counters do.
    *
    * @param exact `true` (the oracle face): Spark's exact `percentile`,
    *   which buffers the column per group — bit-checkable against
    *   DuckDB's identical sorted-linear-interpolation `quantile_cont`,
    *   but memory-bounded-by-data, the wrong default at 100 TB.
    *   `exact = false`: `percentile_approx` (fixed-size KLL-ish sketch
    *   state, the scale path) — same plan, bounded memory, rows-only
    *   check (the sketch is engine-specific).
    */
  def quantileBins(
      events: DataFrame, nBins: Int = 10, exact: Boolean = true): DataFrame = {
    require(nBins > 1, s"need at least 2 bins, got $nBins")
    val ps = (1 until nBins).map(_.toDouble / nBins)
    val pArr = array(ps.map(lit): _*)
    val vals = events.where(col("value").isNotNull).select(col("value"))
    val edges = vals.agg(
      (if (exact) percentile(col("value"), pArr)
       else percentile_approx(col("value"), pArr, lit(10000)))
        .alias("edges"))
    val bin = aggregate(col("edges"), lit(1),
      (acc, e) => acc + when(col("value") > e, 1).otherwise(0))
    vals.crossJoin(broadcast(edges))
      .select(bin.alias("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).alias("n_events"))
      .select(col("bin").cast("int"), col("n_events"),
        round(col("n_events") /
          sum(col("n_events")).over(Window.partitionBy()), 6).alias("share"))
  }

  /** One named data-quality constraint: `metric` is any aggregate-valued
    * Column over the table, `passed` a predicate on that metric. */
  case class Check(name: String, column: String, metric: Column,
      passed: Column => Column)

  /** Declarative one-pass constraint validation (the Deequ idea): every
    * check's metric computes in a SINGLE aggregate over ONE table scan —
    * row count, per-column completeness, value-domain and range
    * conformance, key uniqueness — then unpivots map-side into one
    * (check, column, metric, passed) row per constraint. The gate a
    * pipeline runs on every ingest batch before letting it downstream.
    *
    * Plan shape at 100 TB: the scan is the only full pass; every metric
    * is a conditional aggregate riding the same partial-aggregation
    * tree, so adding a 20th check costs one more accumulator, not
    * another job. The one exception is exact uniqueness
    * (`countDistinct`), which Expands the scan — real, but unavoidable
    * for a bit-checkable answer; `exact = false` swaps in HLL++
    * (`approx_count_distinct`), the Expand disappears, and `passed`
    * widens to a 3·rsd tolerance band so the sketch's bounded error
    * cannot flap the verdict (same contract as [[profileAudit]]).
    */
  def checkConstraints(
      events: DataFrame, exact: Boolean = true,
      rsd: Double = 0.05): DataFrame = {
    val eventTypes = Seq("click", "error", "purchase", "signup", "view")
    val n = count(lit(1)).cast("double")
    val distinctIds =
      (if (exact) countDistinct(col("event_id"))
       else approx_count_distinct(col("event_id"), rsd)).cast("double")
    val uniquePass: Column => Column =
      if (exact) _ === 1.0 else _ >= 1.0 - 3 * rsd
    val checks = Seq(
      Check("row_count", "*", n, _ >= 1),
      Check("completeness", "user_id", count(col("user_id")) / n, _ === 1.0),
      Check("completeness", "value", count(col("value")) / n, _ === 1.0),
      Check("uniqueness", "event_id", distinctIds / n, uniquePass),
      Check("domain", "event_type",
        count(when(col("event_type").isin(eventTypes.map(lit): _*),
          lit(1))) / n, _ === 1.0),
      Check("range", "value",
        count(when(col("value") > 0 && col("value") <= 1000, lit(1))) / n,
        _ === 1.0))
    val one = events.agg(checks.head.metric.alias("m0"),
      checks.tail.zipWithIndex.map { case (c, i) =>
        c.metric.alias(s"m${i + 1}")
      }: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).alias("check_name"),
        lit(c.column).alias("column_name"),
        round(col(s"m$i"), 6).alias("metric"),
        c.passed(col(s"m$i")).alias("passed"))
    }
    one.select(explode(array(rows: _*)).alias("c")).select(col("c.*"))
  }

  /** Two-sample Kolmogorov–Smirnov test between the value distributions
    * of two event types — the nonparametric "did this metric's
    * distribution drift" check (χ² sees category mixes; KS sees shape).
    * `D = max |F_a(x) − F_b(x)|` computed EXACTLY over the distinct-value
    * cell table, with the 5%-level verdict from the classical critical
    * value `1.358·√((n+m)/(n·m))`.
    *
    * Plan shape at 100 TB (the [[chiSquareBase]] argument): ONE fact scan
    * aggregates to (value, type) cells; the running-CDF window runs over
    * the CELL table, bounded by the value domain (fixed-precision
    * measurements — cents, basis points — have bounded domains), never
    * the events. The one unpartitioned window is over that bounded table,
    * same as the revenue-share pattern.
    */
  def ksTest(
      events: DataFrame,
      typeA: String = "view",
      typeB: String = "purchase"): DataFrame = {
    // Materialized: the cell table feeds BOTH the totals and the running
    // CDFs — without it Spark replays the corpus-scale aggregation per
    // consumer (the DSIR triple-scan lesson; plan-asserted one scan).
    val cells = Materialize(events
      .where(col("event_type").isin(typeA, typeB) && col("value").isNotNull)
      .groupBy(col("value"))
      .agg(
        sum(when(col("event_type") === typeA, 1L).otherwise(0L)).alias("na"),
        sum(when(col("event_type") === typeB, 1L).otherwise(0L)).alias("nb")))
    val w = Window.orderBy(col("value"))
    val tot = cells.agg(
      sum(col("na")).alias("ta"), sum(col("nb")).alias("tb"),
      count(lit(1)).alias("n_values"))
    val run = cells
      .select(col("value"),
        sum(col("na")).over(w).alias("ca"),
        sum(col("nb")).over(w).alias("cb"))
    run.crossJoin(broadcast(tot))
      .agg(max(abs(col("ca") / col("ta").cast("double") -
        col("cb") / col("tb").cast("double"))).alias("d"),
        first(col("ta")).alias("ta"), first(col("tb")).alias("tb"),
        first(col("n_values")).alias("n_values"))
      .select(
        col("ta").alias("n_a"), col("tb").alias("n_b"), col("n_values"),
        round(col("d"), 6).alias("ks_d"),
        round(lit(1.358) * sqrt((col("ta") + col("tb")).cast("double") /
          (col("ta").cast("double") * col("tb"))), 6).alias("crit_05"),
        (round(col("d"), 6) <= round(lit(1.358) *
          sqrt((col("ta") + col("tb")).cast("double") /
            (col("ta").cast("double") * col("tb"))), 6))
          .alias("same_dist_05"))
  }

  /** Welch's two-sample t-test on `value` between two event types — the
    * MEAN-shift companion to [[ksTest]] (KS sees any distributional
    * change; the t-test answers the narrower, more powerful "did the
    * level move?" with unequal variances allowed). Welch, not Student:
    * the pooled-variance form silently assumes equal spread, which
    * sensor fleets and A/B cohorts routinely violate.
    *
    * Emits t, the Welch–Satterthwaite degrees of freedom, and the
    * |t| ≤ 1.96 verdict (the z critical value — honest for the ≫30 df
    * this screen targets; the df column lets a caller apply an exact
    * t quantile when groups are small). The verdict compares the ROUNDED
    * t so engine ulps cannot flip it.
    *
    * Shape: ONE conditional-aggregation pass over the filtered facts
    * (six exact DECIMAL sums — order-independent under any partitioning,
    * the [[valueMoments]] argument), then one driver-scale row of double
    * arithmetic identical on both engines.
    */
  def tTest(
      events: DataFrame,
      typeA: String = "view",
      typeB: String = "purchase"): DataFrame = {
    val v = col("value").cast("decimal(14,4)")
    def side(t: String, tag: String) = Seq(
      sum(when(col("event_type") === t, 1L).otherwise(0L))
        .alias(s"n$tag"),
      sum(when(col("event_type") === t, v)).cast("double")
        .alias(s"s$tag"),
      sum(when(col("event_type") === t, v * v)).cast("double")
        .alias(s"q$tag"))
    val aggs = side(typeA, "a") ++ side(typeB, "b")
    val sums = events
      .where(col("event_type").isin(typeA, typeB) && col("value").isNotNull)
      .agg(aggs.head, aggs.tail: _*)
    def mean(tag: String) = col(s"s$tag") / col(s"n$tag")
    def varS(tag: String) = greatest(
      (col(s"q$tag") - col(s"s$tag") * col(s"s$tag") / col(s"n$tag")) /
        (col(s"n$tag") - 1), lit(0.0))
    val se2 = varS("a") / col("na") + varS("b") / col("nb")
    val t = (mean("a") - mean("b")) / sqrt(se2)
    val df = se2 * se2 / (
      (varS("a") / col("na")) * (varS("a") / col("na")) / (col("na") - 1) +
        (varS("b") / col("nb")) * (varS("b") / col("nb")) / (col("nb") - 1))
    sums.select(
      col("na").alias("n_a"), col("nb").alias("n_b"),
      round(mean("a"), 6).alias("mean_a"),
      round(mean("b"), 6).alias("mean_b"),
      round(t, 6).alias("t_stat"),
      round(df, 6).alias("welch_df"),
      (abs(round(t, 6)) <= 1.96).alias("same_mean_05"))
  }

  /** Lag-k autocorrelation (k = 1..`maxLag`) of each event type's HOURLY
    * value series — the seasonality/persistence probe behind every
    * forecast choice ([[graft.ops.Olap.seasonalNaiveEval]] assumes the
    * lag the user picked actually correlates; this measures it). Pearson
    * r between the series and its k-hour shift, one output row per
    * (event_type, lag).
    *
    * Shape: the corpus collapses FIRST to hourly cells (map-side
    * combinable, cells = types × hours), ONE window sort per type
    * produces all k shifted columns, `stack` unpivots them map-side, and
    * the final tiny groupBy runs on (type, lag) pairs. Sums of the
    * 6 dp-rounded cell values go through DECIMAL — exact, so r is
    * bit-stable under any partitioning; the facts shuffle once (into
    * hourly cells), never again.
    */
  def autocorrelation(events: DataFrame, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 24, s"maxLag out of range: $maxLag")
    val v = col("value").cast("decimal(14,4)")
    val hourly = events
      .where(col("ts").isNotNull && col("value").isNotNull)
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).alias("h"))
      .agg(round(sum(v).cast("double") / count(lit(1)), 6).alias("x"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val lagged = (1 to maxLag).foldLeft(hourly) { (df, k) =>
      df.withColumn(s"x$k", lag(col("x"), k).over(w))
    }
    val stacked = lagged.select(col("event_type"), col("x"),
      expr((1 to maxLag)
        .map(k => s"$k, x$k").mkString(s"stack($maxLag, ", ", ", ")"))
        .as(Seq("lag_h", "y")))
      .where(col("y").isNotNull)
    val xd = col("x").cast("decimal(18,6)")
    val yd = col("y").cast("decimal(18,6)")
    val n = col("n").cast("double")
    val cov = n * col("sxy") - col("sx") * col("sy")
    val vx = n * col("sxx") - col("sx") * col("sx")
    val vy = n * col("syy") - col("sy") * col("sy")
    stacked
      .groupBy(col("event_type"), col("lag_h"))
      .agg(
        count(lit(1)).alias("n"),
        sum(xd).cast("double").alias("sx"),
        sum(yd).cast("double").alias("sy"),
        sum(xd * xd).cast("double").alias("sxx"),
        sum(yd * yd).cast("double").alias("syy"),
        sum(xd * yd).cast("double").alias("sxy"))
      .select(col("event_type"), col("lag_h"), col("n").alias("n_pairs"),
        round(when(vx > 0 && vy > 0, cov / sqrt(vx * vy)), 6)
          .alias("autocorr"))
  }

  /** Fixed-width value bins for [[psi]]: the event `value` domain is
    * (0, 1000], so 20 bins of 50 cover it exactly; values at the upper
    * edge fold into the last bin. Fixed-width, not quantile: quantile
    * edges are data-dependent (a second corpus pass + cross-engine
    * tie-break hazards), while the PSI verdict only needs STABLE bins —
    * the standard scorecard-monitoring practice. */
  val PsiBins = 20
  val PsiBinWidth = 50.0

  /** Population Stability Index of the `value` distribution between the
    * first and second half of the event timeline — THE industry drift
    * screen for a feature/score column (PSI < 0.1 stable, 0.1–0.25
    * moderate, > 0.25 drifted). `Σ (pᵢ − qᵢ)·ln(pᵢ/qᵢ)` over
    * [[PsiBins]] fixed bins, Laplace-smoothed (+0.5 per bin) so empty
    * bins stay finite.
    *
    * Determinism contract: the timeline cut is exact integer µs
    * (`lo + (hi − lo) / 2`, both engines' BIGINT division), bins are
    * exact integer arithmetic, and each bin's PSI term is rounded to
    * integer NANO-units before the final sum — an order-independent
    * integer sum (the micro-nat trick of the tokenizer scores), immune
    * to both engines' float-sum ordering AND last-ulp `ln` divergence.
    *
    * Scale shape: one min/max aggregate (map-side partial) broadcast
    * back, then ONE conditional-aggregation scan to [[PsiBins]] cells —
    * facts never shuffle by key; the generated bin spine and the PSI
    * fold are constant-size driver-scale frames.
    */
  def psi(events: DataFrame): DataFrame = {
    val us = unix_micros(col("ts"))
    val live = events.where(col("value").isNotNull && col("ts").isNotNull)
    val bounds = live.agg(min(us).alias("lo"), max(us).alias("hi"))
    val binned = live.crossJoin(broadcast(bounds))
      .select(
        greatest(least(floor(col("value") / PsiBinWidth), lit(PsiBins - 1)),
          lit(0)).cast("int").alias("bin"),
        // Exact integer midpoint: /2 in double is exact (binary), floor
        // recovers the BIGINT `//` the oracle computes.
        (us <= col("lo") +
          floor((col("hi") - col("lo")) / 2).cast("long")).alias("is_base"))
    val cells = binned.groupBy(col("bin")).agg(
      sum(when(col("is_base"), 1L).otherwise(0L)).alias("na"),
      sum(when(!col("is_base"), 1L).otherwise(0L)).alias("nb"))
    // Full bin spine: absent bins still carry smoothed mass, so their
    // terms must participate (p ≠ q whenever the side totals differ).
    val spine = events.sparkSession.range(PsiBins)
      .select(col("id").cast("int").alias("bin"))
    // Materialized: the 20-row bin table feeds BOTH the totals and the
    // term fold — without it each consumer replays the corpus-scale
    // aggregation underneath (the ksTest/DSIR scan-replay lesson).
    val full = Materialize(spine.join(cells, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("na"), lit(0L)).alias("na"),
        coalesce(col("nb"), lit(0L)).alias("nb")))
    val tot = full.agg(sum(col("na")).alias("ta"), sum(col("nb")).alias("tb"))
    val p = (col("na") + 0.5) / (col("ta") + 0.5 * PsiBins)
    val q = (col("nb") + 0.5) / (col("tb") + 0.5 * PsiBins)
    val termNano = round((p - q) * log(p / q) * 1e9).cast("long")
    val psiCol = round(sum(termNano).cast("double") / 1e9, 6)
    full.crossJoin(broadcast(tot))
      .agg(
        first(col("ta")).alias("n_base"), first(col("tb")).alias("n_cur"),
        count(lit(1)).cast("int").alias("n_bins"),
        psiCol.alias("psi"))
      .select(col("n_base"), col("n_cur"), col("n_bins"), col("psi"),
        (col("psi") < 0.1).alias("stable"),
        (col("psi") >= 0.25).alias("drifted"))
  }

  /** Per-DIMENSION profile of an embedding table: n/mean/std/min/max for
    * each coordinate — the drift/health check an embedding pipeline runs
    * per snapshot (a collapsed dimension, a scale shift, or a dead
    * encoder head shows up as one anomalous row in a 64-row report).
    *
    * Scale shape: `posexplode` then ONE map-side-combined groupBy on the
    * dimension index — partial states are dims × partitions, the shuffle
    * carries only those. Sums go through DECIMAL(18,9) (the
    * [[valueMoments]] exactness argument: float inputs carry ~7
    * significant digits, so the 9-dp decimal cast is faithful and the
    * sum is order-independent — a plain double sum would hash-differ per
    * partitioning); min/max are order-independent already.
    */
  def embeddingProfile(embeddings: DataFrame): DataFrame = {
    val xd = col("x").cast("decimal(18,9)")
    val variance = when(col("n") > 1, greatest(
      (col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1),
      lit(0.0)))
    embeddings
      .select(posexplode(col("embedding")))
      .select(col("pos").alias("dim"), col("col").cast("double").alias("x"))
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).alias("n"),
        sum(xd).cast("double").alias("s1"),
        sum(xd * xd).cast("double").alias("s2"),
        min(col("x")).alias("mn"),
        max(col("x")).alias("mx"))
      .select(col("dim"), col("n"),
        round(col("s1") / col("n"), 6).alias("mean"),
        round(variance, 6).alias("variance"),
        round(sqrt(variance), 6).alias("std"),
        round(col("mn"), 6).alias("min_x"),
        round(col("mx"), 6).alias("max_x"))
  }
}
