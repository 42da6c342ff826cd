package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** TRAINED quality classifier: distributed logistic regression over the
  * quality signals, learning to imitate the rule gate — the standard
  * distillation setup for a pretraining quality filter (rules label a
  * seed set, a soft classifier generalizes; cf. fastText-style filters,
  * Joulin et al. 2016, arXiv:1607.01759). The fixed-weight scorer
  * ([[TextAnalysis]] hashed-gram scoring) applies a model; this op LEARNS
  * one.
  *
  * Training is full-batch gradient descent with a deterministic twist
  * that makes the whole optimization replayable cross-engine: after every
  * step, both the gradient and the updated weights are rounded to 6
  * decimals — the same ulp-absorption contract the engine's floating
  * aggregates already use, applied per iteration so summation-order and
  * libm differences cannot compound across steps. The DuckDB twin unrolls
  * the identical [[Steps]] updates in SQL and must land on the identical
  * weight vector.
  *
  * Scale shape: one signal scan materialized once ([[Materialize]]), then
  * [[Steps]] × ONE map-side-combined aggregation each producing a single
  * [[Dim]]-value gradient row — per step the driver sees [[Dim]] doubles,
  * the corpus never moves, and the weight vector broadcasts back as
  * literals inside whole-stage codegen. The classic distributed-GD layout
  * at any corpus size.
  */
object QualityModel {

  /** Feature dimension: bias + 5 bounded signals. */
  val Dim = 6

  /** Full-batch GD steps — unrolled 1:1 in the SQL twin. */
  val Steps = 16

  /** Learning rate: with features scaled so every gate boundary sits near
    * 0.5 (caps at ~2× each threshold), 4.0 converges the rounded
    * iteration to clean class separation without oscillation. */
  val Lr = 4.0

  /** Feature names, in weight order — the `text_quality_train` rows. */
  val FeatureNames: Seq[String] = Seq(
    "bias", "stopword_ratio", "punct_ratio", "tokens_scaled", "cpt_scaled",
    "chars_scaled")

  /** Per-document design matrix `(doc_id, x0..x5, y)`:
    * x0 bias, x1 stopword_ratio, x2 punct_ratio, x3/x4/x5 token, chars-
    * per-token and char counts CAPPED AT ~2× their gate thresholds and
    * scaled to [0, 1] — so each decision boundary lands mid-range, where
    * the logistic gradient is strongest. Every feature is rounded to 6
    * decimals so both engines see bit-identical inputs; the label is the
    * rule gate's verdict ([[TextAnalysis.qualityGate]] semantics inlined
    * so the scan happens once, no self-join). */
  def features(docs: DataFrame): DataFrame = {
    val q = TextAnalysis.quality(docs)
    val cpt = col("n_chars").cast("double") / greatest(col("n_tokens"), lit(1))
    val passed =
      col("n_chars") >= TextAnalysis.GateMinChars &&
        col("n_tokens") >= TextAnalysis.GateMinTokens &&
        col("stopword_ratio") <= TextAnalysis.GateMaxStopwordRatio &&
        col("punct_ratio") <= TextAnalysis.GateMaxPunctRatio &&
        cpt <= TextAnalysis.GateMaxCharsPerToken
    q.select(
      col("doc_id"),
      lit(1.0).alias("x0"),
      col("stopword_ratio").alias("x1"),
      col("punct_ratio").alias("x2"),
      round(least(col("n_tokens"), lit(20)).cast("double") / 20.0, 6)
        .alias("x3"),
      round(least(cpt, lit(24.0)) / 24.0, 6).alias("x4"),
      round(least(col("n_chars"), lit(128)).cast("double") / 128.0, 6)
        .alias("x5"),
      when(passed, 1.0).otherwise(0.0).alias("y"))
  }

  // valueOf (Double.toString-based), NOT the exact binary expansion —
  // the same decimal Catalyst's Round and DuckDB's round() see, so all
  // three rounding sites agree at 6-decimal boundaries.
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** TRAIN-ONCE memo: the learned weights, keyed by (canonicalized logical
    * plan of the input, steps, lr). Three registered queries compose the
    * trainer (`text_quality_train`, `text_quality_train_scores`,
    * `corpus_sample_quality`); without the memo each replays the full
    * [[Steps]]-job serialized GD loop — at 100 TB you train ONCE by
    * construction, and the bench should pay the loop once too. Sound
    * because the rounded optimization is a pure deterministic function of
    * (input data, steps, lr) and the canonicalized plan normalizes
    * expression ids, so equal plans ⇒ equal inputs ⇒ equal weights —
    * within a process lifetime, the same freshness contract as Spark's own
    * relation caches. Weights are [[Dim]] doubles, so the map stays tiny.
    */
  // Keyed by the canonicalized PLAN OBJECT, not its toString: canonical
  // plans compare structurally (exprIds normalized), and for literal
  // inputs (LocalRelation) structural equality includes the data rows —
  // a toString key would hide them and alias two different test corpora.
  // BOUNDED: the keys retain plan trees (and, for LocalRelation, the
  // corpus rows themselves), so an unbounded map would leak in a
  // long-lived process training over many distinct inputs. An
  // access-order LRU capped at [[MemoCap]] keeps the hot entries (the
  // three composing queries share one) while old plans become
  // collectable.
  private val MemoCap = 8
  private val weightMemo = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[
      (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int, Double),
      Array[Double]](MemoCap, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[
        (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int, Double),
        Array[Double]]): Boolean = size() > MemoCap
    })

  /** Number of actual (non-memoized) training executions in this process —
    * the test hook pinning the train-once contract. */
  val trainExecutions = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Test hook: drop memoized weights (e.g. to measure executions). */
  def clearWeightMemo(): Unit = weightMemo.clear()

  /** Train [[Steps]] rounded full-batch GD steps from w = 0 — memoized per
    * (input plan, steps, lr), see [[weightMemo]]. Returns the final weight
    * vector. Each step of an actual run is one Spark aggregation over the
    * materialized feature frame; only [[Dim]] gradient doubles reach the
    * driver per step. */
  def train(
      docs: DataFrame,
      steps: Int = Steps,
      lr: Double = Lr): Array[Double] = {
    require(steps > 0, s"step count must be positive, got $steps")
    val key = (docs.queryExecution.analyzed.canonicalized, steps, lr)
    weightMemo.computeIfAbsent(key, _ => trainUncached(docs, steps, lr))
  }

  private def trainUncached(
      docs: DataFrame,
      steps: Int,
      lr: Double): Array[Double] = {
    trainExecutions.incrementAndGet()
    val f = Materialize(features(docs))
    var w = Array.fill(Dim)(0.0)
    var t = 0
    while (t < steps) {
      val z = (0 until Dim).map(j => lit(w(j)) * col(s"x$j"))
        .reduce(_ + _)
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val g = f.select((0 until Dim).map(j =>
        round(avg((p - col("y")) * col(s"x$j")), 6).alias(s"g$j")): _*)
        .collect()(0)
      w = Array.tabulate(Dim)(j => round6(w(j) - lr * g.getDouble(j)))
      t += 1
    }
    w
  }

  /** [[train]] as the `text_quality_train` query surface:
    * `(feature, weight)`, one row per dimension in weight order. */
  def weightsTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("feature", StringType, nullable = false),
      StructField("weight", DoubleType, nullable = false)))
    val w = train(docs)
    val rows = FeatureNames.zip(w).map { case (n, v) => Row(n, v) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Score every document under a weight vector:
    * `(doc_id, score, predicted)` with score = round(σ(w·x), 6). */
  def scores(docs: DataFrame, w: Seq[Double]): DataFrame = {
    require(w.length == Dim, s"expected $Dim weights, got ${w.length}")
    val z = (0 until Dim).map(j => lit(w(j)) * col(s"x$j")).reduce(_ + _)
    features(docs).select(
      col("doc_id"),
      round(lit(1.0) / (lit(1.0) + exp(-z)), 6).alias("score"))
      .withColumn("predicted", col("score") >= 0.5)
  }

  /** train → score, end to end — the `text_quality_train_scores` surface
    * (its twin replays the whole optimization AND the scoring pass in one
    * statement). */
  def trainedScores(docs: DataFrame): DataFrame =
    scores(docs, train(docs).toSeq)

  /** Evaluation card for the trained classifier against its TEACHER (the
    * rule gate that labeled `y`): a 9-point threshold sweep × confusion
    * counts, with precision / recall / F1 per cut — the evidence a model
    * ships with, and a regression tripwire on the trained weights (a GD
    * or feature change moves a hash-checked confusion row, not just a
    * float nobody reads).
    *
    * ONE corpus scan: the (score, y) pair stream fans out ×9 against the
    * threshold literals (2 doubles per row — negligible) into a 9-group
    * aggregate. Ratios are null (not 0) when a denominator is empty;
    * F1 uses the direct `2tp/(2tp+fp+fn)` form so it exists whenever
    * either class is non-empty.
    */
  def evalCard(docs: DataFrame): DataFrame = {
    val w = train(docs)
    val z = (0 until Dim).map(j => lit(w(j)) * col(s"x$j")).reduce(_ + _)
    val scored = features(docs).select(
      round(lit(1.0) / (lit(1.0) + exp(-z)), 6).alias("score"), col("y"))
    val ts = array((1 to 9).map(i => lit(i / 10.0)): _*)
    val pred = col("score") >= col("threshold")
    scored.select(explode(ts).alias("threshold"), col("score"), col("y"))
      .groupBy(col("threshold"))
      .agg(
        sum(when(pred && col("y") === 1.0, 1L).otherwise(0L)).alias("tp"),
        sum(when(pred && col("y") === 0.0, 1L).otherwise(0L)).alias("fp"),
        sum(when(!pred && col("y") === 1.0, 1L).otherwise(0L)).alias("fn"),
        sum(when(!pred && col("y") === 0.0, 1L).otherwise(0L)).alias("tn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0,
          round(col("tp") / (col("tp") + col("fp")), 6)).alias("precision"),
        when(col("tp") + col("fn") > 0,
          round(col("tp") / (col("tp") + col("fn")), 6)).alias("recall"),
        when(lit(2) * col("tp") + col("fp") + col("fn") > 0,
          round(lit(2) * col("tp") /
            (lit(2) * col("tp") + col("fp") + col("fn")), 6)).alias("f1"))
  }
}
