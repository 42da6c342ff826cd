package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the standard ANN playbook:
  *   - [[bruteForceTopK]] — exact cosine top-k with the QUERY SET broadcast:
  *     the one deliberate product in the engine. Scale shape: data side
  *     streams (never shuffles), query side is a fixed small set; cost is
  *     O(|data| × |queries| × dim) FLOPs, embarrassingly parallel, zero
  *     shuffle except the final per-query top-k (k rows per partition via
  *     window rank).
  *   - [[lshTopK]] / [[cosineNearDup]] — signed-random-projection (SRP) LSH:
  *     each vector gets a `bits`-bit bucket from the signs of `bits` fixed
  *     ±1 hyperplane projections; candidates come only from bucket
  *     equi-joins. Recall trades against bucket width via `bits`.
  *
  * All arithmetic is done in double with a fixed fold order and rounded to
  * 6 dp, so the DuckDB oracle reproduces results bit-for-bit. The ±1 planes
  * are deterministic compile-time constants shared with the oracle SQL.
  */
object Similarity {

  val Dim = 64

  /** Broadcast bound for ANN query sets: 50k × (64 doubles + ids/norm)
    * ≈ 25 MB serialized — comfortably under executor broadcast budgets.
    */
  val MaxBroadcastQueries = 50000

  /** Broadcast with a stated bound. Every ANN path here assumes the query
    * set is SMALL; [[queryDraw]] guarantees that by construction (constant
    * [[NumQueries]] rows whatever the corpus size), but a caller handing in
    * its own over-large frame must fail loudly rather than broadcast the
    * world to every executor. The probe scans at most `maxRows + 1` rows
    * (limit is pushed into the scan), so its cost is bounded by the cap,
    * not the corpus.
    */
  def boundedBroadcast(
      df: DataFrame,
      maxRows: Int = MaxBroadcastQueries): DataFrame = {
    // Fast path: a frame whose plan carries a LIMIT ≤ maxRows (the
    // [[queryDraw]] shape — projections over a GlobalLimit) is bounded BY
    // CONSTRUCTION, so the runtime probe proves nothing the plan doesn't
    // already state. Skipping the Materialize + count there removes two
    // driver actions per broadcast (the draw is then evaluated exactly
    // once, by the broadcast build itself) without weakening the bound.
    if (planBoundedBy(df, maxRows)) return broadcast(df)
    // Materialize once: probing the raw frame would re-evaluate its whole
    // lineage (scan + projections) a second time when the broadcast builds.
    val mat = Materialize(df)
    val probe = mat.limit(maxRows + 1).count()
    require(probe <= maxRows,
      s"broadcast side has > $maxRows rows; too large to broadcast — " +
        "shrink the query set or raise the bound deliberately")
    broadcast(mat)
  }

  /** True iff the analyzed plan proves `df` has at most `maxRows` rows:
    * a GlobalLimit(n ≤ maxRows) reachable through row-count-preserving
    * (or row-count-reducing) nodes only — 1:1 projections, aliases,
    * filters. Conservative: any other node (generator, join, union)
    * falls back to the runtime probe.
    */
  private def planBoundedBy(df: DataFrame, maxRows: Int): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.catalyst.expressions.Literal
    @scala.annotation.tailrec
    def walk(p: LogicalPlan): Boolean = p match {
      case Project(exprs, child)
          if !exprs.exists(_.exists(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Generator])) =>
        walk(child)
      case SubqueryAlias(_, child) => walk(child)
      case Filter(_, child) => walk(child)
      case GlobalLimit(Literal(n: Int, _), _) => n <= maxRows
      case _ => false
    }
    try walk(df.queryExecution.analyzed)
    catch { case _: Throwable => false }
  }

  /** Deterministic Rademacher (±1) hyperplanes, seed-fixed; shared verbatim
    * with the oracle SQL generator (SparkEntry).
    */
  def planes(bits: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(bits)(Seq.fill(Dim)(if (rng.nextBoolean()) 1.0 else -1.0))
  }

  /** Johnson–Lindenstrauss random-projection parameters: target
    * dimensionality, the Rademacher-plane seed (distinct from the SRP/IVF
    * seeds so the three plane families never alias), and the distortion
    * band the report flags against. With k=16 the norm-ratio standard
    * deviation is ≈ √(2/k) ≈ 0.35, so [0.25, 2.5] is a generous
    * several-sigma band — a vector outside it is a real outlier, not
    * noise.
    */
  val RpDims = 16
  val RpSeed = 13L
  val RpRatioMin = 0.25
  val RpRatioMax = 2.5

  /** Random projection to [[RpDims]] dimensions (Johnson–Lindenstrauss;
    * Achlioptas 2003 shows ±1 entries suffice): `y_i = ⟨x, s_i⟩ / √k`
    * with the SAME deterministic Rademacher planes machinery the SRP/IVF
    * paths use — the dimensionality-reduction step that shrinks an
    * embedding index 4× before ANN/clustering.
    *
    * Pure zero-shuffle projection: k codegen'd dot products per row, no
    * training, no state — the cheapest index-compression knob, and a
    * preprocessing stage the IVF/PQ paths can consume unchanged (the
    * output is just a narrower `array<float>`-shaped frame).
    *
    * Emits the k rounded components plus `norm_ratio` = ‖y‖²/‖x‖²
    * (computed from the ROUNDED components so the oracle reproduces it
    * bit-for-bit) and its distortion verdict. E[‖y‖²] = ‖x‖², so ratios
    * concentrate around 1 — the JL guarantee made visible per row.
    */
  def randomProjection(embeddings: DataFrame, k: Int = RpDims): DataFrame = {
    val pl = planes(k, seed = RpSeed)
    val scale = math.sqrt(k.toDouble)
    val prep = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").alias("vec"))
    val ys = pl.zipWithIndex.map { case (p, i) =>
      round(dot(col("vec"), typedlit(p)) / scale, 6).alias(s"y$i")
    }
    val base = prep.select(
      (col("vec_id") +: dot(col("vec"), col("vec")).alias("xn2") +: ys): _*)
    val yn2 = (0 until k).map(i => col(s"y$i") * col(s"y$i")).reduce(_ + _)
    base
      .select(col("vec_id") +: (0 until k).map(i => col(s"y$i")) :+
        round(when(col("xn2") > 0, yn2 / col("xn2")), 6).alias("norm_ratio"): _*)
      .withColumn("ok_distortion",
        col("norm_ratio").isNotNull && col("norm_ratio") >= RpRatioMin &&
          col("norm_ratio") <= RpRatioMax)
  }

  /** Wider JL target for the QUALITY-bar variant of the recall audit:
    * at k=64 the projection noise is σ ≈ √(1/64) = 0.125 — half of
    * k=16's — enough that an 8×-shortlist prefilter retains most exact
    * neighbors, so the audit floor becomes a real quality measurement
    * instead of a collapse guard (measured: see [[Rp64RecallFloor]]).
    * Same seed → the k=16 planes are a prefix of the k=64 family, one
    * plane machinery for both. */
  val RpDims64 = 64

  /** [[recallAtK]] of brute-force search in the `dims`-dim RP space vs
    * brute force in the full space — the measurement that justifies (or
    * forbids) running ANN over projected vectors: both sides share ONE
    * materialized prepared frame and the SAME constant query draw, so the
    * report isolates exactly the distortion the projection introduced.
    */
  def rpRecallReport(
      embeddings: DataFrame, k: Int = 5, dims: Int = RpDims): DataFrame =
    rpShortlistRecallReport(embeddings, k, shortlist = k, dims = dims)

  /** Recall of the exact top-k WITHIN the RP-space top-`shortlist` — the
    * measurement for RP's realistic production role: a cheap prefilter
    * whose shortlist is exactly re-ranked in full space (shortlist = k
    * degrades to the pure ranking recall of [[rpRecallReport]]). On the
    * near-random fixture, pure ranking recall is geometry-capped well
    * under 0.5 at ANY JL k (neighbor margins ≈ 0.01 cosine sit inside
    * even k=64 noise), but the 4×-shortlist prefilter recall is the
    * number a deployment decision actually reads.
    */
  def rpShortlistRecallReport(
      embeddings: DataFrame, k: Int = 5, shortlist: Int = 20,
      dims: Int = RpDims): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be at least k ($k)")
    val prep = Materialize(prepared(embeddings))
    val pl = planes(dims, seed = RpSeed)
    val scale = math.sqrt(dims.toDouble)
    val rvec = array(pl.map(p =>
      round(dot(col("vec"), typedlit(p)) / scale, 6)): _*)
    val rprep = prep.select(col("vec_id"), rvec.alias("vec"))
      .select(col("vec_id"), col("vec"),
        sqrt(dot(col("vec"), col("vec"))).alias("norm"))
    recallAtK(bruteForceTopKPrepared(rprep, shortlist),
      bruteForceTopKPrepared(prep, k))
  }

  /** Collapse-guard recall floor for [[rpRecallAudit]]. HONEST reading:
    * on the near-random synthetic embeddings, pairwise-cosine margins
    * between true neighbors are SMALLER than the k=16 JL noise
    * (σ ≈ √(1/k) ≈ 0.25), so RP-space top-5 keeps only ~10-12% of the
    * exact neighbors — 4× compression genuinely costs ranking here, and
    * the rows-only report says so. The floor is set 6× above the random
    * baseline (k/N = 1%) to catch implementation regressions (broken
    * planes/draw degrade to chance), not to flatter the projection;
    * [[rpCosineAudit]] below carries the actual JL guarantee. Measured:
    * 0.10 at 2k vectors, 0.068 at the wider sf0.1 draw, 0.012 at the
    * sf1.0 20k (recall falls as distractors grow — chance is k/N, and
    * pure top-k-in-projected-space intersection decays with corpus size
    * BY GEOMETRY, exactly like the fixed-width shortlists the r14 sweep
    * caught). A fixed absolute floor therefore cannot survive scale; the
    * audit floor is `min(0.03, [[RpChanceMultiple]] · k/N)` — the
    * verify-scale bar unchanged, and at every larger N a constant
    * ≥30×-over-chance collapse guard (measured 48× at sf1.0).
    */
  val RpRecallFloor = 0.03

  /** Over-chance multiple the k=16 collapse guard enforces at any N. */
  val RpChanceMultiple = 30.0

  /** Oracle-checkable face of [[rpRecallReport]] (the recall-audit
    * contract shape of [[ivfRecallAudit]]): deterministic planes + draw
    * make the boolean stable; a projection regression fails a
    * hash-checked row. The one count() is a bounded driver-side scalar
    * (the [[rp64RecallAudit]] pattern).
    */
  def rpRecallAudit(
      embeddings: DataFrame,
      k: Int = 5,
      floor: Double = RpRecallFloor): DataFrame = {
    val n = embeddings.count()
    val scaled = math.min(floor, RpChanceMultiple * k / math.max(n, 1L))
    recallAudit(rpRecallReport(embeddings, k), scaled)
  }

  /** Quality-bar recall floor for the [[RpDims64]] SHORTLIST audit.
    * HONEST calibration: pure top-5 ranking recall in RP space is
    * geometry-capped on the near-random fixture at ANY JL target
    * (measured at k=5: 0.10→0.284 going 16→64 dims at sf0.01 — the JL
    * noise halves but neighbor margins ≈ 0.01 cosine stay inside it),
    * so a ≥0.5 ranking floor is unreachable without lying about the
    * fixture. The PREFILTER recall — exact top-5 retained in the RP-64
    * top-[[Rp64Shortlist]] shortlist, the number a shortlist-then-rerank
    * deployment actually reads — measured 0.712 at sf0.01 and 0.656 at
    * sf0.1. 0.5 sits 24-31% under both measured scales and ~50× above a
    * broken projection (which degrades to shortlist/N ≈ 0.002-0.02):
    * a real working-vs-broken separation, not a collapse guard. */
  val Rp64RecallFloor = 0.5

  /** Minimum shortlist width for [[rp64RecallAudit]] — 8× k, the re-rank
    * budget a production prefilter pays happily (40 exact cosines per
    * query vs N). */
  val Rp64Shortlist = 40

  /** Shortlist as a FRACTION of the corpus for [[rp64RecallAudit]]: a
    * fixed-width shortlist over a growing corpus covers a shrinking
    * fraction, so its recall decays with scale by construction (the r14
    * sf1.0 sweep measured exactly that: the 40-wide shortlist fell under
    * the 0.5 floor at 10× the vectors). A shortlist-then-rerank
    * deployment sizes the shortlist to the corpus — 2 % reproduces the
    * measured verify-scale width (40 of 2000) and keeps the recall
    * contract scale-invariant: i.i.d. distractors at a fixed shortlist
    * QUANTILE displace true neighbors at a roughly constant rate. */
  val Rp64ShortlistFrac = 0.02

  /** [[rpShortlistRecallReport]] at [[RpDims64]] reduced to the
    * hash-checked floor contract — the JL variant whose recall floor is
    * a real quality bar (see [[Rp64RecallFloor]]). The shortlist is
    * max([[Rp64Shortlist]], [[Rp64ShortlistFrac]] × N) — the one count()
    * action is a driver-side scalar over a single-column scan, bounded
    * at any corpus size. */
  def rp64RecallAudit(
      embeddings: DataFrame,
      k: Int = 5,
      floor: Double = Rp64RecallFloor): DataFrame = {
    val shortlist = math.max(Rp64Shortlist,
      math.ceil(embeddings.count() * Rp64ShortlistFrac).toInt)
    recallAudit(
      rpShortlistRecallReport(embeddings, k, shortlist, dims = RpDims64),
      floor)
  }

  /** Pairwise-cosine distortion over the constant query draw: all
    * C(NumQueries, 2) pairs scored in full space and in RP space, the
    * absolute error aggregated — the Johnson–Lindenstrauss guarantee made
    * measurable (angles are preserved in expectation with σ ≈ √(1/k),
    * whatever the ranking consequences). Both pair sets are bounded
    * products of the broadcast 50-row draw — constant cost at any corpus
    * size.
    */
  def rpCosineReport(embeddings: DataFrame, dims: Int = RpDims): DataFrame = {
    val prep = Materialize(prepared(embeddings))
    val pl = planes(dims, seed = RpSeed)
    val scale = math.sqrt(dims.toDouble)
    val rvec = array(pl.map(p =>
      round(dot(col("vec"), typedlit(p)) / scale, 6)): _*)
    val rprep = prep.select(col("vec_id"), rvec.alias("vec"))
      .select(col("vec_id"), col("vec"),
        sqrt(dot(col("vec"), col("vec"))).alias("norm"))
    def pairsOf(p: DataFrame, out: String): DataFrame = {
      val q = querySet(p)
      val a = q.select(col("q_id").alias("a_id"),
        col("q_vec").alias("a_vec"), col("q_norm").alias("a_norm"))
      val b = q.select(col("q_id").alias("b_id"),
        col("q_vec").alias("b_vec"), col("q_norm").alias("b_norm"))
      // Bounded 50×50 product of two broadcast frames — constant size.
      boundedBroadcast(a).crossJoin(boundedBroadcast(b))
        .where(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          cosine(col("a_vec"), col("a_norm"), col("b_vec"), col("b_norm"))
            .alias(out))
    }
    pairsOf(prep, "cos_full")
      .join(pairsOf(rprep, "cos_rp"), Seq("a_id", "b_id"))
      .agg(
        count(lit(1)).alias("n_pairs"),
        round(avg(abs(col("cos_full") - col("cos_rp"))), 6)
          .alias("mean_abs_err"),
        round(max(abs(col("cos_full") - col("cos_rp"))), 6)
          .alias("max_abs_err"))
  }

  /** Fixture-measured bounds for [[rpCosineAudit]] (measured: mean ≈ 0.19 at
    * both 500 and 5000 vectors — the JL σ√(2/π) prediction ≈ 0.20 for
    * k=16; max over the 1225 fixed pairs 0.71/0.79; bounds carry ~50%/20%
    * margin and the deterministic planes + draw make the booleans
    * stable).
    */
  val RpCosMeanBound = 0.3
  val RpCosMaxBound = 0.95

  /** Hash-checked contract face of [[rpCosineReport]]: pair count (the
    * oracle derives it from its own draw CTE) + the error bounds as
    * booleans — the sketch-audit pattern applied to JL distortion.
    */
  def rpCosineAudit(
      embeddings: DataFrame,
      meanBound: Double = RpCosMeanBound,
      maxBound: Double = RpCosMaxBound): DataFrame =
    rpCosineReport(embeddings).select(
      col("n_pairs"),
      (col("mean_abs_err") <= meanBound).alias("mean_ok"),
      (col("max_abs_err") <= maxBound).alias("max_ok"))

  /** Mean-error bound for the k=64 distortion audit: JL predicts the
    * k=16 error × √(16/64) = half — measured 0.095 vs 0.19 at the verify
    * point, the √ shrink on the nose; 0.15 carries the same ~50% margin
    * as [[RpCosMeanBound]]. */
  val Rp64CosMeanBound = 0.15

  /** Error-SHRINK contract across the two JL targets: mean pairwise-
    * cosine distortion measured at k=16 and k=64 over the SAME constant
    * draw, with the √(16/64) halving pinned as booleans — `shrink_ok`
    * (the k=64 error is strictly below the k=16 error) and `mean64_ok`
    * (the absolute bound). One row; both measurements share the one
    * materialized prepared frame via [[rpCosineReport]]'s own prep (two
    * bounded 50×50 pair products — constant cost at any corpus size).
    */
  def rpCosineShrinkAudit(
      embeddings: DataFrame,
      mean64Bound: Double = Rp64CosMeanBound): DataFrame = {
    val e16 = rpCosineReport(embeddings, RpDims)
      .select(col("n_pairs"), col("mean_abs_err").alias("err16"))
    val e64 = rpCosineReport(embeddings, RpDims64)
      .select(col("mean_abs_err").alias("err64"))
    e16.crossJoin(broadcast(e64)).select(
      col("n_pairs"),
      (col("err64") < col("err16")).alias("shrink_ok"),
      (col("err64") <= mean64Bound).alias("mean64_ok"))
  }

  /** k-NN LABEL-AGREEMENT evaluation — the standard "are these embeddings
    * any good" probe: each drawn query is classified by majority vote of
    * its exact top-k neighbors' labels, compared to its own label. One
    * row per query `(q_id, true_label, pred_label, n_votes, correct)`;
    * aggregate `correct` for the accuracy headline.
    *
    * Vote tie-break is (count desc, label asc) — deterministic, shared
    * with the oracle. Scale shape: the brute-force top-k machinery
    * (bounded query broadcast, data never shuffles) + a labels join that
    * touches queries×k rows only.
    */
  def knnLabelEval(embeddings: DataFrame, k: Int = 5): DataFrame =
    knnEvalAgainst(embeddings,
      embeddings.select(col("vec_id"), col("label")), k)

  /** [[knnLabelEval]] with labels DERIVED FROM EMBEDDING SPACE itself:
    * each vector is labeled by its seed-7 coarse-quantizer cell
    * ([[ivfCell]] — the sim_cluster_sizes assignment), so the label is
    * embedding-determined by construction and the eval has signal. The
    * fixture's own `label` column is embedding-uncorrelated (the honest
    * finding knnLabelEval reports ≈ chance on); this variant is the probe
    * that separates a working embedding+kNN pipeline (neighbors share
    * cells → accuracy far above 1/cells) from a broken one. Fully
    * deterministic — cells, draw, and tie-breaks are all seed-fixed — so
    * the per-query rows hash-check against the oracle's replay of the
    * same argmax cell assignment.
    */
  def knnCellLabelEval(
      embeddings: DataFrame, cells: Int = 8, k: Int = 5): DataFrame = {
    val cellLabels = prepared(embeddings).select(col("vec_id"),
      ivfCell(col("vec"), planes(cells, seed = 7L)).alias("label"))
    knnEvalAgainst(embeddings, cellLabels, k)
  }

  private def knnEvalAgainst(
      embeddings: DataFrame, labels: DataFrame, k: Int): DataFrame = {
    val top = bruteForceTopK(embeddings, k)
    val votes = top
      .join(labels.select(col("vec_id").alias("neighbor_id"),
        col("label").alias("n_label")), "neighbor_id")
      .groupBy(col("q_id"), col("n_label"))
      .agg(count(lit(1)).alias("votes"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("votes").desc, col("n_label"))
    val pred = votes
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") === 1)
      .select(col("q_id"), col("n_label").alias("pred_label"),
        col("votes").alias("n_votes"))
    pred
      .join(labels.select(col("vec_id").alias("q_id"),
        col("label").alias("true_label")), "q_id")
      .select(col("q_id"), col("true_label"), col("pred_label"),
        col("n_votes").cast("int").alias("n_votes"),
        (col("pred_label") === col("true_label")).alias("correct"))
  }

  /** Cross-snapshot embedding-CENTROID drift per coarse-quantizer cell —
    * the "did the encoder move?" screen an embedding pipeline runs when
    * a new snapshot lands: within each seed-7 cell ([[ivfCell]], the
    * sim_cluster_sizes assignment), the corpus splits into snapshot A
    * (even `vec_id`) and snapshot B (odd), and the report carries the
    * cosine between the two half-centroids. Same-distribution halves of
    * a working pipeline agree (cells are half-spaces, so their means sit
    * far off the origin → cosine near 1); a re-trained or broken encoder
    * head shows up as one cell's cosine collapsing.
    *
    * Determinism contract: component sums go through DECIMAL(18,9) (the
    * embeddingProfile argument — order-independent under any
    * partitioning); centroid components are ROUNDED to 9 dp and the
    * second-level dot/norm sums run in exact decimal again, so both
    * engines reach bit-identical cosines before the final 6-dp round.
    *
    * Scale shape: posexplode → ONE map-side-combined groupBy on
    * (cell, dim) — partial states are cells × dims × partitions; the
    * second-level fold runs over the cells × dims cell table, never the
    * corpus.
    */
  def cellCentroidDrift(embeddings: DataFrame, cells: Int = 8): DataFrame = {
    val assigned = prepared(embeddings).select(
      col("vec_id"), col("vec"),
      ivfCell(col("vec"), planes(cells, seed = 7L)).alias("cell"),
      (pmod(col("vec_id"), lit(2)) === 0).alias("is_a"))
    val xd = col("x").cast("decimal(18,9)")
    val dims = assigned
      .select(col("cell"), col("is_a"),
        posexplode(col("vec")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim"))
      .agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).alias("na"),
        sum(when(col("is_a"), xd)).alias("sa"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).alias("nb"),
        sum(when(!col("is_a"), xd)).alias("sb"))
    val cents = dims.select(col("cell"), col("na"), col("nb"),
      round(col("sa").cast("double") / col("na"), 9)
        .cast("decimal(18,9)").alias("ca"),
      round(col("sb").cast("double") / col("nb"), 9)
        .cast("decimal(18,9)").alias("cb"))
    cents.groupBy(col("cell"))
      .agg(
        max(col("na")).alias("n_a"), max(col("nb")).alias("n_b"),
        sum(col("ca") * col("cb")).cast("double").alias("dot"),
        sum(col("ca") * col("ca")).cast("double").alias("aa"),
        sum(col("cb") * col("cb")).cast("double").alias("bb"))
      .select(col("cell"), col("n_a"), col("n_b"),
        round(when(col("aa") > 0 && col("bb") > 0,
          col("dot") / sqrt(col("aa") * col("bb"))), 6)
          .alias("cos_centroid"))
  }

  /** (id, vec, norm): embeddings cast to double with their L2 norm
    * materialized (staged — see Dedup.shingleSets on lambda staging).
    */
  def prepared(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").alias("vec"))
      .select(col("vec_id"), col("vec"),
        sqrt(dot(col("vec"), col("vec"))).alias("norm"))

  /** Native codegen'd dot product (graft.functions.DotProduct) — same
    * left-to-right summation order as the higher-order-function fold it
    * replaced, so results are bit-identical; ~10× per-row on the hot path.
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot(a, b)

  /** Rounded cosine between two prepared vectors. */
  def cosine(vecA: Column, normA: Column, vecB: Column, normB: Column): Column =
    round(dot(vecA, vecB) / (normA * normB), 6)

  /** SRP bucket id: bit j = sign of the projection onto plane j (rounded to
    * the same 6 dp the oracle uses, so boundary cases agree across engines).
    */
  def srpBucket(vec: Column, planeSet: Seq[Seq[Double]]): Column =
    planeSet.zipWithIndex.map { case (p, j) =>
      val proj = round(dot(vec, typedlit(p)), 6)
      when(proj > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Size of the benchmark query set. A CONSTANT, not a fraction: the old
    * `vec_id % 100` draw grew linearly with the corpus and would blow the
    * [[MaxBroadcastQueries]] bound ~50× over at 100× scale. 50 matches the
    * old draw's size at the sf0.1 bench point, so like-for-like timings
    * carry across rounds.
    */
  val NumQueries = 50

  /** Hash-family member for the query draw — distinct from the member 23
    * used by [[trainSample]], so the query set is not a subset of the
    * quantizer training sample (which would flatter trained-IVF recall).
    */
  val QueryHashMember = 29

  /** Fixed-size deterministic query draw: the [[NumQueries]] vectors with
    * the smallest md5-derived id hash (id tie-break) — the same
    * reproducible pseudo-random draw shape as [[trainSample]]. One
    * distributed top-k pass (TakeOrdered, no full sort), output bounded by
    * a CONSTANT regardless of corpus size, so every ANN broadcast below is
    * scale-safe by construction. Works on any frame carrying `vec_id`
    * (prepared, bucketed, or celled) — the draw depends only on the id, so
    * the same rows are selected whichever frame it is applied to.
    */
  def queryDraw(df: DataFrame, n: Int = NumQueries): DataFrame =
    df.withColumn("__qh",
        Dedup.hashAt(QueryHashMember, col("vec_id").cast("string")))
      .orderBy(col("__qh"), col("vec_id")).limit(n)
      .drop("__qh")

  /** The benchmark's query set: the fixed-size deterministic draw, in the
    * (q_id, q_vec, q_norm) broadcast shape.
    */
  def querySet(prep: DataFrame): DataFrame =
    queryDraw(prep)
      .select(col("vec_id").alias("q_id"), col("vec").alias("q_vec"),
        col("norm").alias("q_norm"))

  /** Exact cosine top-k per query, query set broadcast. */
  def bruteForceTopK(embeddings: DataFrame, k: Int = 5): DataFrame =
    bruteForceTopKPrepared(prepared(embeddings), k)

  private def bruteForceTopKPrepared(prep: DataFrame, k: Int): DataFrame = {
    val pairs = prep.crossJoin(boundedBroadcast(querySet(prep)))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").alias("neighbor_id"),
        cosine(col("q_vec"), col("q_norm"), col("vec"), col("norm"))
          .alias("cos_sim"))
    topK(pairs, k)
  }

  /** SRP-LSH top-k: candidates limited to the query's bucket. The recall
    * path for 100 TB — candidate generation is a hash-partitioned equi-join
    * on the bucket id, never a product.
    */
  def lshTopK(embeddings: DataFrame, bits: Int = 6, k: Int = 5): DataFrame = {
    val ps = planes(bits)
    val prep = prepared(embeddings)
      .withColumn("bucket", srpBucket(col("vec"), ps))
    val queries = queryDraw(prep)
      .select(col("vec_id").alias("q_id"), col("vec").alias("q_vec"),
        col("norm").alias("q_norm"), col("bucket"))
    val pairs = prep.join(boundedBroadcast(queries), "bucket")
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").alias("neighbor_id"),
        cosine(col("q_vec"), col("q_norm"), col("vec"), col("norm"))
          .alias("cos_sim"))
    topK(pairs, k)
  }

  /** Deterministic IVF coarse quantizer: `cells` fixed Rademacher seed
    * vectors; a vector's cell is the argmax of its dot products against
    * them (first index wins ties, stabilized by 6-dp rounding). A
    * seed-derived quantizer instead of trained k-means keeps the index
    * deterministic and oracle-checkable; swap in trained centroids for
    * production recall without touching the query shape.
    */
  def ivfCell(vec: Column, seeds: Seq[Seq[Double]]): Column = {
    val dots = array(seeds.map(s => round(dot(vec, typedlit(s)), 6)): _*)
    array_position(dots, array_max(dots)).cast("int")
  }

  /** IVF top-k: data and queries are partitioned by coarse cell; each query
    * probes only its own cell (nprobe=1). The inverted-list analogue of
    * [[lshTopK]] — candidates come from a cell equi-join, never a product;
    * at scale the cell column is the partition/bucket key of the stored
    * index.
    */
  def ivfTopK(embeddings: DataFrame, cells: Int = 8, k: Int = 5): DataFrame = {
    val seeds = planes(cells, seed = 7L)
    val prep = prepared(embeddings)
      .withColumn("cell", ivfCell(col("vec"), seeds))
    val queries = queryDraw(prep)
      .select(col("vec_id").alias("q_id"), col("vec").alias("q_vec"),
        col("norm").alias("q_norm"), col("cell"))
    val pairs = prep.join(boundedBroadcast(queries), "cell")
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").alias("neighbor_id"),
        cosine(col("q_vec"), col("q_norm"), col("vec"), col("norm"))
          .alias("cos_sim"))
    topK(pairs, k)
  }

  /** Cluster-SIZE table of the IVF coarse quantizer — the index-balance
    * diagnostic (a skewed inverted list is a hot partition at query time:
    * the ANN analogue of `profile_key_skew`). One scan + one cells-bounded
    * groupBy; the counts frame is materialized once for its two consumers
    * (total + share join), the componentsFromPairs convention. */
  def clusterSizes(embeddings: DataFrame, cells: Int = 8): DataFrame = {
    val seeds = planes(cells, seed = 7L)
    val sized = Materialize(prepared(embeddings)
      .withColumn("cell", ivfCell(col("vec"), seeds))
      .groupBy(col("cell")).agg(count(lit(1)).alias("n_vecs")))
    val total = sized.agg(sum(col("n_vecs")).alias("n_total"))
    sized.crossJoin(broadcast(total))
      .select(col("cell"), col("n_vecs"),
        round(col("n_vecs").cast("double") /
          greatest(col("n_total"), lit(1L)), 6).alias("cell_share"))
  }

  /** One-row balance rollup of [[clusterSizes]]: used-cell count, vector
    * total, the heaviest cell (count + share), and the imbalance factor
    * max/mean = max·used ÷ total — 1.0 is a perfectly balanced index; the
    * number that says "retrain the quantizer" before a hot cell becomes
    * the query-time straggler. Exact integer aggregates, two rounded
    * divisions. */
  def clusterBalance(embeddings: DataFrame, cells: Int = 8): DataFrame =
    clusterSizes(embeddings, cells)
      .agg(
        count(lit(1)).cast("int").alias("n_cells_used"),
        sum(col("n_vecs")).alias("n_vecs"),
        max(col("n_vecs")).alias("max_cell_vecs"))
      .select(
        col("n_cells_used"), col("n_vecs"), col("max_cell_vecs"),
        round(col("max_cell_vecs").cast("double") /
          greatest(col("n_vecs"), lit(1L)), 6).alias("max_cell_share"),
        round((col("max_cell_vecs") * col("n_cells_used")).cast("double") /
          greatest(col("n_vecs"), lit(1L)), 6).alias("imbalance"))

  /** Cells of a centroid set ordered by squared-L2 distance to `vec`
    * (1-based ids, distance rounded to 6 dp, cell id tie-break via struct
    * sort). `‖v−c‖² = ‖v‖² − 2v·c + ‖c‖²` — the norms are staged/constant,
    * so the per-centroid cost is one codegen'd dot product.
    */
  private def cellsByDistance(
      vec: Column, norm: Column, centroids: Seq[Seq[Double]]): Column = {
    val entries = centroids.zipWithIndex.map { case (c, i) =>
      val cn2 = c.map(x => x * x).sum
      struct(
        round(norm * norm - lit(2.0) * dot(vec, typedlit(c)) + lit(cn2), 6)
          .alias("d"),
        lit(i + 1).alias("cell"))
    }
    transform(array_sort(array(entries: _*)), e => e.getField("cell"))
  }

  /** Sample-size bound for quantizer training: 16k × 64 doubles ≈ 8 MB on
    * the driver — the model-fitting analogue of [[MaxBroadcastQueries]].
    */
  val MaxTrainSample = 16384

  /** Lloyd-trained k-means centroids over a [[prepared]] frame — the
    * trained coarse quantizer behind [[kmeansIvfTopK]].
    *
    * Training runs DRIVER-SIDE over a bounded deterministic sample: the
    * `sampleSize` vectors with the smallest md5-derived id hash (a
    * reproducible pseudo-random draw — ONE distributed top-k pass over the
    * corpus, nothing else). A coarse quantizer only needs the density
    * shape, which a hash sample preserves; this is how production ANN
    * indexes train (FAISS fits IVF cells on a slice, not the corpus), and
    * it turns what would be `seeds + iters` full distributed passes into
    * one. Driver arithmetic is also ORDER-DETERMINISTIC — same sample,
    * same centroids, bit for bit — where distributed averaging would
    * jitter with partial-aggregation order.
    *
    * Seeding is deterministic farthest-point (first = lowest id hash,
    * then repeatedly the sample vector farthest from all chosen seeds):
    * a pure hash draw can land two seeds in one natural cluster and
    * leave another unclaimed, which Lloyd cannot repair. Empty cells
    * keep their previous centroid; means are rounded to 6 dp.
    */
  def kmeansCentroids(
      prep: DataFrame,
      cells: Int = 8,
      iters: Int = 5,
      sampleSize: Int = MaxTrainSample): Seq[Seq[Double]] = {
    // Validate BEFORE the distributed sample pass — bad params must fail
    // in microseconds, not after a cluster top-k and an 8 MB collect.
    require(cells > 0 && iters >= 0, s"bad kmeans params: $cells/$iters")
    lloydFit(trainSample(prep, sampleSize), cells, iters).map(_.toSeq).toSeq
  }

  /** The bounded deterministic training draw shared by the k-means IVF and
    * PQ fits: the `sampleSize` vectors with the smallest md5-derived id
    * hash — ONE distributed top-k pass, reproducible across partitionings.
    */
  private def trainSample(
      prep: DataFrame, sampleSize: Int): Array[Array[Double]] = {
    require(sampleSize <= MaxTrainSample,
      s"training sample $sampleSize exceeds driver bound $MaxTrainSample")
    val sample: Array[Array[Double]] = prep
      .withColumn("h", Dedup.hashAt(23, col("vec_id").cast("string")))
      .orderBy(col("h"), col("vec_id")).limit(sampleSize)
      .select(col("vec")).collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "quantizer training needs a non-empty sample")
    sample
  }

  /** Deterministic Lloyd fit (farthest-point seeded) over a driver-side
    * sample — see [[kmeansCentroids]] for why training is driver-side.
    */
  private def lloydFit(
      sample: Array[Array[Double]],
      cells: Int,
      iters: Int): Array[Array[Double]] = {
    require(cells > 0 && iters >= 0, s"bad kmeans params: $cells/$iters")
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // Farthest-point seeding over the sample (sample order is the
    // hash-then-id order, so ties break deterministically).
    val seeds = scala.collection.mutable.ArrayBuffer(sample(0))
    while (seeds.length < math.min(cells, sample.length)) {
      seeds += sample.maxBy(v => seeds.map(d2(v, _)).min)
    }
    var centroids = seeds.toArray
    for (_ <- 0 until iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](sample(0).length))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        val cell = centroids.indices.minBy(i => d2(v, centroids(i)))
        counts(cell) += 1
        var i = 0
        while (i < v.length) { sums(cell)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(x =>
          math.rint(x / counts(c) * 1e6) / 1e6)
      }.toArray
    }
    centroids
  }

  /** IVF top-k with TRAINED centroids: [[ivfTopK]]'s query shape (cell
    * equi-join, never a product) with Lloyd-trained cells and multi-probe
    * queries — each query probes its `nprobe` nearest cells, the standard
    * recall lever when a neighbor sits just across a cell boundary. Data
    * vectors index into exactly one cell (the stored inverted list);
    * trained cells follow the data density, which is what lifts recall
    * over the seed-vector quantizer at equal probe cost. Training is an
    * imperative iterative fit, not a SQL-expressible query, so this op is
    * checked by recall bounds (unit test vs [[bruteForceTopK]]) rather
    * than a DuckDB twin — the driver records a rows-only check.
    */
  def kmeansIvfTopK(
      embeddings: DataFrame,
      cells: Int = 8,
      iters: Int = 5,
      k: Int = 5,
      nprobe: Int = 2): DataFrame =
    // Checkpoint: training iterates over this frame `iters` times and the
    // query plan reuses it twice more — without it every pass re-reads and
    // re-projects the source.
    kmeansIvfTopKPrepared(
      Materialize(prepared(embeddings)), cells, iters, k, nprobe)

  private def kmeansIvfTopKPrepared(
      prep: DataFrame,
      cells: Int,
      iters: Int,
      k: Int,
      nprobe: Int): DataFrame = {
    val cs = kmeansCentroids(prep, cells, iters)
    val byDist = cellsByDistance(col("vec"), col("norm"), cs)
    val data = prep.withColumn("cell", element_at(byDist, 1))
    val queries = queryDraw(prep)
      .select(col("vec_id").alias("q_id"), col("vec").alias("q_vec"),
        col("norm").alias("q_norm"),
        explode(slice(byDist, 1, nprobe)).alias("cell"))
    // No dedup needed: a data vector lives in exactly ONE cell, so a
    // (query, vector) pair can match at most one of the probed cells.
    val pairs = data.join(boundedBroadcast(queries), "cell")
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").alias("neighbor_id"),
        cosine(col("q_vec"), col("q_norm"), col("vec"), col("norm"))
          .alias("cos_sim"))
    topK(pairs, k)
  }

  /** Recall@k of an ANN result against the exact baseline, as ONE checkable
    * row `(hits, expected, recall)`. Both inputs are `(q_id, neighbor_id,
    * …)` top-k frames; hits counts approx pairs present in the exact set
    * via a semi join on the pair key — the check shuffles only
    * 2 × |queries| × k id pairs, nothing that scales with the corpus.
    * Registered as a verify query so a recall regression in a trained
    * quantizer FAILS the round's deterministic-rows check visibly instead
    * of silently degrading behind a rows-only count.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    // Both sides are |queries| × k rows; broadcast the exact side so the
    // semi join never plans a sort-merge over two bounded frames.
    val e = broadcast(exact.select(col("q_id"), col("neighbor_id")))
    val hits = approx.select(col("q_id"), col("neighbor_id"))
      .join(e, Seq("q_id", "neighbor_id"), "left_semi")
    hits.agg(count(lit(1)).alias("hits"))
      // 1-row × 1-row scalar product — the same bounded shape as the
      // corpus-total broadcasts in TextAnalysis.
      .crossJoin(e.agg(count(lit(1)).alias("expected")))
      .select(col("hits"), col("expected"),
        round(col("hits").cast("double") / col("expected"), 6)
          .alias("recall"))
  }

  /** [[recallAtK]] of the trained IVF vs brute force over ONE shared
    * prepared/checkpointed frame — both sides (and the quantizer training)
    * reuse the same materialized vectors instead of each re-preparing the
    * source, halving the scan work of the registered recall query.
    */
  def ivfRecallReport(
      embeddings: DataFrame,
      cells: Int = 8,
      iters: Int = 5,
      k: Int = 5,
      nprobe: Int = 2): DataFrame = {
    val prep = Materialize(prepared(embeddings))
    recallAtK(
      kmeansIvfTopKPrepared(prep, cells, iters, k, nprobe),
      bruteForceTopKPrepared(prep, k))
  }

  /** Oracle-checkable face of [[ivfRecallReport]]: `(expected, floor_met)`
    * — the exact-baseline pair count (queries × k, which the SQL oracle
    * derives from its own query-draw CTE) and whether recall clears
    * `floor`. Training is deterministic (driver-side Lloyd over the fixed
    * hash sample), so the boolean is stable; a quantizer regression now
    * FAILS a hash-checked row instead of hiding behind a rows-only count.
    */
  def ivfRecallAudit(
      embeddings: DataFrame,
      cells: Int = 8,
      iters: Int = 5,
      k: Int = 5,
      nprobe: Int = 2,
      floor: Double = 0.8): DataFrame =
    recallAudit(ivfRecallReport(embeddings, cells, iters, k, nprobe), floor)

  /** Reduce any [[recallAtK]] report to its oracle-checkable
    * `(expected, floor_met)` face — shared by the IVF/PQ/IVFPQ audits.
    */
  def recallAudit(report: DataFrame, floor: Double): DataFrame =
    report.select(col("expected"), (col("recall") >= floor).alias("floor_met"))

  /** Per-query MEMBERSHIP contract for an approximate top-k result — the
    * hash-checkable face of the trained shortlist queries (sim_pq_topk /
    * sim_ivf_kmeans) whose neighbor CHOICES no SQL oracle can replay
    * (imperative training) but whose SHAPE every correct index obeys:
    * exactly k rows per drawn query, ranks exactly {1..k}, every neighbor
    * a real corpus id, the query never its own neighbor, scores
    * non-increasing in rank. One row per query
    * `(q_id, n_rows, ranks_ok, members_ok, self_ok, ordered_ok)` — the
    * oracle predicts all of it from its own draw CTE, so a shortlist that
    * leaks a phantom id, duplicates a rank, or mis-sorts fails a
    * hash-checked row (the recall audits only bound the aggregate).
    *
    * Scale shape: the result is queries×k rows (bounded constant), so
    * the known-id check is one corpus scan semi-joined against a ≤250-row
    * broadcast — the corpus never shuffles.
    */
  def topKMemberAudit(
      result: DataFrame, embeddings: DataFrame, k: Int = 5): DataFrame = {
    val resMat = Materialize(result)
    val known = embeddings.select(col("vec_id").alias("neighbor_id"))
      .join(broadcast(resMat.select(col("neighbor_id")).distinct()),
        Seq("neighbor_id"), "left_semi")
      .distinct()
      .withColumn("known", lit(true))
    val w = Window.partitionBy(col("q_id")).orderBy(col("rank"))
    resMat
      .join(broadcast(known), Seq("neighbor_id"), "left")
      .withColumn("prev_cos", lag(col("cos_sim"), 1).over(w))
      .groupBy(col("q_id"))
      .agg(
        count(lit(1)).cast("int").alias("n_rows"),
        (countDistinct(col("rank")) === k &&
          min(col("rank")) === 1 && max(col("rank")) === k).alias("ranks_ok"),
        (count(col("known")) === count(lit(1))).alias("members_ok"),
        (sum(when(col("neighbor_id") === col("q_id"), 1).otherwise(0)) === 0)
          .alias("self_ok"),
        (sum(when(col("prev_cos").isNotNull &&
          col("prev_cos") < col("cos_sim"), 1).otherwise(0)) === 0)
          .alias("ordered_ok"))
  }

  /** [[recallAtK]] of PQ-ADC vs brute force — the PQ counterpart of
    * [[ivfRecallReport]], reducible to a hash-checked floor via
    * [[recallAudit]].
    */
  def pqRecallReport(
      embeddings: DataFrame,
      m: Int = 8,
      codes: Int = 16,
      iters: Int = 5,
      k: Int = 5,
      refine: Int = 4): DataFrame = {
    // ONE materialized prepared frame feeds both the PQ arm and the exact
    // baseline (the ivfRecallReport convention) — previously each arm
    // re-scanned and re-prepared the source, doubling the corpus scans of
    // the registered recall query.
    val prep = Materialize(prepared(embeddings))
    recallAtK(
      pqTopKPrepared(prep, m, codes, iters, k, refine),
      bruteForceTopKPrepared(prep, k))
  }

  /** [[recallAtK]] of IVFPQ vs brute force — one shared materialized
    * prepared frame for the index build, the search, and the exact
    * baseline (the [[pqRecallReport]] scan-sharing convention). */
  def ivfPqRecallReport(
      embeddings: DataFrame,
      cells: Int = 8,
      m: Int = 8,
      codes: Int = 16,
      iters: Int = 5,
      k: Int = 5,
      nprobe: Int = 2,
      refine: Int = 4): DataFrame = {
    require(refine >= 1, s"refine multiplier must be ≥ 1, got $refine")
    require(nprobe >= 1 && nprobe <= cells, s"bad nprobe $nprobe for $cells")
    require(m > 0 && Dim % m == 0, s"dim $Dim must split into $m subspaces")
    require(cells > 0 && codes > 0 && iters >= 0,
      s"bad ivfpq params: $cells/$codes/$iters")
    val prep = Materialize(prepared(embeddings))
    val (encoded, cs, books) = ivfPqIndex(prep, cells, m, codes, iters)
    recallAtK(
      ivfPqSearch(encoded, prep, cs, books, m, k, nprobe, refine),
      bruteForceTopKPrepared(prep, k))
  }

  /** Product-quantization codebooks: the `Dim`-dimensional space split
    * into `m` contiguous subspaces of `Dim/m` dims, each with its own
    * `codes`-entry Lloyd-fit codebook over the shared driver-side sample.
    * PQ is the memory workhorse of billion-scale ANN (FAISS IVFPQ): a
    * 64-float vector compresses to `m` byte-ish codes, and search scans
    * codes with table lookups instead of float multiplies.
    */
  def pqCodebooks(
      prep: DataFrame,
      m: Int = 8,
      codes: Int = 16,
      iters: Int = 5,
      sampleSize: Int = MaxTrainSample): Seq[Seq[Seq[Double]]] = {
    // Validate BEFORE the distributed sample pass — bad params must fail
    // in microseconds, not after a cluster top-k and an 8 MB collect.
    require(m > 0 && Dim % m == 0, s"dim $Dim must split into $m subspaces")
    require(codes > 0 && iters >= 0, s"bad pq params: $codes/$iters")
    pqFit(trainSample(prep, sampleSize), m, codes, iters)
  }

  /** Per-subspace Lloyd codebooks over an in-memory sample — shared by the
    * raw-vector PQ and the residual-encoded IVFPQ trainers.
    */
  private def pqFit(
      sample: Array[Array[Double]],
      m: Int,
      codes: Int,
      iters: Int): Seq[Seq[Seq[Double]]] = {
    require(m > 0 && Dim % m == 0, s"dim $Dim must split into $m subspaces")
    require(codes > 0 && iters >= 0, s"bad pq params: $codes/$iters")
    val sub = Dim / m
    (0 until m).map { j =>
      lloydFit(sample.map(_.slice(j * sub, (j + 1) * sub)), codes, iters)
        .map(_.toSeq).toSeq
    }
  }

  /** Per-subspace 0-based argmin codes `c0..c{m-1}` over staged
    * `<prefix>0..<prefix>{m-1}` subvector slices: argmin of
    * `‖c‖² − 2·s·c` (the `‖s‖²` term is constant under argmin), 6-dp
    * rounded with code-index tie-break. Shared by PQ and IVFPQ encode.
    */
  private def pqCodeColumns(
      books: Seq[Seq[Seq[Double]]], prefix: String): Seq[Column] =
    books.indices.map { j =>
      val entries = books(j).zipWithIndex.map { case (c, i) =>
        val cn2 = c.map(x => x * x).sum
        struct(
          round(lit(cn2) - lit(2.0) * dot(col(s"$prefix$j"), typedlit(c)), 6)
            .alias("d"),
          lit(i).alias("code"))
      }
      element_at(transform(array_sort(array(entries: _*)),
        e => e.getField("code")), 1).alias(s"c$j")
    }

  /** Exact cosine re-rank of a `(q_id, neighbor_id)` shortlist: two slim
    * equi-joins back to the prepared vectors, then the final top-k. The
    * shortlist (and the first join's output) is bounded at
    * `|queries| × refine·k` rows, so BOTH joins broadcast it explicitly —
    * without the hint the planner's post-checkpoint size estimates can
    * pick a sort-merge join that shuffles the corpus-scale `prep` by
    * q_id/neighbor_id (guide §3.1: pick the strategy deliberately; the
    * corpus side must never shuffle for a constant-bounded probe set).
    */
  private def exactReRank(
      shortlist: DataFrame, prep: DataFrame, k: Int): DataFrame =
    topK(
      broadcast(broadcast(shortlist)
        .join(prep.select(col("vec_id").alias("q_id"),
          col("vec").alias("q_vec"), col("norm").alias("q_norm")), "q_id"))
        .join(prep.select(col("vec_id").alias("neighbor_id"), col("vec"),
          col("norm")), "neighbor_id")
        .select(col("q_id"), col("neighbor_id"),
          cosine(col("q_vec"), col("q_norm"), col("vec"), col("norm"))
            .alias("cos_sim")),
      k)

  /** PQ-ADC top-k with exact re-ranking. Data vectors are encoded once
    * (per subspace, the argmin-distance code — `‖c‖² − 2·s·c`, the `‖s‖²`
    * term dropped as constant under argmin); each query precomputes an
    * `m × codes` lookup table of subspace dot products, and the scan
    * scores a (query, vector) pair with `m` TABLE LOOKUPS instead of
    * `Dim` multiplies — the asymmetric-distance-computation trade. The
    * top `refine·k` per query by approximate cosine (reconstructed-norm
    * denominator) are re-ranked with the exact vectors; output matches
    * the [[bruteForceTopK]] shape.
    *
    * At 100 TB the encoded table IS the stored index (m small ints per
    * vector, 16× smaller than the floats); the scan shape is the same
    * broadcast-query pass as [[bruteForceTopK]] but at lookup cost, and
    * composes with the IVF cell join for sublinear candidate counts.
    * Training is imperative (no SQL twin) → rows-only driver check;
    * SimilaritySpec bounds recall against the exact baseline.
    */
  def pqTopK(
      embeddings: DataFrame,
      m: Int = 8,
      codes: Int = 16,
      iters: Int = 5,
      k: Int = 5,
      refine: Int = 4): DataFrame =
    pqTopKPrepared(Materialize(prepared(embeddings)), m, codes, iters, k,
      refine)

  private def pqTopKPrepared(
      prep: DataFrame,
      m: Int,
      codes: Int,
      iters: Int,
      k: Int,
      refine: Int): DataFrame = {
    require(refine >= 1, s"refine multiplier must be ≥ 1, got $refine")
    val sub = Dim / m
    val books = pqCodebooks(prep, m, codes, iters)
    // Stage subvector slices as attributes before any per-centroid math
    // (HOF/codegen staging — see Dedup.shingleSets).
    def withSubs(df: DataFrame, prefix: String): DataFrame =
      df.select(df.columns.toIndexedSeq.map(col) ++
        (0 until m).map(j =>
          slice(col(if (prefix == "q") "q_vec" else "vec"),
            j * sub + 1, sub).alias(s"$prefix$j")): _*)
    // Encode: per subspace the 0-based argmin code; reconstructed norm²
    // accumulates the chosen centroids' norms (cross-subspace terms are
    // zero because subspaces are disjoint coordinate blocks).
    val encoded = {
      val staged = withSubs(prep.select(col("vec_id"), col("vec")), "s")
      val normSq = (0 until m).map { j =>
        element_at(
          typedlit(books(j).map(c => c.map(x => x * x).sum)), col(s"c$j") + 1)
      }.reduce(_ + _)
      staged.select(col("vec_id") +: pqCodeColumns(books, "s"): _*)
        .withColumn("recon_norm", sqrt(normSq))
    }
    // Query-side ADC tables: t_j[c] = q_subspace_j · codebook_j[c].
    val queries = {
      val staged = withSubs(querySet(prep), "q")
      staged.select(col("q_id") +: col("q_norm") +:
        (0 until m).map(j =>
          array(books(j).map(c => dot(col(s"q$j"), typedlit(c))): _*)
            .alias(s"t$j")): _*)
    }
    val adcDot = (0 until m).map(j =>
      element_at(col(s"t$j"), col(s"c$j") + 1)).reduce(_ + _)
    val shortlist = topK(
      encoded.crossJoin(boundedBroadcast(queries))
        .where(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("q_norm"), col("vec_id").alias("neighbor_id"),
          (adcDot / (col("q_norm") * greatest(col("recon_norm"), lit(1e-12))))
            .alias("cos_sim")),
      refine * k)
      .select(col("q_id"), col("neighbor_id"))
    exactReRank(shortlist, prep, k)
  }

  /** IVFPQ — the FAISS IVFADC architecture, composed from the engine's
    * own pieces: a Lloyd-trained coarse quantizer partitions vectors into
    * cells (the inverted lists), and each vector's RESIDUAL against its
    * cell centroid is PQ-encoded. Search probes `nprobe` cells (equi-join,
    * never a product), scores candidates with table lookups via the dot
    * decomposition `q·v = q·c + q·r̂ = q·c + Σⱼ tⱼ[cⱼ]`, and exactly
    * re-ranks the `refine·k` shortlist.
    *
    * Residual encoding is what lifts PQ recall here: residuals are
    * near-zero-centered with far less variance than raw vectors, so the
    * same code budget quantizes them much more finely. The reconstructed
    * norm `‖c+r̂‖` (for the cosine denominator) derives entirely from
    * per-(cell, code) literal tables at encode time — subspaces are
    * disjoint coordinate blocks, so cross terms reduce to per-subspace
    * sums. At 100 TB the stored index is (cell, m codes, recon_norm) per
    * vector; the scan cost per candidate is m lookups + one add.
    */
  def ivfPqTopK(
      embeddings: DataFrame,
      cells: Int = 8,
      m: Int = 8,
      codes: Int = 16,
      iters: Int = 5,
      k: Int = 5,
      nprobe: Int = 2,
      refine: Int = 4): DataFrame = {
    // Full fail-fast validation BEFORE any distributed pass.
    require(refine >= 1, s"refine multiplier must be ≥ 1, got $refine")
    require(nprobe >= 1 && nprobe <= cells, s"bad nprobe $nprobe for $cells")
    require(m > 0 && Dim % m == 0, s"dim $Dim must split into $m subspaces")
    require(cells > 0 && codes > 0 && iters >= 0,
      s"bad ivfpq params: $cells/$codes/$iters")
    val prep = Materialize(prepared(embeddings))
    val (encoded, cs, books) = ivfPqIndex(prep, cells, m, codes, iters)
    ivfPqSearch(encoded, prep, cs, books, m, k, nprobe, refine)
  }

  /** The trained IVFPQ index build, split from search so the probe-gain
    * card can run two searches against ONE training pass: returns the
    * encoded frame `(vec_id, cell, c0..c_{m-1}, recon_norm)` plus the
    * coarse centroids and residual codebooks the search side needs for
    * its literal tables.
    */
  private def ivfPqIndex(
      prep: DataFrame,
      cells: Int,
      m: Int,
      codes: Int,
      iters: Int)
      : (DataFrame, Seq[Seq[Double]], Seq[Seq[Seq[Double]]]) = {
    val sub = Dim / m
    // ONE sample collect feeds both trainers: the coarse Lloyd fit and the
    // residual codebooks (the draw is deterministic, so a second pass
    // would fetch the identical rows for double the cluster work).
    val sample = trainSample(prep, MaxTrainSample)
    val cs = lloydFit(sample, cells, iters).map(_.toSeq).toSeq
    // Residual codebooks: assign each training vector to its coarse cell
    // with the same 6-dp-rounded, lowest-index-tie rule SHAPE as the
    // distributed encode (cellsByDistance). Bit-exact agreement is not
    // required — a boundary vector assigned differently only perturbs the
    // codebook fit, never an output row — but matching the rounding
    // removes the systematic disagreement an unrounded argmin would have.
    def d2(a: Array[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val residuals = sample.map { v =>
      val c = cs.zipWithIndex
        .minBy { case (cc, i) => (math.rint(d2(v, cc) * 1e6) / 1e6, i) }._1
      v.indices.map(i => v(i) - c(i)).toArray
    }
    val books = pqFit(residuals, m, codes, iters)

    val byDist = cellsByDistance(col("vec"), col("norm"), cs)
    // Encode: cell, residual subspace slices staged, per-subspace argmin
    // code, and the reconstructed norm from literal lookup tables.
    val encoded = {
      val celled = prep
        .withColumn("cell", element_at(byDist, 1))
        .withColumn("resid",
          zip_with(col("vec"), centroidOf(cs, col("cell")), (a, b) => a - b))
      val staged = celled.select(col("vec_id") +: col("cell") +:
        (0 until m).map(j =>
          slice(col("resid"), j * sub + 1, sub).alias(s"r$j")): _*)
      val coded = staged.select(
        col("vec_id") +: col("cell") +: pqCodeColumns(books, "r"): _*)
      // ‖c+r̂‖² = ‖c‖² + Σⱼ (2·c_subⱼ·bookⱼ[cⱼ] + ‖bookⱼ[cⱼ]‖²): all three
      // terms are (cell, code)-indexed literals. comb(j)(cell-1)(code)
      // folds the last two together.
      val cn2Of: Column = cs.zipWithIndex.map { case (c, i) =>
        (i + 1, lit(c.map(x => x * x).sum))
      }.foldRight(lit(0.0)) { case ((id, v), rest) =>
        when(col("cell") === id, v).otherwise(rest)
      }
      val combTerm = (0 until m).map { j =>
        val tables = cs.zipWithIndex.map { case (c, ci) =>
          val cSub = c.slice(j * sub, (j + 1) * sub)
          (ci + 1, typedlit(books(j).map { b =>
            2.0 * cSub.zip(b).map { case (x, y) => x * y }.sum +
              b.map(x => x * x).sum
          }))
        }.foldRight(typedlit(Seq.fill(codes)(0.0)): Column) {
          case ((id, t), rest) => when(col("cell") === id, t).otherwise(rest)
        }
        element_at(tables, col(s"c$j") + 1)
      }.reduce(_ + _)
      // greatest(…, 0): the exact value is ≥ 0, but double fold order can
      // land a hair below zero for near-zero vectors — sqrt must not NaN.
      coded.withColumn("recon_norm",
        sqrt(greatest(cn2Of + combTerm, lit(0.0))))
    }
    (encoded, cs, books)
  }

  /** CASE chain selecting the (1-based) cell's centroid as a literal —
    * shared by the IVFPQ encode (residuals) and search (coarse q·c term).
    */
  private def centroidOf(cs: Seq[Seq[Double]], cell: Column): Column =
    cs.zipWithIndex.map { case (c, i) =>
      (i + 1, typedlit(c))
    }.foldRight(typedlit(cs.head): Column) { case ((id, c), rest) =>
      when(cell === id, c).otherwise(rest)
    }

  /** IVFPQ search over a built index (see [[ivfPqIndex]]): nprobe cells
    * per query, ADC shortlist, exact re-rank.
    */
  private def ivfPqSearch(
      encoded: DataFrame,
      prep: DataFrame,
      cs: Seq[Seq[Double]],
      books: Seq[Seq[Seq[Double]]],
      m: Int,
      k: Int,
      nprobe: Int,
      refine: Int): DataFrame = {
    val sub = Dim / m
    // Queries: ADC tables tⱼ from the RAW query subvectors (q·r̂ needs q,
    // not a residual) — computed BEFORE the probe explode so the m×codes
    // dot products run once per query, not once per probed cell — then
    // the nprobe nearest cells with their per-probe coarse term q·c.
    val queries = {
      val tabled = querySet(prep).select(
        col("q_id") +: col("q_vec") +: col("q_norm") +:
          (0 until m).map(j =>
            array(books(j).map(b =>
              dot(slice(col("q_vec"), j * sub + 1, sub), typedlit(b))): _*)
              .alias(s"t$j")): _*)
      tabled
        .withColumn("cell",
          explode(slice(cellsByDistance(col("q_vec"), col("q_norm"), cs),
            1, nprobe)))
        .withColumn("qc", dot(col("q_vec"), centroidOf(cs, col("cell"))))
        .drop("q_vec")
    }
    val adcDot = col("qc") +
      (0 until m).map(j => element_at(col(s"t$j"), col(s"c$j") + 1))
        .reduce(_ + _)
    val shortlist = topK(
      encoded.join(boundedBroadcast(queries), "cell")
        .where(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").alias("neighbor_id"),
          (adcDot / (col("q_norm") * greatest(col("recon_norm"), lit(1e-12))))
            .alias("cos_sim")),
      refine * k)
      .select(col("q_id"), col("neighbor_id"))
    exactReRank(shortlist, prep, k)
  }

  /** The IVFPQ nprobe DECISION card (r15 verdict item 7 — the
    * [[ivfSq8ProbeGainReport]] shape for the TRAINED residual-PQ index):
    * recall vs brute force at nprobe=1 and at `nprobe` from ONE training
    * pass and one encoded frame, so the gain isolates the probe count.
    * The trained quantizer has no SQL twin, so unlike the seed-based SQ8
    * card this face is rows-only; its audit twin pins the measured
    * floors hash-checked.
    */
  def ivfPqProbeGainReport(
      embeddings: DataFrame,
      cells: Int = 8,
      m: Int = 8,
      codes: Int = 16,
      iters: Int = 5,
      k: Int = 5,
      nprobe: Int = 2,
      refine: Int = 4): DataFrame = {
    require(nprobe >= 1 && nprobe <= cells, s"bad nprobe $nprobe for $cells")
    val prep = Materialize(prepared(embeddings))
    val (encoded0, cs, books) = ivfPqIndex(prep, cells, m, codes, iters)
    val encoded = Materialize(encoded0)
    val bf = bruteForceTopKPrepared(prep, k)
    val r1 = recallAtK(
      ivfPqSearch(encoded, prep, cs, books, m, k, 1, refine), bf)
      .select(col("expected"), col("recall").alias("recall_1"))
    val rp = recallAtK(
      ivfPqSearch(encoded, prep, cs, books, m, k, nprobe, refine), bf)
      .select(col("recall").alias("recall_probe"))
    r1.crossJoin(rp).select(
      col("expected"),
      lit(nprobe).cast("int").alias("nprobe"),
      col("recall_1"), col("recall_probe"),
      round(col("recall_probe") - col("recall_1"), 6).alias("gain"))
  }

  /** Hash-checked audit face of [[ivfPqProbeGainReport]]: `expected` is
    * oracle-derivable (query count × k), the booleans pin the MEASURED
    * floors (set strictly below the worst measurement across scales —
    * regression guards, not the measurements).
    */
  def ivfPqProbeGainAudit(
      embeddings: DataFrame,
      cells: Int = 8,
      k: Int = 5,
      nprobe: Int = 2,
      refine: Int = 4,
      floor1: Double = 0.1,
      floorProbe: Double = 0.2): DataFrame =
    ivfPqProbeGainReport(embeddings, cells, k = k, nprobe = nprobe,
      refine = refine).select(
      col("expected"),
      (col("recall_1") >= floor1).alias("floor1_met"),
      (col("recall_probe") >= floorProbe).alias("probe_floor_met"),
      (col("gain") >= 0.0).alias("gain_nonneg"))

  /** Embedding-cosine near-duplicate pairs: bucket-sharing pairs with
    * cosine ≥ threshold (the embedding-space member of the dedup family).
    */
  def cosineNearDup(
      embeddings: DataFrame,
      bits: Int = 6,
      threshold: Double = 0.25): DataFrame = {
    val ps = planes(bits)
    val prep = prepared(embeddings)
      .withColumn("bucket", srpBucket(col("vec"), ps))
    val a = prep.select(col("bucket"), col("vec_id").alias("a_id"),
      col("vec").alias("vec_a"), col("norm").alias("norm_a"))
    val b = prep.select(col("bucket"), col("vec_id").alias("b_id"),
      col("vec").alias("vec_b"), col("norm").alias("norm_b"))
    a.join(b, "bucket")
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        cosine(col("vec_a"), col("norm_a"), col("vec_b"), col("norm_b"))
          .alias("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** Density-based OUTLIER screen over the SRP near-dup graph: vectors
    * with fewer than `minNeighbors` bucket-mates at cosine ≥ `threshold`
    * are flagged — the cheap DBSCAN-noise-point analogue for catching
    * anomalous embeddings (encoder glitches, wrong-modality rows) before
    * they pollute an index or a SemDeDup pass. Honest scope: density is
    * measured WITHIN the SRP bucket (the same candidate graph every
    * near-dup operator here uses), so an isolated-but-split cluster can
    * flag; at scale raise `bits` coverage the same way the dedup family
    * does. Reuses [[cosineNearDup]]'s pair machinery verbatim — bucket
    * equi-join, never a product.
    */
  def densityOutliers(
      embeddings: DataFrame,
      bits: Int = 6,
      threshold: Double = 0.25,
      minNeighbors: Int = 2): DataFrame = {
    // Materialized: the a_id/b_id branches of the union would otherwise
    // each replay the whole SRP bucket-join lineage (the exact
    // double-evaluation componentsFromPairs truncates per round).
    val pairs = Materialize(cosineNearDup(embeddings, bits, threshold))
    val degrees = pairs.select(col("a_id").alias("vec_id"))
      .unionAll(pairs.select(col("b_id").alias("vec_id")))
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).alias("n_neighbors"))
    embeddings.select(col("vec_id"))
      .join(degrees, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("n_neighbors"), lit(0L)).alias("n_neighbors"))
      .withColumn("is_outlier", col("n_neighbors") < minNeighbors)
  }

  /** Cosine histogram of the SRP bucket-sharing pairs, in 0.1-wide bins —
    * the embedding-space threshold-tuning curve (see
    * Dedup.candidateSimHistogram): on near-orthogonal corpora it shows
    * exactly where the random tail dies, which is what separates a
    * meaningful near-dup threshold from one that welds random components.
    * The bin index is an integer floor of the (bit-identical) rounded
    * cosine, so the histogram is hash-stable across engines.
    */
  def cosineHistogram(embeddings: DataFrame, bits: Int = 6): DataFrame =
    cosineNearDup(embeddings, bits, threshold = -1.0)
      .groupBy(floor(col("cos_sim") * 10).cast("int").alias("cos_bin"))
      .agg(count(lit(1)).alias("n_pairs"))

  /** Embedding-space near-duplicate CLUSTERS: connected components over
    * the [[cosineNearDup]] pair set, every vector labeled with its
    * component's minimum vec_id — the embedding-space face of
    * Dedup.clusters, composed from the same CC loop
    * (Dedup.componentsFromPairs), so the scale argument carries over
    * verbatim: candidates only from SRP buckets, iteration only over
    * candidate-graph nodes, singletons attached once.
    */
  def cosineNearDupClusters(
      embeddings: DataFrame,
      bits: Int = 6,
      threshold: Double = 0.25,
      maxIters: Int = 40): DataFrame =
    Dedup.componentsFromPairs(
      cosineNearDup(embeddings, bits, threshold)
        .select(col("a_id"), col("b_id")),
      embeddings.select(col("vec_id")),
      "vec_id",
      maxIters)

  /** SemDeDup-style embedding-CLUSTER dedup (Abbas et al. 2023,
    * arXiv:2303.09540): assign every vector to a coarse quantizer cell,
    * then prune near-duplicates WITHIN each cell — cluster-then-prune,
    * the granularity the doc-hash/MinHash/SimHash/span/line/pair family
    * lacked. Within a cell, candidate pairs come from the SRP bucket
    * machinery ([[cosineNearDup]]'s shape) joined on `(cell, bucket)` —
    * strictly narrower buckets than SRP alone, a cell equi-join only,
    * never a product. The prune rule is the deterministic greedy form:
    * a vector is pruned iff some SMALLER-id vector in its (cell, bucket)
    * has cosine ≥ threshold — id order replaces SemDeDup's
    * distance-to-centroid rank (float-rank ties are not bit-stable
    * cross-engine; min-id is, and keeps exactly one representative per
    * ε-clique the same way).
    *
    * Cell assignment: seeded Rademacher quantizer ([[ivfCell]], the
    * SQL-expressible twin — full hash oracle) by default;
    * `trainedCells = true` swaps in the Lloyd-trained centroids
    * ([[kmeansCentroids]] — density-following cells, the production
    * shape; imperative fit ⇒ no SQL twin, so that face is checked by
    * [[semanticDedupAudit]]'s pinned invariants instead).
    *
    * Emits one row per vector: `(vec_id, cell, keep)` — the full
    * partition, so downstream `WHERE keep` is the dedup and
    * `WHERE NOT keep` the audit trail.
    *
    * Scale shape: quantizer trains on a bounded driver sample (or is
    * seed-constant); assignment is a map-side projection; the pair join
    * keys on (cell, bucket) — cells bound the worst join fanout and are
    * the scale lever (√n cells keeps per-cell lists flat); nothing else
    * shuffles but the final broadcast-able pruned-id set.
    */
  def semanticDedup(
      embeddings: DataFrame,
      cells: Int = 8,
      bits: Int = 6,
      threshold: Double = 0.4,
      trainedCells: Boolean = false,
      iters: Int = 3): DataFrame =
    semanticParts(embeddings, cells, bits, threshold, trainedCells, iters)._1

  /** One-row invariant audit of the TRAINED [[semanticDedup]] face — the
    * sketch-audit pattern: `n_total` is oracle-derivable (corpus count),
    * the three booleans are pinned TRUE by the oracle and verified by
    * actual distributed checks here, so a regression in the trained path
    * fails a hash-checked row instead of hiding behind rows-only:
    * `partition_ok` — keep/prune covers every vector exactly once;
    * `pruned_witnessed` — every pruned vector really has a smaller-id
    * in-(cell,bucket) neighbor at cosine ≥ threshold;
    * `keepers_clean` — no two kept vectors share a (cell, bucket) at
    * cosine ≥ threshold.
    */
  def semanticDedupAudit(
      embeddings: DataFrame,
      cells: Int = 8,
      bits: Int = 6,
      threshold: Double = 0.4,
      iters: Int = 3): DataFrame = {
    val (flags0, pairs0) = semanticParts(
      embeddings, cells, bits, threshold, trainedCells = true, iters)
    val flags = Materialize(flags0)
    val pairs = Materialize(pairs0.select(col("a_id"), col("b_id")))
    val nTotal = embeddings.agg(count(lit(1)).alias("n_total"))
    val nFlags = flags.agg(
      count(lit(1)).alias("n_flags"),
      sum(when(col("keep"), 1L).otherwise(0L)).alias("n_keep"))
    val unwitnessed = flags.where(!col("keep"))
      .join(pairs.select(col("b_id").alias("vec_id")).distinct(),
        Seq("vec_id"), "left_anti")
      .agg(count(lit(1)).alias("n_unwitnessed"))
    val keptPairs = pairs
      .join(flags.where(col("keep")).select(col("vec_id").alias("a_id")), "a_id")
      .join(flags.where(col("keep")).select(col("vec_id").alias("b_id")), "b_id")
      .agg(count(lit(1)).alias("n_kept_pairs"))
    nTotal.crossJoin(nFlags).crossJoin(unwitnessed).crossJoin(keptPairs)
      .select(
        col("n_total"),
        (col("n_flags") === col("n_total")).alias("partition_ok"),
        (col("n_unwitnessed") === 0).alias("pruned_witnessed"),
        (col("n_kept_pairs") === 0).alias("keepers_clean"))
  }

  /** PER-ROW membership contract for the TRAINED [[semanticDedup]] face
    * (r15 verdict item 8) — the [[topKMemberAudit]] pattern applied to
    * the dedup partition: one hash-checked row PER VECTOR instead of one
    * aggregate row, so a violation pins the exact vec_id instead of
    * flipping a corpus-wide boolean. Columns (oracle pins all TRUE / 1):
    * `n_rows` — the flag frame covers this vector exactly once;
    * `keep_consistent` — the greedy rule holds pointwise: kept ⇔ NO
    * smaller-id in-(cell,bucket) neighbor at cosine ≥ threshold;
    * `keeper_clean` — a kept vector is never the larger end of a pair
    * whose smaller end is also kept (the SemDeDup one-representative-
    * per-ε-clique property; implied by the greedy rule, so it catches a
    * prune-rule change that silently keeps both ends).
    */
  def semanticDedupMemberAudit(
      embeddings: DataFrame,
      cells: Int = 8,
      bits: Int = 6,
      threshold: Double = 0.4,
      iters: Int = 3): DataFrame = {
    val (flags0, pairs0) = semanticParts(
      embeddings, cells, bits, threshold, trainedCells = true, iters)
    val flags = Materialize(flags0)
    val pairs = Materialize(pairs0.select(col("a_id"), col("b_id")))
    val perVec = flags.groupBy(col("vec_id")).agg(
      count(lit(1)).alias("n"),
      (sum(when(col("keep"), 1L).otherwise(0L)) > 0).alias("kept"))
    val witnessed = pairs.select(col("b_id").alias("vec_id")).distinct()
      .withColumn("w", lit(true))
    val keptA = flags.where(col("keep")).select(col("vec_id").alias("a_id"))
    val keptWitness = pairs.join(keptA, "a_id")
      .select(col("b_id").alias("vec_id")).distinct()
      .withColumn("kw", lit(true))
    embeddings.select(col("vec_id"))
      .join(perVec, Seq("vec_id"), "left")
      .join(witnessed, Seq("vec_id"), "left")
      .join(keptWitness, Seq("vec_id"), "left")
      .select(
        col("vec_id"),
        coalesce(col("n"), lit(0L)).alias("n_rows"),
        (coalesce(col("kept"), lit(false)) =!=
          coalesce(col("w"), lit(false))).alias("keep_consistent"),
        (!(coalesce(col("kept"), lit(false)) &&
          coalesce(col("kw"), lit(false)))).alias("keeper_clean"))
  }

  private def semanticParts(
      embeddings: DataFrame,
      cells: Int,
      bits: Int,
      threshold: Double,
      trainedCells: Boolean,
      iters: Int): (DataFrame, DataFrame) = {
    val base = Materialize(prepared(embeddings))
    val withCell =
      if (trainedCells) {
        val cs = kmeansCentroids(base, cells, iters)
        base.withColumn("cell",
          element_at(cellsByDistance(col("vec"), col("norm"), cs), 1))
      } else base.withColumn("cell", ivfCell(col("vec"), planes(cells, seed = 7L)))
    val prep = Materialize(
      withCell.withColumn("bucket", srpBucket(col("vec"), planes(bits))))
    val a = prep.select(col("cell"), col("bucket"),
      col("vec_id").alias("a_id"), col("vec").alias("vec_a"),
      col("norm").alias("norm_a"))
    val b = prep.select(col("cell"), col("bucket"),
      col("vec_id").alias("b_id"), col("vec").alias("vec_b"),
      col("norm").alias("norm_b"))
    val pairs = a.join(b, Seq("cell", "bucket"))
      .where(col("a_id") < col("b_id"))
      .where(cosine(col("vec_a"), col("norm_a"), col("vec_b"), col("norm_b"))
        >= threshold)
    val pruned = pairs.select(col("b_id").alias("vec_id")).distinct()
    val flags = prep.select(col("vec_id"), col("cell"))
      .join(pruned.withColumn("p", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        not(coalesce(col("p"), lit(false))).alias("keep"))
    (flags, pairs)
  }

  /** Int8 quantization stats: per vector, the symmetric scale
    * (max |component| / 127) and the reconstruction error of
    * `round(v/scale)·scale` — the storage path that shrinks a float32 ANN
    * index 4× with measured loss. Pure projection (no shuffle); at scale
    * the index stores the int8 codes + scale, and this op is the loss
    * audit. `scale` is staged as an attribute before the error lambda
    * (HOF staging — see Dedup.shingleSets), floored at 1e-12 so an
    * all-zero vector quantizes to zeros instead of dividing by zero.
    */
  def quantizeStats(embeddings: DataFrame): DataFrame = {
    val prep = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").alias("vec"))
      .select(col("vec_id"), col("vec"),
        greatest(
          array_max(transform(col("vec"), x => abs(x))) / 127.0,
          lit(1e-12)).alias("scale"))
    val errs = prep.select(col("vec_id"), col("scale"), col("vec"),
      transform(col("vec"),
        x => abs(round(x / col("scale"), 0) * col("scale") - x)).alias("e"))
    errs.select(
      col("vec_id"),
      round(col("scale"), 6).alias("scale"),
      round(array_max(col("e")), 6).alias("max_abs_err"),
      round(aggregate(col("e"), lit(0.0), (a, x) => a + x) /
        greatest(size(col("vec")), lit(1)), 6).alias("mean_abs_err"))
  }

  /** Per-dimension 8-bit SCALAR quantization (the FAISS SQ8 index): each
    * dimension is affinely mapped onto the 256-level grid of its own
    * corpus [min, max]. Unlike [[quantizeStats]]' per-VECTOR symmetric
    * scale (a loss audit), this is the stored-index face: one trained
    * (min, span) pair per dimension, 1 byte per element — 4× smaller than
    * float32, scanned with integer multiplies.
    *
    * The CODES are integer and hash-exact across engines: values pin to
    * micro-units first (`round(x·10⁶)` — the engine's standard float
    * pin), and the code is `⌊(m − minₘ)·255 / spanₘ⌋` clamped to
    * [0, 255]. The one double division is provably exact to reproduce:
    * numerator ≤ ~5·10⁸ is an exactly-represented integer, IEEE division
    * is correctly rounded on both engines, and a non-exact quotient sits
    * ≥ 1/span ≫ ulp away from any integer, so the floor cannot straddle
    * engines. Constant dims (span 0) clamp to span 1 and code 0.
    *
    * Search scores against the RECONSTRUCTION `x̂ = (minₘ + c·spanₘ/255)
    * / 10⁶` (asymmetric distance computation — raw-code dots would rank
    * in the per-dim affine-normalized space, which reweights dimensions
    * and wrecks recall). The decode is a fixed IEEE expression tree over
    * exactly-represented integers, identical on both engines; `recon` and
    * its norm ride along so the scan pays one dot per pair.
    *
    * Shape: per-dim stats are ONE map-side-combined aggregate over
    * [[Dim]] keys, collapsed to a single row of (mins, maxs) arrays and
    * broadcast back — the corpus never shuffles; encoding and decoding
    * are pure projections (at scale the STORED index is the 1-byte
    * codes + the 2·Dim bounds literals; decode happens in-scan).
    */
  def sq8Codes(prep: DataFrame): DataFrame = {
    val micro = transform(col("vec"),
      x => round(x * lit(1000000d)).cast("long"))
    val withM = prep.select(col("vec_id"), col("vec"), col("norm"),
      micro.alias("m"))
    val stats = withM
      .select(posexplode(col("m")).as(Seq("pos", "mv")))
      .groupBy(col("pos"))
      .agg(min(col("mv")).alias("mn"), max(col("mv")).alias("mx"))
    // Dim rows → one (mins, maxs) row: struct-sort by pos makes the
    // collect_list order deterministic under any partitioning.
    val bounds = stats
      .agg(array_sort(collect_list(
        struct(col("pos"), col("mn"), col("mx")))).alias("e"))
      .select(transform(col("e"), s => s.getField("mn")).alias("mns"),
        transform(col("e"), s => s.getField("mx")).alias("mxs"))
    withM.crossJoin(broadcast(bounds))
      .withColumn("codes", zip_with(
        zip_with(col("m"), col("mns"), (a, b) => a - b),
        zip_with(col("mxs"), col("mns"), (a, b) => greatest(a - b, lit(1L))),
        (d, s) => least(lit(255L),
          floor(d.cast("double") * lit(255d) / s.cast("double"))
            .cast("long"))))
      // Decode: x̂ = (mn + c·span/255)/10⁶. c·span ≤ ~5·10⁹ stays an
      // exact long; every double step after is one correctly-rounded
      // IEEE op in a fixed tree — bit-identical across engines.
      .withColumn("recon", zip_with(
        col("mns"),
        zip_with(col("codes"),
          zip_with(col("mxs"), col("mns"), (a, b) => a - b),
          (c, s) => c * s),
        (mn, t) => (mn.cast("double") + t.cast("double") / lit(255d))
          / lit(1000000d)))
      .withColumn("recon_norm", sqrt(dot(col("recon"), col("recon"))))
      .select(col("vec_id"), col("vec"), col("norm"), col("codes"),
        col("recon"), col("recon_norm"))
  }

  /** SQ8 top-k with exact re-ranking: the scan scores each (query,
    * vector) pair by the exact query against the RECONSTRUCTED vector
    * (asymmetric distance computation), rounded to the engine's standard
    * 6 dp (neighbor_id tie-break — the same float pin every cosine in
    * this file uses), shortlists the top `refine·k`, and re-ranks with
    * the exact vectors. Codes, decode, score, and both tie-breaks are
    * engine-stable, so unlike PQ/IVF this trained index has a FULL
    * hash-checked oracle twin, not just a recall floor.
    *
    * At 100 TB the stored index is the codes column + 2·Dim bound
    * literals (4× smaller scans); the pass shape is [[bruteForceTopK]]'s
    * broadcast-query scan with in-scan decode, and composes with the IVF
    * cell join the same way PQ does.
    */
  def sq8TopK(
      embeddings: DataFrame, k: Int = 5, refine: Int = 4): DataFrame =
    sq8TopKPrepared(Materialize(prepared(embeddings)), k, refine)

  private def sq8TopKPrepared(
      prep: DataFrame, k: Int, refine: Int): DataFrame = {
    require(refine >= 1, s"refine multiplier must be ≥ 1, got $refine")
    val coded = Materialize(sq8Codes(prep))
    val queries = queryDraw(coded)
      .select(col("vec_id").alias("q_id"), col("vec").alias("q_vec"),
        col("norm").alias("q_norm"))
    val qscore = round(
      dot(col("q_vec"), col("recon")) /
        (col("q_norm") * greatest(col("recon_norm"), lit(1e-12))), 6)
    val shortlist = shortlistIds(
      coded.crossJoin(boundedBroadcast(queries))
        .where(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").alias("neighbor_id"),
          qscore.alias("qscore")),
      refine * k)
    exactReRank(shortlist, coded, k)
  }

  /** IVF × SQ8 — the composed stored index: the deterministic seed-7
    * coarse quantizer partitions vectors into cells (the inverted
    * lists), and each list stores the 1-byte-per-dim SQ8 codes. Search
    * probes the query's own cell (the [[ivfTopK]] nprobe=1 convention —
    * what keeps the composition fully oracle-checkable where the
    * trained multi-probe variants are rows-only), scores candidates by
    * ADC against the reconstruction, and exactly re-ranks the
    * `refine·k` shortlist. This is the claim in [[sq8TopK]]'s scaladoc
    * made real: candidates from a cell EQUI-JOIN (never a corpus scan),
    * scanned at 4×-compressed width — the sublinear-candidates ×
    * compressed-scan architecture of a production vector index, with
    * every stage engine-stable.
    */
  def ivfSq8TopK(
      embeddings: DataFrame,
      cells: Int = 8,
      k: Int = 5,
      refine: Int = 4): DataFrame = {
    require(refine >= 1, s"refine multiplier must be ≥ 1, got $refine")
    val seeds = planes(cells, seed = 7L)
    val coded = Materialize(sq8Codes(prepared(embeddings))
      .withColumn("cell", ivfCell(col("vec"), seeds)))
    val queries = queryDraw(coded)
      .select(col("vec_id").alias("q_id"), col("vec").alias("q_vec"),
        col("norm").alias("q_norm"), col("cell"))
    val qscore = round(
      dot(col("q_vec"), col("recon")) /
        (col("q_norm") * greatest(col("recon_norm"), lit(1e-12))), 6)
    val shortlist = shortlistIds(
      coded.join(boundedBroadcast(queries), "cell")
        .where(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").alias("neighbor_id"),
          qscore.alias("qscore")),
      refine * k)
    exactReRank(shortlist, coded, k)
  }

  /** Deterministic probe order for multi-probe IVF: the `nprobe` cell
    * ids ranked by the query's dot against each seed centroid (desc),
    * ties by cell id — production probe shape (visit the nearest lists
    * first) kept fully hash-checkable. The sort key is the NEGATED
    * integer micro-unit pin of the dot (`-round(dot·10⁶)` as a long):
    * negating a rounded DOUBLE would manufacture −0.0, which Spark's
    * struct sort orders below +0.0 while DuckDB compares them equal —
    * integers have no signed zero, so the seam closes by construction.
    * The first probe is the query's own [[ivfCell]] argmax cell except
    * at micro-vs-6dp rounding knife edges, where both engines still
    * agree (each applies the same pin). */
  def ivfProbeCells(
      vec: Column, seeds: Seq[Seq[Double]], nprobe: Int): Column = {
    require(nprobe >= 1 && nprobe <= seeds.size,
      s"nprobe=$nprobe out of [1, ${seeds.size}]")
    val entries = array(seeds.zipWithIndex.map { case (s, i) =>
      struct(
        (-round(dot(vec, typedlit(s)) * lit(1000000d))).cast("long")
          .alias("nd"),
        lit(i + 1).alias("cid"))
    }: _*)
    slice(transform(array_sort(entries), e => e.getField("cid")),
      1, nprobe)
  }

  /** Multi-probe [[ivfSq8TopK]]: each query searches its `nprobe`
    * nearest inverted lists instead of only its own — the production
    * probe shape (nprobe=1 misses any true neighbor that fell across a
    * cell boundary; probing the runner-up cells recovers most of them
    * for nprobe/cells of extra scan). Probe order is [[ivfProbeCells]],
    * so the whole composed index stays hash-checkable: candidates come
    * from a (query, probe-cell) equi-join against the cell-partitioned
    * SQ8 codes, ADC-shortlisted and exactly re-ranked as before. A
    * vector lives in exactly one cell, so probe unions never duplicate
    * candidate pairs and need no distinct.
    */
  def ivfSq8TopKProbe(
      embeddings: DataFrame,
      cells: Int = 8,
      k: Int = 5,
      refine: Int = 4,
      nprobe: Int = 2): DataFrame = {
    val coded = Materialize(sq8Codes(prepared(embeddings))
      .withColumn("cell", ivfCell(col("vec"), planes(cells, seed = 7L))))
    ivfSq8ProbeFromCoded(coded, cells, k, refine, nprobe)
  }

  private def ivfSq8ProbeFromCoded(
      coded: DataFrame,
      cells: Int,
      k: Int,
      refine: Int,
      nprobe: Int): DataFrame = {
    require(refine >= 1, s"refine multiplier must be ≥ 1, got $refine")
    val seeds = planes(cells, seed = 7L)
    val queries = queryDraw(coded)
      .select(col("vec_id").alias("q_id"), col("vec").alias("q_vec"),
        col("norm").alias("q_norm"))
      .withColumn("cell",
        explode(ivfProbeCells(col("q_vec"), seeds, nprobe)))
    val qscore = round(
      dot(col("q_vec"), col("recon")) /
        (col("q_norm") * greatest(col("recon_norm"), lit(1e-12))), 6)
    val shortlist = shortlistIds(
      coded.join(boundedBroadcast(queries), "cell")
        .where(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").alias("neighbor_id"),
          qscore.alias("qscore")),
      refine * k)
    exactReRank(shortlist, coded, k)
  }

  /** The nprobe DECISION card, fully hash-checked: recall vs brute force
    * at nprobe=1 and at `nprobe`, side by side with the 6-dp gain —
    * every number replayed by the oracle (both searches AND the exact
    * baseline are engine-stable), so unlike the trained-index audits
    * this is not a pinned floor but the measured trade-off itself.
    * One coded frame and one brute-force pass feed both arms.
    */
  def ivfSq8ProbeGainReport(
      embeddings: DataFrame,
      cells: Int = 8,
      k: Int = 5,
      refine: Int = 4,
      nprobe: Int = 2): DataFrame = {
    val prep = Materialize(prepared(embeddings))
    val coded = Materialize(sq8Codes(prep)
      .withColumn("cell", ivfCell(col("vec"), planes(cells, seed = 7L))))
    val bf = bruteForceTopKPrepared(prep, k)
    val r1 = recallAtK(ivfSq8ProbeFromCoded(coded, cells, k, refine, 1), bf)
      .select(col("expected"), col("recall").alias("recall_1"))
    val rp = recallAtK(
      ivfSq8ProbeFromCoded(coded, cells, k, refine, nprobe), bf)
      .select(col("recall").alias("recall_probe"))
    r1.crossJoin(rp).select(
      col("expected"),
      lit(nprobe).cast("int").alias("nprobe"),
      col("recall_1"), col("recall_probe"),
      round(col("recall_probe") - col("recall_1"), 6).alias("gain"))
  }

  /** [[recallAtK]] of [[sq8TopK]] vs brute force over one shared prepared
    * frame, reduced to the hash-checked `(expected, floor_met)` audit
    * face — the quality claim next to sim_sq8_topk's exact twin.
    */
  def sq8RecallAudit(
      embeddings: DataFrame,
      k: Int = 5,
      refine: Int = 4,
      floor: Double = 0.8): DataFrame = {
    val prep = Materialize(prepared(embeddings))
    recallAudit(
      recallAtK(sq8TopKPrepared(prep, k, refine),
        bruteForceTopKPrepared(prep, k)),
      floor)
  }

  /** Exact per-query top-k by `(cos_sim DESC, neighbor_id)` via the
    * k-bounded [[graft.functions.TopKByScore]] aggregate instead of a
    * `row_number` window. Identical rows and ranks (top-k under a total
    * order is merge-order independent; the aggregate mirrors the window's
    * NULLS LAST / Double.compare semantics) — but the window shuffled
    * EVERY candidate row to |queries| distinct keys (a data-scale
    * exchange into ~50 reducer keys at corpus scale) and sorted them; the
    * aggregate's map-side partial pass bounds the exchange at
    * `partitions × |queries| × k` rows (guide §2.3: aggregate before you
    * shuffle).
    */
  private def topK(pairs: DataFrame, k: Int): DataFrame =
    pairs.groupBy(col("q_id"))
      .agg(graft.functions.TopKByScore
        .topK(col("cos_sim"), col("neighbor_id"), k).alias("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("q_id"), (col("pos") + 1).cast("int").alias("rank"),
        col("e.id").alias("neighbor_id"), col("e.score").alias("cos_sim"))

  /** The `(q_id, neighbor_id)` shortlist face of [[topK]] for the ADC
    * scan stages: same bounded aggregate over `qscore`, ranks dropped.
    */
  private def shortlistIds(pairs: DataFrame, k: Int): DataFrame =
    pairs.groupBy(col("q_id"))
      .agg(graft.functions.TopKByScore
        .topK(col("qscore"), col("neighbor_id"), k).alias("top"))
      .select(col("q_id"), explode(col("top")).alias("e"))
      .select(col("q_id"), col("e.id").alias("neighbor_id"))
}
