package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composite a training-data pipeline runs
  * over raw documents before sampling a training mix — quality gate ∧
  * near-duplicate keeper — annotated with predicted language and token
  * accounting for data budgeting.
  *
  * Plan shape at 100 TB: every signal (gate verdict, language scores,
  * token counts) is a narrow per-document projection — no shuffle, and the
  * document TEXT never moves; the joins exchange only (doc_id, a few
  * scalars), bytes per document. The one heavyweight stage is the
  * near-dup clustering inside [[keepers]], which is the bucketed,
  * skew-guarded MinHash/LSH path ([[Dedup.clusters]]).
  */
object Curation {

  /** Keeper per near-duplicate cluster. [[Dedup.clusters]] labels every
    * component with its minimum doc_id, so the keeper is exactly the
    * document whose id IS its cluster label; singletons keep themselves.
    */
  def keepers(
      docs: DataFrame,
      k: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame =
    Dedup.clusters(docs, k, bands, threshold)
      .where(col("doc_id") === col("cluster_id"))
      .select(col("doc_id"))

  /** Curated-corpus manifest: documents that pass the quality gate AND are
    * their cluster's keeper, with language and token counts attached —
    * `(doc_id, predicted_lang, ws_tokens, bpeish_tokens)`, what a sampler
    * needs to draw a training mix. Deliberately does NOT drop
    * `predicted_lang = 'unknown'`: the manifest reports language, the
    * sampler chooses the mix.
    */
  def curate(
      docs: DataFrame,
      k: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame =
    // ONE signal scan ([[TextAnalysis.curationSignals]] fuses gate +
    // language + token counts into a single projection), ONE join with the
    // keeper set — not a join per signal.
    TextAnalysis.curationSignals(docs)
      .where(col("passed"))
      .join(keepers(docs, k, bands, threshold), "doc_id")
      .select(col("doc_id"), col("predicted_lang"),
        col("ws_tokens"), col("bpeish_tokens"))

  /** Sequence packing — "concatenate and chop", the layout GPT-style
    * pretraining feeds the model: documents are laid end-to-end in a
    * deterministic order and cut into `budget`-token sequences; each doc
    * reports the pack its first token lands in. A single global ordering
    * would funnel the corpus through one window partition, so packing is
    * done independently inside `buckets` hash-buckets (pack identity =
    * (bucket, pack_id)) — embarrassingly parallel, deterministic, and at
    * most one under-filled pack per bucket.
    */
  def packSequences(
      docs: DataFrame,
      budget: Int = 2048,
      buckets: Int = 32): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    val toks = TextAnalysis.tokenCounts(docs)
      .select(col("doc_id"), col("ws_tokens"))
    val bucketed = toks.withColumn("bucket",
      pmod(Dedup.hashAt(0, col("doc_id").cast("string")),
        lit(buckets.toLong)).cast("int"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
    bucketed
      .withColumn("cum", sum(col("ws_tokens")).over(w))
      .select(col("doc_id"), col("bucket"),
        floor((col("cum") - col("ws_tokens")) / lit(budget.toDouble))
          .cast("int").alias("pack_id"),
        col("ws_tokens"))
  }

  /** Benchmark decontamination: flags corpus documents sharing at least
    * `minShared` RARE word-bigrams with any benchmark document — the
    * standard check that evaluation data has not leaked into training
    * data. `benchPredicate` marks the benchmark rows inside `docs`.
    *
    * Grams occurring in more than `dfCap` documents are dropped first:
    * common grams ("of the") carry no contamination signal, and they are
    * exactly the hot join keys that would blow the gram equi-join up at
    * corpus scale — one filter serves both precision and skew-safety.
    * Shape: explode → df-filter (map-side-combinable groupBy) → equi-join
    * on gram → per-pair distinct count. No all-pairs product.
    */
  def contamination(
      docs: DataFrame,
      benchPredicate: Column,
      minShared: Int = 3,
      dfCap: Int = 10): DataFrame = {
    val exploded = Dedup.shingleSets(docs)
      .select(col("doc_id"), explode(col("grams")).alias("g"))
    val rareGrams = exploded.groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).alias("gram_df"))
      .where(col("gram_df") <= dfCap)
      .select(col("g"))
    val rare = exploded.join(rareGrams, "g")
    val bench = docs.where(benchPredicate).select(col("doc_id"))
    val corpus = docs.where(!benchPredicate).select(col("doc_id"))
    rare.join(corpus, "doc_id")
      .join(
        rare.join(bench, "doc_id")
          .select(col("g"), col("doc_id").alias("bench_id")),
        "g")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(countDistinct(col("g")).cast("int").alias("shared_grams"))
      .where(col("shared_grams") >= minShared)
  }

  /** Writes a curated manifest partitioned by predicted language — the
    * storage layout a training-mix sampler scans. A per-language directory
    * tree turns a one-language mix draw into a partition-pruned read
    * instead of a full-corpus scan; at 100 TB that is the difference
    * between touching one directory and every file.
    */
  def writeCurated(curated: DataFrame, path: String): Unit =
    curated.write.mode("overwrite")
      .partitionBy("predicted_lang").parquet(path)

  /** Deterministic stratified downsampling by language — the "draw the
    * training mix" step. A document is kept iff its md5-derived hash
    * bucket (0-9999) falls below `rate(stratum)`·10000: no RNG, so the
    * sample is reproducible across runs, engines, and partitionings, and
    * two samples at rates r₁ ≤ r₂ nest (the smaller is a subset of the
    * larger) — the property a data-mix ablation needs. Unknown strata
    * default to `defaultRate`. Pure projection + filter; no shuffle.
    */
  def sampleByLanguage(
      docs: DataFrame,
      rates: Map[String, Double],
      defaultRate: Double = 0.0): DataFrame = {
    val lang = TextAnalysis.langId(docs)
      .select(col("doc_id"), col("predicted_lang"))
    val bucket = pmod(Dedup.hashAt(0, col("doc_id").cast("string")),
      lit(10000L))
    val rate = rates.foldRight(lit(defaultRate)) { case ((l, r), rest) =>
      when(col("predicted_lang") === l, lit(r)).otherwise(rest)
    }
    lang.where(bucket < rate * 10000)
  }
}
