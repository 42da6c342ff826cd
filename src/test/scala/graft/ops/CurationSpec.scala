package graft.ops

import graft.SparkSpec

/** Spec for the corpus-curation composite (gate ∧ keeper + annotations). */
class CurationSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  // Both pass the quality gate: ≥64 chars, ≥10 tokens, few stopwords,
  // no punctuation, short words.
  private val good1 = "the quick brown fox jumps over the lazy dog while " +
    "autumn winds carry fallen leaves across quiet village streets"
  private val good2 = "a storm gathered beyond the ridge and the hikers " +
    "walked slowly toward shelter under heavy gray skies that evening"

  test("keepers keep the min doc_id per near-dup cluster and all singletons") {
    val out = Curation.keepers(docs(
      (1L, good1), (2L, good1), (3L, good2), (4L, "short")))
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 3L, 4L)) // 2 is the dup of 1; 4 keeps itself
  }

  test("sampleByLanguage: deterministic, nested across rates, rate-exact at 0 and 1") {
    val corpus = docs((1L to 200L).map(i => (i, good1)): _*) // all 'en'
    def ids(rates: Map[String, Double], dflt: Double = 0.0): Set[Long] =
      Curation.sampleByLanguage(corpus, rates, dflt)
        .collect().map(_.getLong(0)).toSet
    assert(ids(Map("en" -> 1.0)) === (1L to 200L).toSet) // rate 1 keeps all
    assert(ids(Map("en" -> 0.0)) === Set.empty)          // rate 0 drops all
    val half = ids(Map("en" -> 0.5))
    assert(half === ids(Map("en" -> 0.5)))               // no RNG: stable
    assert(half.subsetOf(ids(Map("en" -> 0.8))))         // samples nest
    // Hash buckets are near-uniform: 0.5 keeps roughly half.
    assert(half.size > 60 && half.size < 140, s"got ${half.size}/200")
  }

  test("packSequences chops the running token stream at the budget") {
    // One bucket → one deterministic stream ordered by doc_id; 4-token
    // docs against a 10-token budget: starts at 0,4,8,12,16 → packs
    // 0,0,0,1,1.
    val corpus = docs((1L to 5L).map(i => (i, "a b c d")): _*)
    val out = Curation.packSequences(corpus, budget = 10, buckets = 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(out === Map(
      1L -> ((0, 0, 4)), 2L -> ((0, 0, 4)), 3L -> ((0, 0, 4)),
      4L -> ((0, 1, 4)), 5L -> ((0, 1, 4))))
  }

  test("contamination flags docs sharing rare n-grams with the benchmark") {
    import org.apache.spark.sql.functions.col
    val bench = "zebra quantum falcon orbits the crimson nebula " +
      "beyond andromeda tonight"
    val leaked = bench + " exactly" // shares all 9 benchmark bigrams
    val out = Curation.contamination(
      docs((100L, bench), (1L, leaked), (2L, good2)),
      col("doc_id") % 100 === 0, minShared = 3, dfCap = 10)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 100L))) // only the leak is flagged; good2 is clean
    assert(out.head.getInt(2) === 9)
  }

  test("contamination: empty benchmark or no rare overlap yields no rows") {
    import org.apache.spark.sql.functions.col
    // No doc id divisible by 100 → benchmark side is empty.
    val noBench = Curation.contamination(
      docs((1L, good1), (2L, good2)), col("doc_id") % 100 === 0)
    assert(noBench.count() === 0)
    // Benchmark exists but shares no grams with the corpus side.
    val disjoint = Curation.contamination(
      docs((100L, good1), (1L, good2)), col("doc_id") % 100 === 0)
    assert(disjoint.count() === 0)
  }

  test("writeCurated lays out language partitions that prune on read") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-curated")
    Curation.writeCurated(
      Curation.curate(docs((1L, good1), (2L, good1), (3L, good2))),
      dir.toString)
    // Directory layout is one partition per language...
    assert(new java.io.File(s"$dir/predicted_lang=en").isDirectory)
    // ...and a one-language read is partition-pruned at the scan.
    val scan = spark.read.parquet(dir.toString)
      .where(col("predicted_lang") === "en")
      .queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan")).get
    assert(scan.contains("PartitionFilters: [isnotnull(predicted_lang"),
      s"partition filter missing:\n$scan")
  }

  test("curate = gate-passing cluster keepers with language and tokens") {
    val rows = Curation.curate(docs(
      (1L, good1), (2L, good1), (3L, good2), (4L, "short")))
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("predicted_lang"), r.getAs[Int]("ws_tokens")))
    assert(rows.map(_._1).toSet === Set(1L, 3L)) // 2 = dup, 4 = too_short
    assert(rows.forall(_._2 == "en"))
    assert(rows.forall(_._3 >= 10))
  }
}
