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
