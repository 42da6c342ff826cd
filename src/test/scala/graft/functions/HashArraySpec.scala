package graft.functions

import graft.SparkSpec
import graft.ops.Dedup

/** Unit spec for the native HashArray expression: bit-parity with the
  * declarative md5 chain it replaces, codegen participation, mask
  * semantics, and null handling.
  */
class HashArraySpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private def docs = {
    import spark.implicits._
    Seq(
      "the quick brown fox",
      "über die brücke — déjà vu ☃ 漢字", // multi-byte UTF-8
      "",
      "a b a b a").toDF("text")
  }

  test("matches conv(substring(md5)) chain bit-for-bit (incl. non-ASCII)") {
    val toks = docs.select(Dedup.tokens(col("text")).alias("toks"))
    val out = toks.select(
      HashArray.hashArray(col("toks")).alias("native"),
      transform(col("toks"), w => Dedup.hashAt(0, w)).alias("chain"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("mask variant matches baseHash30 chain") {
    val toks = docs.select(Dedup.tokens(col("text")).alias("toks"))
    val out = toks.select(
      HashArray.hashArray(col("toks"), (1L << 30) - 1).alias("native"),
      transform(col("toks"), w => Dedup.baseHash30(w)).alias("chain"))
      .collect()
    out.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("participates in whole-stage codegen and matches eval there") {
    // range-backed (not a local Seq) so constant folding can't pre-evaluate
    // the expression before it reaches the physical plan
    val df = spark.range(100).select(
      split(concat(lit("w"), col("id"), lit(" x"), col("id")), " ")
        .alias("toks"))
    val q = df.select(HashArray.hashArray(col("toks")).alias("native"),
      transform(col("toks"), w => Dedup.hashAt(0, w)).alias("chain"))
    assert(q.queryExecution.executedPlan.toString.contains("*(1)"))
    q.collect().foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("values are 60-bit non-negative; empty array maps to empty array") {
    val rows = docs
      .select(HashArray.hashArray(Dedup.tokens(col("text"))).alias("hs"))
      .collect()
    rows.foreach { r =>
      r.getSeq[Long](0).foreach { v =>
        assert(v >= 0L && v < (1L << 60))
      }
    }
    assert(rows.exists(_.getSeq[Long](0).isEmpty)) // the "" document
  }

  test("null array yields null; null element yields null element") {
    val out = docs.limit(1).select(
      HashArray.hashArray(lit(null).cast("array<string>")).alias("n"),
      HashArray.hashArray(array(lit("x"), lit(null).cast("string")))
        .alias("e"))
      .collect().head
    assert(out.isNullAt(0))
    val elems = out.getSeq[Any](1)
    assert(elems.head != null && elems(1) == null)
  }

  test("type mismatch is rejected at analysis time") {
    val ex = intercept[Exception] {
      docs.select(HashArray.hashArray(col("text"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("hash_family60") ||
      ex.getMessage.toLowerCase.contains("datatype_mismatch") ||
      ex.getMessage.toLowerCase.contains("cannot resolve"))
  }
}
