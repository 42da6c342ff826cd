package graft.functions

import graft.SparkSpec
import graft.ops.Dedup

/** Unit spec for the native SimhashVote / Bigrams / CharNgrams kernels:
  * bit-parity with the declarative chains they replaced, codegen
  * participation, and edge shapes (short inputs, multi-byte code points).
  */
class TextKernelsSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  // range-backed so constant folding can't pre-evaluate before the
  // physical plan
  private def rangeDocs = spark.range(50).select(
    concat(lit("doc "), col("id"), lit(" über déjà ☃ w"), col("id"),
      lit(" tail")).alias("text"))

  test("SimhashVote matches the explode/groupBy vote") {
    val hashed = rangeDocs.select(
      monotonically_increasing_id().alias("doc_id"),
      Dedup.hashArray60(Dedup.tokens(col("text"))).alias("hashes"))
      .localCheckpoint()
    val native = hashed.select(col("doc_id"),
      SimhashVote.simhashVote(col("hashes"), 60).alias("s"))
    val exploded = hashed.select(col("doc_id"),
      explode_outer(col("hashes")).alias("h"))
    val votes = (0 until 60).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(1) * 2 - 1).alias(s"v$j"))
    val bitsExpr = (0 until 60)
      .map(j => when(col(s"v$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val legacy = exploded.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), bitsExpr.alias("s"))
    val n = native.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val l = legacy.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n === l)
    assert(n.values.forall(v => v >= 0 && v < (1L << 60)))
  }

  test("SimhashVote: empty array votes to 0; signature stage has no shuffle") {
    val out = spark.range(1)
      .select(SimhashVote.simhashVote(array().cast("array<long>")).alias("s"))
      .collect().head.getLong(0)
    assert(out === 0L)
    val plan = Dedup.simhash(rangeDocs
      .select(monotonically_increasing_id().alias("doc_id"), col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "simhash must be a pure projection")
  }

  test("Bigrams matches the concat_ws chain, incl. short docs") {
    val toks = spark.range(40).select(
      filter(split(
        when(col("id") % 4 === 0, lit(""))
          .when(col("id") % 4 === 1, lit("solo"))
          .otherwise(concat(lit("a b c d"), col("id"))), " "),
        w => length(w) > 0).alias("toks"))
      .localCheckpoint()
    val q = toks.select(
      Bigrams.wordBigrams(col("toks")).alias("native"),
      when(size(col("toks")) >= 2,
        transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ", element_at(col("toks"), i),
            element_at(col("toks"), i + 1))))
        .otherwise(array().cast("array<string>")).alias("chain"))
    q.collect().foreach(r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("CharNgrams matches the substr chain on multi-byte text") {
    val q = rangeDocs.select(
      CharNgrams.charNgrams(lower(col("text")), 3).alias("native"),
      when(length(lower(col("text"))) >= 3,
        transform(sequence(lit(1), length(lower(col("text"))) - 2),
          i => lower(col("text")).substr(i, lit(3))))
        .otherwise(array().cast("array<string>")).alias("chain"))
    q.collect().foreach(r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1)))
    // short-input guard
    val short = spark.range(1)
      .select(CharNgrams.charNgrams(lit("ab"), 3).alias("g"))
      .collect().head.getSeq[String](0)
    assert(short.isEmpty)
  }

  test("NgramProfileCounts matches CharNgrams+CountInSet on multi-byte text") {
    val profiles = Seq(
      Seq("the", "doc", "jà "), Seq("übe", "déj", " ☃ "), Seq("zzz"))
    val q = rangeDocs.select(
      NgramProfileCounts.ngramProfileCounts(lower(col("text")), 3, profiles)
        .alias("pc"),
      CharNgrams.charNgrams(lower(col("text")), 3).alias("tg"))
    q.collect().foreach { r =>
      val pc = r.getSeq[Int](0)
      val tg = r.getSeq[String](1)
      assert(pc.head === tg.size)
      profiles.zipWithIndex.foreach { case (prof, i) =>
        assert(pc(i + 1) === tg.count(prof.contains(_)),
          s"profile $i mismatch on '${tg.mkString}'")
      }
    }
    // short / null inputs: zero total, zero hits
    val edge = spark.range(1).select(
      NgramProfileCounts.ngramProfileCounts(lit("ab"), 3, profiles).alias("a"),
      NgramProfileCounts.ngramProfileCounts(
        lit(null).cast("string"), 3, profiles).alias("b"))
      .collect().head
    assert(edge.getSeq[Int](0) === Seq(0, 0, 0, 0))
    assert(edge.getSeq[Int](1) === Seq(0, 0, 0, 0))
  }

  test("CountInSet matches the filter/array_contains chain") {
    val vocab = Seq("the", "a", "of", "déjà")
    val toks = rangeDocs.select(Dedup.tokens(
      concat(col("text"), lit(" the of the déjà x"))).alias("toks"))
      .localCheckpoint()
    val q = toks.select(
      CountInSet.countInSet(col("toks"), vocab).alias("native"),
      size(filter(col("toks"), w => array_contains(typedlit(vocab), w)))
        .alias("chain"))
    q.collect().foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("MinhashAffine matches the per-member array_min chain") {
    val params = Dedup.affineParams(16)
    val hs = rangeDocs.select(
      Dedup.baseHash30Array(Dedup.tokens(col("text"))).alias("hs"))
      .localCheckpoint()
    val chain = array(params.map(p =>
      array_min(transform(col("hs"),
        h => pmod(h * p._1 + p._2, lit(Dedup.AffineMod))))): _*)
    val q = hs.select(
      MinhashAffine.minhashAffine(col("hs"), params, Dedup.AffineMod)
        .alias("native"),
      chain.alias("chain"))
    q.collect().foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    // empty input -> all-null signature, like array_min of an empty array
    val empty = spark.range(1).select(
      MinhashAffine.minhashAffine(
        array().cast("array<long>"), params.take(3), Dedup.AffineMod)
        .alias("sig")).collect().head.getSeq[Any](0)
    assert(empty.length === 3 && empty.forall(_ == null))
  }

  test("BucketWeightSum matches the transform/aggregate chain") {
    val weights = graft.ops.TextAnalysis.QualityScoreWeights
    val d = weights.length
    val hashed = rangeDocs.select(
      monotonically_increasing_id().alias("doc_id"),
      Dedup.hashArray60(Dedup.tokens(col("text"))).alias("hs"))
      .localCheckpoint()
    val native = hashed.select(col("doc_id"),
      BucketWeightSum.bucketWeightSum(col("hs"), weights).alias("s"))
    val wlit = array(weights.map(w => lit(w.toLong)): _*)
    val legacy = hashed.select(col("doc_id"),
      aggregate(col("hs"), lit(0L),
        (acc, h) => acc + element_at(wlit, pmod(h, lit(d)).cast("int") + 1))
        .alias("s"))
    val n = native.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val l = legacy.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n === l)
  }

  test("BucketWeightSum: empty and null arrays score 0; null elements skipped") {
    val out = spark.range(1).select(
      BucketWeightSum.bucketWeightSum(
        array().cast("array<long>"), Seq(5)).alias("a"),
      BucketWeightSum.bucketWeightSum(
        lit(null).cast("array<long>"), Seq(5)).alias("b"),
      BucketWeightSum.bucketWeightSum(
        array(lit(3L), lit(null).cast("long")), Seq(5)).alias("c"))
      .collect().head
    assert(out.getLong(0) === 0L && out.getLong(1) === 0L)
    assert(out.getLong(2) === 5L)
  }

  test("all four participate in whole-stage codegen") {
    val plan = rangeDocs.select(
      SimhashVote.simhashVote(
        Dedup.hashArray60(Dedup.tokens(col("text")))).alias("s"),
      Bigrams.wordBigrams(Dedup.tokens(col("text"))).alias("b"),
      CharNgrams.charNgrams(col("text")).alias("c"),
      BucketWeightSum.bucketWeightSum(
        Dedup.hashArray60(Dedup.tokens(col("text"))),
        graft.ops.TextAnalysis.QualityScoreWeights).alias("q"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"))
  }
}
