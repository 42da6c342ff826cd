package graft.ops

import graft.SparkSpec
import graft.functions.{BpeEncode, BpeMerge, MergePair}
import org.apache.spark.sql.functions._

/** Spec for BPE training and the native encode/count/merge kernels. */
class BpeSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("mergeOnce rewrites non-overlapping occurrences left-to-right") {
    assert(BpeMerge.mergeOnce(Array("a", "a", "a"), "a", "a").toSeq ===
      Seq("aa", "a")) // scan resumes AFTER a merge, like string replace
    assert(BpeMerge.mergeOnce(Array("a", "b", "a", "b"), "a", "b").toSeq ===
      Seq("ab", "ab"))
    assert(BpeMerge.mergeOnce(Array("x"), "a", "b").toSeq === Seq("x"))
    assert(BpeMerge.mergeOnce(Array[String](), "a", "b").toSeq === Seq.empty)
  }

  test("codePointSymbols is surrogate-pair safe") {
    assert(BpeMerge.codePointSymbols("ab").toSeq === Seq("a", "b"))
    val astral = "a😀b" // a, 😀 (astral plane), b
    assert(BpeMerge.codePointSymbols(astral).toSeq ===
      Seq("a", "😀", "b"))
  }

  test("encodeWord applies merges in table order, chaining") {
    val merges = Array("q" -> "u", "qu" -> "e", "que" -> "r", "quer" -> "y")
    assert(BpeMerge.encodeWord("query", merges).toSeq === Seq("query"))
    assert(BpeMerge.encodeWord("queue", merges).toSeq ===
      Seq("que", "u", "e")) // 'que' merged, no rule for (que,u)
  }

  test("BpeEncode/BpeCount columns agree and handle null/empty") {
    val df = docs((1L, "the queen queried"), (2L, ""), (3L, null))
      .select(col("doc_id"),
        BpeEncode.bpeEncode(Bpe.words(col("text")), Bpe.FixedMerges)
          .alias("syms"),
        BpeEncode.bpeCount(Bpe.words(col("text")), Bpe.FixedMerges)
          .alias("n"))
      .orderBy("doc_id").collect()
    val syms = df(0).getSeq[String](1)
    assert(df(0).getInt(2) === syms.length)
    assert(syms.nonEmpty && syms.mkString("") === "thequeenqueried")
    assert(df(1).getSeq[String](1).isEmpty && df(1).getInt(2) === 0)
    assert(df(2).getSeq[String](1).isEmpty && df(2).getInt(2) === 0)
  }

  test("MergePair expression matches BpeMerge.mergeOnce") {
    val df = docs((1L, "unused"))
      .select(MergePair.mergePair(
        split(lit("a a b a a"), " "), "a", "a").alias("m"))
      .collect()
    assert(df(0).getSeq[String](0) === Seq("aa", "b", "aa"))
  }

  test("train learns the expected merges on a tiny corpus") {
    // 'abab' ×3, 'ab' ×2. Round 1: (a,b) counts 2·3+1·2=8 (ALL adjacent
    // positions), (b,a) counts 3. Round 2: [ab,ab] → (ab,ab) counts 3.
    // Round 3: no pairs left → early stop at 2 rules.
    val rules = Bpe.train(docs(
      (1L, "abab abab abab ab ab")), vocabCap = 10, numMerges = 3)
    assert(rules.map(r => (r.rank, r.a, r.b, r.merged, r.count)) === Seq(
      (1, "a", "b", "ab", 8L),
      (2, "ab", "ab", "abab", 3L)))
  }

  test("train is deterministic and tie-breaks by (count desc, a, b)") {
    // 'xy' and 'xz' both appear twice: counts tie at 2; (x,y) < (x,z).
    val rules = Bpe.train(docs((1L, "xy xy xz xz")), 10, 1)
    assert(rules.map(r => (r.a, r.b, r.count)) === Seq(("x", "y", 2L)))
    assert(Bpe.train(docs((1L, "xy xy xz xz")), 10, 1) === rules)
  }

  test("trainDistributed learns the identical merge table as train") {
    val corpus = docs(
      (1L, "abab abab abab ab ab"), (2L, "query the queue quickly"),
      (3L, "the queen queried the quiet quay"))
    val driver = Bpe.train(corpus, vocabCap = 20, numMerges = 6)
    val dist = Bpe.trainDistributed(corpus, vocabCap = 20, numMerges = 6)
    assert(dist === driver)
  }

  test("train stops early when the vocabulary has no pairs left") {
    val rules = Bpe.train(docs((1L, "ab ab")), 10, numMerges = 5)
    assert(rules.length === 1) // one merge exhausts the 2-char vocab
    assert(rules.head.merged === "ab")
  }

  test("encode memo is merge-table-scoped — no cross-table poisoning") {
    // Same word, same thread, two tables: the per-thread memo must key on
    // the table, or the second encode would return the first's symbols.
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val toks = new GenericArrayData(
      Array[Any](UTF8String.fromString("the")))
    val merged = Array("t" -> "h", "th" -> "e")
    assert(BpeEncode.encode(toks, merged).numElements() === 1)
    assert(BpeEncode.encode(toks, Array.empty).numElements() === 3)
    assert(BpeEncode.encode(toks, merged).numElements() === 1)
  }

  test("tokenCountsTrained encodes under the corpus's own merge table") {
    val corpus = docs((1L, "abab abab abab"), (2L, "ab ab ab"))
    // Training learns (a,b) then (ab,ab): abab → 1 symbol, ab → 1 symbol.
    val out = Bpe.tokenCountsTrained(spark, corpus)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((1L, 3), (2L, 3)))
  }

  test("mixEpochsBpe realizes integer epoch targets over BPE budgets") {
    import spark.implicits._
    // 'the' (en marker) ×12 per doc → predicted_lang = en; each doc
    // BPE-encodes 'the' to ONE symbol under FixedMerges (t h → th, th e
    // → the), so bpe_tokens = 12 and lang_tokens = 48 across 4 docs.
    val corpus = docs((1L to 4L).map(i => (i, Seq.fill(12)("the").mkString(" "))): _*)
    val out = Bpe.mixEpochsBpe(corpus, Map("en" -> 96L))
      .orderBy("doc_id").collect()
    assert(out.length === 4)
    assert(out.forall(_.getString(1) === "en"))
    assert(out.forall(_.getInt(2) === 12))
    // target 96 = exactly 2 epochs of the 48-token stratum, no remainder.
    assert(out.forall(_.getInt(3) === 2))
  }

  test("chunkByBpe cuts at word boundaries on the running BPE budget") {
    // 'the' → 1 symbol; 'queen' → 4 (qu,e,e,n). Budget 3:
    // words   the the queen the   cum-before 0 1 2 6
    // chunks  0   0   0     2     (queen straddles: id jumps 0 → 2)
    val out = Bpe.chunkByBpe(
      docs((1L, "the the queen the"), (2L, ""), (3L, null)),
      Bpe.FixedMerges, budget = 3)
      .orderBy("doc_id", "chunk_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
      r.getString(3))).toSeq === Seq(
      (1L, 0, 6, "the the queen"),
      (1L, 2, 1, "the")))
  }

  test("packByBpe chops running BPE-token sums at the budget per bucket") {
    val out = Bpe.packByBpe(
      docs((1L to 20L).map(i => (i, "query the queue")): _*),
      Bpe.FixedMerges, budget = 10, buckets = 2)
      .orderBy("bucket", "doc_id").collect()
    assert(out.length === 20)
    // Every doc encodes to the same count; packs are contiguous per bucket
    // and pack_id never decreases within a bucket.
    out.groupBy(_.getInt(1)).values.foreach { rows =>
      val packs = rows.map(_.getInt(2)).toSeq
      assert(packs === packs.sorted)
      assert(packs.head === 0)
    }
  }

  // ── Byte-level (GPT-2) family ───────────────────────────────────────

  test("ByteUnicodeMap pins the published bytes_to_unicode table") {
    val t = graft.functions.ByteUnicodeMap.table
    assert(t.length === 256)
    assert(t.distinct.length === 256) // bijection
    // Printable ranges map to themselves.
    (33 to 126) ++ (161 to 172) ++ (174 to 255) foreach { b =>
      assert(t(b) === b.toChar, s"byte $b should self-map")
    }
    // The 68 non-printables take 256+n in byte order: space (0x20) is the
    // 33rd (n=32) → U+0120 'Ġ'; newline (0x0A) → U+010A 'Ċ'.
    assert(t(' '.toInt) === 'Ġ')
    assert(t('\n'.toInt) === 'Ċ')
    assert(t(0) === 0x100.toChar)
    assert(t(173) === (256 + 67).toChar) // soft hyphen is the last one
  }

  test("byteMapped falls back to one symbol per UTF-8 byte") {
    import spark.implicits._
    // '©' is U+00A9 = 0xC2 0xA9 in UTF-8: 0xC2 (194, printable range)
    // self-maps, 0xA9 (169) self-maps — two chars out.
    val out = Seq(("a ©b")).toDF("text")
      .select(Bpe.byteMapped(col("text"))).collect().head.getString(0)
    assert(out === "aĠ" + 0xC2.toChar + 0xA9.toChar + "b")
  }

  test("bytePretokens splits like GPT-2 on single-spaced text") {
    import spark.implicits._
    val out = Seq(("the row can't stop 42 times"))
      .toDF("text").select(Bpe.bytePretokens(col("text")))
      .collect().head.getSeq[String](0)
    assert(out === Seq("the", "Ġrow", "Ġcan", "'t", "Ġstop", "Ġ42",
      "Ġtimes"))
  }

  test("trainBytes learns Ġ-absorbing merges on a tiny corpus") {
    val d = docs((1L, "the cat the cat the"), (2L, "the cat"))
    val rules = Bpe.trainBytes(d, numMerges = 4)
    // Pretokens: "the"×2(doc starts), "Ġcat"×3, "Ġthe"×3.
    // Round 1 pairs: (Ġ,c)3 (c,a)3 (a,t)3 (Ġ,t)3 (t,h)5 (h,e)5 → (h,e)
    // wait: (t,h) appears in the×2 + Ġthe×3 = 5; (h,e) same 5; tie → a
    // asc: (h,e) vs (t,h): 'h' < 't' → (h,e) wins.
    assert(rules.head.a === "h" && rules.head.b === "e")
    assert(rules.map(r => (r.a, r.b)) ===
      Bpe.trainBytesDistributed(d, numMerges = 4).map(r => (r.a, r.b)))
  }

  test("encodeSymbolsBytes applies fixed byte merges with chaining") {
    val out = Bpe.encodeSymbolsBytes(docs((1L, "the row agg")))
      .collect().head.getString(1)
    // "the" (no leading Ġ) → t+h→th, th+e→the (Ġ-merge can't fire);
    // "Ġrow": r+o→ro, ro+w→row, Ġ+row→Ġrow; "Ġagg" likewise.
    assert(out === "the Ġrow Ġagg")
  }

  test("tokenCountsBytes equals the materialized symbol count") {
    val d = docs((1L, "the row agg scan a"), (2L, ""), (3L, null))
    val syms = Bpe.encodeSymbolsBytes(d).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")
        .count(_.nonEmpty)).toMap
    Bpe.tokenCountsBytes(d).collect().foreach { r =>
      assert(r.getInt(1) === syms(r.getLong(0)))
    }
  }
}
