package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit coverage for the published rule-sets on inputs the synthetic
  * corpus cannot produce: bullet/ellipsis lines, terminal punctuation,
  * lorem-ipsum/code markers, exactly-computable entropies. The oracle
  * queries pin the corpus-scale behavior; these pin the rule semantics.
  */
class TextRulesSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("gopher: bullet and ellipsis line ratios read real lines") {
    val d = docs(
      1L -> "- first bullet\n- second bullet\nplain line ends here...\nanother plain",
      2L -> "no list formatting at all")
    val r = TextRules.gopherReport(d).orderBy("doc_id").collect()
    val r1 = r(0)
    assert(r1.getAs[Double]("bullet_line_ratio") === 0.5) // 2 of 4 lines
    assert(r1.getAs[Double]("ellipsis_line_ratio") === 0.25) // 1 of 4
    assert(r(1).getAs[Double]("bullet_line_ratio") === 0.0)
  }

  test("gopher: stop-word hits are DISTINCT words present") {
    val d = docs(1L -> "the the the the", 2L -> "the cat sat with the dog and ran")
    val r = TextRules.gopherReport(d).orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("stop_hits") === 1) // 'the' once, not 4
    assert(r(1).getAs[Int]("stop_hits") === 3) // the, with, and
    assert(!r(0).getAs[Boolean]("ok_stops"))
    assert(r(1).getAs[Boolean]("ok_stops"))
  }

  test("gopher: symbol ratio counts # and ellipses against words") {
    val d = docs(1L -> "alpha # beta ## gamma ... delta")
    val r = TextRules.gopherReport(d).head()
    // 3 '#' chars + 1 '...' over 7 whitespace tokens.
    assert(r.getAs[Double]("symbol_ratio") === math.rint(4.0 / 7 * 1e6) / 1e6)
    assert(!r.getAs[Boolean]("ok_symbols"))
  }

  test("gopher: word-count and alpha rules") {
    val fifty = Seq.fill(50)("word").mkString(" ")
    val d = docs(1L -> fifty, 2L -> "1 2 3 4 5 6 7 8 9 10")
    val r = TextRules.gopherReport(d).orderBy("doc_id").collect()
    assert(r(0).getAs[Boolean]("ok_words"))
    assert(r(0).getAs[Double]("alpha_ratio") === 1.0)
    assert(!r(1).getAs[Boolean]("ok_words")) // 10 < 50
    assert(r(1).getAs[Double]("alpha_ratio") === 0.0)
    assert(!r(1).getAs[Boolean]("ok_alpha"))
  }

  test("c4: strict keeps only punctuated >=5-word lines; relaxed drops punct rule") {
    val d = docs(1L ->
      ("this line has five words.\n" + // strict + relaxed
        "short line.\n" + // punct but 2 words → neither
        "five words but no punctuation here\n" + // relaxed only
        "ends with a question mark ok?")) // strict + relaxed
    val r = TextRules.c4Filters(d).head()
    assert(r.getAs[Int]("n_lines") === 4)
    assert(r.getAs[Int]("n_kept_strict") === 2)
    assert(r.getAs[Int]("n_kept_relaxed") === 3)
    assert(r.getAs[String]("clean_text").split("\n").length === 3)
    assert(r.getAs[Int]("n_sentences") === 3)
    assert(r.getAs[Boolean]("ok_sentences"))
  }

  test("c4: lorem ipsum and brace docs flagged, doc_pass false") {
    val d = docs(
      1L -> "Some Lorem Ipsum filler text here.",
      2L -> "function f() { return 1; }",
      3L -> "a perfectly normal document.")
    val r = TextRules.c4Filters(d).orderBy("doc_id").collect()
    assert(r(0).getAs[Boolean]("has_lorem") && !r(0).getAs[Boolean]("doc_pass"))
    assert(r(1).getAs[Boolean]("has_brace") && !r(1).getAs[Boolean]("doc_pass"))
    assert(r(2).getAs[Boolean]("doc_pass"))
  }

  test("char entropy: closed-form values") {
    val d = docs(
      1L -> "aaaa", // one symbol → H = 0
      2L -> "aabb", // two equal symbols → H = 1 bit
      3L -> "", // empty → 0 by contract
      4L -> "abcd") // four equal → 2 bits
    val r = TextRules.charEntropy(d).orderBy("doc_id").collect()
    assert(r(0).getAs[Double]("char_entropy") === 0.0)
    assert(r(1).getAs[Double]("char_entropy") === 1.0)
    assert(r(2).getAs[Double]("char_entropy") === 0.0)
    assert(r(2).getAs[Int]("n_chars") === 0)
    assert(r(3).getAs[Double]("char_entropy") === 2.0)
  }

  test("char entropy: uppercase folds, unknown chars pool into one bucket") {
    // "AA§§" lowers to "aa§§": counts {a:2, other:2} → H = 1 bit.
    val r = TextRules.charEntropy(docs(1L -> "AA§§")).head()
    assert(r.getAs[Double]("char_entropy") === 1.0)
  }

  test("pmi: collocation outranks frequent-but-independent pair") {
    // 'san francisco' always adjacent; 'the cat' co-occurs but 'the' is
    // everywhere, diluting its PMI.
    val phrase = Seq.fill(6)("san francisco").mkString(" ")
    val noise = Seq.fill(6)("the cat the dog the bird").mkString(" ")
    val r = TextRules.pmiBigrams(docs(1L -> phrase, 2L -> noise), minCount = 5, k = 3)
      .collect()
    assert(r.nonEmpty)
    val top = r.head
    assert(top.getAs[String]("w1") === "san" || top.getAs[String]("w2") === "francisco")
    // Every emitted pair respects the support floor.
    assert(r.forall(_.getAs[Long]("c_pair") >= 5))
  }

  test("pmi: deterministic ordering and k-bound") {
    val d = docs(1L -> Seq.fill(10)("a b c d").mkString(" "))
    val r1 = TextRules.pmiBigrams(d, minCount = 2, k = 2).collect()
    val r2 = TextRules.pmiBigrams(d, minCount = 2, k = 2).collect()
    assert(r1.toSeq === r2.toSeq)
    assert(r1.length <= 2)
  }

  test("encoding screen: replacement chars, control chars, mojibake counted") {
    val d = docs(
      1L -> "caf\u00c3\u00a9 and caf\u00c3\u00a9",  // "cafÃ©" twice
      2L -> "bad\ufffdbyte\ufffd",                     // two U+FFFD
      3L -> "ctl\u0001\u0002\u0007end",               // three C0 controls
      4L -> "perfectly clean ascii text")
    val r = TextRules.encodingScreen(d).orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_mojibake") === 2L)
    assert(r(0).getAs[Boolean]("encoding_suspect"))
    assert(r(1).getAs[Long]("n_replacement") === 2L)
    assert(r(1).getAs[Boolean]("encoding_suspect"))
    assert(r(2).getAs[Long]("n_control") === 3L)
    assert(r(2).getAs[Boolean]("encoding_suspect"))
    assert(r(3).getAs[Long]("n_replacement") === 0L)
    assert(r(3).getAs[Long]("n_control") === 0L)
    assert(r(3).getAs[Long]("n_mojibake") === 0L)
    assert(r(3).getAs[Double]("ascii_ratio") === 1.0)
    assert(!r(3).getAs[Boolean]("encoding_suspect"))
  }

  test("encoding screen: tab/newline/CR are formatting, not control noise") {
    val r = TextRules.encodingScreen(
      docs(1L -> "line one\nline two\ttabbed\r")).head()
    assert(r.getAs[Long]("n_control") === 0L)
    assert(!r.getAs[Boolean]("encoding_suspect"))
  }

  test("encoding screen: smart-quote decay and NBSP artifacts flag") {
    // U+2019's UTF-8 bytes (E2 80 99) read as CP-1252 -> "\u00e2\u20ac\u2122"
    // shapes; every variant leads with the "\u00e2\u20ac" digram. NBSP's
    // bytes (C2 A0) decay to "\u00c2 "-like pairs.
    val r = TextRules.encodingScreen(
      docs(1L -> "it\u00e2\u20ac\u0099s here\u00c2 now")).head()
    assert(r.getAs[Long]("n_mojibake") === 2L)
    assert(r.getAs[Boolean]("encoding_suspect"))
  }

  test("compressionSignal: repetition compresses, noise does not; " +
      "null/empty texts stay visible; audit invariants hold") {
    import spark.implicits._
    val rep = "spark spark spark " * 40 // 720 chars of pure repetition
    val noisy = (1 to 120).map(i => (i * 2654435761L % 100000).toString)
      .mkString(" ") // ~700 chars of digit noise
    val df = Seq((1L, rep), (2L, noisy), (3L, ""), (4L, null: String))
      .toDF("doc_id", "text")
    val out = TextRules.compressionSignal(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val rr = out(1L).getAs[Double]("compression_ratio")
    val nr = out(2L).getAs[Double]("compression_ratio")
    assert(rr < 0.1, s"repetition should compress hard, ratio $rr")
    assert(nr > rr * 3, s"noise must compress far worse: $nr vs $rr")
    // Empty/null text: visible rows, positive deflate size (zlib header),
    // ratio guarded by the n_bytes floor.
    assert(out(3L).getAs[Int]("deflate_bytes") > 0)
    assert(out(4L).getAs[Int]("n_bytes") === 0)
    val audit = TextRules.compressionAudit(df).head()
    assert(audit.getAs[Long]("n_docs") === 4L)
    assert(audit.getAs[Long]("n_positive") === 4L)
    assert(audit.getAs[Long]("n_long_docs") ===
      audit.getAs[Long]("n_long_bounded"))
    assert(audit.getAs[Boolean]("repetition_compresses_better"))
  }
}
