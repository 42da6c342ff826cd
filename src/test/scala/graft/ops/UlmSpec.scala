package graft.ops

import graft.SparkSpec
import graft.functions.{UlmSegment, UlmViterbi}
import org.apache.spark.sql.functions._

/** Spec for unigram-LM training and the native Viterbi segment/count
  * kernels. */
class UlmSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def table(vocab: (String, Long)*) =
    new UlmViterbi.Table(vocab.toArray)

  test("segment picks the min-cost path") {
    // 'ab' piece (cost 5) beats a|b (3+3=6); 'abc' absent → ab|c.
    val t = table("a" -> 3L, "b" -> 3L, "c" -> 3L, "ab" -> 5L)
    assert(UlmViterbi.segment("abc", t).toSeq === Seq("ab", "c"))
    assert(UlmViterbi.segment("ab", t).toSeq === Seq("ab"))
  }

  test("equal cost ties break by piece count, then seg string") {
    // 'aa' cost 6 == a|a cost 6 → fewer pieces wins.
    val t = table("a" -> 3L, "aa" -> 6L)
    assert(UlmViterbi.segment("aa", t).toSeq === Seq("aa"))
    // 'ab'+'c' = 6 == 'a'+'bc' = 6, both 2 pieces → 'a bc' < 'ab c'
    // lexicographically (space < 'b').
    val t2 = table("a" -> 3L, "b" -> 3L, "c" -> 3L, "ab" -> 3L, "bc" -> 3L)
    assert(UlmViterbi.segment("abc", t2).toSeq === Seq("a", "bc"))
  }

  test("out-of-vocabulary characters fall back to UNK single pieces") {
    val t = table("a" -> 3L)
    assert(UlmViterbi.segment("axa", t).toSeq === Seq("a", "x", "a"))
    // ...and the UNK path is never preferred over an in-vocab path.
    val t2 = table("a" -> 3L, "xa" -> 4L)
    assert(UlmViterbi.segment("axa", t2).toSeq === Seq("a", "xa"))
  }

  test("UlmSegment/UlmCount columns agree and handle null/empty") {
    val df = docs((1L, "the fast hash join"), (2L, ""), (3L, null))
      .select(col("doc_id"),
        UlmSegment.ulmSegment(Bpe.words(col("text")), Ulm.FixedVocab)
          .alias("ps"),
        UlmSegment.ulmCount(Bpe.words(col("text")), Ulm.FixedVocab)
          .alias("n"))
      .orderBy("doc_id").collect()
    val ps = df(0).getSeq[String](1)
    assert(df(0).getInt(2) === ps.length)
    assert(ps.mkString("") === "thefasthashjoin")
    // Whole-word pieces beat character spellings under the fixed costs.
    assert(ps.contains("the") && ps.contains("hash") && ps.contains("join"))
    assert(df(1).getSeq[String](1).isEmpty && df(1).getInt(2) === 0)
    assert(df(2).getSeq[String](1).isEmpty && df(2).getInt(2) === 0)
  }

  test("FixedVocab covers the full encode alphabet") {
    val singles = Ulm.FixedVocab.collect {
      case (p, _) if p.length == 1 => p.head
    }.toSet
    assert(('a' to 'z').forall(singles.contains))
  }

  test("train keeps all alphabet chars and only used multi-char pieces") {
    val pieces = Ulm.trainFromWordCounts(
      Seq("abab" -> 10L, "ab" -> 5L, "cd" -> 3L))
    val byPiece = pieces.map(p => p.piece -> p).toMap
    // Alphabet floor: every char of the corpus survives, even unused ones.
    assert(Set("a", "b", "c", "d").subsetOf(byPiece.keySet))
    // Multi-char survivors all carry usage; 'abab'/'ab' dominate.
    val multis = pieces.filter(_.piece.length >= 2)
    assert(multis.nonEmpty && multis.forall(_.freq > 0))
    assert(byPiece.contains("abab") && byPiece("abab").freq === 10L)
    // Scores are negative log-probs in micro-nats, monotone in freq.
    val sorted = pieces.sortBy(-_.freq)
    assert(sorted.head.scoreMicro > sorted.last.scoreMicro)
    assert(pieces.forall(_.scoreMicro < 0))
  }

  test("driver and distributed trainers produce identical vocabularies") {
    val d = docs(
      (1L, "the query scans the table and the hash join is fast"),
      (2L, "a sort merge join beats a hash join on sorted data"),
      (3L, "the scan filters rows before the join"))
    val a = Ulm.train(d).sortBy(_.piece)
    val b = Ulm.trainDistributed(d).sortBy(_.piece)
    assert(a === b)
  }

  test("segment equals brute-force enumeration under the oracle tiebreak " +
      "(seeded property sweep)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // Brute force: EVERY segmentation (the recursive-CTE oracle's walk),
    // best by (cost, np, seg) — the DP must match on all of them.
    def enumerate(w: String, costs: Map[String, Long]): Seq[(Long, Int, String)] = {
      def go(pos: Int): Seq[(Long, Int, List[String])] =
        if (pos == w.length) Seq((0L, 0, Nil))
        else (1 to math.min(4, w.length - pos)).flatMap { k =>
          val piece = w.substring(pos, pos + k)
          costs.get(piece) match {
            case Some(c) => go(pos + k).map { case (tc, np, ps) =>
              (tc + c, np + 1, piece :: ps)
            }
            case None => Seq.empty
          }
        }
      go(0).map { case (c, np, ps) => (c, np, ps.mkString(" ")) }
    }
    val genCase = for {
      wLen <- Gen.chooseNum(1, 10)
      w <- Gen.listOfN(wLen, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
      nPieces <- Gen.chooseNum(0, 12)
      pieces <- Gen.listOfN(nPieces, for {
        pLen <- Gen.chooseNum(2, 4)
        p <- Gen.listOfN(pLen, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
        c <- Gen.chooseNum(1L, 10000000L)
      } yield (p, c))
      charCosts <- Gen.listOfN(3, Gen.chooseNum(1L, 10000000L))
    } yield (w, Seq("a", "b", "c").zip(charCosts) ++ pieces)
    (1 to 200).foreach { i =>
      val (w, vocab) = genCase.pureApply(Gen.Parameters.default, Seed(i.toLong))
      // Duplicate pieces: keep the FIRST cost (Table.put overwrites with
      // the last — so dedupe the generated vocab up front, like a real
      // trained table which never repeats a piece).
      val dedup = vocab.groupBy(_._1).map { case (p, cs) => (p, cs.head._2) }.toSeq
      val got = UlmViterbi.segment(w, new UlmViterbi.Table(dedup.toArray))
      val want = enumerate(w, dedup.toMap)
        .minBy { case (c, np, seg) => (c, np, seg) }
      assert(got.mkString(" ") === want._3,
        s"seed $i word '$w' vocab $dedup: got ${got.toSeq}, want $want")
      assert(got.mkString("") === w) // pieces re-concatenate to the word
    }
  }

  test("compareWithBpe: exact totals and consistent ratios on a tiny corpus") {
    val d = docs((1L, "the query joins the table"), (2L, "a hash join"),
      (3L, ""))
    val r = Ulm.compareWithBpe(spark, d).head()
    assert(r.getAs[Long]("n_docs") === 3L)
    assert(r.getAs[Long]("n_words") === 8L)
    val bpe = r.getAs[Long]("bpe_tokens")
    val ulm = r.getAs[Long]("ulm_tokens")
    assert(bpe > 0L && ulm > 0L)
    assert(r.getAs[Double]("ulm_vs_bpe") ===
      BigDecimal(ulm.toDouble / bpe)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Int]("bpe_merges") === Bpe.NumMerges)
    assert(r.getAs[Int]("ulm_vocab") > 0)
  }

  test("tokenCountsTrained counts under the corpus-trained vocabulary") {
    val d = docs((1L, "aaa aaa"), (2L, "aaa"), (3L, ""))
    // 'aaa' dominates → becomes a piece → 1 token per word.
    val out = Ulm.tokenCountsTrained(spark, d)
      .orderBy("doc_id").collect()
    assert(out.map(_.getInt(1)).toSeq === Seq(2, 1, 0))
  }
}
