package graft.ops

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.functions.{UlmSegment, UlmViterbi}

/** Unigram-LM tokenizer (SentencePiece's unigram model, Kudo 2018,
  * arXiv:1804.10959) — the second production tokenizer family next to
  * [[Bpe]]: a piece VOCABULARY with per-piece scores, trained by an
  * EM-style segment/count/prune loop, encoded by Viterbi max-likelihood
  * segmentation (here: min-cost, in integer micro-nats).
  *
  * Simplifications vs full SentencePiece, chosen so every training round
  * is replayable by a DuckDB oracle and bit-deterministic cross-engine:
  *   - hard (Viterbi) EM instead of full lattice forward-backward: the
  *     E-step counts pieces of the single best segmentation per word,
  *     weighted by word frequency;
  *   - add-one smoothing over the kept vocabulary for piece probabilities
  *     (keeps zero-usage alphabet characters finite — Kudo keeps
  *     characters for coverage; we do the same with a count floor);
  *   - pruning keeps ALL single characters plus the top-[[KeepCap]]
  *     used multi-char pieces per round (count desc, piece asc), instead
  *     of the likelihood-loss ranking.
  * Costs are `-round(ln(p)·10⁶)` BIGINTs, so Viterbi path comparison is
  * exact integer arithmetic on both engines; the only floating-point step
  * is one `ln` per piece per round, rounded to the micro-nat (the same
  * 6-dp discipline as the GD trainer in [[QualityModel]]).
  *
  * Architecture, sized for 100 TB exactly like [[Bpe]]: training never
  * iterates the corpus. ONE distributed pass computes word frequencies;
  * every later stage is bounded — the driver loop sees at most
  * [[VocabCap]] words and ~([[SeedCap]] + alphabet) pieces. The
  * distributed twin ([[trainDistributed]]) keeps even the word table on
  * executors (seed substring counts and per-round usage are Spark jobs;
  * only vocabulary-bounded aggregates reach the driver), which is the
  * shape that carries to corpora whose word table itself is large.
  * Encoding is a codegen'd per-row kernel ([[graft.functions.UlmSegment]])
  * with a Zipf-friendly per-thread word memo — no shuffle, no UDF.
  */
object Ulm {

  /** Training word-table bound (top-V by frequency) — same role and size
    * discipline as [[Bpe.VocabCap]]. */
  val VocabCap = 300

  /** Longest candidate piece enumerated at seeding. */
  val MaxPieceLen = 4

  /** Multi-char seed pieces kept from the substring-frequency table. */
  val SeedCap = 120

  /** Multi-char pieces kept per EM prune (single chars always survive). */
  val KeepCap = 60

  /** EM segment/count/prune rounds. */
  val EmRounds = 3

  /** One trained piece: final usage count and log-probability score in
    * micro-nats (negative; encode cost = -scoreMicro). */
  final case class Piece(piece: String, freq: Long, scoreMicro: Long)

  /** `round(ln((cnt+1)/total)·10⁶)` with away-from-zero ties — DuckDB's
    * `round()` semantics (HALF_UP in java.math terms). `total` is an
    * integer-valued double (sum of integer counts), so both engines
    * compute `ln` on bit-identical inputs. */
  def scoreMicro(cnt: Long, total: Double): Long =
    BigDecimal(math.log((cnt + 1.0) / total) * 1e6)
      .setScale(0, RoundingMode.HALF_UP).toLongExact

  private def costsOf(vocab: Seq[(String, Long)]): Seq[(String, Long)] = {
    val total = vocab.iterator.map(_._2 + 1.0).sum
    vocab.map { case (p, c) => (p, -scoreMicro(c, total)) }
  }

  /** One EM prune: all alphabet chars (usage-counted, zero-floored) plus
    * the top-[[KeepCap]] used multi-char pieces by (count desc, piece). */
  private def prune(
      chars: Seq[String], usage: collection.Map[String, Long],
      keepCap: Int): Seq[(String, Long)] = {
    val kept = usage.iterator
      .filter { case (p, _) => p.length >= 2 }
      .toSeq.sortBy { case (p, c) => (-c, p) }
      .take(keepCap)
    chars.map(ch => ch -> usage.getOrElse(ch, 0L)) ++ kept
  }

  /** Train on a bounded in-memory word-frequency table (the shape both
    * trainers reduce to; exposed for spec-level corpora). */
  def trainFromWordCounts(
      words: Seq[(String, Long)],
      seedCap: Int = SeedCap,
      keepCap: Int = KeepCap,
      emRounds: Int = EmRounds): Seq[Piece] = {
    require(seedCap > 0 && keepCap > 0 && emRounds > 0,
      "ULM training caps and round count must be positive")
    // Seed: substring frequencies, overlapping occurrences, word-weighted.
    val seedCnt = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, c) =>
      var k = 1
      while (k <= math.min(MaxPieceLen, w.length)) {
        var i = 0
        while (i + k <= w.length) {
          val p = w.substring(i, i + k)
          seedCnt.update(p, seedCnt.getOrElse(p, 0L) + c)
          i += 1
        }
        k += 1
      }
    }
    val chars = seedCnt.keysIterator.filter(_.length == 1).toSeq.sorted
    val seedMultis = seedCnt.iterator
      .filter { case (p, _) => p.length >= 2 }
      .toSeq.sortBy { case (p, c) => (-c, p) }
      .take(seedCap)
    var vocab: Seq[(String, Long)] =
      chars.map(ch => ch -> seedCnt(ch)) ++ seedMultis

    var r = 0
    while (r < emRounds) {
      val table = new UlmViterbi.Table(costsOf(vocab).toArray)
      val usage = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (w, c) =>
        UlmViterbi.segment(w, table).foreach { p =>
          usage.update(p, usage.getOrElse(p, 0L) + c)
        }
      }
      vocab = prune(chars, usage, keepCap)
      r += 1
    }
    val total = vocab.iterator.map(_._2 + 1.0).sum
    vocab.map { case (p, c) => Piece(p, c, scoreMicro(c, total)) }
  }

  /** Train over a corpus: ONE distributed word-count pass, then the
    * bounded driver loop ([[trainFromWordCounts]]). The collect is the
    * top-[[VocabCap]] frequency table ONLY, never documents. */
  def train(docs: DataFrame, vocabCap: Int = VocabCap): Seq[Piece] = {
    require(vocabCap > 0, s"vocab cap must be positive, got $vocabCap")
    val top = Bpe.wordCounts(docs)
      .orderBy(col("cnt").desc, col("word"))
      .limit(vocabCap)
      .collect()
    require(top.length <= vocabCap, "top-V collect exceeded its bound")
    trainFromWordCounts(top.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  /** [[train]]'s loop with the WORD TABLE kept distributed — the
    * architecture for corpora whose vocabulary is itself too large to
    * collect: seed substring counts are a Spark job (explode → map-side-
    * combined sum), each E-step segments the word table with the codegen'd
    * kernel and aggregates usage distributed, and only VOCABULARY-bounded
    * frames ever reach the driver (alphabet, top-seedCap pieces, per-round
    * usage ≤ |vocab|). Same seed/score/prune arithmetic as [[train]] —
    * `corpus_ulm_train_dist` checks against the SAME oracle, so the two
    * trainers cannot drift (the Bpe.trainDistributed pattern). */
  def trainDistributed(
      docs: DataFrame,
      vocabCap: Int = VocabCap,
      seedCap: Int = SeedCap,
      keepCap: Int = KeepCap,
      emRounds: Int = EmRounds): Seq[Piece] = {
    require(vocabCap > 0 && seedCap > 0 && keepCap > 0 && emRounds > 0,
      "ULM training caps and round count must be positive")
    val wc = Materialize(Bpe.wordCounts(docs)
      .orderBy(col("cnt").desc, col("word"))
      .limit(vocabCap))
    // All substrings of length 1..MaxPieceLen, inside the row (flatten of
    // nested transforms — zero shuffles before the piece aggregation).
    val subs = wc
      .select(explode(expr(
        s"""flatten(transform(sequence(1, least(length(word), $MaxPieceLen)),
           |  k -> transform(sequence(1, length(word) - k + 1),
           |         i -> substring(word, i, k))))""".stripMargin))
        .alias("piece"), col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).alias("cnt"))
    val charRows = subs.where(length(col("piece")) === 1)
      .orderBy(col("piece")).collect()
    require(charRows.length <= 4096,
      s"alphabet collect unexpectedly large: ${charRows.length}")
    val chars = charRows.map(_.getString(0)).toSeq
    val seedMultis = subs.where(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(seedCap)
      .collect()
    var vocab: Seq[(String, Long)] =
      charRows.map(r => (r.getString(0), r.getLong(1))).toSeq ++
        seedMultis.map(r => (r.getString(0), r.getLong(1)))

    var r = 0
    while (r < emRounds) {
      val usageRows = wc
        .select(explode(
          UlmSegment.ulmSegment(array(col("word")), costsOf(vocab)))
          .alias("piece"), col("cnt"))
        .groupBy(col("piece")).agg(sum(col("cnt")).alias("cnt"))
        .collect()
      require(usageRows.length <= vocab.size,
        "usage collect exceeded the vocabulary bound")
      val usage = usageRows.map(u => (u.getString(0), u.getLong(1))).toMap
      vocab = prune(chars, usage, keepCap)
      r += 1
    }
    val total = vocab.iterator.map(_._2 + 1.0).sum
    vocab.map { case (p, c) => Piece(p, c, scoreMicro(c, total)) }
  }

  /** [[train]] as a DataFrame — the `corpus_ulm_train` query surface:
    * `(piece, freq, score_micro)`, one row per kept piece. */
  def trainTable(spark: SparkSession, docs: DataFrame): DataFrame =
    piecesTable(spark, train(docs))

  /** [[trainDistributed]] as a DataFrame — same shape as [[trainTable]]. */
  def trainTableDistributed(spark: SparkSession, docs: DataFrame): DataFrame =
    piecesTable(spark, trainDistributed(docs))

  private def piecesTable(
      spark: SparkSession, pieces: Seq[Piece]): DataFrame = {
    val schema = StructType(Seq(
      StructField("piece", StringType, nullable = false),
      StructField("freq", LongType, nullable = false),
      StructField("score_micro", LongType, nullable = false)))
    val rows = pieces.map(p => Row(p.piece, p.freq, p.scoreMicro))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Fixed piece→cost table (micro-nats) for the encode/accounting
    * queries — decoupled from training so the oracle is a constant VALUES
    * table, and covering all 26 letters so every `[a-z]+` word segments
    * without the UNK fallback. Multi-char pieces are cheaper per char
    * than their character spellings, so real subword structure (whole
    * words, stems, digraphs) wins the Viterbi. */
  val FixedVocab: Seq[(String, Long)] =
    ('a' to 'z').map(c => c.toString -> 3500000L) ++ Seq(
      "th" -> 4200000L, "he" -> 4400000L, "in" -> 4300000L,
      "er" -> 4400000L, "an" -> 4500000L, "re" -> 4500000L,
      "on" -> 4600000L, "at" -> 4600000L, "or" -> 4600000L,
      "ow" -> 4700000L, "ta" -> 4700000L, "st" -> 4700000L,
      "ar" -> 4800000L, "al" -> 4800000L, "sc" -> 4900000L,
      "ue" -> 4900000L, "the" -> 4600000L, "ing" -> 4800000L,
      "que" -> 5000000L, "row" -> 5000000L, "col" -> 5100000L,
      "ery" -> 5100000L, "val" -> 5200000L, "dow" -> 5200000L,
      "tch" -> 5200000L, "lum" -> 5300000L, "eam" -> 5300000L,
      "join" -> 5200000L, "hash" -> 5300000L, "data" -> 5300000L,
      "scan" -> 5400000L, "sort" -> 5400000L, "line" -> 5400000L,
      "fast" -> 5500000L, "part" -> 5500000L)

  /** Per-document piece stream under a fixed table, joined with single
    * spaces — byte-exact encode evidence (`(doc_id, ulm_pieces)`); an
    * empty/absent text encodes to `''`. */
  def encodePieces(
      docs: DataFrame,
      vocab: Seq[(String, Long)] = FixedVocab): DataFrame =
    docs.select(col("doc_id"),
      array_join(UlmSegment.ulmSegment(Bpe.words(col("text")), vocab), " ")
        .alias("ulm_pieces"))

  /** Per-document piece count under a fixed table — the token-accounting
    * signal (`(doc_id, ulm_tokens)`). Count-only kernel: the piece array
    * is never materialized. */
  def tokenCounts(
      docs: DataFrame,
      vocab: Seq[(String, Long)] = FixedVocab): DataFrame =
    docs.select(col("doc_id"),
      UlmSegment.ulmCount(Bpe.words(col("text")), vocab).alias("ulm_tokens"))

  /** [[train]] → encode, end to end: token counts under the vocabulary
    * learned from the SAME corpus (its twin replays training AND the
    * Viterbi encode in one SQL statement, pinning the whole loop
    * cross-engine). */
  def tokenCountsTrained(spark: SparkSession, docs: DataFrame): DataFrame =
    tokenCounts(docs, train(docs).map(p => (p.piece, -p.scoreMicro)))

  /** Sequence packing on unigram-LM budgets — [[Bpe.packByBpe]]'s exact
    * shape (hash-bucket, running sum, budget chop) with the Viterbi piece
    * count as the packed unit, completing the pack-under-every-budget
    * family (whitespace / BPE / ULM). Same 100 TB posture: the text never
    * shuffles, only (doc_id, bucket, count) scalars enter the window
    * sort. */
  def packByUlm(
      docs: DataFrame,
      vocab: Seq[(String, Long)] = FixedVocab,
      budget: Int = 2048,
      buckets: Int = 32): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    val toks = tokenCounts(docs, vocab)
      .withColumn("bucket",
        pmod(Dedup.hashAt(0, col("doc_id").cast("string")),
          lit(buckets.toLong)).cast("int"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("doc_id"))
    toks
      .withColumn("cum", sum(col("ulm_tokens")).over(w))
      .select(col("doc_id"), col("bucket"),
        floor((col("cum") - col("ulm_tokens")) / lit(budget.toDouble))
          .cast("int").alias("pack_id"),
        col("ulm_tokens"))
  }

  /** Tokenizer COMPARISON card: BPE and unigram-LM each trained on the
    * SAME corpus, each encoding it, in one row — document/word/token
    * totals, per-family fertility (tokens per word, the cost metric a
    * tokenizer review reads), the ULM:BPE token ratio, and the learned
    * vocabulary sizes. The production "which tokenizer for this corpus"
    * decision table.
    *
    * Totals are exact integer sums with ONE rounded division each, so the
    * card is bit-stable regardless of aggregation order; the joins
    * exchange (doc_id, int) rows only. Its twin replays BOTH training
    * loops and BOTH encodes in a single SQL statement — the two
    * tokenizer families pinned against each other cross-engine.
    */
  def compareWithBpe(spark: SparkSession, docs: DataFrame): DataFrame = {
    // ONE word-count pass feeds BOTH word-level trainers: Ulm.train and
    // Bpe.train each ran their own corpus tokenize → groupBy → top-V
    // collect over the identical Bpe.wordCounts frame; materializing it
    // once removes a full corpus aggregation from the card. Training
    // arithmetic is untouched — the collects see the same rows.
    val wc = Materialize(Bpe.wordCounts(docs))
    val topUlm = wc.orderBy(col("cnt").desc, col("word")).limit(VocabCap)
      .collect()
    require(topUlm.length <= VocabCap, "top-V collect exceeded its bound")
    val pieces = trainFromWordCounts(
      topUlm.map(r => (r.getString(0), r.getLong(1))).toSeq)
    val ulm = tokenCounts(docs, pieces.map(p => (p.piece, -p.scoreMicro)))
    val bpe = Bpe.tokenCounts(docs,
      Bpe.trainFromCounts(wc, Bpe.VocabCap, Bpe.NumMerges)
        .map(r => (r.a, r.b)))
    // Third tokenizer (round 15): byte-level BPE trained on the same
    // corpus — byte fertility reads higher than char-BPE's because every
    // leading space is a real Ġ byte the other two never count.
    val bpeb = Bpe.tokenCountsBytesTrained(spark, docs)
    val words = docs.select(col("doc_id"),
      size(Bpe.words(col("text"))).alias("n_words"))
    words.join(bpe, "doc_id").join(ulm, "doc_id").join(bpeb, "doc_id")
      .agg(
        count(lit(1)).alias("n_docs"),
        sum(col("n_words").cast("long")).alias("n_words"),
        sum(col("bpe_tokens").cast("long")).alias("bpe_tokens"),
        sum(col("ulm_tokens").cast("long")).alias("ulm_tokens"),
        sum(col("bpeb_tokens").cast("long")).alias("bpeb_tokens"))
      .select(
        col("n_docs"), col("n_words"), col("bpe_tokens"), col("ulm_tokens"),
        col("bpeb_tokens"),
        round(col("bpe_tokens").cast("double") /
          greatest(col("n_words"), lit(1L)), 6).alias("bpe_fertility"),
        round(col("ulm_tokens").cast("double") /
          greatest(col("n_words"), lit(1L)), 6).alias("ulm_fertility"),
        round(col("bpeb_tokens").cast("double") /
          greatest(col("n_words"), lit(1L)), 6).alias("bpeb_fertility"),
        round(col("ulm_tokens").cast("double") /
          greatest(col("bpe_tokens"), lit(1L)), 6).alias("ulm_vs_bpe"),
        lit(Bpe.NumMerges).cast("int").alias("bpe_merges"),
        lit(pieces.size).cast("int").alias("ulm_vocab"))
  }
}
