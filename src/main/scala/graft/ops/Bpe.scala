package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

import graft.functions.{BpeEncode, BpeMerge, MergePair}

/** Byte-pair-encoding tokenizer: training and token accounting (Sennrich
  * et al. 2016, arXiv:1508.07909) — the BPE upgrade of the whitespace /
  * `bpeish`-regex token budgets used across curation (reference token
  * accounting: `data_agregator.py` counts records, not tokens; the LLM
  * pipeline needs subword-exact budgets).
  *
  * Architecture, sized for 100 TB: training never iterates the corpus.
  * ONE distributed pass computes word frequencies (the only corpus-scale
  * stage — a map-side-combined groupBy of a few million distinct words at
  * web scale); the merge loop then runs on the BOUNDED top-[[VocabCap]]
  * frequency table on the driver — the same word-count-then-in-memory-loop
  * shape production BPE trainers use, and the same bounded-collect
  * discipline as the IVF/PQ quantizer training
  * ([[Similarity]]: `require`-guarded sample, never the corpus). Encoding
  * is a codegen'd per-row kernel ([[graft.functions.BpeEncode]]) with a
  * Zipf-friendly per-thread word memo — no shuffle, no UDF.
  *
  * Merge semantics (shared with the DuckDB twins, which replay training
  * with space-delimited string `replace`): pair counts sum over ALL
  * adjacent symbol positions (`a a a` counts (a,a) twice); applying a
  * merge rewrites non-overlapping occurrences left-to-right (`a a a` →
  * `aa a`), exactly `replace(' a a a ', ' a a ', ' aa ')`. Ties break by
  * (count desc, left asc, right asc) — binary string order, identical in
  * Scala and DuckDB for the `[a-z]+` word alphabet.
  */
object Bpe {

  /** Learned-merge cap: enough for the test corpus's 31-word vocabulary
    * to grow multi-level merges without exhausting its ~115 possible
    * pair-merge steps. */
  val NumMerges = 16

  /** Training vocabulary bound — the driver-side merge loop sees at most
    * this many (word, count) rows. Production corpora raise it (HF
    * tokenizers defaults are ~10⁵–10⁶ words; the loop is O(V·len) per
    * round either way). */
  val VocabCap = 300

  /** Fixed merge table for the encode/accounting queries — decoupled from
    * training so the oracle is a constant chain of `replace` calls, and
    * multi-level (q→qu→quer→query) so chained merges are exercised. */
  val FixedMerges: Seq[(String, String)] = Seq(
    "e" -> "r", "i" -> "n", "o" -> "w", "s" -> "t", "o" -> "r",
    "a" -> "t", "a" -> "r", "t" -> "h", "th" -> "e", "q" -> "u",
    "qu" -> "er", "quer" -> "y", "j" -> "o", "jo" -> "in", "r" -> "ow",
    "h" -> "a")

  /** Lowercase `[a-z]+` word stream of a document — the training and
    * encoding unit. A regexp extraction, not a split: punctuation and
    * digits separate words without producing empty tokens, and the DuckDB
    * twin (`regexp_extract_all(lower(text), '[a-z]+')`) is exact. */
  def words(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract_all(lower(coalesce(c, lit(""))), lit("[a-z]+"), lit(0))

  /** Distributed word-frequency table — the one corpus-scale stage of
    * training. Map-side combine does the heavy lifting: the shuffle
    * carries (word, partial count), not text. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(words(col("text"))).alias("word"))
      .groupBy(col("word")).agg(count(lit(1)).alias("cnt"))

  /** One learned merge: 1-based rank, the pair, its concatenation, and the
    * pair's corpus-weighted count when it won. */
  final case class MergeRule(
      rank: Int, a: String, b: String, merged: String, count: Long)

  /** Train `numMerges` BPE merges over the top-`vocabCap` words.
    *
    * The collect is the bounded frequency table ONLY (`require`-guarded),
    * never documents; `TakeOrderedAndProject` computes the top-V with
    * map-side partial top-k, so the driver receives ≤ vocabCap rows no
    * matter the corpus size. Training stops early (with fewer rules) only
    * if the vocabulary runs out of adjacent pairs — callers that replay
    * the loop in SQL (`corpus_bpe_train`'s twin) size numMerges below
    * that bound. */
  def train(
      docs: DataFrame,
      vocabCap: Int = VocabCap,
      numMerges: Int = NumMerges): Seq[MergeRule] =
    trainFromCounts(wordCounts(docs), vocabCap, numMerges)

  /** The driver merge loop over ANY `(word, cnt)` frequency table — the
    * char-level and byte-level trainers differ only in what a "word" is
    * (a `[a-z]+` word vs a byte-mapped pretoken), so they share this
    * loop and the tie-break/merge semantics cannot drift between them. */
  private[ops] def trainFromCounts(
      counts: DataFrame,
      vocabCap: Int,
      numMerges: Int): Seq[MergeRule] = {
    require(vocabCap > 0, s"vocab cap must be positive, got $vocabCap")
    require(numMerges > 0, s"merge count must be positive, got $numMerges")
    val top = counts
      .orderBy(col("cnt").desc, col("word"))
      .limit(vocabCap)
      .collect()
    require(top.length <= vocabCap, "top-V collect exceeded its bound")

    var vocab: Array[(Array[String], Long)] = top.map { r =>
      (BpeMerge.codePointSymbols(r.getString(0)), r.getLong(1))
    }
    val rules = Seq.newBuilder[MergeRule]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + cnt)
          i += 1
        }
      }
      if (pc.isEmpty) exhausted = true
      else {
        val ((a, b), cnt) = pc.minBy { case ((pa, pb), v) => (-v, pa, pb) }
        rules += MergeRule(r + 1, a, b, a + b, cnt)
        vocab = vocab.map { case (syms, c) =>
          (BpeMerge.mergeOnce(syms, a, b), c)
        }
        r += 1
      }
    }
    rules.result()
  }

  /** [[train]]'s merge loop run DISTRIBUTED — the alternative architecture
    * for vocabularies too large to collect (character-rich scripts, byte-
    * level BPE over huge corpora): the bounded vocabulary stays a DataFrame
    * and every round is a Spark job — adjacent-pair explode → map-side-
    * combined count → argmax (ONE row to the driver), then the codegen'd
    * [[graft.functions.MergePair]] rewrites the vocab, with a per-round
    * [[Materialize]] truncating lineage exactly like the connected-
    * components loops. Same pair-count / tiebreak / merge semantics as
    * [[train]] — `corpus_bpe_train_dist` checks against the SAME oracle,
    * so the two trainers cannot drift (the dedup_clusters /
    * dedup_clusters_bigstar pattern).
    */
  def trainDistributed(
      docs: DataFrame,
      vocabCap: Int = VocabCap,
      numMerges: Int = NumMerges): Seq[MergeRule] =
    trainDistributedFromCounts(wordCounts(docs), vocabCap, numMerges)

  /** [[trainFromCounts]]' distributed sibling — see [[trainDistributed]]. */
  private def trainDistributedFromCounts(
      counts: DataFrame,
      vocabCap: Int,
      numMerges: Int): Seq[MergeRule] = {
    require(vocabCap > 0, s"vocab cap must be positive, got $vocabCap")
    require(numMerges > 0, s"merge count must be positive, got $numMerges")
    var vocab = Materialize(
      counts
        .orderBy(col("cnt").desc, col("word"))
        .limit(vocabCap)
        .select(
          regexp_extract_all(col("word"), lit("."), lit(0)).alias("syms"),
          col("cnt")))
    val rules = Seq.newBuilder[MergeRule]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val best = vocab
        .where(size(col("syms")) >= 2)
        .select(col("cnt"),
          slice(col("syms"), lit(1), size(col("syms")) - 1).alias("la"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).alias("lb"))
        .select(explode(arrays_zip(col("la"), col("lb"))).alias("p"),
          col("cnt"))
        .groupBy(col("p.la").alias("a"), col("p.lb").alias("b"))
        .agg(sum(col("cnt")).alias("pc"))
        .orderBy(col("pc").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, pc) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        rules += MergeRule(r + 1, a, b, a + b, pc)
        // Lineage cadence, not per-round truncation: the vocab is
        // vocabCap-BOUNDED (a constant at any corpus scale), so carrying
        // a few MergePair projections in the plan costs microseconds of
        // recompute, while a localCheckpoint per round costs a full
        // driver action — the dominant wall cost of this loop's ~0-row
        // rounds. Checkpoint every 4th merge keeps the plan depth (and
        // optimizer time) bounded without paying an action per round.
        vocab = vocab.select(
          MergePair.mergePair(col("syms"), a, b).alias("syms"), col("cnt"))
        if ((r + 1) % 4 == 0) vocab = Materialize(vocab)
        r += 1
      }
    }
    rules.result()
  }

  /** [[train]] as a DataFrame — the `corpus_bpe_train` query surface:
    * `(rank, pair_a, pair_b, merged, pair_count)`, one row per learned
    * merge in training order. */
  def trainTable(spark: SparkSession, docs: DataFrame): DataFrame =
    rulesTable(spark, train(docs))

  /** [[trainDistributed]] as a DataFrame — same shape as [[trainTable]]. */
  def trainTableDistributed(spark: SparkSession, docs: DataFrame): DataFrame =
    rulesTable(spark, trainDistributed(docs))

  private def rulesTable(
      spark: SparkSession, rules: Seq[MergeRule]): DataFrame = {
    val schema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("pair_a", StringType, nullable = false),
      StructField("pair_b", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    val rows = rules.map(m => Row(m.rank, m.a, m.b, m.merged, m.count))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Per-document BPE symbol stream under a fixed merge table, joined with
    * single spaces — byte-exact encode evidence
    * (`(doc_id, bpe_symbols)`); an empty/absent text encodes to `''`. */
  def encodeSymbols(
      docs: DataFrame,
      merges: Seq[(String, String)] = FixedMerges): DataFrame =
    docs.select(col("doc_id"),
      array_join(BpeEncode.bpeEncode(words(col("text")), merges), " ")
        .alias("bpe_symbols"))

  /** Per-document BPE token count under a fixed merge table — the subword
    * token-accounting signal (`(doc_id, bpe_tokens)`). Count-only kernel:
    * the symbol array is never materialized. */
  def tokenCounts(
      docs: DataFrame,
      merges: Seq[(String, String)] = FixedMerges): DataFrame =
    docs.select(col("doc_id"),
      BpeEncode.bpeCount(words(col("text")), merges).alias("bpe_tokens"))

  /** [[train]] → encode, end to end: token counts under the table learned
    * from the SAME corpus — the corpus-adaptive accounting path (its twin
    * replays training AND encoding in one SQL statement, pinning the whole
    * loop cross-engine). */
  def tokenCountsTrained(spark: SparkSession, docs: DataFrame): DataFrame =
    tokenCounts(docs, train(docs).map(r => (r.a, r.b)))

  /** Token-budget mixing on BPE budgets: [[Curation.mixEpochs]]' epoch
    * arithmetic (whole epochs + exact integer fractional draw) with the
    * subword count as the budget unit. Same shape: one signal scan, a
    * broadcast of per-language totals; the text never shuffles. */
  def mixEpochsBpe(
      docs: DataFrame,
      targetTokens: Map[String, Long],
      merges: Seq[(String, String)] = FixedMerges): DataFrame = {
    require(targetTokens.values.forall(_ >= 0), "targets must be ≥ 0")
    val sig = TextAnalysis.curationSignals(docs)
      .select(col("doc_id"), col("predicted_lang"))
      .join(tokenCounts(docs, merges), "doc_id")
    val totals = sig.groupBy(col("predicted_lang"))
      .agg(sum(col("bpe_tokens")).alias("lang_tokens"))
    val target = targetTokens.foldRight(lit(0L)) { case ((l, t), rest) =>
      when(col("predicted_lang") === l, lit(t)).otherwise(rest)
    }
    val bucket = pmod(
      Dedup.hashAt(Curation.MixHashIndex, col("doc_id").cast("string")),
      lit(10000L))
    // Zero-token strata gate exactly as Curation.mixEpochs — see there.
    sig.join(broadcast(totals), "predicted_lang")
      .withColumn("target", target)
      .withColumn("whole", expr("target div greatest(lang_tokens, 1)"))
      .withColumn("rem", col("target") - col("whole") * col("lang_tokens"))
      .select(
        col("doc_id"), col("predicted_lang"), col("bpe_tokens"),
        when(col("lang_tokens") > 0,
          col("whole") +
            when(bucket * col("lang_tokens") < col("rem") * 10000, 1L)
              .otherwise(0L))
          .otherwise(0L).cast("int").alias("n_epochs"))
  }

  /** Budget-quantized chunking on BPE budgets — [[Curation.chunkDocuments]]'
    * role with subword-exact budgets, but a fundamentally better 100 TB
    * shape: the whole chunker runs INSIDE the row
    * ([[graft.functions.BpeChunks]] — scan → codegen'd project → explode,
    * zero shuffles), where a window-over-exploded-words formulation would
    * shuffle every word of the corpus. Word i joins chunk
    * `floor(bpe_tokens_before_i / budget)` — packSequences' running-sum
    * chop applied intra-document. Wordless documents emit no chunks. */
  def chunkByBpe(
      docs: DataFrame,
      merges: Seq[(String, String)] = FixedMerges,
      budget: Int = 64): DataFrame =
    docs
      .select(col("doc_id"),
        explode(graft.functions.BpeChunks.bpeChunks(
          words(col("text")), merges, budget)).alias("ch"))
      .select(col("doc_id"), col("ch.chunk_id").alias("chunk_id"),
        col("ch.n_chunk_bpe").alias("n_chunk_bpe"),
        col("ch.chunk_text").alias("chunk_text"))

  // ── Byte-level BPE (GPT-2 style) ────────────────────────────────────
  // Radford et al. 2019: map every UTF-8 byte to a printable stand-in
  // code point ([[graft.functions.ByteUnicodeMap]] — the public
  // bytes_to_unicode table, space ⇒ 'Ġ'), pre-tokenize, then run the SAME
  // merge machinery over the mapped strings — each code point IS one
  // byte, so char-level kernels and oracles work unchanged and unseen
  // bytes can never produce <unk> (the byte fallback).

  /** Pre-tokenization over byte-MAPPED text. GPT-2's pattern, adapted in
    * two documented ways so the DuckDB twin is exact: (1) no lookahead
    * (`\s+(?!\S)` is Java-only — RE2 has no lookaround), which only
    * affects runs of ≥ 2 spaces before a token (absent from the
    * fixture's single-spaced corpus); (2) explicit `[a-z]`/`[0-9]`
    * classes instead of `\p{L}`/`\p{N}` — mapping FIRST means stand-ins
    * like Ġ are Unicode letters, so the Unicode classes would swallow
    * them; the explicit classes match the fixture alphabet and anything
    * else falls through to the "other" branch. */
  val BytePretokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)|Ġ?[a-z]+|Ġ?[0-9]+|Ġ?[^a-z0-9Ġ]+|Ġ+"

  /** Byte-mapped text (NULL ⇒ empty — the engine-wide NULL-text
    * contract). On printable-ASCII corpora this equals
    * `replace(text, ' ', 'Ġ')`, which is exactly how the oracle twins
    * derive it; the kernel handles all 256 bytes. */
  def byteMapped(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.ByteUnicode.byteUnicode(coalesce(c, lit("")))

  /** Byte-level pretoken stream of a document — the training and
    * encoding unit (merges never cross pretoken boundaries, mirroring
    * the per-word contract of the char-level family). */
  def bytePretokens(
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract_all(byteMapped(c), lit(BytePretokenPattern), lit(0))

  /** Distributed pretoken-frequency table — [[wordCounts]]' byte face. */
  def bytePretokenCounts(docs: DataFrame): DataFrame =
    docs.select(explode(bytePretokens(col("text"))).alias("word"))
      .groupBy(col("word")).agg(count(lit(1)).alias("cnt"))

  /** Train byte-level merges: [[train]]'s loop over byte pretokens
    * (code points of a mapped pretoken ARE its bytes, so
    * codePointSymbols needs no byte variant). */
  def trainBytes(
      docs: DataFrame,
      vocabCap: Int = VocabCap,
      numMerges: Int = NumMerges): Seq[MergeRule] =
    trainFromCounts(bytePretokenCounts(docs), vocabCap, numMerges)

  /** [[trainDistributed]]'s byte face — same one-row-per-round collect. */
  def trainBytesDistributed(
      docs: DataFrame,
      vocabCap: Int = VocabCap,
      numMerges: Int = NumMerges): Seq[MergeRule] =
    trainDistributedFromCounts(bytePretokenCounts(docs), vocabCap, numMerges)

  /** [[trainBytes]] as a DataFrame — the `corpus_bpe_bytes_train` face. */
  def trainBytesTable(spark: SparkSession, docs: DataFrame): DataFrame =
    rulesTable(spark, trainBytes(docs))

  /** [[trainBytesDistributed]] as a DataFrame — same shape. */
  def trainBytesTableDistributed(
      spark: SparkSession, docs: DataFrame): DataFrame =
    rulesTable(spark, trainBytesDistributed(docs))

  /** Fixed byte-merge table for the encode faces — decoupled from
    * training like [[FixedMerges]], and built to exercise the byte-level
    * specifics: Ġ-absorbing merges (`Ġ the` → `Ġthe` — the space joins
    * the word, GPT-2's signature behavior) and multi-level chains
    * (t→th→the→Ġthe). */
  val FixedByteMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "Ġ" -> "the",
    "r" -> "o", "ro" -> "w", "Ġ" -> "row",
    "a" -> "g", "ag" -> "g", "Ġ" -> "agg",
    "a" -> "n", "s" -> "c", "sc" -> "an", "Ġ" -> "scan",
    "Ġ" -> "a")

  /** Per-document byte-BPE symbol stream under a fixed table —
    * `(doc_id, bpe_symbols)`, space-joined (Ġ marks original spaces). */
  def encodeSymbolsBytes(
      docs: DataFrame,
      merges: Seq[(String, String)] = FixedByteMerges): DataFrame =
    docs.select(col("doc_id"),
      array_join(
        graft.functions.BpeEncode.bpeEncode(bytePretokens(col("text")),
          merges), " ")
        .alias("bpe_symbols"))

  /** Per-document byte-BPE token count under a fixed table —
    * `(doc_id, bpeb_tokens)`, count-only kernel. */
  def tokenCountsBytes(
      docs: DataFrame,
      merges: Seq[(String, String)] = FixedByteMerges): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.BpeEncode.bpeCount(bytePretokens(col("text")), merges)
        .alias("bpeb_tokens"))

  /** [[trainBytes]] → encode, end to end — the byte column of the
    * three-tokenizer decision card. */
  def tokenCountsBytesTrained(
      spark: SparkSession, docs: DataFrame): DataFrame =
    tokenCountsBytes(docs, trainBytes(docs).map(r => (r.a, r.b)))

  /** Sequence packing on BPE budgets: [[Curation.packSequences]]' exact
    * shape (hash-bucket, running sum, budget chop) with the subword count
    * as the packed unit — what a context-window packer actually needs.
    * Same 100 TB posture: the text never shuffles, only
    * (doc_id, bucket, count) scalars enter the window sort. */
  def packByBpe(
      docs: DataFrame,
      merges: Seq[(String, String)] = FixedMerges,
      budget: Int = 2048,
      buckets: Int = 32): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    val toks = tokenCounts(docs, merges)
      .withColumn("bucket",
        pmod(Dedup.hashAt(0, col("doc_id").cast("string")),
          lit(buckets.toLong)).cast("int"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
    toks
      .withColumn("cum", sum(col("bpe_tokens")).over(w))
      .select(col("doc_id"), col("bucket"),
        floor((col("cum") - col("bpe_tokens")) / lit(budget.toDouble))
          .cast("int").alias("pack_id"),
        col("bpe_tokens"))
  }
}
