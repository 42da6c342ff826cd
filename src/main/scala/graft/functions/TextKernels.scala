package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{coalesce, lit, typedlit}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd kernels for the text/dedup hot paths. Each replaces a
  * declarative shape whose per-element work ran through an interpreted
  * higher-order function (Spark HOFs are CodegenFallback with no
  * subexpression elimination) or through an avoidable shuffle; each is
  * bit-identical to the chain it replaces, so the DuckDB oracle twins are
  * untouched.
  */

/** 60-bit (or `bits`-bit) SimHash majority vote over a materialized
  * per-document hash array, as ONE whole-stage-codegen'd projection:
  * bit j of the result is set iff Σ over hashes of (bit j set ? +1 : −1)
  * is positive. Null elements are skipped (SUM-over-explode semantics).
  *
  * Replaces `explode_outer → groupBy(doc) → 60×SUM → bit assembly` — the
  * same integer arithmetic, but with NO explode blow-up, NO shuffle, and
  * no 60-column aggregation state. At 100 TB this turns the signature
  * stage from the corpus's biggest shuffle into a pure map.
  */
case class SimhashVote(child: Expression, bits: Int = 60)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_vote expects array<long>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimhashVote.vote(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val helper = "graft.functions.SimhashVote$.MODULE$"
      s"${ev.value} = $helper.vote($arr, $bits);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashVote =
    copy(child = newChild)
}

object SimhashVote {

  def vote(arr: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < bits) {
          votes(j) += (((h >>> j) & 1L).toInt << 1) - 1
          j += 1
        }
      }
      i += 1
    }
    var v = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) v |= 1L << j
      j += 1
    }
    v
  }

  // NULL hashes ≡ empty (simhash 0) — the explode_outer semantics of the
  // replaced chain; the expression itself stays nullIntolerant.
  def simhashVote(hashes: Column, bits: Int = 60): Column =
    Bridge.column(SimhashVote(Bridge.expression(
      coalesce(hashes, typedlit(Array.empty[Long]))), bits))
}

/** Consecutive word bigrams ("w1 w2") over an array<string>, natively:
  * one codegen'd loop with `UTF8String.concatWs` per pair — identical
  * null-skipping semantics to the
  * `transform(sequence(1, size-1), i -> concat_ws(' ', toks[i], toks[i+1]))`
  * chain it replaces, including the empty result for size < 2 (where the
  * declarative form needed an explicit guard against sequence(1, 0)
  * counting DOWN).
  */
case class Bigrams(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_bigrams expects array<string>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    Bigrams.bigrams(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val helper = "graft.functions.Bigrams$.MODULE$"
      s"${ev.value} = $helper.bigrams($arr);"
    })

  override protected def withNewChildInternal(newChild: Expression): Bigrams =
    copy(child = newChild)
}

object Bigrams {

  private val Space = UTF8String.fromString(" ")

  def bigrams(toks: ArrayData): GenericArrayData = {
    val n = toks.numElements()
    if (n < 2) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](n - 1)
    var prev = if (toks.isNullAt(0)) null else toks.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      // concat_ws(" ", a, b) skips null inputs
      out(i - 1) = UTF8String.concatWs(Space, prev, cur)
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  // NULL tokens ≡ no bigrams — the `otherwise(array())` branch of the
  // declarative chain this kernel replaced (NULL text must not silently
  // drop the row from downstream band joins).
  def wordBigrams(toks: Column): Column =
    Bridge.column(Bigrams(Bridge.expression(
      coalesce(toks, typedlit(Array.empty[String])))))
}

/** Character n-grams of a string, natively: one codegen'd loop of
  * `UTF8String.substringSQL` calls — identical (code-point-based)
  * semantics to `transform(sequence(1, length-n+1), i -> substr(lt, i, n))`
  * with the length < n guard, which otherwise runs interpreted per
  * element.
  */
case class CharNgrams(child: Expression, n: Int = 3)
    extends UnaryExpression {

  require(n >= 1, s"char_ngrams width must be >= 1, got $n")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_ngrams expects string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    CharNgrams.ngrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val helper = "graft.functions.CharNgrams$.MODULE$"
      s"${ev.value} = $helper.ngrams($s, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgrams {

  /** Byte offset of each code-point start, plus a final end-of-string
    * sentinel — one linear walk (substringSQL would re-scan from byte 0
    * per call, making an n-gram sweep quadratic in document length).
    */
  private[functions] def codePointStarts(s: UTF8String): (Array[Int], Int) = {
    val nb = s.numBytes()
    val starts = new Array[Int](nb + 1)
    var chars = 0
    var off = 0
    while (off < nb) {
      starts(chars) = off
      off += UTF8String.numBytesForFirstByte(s.getByte(off))
      chars += 1
    }
    starts(chars) = nb
    (starts, chars)
  }

  def ngrams(s: UTF8String, n: Int): GenericArrayData = {
    val (starts, chars) = codePointStarts(s)
    if (chars < n) return new GenericArrayData(new Array[Any](0))
    val bytes = s.getBytes // one copy, shared by every gram below
    val out = new Array[Any](chars - n + 1)
    var i = 0
    while (i < chars - n + 1) {
      out(i) = UTF8String.fromBytes(bytes, starts(i), starts(i + n) - starts(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  // NULL string ≡ no n-grams (the replaced CASE's ELSE [] branch).
  def charNgrams(str: Column, n: Int = 3): Column =
    Bridge.column(CharNgrams(Bridge.expression(coalesce(str, lit(""))), n))
}

/** Count of array elements contained in a small fixed vocabulary, natively:
  * replaces `size(filter(arr, w -> array_contains(lit(words), w)))`, whose
  * interpreted filter-lambda was the entire cost of the language-ID and
  * stopword-ratio queries (|arr| × |languages| interpreted evals per row).
  * Null elements are skipped (array_contains(_, null) is null, which the
  * filter dropped). Linear scan over the vocabulary — it is ≤ a few dozen
  * words, exactly like the literal array it replaces.
  */
case class CountInSet(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"count_in_set expects array<string>, got ${other.simpleString}")
    }

  @transient private lazy val vocab: Array[UTF8String] =
    words.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(input: Any): Any =
    CountInSet.count(input.asInstanceOf[ArrayData], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val vocabRef = ctx.addReferenceObj("vocab", vocab,
        "org.apache.spark.unsafe.types.UTF8String[]")
      val helper = "graft.functions.CountInSet$.MODULE$"
      s"${ev.value} = $helper.count($arr, $vocabRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}

object CountInSet {

  def count(arr: ArrayData, vocab: Array[UTF8String]): Int = {
    var c = 0
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i)
        var j = 0
        while (j < vocab.length) {
          if (vocab(j).equals(w)) { c += 1; j = vocab.length }
          else j += 1
        }
      }
      i += 1
    }
    c
  }

  // NULL array ≡ count 0 (the replaced size(filter(...)) gave null only
  // because its input did; a null score row is never useful downstream).
  def countInSet(arr: Column, words: Seq[String]): Column =
    Bridge.column(CountInSet(Bridge.expression(
      coalesce(arr, typedlit(Array.empty[String]))), words))
}

/** The k affine MinHash minima in ONE pass over the base-hash array,
  * natively: element h contributes `(h·aᵢ + bᵢ) mod p` to minimum i.
  * Replaces k independent interpreted
  * `array_min(transform(hs, h -> pmod(h*aᵢ + bᵢ, p)))` passes (k = 16 →
  * 16 interpreted walks of every shingle array, the dominant cost of the
  * MinHash signature stage after the base hash went native).
  *
  * Arithmetic parity: h < 2^30 and aᵢ < p < 2^30 keep h·aᵢ + bᵢ < 2^61 —
  * positive, so `% p` equals Spark's `pmod` and DuckDB's `%` bit-for-bit.
  * Null elements are skipped (array_min ignores nulls); a position with no
  * contributing element yields null (array_min of empty/all-null).
  */
case class MinhashAffine(
    child: Expression,
    as: Seq[Long],
    bs: Seq[Long],
    mod: Long)
    extends UnaryExpression {

  require(as.length == bs.length, "as/bs must be the same length")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_affine expects array<long>, got ${other.simpleString}")
    }

  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  override protected def nullSafeEval(input: Any): Any =
    MinhashAffine.mins(input.asInstanceOf[ArrayData], aArr, bArr, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
      val helper = "graft.functions.MinhashAffine$.MODULE$"
      s"${ev.value} = $helper.mins($arr, $aRef, $bRef, ${mod}L);"
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashAffine =
    copy(child = newChild)
}

object MinhashAffine {

  def mins(
      arr: ArrayData,
      as: Array[Long],
      bs: Array[Long],
      mod: Long): GenericArrayData = {
    val k = as.length
    val m = new Array[Long](k)
    java.util.Arrays.fill(m, Long.MaxValue)
    var any = false
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val v = (h * as(j) + bs(j)) % mod
          if (v < m(j)) m(j) = v
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](k)
    if (any) {
      var j = 0
      while (j < k) { out(j) = m(j); j += 1 }
    }
    new GenericArrayData(out)
  }

  def minhashAffine(hs: Column, params: Seq[(Long, Long)], mod: Long): Column =
    Bridge.column(MinhashAffine(
      Bridge.expression(hs), params.map(_._1), params.map(_._2), mod))
}

/** Per-profile n-gram hit counts of a string in ONE zero-allocation pass:
  * result `[total, hits(profile₀), …, hits(profileₖ₋₁)]` where `total` is
  * the string's n-gram count (`numChars - n + 1`, 0 below n) and
  * `hits(p)` counts n-grams contained in profile p — exactly
  * `CountInSet(CharNgrams(str, n), profile)` per profile, but WITHOUT
  * materializing the n-gram array (for a 2 KB document that array is
  * ~2000 short-lived strings — pure GC pressure) and without any
  * per-position substring: grams are matched against the profiles'
  * UTF-8 bytes in place at code-point boundaries (byte equality ⇔ string
  * equality for valid UTF-8, the same bytewise rule `UTF8String.equals`
  * uses).
  */
case class NgramProfileCounts(
    child: Expression,
    n: Int,
    profiles: Seq[Seq[String]])
    extends UnaryExpression {

  require(n >= 1, s"ngram width must be >= 1, got $n")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_profile_counts expects string, got ${other.simpleString}")
    }

  @transient private lazy val vocabBytes: Array[Array[Array[Byte]]] =
    profiles.map(_.map(_.getBytes("UTF-8")).toArray).toArray

  override protected def nullSafeEval(input: Any): Any =
    NgramProfileCounts.scan(input.asInstanceOf[UTF8String], n, vocabBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val vocabRef = ctx.addReferenceObj("vocab", vocabBytes, "byte[][][]")
      val helper = "graft.functions.NgramProfileCounts$.MODULE$"
      s"${ev.value} = $helper.scan($s, $n, $vocabRef);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): NgramProfileCounts = copy(child = newChild)
}

object NgramProfileCounts {

  def scan(
      s: UTF8String,
      n: Int,
      vocab: Array[Array[Array[Byte]]]): GenericArrayData = {
    val (starts, chars) = CharNgrams.codePointStarts(s)
    val counts = new Array[Int](vocab.length)
    val total = if (chars < n) 0 else chars - n + 1
    var i = 0
    while (i < total) {
      val gs = starts(i)
      val glen = starts(i + n) - gs
      var p = 0
      while (p < vocab.length) {
        val prof = vocab(p)
        var j = 0
        var matched = false
        while (!matched && j < prof.length) {
          val vb = prof(j)
          if (vb.length == glen) {
            var k = 0
            while (k < glen && vb(k) == s.getByte(gs + k)) k += 1
            if (k == glen) matched = true
          }
          j += 1
        }
        if (matched) counts(p) += 1
        p += 1
      }
      i += 1
    }
    val out = new Array[Any](vocab.length + 1)
    out(0) = total
    var p = 0
    while (p < vocab.length) { out(p + 1) = counts(p); p += 1 }
    new GenericArrayData(out)
  }

  // NULL string ≡ no n-grams (total 0, all counts 0 via the empty string).
  def ngramProfileCounts(
      str: Column, n: Int, profiles: Seq[Seq[String]]): Column =
    Bridge.column(NgramProfileCounts(
      Bridge.expression(coalesce(str, lit(""))), n, profiles))
}

/** Hashed-feature linear score over a gram-hash array, natively: element h
  * contributes `weights[h mod weights.length]` to a long sum — the
  * fastText-style "hashing trick" inner product (features are hashed gram
  * buckets, the model is one weight per bucket; Joulin et al. 2016,
  * arXiv:1607.01759) as ONE codegen'd loop with integer arithmetic.
  *
  * Composes with [[HashArray]] (also codegen'd), so the whole
  * tokens→grams→hashes→score chain is a single whole-stage-codegen map —
  * no explode, no shuffle, no interpreted lambda per gram. Integer weights
  * keep the sum exact (no float accumulation order), so the score is
  * bit-stable under any partitioning and the DuckDB twin matches from the
  * same modular formula.
  *
  * Null elements are skipped (explode-and-sum semantics); an empty or
  * all-null array scores 0.
  */
case class BucketWeightSum(child: Expression, weights: Seq[Int])
    extends UnaryExpression {

  require(weights.nonEmpty, "bucket weight table must be non-empty")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bucket_weight_sum expects array<bigint>, got ${other.simpleString}")
    }

  @transient private lazy val table: Array[Int] = weights.toArray

  override protected def nullSafeEval(input: Any): Any =
    BucketWeightSum.score(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val tableRef = ctx.addReferenceObj("weights", table, "int[]")
      val helper = "graft.functions.BucketWeightSum$.MODULE$"
      s"${ev.value} = $helper.score($arr, $tableRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): BucketWeightSum =
    copy(child = newChild)
}

object BucketWeightSum {

  def score(arr: ArrayData, table: Array[Int]): Long = {
    var acc = 0L
    val n = arr.numElements()
    val d = table.length
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        // Gram hashes are 60-bit (always >= 0), so % == pmod here.
        acc += table((arr.getLong(i) % d).toInt)
      }
      i += 1
    }
    acc
  }

  // NULL array ≡ score 0 (NULL text must not null the document's score).
  def bucketWeightSum(hashes: Column, weights: Seq[Int]): Column =
    Bridge.column(BucketWeightSum(Bridge.expression(
      coalesce(hashes, typedlit(Array.empty[Long]))), weights))
}
