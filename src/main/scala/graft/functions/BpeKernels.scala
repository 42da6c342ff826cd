package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{coalesce, typedlit}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for byte-pair-encoding (Sennrich et al. 2016,
  * arXiv:1508.07909): the merge-application pass shared by training and
  * encoding.
  *
  * Merge semantics (the ONLY pass both kernels use, and the exact
  * semantics the DuckDB twins reproduce with space-delimited string
  * `replace`): one left-to-right scan per merge rule; every
  * NON-OVERLAPPING adjacent occurrence of (a, b) becomes the single
  * symbol a+b, and the scan resumes AFTER the merged pair — so
  * `a a a` under merge (a,a) yields `[aa, a]`, exactly like
  * `replace(' a a a ', ' a a ', ' aa ')`.
  */
private[graft] object BpeMerge {

  /** One merge pass over a symbol buffer, left-to-right non-overlapping. */
  def mergeOnce(syms: Array[String], a: String, b: String): Array[String] = {
    val n = syms.length
    if (n < 2) return syms
    val out = new scala.collection.mutable.ArrayBuffer[String](n)
    var i = 0
    while (i < n) {
      if (i < n - 1 && syms(i) == a && syms(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Code points of a word as one-char symbols (surrogate-pair safe —
    * matches RE2's `regexp_extract_all(w, '.')` on the oracle side).
    */
  def codePointSymbols(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** Full encode of one word: chars → every merge in table order. */
  def encodeWord(word: String, merges: Array[(String, String)]): Array[String] = {
    var syms = codePointSymbols(word)
    var m = 0
    while (m < merges.length && syms.length >= 2) {
      syms = mergeOnce(syms, merges(m)._1, merges(m)._2)
      m += 1
    }
    syms
  }
}

/** BPE-encode every word of an `array<string>` token column with a FIXED
  * merge table, natively: output is the concatenated symbol stream across
  * words (order preserved). One codegen'd loop per row; the per-word
  * encode memoizes in a bounded per-thread cache — natural-language words
  * are Zipf-distributed, so the hit rate at corpus scale is ~99 % and the
  * kernel runs at (amortized) hash-lookup cost per word, not at
  * merges×chars cost.
  *
  * This is the ENCODING half of BPE; training ([[graft.ops.Bpe.train]])
  * produces the merge table. Null tokens are skipped; a null array
  * encodes to an empty symbol stream.
  */
/** The GPT-2 byte→unicode table (Radford et al. 2019; the public
  * `bytes_to_unicode()` in openai/gpt-2 encoder.py): "printable" bytes
  * (33–126, 161–172, 174–255) map to their own code point; the other 68
  * bytes (controls, space, DEL, 127–160, soft hyphen) map to 256+n in
  * byte order — so space (0x20) is the 33rd non-printable and lands on
  * U+0120 'Ġ', newline on U+010A 'Ċ'. A bijection byte↔char, which is
  * the whole point: byte-level BPE runs on strings whose CODE POINTS are
  * the original BYTES, so the existing merge kernels (and the oracle's
  * per-code-point `regexp_extract_all(w, '.')` split) work unchanged.
  */
private[graft] object ByteUnicodeMap {
  val table: Array[Char] = {
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      val printable = (b >= 33 && b <= 126) || (b >= 161 && b <= 172) ||
        (b >= 174 && b <= 255)
      if (printable) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  /** Map every UTF-8 byte of the input to its table char. Multi-byte
    * code points fan out to one char PER BYTE — the byte fallback. */
  def map(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(table(bytes(i) & 0xff))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** String→string byte-to-unicode mapping as a native codegen expression —
  * the stage-zero projection of byte-level BPE ([[ByteUnicodeMap]]). */
case class ByteUnicode(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"byte_unicode expects string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    ByteUnicodeMap.map(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val helper = "graft.functions.ByteUnicodeMap$.MODULE$"
      s"${ev.value} = $helper.map($s);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): ByteUnicode = copy(child = newChild)
}

object ByteUnicode {
  def byteUnicode(c: Column): Column =
    Bridge.column(ByteUnicode(Bridge.expression(c)))
}

case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_encode expects array<string>, got ${other.simpleString}")
    }

  @transient private lazy val table: Array[(String, String)] = merges.toArray

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.encode(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val tableRef = ctx.addReferenceObj("merges", table,
        "scala.Tuple2[]")
      val helper = "graft.functions.BpeEncode$.MODULE$"
      s"${ev.value} = $helper.encode($arr, (scala.Tuple2[]) $tableRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  /** Per-thread, PER-MERGE-TABLE word→symbols memo — keyed by the table
    * array's identity (one table object per expression instance per task),
    * so two BPE expressions with different tables on the same executor
    * thread can never read each other's encodings. Bounded two ways:
    * at most [[TableCap]] tables per thread and [[CacheCap]] words per
    * table before a plain clear (a clear beats LRU bookkeeping — the Zipf
    * head re-fills in microseconds and the caps bound memory).
    */
  private val CacheCap = 65536
  private val TableCap = 8
  private val caches = new ThreadLocal[
      java.util.IdentityHashMap[AnyRef, java.util.HashMap[String, Array[UTF8String]]]] {
    override def initialValue() =
      new java.util.IdentityHashMap[AnyRef, java.util.HashMap[String, Array[UTF8String]]]()
  }

  /** The thread's memo for one merge table (creating it on first use). */
  private[functions] def tableCache(
      merges: Array[(String, String)]): java.util.HashMap[String, Array[UTF8String]] = {
    val perTable = caches.get()
    var cache = perTable.get(merges)
    if (cache == null) {
      if (perTable.size() >= TableCap) perTable.clear()
      cache = new java.util.HashMap[String, Array[UTF8String]]()
      perTable.put(merges, cache)
    }
    cache
  }

  /** Memoized symbol array of one word under one table. */
  private[functions] def cachedSyms(
      w: String,
      merges: Array[(String, String)],
      cache: java.util.HashMap[String, Array[UTF8String]]): Array[UTF8String] = {
    var syms = cache.get(w)
    if (syms == null) {
      if (cache.size() >= CacheCap) cache.clear()
      syms = BpeMerge.encodeWord(w, merges).map(UTF8String.fromString)
      cache.put(w, syms)
    }
    syms
  }

  def encode(toks: ArrayData, merges: Array[(String, String)]): GenericArrayData = {
    val cache = tableCache(merges)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val syms = cachedSyms(toks.getUTF8String(i).toString, merges, cache)
        var j = 0
        while (j < syms.length) { out += syms(j); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  // NULL tokens ≡ empty symbol stream (the engine-wide NULL-text contract).
  def bpeEncode(toks: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncode(Bridge.expression(
      coalesce(toks, typedlit(Array.empty[String]))), merges))

  /** Symbol COUNT without materializing the symbol array — the token-
    * accounting fast path (budgets need the number, not the symbols).
    */
  def bpeCount(toks: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeCount(Bridge.expression(
      coalesce(toks, typedlit(Array.empty[String]))), merges))
}

/** Count-only sibling of [[BpeEncode]]: emits the symbol count as an int,
  * never allocating the output array (shares the same per-thread word
  * memo through [[BpeEncode]]'s cache via the full encode on miss).
  */
case class BpeCount(child: Expression, merges: Seq[(String, String)])
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
          s"bpe_count expects array<string>, got ${other.simpleString}")
    }

  @transient private lazy val table: Array[(String, String)] = merges.toArray

  override protected def nullSafeEval(input: Any): Any =
    BpeCount.count(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val tableRef = ctx.addReferenceObj("merges", table, "scala.Tuple2[]")
      val helper = "graft.functions.BpeCount$.MODULE$"
      s"${ev.value} = $helper.count($arr, (scala.Tuple2[]) $tableRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

object BpeCount {
  def count(toks: ArrayData, merges: Array[(String, String)]): Int =
    BpeEncode.encode(toks, merges).numElements()
}

/** One merge-rule application over an `array<string>` symbol column —
  * the TRAINING-side kernel: each round of [[graft.ops.Bpe.train]] applies
  * the round's winning pair to every vocabulary word with this expression
  * (a pure codegen'd map over the bounded vocab table; the corpus itself
  * is never rescanned after the initial word count).
  */
case class MergePair(child: Expression, a: String, b: String)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"merge_pair expects array<string>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    MergePair.merge(input.asInstanceOf[ArrayData], a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val aRef = ctx.addReferenceObj("a", a, "java.lang.String")
      val bRef = ctx.addReferenceObj("b", b, "java.lang.String")
      val helper = "graft.functions.MergePair$.MODULE$"
      s"${ev.value} = $helper.merge($arr, $aRef, $bRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): MergePair =
    copy(child = newChild)
}

/** Budget-quantized document chunking, entirely inside the row: word i
  * joins chunk `floor(bpe_tokens_before_i / budget)` (the packSequences
  * running-sum-chop rule applied INTRA-document), and each chunk emits
  * `(chunk_id, n_chunk_bpe, chunk_text)` — so the whole chunker is one
  * codegen'd projection: scan → project → explode, ZERO shuffles, where a
  * window-over-exploded-words formulation would shuffle every word of the
  * corpus. Shares [[BpeEncode]]'s per-thread per-table word memo.
  */
case class BpeChunks(
    child: Expression, merges: Seq[(String, String)], budget: Int)
    extends UnaryExpression {

  require(budget > 0, s"chunk budget must be positive, got $budget")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BpeChunks.OutType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_chunks expects array<string>, got ${other.simpleString}")
    }

  @transient private lazy val table: Array[(String, String)] = merges.toArray

  override protected def nullSafeEval(input: Any): Any =
    BpeChunks.chunks(input.asInstanceOf[ArrayData], table, budget)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val tableRef = ctx.addReferenceObj("merges", table, "scala.Tuple2[]")
      val helper = "graft.functions.BpeChunks$.MODULE$"
      s"${ev.value} = $helper.chunks($arr, (scala.Tuple2[]) $tableRef, $budget);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeChunks =
    copy(child = newChild)
}

object BpeChunks {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.{IntegerType => IntT, StructField, StructType}

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_id", IntT, nullable = false),
    StructField("n_chunk_bpe", IntT, nullable = false),
    StructField("chunk_text", StringType, nullable = false))),
    containsNull = false)

  def chunks(
      toks: ArrayData,
      merges: Array[(String, String)],
      budget: Int): GenericArrayData = {
    val cache = BpeEncode.tableCache(merges)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    val text = new java.lang.StringBuilder()
    var chunkId = 0
    var chunkCount = 0
    var cum = 0L
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val w = toks.getUTF8String(i).toString
        val c = BpeEncode.cachedSyms(w, merges, cache).length
        val cid = (cum / budget).toInt
        if (cid != chunkId && chunkCount > 0) {
          out += InternalRow(chunkId, chunkCount,
            UTF8String.fromString(text.toString))
          text.setLength(0)
          chunkCount = 0
        }
        chunkId = cid
        if (chunkCount > 0) text.append(' ')
        text.append(w)
        chunkCount += c
        cum += c
      }
      i += 1
    }
    if (chunkCount > 0)
      out += InternalRow(chunkId, chunkCount,
        UTF8String.fromString(text.toString))
    new GenericArrayData(out.toArray)
  }

  def bpeChunks(
      toks: Column, merges: Seq[(String, String)], budget: Int): Column =
    Bridge.column(BpeChunks(Bridge.expression(
      coalesce(toks, typedlit(Array.empty[String]))), merges, budget))
}

object MergePair {

  def merge(syms: ArrayData, a: String, b: String): GenericArrayData = {
    val n = syms.numElements()
    val in = new Array[String](n)
    var i = 0
    while (i < n) {
      in(i) = if (syms.isNullAt(i)) "" else syms.getUTF8String(i).toString
      i += 1
    }
    new GenericArrayData(
      BpeMerge.mergeOnce(in, a, b).map(UTF8String.fromString(_): Any))
  }

  def mergePair(syms: Column, a: String, b: String): Column =
    Bridge.column(MergePair(Bridge.expression(
      coalesce(syms, typedlit(Array.empty[String]))), a, b))
}
