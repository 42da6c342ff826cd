package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{coalesce, typedlit}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for unigram-LM (SentencePiece-style) tokenization (Kudo
  * 2018, arXiv:1804.10959): Viterbi segmentation of a word under a fixed
  * piece→cost table.
  *
  * Cost space is INTEGER micro-nats (cost = -round(ln p × 10⁶)), so the
  * Viterbi minimization is exact integer arithmetic — no floating-point
  * summation-order hazard — and the DuckDB twins reproduce it bit-for-bit
  * with a recursive-CTE path enumeration. The segmentation of a word is
  * the one minimizing `(total_cost, piece_count, seg_string)`
  * lexicographically, where `seg_string` is the pieces joined by single
  * spaces; at equal position and piece count two candidate prefixes have
  * equal string length, so prefix order is preserved under extension and
  * the DP tiebreak is globally consistent with the oracle's
  * enumerate-then-ORDER-BY.
  *
  * A character absent from the table segments as a single-char piece at
  * [[UlmViterbi.UnkCost]] (full coverage is guaranteed when the table
  * includes every alphabet character, which both the fixed table and the
  * trainer's char floor do — the fallback exists so malformed tables fail
  * soft, not so the twins exercise it).
  */
private[graft] object UlmViterbi {

  /** Cost (micro-nats) of an out-of-vocabulary single character — far
    * above any smoothed piece probability so it is only chosen when no
    * in-vocabulary path exists. */
  val UnkCost = 25000000L

  /** Piece table resolved for segmentation: cost lookup, longest piece
    * length, and the per-thread word→pieces memo. */
  final class Table(vocab: Array[(String, Long)]) {
    val costs = new java.util.HashMap[String, java.lang.Long]()
    var maxLen = 1
    vocab.foreach { case (p, c) =>
      require(p.nonEmpty, "empty piece in unigram-LM vocab")
      require(c >= 0, s"negative piece cost for '$p'")
      costs.put(p, c)
      if (p.length > maxLen) maxLen = p.length
    }
    val memo = new java.util.HashMap[String, Array[UTF8String]]()
  }

  /** Min-cost segmentation of one word. DP over prefix length; ties break
    * by (piece count, then seg string) exactly like the oracle's
    * `ORDER BY cost, np, seg`. */
  def segment(word: String, t: Table): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val bc = Array.fill(n + 1)(Long.MaxValue)
    val bn = new Array[Int](n + 1)
    val bs = new Array[String](n + 1)
    bc(0) = 0L; bn(0) = 0; bs(0) = ""
    var i = 1
    while (i <= n) {
      var k = 1
      val kMax = math.min(t.maxLen, i)
      while (k <= kMax) {
        val j = i - k
        if (bc(j) != Long.MaxValue) {
          val piece = word.substring(j, i)
          val boxed = t.costs.get(piece)
          val pc =
            if (boxed != null) boxed.longValue()
            else if (k == 1) UnkCost
            else -1L
          if (pc >= 0L) {
            val c = bc(j) + pc
            val np = bn(j) + 1
            val seg = if (j == 0) piece else bs(j) + " " + piece
            if (c < bc(i) || (c == bc(i) &&
                (np < bn(i) || (np == bn(i) && seg < bs(i))))) {
              bc(i) = c; bn(i) = np; bs(i) = seg
            }
          }
        }
        k += 1
      }
      i += 1
    }
    if (bs(n).isEmpty) Array.empty else bs(n).split(" ")
  }
}

/** Viterbi-segment every word of an `array<string>` token column under a
  * FIXED piece table, natively: output is the concatenated piece stream
  * across words (order preserved). Same shape discipline as
  * [[BpeEncode]]: one codegen'd loop per row, per-thread per-table word
  * memo (Zipf hit rate), null tokens skipped, null array → empty stream.
  */
case class UlmSegment(child: Expression, vocab: Seq[(String, Long)])
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
          s"ulm_segment expects array<string>, got ${other.simpleString}")
    }

  @transient private lazy val table: Array[(String, Long)] = vocab.toArray

  override protected def nullSafeEval(input: Any): Any =
    UlmSegment.segmentAll(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val tableRef = ctx.addReferenceObj("vocab", table, "scala.Tuple2[]")
      val helper = "graft.functions.UlmSegment$.MODULE$"
      s"${ev.value} = $helper.segmentAll($arr, (scala.Tuple2[]) $tableRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): UlmSegment =
    copy(child = newChild)
}

object UlmSegment {

  /** Per-thread, per-vocab-table resolved tables — keyed by the vocab
    * array's identity (one array per expression instance per task), with
    * the same bounded-clear discipline as [[BpeEncode]]'s caches. */
  private val MemoCap = 65536
  private val TableCap = 8
  private val tables = new ThreadLocal[
      java.util.IdentityHashMap[AnyRef, UlmViterbi.Table]] {
    override def initialValue() =
      new java.util.IdentityHashMap[AnyRef, UlmViterbi.Table]()
  }

  private[functions] def resolve(
      vocab: Array[(String, Long)]): UlmViterbi.Table = {
    val perTable = tables.get()
    var t = perTable.get(vocab)
    if (t == null) {
      if (perTable.size() >= TableCap) perTable.clear()
      t = new UlmViterbi.Table(vocab)
      perTable.put(vocab, t)
    }
    t
  }

  private[functions] def cachedPieces(
      w: String, t: UlmViterbi.Table): Array[UTF8String] = {
    var ps = t.memo.get(w)
    if (ps == null) {
      if (t.memo.size() >= MemoCap) t.memo.clear()
      ps = UlmViterbi.segment(w, t).map(UTF8String.fromString)
      t.memo.put(w, ps)
    }
    ps
  }

  def segmentAll(
      toks: ArrayData, vocab: Array[(String, Long)]): GenericArrayData = {
    val t = resolve(vocab)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val ps = cachedPieces(toks.getUTF8String(i).toString, t)
        var j = 0
        while (j < ps.length) { out += ps(j); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  // NULL tokens ≡ empty piece stream (the engine-wide NULL-text contract).
  def ulmSegment(toks: Column, vocab: Seq[(String, Long)]): Column =
    Bridge.column(UlmSegment(Bridge.expression(
      coalesce(toks, typedlit(Array.empty[String]))), vocab))

  /** Piece COUNT without materializing the piece array — the token-
    * accounting fast path. */
  def ulmCount(toks: Column, vocab: Seq[(String, Long)]): Column =
    Bridge.column(UlmCount(Bridge.expression(
      coalesce(toks, typedlit(Array.empty[String]))), vocab))
}

/** Count-only sibling of [[UlmSegment]] (shares its per-thread memo via
  * the full segmentation on miss). */
case class UlmCount(child: Expression, vocab: Seq[(String, Long)])
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
          s"ulm_count expects array<string>, got ${other.simpleString}")
    }

  @transient private lazy val table: Array[(String, Long)] = vocab.toArray

  override protected def nullSafeEval(input: Any): Any =
    UlmCount.count(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val tableRef = ctx.addReferenceObj("vocab", table, "scala.Tuple2[]")
      val helper = "graft.functions.UlmCount$.MODULE$"
      s"${ev.value} = $helper.count($arr, (scala.Tuple2[]) $tableRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): UlmCount =
    copy(child = newChild)
}

object UlmCount {
  def count(toks: ArrayData, vocab: Array[(String, Long)]): Int = {
    val t = UlmSegment.resolve(vocab)
    var total = 0
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i))
        total += UlmSegment.cachedPieces(toks.getUTF8String(i).toString, t).length
      i += 1
    }
    total
  }
}
