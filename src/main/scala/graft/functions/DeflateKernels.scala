package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of a string column, natively — the
  * compression-ratio quality signal (CCNet orders shards by LM quality
  * but production curation stacks also screen on zlib compressibility:
  * text that compresses far below ~1 byte/char is boilerplate or
  * repetition, text that barely compresses is noise/binary). Only the
  * SIZE is computed — compressed bytes go to a per-thread scratch buffer
  * and die there; nothing but an int leaves the row.
  *
  * Determinism: zlib at a fixed level is deterministic for a given input
  * on a given runtime, so the signal is stable within the engine; it is
  * NOT SQL-replayable (DuckDB has no deflate), so queries over it are
  * rows-only with a hash-checked audit contract pinning the invariants
  * (see TextRules.compressionAudit).
  */
case class DeflateSize(child: Expression, level: Int)
    extends UnaryExpression {

  require(level >= 1 && level <= 9, s"deflate level must be 1..9, got $level")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"deflate_size expects string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    DeflateSize.size(input.asInstanceOf[UTF8String], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val helper = "graft.functions.DeflateSize$.MODULE$"
      s"${ev.value} = $helper.size($s, $level);"
    })

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {

  // Per-thread deflater (reset between rows) + scratch output buffer:
  // zero allocation on the hot path, compressed bytes never retained.
  private val deflaters = new ThreadLocal[
      java.util.HashMap[Integer, java.util.zip.Deflater]] {
    override def initialValue() =
      new java.util.HashMap[Integer, java.util.zip.Deflater]()
  }
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue() = new Array[Byte](8192)
  }

  def size(s: UTF8String, level: Int): Int = {
    val perLevel = deflaters.get()
    var d = perLevel.get(level)
    if (d == null) {
      d = new java.util.zip.Deflater(level)
      perLevel.put(level, d)
    }
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = scratch.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  // NULL text ≡ empty string (the engine-wide NULL-text contract).
  def deflateSize(text: Column, level: Int = 6): Column =
    Bridge.column(DeflateSize(
      Bridge.expression(coalesce(text, lit(""))), level))
}
