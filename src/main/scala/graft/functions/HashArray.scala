package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5 hash family over a whole `array<string>` column:
  * element w ↦ the top 15 hex digits of md5("0:" + w) as a long, optionally
  * masked (`& mask`) — bit-identical to the declarative chain it replaces,
  *
  * {{{ transform(arr, w => conv(substring(md5(concat(lit("0:"), w)), 1, 15), 16, 10).cast("long")) }}}
  *
  * Why a custom Expression over the whole array: Spark's higher-order
  * functions are interpreted (CodegenFallback, no subexpression
  * elimination), and the md5→hex-string→substring→string-parse chain
  * allocates three intermediate strings per element. This expression is one
  * codegen'd loop per row with a single reused MessageDigest and zero
  * intermediate strings: digest the raw UTF-8 bytes, assemble the top 60
  * bits directly from the first 8 digest bytes. Measured ~5-10× on the
  * dedup signature hot path (the engine's heaviest queries).
  *
  * The md5 derivation is kept (not xxhash64) because it has an exact DuckDB
  * twin — `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)` — so every
  * dedup/fingerprint query stays oracle-checkable bit-for-bit.
  *
  * Reference for the pattern: Spark's collection expressions
  * (org.apache.spark.sql.catalyst.expressions.collectionOperations) and the
  * engine's own [[DotProduct]].
  */
case class HashArray(child: Expression, mask: Long = -1L)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hash_family60 expects array<string>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) null
        else HashArray.hash60(arr.getUTF8String(i), mask)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val helper = HashArray.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $n = $arr.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    $out[$i] = (Long) $helper.hash60($arr.getUTF8String($i), ${mask}L);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HashArray =
    copy(child = newChild)
}

object HashArray {

  private val Prefix = "0:".getBytes("UTF-8")

  // One digest per thread, reused across every row the task touches;
  // MessageDigest.digest() resets the instance after each call.
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** md5("0:" + s), top 15 hex digits as a long (60 bits, always ≥ 0),
    * masked. Equals `conv(substring(md5(concat('0:', s)), 1, 15), 16, 10)`:
    * the first 15 hex digits are the first 7 digest bytes plus the high
    * nibble of the 8th.
    */
  def hash60(s: UTF8String, mask: Long): Long = {
    val md = digests.get()
    md.update(Prefix)
    md.update(s.getBytes)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 7) {
      v = (v << 8) | (d(i) & 0xffL)
      i += 1
    }
    v = (v << 4) | ((d(7) & 0xffL) >>> 4)
    v & mask
  }

  /** Column-API entry: per-element 60-bit family hash of an array<string>. */
  def hashArray(arr: Column, mask: Long = -1L): Column =
    Bridge.column(HashArray(Bridge.expression(arr), mask))
}
