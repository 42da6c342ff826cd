package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Native hash-set membership filter over a whole `array<string>` column:
  * keeps the elements whose 30-bit base hash ([[HashArray.hash60]] masked
  * to 30 bits — the engine's `baseHash30`) is (`keepMember = true`) or is
  * NOT (`keepMember = false`) in a fixed sorted long array, preserving
  * the input order. The streaming ingest screens use it to split each
  * document's shingle set into HOT grams (reference document-frequency
  * over the posting-index cap — boilerplate) and COLD grams (the capped
  * main path) under one consistent partition of the gram universe: both
  * stream and reference sides classify by the same hash, so a gram is
  * hot everywhere or nowhere and the prefix-filter completeness lemma
  * survives the split (see `Dedup.streamingSetSimScreen`).
  *
  * Why a custom Expression: the declarative form is
  * `filter(grams, g => !array_contains(lit(hot), hash(g)))` — an
  * interpreted HOF (CodegenFallback) doing an O(|hot|) linear scan plus
  * a full md5 chain per element. This is one codegen'd loop per row with
  * a binary search over a shared sorted array (the same
  * reference-object pattern as Spark's `InSet`).
  */
case class HashSetFilter(
    child: Expression, hashes: Array[Long], keepMember: Boolean)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = child.dataType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hash_set_filter expects array<string>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { if (!keepMember) out.add(null) }
      else {
        val s = arr.getUTF8String(i)
        val in = java.util.Arrays.binarySearch(
          hashes, HashArray.hash60(s, HashSetFilter.Mask30)) >= 0
        if (in == keepMember) out.add(s)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val hot = ctx.addReferenceObj("hotHashes", hashes, "long[]")
      val helper = HashArray.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val keep = if (keepMember) "" else "!"
      s"""
         |int $n = $arr.numElements();
         |java.util.ArrayList<Object> $out = new java.util.ArrayList<Object>($n);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) {
         |    ${if (!keepMember) s"$out.add(null);" else ""}
         |  } else {
         |    org.apache.spark.unsafe.types.UTF8String $m = $arr.getUTF8String($i);
         |    if ($keep(java.util.Arrays.binarySearch($hot,
         |        $helper.hash60($m, ${HashSetFilter.Mask30}L)) >= 0)) {
         |      $out.add($m);
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HashSetFilter =
    copy(child = newChild)
}

object HashSetFilter {

  /** 30-bit mask matching `Dedup.baseHash30` / [[HashArray.hashArray]]'s
    * masked form — the hash both sides of the screens already use. */
  val Mask30: Long = (1L << 30) - 1

  /** Elements whose 30-bit base hash is NOT in `sortedHashes` (order
    * preserved) — the COLD grams. `sortedHashes` MUST be sorted. */
  def reject(arr: Column, sortedHashes: Array[Long]): Column =
    Bridge.column(
      HashSetFilter(Bridge.expression(arr), sortedHashes, keepMember = false))

  /** Elements whose 30-bit base hash IS in `sortedHashes` (order
    * preserved) — the HOT grams. `sortedHashes` MUST be sorted. */
  def keep(arr: Column, sortedHashes: Array[Long]): Column =
    Bridge.column(
      HashSetFilter(Bridge.expression(arr), sortedHashes, keepMember = true))
}
