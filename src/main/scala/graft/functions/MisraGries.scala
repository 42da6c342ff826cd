package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy hitters as a native `TypedImperativeAggregate` —
  * bounded-memory approximate top-k frequency, the aggregate
  * [[graft.ops.Profile.keySkew]]'s exact groupBy cannot afford when the
  * distinct-key table itself is corpus-sized (billions of distinct tokens
  * at 100 TB; MG state is `k` counters per group, full stop).
  *
  * Classic algorithm (Misra & Gries 1982): maintain ≤ k counters; an
  * arriving item increments its counter, claims a free slot, or — when all
  * k slots are full of OTHER items — decrements every counter (dropping
  * zeros). Partial states merge by summing shared counters then
  * subtracting the (k+1)-largest total from all (the standard
  * guarantee-preserving merge). The guarantees, independent of merge
  * order: `true − n/(k+1) ≤ estimate ≤ true`, and any item with frequency
  * > n/(k+1) is ALWAYS in the summary. Exact counts are merge-order
  * dependent within that band, and so is the SURVIVOR COUNT — tied
  * counters can die together in a merge, so a group may surface fewer
  * than k items under one partitioning and k under another. Callers that
  * need a stable row count should over-provision capacity and truncate
  * the output (see TextAnalysis.heavyTerms); the unit tests pin the
  * bounds.
  *
  * `eval` returns `array<struct<item, count_est>>` sorted (count desc,
  * item asc) and truncated to k.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, s"misra_gries needs a positive k, got $k")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count_est", LongType, nullable = false))))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      if (buf.contains(item)) buf(item) += 1L
      else if (buf.size < k) buf(item) = 1L
      else {
        // Decrement-all: O(k), amortized O(1) per arriving item (each
        // decrement pass cancels k+1 prior increments).
        val dead = mutable.Buffer[String]()
        buf.keysIterator.foreach { key =>
          val c = buf(key) - 1L
          if (c <= 0L) dead += key else buf(key) = c
        }
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) =>
      buf(item) = buf.getOrElse(item, 0L) + c
    }
    if (buf.size > k) {
      // Subtract the (k+1)-largest count from everything; ≤ 0 drops out.
      // Exactly k survivors is not guaranteed (ties die together) — the
      // bound is what matters.
      val cut = buf.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.Buffer[String]()
      buf.keysIterator.foreach { key =>
        val c = buf(key) - cut
        if (c <= 0L) dead += key else buf(key) = c
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toSeq
      .sortBy { case (item, c) => (-c, item) }
      .take(k)
      .map { case (item, c) =>
        InternalRow(UTF8String.fromString(item), c)
      }
    new GenericArrayData(rows.toArray[Any])
  }

  // Length-prefixed UTF-8 bytes, NOT writeUTF: writeUTF throws past 64 KB
  // per string, and a generic aggregate must not crash on a long item (a
  // URL, a whole document used as a key).
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf(new String(b, java.nio.charset.StandardCharsets.UTF_8)) =
        in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)

  override def prettyName: String = "misra_gries"
}

object MisraGries {

  /** Column-API entry: `df.groupBy(...).agg(MisraGries.topItems(col, 10))`. */
  def topItems(c: Column, k: Int): Column =
    Bridge.column(MisraGries(Bridge.expression(c), k).toAggregateExpression())
}
