package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min point-frequency estimates as a native
  * `TypedImperativeAggregate` — the counterpart to [[MisraGries]]: where
  * MG answers "which items are heavy?", Count-Min answers "how often did
  * THESE items occur?" for a fixed query list, in `depth × width` longs of
  * state no matter how many distinct items the stream carries (Cormode &
  * Muthukrishnan 2005). The shape a 100 TB token stream needs: the
  * distinct vocabulary is corpus-sized, the sketch is 80 KB.
  *
  * Every arriving item increments one counter per hash row; an item's
  * estimate is the MINIMUM of its `depth` counters. Guarantees:
  * `estimate ≥ true` always (counters only over-count, never under), and
  * `estimate ≤ true + (e/width)·N` with probability `1 − e^(−depth)` per
  * query. Unlike MG, the state is a pure element-wise SUM — merge is
  * commutative and associative — so the estimates are EXACTLY
  * deterministic under any partitioning or merge order (pinned by a unit
  * test), not merely bounded.
  *
  * `eval` reads the `items` query list (fixed at plan time, so the output
  * size is a constant independent of the data) and returns
  * `array<struct<item, count_est>>` in query-list order.
  *
  * Hash rows are seeded MurmurHash3 over the UTF-8 bytes — pure JVM
  * arithmetic, identical on every executor.
  */
case class CountMinEstimate(
    child: Expression,
    items: Seq[String],
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(width > 0, s"count_min needs a positive width, got $width")
  require(depth > 0, s"count_min needs a positive depth, got $depth")
  require(items.nonEmpty, "count_min needs a non-empty query-item list")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinEstimate =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_min expects a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count_est", LongType, nullable = false))))
  override def nullable: Boolean = false

  private def cell(item: String, row: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.bytesHash(
      item.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      0x9e3779b9 * (row + 1))
    java.lang.Math.floorMod(h, width)
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      var r = 0
      while (r < depth) {
        buf(r * width + cell(item, r)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) {
      buf(i) += other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val rows = items.map { item =>
      var est = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = buf(r * width + cell(item, r))
        if (c < est) est = c
        r += 1
      }
      InternalRow(UTF8String.fromString(item), est)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) {
      out.writeLong(buf(i))
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) {
      buf(i) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinEstimate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinEstimate =
    copy(inputAggBufferOffset = offset)

  override def prettyName: String = "count_min_estimate"
}

object CountMinEstimate {

  /** Column-API entry:
    * `df.groupBy(...).agg(CountMinEstimate.estimates(c, items, 2048, 5))`.
    */
  def estimates(
      c: Column, items: Seq[String],
      width: Int = 2048, depth: Int = 5): Column =
    Bridge.column(
      CountMinEstimate(Bridge.expression(c), items, width, depth)
        .toAggregateExpression())
}
