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

/** Bounded top-k by `(score DESC NULLS LAST, id ASC)` as a native
  * `TypedImperativeAggregate` — the partial-aggregation replacement for
  * the `row_number() OVER (PARTITION BY q_id ORDER BY score DESC, id)`
  * top-k idiom on the ANN hot paths.
  *
  * Why: the window form shuffles EVERY candidate row to the |queries|
  * distinct partition keys (a data-scale exchange into a constant number
  * of keys — ~50 reducer keys carrying |corpus|×|queries| rows at 100 TB)
  * and then sorts each partition. This aggregate keeps a k-bounded binary
  * heap per (q_id, task) during the map-side partial pass, so the
  * exchange carries at most `partitions × |queries| × k` rows and the
  * final merge touches constant-size state — the optimization-guide
  * "aggregate before you shuffle" rule applied to top-k.
  *
  * Output contract (bit-identical to the window it replaces): the array
  * holds the top `k` (score, id) pairs ordered by the SAME total order
  * Spark's `ORDER BY score DESC, id` uses — `java.lang.Double.compare`
  * semantics for the score (so NaN sorts greatest, −0.0 < 0.0) with NULL
  * scores last, ties by ascending id. Top-k under a total order is
  * merge-order independent, so partial aggregation cannot perturb
  * results. `eval` returns `array<struct<score, id>>` best-first;
  * positions map 1:1 to the window's `row_number` ranks.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKByScore.Heap] {

  require(k > 0, s"topk_by_score needs a positive k, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_by_score expects (double, bigint), got " +
          s"(${s.simpleString}, ${i.simpleString})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = true),
    StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKByScore.Heap =
    new TopKByScore.Heap(k)

  override def update(
      buf: TopKByScore.Heap, input: InternalRow): TopKByScore.Heap = {
    val s = score.eval(input)
    val i = id.eval(input)
    // A null id cannot occur on the paths this serves (ids are corpus
    // keys); drop such rows rather than invent an id — matches the
    // window's behavior only when ids are non-null, which the type
    // contract of every call site guarantees.
    if (i != null) {
      if (s == null) buf.insert(0.0, nul = true, i.asInstanceOf[Long])
      else buf.insert(s.asInstanceOf[Double], nul = false,
        i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(
      buf: TopKByScore.Heap, other: TopKByScore.Heap): TopKByScore.Heap = {
    var j = 0
    while (j < other.size) {
      buf.insert(other.scores(j), other.nulls(j), other.ids(j))
      j += 1
    }
    buf
  }

  override def eval(buf: TopKByScore.Heap): Any = {
    val idx = Array.range(0, buf.size)
    // Best-first: the exact (score DESC NULLS LAST, id ASC) order.
    val sorted = idx.sortWith((a, b) => buf.better(
      buf.scores(a), buf.nulls(a), buf.ids(a),
      buf.scores(b), buf.nulls(b), buf.ids(b)))
    new GenericArrayData(sorted.map { j =>
      InternalRow(if (buf.nulls(j)) null else buf.scores(j), buf.ids(j))
    }.toArray[Any])
  }

  override def serialize(buf: TopKByScore.Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var j = 0
    while (j < buf.size) {
      out.writeDouble(buf.scores(j))
      out.writeBoolean(buf.nulls(j))
      out.writeLong(buf.ids(j))
      j += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKByScore.Heap(k)
    var j = 0
    while (j < n) {
      buf.insert(in.readDouble(), in.readBoolean(), in.readLong())
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)

  override def prettyName: String = "topk_by_score"
}

object TopKByScore {

  /** k-bounded binary heap whose ROOT is the WORST kept element, so an
    * arriving row either beats the root (replace + sift) or is rejected
    * in one comparison — O(log k) worst case, O(1) for the typical
    * below-threshold row.
    */
  final class Heap(k: Int) {
    var size = 0
    val scores = new Array[Double](k)
    val nulls = new Array[Boolean](k)
    val ids = new Array[Long](k)

    /** `a` strictly better than `b` under (score DESC NULLS LAST, id ASC)
      * with Spark SQL's double ordering (SQLOrderingUtil.compareDoubles:
      * −0.0 equals 0.0, NaN compares greatest — NOT raw Double.compare,
      * which puts −0.0 below 0.0 and would diverge from the window sort
      * this aggregate replaces). */
    def better(sa: Double, na: Boolean, ia: Long,
        sb: Double, nb: Boolean, ib: Long): Boolean = {
      if (na != nb) return nb // the non-null one wins
      if (!na) {
        val c = if (sa == sb) 0 else java.lang.Double.compare(sa, sb)
        if (c != 0) return c > 0
      }
      ia < ib
    }

    private def worseAt(i: Int, sa: Double, na: Boolean, ia: Long): Boolean =
      better(sa, na, ia, scores(i), nulls(i), ids(i))

    def insert(s: Double, nul: Boolean, id: Long): Unit = {
      if (size < k) {
        var i = size
        scores(i) = s; nulls(i) = nul; ids(i) = id
        size += 1
        // Sift up: parent must be worse-or-equal than child.
        while (i > 0) {
          val p = (i - 1) >> 1
          if (better(scores(p), nulls(p), ids(p),
              scores(i), nulls(i), ids(i))) {
            swap(p, i); i = p
          } else i = 0
        }
      } else if (worseAt(0, s, nul, id)) {
        scores(0) = s; nulls(0) = nul; ids(0) = id
        // Sift down: move the new root below any better child.
        var i = 0
        var cont = true
        while (cont) {
          val l = 2 * i + 1
          val r = l + 1
          var w = i // the worst of (i, l, r) must sit on top
          if (l < size && better(scores(w), nulls(w), ids(w),
              scores(l), nulls(l), ids(l))) w = l
          if (r < size && better(scores(w), nulls(w), ids(w),
              scores(r), nulls(r), ids(r))) w = r
          if (w != i) { swap(i, w); i = w } else cont = false
        }
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val s = scores(a); scores(a) = scores(b); scores(b) = s
      val n = nulls(a); nulls(a) = nulls(b); nulls(b) = n
      val i = ids(a); ids(a) = ids(b); ids(b) = i
    }
  }

  /** Column-API entry: top `k` (score, id) structs, best-first, under
    * (score DESC NULLS LAST, id ASC). */
  def topK(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKByScore(
      Bridge.expression(score), Bridge.expression(id), k)
      .toAggregateExpression())
}
