package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bound-pinning spec for the Misra-Gries heavy-hitter aggregate. */
class MisraGriesSpec extends SparkSpec {

  private def summarize(rows: Array[Row]): Map[String, Long] =
    rows.head.getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap

  test("no overflow (distinct <= k): counts are exact") {
    import spark.implicits._
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .toDF("item").repartition(4) // force partial-state merges
    val out = summarize(
      df.agg(MisraGries.topItems(col("item"), 8).alias("top")).collect())
    assert(out === Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
  }

  test("overflow: estimates within [true - n/(k+1), true], heavy items present") {
    import spark.implicits._
    // Zipf-ish: 'hot' 400, 'warm' 200, then 100 singletons; n = 700, k = 8
    // → error band n/(k+1) ≈ 77.8. Both heavy items MUST survive any
    // partitioning/merge order.
    val items = Seq.fill(400)("hot") ++ Seq.fill(200)("warm") ++
      (1 to 100).map(i => s"rare$i")
    val df = items.toDF("item").repartition(8)
    val n = items.size
    val k = 8
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = summarize(
      df.agg(MisraGries.topItems(col("item"), k).alias("top")).collect())
    assert(out.size <= k)
    assert(out.contains("hot") && out.contains("warm"),
      s"items with freq > n/(k+1) must always survive: $out")
    out.foreach { case (item, est) =>
      val truth = exact(item)
      assert(est <= truth, s"$item overestimated: $est > $truth")
      assert(est >= truth - n / (k + 1),
        s"$item below the MG floor: $est < $truth - ${n / (k + 1)}")
    }
  }

  test("null inputs are ignored, not counted") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("a"), None).toDF("item")
    val out = summarize(
      df.agg(MisraGries.topItems(col("item"), 4).alias("top")).collect())
    assert(out === Map("a" -> 2L))
  }

  test("items past the 64KB writeUTF limit survive the partial-state roundtrip") {
    import spark.implicits._
    // repartition forces serialize/deserialize of partial states carrying
    // the oversized item — writeUTF would throw UTFDataFormatException.
    val big = "x" * 70000
    val df = (Seq.fill(3)(big) ++ Seq("small")).toDF("item").repartition(3)
    val out = summarize(
      df.agg(MisraGries.topItems(col("item"), 4).alias("top")).collect())
    assert(out === Map(big -> 3L, "small" -> 1L))
  }

  test("per-group summaries stay independent") {
    import spark.implicits._
    val df = (Seq.fill(3)(("g1", "x")) ++ Seq.fill(2)(("g2", "y")))
      .toDF("g", "item")
    val out = df.groupBy(col("g"))
      .agg(MisraGries.topItems(col("item"), 4).alias("top"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Row](1).map(t => t.getString(0) -> t.getLong(1)).toMap)
      .toMap
    assert(out("g1") === Map("x" -> 3L))
    assert(out("g2") === Map("y" -> 2L))
  }
}
