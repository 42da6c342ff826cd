package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bound-pinning spec for the Count-Min point-frequency aggregate. */
class CountMinSpec extends SparkSpec {

  private def summarize(rows: Array[Row]): Map[String, Long] =
    rows.head.getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap

  test("wide sketch (no collisions expected): estimates are exact") {
    import spark.implicits._
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .toDF("item").repartition(4) // force partial-state merges
    val out = summarize(df.agg(CountMinEstimate
      .estimates(col("item"), Seq("a", "b", "c", "absent"), 1024, 5)
      .alias("est")).collect())
    assert(out === Map("a" -> 5L, "b" -> 3L, "c" -> 1L, "absent" -> 0L))
  }

  test("narrow sketch: est >= true always, est <= true + (e/width)*n") {
    import spark.implicits._
    // 200 distinct items crammed into width 32 — collisions guaranteed.
    val items = (1 to 200).flatMap(i => Seq.fill(i % 7 + 1)(s"item$i"))
    val n = items.size
    val width = 32
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val queries = Seq("item1", "item50", "item100", "item199", "nothere")
    val out = summarize(items.toDF("item").repartition(8)
      .agg(CountMinEstimate.estimates(col("item"), queries, width, 5)
        .alias("est")).collect())
    val band = math.ceil(math.E / width * n).toLong
    queries.foreach { q =>
      val truth = exact.getOrElse(q, 0L)
      assert(out(q) >= truth, s"$q undercounted: ${out(q)} < $truth")
      assert(out(q) <= truth + band,
        s"$q above the eps*n band: ${out(q)} > $truth + $band")
    }
  }

  test("estimates are deterministic under any partitioning (pure sums)") {
    import spark.implicits._
    val items = (1 to 500).map(i => s"w${i % 37}")
    val queries = (0 until 37).map(i => s"w$i")
    def run(parts: Int): Map[String, Long] =
      summarize(items.toDF("item").repartition(parts)
        .agg(CountMinEstimate.estimates(col("item"), queries, 64, 4)
          .alias("est")).collect())
    assert(run(1) === run(13),
      "CMS merge is an element-wise sum - partitioning must not change it")
  }

  test("null inputs are ignored, not counted") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("a"), None).toDF("item")
    val out = summarize(df.agg(CountMinEstimate
      .estimates(col("item"), Seq("a"), 64, 3).alias("est")).collect())
    assert(out === Map("a" -> 2L))
  }

  test("grouped estimates keep per-group state separate") {
    import spark.implicits._
    val df = Seq(("g1", "x"), ("g1", "x"), ("g2", "x"), ("g2", "y"))
      .toDF("g", "item").repartition(3)
    val rows = df.groupBy(col("g"))
      .agg(CountMinEstimate.estimates(col("item"), Seq("x", "y"), 64, 3)
        .alias("est"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Row](1).map(x => x.getString(0) -> x.getLong(1)).toMap)
      .toMap
    assert(rows("g1") === Map("x" -> 2L, "y" -> 0L))
    assert(rows("g2") === Map("x" -> 1L, "y" -> 1L))
  }
}
