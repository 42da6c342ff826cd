package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The r20 topk_by_score aggregate must reproduce the window idiom it
  * replaced BIT FOR BIT: same rows, same ranks, under ties, nulls,
  * ±0.0, multiple partitions, and k larger than the group.
  */
class TopKByScoreSpec extends AnyFunSuite with SparkSpec {

  private def windowTopK(
      df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("id"))
    df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("id"), col("score"))
  }

  private def aggTopK(
      df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("q_id"))
      .agg(TopKByScore.topK(col("score"), col("id"), k).alias("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("q_id"), (col("pos") + 1).cast("int").alias("rank"),
        col("e.id").alias("id"), col("e.score").alias("score"))

  test("matches the row_number window under ties, nulls and ±0.0") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (1 to 4000).map { i =>
      val q = (i % 7).toLong
      val s: java.lang.Double =
        if (i % 97 == 0) null
        else if (i % 31 == 0) 0.0
        else if (i % 37 == 0) -0.0
        else math.rint(rng.nextDouble() * 20) / 20.0 // force score ties
      (q, i.toLong, s)
    }
    // 13 input partitions so map-side partials genuinely merge.
    val df = spark.createDataset(rows).toDF("q_id", "id", "score")
      .repartition(13)
    for (k <- Seq(1, 5, 1000)) {
      val want = windowTopK(df, k).collect().map(_.toSeq).toSet
      val got = aggTopK(df, k).collect().map(_.toSeq).toSet
      assert(got === want, s"k=$k")
    }
  }

  test("groups smaller than k emit all rows, ranked") {
    import spark.implicits._
    val df = Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (2L, 12L, 0.1))
      .toDF("q_id", "id", "score")
    val got = aggTopK(df, 5).orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 1, 11L), (1L, 2, 10L), (2L, 1, 12L)))
  }
}
