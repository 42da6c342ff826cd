package graft.functions

import graft.SparkSpec

/** Unit spec for the native DotProduct expression: interpreted and codegen
  * paths, null propagation, and type checking.
  */
class DotProductSpec extends SparkSpec {

  private def frame(rows: (Seq[Double], Seq[Double])*) = {
    import spark.implicits._
    rows.toSeq.toDF("a", "b")
  }

  test("dot product over range-backed data (whole-stage codegen path)") {
    import org.apache.spark.sql.functions._
    val df = spark.range(3).select(
      transform(sequence(lit(0), lit(3)), i => (col("id") + i).cast("double"))
        .alias("a"),
      transform(sequence(lit(0), lit(3)), i => lit(1.0) + i * 0).alias("b"))
    val out = df.select(DotProduct.dot(col("a"), col("b")).alias("d"))
      .collect().map(_.getDouble(0))
    // id=0: 0+1+2+3=6; id=1: 1+2+3+4=10; id=2: 14
    assert(out.toSeq === Seq(6.0, 10.0, 14.0))
    val plan = df.select(DotProduct.dot(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)")) // inside whole-stage codegen
  }

  test("matches the higher-order-function fold bit-for-bit") {
    import org.apache.spark.sql.functions._
    val df = frame(
      (Seq(0.1, -2.5, 3.375), Seq(1.25, 0.5, -0.875)),
      (Seq(1e-300, 1e300, -1.0), Seq(1e300, 1e-300, 1.0)))
    val out = df.select(
      DotProduct.dot(col("a"), col("b")).alias("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0),
        (acc, x) => acc + x).alias("hof"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("mismatched lengths yield null, not a truncated product") {
    import org.apache.spark.sql.functions._
    val out = frame((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0)))
      .select(DotProduct.dot(col("a"), col("b")))
      .collect().head
    assert(out.isNullAt(0))
  }

  test("null array propagates to null result") {
    import org.apache.spark.sql.functions._
    val out = frame((Seq(1.0), Seq(2.0)))
      .select(DotProduct.dot(lit(null).cast("array<double>"), col("b")))
      .collect().head
    assert(out.isNullAt(0))
  }

  test("type mismatch is rejected at analysis time") {
    import org.apache.spark.sql.functions._
    val ex = intercept[Exception] {
      frame((Seq(1.0), Seq(2.0)))
        .select(DotProduct.dot(lit("nope"), col("b"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("dot_product") ||
      ex.getMessage.toLowerCase.contains("datatype_mismatch") ||
      ex.getMessage.toLowerCase.contains("cannot resolve"))
  }
}
