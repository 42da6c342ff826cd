package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-surface registration: a session built with the extension can
  * call dot_product from plain SQL. Uses its own session because the
  * extension must be installed at session construction.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("dot_product is callable from SQL via spark.sql.extensions") {
    // Extensions apply only at session construction; clear the (possibly
    // existing) default session so getOrCreate builds a fresh one on the
    // shared SparkContext, and restore afterwards.
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // `withExtensions` is the programmatic twin of the
    // `spark.sql.extensions` config; the string form only applies when the
    // SparkContext itself is built with it, which a shared test context
    // is not.
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-spec")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val out = spark.sql(
        """SELECT dot_product(
          |  array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d""".stripMargin)
        .collect().head.getDouble(0)
      assert(out === 32.0)
      val err = intercept[Exception] {
        spark.sql("SELECT dot_product(array(1.0d))").collect()
      }
      assert(err.getMessage.contains("2 arguments") ||
        err.getMessage.toLowerCase.contains("invalid number of arguments"))

      // hash_family60, plain and masked, against the declarative chain.
      val h = spark.sql(
        """SELECT hash_family60(array('a', 'b')) AS h,
          |       hash_family60(array('a'), 1073741823L) AS m,
          |       array(CAST(conv(substring(md5('0:a'), 1, 15), 16, 10) AS LONG),
          |             CAST(conv(substring(md5('0:b'), 1, 15), 16, 10) AS LONG))
          |         AS chain""".stripMargin).collect().head
      assert(h.getSeq[Long](0) === h.getSeq[Long](2))
      assert(h.getSeq[Long](1) === Seq(h.getSeq[Long](2).head & 1073741823L))
      // Optimizer rule: the declarative vocabulary count compiles down to
      // the CountInSet kernel (non-literal input so constant folding
      // cannot evaluate the pattern away before the rewrite is visible).
      val sub = spark.range(3).selectExpr(
        """size(filter(array(concat('w', id), 'the', 'a'),
          |       w -> array_contains(array('the', 'a'), w))) AS c"""
          .stripMargin)
      assert(sub.queryExecution.optimizedPlan.toString
        .toLowerCase.contains("countinset"),
        s"kernel not substituted:\n${sub.queryExecution.optimizedPlan}")
      assert(sub.collect().map(_.getInt(0)).toSeq === Seq(2, 2, 2))
      // Guard: a NULL vocab entry makes array_contains three-valued — the
      // rule must leave the declarative form alone.
      val keep = spark.range(3).selectExpr(
        """size(filter(array(concat('w', id), 'the'),
          |       w -> array_contains(array('the', CAST(NULL AS STRING)), w)))
          |  AS c""".stripMargin)
      assert(!keep.queryExecution.optimizedPlan.toString
        .toLowerCase.contains("countinset"),
        "rule must not rewrite a null-bearing vocabulary")
      assert(keep.collect().map(_.getInt(0)).toSeq === Seq(1, 1, 1))

      // approx_top_items: the Misra-Gries aggregate from plain SQL.
      val mg = spark.sql(
        """SELECT approx_top_items(item, 4) AS top FROM VALUES
          |  ('a'), ('a'), ('a'), ('b'), ('c') AS t(item)""".stripMargin)
        .collect().head.getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1))
      assert(mg === Seq("a" -> 3L, "b" -> 1L, "c" -> 1L))
      val mgErr = intercept[Exception] {
        spark.sql("SELECT approx_top_items(item, item) FROM VALUES ('a') AS t(item)")
          .collect()
      }
      assert(mgErr.getMessage.contains("constant int k"))
    } finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
