package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * functions with the SQL function registry, so pure-SQL users get them
  * too:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  *   ...
  * spark.sql("SELECT dot_product(a, b) FROM vectors")
  * }}}
  *
  * The Column API ([[DotProduct.dot]]) does not require the extension —
  * this is the SQL-surface registration only.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(
        classOf[DotProduct].getName,
        null,
        "dot_product",
        "dot_product(a, b) - dot product of two array<double> columns",
        ""),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException(
          s"dot_product expects 2 arguments, got ${children.size}")
      }))
  }
}
