package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrites the declarative vocabulary-count pattern
  *
  * {{{ size(filter(arr, w -> array_contains(<literal vocab>, w))) }}}
  *
  * to the native codegen'd [[CountInSet]] kernel. Spark evaluates
  * higher-order functions interpreted (CodegenFallback, no subexpression
  * elimination), so a SQL user writing the natural declarative form pays
  * |arr| interpreted lambda evaluations per row; after this rule they get
  * the same whole-stage-codegen'd loop the engine's own operators use.
  *
  * Rewrite conditions (all checked, otherwise the expression is left
  * untouched): the vocabulary is a string-array literal with no null
  * entries, the lambda variable is exactly the filter's bound variable,
  * and `size` is in non-legacy mode (legacy `size(null) = -1` differs
  * from the kernel's null propagation).
  */
object KernelSubstitution extends Rule[LogicalPlan] {

  private def vocabOf(lit: Literal): Option[Seq[String]] = lit match {
    case Literal(data: ArrayData, ArrayType(StringType, _)) if data != null =>
      val arr = data.toObjectArray(StringType)
      // A null vocab entry makes array_contains three-valued; keep the
      // declarative form rather than approximate it.
      if (arr.contains(null)) None
      else Some(arr.toSeq.map(_.asInstanceOf[UTF8String].toString))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case s @ Size(ArrayFilter(arr, LambdaFunction(
            ArrayContains(vocabLit: Literal, elem: NamedLambdaVariable),
            Seq(bound: NamedLambdaVariable), _)), false)
          if elem.exprId == bound.exprId =>
        vocabOf(vocabLit).map(CountInSet(arr, _)).getOrElse(s)
    }
}
