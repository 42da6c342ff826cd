package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Forces an expensive expression to be evaluated at most once per row.
  *
  * Why this exists: Catalyst's `PushDownPredicates` / `CollapseProject`
  * freely substitute projected aliases into consumers. For a chain like
  * `from_json → flatten → CaseWhen classify → filter(isNotNull)`, the
  * filter predicate ends up containing the whole CaseWhen with a copy of
  * `from_json` behind every field reference — and codegen's subexpression
  * elimination deliberately skips expressions inside CaseWhen *branches*
  * (eager evaluation could change semantics), so nothing dedupes them.
  * Measured on the alert chain: 28 `from_json` evaluations per input row.
  * At 100 TB that multiplies the dominant CPU cost of ingest by ~28×.
  *
  * The barrier: wrap the expression in a conditional on
  * `spark_partition_id() < 0` (never true, free to evaluate; chosen over
  * `monotonically_increasing_id` — rejected in streaming plans, and this
  * barrier guards the streaming ingest path too — and over `rand()`, whose
  * comparison against a constant the optimizer folds away). The wrapper is
  * value-transparent but non-deterministic, which both
  * (a) stops `PushDownPredicates` from substituting through the project
  * that computes it (`fields.forall(_.deterministic)` guard) and
  * (b) stops `CollapseProject` from duplicating it into consumers.
  * Result: the expensive expression lives in exactly one Project and
  * downstream operators reference it as a plain attribute.
  *
  * Trade-off: predicates originating above the barrier cannot be pushed
  * below it. Use it only around expressions (JSON/CSV parsing, regex
  * extraction) whose duplication costs more than pushdown could save —
  * for parse-then-filter pipelines the filter depends on the parsed
  * columns anyway, so nothing pushable is lost.
  */
object EvalOnce {

  /** Value-identical, non-deterministic wrapper around `c`. */
  def apply(c: Column): Column =
    when(spark_partition_id() < 0, lit(null)).otherwise(c)
}
