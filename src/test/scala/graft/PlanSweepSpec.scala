package graft

import org.apache.spark.sql.catalyst.expressions.aggregate.ImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Registry-wide physical-plan sweep (r17 verdict item 6): every
  * registered query's plan, not just the hand-picked ones in
  * [[PlanEvidenceSpec]], is screened for the two scale-killer shapes
  * that have actually bitten this repo:
  *
  *  1. `CartesianProductExec` — a product join over data-scale inputs
  *     multiplies at 100 TB. The repo's legitimate cross joins are
  *     1-row-report × frame broadcasts, which Spark plans as
  *     `BroadcastNestedLoopJoin`, so a CartesianProduct anywhere in the
  *     registry is a regression by definition.
  *  2. Interpreted (CodegenFallback) expressions in the hot path — the
  *     r14 regression class: a custom kernel (shingles) silently falling
  *     out of codegen turned a scan-speed projection into per-row
  *     interpreted evaluation. Every `graft.*` expression must stay
  *     codegen'd (none mixes in CodegenFallback today — pinned here),
  *     and each query's set of BUILTIN fallback expression classes is
  *     pinned PER QUERY in `src/test/resources/graft/plan_fallbacks.txt`
  *     — a rewrite that drags a NEW interpreted class into a query's
  *     plan (e.g. an `ArrayTransform` HOF where a codegen'd kernel ran)
  *     fails this sweep instead of shipping. The repo's audited fallback
  *     surface is the HOF lambda family over BOUNDED per-row arrays
  *     (token lists, fixed-dim embeddings, quantile bin arrays),
  *     `JsonToStructs` (from_json IS the reference operator), and
  *     `HllSketchEstimate` (a projection over a tiny sketch column);
  *     per-query pinning means even those audited classes cannot spread
  *     to new queries silently. (Same-class regressions inside one query
  *     — swapping one HOF body for another — are below this guard's
  *     resolution; the per-query plan asserts in PlanEvidenceSpec carry
  *     those.)
  *
  * The sweep reads `queryExecution.sparkPlan` (the pre-AQE physical
  * plan): static shape, deterministic, no execution — construction cost
  * at sf0.001 is the eager Materialize passes some queries run, which is
  * the same cost Verify pays there. The observed fingerprint is written
  * to `target/plan_fallbacks_observed.txt` every run, so re-pinning
  * after an AUDITED plan change is copy-paste, not archaeology.
  */
class PlanSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Pinned (query, builtin-fallback-class) pairs — the audited plan
    * surface. Loaded from test resources; one `query className` per
    * line, '#' comments.
    */
  private lazy val pinned: Set[String] = {
    val in = getClass.getResourceAsStream("/graft/plan_fallbacks.txt")
    require(in != null, "missing test resource graft/plan_fallbacks.txt")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toSet
    finally in.close()
  }

  test("all registered queries: no CartesianProduct; no graft fallback " +
      "kernels; builtin fallbacks within the audited allowlist") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val carts = scala.collection.mutable.ArrayBuffer[String]()
    val graftFallbacks = scala.collection.mutable.ArrayBuffer[String]()
    val newFallbacks = scala.collection.mutable.ArrayBuffer[String]()
    val observed = scala.collection.mutable.SortedSet[String]()
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, dir).queryExecution.sparkPlan
        val nodes = plan.collectWithSubqueries { case p => p }
        if (nodes.exists(_.isInstanceOf[CartesianProductExec]))
          carts += name
        // ImperativeAggregate (TypedImperativeAggregate) is excluded:
        // Spark's own sketch aggregates (HLL++, percentile_approx) ride
        // the same contract — it formally mixes in CodegenFallback, but
        // evaluation is the aggregate operator's buffer update, not a
        // per-row interpreted projection. The repo's MisraGries /
        // CountMin aggregates are that sanctioned shape.
        val fallbacks = nodes.flatMap(_.expressions)
          .flatMap(_.collect {
            case e: CodegenFallback if !e.isInstanceOf[ImperativeAggregate] =>
              e
          })
          .map(_.getClass.getName).distinct
        fallbacks.foreach { c =>
          if (c.startsWith("graft.")) graftFallbacks += s"$name: $c"
          else {
            observed += s"$name $c"
            if (!pinned.contains(s"$name $c")) newFallbacks += s"$name $c"
          }
        }
      } catch { case e: Throwable =>
        errors += s"$name: ${e.getClass.getSimpleName} ${e.getMessage}"
      } finally {
        // Same per-query hygiene as Verify: drop the eager Materialize
        // blocks so 263 constructions don't accumulate checkpoint RDDs.
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    // Always write the observed fingerprint: after an AUDITED plan
    // change, re-pinning is copying this file over the resource.
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/plan_fallbacks_observed.txt"),
      observed.mkString("", "\n", "\n").getBytes("UTF-8"))
    assert(errors.isEmpty, s"queries failed to plan:\n${errors.mkString("\n")}")
    assert(carts.isEmpty,
      s"CartesianProduct planned by:\n${carts.mkString("\n")}")
    assert(graftFallbacks.isEmpty,
      "graft kernels fell out of codegen (the r14 regression class):\n" +
        graftFallbacks.mkString("\n"))
    assert(newFallbacks.isEmpty,
      "interpreted (CodegenFallback) expressions NOT in the pinned plan " +
        "surface (src/test/resources/graft/plan_fallbacks.txt) — audit the " +
        "plan, then re-pin from target/plan_fallbacks_observed.txt:\n" +
        newFallbacks.distinct.mkString("\n"))
  }
}
