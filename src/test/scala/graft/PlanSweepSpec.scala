package graft

import org.apache.spark.sql.catalyst.expressions.aggregate.ImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{FileSourceScanExec, LocalTableScanExec, RDDScanExec, RangeExec, SparkPlan}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Registry-wide physical-plan sweep (r17 verdict item 6; widened r18
  * with the unpartitioned-window screen and r20 with the broadcast
  * screen): every registered query's plan, not just the hand-picked
  * ones in [[PlanEvidenceSpec]], is screened for the scale-killer
  * shapes that have actually bitten this repo:
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
  private lazy val pinned: Set[String] = loadPins("plan_fallbacks.txt")

  /** Pinned query names AUDITED to plan an unpartitioned WindowExec
    * (r18 verdict item 5): a window with an empty partitionSpec funnels
    * its whole input through ONE task — the one remaining scale-killer
    * plan shape the sweep didn't catch. The audited instances are all
    * windows over DIMENSION-BOUNDED inputs (per-group aggregates,
    * decision cards, report frames — tens to thousands of rows at any
    * data scale), pinned per query in `plan_windows.txt` so a global
    * window over a data-scale input cannot ship silently.
    */
  private lazy val pinnedWindows: Set[String] = loadPins("plan_windows.txt")

  private def loadPins(resource: String): Set[String] = {
    val in = getClass.getResourceAsStream(s"/graft/$resource")
    require(in != null, s"missing test resource graft/$resource")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toSet
    finally in.close()
  }

  /** The unpartitioned-window detector under test below. */
  private def globalWindows(plan: SparkPlan): Seq[WindowExec] =
    plan.collectWithSubqueries {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }

  /** Pinned `query fingerprint` lines for every broadcast the registry
    * plans (r19 verdict item 5): a broadcast ships its WHOLE build side
    * to every executor, so a data-scale input reaching a
    * BroadcastExchange OOMs the fleet at 100× — the last scale-killer
    * plan shape the sweep didn't screen. The fingerprint is the sorted
    * set of leaf-scan names under the broadcast build side (`nation.parquet`,
    * `range`, `rdd` for checkpointed frames …), so a rewrite that drags
    * a NEW source under a broadcast — even in a query already audited
    * to broadcast something else — changes the line and fails the
    * sweep. Audited entries are all dimension-bounded builds: static
    * dims (region/nation/supplier), per-group aggregates, decision
    * cards, constant query draws. (Leaves named `rdd` are Materialize
    * localCheckpoints — bounded by the audit of the frame that was
    * checkpointed; same resolution caveat as the window pins.)
    */
  private lazy val pinnedBroadcasts: Set[String] =
    loadPins("plan_broadcasts.txt")

  private def leafName(p: SparkPlan): String = p match {
    case f: FileSourceScanExec => f.relation.location.rootPaths.headOption
      .map(_.getName).getOrElse("file")
    case _: RangeExec => "range"
    case _: LocalTableScanExec => "local"
    case _: RDDScanExec => "rdd"
    case other => other.nodeName
  }

  /** The broadcast detector under test below: one fingerprint per
    * broadcast JOIN in the plan — the sorted distinct leaf names under
    * the BUILD side. Matched at the strategy level (BroadcastHashJoin /
    * BroadcastNestedLoopJoin build side) because the sweep reads the
    * pre-AQE `sparkPlan`, where the BroadcastExchange nodes themselves
    * are not yet inserted (EnsureRequirements adds them during
    * executedPlan preparation).
    */
  private def broadcastFingerprints(plan: SparkPlan): Seq[String] =
    plan.collectWithSubqueries {
      case j: BroadcastHashJoinExec =>
        (j.buildSide match {
          case BuildLeft => j.left
          case BuildRight => j.right
        }).collectLeaves().map(leafName).distinct.sorted.mkString("+")
      case j: BroadcastNestedLoopJoinExec =>
        (j.buildSide match {
          case BuildLeft => j.left
          case BuildRight => j.right
        }).collectLeaves().map(leafName).distinct.sorted.mkString("+")
    }

  test("all registered queries: no CartesianProduct; no graft fallback " +
      "kernels; builtin fallbacks within the audited allowlist") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val carts = scala.collection.mutable.ArrayBuffer[String]()
    val graftFallbacks = scala.collection.mutable.ArrayBuffer[String]()
    val newFallbacks = scala.collection.mutable.ArrayBuffer[String]()
    val observed = scala.collection.mutable.SortedSet[String]()
    val observedWindows = scala.collection.mutable.SortedSet[String]()
    val newWindows = scala.collection.mutable.ArrayBuffer[String]()
    val observedBroadcasts = scala.collection.mutable.SortedSet[String]()
    val newBroadcasts = scala.collection.mutable.ArrayBuffer[String]()
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, dir).queryExecution.sparkPlan
        val nodes = plan.collectWithSubqueries { case p => p }
        if (nodes.exists(_.isInstanceOf[CartesianProductExec]))
          carts += name
        if (globalWindows(plan).nonEmpty) {
          observedWindows += name
          if (!pinnedWindows.contains(name)) newWindows += name
        }
        broadcastFingerprints(plan).distinct.foreach { fp =>
          observedBroadcasts += s"$name $fp"
          if (!pinnedBroadcasts.contains(s"$name $fp"))
            newBroadcasts += s"$name $fp"
        }
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
    // Always write the observed fingerprints: after an AUDITED plan
    // change, re-pinning is copying these files over the resources.
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/plan_fallbacks_observed.txt"),
      observed.mkString("", "\n", "\n").getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/plan_windows_observed.txt"),
      observedWindows.mkString("", "\n", "\n").getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/plan_broadcasts_observed.txt"),
      observedBroadcasts.mkString("", "\n", "\n").getBytes("UTF-8"))
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
    assert(newWindows.isEmpty,
      "unpartitioned WindowExec (single-task global window) NOT in the " +
        "pinned surface (src/test/resources/graft/plan_windows.txt) — if " +
        "the window's input is dimension-bounded, audit it and re-pin from " +
        "target/plan_windows_observed.txt; if it is data-scale, partition " +
        "it:\n" + newWindows.distinct.mkString("\n"))
    assert(newBroadcasts.isEmpty,
      "BroadcastExchange build NOT in the pinned surface " +
        "(src/test/resources/graft/plan_broadcasts.txt) — a broadcast " +
        "ships its whole build side to every executor, so audit that the " +
        "build is dimension-bounded at 100×, then re-pin from " +
        "target/plan_broadcasts_observed.txt; if it is data-scale, use a " +
        "shuffle join:\n" + newBroadcasts.distinct.mkString("\n"))
  }

  test("the broadcast detector names a deliberately broadcast " +
      "data-scale table") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    // The regression shape the screen exists for: a data-scale corpus
    // forced under a BroadcastExchange (OOMs every executor at 100×).
    // Planted deliberately; the detector must name the offending leaf,
    // or the pin-diff above is asserting nothing.
    val events = spark.read.parquet(s"$dir/events.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val planted = events.join(
      org.apache.spark.sql.functions.broadcast(docs),
      events("user_id") === docs("doc_id"))
    val fps = broadcastFingerprints(planted.queryExecution.sparkPlan)
    assert(fps.contains("documents.parquet"),
      s"detector failed to name the planted broadcast build: $fps")
    // And a broadcast-free plan must produce no fingerprints.
    assert(broadcastFingerprints(
      events.groupBy("user_id").count().queryExecution.sparkPlan).isEmpty,
      "detector flagged a plan with no broadcast")
  }

  test("the unpartitioned-window detector fires on a deliberate " +
      "global row_number over documents") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    // The regression shape the screen exists for: a data-scale input
    // through a window with no PARTITION BY — every row lands on ONE
    // task. Planted deliberately; the detector must see it, or the
    // sweep above is asserting nothing.
    val planted = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("doc_id")))
    assert(globalWindows(planted.queryExecution.sparkPlan).nonEmpty,
      "detector failed to flag a deliberately unpartitioned row_number")
    // And a properly partitioned window must NOT trip it.
    val partitioned = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy("doc_id")))
    assert(globalWindows(partitioned.queryExecution.sparkPlan).isEmpty,
      "detector flagged a partitioned window")
  }
}
