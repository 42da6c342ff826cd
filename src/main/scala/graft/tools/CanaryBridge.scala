package graft.tools

import org.apache.spark.sql.SparkSession

/** v1↔v2 canary-protocol bridge (r19 verdict finding 3): round 19's
  * protocol change (v1 = ONE sample per site, taken AFTER the pass's
  * GC breather; v2 = TWO samples per site, taken BEFORE it) orphaned
  * the r16–r18 normalization history — BASELINE concedes "v1
  * normalization arithmetic cannot price this run", so any future
  * dispute against a v1-era artifact has no arithmetic bridge.
  *
  * This probe runs BOTH protocols back-to-back in ONE quiet session,
  * interleaved site-by-site so slow box drift cancels instead of
  * loading one arm: each round is [v1 site: gc → settle → 1 sample]
  * then [v2 site: 2 samples → gc → settle], repeated N times. The
  * committed conversion is `v1_min / v2_min` for the probed config —
  * a v1-era headline divides its canary_min by that factor before the
  * v2 normalization rule applies (BASELINE §Drift canary gets the
  * number and the sentence).
  *
  * Usage: `runMain graft.tools.CanaryBridge [cpus] [shuffleParts] [n]`
  * (defaults 32 / 32 / 6 — the sf0.1 bench config both protocols'
  * committed bases share).
  */
object CanaryBridge {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 32
    val parts = if (args.length > 1) args(1).toInt else 32
    val n = if (args.length > 2) args(2).toInt else 6
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def settle(): Unit = { System.gc(); Thread.sleep(1500) }
    // One throwaway warmup sample: BOTH protocols' committed bases sit
    // on probe-codegen-warmed JVMs (v1 sampled from the second bench
    // site onward in practice; v2's trust rule drops the first sample),
    // so the bridge must not charge either arm the one-time codegen.
    graft.harness.Canary.run(spark)
    val v1 = scala.collection.mutable.ArrayBuffer[Double]()
    val v2 = scala.collection.mutable.ArrayBuffer[Double]()
    (1 to n).foreach { _ =>
      settle()
      v1 += graft.harness.Canary.run(spark) // v1 site: post-GC, 1 sample
      v2 += graft.harness.Canary.run(spark) // v2 site: pre-GC pair …
      v2 += graft.harness.Canary.run(spark) // … riding prior garbage
    }
    def f2(d: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, d)
    val factor = v1.min / v2.min
    println(s"""{"kind":"canary_bridge","cpus":$cpus,""" +
      s""""shuffle_partitions":$parts,"rounds":$n,""" +
      s""""v1_s":${v1.map(f2).mkString("[", ",", "]")},""" +
      s""""v2_s":${v2.map(f2).mkString("[", ",", "]")},""" +
      s""""v1_min":${f2(v1.min)},"v2_min":${f2(v2.min)},""" +
      s""""v1_over_v2":${f2(factor)},""" +
      s""""v1_trusted":${graft.harness.Canary.trusted(0.0 +: v1.toSeq)},""" +
      s""""v2_trusted":${graft.harness.Canary.trusted(0.0 +: v2.toSeq)},""" +
      s""""note":"convert a v1-era canary_min to v2 terms by dividing by v1_over_v2; trusted flags prepend a dummy warmup slot because the bridge already paid codegen separately"}""")
    spark.stop()
  }
}
