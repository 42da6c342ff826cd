package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone canary-basis probe: runs [[graft.harness.Canary]] N times
  * under a given session config and prints the samples + min, so a
  * quiet-host `canary_basis` for a NEW config/protocol can be committed
  * without paying for the full bench that config belongs to (the r19
  * StreamBench normalization needed exactly this — BASELINE §Drift
  * canary, config- and protocol-specific bases).
  *
  * Usage: `runMain graft.tools.CanaryProbe [cpus] [shufflePartitions] [n]`
  * (defaults 8 / 8 / 6 — the StreamBenchMain session shape).
  */
object CanaryProbe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 8
    val parts = if (args.length > 1) args(1).toInt else 8
    val n = if (args.length > 2) args(2).toInt else 6
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val samples = (1 to n).map(_ => graft.harness.Canary.run(spark))
    def f2(d: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, d)
    println(s"""{"kind":"canary_probe","cpus":$cpus,"shuffle_partitions":$parts,""" +
      s""""canary_s":${samples.map(f2).mkString("[", ",", "]")},""" +
      s""""canary_min":${f2(samples.min)},""" +
      s""""canary_trusted":${graft.harness.Canary.trusted(samples)}}""")
    spark.stop()
  }
}
