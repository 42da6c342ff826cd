package graft.tools

import org.apache.spark.sql.SparkSession

/** One-query plan-and-wall probe: `runMain graft.tools.Probe <query>
  * [sfDir] [runs]` prints the formatted physical plan and per-run wall
  * to stderr — the plan-audit loop BASELINE.md's per-query notes come
  * from, as a tool instead of ad-hoc edits.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Probe <query> [sfDir] [runs]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val shuffleParts = sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS",
      try {
        val li = java.nio.file.Paths.get(s"$sfDir/lineitem.parquet")
        if (java.nio.file.Files.exists(li) &&
          java.nio.file.Files.size(li) > 512L * 1024 * 1024) "128" else cpus
      } catch { case _: Throwable => cpus })
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    System.err.println(fn(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      System.err.println(f"[probe] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
