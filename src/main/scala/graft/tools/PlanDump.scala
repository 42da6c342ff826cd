package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

/** Registry-wide formatted-plan dump: `runMain graft.tools.PlanDump
  * <outDir> [suffix] [nameRegex]` writes `<outDir>/<query>_<suffix>.txt`
  * with the `explain("formatted")` output of every registered query (the
  * optimization-guide §1 evidence artifact), plus `<outDir>/SUMMARY_
  * <suffix>.tsv` with one line per query: Exchange count, join operators,
  * WholeStageCodegen span count, and scan count — the plan-shape numbers
  * a before/after diff reads first.
  *
  * Building a query's DataFrame may run bounded driver-side work (trained
  * quantizer fits, scaled-refine counts) — that is part of the query's
  * declared construction and is the same work Bench pays before its timed
  * action.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <outDir> [suffix] [nameRegex]")
    val outDir = Paths.get(args(0))
    val suffix = if (args.length > 1) args(1) else "before"
    val nameFilter = if (args.length > 2) Some(args(2).r) else None
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fns = graft.SparkEntry.queries
    val names = fns.keys.toSeq.sorted
      .filter(n => nameFilter.forall(_.findFirstIn(n).isDefined))
    val summary = new StringBuilder(
      "query\texchanges\tbroadcast_exchanges\tsmj\tbhj\tshj\tbnlj\tcartesian\twscg\tscans\tplan_lines\n")
    names.foreach { n =>
      try {
        val df = fns(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.write(outDir.resolve(s"${n}_$suffix.txt"),
          plan.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        def count(tok: String): Int =
          plan.linesIterator.count(l => l.contains(tok))
        // "Exchange" alone would also match "BroadcastExchange" — count
        // shuffle exchanges as the difference.
        val bx = count("BroadcastExchange")
        val ex = count("Exchange") - bx
        summary.append(s"$n\t$ex\t$bx\t${count("SortMergeJoin")}\t" +
          s"${count("BroadcastHashJoin")}\t${count("ShuffledHashJoin")}\t" +
          s"${count("BroadcastNestedLoopJoin")}\t${count("CartesianProduct")}\t" +
          s"${count("WholeStageCodegen")}\t${count("Scan parquet")}\t" +
          s"${plan.linesIterator.size}\n")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n failed: ${e.getMessage}")
        summary.append(s"$n\tERR\t\t\t\t\t\t\t\t\t\n")
      }
    }
    Files.write(outDir.resolve(s"SUMMARY_$suffix.tsv"),
      summary.toString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    System.err.println(s"[plandump] wrote ${names.size} plans to $outDir")
    spark.stop()
  }
}
