package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job-level profile of one registered query: `runMain graft.tools.ProbeJobs
  * <query> [sfDir] [runs]` runs the query warm and prints, for the LAST
  * run, every Spark job it spawned with wall time, stage/task counts and
  * shuffle bytes — the §1 "where does the time actually go" breakdown the
  * SQL tab would show, as text. Construction (driver-side training,
  * bounded collects, eager localCheckpoints) happens inside the measured
  * window, matching Bench's timed region.
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProbeJobs <query> [sfDir] [runs]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)

    case class Job(id: Int, desc: String, start: Long,
        var end: Long = 0L, var stages: Int = 0, var tasks: Int = 0,
        var shuffleReadB: Long = 0L, var shuffleWriteB: Long = 0L,
        var spillB: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(e.jobId, Job(e.jobId, d, System.nanoTime()))
        e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = System.nanoTime()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val jid = stageToJob.get(e.stageInfo.stageId)
        val j = if (jid != null) jobs.get(jid) else null
        if (j != null) {
          j.stages += 1
          j.tasks += e.stageInfo.numTasks
          val m = e.stageInfo.taskMetrics
          if (m != null) {
            j.shuffleReadB += m.shuffleReadMetrics.totalBytesRead
            j.shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
            j.spillB += m.diskBytesSpilled
          }
        }
      }
    }

    for (i <- 1 to runs) {
      val last = i == runs
      if (last) { jobs.clear(); stageToJob.clear()
        spark.sparkContext.addSparkListener(listener) }
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[probe] $name run $i: $wall%.2f s")
      if (last) {
        // Let straggler listener events drain before reading.
        Thread.sleep(300)
        spark.sparkContext.removeSparkListener(listener)
        import scala.jdk.CollectionConverters._
        val js = jobs.values.asScala.toSeq.sortBy(_.start)
        val t00 = js.headOption.map(_.start).getOrElse(0L)
        var sum = 0.0
        js.foreach { j =>
          val dur = (j.end - j.start) / 1e9
          sum += dur
          val gap = (j.start - t00) / 1e9
          System.err.println(
            f"[job] ${j.id}%3d at $gap%6.2f dur $dur%6.3f s stages ${j.stages}%2d " +
              f"tasks ${j.tasks}%4d shr ${j.shuffleReadB / 1024}%8d KiB " +
              f"shw ${j.shuffleWriteB / 1024}%8d KiB spill ${j.spillB / 1024}%6d KiB  ${j.desc.take(60)}")
        }
        System.err.println(f"[probe] $name: ${js.size} jobs, job-time sum $sum%.2f s, wall $wall%.2f s (gap = driver/planning)")
      }
    }
    spark.stop()
  }
}
