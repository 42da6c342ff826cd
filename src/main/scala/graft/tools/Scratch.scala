package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc measurement main used while calibrating audit floors — not part
  * of the query surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Optional env overrides: SCRATCH_DIMS / SCRATCH_SHORTLISTS are
    // comma-separated lists (defaults reproduce the r14 calibration run).
    val dimsList = sys.env.getOrElse("SCRATCH_DIMS", "16,64")
      .split(",").map(_.trim.toInt).toSeq
    val slList = sys.env.getOrElse("SCRATCH_SHORTLISTS", "5,20,40")
      .split(",").map(_.trim.toInt).toSeq
    for (dir <- args) {
      val emb = graft.harness.StandIn.embeddings(spark, dir)
      for (dims <- dimsList; sl <- slList) {
        val r = graft.ops.Similarity
          .rpShortlistRecallReport(emb, 5, sl, dims).collect().head
        println(s"[scratch] $dir dims=$dims sl=$sl recall=$r")
      }
      val cos = graft.ops.Similarity.rpCosineShrinkAudit(emb).collect().head
      println(s"[scratch] $dir shrink=$cos")
      if (sys.env.contains("SCRATCH_SQ8")) {
        for (refine <- sys.env("SCRATCH_SQ8").split(",").map(_.trim.toInt)) {
          val r = graft.ops.Similarity.recallAtK(
            graft.ops.Similarity.sq8TopK(emb, 5, refine),
            graft.ops.Similarity.bruteForceTopK(emb, 5)).collect().head
          println(s"[scratch] $dir sq8 refine=$refine recall=$r")
        }
      }
      if (sys.env.contains("SCRATCH_IVFPQ")) {
        for (refine <- sys.env("SCRATCH_IVFPQ").split(",").map(_.trim.toInt)) {
          val r = graft.ops.Similarity
            .ivfPqRecallReport(emb, cells = 8, k = 5, nprobe = 2,
              refine = refine).collect().head
          println(s"[scratch] $dir ivfpq refine=$refine recall=$r")
          val p = graft.ops.Similarity
            .pqRecallReport(emb, k = 5, refine = refine).collect().head
          println(s"[scratch] $dir pq    refine=$refine recall=$p")
        }
      }
    }
    spark.stop()
  }
}
