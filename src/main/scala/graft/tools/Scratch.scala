package graft.tools

import org.apache.spark.sql.SparkSession

/** Designated ad-hoc measurement area — NOT part of the query surface,
  * the bench protocol, or any committed artifact. Calibration
  * experiments live here only while they run; once a conclusion is
  * pinned in a harness and BASELINE.md, the experiment body is removed
  * (r17 verdict item 7: the r17 RocksDB provider sweep that lived here
  * is now pinned in `harness/StreamBench.pinProvider` and
  * BASELINE §streaming — keeping the spent experiment as a live main
  * was residue).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("[scratch] no active experiment (see scaladoc)")
    spark.stop()
  }
}
