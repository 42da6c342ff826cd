package graft.tools

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Ad-hoc measurement main used while calibrating — not part of the query
  * surface. Current experiment (r17): RocksDB vs HDFS provider on the
  * big-state set-sim screen (r16 verdict item 5) — sweeps
  * changelogCheckpointing × trackTotalNumberOfRows on the SAME fixture
  * StreamBench carries, to decide which config (if any) closes the 1.6×
  * gap before pinning it in StreamBench.
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
    import spark.implicits._

    val Keys = 1000
    val BaseMs = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def ts(batch: Int, i: Int): Timestamp =
      new Timestamp(BaseMs + (batch + 1).toLong * 600000L + (i % 60000).toLong)
    val wordPool = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lam", "mu")
    def sentence(seed: Int): String =
      (0 until 8).map(j => wordPool((seed + j * j) % wordPool.size))
        .mkString(" ")
    val refDocs = (0 until 1000)
      .map(i => (100000L + i, sentence(i % 64)))
      .toDF("doc_id", "text")

    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val hdfs =
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    val cases = Seq(
      ("hdfs_base", hdfs, Map.empty[String, String]),
      ("rocks_base", rocks, Map(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "false")),
      ("rocks_changelog", rocks, Map(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")),
      ("rocks_changelog_notrack", rocks, Map(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
        "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows" -> "false")),
      ("rocks_notrack", rocks, Map(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "false",
        "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows" -> "false")))

    val ckptRoot = Files.createTempDirectory("graft-scratch")
    for ((name, provider, confs) <- cases) {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val input = MemoryStream[(Long, String, Timestamp)](spark)
      val q = graft.ops.Dedup.streamingSetSimScreen(
        input.toDF().toDF("doc_id", "text", "event_time")
          .withWatermark("event_time", "10 minutes"),
        refDocs, threshold = 0.5)
        .writeStream.format("noop").outputMode("append")
        .option("checkpointLocation", ckptRoot.resolve(name).toString)
        .start()
      try {
        input.addData((0 until 100).map(i =>
          (-1000L + i, sentence(i % 64) + s" w${i % 7}", ts(-1, i))))
        q.processAllAvailable()
        val t0 = System.nanoTime()
        (0 until 3).foreach { b =>
          input.addData((0 until 20000).map { i =>
            val id = b.toLong * 20000 + i
            (id, sentence(i % 64) + s" w${i % 7}", ts(b, i))
          })
          q.processAllAvailable()
        }
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[scratch] $name%-24s ${60000 / secs}%.0f rows/s ($secs%.1f s)")
      } finally q.stop()
      confs.keys.foreach(spark.conf.unset)
    }
    spark.stop()
  }
}
