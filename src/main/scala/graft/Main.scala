package graft

import org.apache.spark.sql.SparkSession

import graft.config.PipelineConfig
import graft.io.AlertNotifier

/** Production entry point: start all four streaming units against the
  * configured Kafka/Postgres endpoints and supervise until termination
  * (reference: spark_processing/main.py:19-67; see Pipeline for the
  * deliberate differences). Requires the Kafka connector and a JDBC driver
  * on the classpath — not available in the offline test container, where
  * the MemoryStream specs cover the same code paths.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val cfg = PipelineConfig.fromEnv()
    val builder = SparkSession.builder()
      .appName("graft-iot-pipeline")
      .config("spark.sql.session.timeZone", "UTC")
    // RocksDB state store (SURVEY §7.5.6): bounded-memory streaming state
    // for the windowed aggregation at scale; opt-in because local tests and
    // tiny deployments are fine on the default HDFS-backed provider.
    if (sys.env.get("GRAFT_ROCKSDB_STATE").contains("true"))
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ALERT_NOTIFIER=smtp wires real delivery; default stays log-only.
    val pipeline = new Pipeline(spark, cfg, AlertNotifier.forConfig(cfg))
    try {
      val queries = pipeline.startAll()
      println(s"Started ${queries.size} streaming queries; awaiting termination")
      pipeline.runUntilTermination()
    } finally {
      // A failure starting the Nth query must not leave the first N-1
      // running in a half-up process.
      pipeline.stopAll()
      spark.stop()
    }
  }
}
