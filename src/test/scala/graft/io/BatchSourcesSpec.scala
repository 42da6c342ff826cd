package graft.io

import java.nio.file.Files

import graft.SparkSpec

/** Batch-source spec: JSONL payload dumps replay through the same parse
  * chain as live traffic.
  */
class BatchSourcesSpec extends SparkSpec {

  test("readingsFromJsonl parses payload dumps like the streaming chain") {
    val dir = Files.createTempDirectory("graft-jsonl")
    val good =
      """{"sensor_id":"A_1_100_temperature","sensor_type":"temperature",""" +
        """"location":{"building":"A","floor":1,"room":100},""" +
        """"timestamp":"2026-01-01 10:00:00","value":22.5,"unit":"celsius",""" +
        """"metadata":{"battery_level":87,"signal_strength":-55}}"""
    Files.write(dir.resolve("dump.jsonl"),
      s"$good\n{not json!\n".getBytes("UTF-8"))
    val out = Sources.readingsFromJsonl(spark, dir.toString).collect()
    assert(out.length === 2)
    val parsed = out.find(_.getAs[String]("sensor_id") != null).get
    assert(parsed.getAs[String]("sensor_id") === "A_1_100_temperature")
    assert(parsed.getAs[String]("building") === "A")
    assert(parsed.getAs[Double]("value") === 22.5)
    // PERMISSIVE: the malformed line lands as an all-null row, not a crash.
    assert(out.exists(_.getAs[String]("sensor_id") == null))
  }
}
