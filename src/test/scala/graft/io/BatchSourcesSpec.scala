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

  test("eventsFromCsv: explicit schema, malformed rows quarantined not dropped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
    val f = dir.resolve("events.csv")
    java.nio.file.Files.writeString(f,
      "event_id,ts,user_id,event_type,value,props\n" +
        "1,2024-01-01 10:00:00,7,view,10.5,\"{}\"\n" +
        "not_a_number,2024-01-01 10:00:01,7,click,1.0,\"{}\"\n" +
        "3,2024-01-01 10:00:02,8,purchase,99.0,\"{}\"\n")
    val out = Sources.eventsFromCsv(spark, dir.toString).collect()
    assert(out.length === 3) // bad row kept, not silently dropped
    val good = out.filter(_.isNullAt(out.head.fieldIndex("_corrupt_record")))
    assert(good.length === 2)
    assert(good.map(_.getAs[Long]("event_id")).toSet === Set(1L, 3L))
    val bad = out.filter(!_.isNullAt(out.head.fieldIndex("_corrupt_record")))
    assert(bad.length === 1)
    assert(bad.head.getAs[String]("_corrupt_record").startsWith("not_a_number"))
    assert(bad.head.isNullAt(bad.head.fieldIndex("event_id")))
  }
}
