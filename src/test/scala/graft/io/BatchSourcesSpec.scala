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

  test("eventsFromOrc: typed round-trip with predicate pushdown into the scan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-orc").resolve("events")
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 7L,
        "view", 10.5, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 7L,
        "click", 1.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 10:00:02"), 8L,
        "purchase", 99.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.orc(dir.toString)
    val back = Sources.eventsFromOrc(spark, dir.toString)
    val out = back.orderBy("event_id").collect()
    assert(out.length === 3)
    assert(out.map(_.getAs[Long]("event_id")).toSeq === Seq(1L, 2L, 3L))
    assert(out(2).getAs[String]("event_type") === "purchase")
    assert(out(0).getAs[Double]("value") === 10.5)
    // The ORC scan must push predicates + prune columns like parquet —
    // the reason the source pins an explicit schema.
    val plan = back.where("event_type = 'click'").select("event_id")
      .queryExecution.executedPlan.toString
    val scan = plan.linesIterator.find(_.contains("FileScan orc"))
      .getOrElse(fail(s"no ORC scan in plan:\n$plan"))
    assert(scan.contains("PushedFilters: [IsNotNull(event_type), " +
      "EqualTo(event_type,click)]"), s"predicate not pushed: $scan")
    assert(!scan.contains("props"), s"unused column not pruned: $scan")
  }

  test("eventsFromAvro: typed round-trip, filters reach the scan, schema pruned") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-avro").resolve("events")
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 7L,
        "view", 10.5, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 7L,
        "click", 1.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 10:00:02"), 8L,
        "purchase", 99.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.format("org.apache.spark.sql.avro.AvroFileFormat")
      .save(dir.toString)
    val back = Sources.eventsFromAvro(spark, dir.toString)
    val out = back.orderBy("event_id").collect()
    assert(out.length === 3)
    assert(out.map(_.getAs[Long]("event_id")).toSeq === Seq(1L, 2L, 3L))
    assert(out(2).getAs[String]("event_type") === "purchase")
    assert(out(0).getAs[Double]("value") === 10.5)
    // Avro has no row groups, but the filter still reaches the scan node
    // (deserializer-level pushdown) and the required schema prunes to the
    // projected columns.
    val plan = back.where("event_type = 'click'").select("event_id")
      .queryExecution.executedPlan.toString
    val scan = plan.linesIterator.find(_.contains("FileScan avro"))
      .getOrElse(fail(s"no Avro scan in plan:\n$plan"))
    assert(scan.contains("PushedFilters: [IsNotNull(event_type), " +
      "EqualTo(event_type,click)]"), s"predicate not pushed: $scan")
    assert(!scan.contains("props"), s"unused column not pruned: $scan")
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
