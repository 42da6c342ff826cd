package graft.ops

import graft.SparkSpec

/** Unit spec for P1-P4/P8-P9 (reference: data_persistance.py:75-89,
  * alert_detector.py:82-97,212-243).
  */
class ParseSpec extends SparkSpec {

  private val goodJson =
    """{"sensor_id":"A_1_100_temperature","sensor_type":"temperature",
      |"location":{"building":"A","floor":1,"room":100},
      |"timestamp":"2026-01-01 12:00:00.000000","value":22.47,
      |"unit":"celsius",
      |"metadata":{"battery_level":87,"signal_strength":-55}}"""
      .stripMargin.replace("\n", "")

  test("jsonToReadings flattens both nested structs") {
    import spark.implicits._
    val out = Parse.jsonToReadings(Seq(goodJson).toDF("json_str")).collect().head
    assert(out.getAs[String]("sensor_id") === "A_1_100_temperature")
    assert(out.getAs[String]("building") === "A")
    assert(out.getAs[Int]("floor") === 1)
    assert(out.getAs[Int]("room") === 100)
    assert(out.getAs[Double]("value") === 22.47)
    assert(out.getAs[Int]("battery_level") === 87)
    assert(out.getAs[Int]("signal_strength") === -55)
  }

  test("PERMISSIVE mode: malformed JSON becomes an all-null row, not an error") {
    import spark.implicits._
    val out = Parse.jsonToReadings(Seq("{not json!", "null", "42")
      .toDF("json_str")).collect()
    assert(out.length === 3)
    assert(out.forall(r => r.isNullAt(r.fieldIndex("sensor_id"))))
  }

  test("missing fields parse as nulls (lenient schema)") {
    import spark.implicits._
    val out = Parse.jsonToReadings(
      Seq("""{"sensor_id":"x","value":1.5}""").toDF("json_str")).collect().head
    assert(out.getAs[String]("sensor_id") === "x")
    assert(out.getAs[Double]("value") === 1.5)
    assert(out.isNullAt(out.fieldIndex("battery_level")))
  }

  test("readingsToJson → jsonToReadings round-trips the flat shape") {
    import spark.implicits._
    val parsed = Parse.jsonToReadings(Seq(goodJson).toDF("json_str"))
    val round = Parse.jsonToReadings(Parse.readingsToJson(parsed))
    assert(round.collect() === parsed.collect())
  }

  test("kafkaValueToJson casts binary value to string") {
    import spark.implicits._
    val frame = Seq(goodJson.getBytes("UTF-8")).toDF("value")
    val out = Parse.fromKafka(frame).collect().head
    assert(out.getAs[String]("sensor_id") === "A_1_100_temperature")
  }

  test("withEventTime casts the raw string to a timestamp, keeping the string") {
    import spark.implicits._
    val parsed = Parse.jsonToReadings(Seq(goodJson).toDF("json_str"))
    val out = Parse.withEventTime(parsed).collect().head
    assert(out.getAs[String]("timestamp") === "2026-01-01 12:00:00.000000")
    assert(out.getAs[java.sql.Timestamp]("event_time").toInstant.toString ===
      "2026-01-01T12:00:00Z")
  }

  test("propsKeyStats: path probe with missing/null/negative payloads accounted") {
    import spark.implicits._
    val ev = Seq(
      (1L, "click", """{"k": 10}"""),
      (2L, "click", """{"k":-3}"""),      // no space, negative
      (3L, "click", """{"other": 1}"""),  // path absent
      (4L, "view", null.asInstanceOf[String]), // null payload
      (5L, "view", """{"k": 7}"""))
      .toDF("event_id", "event_type", "props")
    val out = Parse.propsKeyStats(ev).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getInt(5), r.getInt(6)))).toMap
    assert(out("click") === ((3L, 2L, 1L, 7L, -3, 10)))
    assert(out("view") === ((2L, 1L, 1L, 7L, 7, 7)))
  }

  test("EvalOnce barrier keeps exactly one from_json in the optimized alert plan") {
    // A range-backed frame with non-foldable JSON, so neither
    // ConvertToLocalRelation nor ConstantFolding can pre-evaluate the parse.
    val frame = spark.range(4).selectExpr(
      """concat('{"sensor_id":"s","sensor_type":"temperature",',
        |'"unit":"celsius","value":', CAST(id AS STRING), '}')
        |AS json_str""".stripMargin)
    val parsed = Parse.jsonToReadings(frame)
    val plan = AlertRules.detect(parsed).queryExecution.optimizedPlan.toString
    assert("from_json".r.findAllIn(plan).size === 1)
  }
}
