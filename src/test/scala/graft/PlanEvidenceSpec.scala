package graft

/** Physical-plan evidence for the scale story: filters reach the parquet
  * scan and unused columns never leave it. These queries are the ones the
  * driver benches — a regression that blocks pushdown or pruning (a stray
  * barrier, a select *, a non-deterministic wrapper too early) fails here
  * long before it shows up as a 100 TB scan reading every byte.
  */
class PlanEvidenceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def scanLine(q: String): String = {
    val plan = SparkEntry.queries(q)(spark, dir)
      .queryExecution.executedPlan.toString
    plan.linesIterator.find(_.contains("FileScan parquet"))
      .getOrElse(fail(s"no FileScan in $q plan"))
  }

  test("filter_predicates: predicates pushed into the lineitem scan, columns pruned") {
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    val scan = scanLine("filter_predicates")
    // The compound predicate reached the scan...
    assert(scan.contains("DataFilters: [isnotnull(l_returnflag"))
    assert(scan.contains("l_quantity") && scan.contains("l_discount"))
    // ...and the 6 untouched lineitem columns never leave the reader.
    for (c <- Seq("l_extendedprice", "l_tax", "l_shipdate", "l_partkey"))
      assert(!scan.contains(c), s"unused column $c not pruned from scan")
  }

  test("agg_sensor_stats: events scan reads only the aggregated columns") {
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val scan = scanLine("agg_sensor_stats")
    assert(scan.contains("ts#") && scan.contains("value"))
    // event_id and the wide props map stay in the file.
    for (c <- Seq("event_id", "props"))
      assert(!scan.contains(c), s"unused column $c not pruned from scan")
  }

  test("text queries: documents scan is (doc_id, text) and nothing more") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val scan = scanLine("text_token_counts")
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }
}
