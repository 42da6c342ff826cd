package graft.io

import java.nio.file.Files

import graft.SparkSpec

/** Plan evidence for parquet SCHEMA EVOLUTION — the lakehouse reality
  * that a 100 TB table is written over months by evolving jobs: new
  * ingest batches grow columns the old files lack. `mergeSchema` union-
  * reads the fleet (old rows null-fill the new column); the explicit-
  * schema read pins the contract a downstream job compiled against,
  * regardless of which files happen to be scanned. Both paths must keep
  * predicate pushdown — evolution must not cost the scan its filters.
  */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchema unions evolving batches; explicit schema pins the contract") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evolve").toString
    // Month 1: (event_id, value). Month 2 adds quality.
    Seq((1L, 10.0), (2L, 20.0)).toDF("event_id", "value")
      .write.parquet(s"$dir/batch=1")
    Seq((3L, 30.0, 5), (4L, 40.0, 9)).toDF("event_id", "value", "quality")
      .write.parquet(s"$dir/batch=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("batch", "event_id", "quality", "value"))
    val rows = merged.collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("quality"))) None
         else Some(r.getInt(r.fieldIndex("quality"))))).toMap
    // Old files NULL-fill the evolved column; new files carry it.
    assert(rows === Map(1L -> None, 2L -> None, 3L -> Some(5), 4L -> Some(9)))

    // Filters still push into the scan across the merged read.
    val q = merged.where($"value" > 25.0)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(value), GreaterThan(value,25.0)]"),
      s"pushdown must survive schema merging:\n$scan")
    assert(q.count() === 2L)

    // The explicit-schema read is the downstream CONTRACT: it sees the
    // pinned data columns (old files null-fill) without paying the merge
    // footer pass; directory partition columns still append after them.
    val pinned = spark.read
      .schema("event_id BIGINT, value DOUBLE, quality INT")
      .parquet(dir)
    assert(pinned.columns.toSeq ===
      Seq("event_id", "value", "quality", "batch"))
    assert(pinned.where($"quality".isNull).count() === 2L)
  }
}
