package graft.io

import graft.SparkSpec

/** Plan evidence for BUCKETED storage — the co-located-join layout that
  * removes the fact-table shuffle entirely at 100 TB. Both sides are
  * written `bucketBy(N, key)`: files land pre-hash-partitioned on the
  * join key, so a key-equal join of two equally-bucketed tables plans
  * with NO Exchange on either side — the shuffle happened once at write
  * time and is amortized over every subsequent join/aggregate on that
  * key. This is the storage-layout counterpart of `olap_zorder_key`
  * (which orders WITHIN files for range pruning; bucketing partitions
  * ACROSS files for join locality).
  *
  * Runs in `spark.newSession()` so the forced sort-merge-join conf
  * (`autoBroadcastJoinThreshold = -1`, needed because the toy dim would
  * otherwise broadcast and hide the Exchange question) cannot leak into
  * sibling suites that assert broadcast plans. Tables land in the shared
  * session warehouse (`spark.sql.warehouse.dir` is static) under
  * suite-unique names and are dropped in `finally`.
  */
class BucketingSpec extends SparkSpec {

  test("equal-bucketed join plans with zero Exchange; plain join shuffles") {
    val s = spark.newSession()
    import s.implicits._
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val facts = (1L to 1000L).map(i => (i % 97, i, i * 1.5))
      .toDF("user_id", "event_id", "value")
    val dims = (0L until 97L).map(i => (i, s"user-$i"))
      .toDF("user_id", "name")
    try {
      // coalesce(1): ONE file per bucket, so the per-bucket sortBy order
      // survives and the join needs no re-sort either.
      facts.coalesce(1).write.mode("overwrite")
        .bucketBy(8, "user_id").sortBy("user_id").saveAsTable("b_facts")
      dims.coalesce(1).write.mode("overwrite")
        .bucketBy(8, "user_id").sortBy("user_id").saveAsTable("b_dims")

      val q = s.table("b_facts").join(s.table("b_dims"), "user_id")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed sides must join WITHOUT shuffling:\n$plan")
      assert(q.count() === 1000L)

      // Control: the same join over plain (unbucketed) frames shuffles.
      val plain = facts.join(dims, "user_id")
        .queryExecution.executedPlan.toString
      assert(plain.contains("Exchange"),
        s"control join should need an Exchange:\n$plain")
    } finally {
      s.sql("DROP TABLE IF EXISTS b_facts")
      s.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("bucket pruning: an equality filter on the bucket key reads one bucket") {
    val s = spark.newSession()
    import s.implicits._
    // A lone filter has no shuffle to elide, so the planner's auto-
    // bucketed-scan heuristic falls back to a plain scan and skips bucket
    // pruning; pin the bucketed read to surface the pruning behavior.
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      (1L to 1000L).map(i => (i % 97, i)).toDF("user_id", "event_id")
        .coalesce(1).write.mode("overwrite")
        .bucketBy(8, "user_id").saveAsTable("b_prune")
      val q = s.table("b_prune").where($"user_id" === 42L)
      // SelectedBucketsCount appears in the scan when pruning kicked in.
      val scan = q.queryExecution.executedPlan.toString
      assert(scan.contains("SelectedBucketsCount: 1 out of 8"),
        s"equality on the bucket key must prune to one bucket:\n$scan")
      assert(q.count() === (1L to 1000L).count(_ % 97 == 42))
    } finally {
      s.sql("DROP TABLE IF EXISTS b_prune")
    }
  }
}
