package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage-truncating materialization for iterative loops and reused
  * frames, with a reliability switch.
  *
  * Default is `localCheckpoint()`: executor-local blocks, no configured
  * storage needed — the right call at local[32] and for bench parity.
  * Its blocks live in executor storage, so ON A CLUSTER a lost executor
  * kills every downstream stage of the truncated lineage (there is no
  * lineage left to recompute from). Iterative operators (connected
  * components, trained-quantizer ANN) that run long enough to see
  * executor churn should set [[ReliableKey]] to `true`: materialization
  * then goes through `checkpoint()` into the reliable checkpoint
  * directory (`SparkContext.setCheckpointDir` — HDFS/object store on a
  * real cluster), surviving any executor loss. The flag is read per call
  * from the session conf, so one job can flip it without rebuilding.
  *
  * `checkpoint()` without a configured directory fails loudly — a config
  * error, not a fallback: silently degrading to local blocks would
  * reintroduce exactly the failure mode the caller opted out of.
  */
object Materialize {

  /** Session-conf key: `true` → reliable `checkpoint()`, else (unset or
    * anything else) executor-local `localCheckpoint()`.
    */
  val ReliableKey = "spark.graft.checkpoint.reliable"

  /** Materialize `df` eagerly and truncate its lineage, honoring
    * [[ReliableKey]].
    */
  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get(ReliableKey, "false").toBoolean)
      df.checkpoint()
    else
      df.localCheckpoint()
}
