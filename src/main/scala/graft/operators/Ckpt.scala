package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared round/fan-out lineage truncation with a cluster-durable
  * escape hatch (r19 verdict item 2, threaded r20).
  *
  * Default is `localCheckpoint()` — eager executor-local blocks, the
  * right cost for plan-depth control and multi-consumer
  * materialization, but blocks die with their executor: on a real
  * cluster an executor loss kills the query instead of recomputing.
  * The iterative Graph operators and Dedup.clusterPairs already
  * thread an explicit `reliableCheckpoint` parameter; the remaining
  * call sites live inside query builders with no parameter path, so
  * this helper reads the SESSION conf `graft.reliableCheckpoint`
  * (default false) and switches every such site to `checkpoint()`
  * (written to `spark.sparkContext.setCheckpointDir`, survives
  * executor loss) in one place. Output-identical either way — both
  * forms eagerly materialize the same frame (CkptSpec pins it).
  */
object Ckpt {
  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get("graft.reliableCheckpoint", "false").toBoolean)
      df.checkpoint()
    else df.localCheckpoint()
}
