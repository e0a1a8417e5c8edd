package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (materialized-view) aggregate maintenance: merge a
  * persisted per-key aggregate STATE with the aggregate of a new
  * delta batch, without rescanning the base data — the batch form of
  * streaming's update-mode aggregation, and the pattern behind every
  * "daily partition lands, roll it into the running totals" job.
  *
  * Scale posture: the whole point at 100 TB — the base is touched
  * ZERO times per increment. The state frame is keys × measures
  * (already aggregated), the delta aggregate is one map-side-combined
  * shuffle over the increment only, and the merge is a groupBy over
  * state ∪ delta — cost O(|keys| + |increment|) per maintenance run,
  * independent of base size. Correctness requires the measures to be
  * ADDITIVE partials (counts, exact-decimal sums; avg carried as
  * sum+count, never pre-divided) — which is also why the final
  * cast-to-double happens after the merge, not before it.
  */
object IncrementalAgg {

  /** Merge state with a delta aggregate over the same keys: every
    * non-key column is summed. Both frames must share the schema
    * (same keys, same additive measure columns). */
  def mergeAdditive(state: DataFrame, delta: DataFrame,
                    keys: Seq[String]): DataFrame = {
    require(state.columns.toSeq == delta.columns.toSeq,
      s"state/delta schema mismatch: ${state.columns.toSeq} vs ${delta.columns.toSeq}")
    val measures = state.columns.filterNot(keys.contains).toSeq
    require(measures.nonEmpty, "no measure columns to merge")
    val aggs = measures.map(m => sum(col(m)).as(m))
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
