package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time window aggregations — batch expressions of the
  * reference's `TUMBLE(OrderAsOf, INTERVAL '10' MINUTE)` group window
  * (`output.sql`) plus the hop/session variants every stream engine
  * pairs with it. The same `window()`/`session_window()` calls run
  * unchanged under Structured Streaming with a watermark
  * (see `graft.streaming.CdcPipeline`).
  *
  * Scale: tumble/hop are pure projections before a hash aggregate —
  * partial (map-side) aggregation happens before the shuffle, so bytes
  * shuffled ∝ groups, not rows. Session windows require per-key
  * ordering: Spark's `session_window` agg shuffles once on the group
  * keys and merges sessions within partitions.
  */
object Windows {

  /** Fixed (tumbling) windows of `width` on `ts`. */
  def tumble(df: DataFrame, ts: String, width: String,
             groupCols: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(ts), width) +: groupCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .drop("window")

  /** Sliding (hopping) windows: `width` every `slide`. */
  def hop(df: DataFrame, ts: String, width: String, slide: String,
          groupCols: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(ts), width, slide) +: groupCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .drop("window")

  /** Session windows with `gap` inactivity timeout per group key. */
  def session(df: DataFrame, ts: String, gap: String,
              groupCols: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(col(ts), gap) +: groupCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .drop("session_window")
}
