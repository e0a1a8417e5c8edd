package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: match point rows `t ∈ [start, end)` to
  * interval rows, optionally with an extra equi-key.
  *
  * A naive theta-join is O(n·m) — Spark would plan a broadcast
  * nested-loop. Instead we bucket time into `bucketWidth`-wide epochs
  * and turn the range predicate into an EQUI-join on
  * (key, bucket): an interval no wider than `bucketWidth` overlaps at
  * most 2 buckets, so the interval side is exploded to ≤2 rows and
  * both sides hash-shuffle on (key, bucket). The residual range
  * filter runs after the equi-match. At 100 TB this is one hash join
  * with bytes ∝ data, never a cross product.
  */
object RangeJoin {

  /** Join points to intervals of width <= bucketWidth.
    *
    * @param points      point side with `ptTs`
    * @param intervals   interval side with `startTs` / `endTs` where
    *                    end - start <= bucketWidth
    * @param pointKey    equi-key on the point side
    * @param intervalKey equi-key on the interval side
    * @param bucketWidthSec bucket width in seconds
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointKey: String, intervalKey: String,
                      ptTs: String, startTs: String, endTs: String,
                      bucketWidthSec: Long): DataFrame = {
    val widthUs = bucketWidthSec * 1000000L
    def bucket(c: Column): Column = floor(unix_micros(c.cast("timestamp")) / widthUs)
    val p = points.withColumn("__b", bucket(col(ptTs)))
    val i = intervals
      .withColumn("__b", explode(array(bucket(col(startTs)), bucket(col(startTs)) + 1)))
    i.join(p,
        i("__b") === p("__b") &&
        i(intervalKey) === p(pointKey) &&
        p(ptTs) >= i(startTs) && p(ptTs) < i(endTs))
      .drop("__b")
  }
}
