package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row picks the latest right row with
  * `rightTs <= leftTs` for its key (the classic enrich-with-most-
  * recent-state lookup; the latest-value semantics of the reference's
  * `EnrichmentJoin.java:64` generalized to event time).
  *
  * Implementation is the union+running-last composition: tag both
  * sides, union, and take `last(right_payload, ignoreNulls)` over a
  * per-key window ordered by (ts, side). This costs exactly ONE
  * shuffle (the window partition) and one per-partition sort — no
  * range join, no O(n·m) explosion, and it scales linearly: at 100 TB
  * both sides shuffle once on the key and the running-last is a
  * streaming pass per partition.
  */
object AsOfJoin {

  /** Left as-of join.
    *
    * @param left      probe side
    * @param right     build side
    * @param leftKey   join key column name on `left`
    * @param rightKey  join key column name on `right`
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param payload   right columns carried to the output (nulls when
    *                  no right row precedes the left row)
    * @param rightTieBreak right columns ordering duplicate (key, ts)
    *                  rows — the LARGEST wins. Resolving ties inside
    *                  the as-of window (instead of a pre-dedup
    *                  row_number pass) saves a whole shuffle: both the
    *                  dedup and the as-of would partition by the key.
    *                  Must be payload columns.
    */
  def leftAsOf(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               payload: Seq[String],
               rightTieBreak: Seq[String] = Nil): DataFrame =
    asOf(left, right, leftKey, rightKey, leftTs, rightTs, payload,
      rightTieBreak, forward = false)

  /** FORWARD as-of join: each left row picks the EARLIEST right row
    * with `rightTs >= leftTs` for its key — the what-happened-next
    * lookup (first order after a touchpoint, first error after a
    * deploy). Ties inside the as-of window resolve to the SMALLEST
    * tie-break (the mirror of [[leftAsOf]]'s largest-wins). Same
    * union+running-last plan, same single shuffle — only the window
    * sort direction flips, so the cost model is identical. */
  def leftAsOfForward(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTs: String, rightTs: String,
                      payload: Seq[String],
                      rightTieBreak: Seq[String] = Nil): DataFrame =
    asOf(left, right, leftKey, rightKey, leftTs, rightTs, payload,
      rightTieBreak, forward = true)

  private def asOf(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   payload: Seq[String],
                   rightTieBreak: Seq[String],
                   forward: Boolean): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTs).cast("timestamp"))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(payload.map(col): _*).schema.fields)))
    val r = right
      .withColumn("__k", col(rightKey).cast(l.schema("__k").dataType))
      .withColumn("__t", col(rightTs).cast("timestamp"))
      .withColumn("__side", lit(0))
      .withColumn("__p", struct(payload.map(col): _*))
      .select("__k", "__t", "__side", "__p")
    val unioned = l.select((leftCols.toSeq.map(col) ++ Seq(col("__k"), col("__t"),
      col("__side"), col("__p"))): _*)
      .unionByName(r, allowMissingColumns = true)
    // Right rows before left rows at the same instant: side 0 sorts
    // first, so rightTs == leftTs counts as matched in BOTH directions
    // (<= / >= semantics). Backward walks time ascending — among right
    // rows at the same (key, ts) the tie-break sorts ascending so the
    // LARGEST is the running last. Forward walks time DESCENDING (the
    // running last becomes the nearest following row) — tie-breaks
    // sort descending so the SMALLEST wins. (Left rows carry a null
    // payload struct; with __side ordered ascending they always sort
    // after the right rows of their instant, in both directions.)
    val w = Window.partitionBy(col("__k"))
      .orderBy((if (forward) col("__t").desc else col("__t").asc) +:
        col("__side").asc +:
        rightTieBreak.map(tb =>
          if (forward) col(s"__p.$tb").desc else col(s"__p.$tb").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.toSeq.map(col) ++ payload.map(p => col(s"__match.$p").as(p)): _*)
  }
}
