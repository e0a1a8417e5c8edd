package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** STREAMING SCD Type 2 — the transformWithState twin of
  * [[graft.operators.Cdc.scd2]]: the batch form window-sorts the whole
  * changelog per key; a stream closes versions AS CHANGES ARRIVE, so
  * the dimension's history table appends finalized rows continuously
  * instead of being rebuilt per load.
  *
  * State is ONE open version per key (the current row — exactly the
  * dimension's `is_current` slice, held in the state store instead of
  * a table). Each arriving change CLOSES the open version (emits it
  * with `valid_to` = the new change's op time — unless the open
  * "version" was a delete tombstone, which emits nothing) and becomes
  * the new open version. Append-mode output is therefore the stream
  * of CLOSED versions: the batch `scd2` rows with non-null
  * `valid_to`, independent of micro-batch slicing (spec-asserted);
  * the open tail lives in state and materializes whenever the sink
  * snapshot needs it.
  *
  * Contract: per-key changes arrive in (opTs, seq) order across
  * micro-batches (CDC log order — the same assumption the enrichment
  * pipeline makes); in-batch rows are sorted before folding so
  * arbitrary batch slicing of an ordered feed is invariant.
  *
  * Scale: state = keys × one row, the latest-image footprint; each
  * arrival is O(1) state ops. This is the streaming shape of the A10
  * warehouse dimension at any rate. */
object TwsScd2 {

  case class ChgRow(key: Long, opTs: Long, seq: Int, manip: String,
                    value: String)

  case class ClosedVersion(key: Long, value: String, validFrom: Long,
                           validTo: Long)

  class Scd2Processor
      extends StatefulProcessor[Long, ChgRow, ClosedVersion] {

    @transient private var open: ValueState[ChgRow] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState("open", Encoders.product[ChgRow],
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ChgRow],
                                 tv: TimerValues): Iterator[ClosedVersion] = {
      val out = scala.collection.mutable.ListBuffer.empty[ClosedVersion]
      var cur: Option[ChgRow] = if (open.exists()) Some(open.get()) else None
      rows.toArray.sortBy(r => (r.opTs, r.seq)).foreach { r =>
        cur.foreach { prev =>
          if (prev.manip != "D")
            out += ClosedVersion(key, prev.value, prev.opTs, r.opTs)
        }
        cur = Some(r)
      }
      cur.foreach(open.update)
      out.iterator
    }
  }

  /** Change stream → closed-version stream (append mode). */
  def closedVersions(changes: Dataset[ChgRow]): Dataset[ClosedVersion] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.key)
      .transformWithState(new Scd2Processor, TimeMode.None(),
        OutputMode.Append())
  }
}
