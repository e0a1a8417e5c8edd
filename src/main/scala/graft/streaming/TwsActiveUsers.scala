package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ListState}

/** STREAMING rolling-active-users feed — the live twin of the batch
  * DAU/WAU stickiness query (B91 `dau_wau`): per user, watermark-FINAL
  * coverage intervals [cstart, cend] meaning "this user counts as
  * W-day-active on every day in the interval". The rows are exactly
  * the batch construction's `iv` frame (per-user lead() intervals), so
  * the stateless downstream fold — ±1 deltas, running sum over the day
  * spine, DAU by interval starts — produces dau/wau/stickiness
  * continuously; the spec runs that fold and pins equality against the
  * batch query.
  *
  * Finality: day g's interval can close only when no activity in
  * (g, g+W−1] can still arrive. With event-time timers that is the
  * watermark passing END of day g+W−1 — rows surviving the watermark
  * filter afterwards have ts past it, so the user's NEXT active day
  * within the window is fully known (the lateness allowance is already
  * inside the watermark; `settleMs` only de-ties the boundary, the
  * TwsSeqGap convention). Requires delay < W days: a day older than
  * the window arriving after finality would be watermark-late by
  * contract anyway.
  *
  * State per user: only the PENDING (not-yet-final) active days — at
  * most W + ceil(delay/1 day) longs, pruned at every finalization; one
  * timer per pending day. 10⁹ users in flight cost tens of bytes each,
  * sharded by user hash — no per-day user sets anywhere (keying by day
  * would buffer a day's whole distinct-user population in one task,
  * the shape this design exists to avoid).
  */
object TwsActiveUsers {

  case class Act(user_id: Long, day: Long, ts: java.sql.Timestamp)
  case class Cover(user_id: Long, cstart: Long, cend: Long)

  private val DayMs = 86400000L

  class Tracker(windowDays: Long, settleMs: Long)
      extends StatefulProcessor[Long, Act, Cover] {

    @transient private var pending: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      pending = getHandle.getListState("pending", Encoders.scalaLong,
        TTLConfig.NONE)

    private def finality(day: Long): Long =
      (day + windowDays) * DayMs + settleMs

    override def handleInputRows(key: Long, rows: Iterator[Act],
                                 tv: TimerValues): Iterator[Cover] = {
      val days = scala.collection.mutable.SortedSet.empty[Long]
      pending.get().foreach(days += _)
      val timers = scala.collection.mutable.Set.empty[Long]
      timers ++= getHandle.listTimers()
      var changed = false
      rows.foreach { r =>
        if (days.add(r.day)) {
          changed = true
          if (timers.add(finality(r.day)))
            getHandle.registerTimer(finality(r.day))
        }
      }
      if (changed) pending.put(days.toArray)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Cover] = {
      if (!pending.exists()) return Iterator.empty
      val days = pending.get().toArray.sorted
      val (due, rest) = days.partition(g => finality(g) <= info.getExpiryTimeInMs())
      if (due.isEmpty) return Iterator.empty
      if (rest.isEmpty) pending.clear() else pending.put(rest)
      val out = due.map { g =>
        // next active day within the window: any such day arrived
        // before this timer fired (its own finality is later), so it
        // is either still pending or due in this same expiry batch
        val next = days.find(_ > g)
        val cend = next match {
          case Some(nx) if nx <= g + windowDays - 1 => nx - 1
          case _ => g + windowDays - 1
        }
        Cover(key, g, cend)
      }
      out.iterator
    }
  }

  /** Streaming activity frame (`user_id, ts`) → watermark-final
    * coverage intervals (the batch B91 `iv` frame). `windowDays` is
    * the rolling-active window (7 = WAU), `delay` the watermark
    * lateness allowance (must be under `windowDays` days). */
  def coverage(events: DataFrame, windowDays: Long, settleSecs: Long,
               delay: String): Dataset[Cover] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", delay)
      .select(col("user_id"),
        expr("CAST(ts AS BIGINT) div 86400").as("day"), col("ts"))
      .as[Act]
      .groupByKey(_.user_id)
      .transformWithState(new Tracker(windowDays, settleSecs * 1000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
