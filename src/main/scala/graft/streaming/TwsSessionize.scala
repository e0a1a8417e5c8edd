package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** STREAMING SESSIONIZATION — the live twin of the batch gap-island
  * computation (B32 `sessionize` / A7 session aggregates): per key,
  * events closer than the inactivity gap chain into one session, and
  * a session EMITS ONLY WHEN THE WATERMARK proves it can no longer
  * grow (watermark > session_end + gap — an event that could still
  * extend it would have event time ≤ session_end + gap, which is
  * below the watermark and therefore late-dropped by contract).
  *
  * Closing eagerly on arrival order instead would split a session
  * whose earlier fragment is still in flight: the spec feeds exactly
  * that slicing (a later event arrives first, the bridging event
  * second, both inside the watermark) and pins equality with the
  * batch islands — including the boundary contract `diff == gap`
  * JOINS, `diff == gap + 1` SPLITS (the batch rule is `diff > gap`).
  *
  * MECHANICS: events buffer in per-key list state; each micro-batch
  * registers ONE event-time timer at its max event time + gap + 1 (the
  * instant the watermark proves that batch's last event extends
  * nothing). A firing timer re-derives the gap islands from the full
  * buffer — so fragments merge regardless of arrival slicing — emits
  * every island final by its expiry, and keeps the rest. State per
  * key is the open tail's events (16 bytes each) plus one pending
  * timer per in-flight micro-batch: the buffer horizon is one
  * inactivity gap, the same retention shape as [[TwsCep]]'s candidate
  * buffer. At 100 TB/day this keys by user like every other Tws
  * operator — state shards across executors by key hash, and RocksDB
  * state (StreamingSpec's large-state path) holds the per-key tails.
  */
object TwsSessionize {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long,
                     n_events: Long)

  class Sessionizer(gapMs: Long) extends StatefulProcessor[Long, Ev, Session] {

    @transient private var buf: ListState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState("buf",
        Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 tv: TimerValues): Iterator[Session] = {
      val timers = scala.collection.mutable.Set.empty[Long]
      timers ++= getHandle.listTimers()
      var mx = Long.MinValue
      rows.foreach { r =>
        val ms = r.ts.getTime
        buf.appendValue((ms, r.event_id))
        if (ms > mx) mx = ms
      }
      // +1: an event exactly at end + gap still JOINS (batch rule is
      // strict >), so it must be provably late before the fire
      if (mx != Long.MinValue) {
        val at = mx + gapMs + 1
        if (timers.add(at)) getHandle.registerTimer(at)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Session] = {
      val expiry = info.getExpiryTimeInMs()
      val evs = (if (buf.exists()) buf.get().toArray
        else Array.empty[(Long, Long)]).sortBy(e => (e._1, e._2))
      if (evs.isEmpty) Iterator.empty
      else {
        // gap islands over the FULL buffer — late-but-in-watermark
        // fragments merge here no matter which micro-batch carried them
        val islands = scala.collection.mutable.ArrayBuffer(
          scala.collection.mutable.ArrayBuffer(evs.head))
        evs.tail.foreach { e =>
          if (e._1 - islands.last.last._1 > gapMs)
            islands += scala.collection.mutable.ArrayBuffer(e)
          else islands.last += e
        }
        // islands are time-ordered: a closed prefix, then the open tail
        val (closed, open) = islands.partition(_.last._1 + gapMs + 1 <= expiry)
        val keep = open.flatten.toArray
        if (keep.isEmpty) buf.clear() else buf.put(keep)
        closed.iterator.map(i =>
          Session(key, i.head._1, i.last._1, i.size.toLong))
      }
    }
  }

  /** Streaming events frame (`user_id, ts, event_id`) →
    * watermark-final sessions. `delay` is the watermark lateness
    * allowance; `gapSecs` matches the batch islands' gap. */
  def sessions(events: DataFrame, gapSecs: Long, delay: String): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        col("event_id").cast("long").as("event_id"))
      .withWatermark("ts", delay)
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new Sessionizer(gapSecs * 1000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
