package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ListState}

/** STREAMING trending terms: per (group, event-time window), the
  * top-`k` heaviest terms — the what's-spiking-now signal a live
  * ingest runs per source/domain/hour (burst detection, hot-topic
  * routing, crawl re-prioritization).
  *
  * An exact streaming top-k would need every distinct term's count in
  * state (unbounded: open-web window vocabularies are corpus-sized).
  * This keeps a MISRA-GRIES heavy-hitter summary instead — at most
  * `capacity` counters per (group, window), merged batch-wise: batch
  * counts fold into the summary, then if the summary exceeds
  * `capacity` the (size−capacity)-th smallest count is subtracted
  * from every counter and non-positive entries drop (the mergeable-
  * summaries form; Agarwal et al., Mergeable Summaries, PODS'12).
  * Guarantee: a stored count undercounts its true count by at most
  * εN (ε = 1/(capacity+1), N = the window's token mass), and any term
  * with true count > εN is PRESENT in the summary — so with
  * `capacity` ≫ k the emitted top-k matches the exact top-k whenever
  * true counts are separated by more than εN (spec constructs this
  * regime and asserts equality with the batch groupBy).
  *
  * Emission is event-time correct: one timer per (group, window) at
  * the window end fires when the WATERMARK passes it, emitting the
  * final ranked top-k once and clearing the state — rows arriving
  * before the watermark closes the window (in any micro-batch
  * slicing) land in the summary first. State per key is O(capacity);
  * keying by (group, window) shards the work, and because MG
  * summaries are mergeable a wider fan-out (key by (group, window,
  * term-shard), merge the k·S candidates downstream) is the
  * documented scale path when one group's window outgrows a task. */
object TwsTrending {

  case class Tok(group: String, ts: java.sql.Timestamp, term: String)
  case class Trend(group: String, window_start: Long, term: String,
                   cnt: Long, rank: Long)

  class MisraGriesTopK(k: Int, capacity: Int, windowMs: Long)
      extends StatefulProcessor[(String, Long), Tok, Trend] {

    @transient private var summary: ListState[(String, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      summary = getHandle.getListState("summary",
        Encoders.product[(String, Long)], TTLConfig.NONE)

    override def handleInputRows(key: (String, Long), rows: Iterator[Tok],
                                 tv: TimerValues): Iterator[Trend] = {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      if (summary.exists())
        summary.get().foreach { case (t, c) => counts(t) = c }
      rows.foreach(r => counts(r.term) = counts.getOrElse(r.term, 0L) + 1L)
      if (counts.size > capacity) {
        // subtract the (size-capacity)-th smallest count from all —
        // one decrement step restores the bound, error mass <= m·gap
        val m = counts.values.toArray.sorted.apply(counts.size - capacity - 1)
        val dec = counts.collect { case (t, c) if c > m => (t, c - m) }
        counts.clear(); counts ++= dec
      }
      summary.put(counts.toArray)
      val winEnd = key._2 + windowMs
      if (!getHandle.listTimers().contains(winEnd))
        getHandle.registerTimer(winEnd)
      Iterator.empty
    }

    override def handleExpiredTimer(key: (String, Long), tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Trend] = {
      val entries = if (summary.exists()) summary.get().toArray else Array.empty[(String, Long)]
      summary.clear()
      entries.sortBy { case (t, c) => (-c, t) }.take(k)
        .zipWithIndex
        .map { case ((t, c), i) => Trend(key._1, key._2, t, c, i + 1L) }
        .iterator
    }
  }

  /** Streaming (group, ts, text) → closed-window trending top-k.
    * `delay` is the watermark (how long a window stays open for late
    * data after its end). */
  def trending(docs: DataFrame, groupCol: String, tsCol: String,
               textCol: String, windowDur: String, delay: String,
               k: Int = 10, capacity: Int = 256): Dataset[Trend] = {
    import docs.sparkSession.implicits._
    require(k >= 1 && capacity >= k,
      s"need capacity ($capacity) >= k ($k) >= 1")
    val windowMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String
        .fromString(windowDur)) match {
      case iv =>
        require(iv.months == 0, "calendar-month windows are not fixed-width")
        iv.days * 86400000L + iv.microseconds / 1000L
    }
    docs
      .select(col(groupCol).cast("string").as("group"),
        col(tsCol).cast("timestamp").as("ts"), col(textCol).as("text"))
      .withWatermark("ts", delay)
      .select(col("group"), col("ts"),
        explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .as[Tok]
      .groupByKey(t => (t.group,
        t.ts.getTime - Math.floorMod(t.ts.getTime, windowMs)))
      .transformWithState(new MisraGriesTopK(k, capacity, windowMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
