package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.streaming.CdcPipeline.{Change, Enriched, EnrichState}

/** Latest-value enrichment on `transformWithState` — Spark 4's
  * arbitrary-state streaming operator — with the SAME semantics as
  * [[CdcPipeline.enrichLatest]] (latest enrichment image per key,
  * early stream rows buffered, delete tombstones with resurrection
  * guard, deterministic (op_ts, side, seq, manip) in-batch order).
  *
  * Why a second implementation of the same operator: the
  * `flatMapGroupsWithState` form carries its whole per-key state as
  * one blob — every update rewrites (latest, buffer, tombstone)
  * together. This form splits them into typed state VARIABLES
  * (ValueState / ListState), which the state store reads and writes
  * independently (a buffered append no longer rewrites the image), and
  * adds the production knob the older API lacks: NATIVE state TTL —
  * a key whose stream goes quiet ages out of the store engine-side,
  * no timer dance. That is the bound that matters at 100 TB: state is
  * rate × TTL, not keyspace. Requires the RocksDB state store
  * provider (`spark.sql.streaming.stateStore.providerClass`).
  */
object TwsEnrichment {

  /** The processor: three typed state variables per key. */
  class LatestEnrichProcessor(maxBuffered: Int, ttl: Option[Duration],
                              tombstoneTtl: Option[Duration] = None)
      extends StatefulProcessor[Long, Change, Enriched] {

    @transient private var latest: ValueState[(Long, Int, String)] = _
    @transient private var buffered: ListState[(Long, String)] = _
    @transient private var tombstone: ValueState[(Long, Int)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val conf = ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
      latest = getHandle.getValueState("latest",
        Encoders.product[(Long, Int, String)], conf)
      buffered = getHandle.getListState("buffered",
        Encoders.product[(Long, String)], conf)
      // The tombstone is by default EXEMPT from the TTL: if it aged
      // out with the image, a stale out-of-order enrichment row
      // arriving after expiry would resurrect a deleted key — the
      // exact hazard the guard exists to prevent. A tombstone is 16
      // bytes/key, so keeping it forever costs keyspace × 16 B, not
      // rate × payload like the image/buffer states the TTL bounds.
      // For keyspaces with high delete churn where even 16 B × the
      // count of ever-deleted keys is too much, `tombstoneTtl` is the
      // escape hatch: a MUCH longer expiry (recommended ≥ 3× the image
      // TTL) that bounds tombstone state at rate × tombstoneTtl while
      // keeping the resurrection guard airtight for any enrichment row
      // less stale than the window.
      tombstone = getHandle.getValueState("tombstone",
        Encoders.product[(Long, Int)],
        tombstoneTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))
    }

    override def handleInputRows(key: Long, rows: Iterator[Change],
                                 tv: TimerValues): Iterator[Enriched] = {
      // load typed state → the shared EnrichState shape, reuse the
      // batch-deterministic fold, then write back only what changed
      val st0 = EnrichState(
        if (latest.exists()) Some(latest.get()) else None,
        if (buffered.exists()) buffered.get().toList else Nil,
        if (tombstone.exists()) tombstone.get()._1 else Long.MinValue,
        if (tombstone.exists()) tombstone.get()._2 else Int.MinValue)
      val (st, out) = CdcPipeline.foldChanges(key, rows, st0, maxBuffered)
      if (st.latest != st0.latest) {
        st.latest match {
          case Some(l) => latest.update(l)
          case None => latest.clear()
        }
      }
      if (st.buffered != st0.buffered) {
        if (st.buffered.isEmpty) buffered.clear()
        else buffered.put(st.buffered.toArray)
      }
      if ((st.deleteTs, st.deleteSeq) != ((st0.deleteTs, st0.deleteSeq)))
        tombstone.update((st.deleteTs, st.deleteSeq))
      out.iterator
    }
  }

  /** [[CdcPipeline.enrichLatest]] on the transformWithState engine.
    * `ttl` bounds per-key image/buffer state lifetime (processing-
    * time; None = keep forever, the flatMapGroupsWithState behavior).
    * The delete tombstone is TTL-exempt by default, so the
    * resurrection guard holds unconditionally; `tombstoneTtl` is an
    * optional escape hatch for keyspaces with high delete churn —
    * set it MUCH longer than `ttl` (≥ 3×) and tombstone state becomes
    * delete-rate × tombstoneTtl instead of ever-deleted-keyspace ×
    * 16 B, at the cost that an enrichment row staler than the window
    * could in principle resurrect a key (inside the window the guard
    * is unchanged).
    *
    * CHECKPOINT COMPATIBILITY: a state variable's TTL-ness is part of
    * its value ENCODING (TTL-enabled values carry an expiration
    * timestamp). The tombstone state was TTL'd alongside the image
    * before 2025-11 (commit b2ca4dc) and is NONE-by-default since;
    * likewise flipping `tombstoneTtl` (or `ttl`) between None and Some
    * changes the encoding. Restarting a query across any such change
    * fails transformWithState state-schema/metadata validation rather
    * than silently misreading state — use a FRESH checkpoint directory
    * when changing TTL configuration.
    *
    * TimeMode is ProcessingTime ONLY when a TTL is requested: under
    * ProcessingTime the engine keeps scheduling micro-batches with no
    * new data to advance time (that is how TTL expiry happens), which
    * is correct under a production trigger interval but means
    * `processAllAvailable()` never quiesces. Without TTL there is no
    * time semantics to advance — TimeMode.None gives the ordinary
    * data-driven batching. */
  def enrichLatestTws(changes: Dataset[Change], maxBuffered: Int = 1000,
                      ttl: Option[Duration] = None,
                      tombstoneTtl: Option[Duration] = None): Dataset[Enriched] = {
    import changes.sparkSession.implicits._
    val mode = if (ttl.isDefined || tombstoneTtl.isDefined)
      TimeMode.ProcessingTime() else TimeMode.None()
    changes
      .groupByKey(_.key)
      .transformWithState(
        new LatestEnrichProcessor(maxBuffered, ttl, tombstoneTtl),
        mode, OutputMode.Append())
  }

  /** [[LatestEnrichProcessor]] plus a BUFFER TIMEOUT on processor
    * TIMERS (`registerTimer`/`handleExpiredTimer` — the part of the
    * transformWithState API that TTL cannot express, because TTL
    * silently drops state while a timeout must EMIT): a stream row
    * that has waited longer than `bufferTimeoutMs` for its enrichment
    * image is released as a DEAD LETTER — emitted with a null
    * `enrichPayload` — instead of sitting in state forever. The
    * downstream splits on `enrichPayload IS NULL` (results vs DLQ),
    * the same routing contract as
    * [[CdcPipeline.decodeEnvelopeWithDeadLetter]].
    *
    * Each buffered row carries the processing time it was buffered at;
    * one timer per key tracks the OLDEST buffered row's deadline
    * (re-armed as the buffer drains), so timer state is O(1) per key
    * and a fire dead-letters exactly the rows past their own deadline.
    * A row dead-lettered is gone from the buffer — a late image does
    * not re-emit it (at-most-once per stream row, matching the
    * buffered-flush path). */
  class LatestEnrichTimeoutProcessor(maxBuffered: Int, bufferTimeoutMs: Long,
                                     ttl: Option[Duration])
      extends StatefulProcessor[Long, Change, Enriched] {

    @transient private var latest: ValueState[(Long, Int, String)] = _
    // (bufferedAtMs, eventTimeMs, payload) — newest-first, like the
    // shared fold's buffer
    @transient private var buffered: ListState[(Long, Long, String)] = _
    @transient private var tombstone: ValueState[(Long, Int)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val conf = ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
      latest = getHandle.getValueState("latest",
        Encoders.product[(Long, Int, String)], conf)
      buffered = getHandle.getListState("buffered",
        Encoders.product[(Long, Long, String)], conf)
      tombstone = getHandle.getValueState("tombstone",
        Encoders.product[(Long, Int)], TTLConfig.NONE)
    }

    /** One timer per key: the oldest buffered row's deadline. */
    private def syncTimer(entries: List[(Long, Long, String)]): Unit = {
      val want = if (entries.isEmpty) None
        else Some(entries.map(_._1).min + bufferTimeoutMs)
      val have = getHandle.listTimers().toList
      have.filterNot(want.contains).foreach(getHandle.deleteTimer)
      want.filterNot(have.contains).foreach(getHandle.registerTimer)
    }

    override def handleInputRows(key: Long, rows: Iterator[Change],
                                 tv: TimerValues): Iterator[Enriched] = {
      val now = tv.getCurrentProcessingTimeInMs()
      val old = if (buffered.exists()) buffered.get().toList else Nil
      val st0 = EnrichState(
        if (latest.exists()) Some(latest.get()) else None,
        old.map(e => (e._2, e._3)),
        if (tombstone.exists()) tombstone.get()._1 else Long.MinValue,
        if (tombstone.exists()) tombstone.get()._2 else Int.MinValue)
      val (st, out) = CdcPipeline.foldChanges(key, rows, st0, maxBuffered)
      // re-attach buffer ages: an entry surviving from the previous
      // batch keeps its deadline (first match consumes it, so repeated
      // identical rows age conservatively); a new entry ages from now
      val pool = scala.collection.mutable.ListBuffer.empty[(Long, Long, String)]
      pool ++= old
      val timed = st.buffered.map { case (t, p) =>
        pool.indexWhere(e => e._2 == t && e._3 == p) match {
          case -1 => (now, t, p)
          case i => pool.remove(i)
        }
      }
      st.latest match {
        case Some(l) => latest.update(l)
        case None => if (latest.exists()) latest.clear()
      }
      if (timed.isEmpty) buffered.clear() else buffered.put(timed.toArray)
      if ((st.deleteTs, st.deleteSeq) != ((st0.deleteTs, st0.deleteSeq)))
        tombstone.update((st.deleteTs, st.deleteSeq))
      syncTimer(timed)
      out.iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Enriched] = {
      val now = tv.getCurrentProcessingTimeInMs()
      val entries = if (buffered.exists()) buffered.get().toList else Nil
      val (dead, keep) = entries.partition(_._1 + bufferTimeoutMs <= now)
      if (keep.isEmpty) buffered.clear() else buffered.put(keep.toArray)
      syncTimer(keep)
      // buffer is newest-first; dead letters emit oldest-first
      dead.reverse.map(e => Enriched(key, e._2, e._3, null)).iterator
    }
  }

  /** [[enrichLatestTws]] with the buffer-timeout dead-letter semantic.
    * Always TimeMode.ProcessingTime (timers require it), so under a
    * test harness the query never quiesces — poll the sink. Dead
    * letters carry `enrichPayload = null`. */
  def enrichLatestTwsWithTimeout(changes: Dataset[Change],
                                 bufferTimeout: Duration,
                                 maxBuffered: Int = 1000,
                                 ttl: Option[Duration] = None): Dataset[Enriched] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.key)
      .transformWithState(
        new LatestEnrichTimeoutProcessor(maxBuffered, bufferTimeout.toMillis, ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
