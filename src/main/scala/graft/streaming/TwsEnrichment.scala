package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

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
}
