package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Latest-value enrichment join — the batch twin of the reference's
  * `KeyedCoProcessFunction` join (`EnrichmentJoin.java:23`): each
  * stream row is joined with the *latest* enrichment row for its key,
  * and the enrichment's copy of the join key is dropped from the
  * output (ref `JoinProcessor.join`, `EnrichmentJoin.java:78-95`).
  * Rows whose enrichment never arrives stay buffered in the reference
  * (i.e. are not emitted) → inner join here.
  *
  * Scale: the enrichment side is deduped to one row per key *before*
  * the join, then broadcast when it fits (dimension tables at 100 TB
  * fact scale are still broadcast-size after latest-image dedup). A
  * non-broadcastable enrichment falls back to a shuffled hash join on
  * the key — still one shuffle of each side.
  */
object EnrichmentJoin {

  /** Join `stream` with the latest image of `changelog` on `key`. */
  def enrichLatest(stream: DataFrame, changelog: DataFrame, key: String,
                   opTs: String = "op_ts", seq: String = "seq",
                   broadcastEnrichment: Boolean = true): DataFrame = {
    val latest = Cdc.latestImage(changelog, key, opTs, seq)
      .drop(opTs, seq, "manip")
    enrich(stream, latest, key, broadcastEnrichment)
  }

  /** Join `stream` with an already-deduped enrichment table on `key`,
    * dropping the enrichment's join-key copy like the reference. */
  def enrich(stream: DataFrame, enrichment: DataFrame, key: String,
             broadcastEnrichment: Boolean = true): DataFrame = {
    val e = if (broadcastEnrichment) broadcast(enrichment) else enrichment
    stream.join(e, Seq(key), "inner")
  }

  /** The documented fallback for the case `enrich` can't serve well:
    * an enrichment too large to broadcast (→ shuffled join) whose key
    * distribution on the FACT side is skewed (a handful of customers
    * own most orders). A plain shuffled join lands every hot key on
    * one reducer; salting spreads each key over `nSalts` sub-keys on
    * the fact side and replicates the enrichment ×`nSalts`, so a hot
    * key occupies `nSalts` reducers. Result rows are identical to
    * `enrich(_, _, key, broadcastEnrichment = false)` — OperatorSpec
    * asserts both the equality and the salted plan shape. Prefer AQE's
    * runtime skew split when it applies; this is the explicit form for
    * paths AQE can't rewrite (see [[Skew.saltedJoin]]). */
  def enrichSalted(stream: DataFrame, enrichment: DataFrame, key: String,
                   nSalts: Int = 8): DataFrame =
    Skew.saltedJoin(stream, enrichment, key, nSalts)
}
