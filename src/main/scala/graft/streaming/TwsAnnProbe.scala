package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Similarity

/** STREAMING ANN probe against the persisted batch ANN stores — the
  * retrieval-side twin the r12 verdict named as the last conceptual
  * seam: the LSH/IVF stores ([[graft.operators.Similarity.withLshBucket]]
  * / `withIvfLists`, bucket/list-partitioned parquet) were batch-probe
  * only; a live query feed (user searches, dedup-on-ingest lookups,
  * retrieval-augmented serving) needs the same probe semantics on a
  * stream.
  *
  * DESIGN — `foreachBatch` over the EXISTING store readers, not a new
  * stateful operator. An ANN probe is stateless per query: each query
  * depends on the (static) store and nothing else in the stream, so
  * the Spark-idiomatic form is micro-batch reuse of the batch probe —
  * each micro-batch of queries runs `lshTopKBucketed`/`ivfTopKBucketed`
  * against the store frame verbatim. That buys, by construction:
  *  - EXACT batch parity: the per-batch result is the batch operator's
  *    result on that query set (StreamingSpec pins stream-accumulated
  *    == one-shot batch over the union of all micro-batches — probes
  *    are per-query independent, so the union commutes);
  *  - the store's partition pruning: the probed bucket/list set comes
  *    from the bounded micro-batch and is pushed as the same `isin`
  *    partition filter, so each tick scans O(probed buckets) of the
  *    store, never the corpus (the contractual collect on the BOUNDED
  *    query batch is driver-side control plane, legal inside
  *    foreachBatch where each batch is a plain DataFrame);
  *  - sink freedom: the per-batch result lands wherever the caller's
  *    sink function writes it (parquet append, upsert, memory).
  * A transformWithState form would have to rebroadcast or re-join the
  * store per key group for zero semantic gain — stateless probes need
  * no state variables, watermarks, or timers. Store REFRESH (the
  * batch pipeline re-clusters / re-buckets) is a restart concern by
  * contract: the store frame is resolved once per query start, the
  * same static-frame semantics as every stream-static join in Spark.
  *
  * Scale posture (100 TB store, 1000 executors): each micro-batch
  * touches only the bucket/list directories its queries hash to; the
  * query side is broadcast (bounded batch by the same contract as the
  * batch probes); k-per-query top-k runs in one window over the
  * matched candidates. Probe latency is the micro-batch interval plus
  * the pruned scan — independent of corpus size.
  */
object TwsAnnProbe {

  /** Streaming LSH probe: `queries` (a streaming frame carrying
    * `idCol` + `vecCol`) probed per micro-batch against the
    * pre-bucketed `store` (a static frame carrying the
    * [[graft.operators.Similarity.withLshBucket]] `bucket` column).
    * `sink(result, batchId)` receives the batch-parity probe frame
    * `(query_id, neighbor_id, cos, rn)` per tick; call
    * `.start()` (plus checkpoint/trigger options) on the returned
    * writer. Parameters match `lshTopKBucketed` exactly. */
  def lshProbeWriter(queries: DataFrame, store: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     numPlanes: Int = 8, dim: Int = 64,
                     multiprobe: Int = 0)
                    (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    queries.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(Similarity.lshTopKBucketed(store, batch, idCol, vecCol, k,
        numPlanes, dim, multiprobe), batchId)
    }

  /** Streaming PQ-ADC probe: micro-batch twin of
    * [[graft.operators.Similarity.pqTopKCoded]] against a pre-encoded
    * code store (the `withPqCodes` columns — the corpus side never
    * reads a raw vector; per tick the bounded query batch computes its
    * lookup tables and the store scan pays `element_at`s only). */
  def pqProbeWriter(queries: DataFrame, codedStore: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    books: Seq[Seq[(Long, Array[Float])]],
                    dim: Int = 64)
                   (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    queries.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(Similarity.pqTopKCoded(codedStore, batch, idCol, vecCol, k,
        books, dim), batchId)
    }

  /** Streaming IVF probe: micro-batch twin of
    * [[graft.operators.Similarity.ivfTopKBucketed]] against a
    * pre-assigned `store` (the `withIvfLists` `list_id` column);
    * `cents` is the same bounded centroid table the batch path
    * broadcasts, resolved once at query start. */
  def ivfProbeWriter(queries: DataFrame, store: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     cents: Seq[(Long, Array[Float])], nProbe: Int = 2,
                     centroidLiteralMax: Int = Similarity.CentroidLiteralMax)
                    (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    queries.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(Similarity.ivfTopKBucketed(store, batch, idCol, vecCol, k,
        cents, nProbe, centroidLiteralMax), batchId)
    }
}
