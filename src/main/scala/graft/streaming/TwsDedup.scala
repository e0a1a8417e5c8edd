package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** STREAMING near-dup detection — the transformWithState twin of
  * [[graft.operators.Dedup.minhashLshIncremental]], which is what a
  * crawl-ingest pipeline actually runs: documents arrive continuously,
  * and each must be checked against everything already ingested
  * WITHOUT re-joining the corpus.
  *
  * The batch incremental form re-buckets the whole corpus signature
  * table per increment; here the buckets ARE the state. MinHash
  * signatures and band hashes are pure projections (they run on a
  * streaming frame unchanged), so the stream groups by LSH bucket
  * `(band, band_hash)` and a [[StatefulProcessor]] keeps each bucket's
  * member ids. A new arrival pairs against the bucket's current
  * members — cost O(bucket occupancy), never O(corpus) — then joins
  * the membership. State is bounded two ways: a per-bucket cap
  * (`maxBucket`, the streaming analog of the batch hot-bucket star
  * guard: a full bucket stops admitting members and new arrivals pair
  * only with the bucket's first member, keeping exact-copy floods at
  * O(1) per arrival) and an optional TTL (crawl dedup horizons are
  * finite in practice; state becomes rate × TTL, not corpus size).
  *
  * Candidates from different bands duplicate → `dropDuplicates`
  * downstream; precision is restored by the same exact
  * shingle-Jaccard verify as the batch paths, as a stream-static join
  * against the signature store ([[verifiedPairs]]). Recall inside the
  * TTL horizon equals the batch form's (same bands, same signatures);
  * pairs older than the horizon are traded away by design.
  */
object TwsDedup {

  /** One (bucket, doc) assignment — a doc explodes into `bands` of
    * these, exactly the batch banding. */
  case class BucketDoc(band: Int, bh: Long, id: Long)

  /** An unverified candidate pair, normalized doc_a < doc_b. */
  case class CandPair(doc_a: Long, doc_b: Long)

  /** Per-bucket membership state; emits each arrival × current
    * members. In-batch arrivals process in ascending id order so a
    * micro-batch boundary never changes the emitted pair set. */
  class BucketMembershipProcessor(maxBucket: Int, ttl: Option[Duration])
      extends StatefulProcessor[(Int, Long), BucketDoc, CandPair] {

    @transient private var members: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState("members", Encoders.scalaLong,
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: (Int, Long), rows: Iterator[BucketDoc],
                                 tv: TimerValues): Iterator[CandPair] = {
      // buffer + set twin of the stored list: O(1) membership probe and
      // append, so a full bucket stays O(cap) per arrival even if the
      // cap is raised (the list-scan form was an accidental O(n·cap))
      val mem = scala.collection.mutable.ArrayBuffer.empty[Long]
      if (members.exists()) mem ++= members.get()
      val seen = scala.collection.mutable.HashSet.from(mem)
      val out = scala.collection.mutable.ListBuffer.empty[CandPair]
      rows.map(_.id).toArray.sorted.foreach { id =>
        if (!seen.contains(id)) { // at-least-once transport: redeliveries no-op
          val peers: Iterable[Long] =
            if (mem.size >= maxBucket) mem.headOption else mem
          peers.foreach { m =>
            out += CandPair(math.min(id, m), math.max(id, m))
          }
          if (mem.size < maxBucket) {
            members.appendValue(id)
            mem += id
            seen += id
          }
        }
      }
      out.iterator
    }
  }

  /** (id, hs, sig) streaming frame → distinct candidate pairs.
    * `sigs` is the output shape of
    * [[graft.operators.Dedup.withMinHashSignatures]] (which is a pure
    * projection — apply it to the streaming documents directly). */
  def candidatePairs(sigs: DataFrame, bands: Int = 16, numPerm: Int = 64,
                     maxBucket: Int = 1000,
                     ttl: Option[Duration] = None): Dataset[CandPair] = {
    import sigs.sparkSession.implicits._
    val mode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    graft.operators.Dedup.minhashBuckets(sigs, bands, numPerm)
      .select(col("band").cast("int").as("band"), col("bh"), col("id"))
      .as[BucketDoc]
      .groupByKey(d => (d.band, d.bh))
      .transformWithState(new BucketMembershipProcessor(maxBucket, ttl),
        mode, OutputMode.Append())
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Exact shingle-Jaccard verification of streaming candidates
    * against a signature STORE (id, hs) — a stream-static join in the
    * streaming pipeline (the store is the persisted signature table
    * every batch path already maintains). Same arithmetic as
    * [[graft.operators.Dedup.minhashLshFromSignatures]], so verified
    * output matches the batch form on the same data. */
  def verifiedPairs(cands: Dataset[CandPair], sets: DataFrame,
                    minBp: Int = 5000): DataFrame =
    cands.toDF()
      .join(sets.select(col("id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
      .join(sets.select(col("id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
      .withColumn("common", size(array_intersect(col("hs_a"), col("hs_b"))))
      .withColumn("jaccard_bp",
        floor(lit(10000.0) * col("common") /
          (size(col("hs_a")) + size(col("hs_b")) - col("common"))).cast("long"))
      .filter(col("jaccard_bp") >= minBp)
      .select("doc_a", "doc_b", "jaccard_bp")
}
