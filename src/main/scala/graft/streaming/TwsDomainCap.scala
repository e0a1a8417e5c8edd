package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** STREAMING per-domain document cap — the crawl-budget enforcement a
  * live ingest pipeline runs. The batch `domain_cap` keeps a top-K
  * per domain by PRIORITY (it can see the whole corpus); a stream
  * must decide ON ARRIVAL, so the streaming form admits the first
  * `maxDocs` documents per domain and drops the rest — exactly how a
  * crawl frontier budgets hosts.
  *
  * State is ONE counter per domain (8 bytes — the smallest possible
  * stateful-op footprint; contrast TwsDedup's bounded membership
  * lists). In-batch arrivals process in ascending doc-id order, so
  * re-slicing the same ordered feed into different micro-batches
  * yields the same admitted set (spec-asserted). Contract: the
  * upstream delivers each doc id once (exactly-once source); a
  * redelivery-tolerant variant keeps the admitted-id set instead of
  * a counter — the [[TwsDedup]] membership pattern with the same
  * maxDocs bound. */
object TwsDomainCap {

  case class DomainDoc(domain: String, id: Long)

  /** An admitted document with its 1-based admission rank. */
  case class Admitted(domain: String, id: Long, rn: Long)

  class DomainCounter(maxDocs: Int)
      extends StatefulProcessor[String, DomainDoc, Admitted] {

    @transient private var n: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      n = getHandle.getValueState("n", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DomainDoc],
                                 tv: TimerValues): Iterator[Admitted] = {
      var cur = if (n.exists()) n.get() else 0L
      val out = scala.collection.mutable.ListBuffer.empty[Admitted]
      rows.map(_.id).toArray.sorted.foreach { id =>
        if (cur < maxDocs) {
          cur += 1
          out += Admitted(key, id, cur)
        }
      }
      n.update(cur)
      out.iterator
    }
  }

  /** Streaming (domain, id) frame → admitted documents with their
    * per-domain admission rank. */
  def admit(docs: DataFrame, domainCol: String, idCol: String,
            maxDocs: Int): Dataset[Admitted] = {
    import docs.sparkSession.implicits._
    require(maxDocs >= 1, s"maxDocs ($maxDocs) must be >= 1")
    docs.select(col(domainCol).cast("string").as("domain"),
        col(idCol).cast("long").as("id"))
      .as[DomainDoc]
      .groupByKey(_.domain)
      .transformWithState(new DomainCounter(maxDocs),
        TimeMode.None(), OutputMode.Append())
  }
}
