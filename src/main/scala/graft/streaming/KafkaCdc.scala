package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType

/** Kafka wiring for the CDC pipeline, mirroring the reference job's
  * topology (`StreamingJob.java:190-203`: `connector.type=kafka` JSON
  * envelope topics in, a `precisely_results` topic out).
  *
  * The sandbox ships no broker and no kafka connector jar, so the two
  * `format("kafka")` builders here are compiled-but-unexercised glue
  * (the format resolves by name at runtime). Everything between the
  * source projection and the sink projection — [[recordValues]],
  * [[CdcPipeline.decodeEnvelope]], the operators, [[toRecords]] — is
  * exactly the code the file/memory-source specs drive, so the Kafka
  * path adds no logic beyond the connection option blocks.
  *
  * Scale posture: a Kafka source parallelizes by topic partition;
  * `maxOffsetsPerTrigger` bounds each micro-batch (and with it the
  * per-key batch slice [[CdcPipeline.enrichLatest]] materializes), so
  * state and batch memory stay O(rate), not O(backlog), on a
  * 1000-executor cluster draining a deep topic.
  */
object KafkaCdc {

  /** Connection + rate-bound settings shared by source and sink. */
  case class Conf(bootstrapServers: String,
                  startingOffsets: String = "earliest",
                  maxOffsetsPerTrigger: Long = 1000000L)

  /** Kafka-record-shaped frame (binary key/value + metadata) → raw
    * envelope JSON strings. Factored out so specs can drive the exact
    * projection with a batch frame shaped like the Kafka source. */
  def recordValues(kafkaShaped: DataFrame): DataFrame =
    kafkaShaped.select(col("value").cast("string").as("value"))

  /** `readStream.format("kafka")` → decoded envelope rows (manip, seq,
    * op_ts, after_image) — the streaming twin of
    * `sources.CdcEnvelope.fromEnvelopeJson` over a topic. */
  def readEnvelopes(spark: SparkSession, conf: Conf, topic: String,
                    afterImageSchema: StructType): DataFrame =
    CdcPipeline.decodeEnvelope(
      recordValues(
        spark.readStream.format("kafka")
          .option("kafka.bootstrap.servers", conf.bootstrapServers)
          .option("subscribe", topic)
          .option("startingOffsets", conf.startingOffsets)
          .option("maxOffsetsPerTrigger", conf.maxOffsetsPerTrigger.toString)
          .load()),
      afterImageSchema)

  /** Result rows → Kafka record shape: key = partition key (so a key's
    * updates land in one partition, preserving per-key order for
    * downstream consumers), value = the row as JSON — the reference's
    * `createOutputTable` JSON shape. */
  def toRecords(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol).cast("string").as("key"),
      to_json(struct(col("*"))).as("value"))

  /** `writeStream.format("kafka")` writer for [[toRecords]] output;
    * caller sets trigger/outputMode and calls `.start()`. */
  def writeRecords(records: DataFrame, conf: Conf, topic: String,
                   checkpointLocation: String): DataStreamWriter[org.apache.spark.sql.Row] =
    records.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", conf.bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointLocation)
}
