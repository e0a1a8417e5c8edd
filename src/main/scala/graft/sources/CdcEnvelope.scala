package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Precisely/SQData-style CDC envelope, modeled after the reference's
  * Kafka tables (`StreamingJob.java:165-185`): 15 `sv_*` metadata
  * columns plus a nested `after_image ROW<...>` carrying the row.
  *
  * Since the test environment has no Kafka, [[ordersChangelog]] /
  * [[customerChangelog]] synthesize a deterministic changelog from the
  * static tables (insert for every row; an update for every 3rd/4th
  * key; a delete tombstone for every 5th/10th) — the synthesis is pure
  * column algebra so a SQL oracle can reconstruct it exactly.
  * [[toEnvelopeJson]]/[[fromEnvelopeJson]] round the envelope through
  * JSON strings, exercising the same decode path a Kafka source needs.
  */
object CdcEnvelope {

  /** sv_* metadata columns (subset constant, like a single-job capture). */
  private def svCols(table: String, manip: Column, transId: Column,
                     seq: Column, opTsDigits: Column): Seq[Column] = Seq(
    manip.as("sv_manip_type"),
    transId.as("sv_trans_id"),
    seq.as("sv_trans_row_seq"),
    lit(table).as("sv_sending_table"),
    opTsDigits.as("sv_trans_timestamp"),
    lit("capture").as("sv_trans_username"),
    lit("graft").as("sv_program_name"),
    lit("graftjob").as("sv_job_name"),
    lit("graft").as("sv_job_user"),
    lit("000001").as("sv_job_number"),
    opTsDigits.as("sv_op_timestamp"),
    lit("M1").as("sv_file_member"),
    lit("LIB1").as("sv_receiver_library"),
    lit("RCV1").as("sv_receiver_name"),
    transId.cast("string").as("sv_journal_seqno"))

  /** Timestamp → the reference's compact digit format (ms precision).
    * Accepts NTZ or LTZ input (parquet ms-timestamps read as NTZ;
    * session TZ is UTC so the cast is value-preserving). Integer
    * `floor` division — a plain `/` on Columns is double division and
    * mangles sub-100ms values. */
  def tsDigits(ts0: Column): Column = {
    val ts = ts0.cast("timestamp")
    concat(date_format(ts, "yyyyMMddHHmmss"),
           lpad(floor((unix_micros(ts) % 1000000L) / 1000L).cast("string"), 3, "0"))
  }

  /** Deterministic orders changelog: I for every order at o_orderdate;
    * U (status → 'U') at +5min for keys %3==0; D tombstone at +10min
    * for keys %5==0. */
  def ordersChangelog(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val ins = o.select(col("*"), col("o_orderdate").as("op_ts"),
      lit("I").as("manip"), lit(1).as("seq"))
    val upd = o.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .select(col("*"), expr("o_orderdate + INTERVAL 5 MINUTE").as("op_ts"),
        lit("U").as("manip"), lit(2).as("seq"))
    val del = o.filter(col("o_orderkey") % 5 === 0)
      .select(col("*"), expr("o_orderdate + INTERVAL 10 MINUTE").as("op_ts"),
        lit("D").as("manip"), lit(3).as("seq"))
    ins.unionByName(upd).unionByName(del)
  }

  /** Deterministic customer changelog (no ts column on customer, so the
    * op time is a fixed epoch + c_custkey seconds): I for every row; U
    * (c_mktsegment → 'UPDATED') at +5min for keys %4==0; D at +10min
    * for keys %10==0. */
  def customerChangelog(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir).withColumn(
      "base_ts", expr("TIMESTAMP '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,c_custkey)"))
    val ins = base.select(col("*"), col("base_ts").as("op_ts"),
      lit("I").as("manip"), lit(1).as("seq"))
    val upd = base.filter(col("c_custkey") % 4 === 0)
      .withColumn("c_mktsegment", lit("UPDATED"))
      .select(col("*"), expr("base_ts + INTERVAL 5 MINUTE").as("op_ts"),
        lit("U").as("manip"), lit(2).as("seq"))
    val del = base.filter(col("c_custkey") % 10 === 0)
      .select(col("*"), expr("base_ts + INTERVAL 10 MINUTE").as("op_ts"),
        lit("D").as("manip"), lit(3).as("seq"))
    ins.unionByName(upd).unionByName(del).drop("base_ts")
  }

  /** Wrap a changelog into the full envelope: `sv_*` + `after_image`
    * struct of `imageCols`. Timestamps inside the image must already be
    * digit strings (JSON-safe, and gives `parse_sqdata_ts` real work,
    * like the reference's `orders.sql`). */
  def envelope(changelog: DataFrame, table: String, keyCol: String,
               imageCols: Seq[(String, Column)]): DataFrame = {
    val digits = tsDigits(col("op_ts"))
    changelog.select(
      svCols(table, col("manip"),
        col(keyCol).cast("long") * 10 + col("seq"), col("seq"), digits) :+
      struct(imageCols.map { case (n, c) => c.as(n) }: _*).as("after_image"): _*)
  }

  /** Envelope → one JSON document per change (the Kafka wire shape). */
  def toEnvelopeJson(env: DataFrame): DataFrame =
    env.select(to_json(struct(col("*"))).as("value"))

  /** JSON documents → typed envelope rows via `from_json` with the
    * given schema (what a Kafka/stream source does per record). */
  def fromEnvelopeJson(json: DataFrame, schema: StructType): DataFrame =
    json.select(from_json(col("value"), schema).as("e")).select(col("e.*"))
}
