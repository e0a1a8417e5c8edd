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
    * for keys %5==0.
    *
    * ONE scan: each order row explodes into its 1–3 change rows via an
    * inline array (a 3-leg union would scan the 100 TB fact three
    * times; explode reads it once and amplifies in the projection). */
  def ordersChangelog(spark: SparkSession, dir: String): DataFrame = {
    val legs = expr(
      """filter(array(
        |  named_struct('manip', 'I', 'seq', 1,
        |               'op_ts', o_orderdate, 'status', o_orderstatus),
        |  IF(o_orderkey % 3 = 0,
        |     named_struct('manip', 'U', 'seq', 2,
        |                  'op_ts', o_orderdate + INTERVAL 5 MINUTE, 'status', 'U'),
        |     NULL),
        |  IF(o_orderkey % 5 = 0,
        |     named_struct('manip', 'D', 'seq', 3,
        |                  'op_ts', o_orderdate + INTERVAL 10 MINUTE, 'status', o_orderstatus),
        |     NULL)), x -> x IS NOT NULL)""".stripMargin)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"), explode(legs).as("chg"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("chg.status").as("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"),
        col("chg.op_ts").as("op_ts"), col("chg.manip").as("manip"),
        col("chg.seq").as("seq"))
  }

  /** Deterministic customer changelog (no ts column on customer, so the
    * op time is a fixed epoch + c_custkey seconds): I for every row; U
    * (c_mktsegment → 'UPDATED') at +5min for keys %4==0; D at +10min
    * for keys %10==0. Single scan, explode-amplified like
    * [[ordersChangelog]]. */
  def customerChangelog(spark: SparkSession, dir: String): DataFrame = {
    val legs = expr(
      """filter(array(
        |  named_struct('manip', 'I', 'seq', 1,
        |               'op_ts', base_ts, 'seg', c_mktsegment),
        |  IF(c_custkey % 4 = 0,
        |     named_struct('manip', 'U', 'seq', 2,
        |                  'op_ts', base_ts + INTERVAL 5 MINUTE, 'seg', 'UPDATED'),
        |     NULL),
        |  IF(c_custkey % 10 = 0,
        |     named_struct('manip', 'D', 'seq', 3,
        |                  'op_ts', base_ts + INTERVAL 10 MINUTE, 'seg', c_mktsegment),
        |     NULL)), x -> x IS NOT NULL)""".stripMargin)
    Tables.customer(spark, dir)
      .withColumn("base_ts",
        expr("TIMESTAMP '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,c_custkey)"))
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), explode(legs).as("chg"))
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("chg.seg").as("c_mktsegment"),
        col("chg.op_ts").as("op_ts"), col("chg.manip").as("manip"),
        col("chg.seq").as("seq"))
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
