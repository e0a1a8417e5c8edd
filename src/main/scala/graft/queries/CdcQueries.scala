package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.GraftFunctions
import graft.GraftFunctions.parse_sqdata_ts
import graft.operators.{Cdc, EnrichmentJoin, Windows}
import graft.sources.{CdcEnvelope, Tables}

/** §2.A — the reference's own surface (CDC + event-time windows),
  * expressed batch-first so the DuckDB oracle can replay it. The
  * streaming twins live in `graft.streaming`.
  */
object CdcQueries {

  /** DuckDB CTE mirroring [[CdcEnvelope.ordersChangelog]] exactly. */
  private val OrdersChg =
    """WITH chg AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
      |         o_orderdate AS op_ts, 'I' AS manip, 1 AS seq FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, 'U', o_totalprice, o_orderdate,
      |         o_orderdate + INTERVAL 5 MINUTE, 'U', 2 FROM orders WHERE o_orderkey % 3 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
      |         o_orderdate + INTERVAL 10 MINUTE, 'D', 3 FROM orders WHERE o_orderkey % 5 = 0
      |)""".stripMargin

  /** DuckDB CTE mirroring [[CdcEnvelope.customerChangelog]] exactly. */
  private val CustChg =
    """WITH chg AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
      |         TIMESTAMP '2024-01-01 00:00:00' + to_seconds(c_custkey) AS op_ts,
      |         'I' AS manip, 1 AS seq FROM customer
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, 'UPDATED',
      |         TIMESTAMP '2024-01-01 00:00:00' + to_seconds(c_custkey) + INTERVAL 5 MINUTE,
      |         'U', 2 FROM customer WHERE c_custkey % 4 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
      |         TIMESTAMP '2024-01-01 00:00:00' + to_seconds(c_custkey) + INTERVAL 10 MINUTE,
      |         'D', 3 FROM customer WHERE c_custkey % 10 = 0
      |)""".stripMargin

  private def sumDec(c: org.apache.spark.sql.Column) = QueryMath.sumDbl6(c)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1 — the reference's parseTs UDF as a native expression: format
    // each event ts to the CDC digit form, parse it back.
    "cdc_parse_ts" -> { (s, d) =>
      GraftFunctions.register(s)
      Tables.events(s, d).select(
        col("event_id"),
        parse_sqdata_ts(CdcEnvelope.tsDigits(col("ts"))).as("parsed_ts"))
    },

    // A2 — envelope → JSON → decode → after_image projection (ref orders.sql).
    "cdc_project" -> { (s, d) =>
      GraftFunctions.register(s)
      // fanOut: the JSON encode/decode round-trip is the CPU cost and
      // the single-row-group scan would otherwise run it on one task
      // (see Tables.fanOut) — the latest-image/enrich consumers skip
      // this (their first shuffle parallelizes them anyway).
      val chg = Tables.fanOut(CdcEnvelope.ordersChangelog(s, d))
      val env = CdcEnvelope.envelope(chg, "SALES.ORDERS", "o_orderkey", Seq(
        "SalesOrderId" -> col("o_orderkey"),
        "OrderDate" -> CdcEnvelope.tsDigits(col("o_orderdate")),
        "Status" -> col("o_orderstatus"),
        "CustomerId" -> col("o_custkey"),
        "TotalDue" -> col("o_totalprice")))
      // Schema-on-read: declare only the fields this projection needs —
      // from_json then skips converting the other 13 sv_* columns (the
      // intermediate `e.*` expansion otherwise defeats Catalyst's own
      // JSON field pruning).
      val needed = org.apache.spark.sql.types.StructType(
        env.schema.filter(f =>
          Set("sv_manip_type", "sv_op_timestamp", "after_image").contains(f.name)))
      val decoded = CdcEnvelope.fromEnvelopeJson(CdcEnvelope.toEnvelopeJson(env), needed)
      decoded.select(
        col("after_image.SalesOrderId").as("sales_order_id"),
        parse_sqdata_ts(col("after_image.OrderDate")).as("order_date"),
        col("after_image.Status").as("status"),
        col("after_image.CustomerId").as("customer_id"),
        col("after_image.TotalDue").cast("double").as("total_due"),
        parse_sqdata_ts(col("sv_op_timestamp")).as("order_asof"),
        col("sv_manip_type").as("manip_type"))
    },

    // A3 — latest-image upsert materialization.
    "cdc_latest_image" -> { (s, d) =>
      Cdc.latestImage(CdcEnvelope.ordersChangelog(s, d), "o_orderkey").select(
        col("o_orderkey").as("order_key"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").as("total_price"))
    },

    // A4 — chained latest-value enrichment joins (ref StreamingJob:112-113).
    "enrich_join" -> { (s, d) =>
      val custLatest = Cdc.latestImage(CdcEnvelope.customerChangelog(s, d), "c_custkey")
        .drop("op_ts", "seq", "manip")
        .withColumnRenamed("c_custkey", "o_custkey")
      val withCust = EnrichmentJoin.enrich(Tables.orders(s, d), custLatest, "o_custkey")
        .withColumnRenamed("c_nationkey", "n_nationkey")
      val withNation = EnrichmentJoin.enrich(
        withCust, Tables.nation(s, d), "n_nationkey")
        .withColumnRenamed("n_regionkey", "r_regionkey")
      val withRegion = EnrichmentJoin.enrich(
        withNation, Tables.region(s, d), "r_regionkey")
      withRegion.select(
        col("o_orderkey").as("order_key"),
        col("o_totalprice").as("total_price"),
        col("c_name").as("customer_name"),
        col("c_mktsegment").as("mktsegment"),
        col("n_name").as("nation"),
        col("r_name").as("region"))
    },

    // A5 — 10-minute tumbling window agg (ref output.sql).
    "tumble_agg" -> { (s, d) =>
      Windows.tumble(Tables.events(s, d), "ts", "10 minutes",
        Seq(col("event_type")),
        Seq(count(lit(1)).as("n_events"), sumDec(col("value")).as("sum_value")))
    },

    // A6 — hopping window: 10 minutes every 5.
    "hop_agg" -> { (s, d) =>
      Windows.hop(Tables.events(s, d), "ts", "10 minutes", "5 minutes",
        Seq(col("event_type")),
        Seq(count(lit(1)).as("n_events"), sumDec(col("value")).as("sum_value")))
    },

    // A7 — session windows, 30-minute gap per user.
    "session_agg" -> { (s, d) =>
      Windows.session(Tables.events(s, d), "ts", "30 minutes",
        Seq(col("user_id")),
        Seq(count(lit(1)).as("n_events"), sumDec(col("value")).as("sum_value")))
    },

    // A8 — changelog profile.
    "cdc_changelog_stats" -> { (s, d) =>
      Cdc.changelogStats(CdcEnvelope.ordersChangelog(s, d), "o_orderkey")
    },

    // A10 — SCD Type 2: the customer changelog as validity-interval
    // versions (the warehouse-dimension form of A3's latest image —
    // every version kept, delete closes the open interval).
    "scd2_intervals" -> { (s, d) =>
      Cdc.scd2(CdcEnvelope.customerChangelog(s, d), "c_custkey")
        .select(col("c_custkey").as("cust_key"),
          col("c_mktsegment").as("mktsegment"),
          col("valid_from"), col("valid_to"), col("is_current"))
    },

    // A12 — MERGE INTO: the stored latest-image snapshot advanced by
    // a changelog delta without re-windowing history (anti-join on
    // touched keys + delta-only window). THE ORACLE IS THE FULL
    // RECOMPUTE — apply(snapshot(<t), delta(≥t)) ≡ latest_image(all)
    // is the operator's contract.
    "cdc_upsert_merge" -> { (s, d) =>
      val chg = CdcEnvelope.ordersChangelog(s, d)
      val cut = lit("1998-01-01").cast("timestamp")
      val snapshot = Cdc.latestImage(chg.filter(col("op_ts") < cut), "o_orderkey")
      Cdc.applyChanges(snapshot, chg.filter(col("op_ts") >= cut), "o_orderkey")
        .select(col("o_orderkey").as("order_key"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").as("total_price"))
    },

    // A13 — snapshot diff: the latest image as of the A12 cut vs the
    // final image — per key added/removed/changed with before/after
    // values, unchanged omitted. The reconciliation every
    // snapshot-rebuild pipeline runs before publishing.
    "snapshot_diff" -> { (s, d) =>
      val chg = CdcEnvelope.ordersChangelog(s, d)
      val cut = lit("1998-01-01").cast("timestamp")
      Cdc.snapshotDiff(
        Cdc.latestImage(chg.filter(col("op_ts") < cut), "o_orderkey"),
        Cdc.latestImage(chg, "o_orderkey"),
        "o_orderkey", Seq("o_orderstatus"))
        .select(col("o_orderkey").as("order_key"), col("change_type"),
          col("o_orderstatus_before").as("status_before"),
          col("o_orderstatus_after").as("status_after"))
    },

    // A11 — point-in-time lookup against the orders SCD2 dimension:
    // three deterministic probes per key (+2/+7/+12 min off the
    // insert time) hit version 1, version 2 where an update exists,
    // and the post-delete gap (null status) respectively.
    "scd2_pit_join" -> { (s, d) =>
      val scd = Cdc.scd2(CdcEnvelope.ordersChangelog(s, d), "o_orderkey")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("valid_from"), col("valid_to"))
      val probes = Tables.orders(s, d).select(col("o_orderkey"),
        explode(array(
          expr("o_orderdate + INTERVAL 2 MINUTE"),
          expr("o_orderdate + INTERVAL 7 MINUTE"),
          expr("o_orderdate + INTERVAL 12 MINUTE"))).as("probe_ts"))
      Cdc.pointInTime(probes, scd, "o_orderkey", "probe_ts")
        .select(col("o_orderkey").as("order_key"), col("probe_ts"),
          col("o_orderstatus").as("status"))
    })

  val oracles: Map[String, String] = Map(
    "cdc_parse_ts" ->
      "SELECT event_id, date_trunc('milliseconds', ts) AS parsed_ts FROM events",

    "cdc_project" -> s"""$OrdersChg
      |SELECT o_orderkey AS sales_order_id,
      |       date_trunc('milliseconds', o_orderdate) AS order_date,
      |       o_orderstatus AS status,
      |       o_custkey AS customer_id,
      |       CAST(o_totalprice AS DOUBLE) AS total_due,
      |       date_trunc('milliseconds', op_ts) AS order_asof,
      |       manip AS manip_type
      |FROM chg""".stripMargin,

    "cdc_latest_image" -> s"""$OrdersChg, r AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
      |             ORDER BY op_ts DESC, seq DESC) AS rn FROM chg
      |)
      |SELECT o_orderkey AS order_key, o_orderstatus AS status,
      |       o_totalprice AS total_price
      |FROM r WHERE rn = 1 AND manip <> 'D'""".stripMargin,

    "enrich_join" -> s"""$CustChg, r AS (
      |  SELECT *, row_number() OVER (PARTITION BY c_custkey
      |             ORDER BY op_ts DESC, seq DESC) AS rn FROM chg
      |), latest AS (SELECT * FROM r WHERE rn = 1 AND manip <> 'D')
      |SELECT o.o_orderkey AS order_key,
      |       o.o_totalprice AS total_price,
      |       c.c_name AS customer_name, c.c_mktsegment AS mktsegment,
      |       n.n_name AS nation, r2.r_name AS region
      |FROM orders o
      |JOIN latest c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r2 ON n.n_regionkey = r2.r_regionkey""".stripMargin,

    "tumble_agg" ->
      """SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS window_start, event_type,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "hop_agg" ->
      """WITH b AS (
        |  SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS ws, event_type, value FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE, event_type, value FROM events
        |)
        |SELECT ws AS window_start, event_type, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM b GROUP BY 1, 2""".stripMargin,

    "session_agg" ->
      """WITH x AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |), y AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                           ROWS UNBOUNDED PRECEDING) AS sid FROM x
        |)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM y GROUP BY user_id, sid""".stripMargin,

    "cdc_changelog_stats" -> s"""$OrdersChg
      |SELECT manip AS manip_type, count(*) AS n_changes,
      |       count(DISTINCT o_orderkey) AS n_keys
      |FROM chg GROUP BY 1""".stripMargin,

    // the FULL latest-image recompute — merge ≡ recompute.
    "cdc_upsert_merge" -> s"""$OrdersChg, r AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
      |             ORDER BY op_ts DESC, seq DESC) AS rn FROM chg
      |)
      |SELECT o_orderkey AS order_key, o_orderstatus AS status,
      |       o_totalprice AS total_price
      |FROM r WHERE rn = 1 AND manip <> 'D'""".stripMargin,

    "snapshot_diff" -> s"""$OrdersChg, rb AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
      |             ORDER BY op_ts DESC, seq DESC) AS rn
      |  FROM chg WHERE op_ts < TIMESTAMP '1998-01-01 00:00:00'
      |), before_img AS (
      |  SELECT o_orderkey, o_orderstatus FROM rb WHERE rn = 1 AND manip <> 'D'
      |), ra AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
      |             ORDER BY op_ts DESC, seq DESC) AS rn FROM chg
      |), after_img AS (
      |  SELECT o_orderkey, o_orderstatus FROM ra WHERE rn = 1 AND manip <> 'D'
      |)
      |SELECT coalesce(b.o_orderkey, a.o_orderkey) AS order_key,
      |       CASE WHEN b.o_orderkey IS NULL THEN 'added'
      |            WHEN a.o_orderkey IS NULL THEN 'removed'
      |            ELSE 'changed' END AS change_type,
      |       b.o_orderstatus AS status_before,
      |       a.o_orderstatus AS status_after
      |FROM before_img b FULL OUTER JOIN after_img a
      |  ON b.o_orderkey = a.o_orderkey
      |WHERE b.o_orderkey IS NULL OR a.o_orderkey IS NULL
      |   OR b.o_orderstatus IS DISTINCT FROM a.o_orderstatus""".stripMargin,

    "scd2_intervals" -> s"""$CustChg
      |SELECT cust_key, mktsegment,
      |       date_trunc('milliseconds', valid_from) AS valid_from,
      |       date_trunc('milliseconds', valid_to) AS valid_to,
      |       (valid_to IS NULL) AS is_current
      |FROM (
      |  SELECT c_custkey AS cust_key, c_mktsegment AS mktsegment,
      |         op_ts AS valid_from,
      |         lead(op_ts) OVER (PARTITION BY c_custkey
      |           ORDER BY op_ts, seq) AS valid_to,
      |         manip
      |  FROM chg)
      |WHERE manip <> 'D'""".stripMargin,

    "scd2_pit_join" -> s"""$OrdersChg, v AS (
      |  SELECT o_orderkey, o_orderstatus, op_ts AS valid_from,
      |         lead(op_ts) OVER (PARTITION BY o_orderkey
      |           ORDER BY op_ts, seq) AS valid_to,
      |         manip
      |  FROM chg),
      |scd AS (SELECT * FROM v WHERE manip <> 'D'),
      |p AS (
      |  SELECT o_orderkey, o_orderdate + INTERVAL 2 MINUTE AS probe_ts FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, o_orderdate + INTERVAL 7 MINUTE FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, o_orderdate + INTERVAL 12 MINUTE FROM orders)
      |SELECT p.o_orderkey AS order_key,
      |       date_trunc('milliseconds', p.probe_ts) AS probe_ts,
      |       s.o_orderstatus AS status
      |FROM p LEFT JOIN scd s
      |  ON p.o_orderkey = s.o_orderkey
      | AND p.probe_ts >= s.valid_from
      | AND (s.valid_to IS NULL OR p.probe_ts < s.valid_to)""".stripMargin)
}
