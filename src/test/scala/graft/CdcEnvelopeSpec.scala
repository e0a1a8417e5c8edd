package graft

import org.apache.spark.sql.functions._

import graft.sources.{CdcEnvelope, Tables}

/** Envelope synthesis + JSON wire round-trip fidelity. */
class CdcEnvelopeSpec extends SparkTestBase {

  test("envelope carries all 15 sv_* columns plus after_image") {
    val chg = CdcEnvelope.ordersChangelog(spark, sfDir)
    val env = CdcEnvelope.envelope(chg, "SALES.ORDERS", "o_orderkey", Seq(
      "SalesOrderId" -> col("o_orderkey"),
      "TotalDue" -> col("o_totalprice")))
    val svCols = env.columns.filter(_.startsWith("sv_"))
    assert(svCols.length == 15, svCols.mkString(","))
    assert(env.columns.contains("after_image"))
    assert(env.schema("after_image").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("SalesOrderId", "TotalDue"))
  }

  test("JSON wire round-trip is lossless") {
    val chg = CdcEnvelope.ordersChangelog(spark, sfDir).limit(500)
    val env = CdcEnvelope.envelope(chg, "SALES.ORDERS", "o_orderkey", Seq(
      "SalesOrderId" -> col("o_orderkey"),
      "Status" -> col("o_orderstatus"),
      "TotalDue" -> col("o_totalprice"))).cache()
    val decoded = CdcEnvelope.fromEnvelopeJson(CdcEnvelope.toEnvelopeJson(env), env.schema)
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select(col("sv_trans_id"), col("sv_manip_type"), col("sv_op_timestamp"),
        col("after_image.SalesOrderId"), col("after_image.Status"),
        col("after_image.TotalDue"))
      .collect().map(_.toSeq).toSet
    assert(key(decoded) == key(env) && key(env).size == 500)
  }

  test("changelog synthesis is deterministic and complete") {
    val a = CdcEnvelope.ordersChangelog(spark, sfDir)
    val nOrders = Tables.orders(spark, sfDir).count()
    val byManip = a.groupBy("manip").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byManip("I") == nOrders)
    assert(byManip("U") > 0 && byManip("D") > 0)
    assert(byManip("U") < nOrders && byManip("D") < byManip("U"))
  }
}
