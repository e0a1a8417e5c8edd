package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

import graft.functions.{Fingerprint64, ParseSqdataTs}

/** Registration + Column-API surface for graft's native Catalyst
  * expressions. Registration is idempotent; every `SparkEntry.queries`
  * entry calls [[register]] first so the functions resolve regardless
  * of how the session was built (the driver's `Verify`/`Bench` build
  * their own sessions without [[GraftExtensions]]).
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "parse_sqdata_ts", exprs => ParseSqdataTs(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "fingerprint64", exprs => Fingerprint64(exprs.head), "built-in")
  }

  /** `yyyyMMddHHmmss[f...]` digit string → timestamp (ref DateParser). */
  def parse_sqdata_ts(c: Column): Column = call_function("parse_sqdata_ts", c)

  /** 64-bit FNV-1a content fingerprint. */
  def fingerprint64(c: Column): Column = call_function("fingerprint64", c)
}
