package graft

import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._
    val ev = sources.Tables.events(spark, "/root/testdata/sf0.001")
    val rt = ev.select(
      $"event_id",
      GraftFunctions.parse_sqdata_ts(
        concat(date_format($"ts", "yyyyMMddHHmmss"),
               lpad((floor(unix_micros($"ts") / 1000) % 1000).cast("string"), 3, "0"))
      ).as("parsed"),
      date_trunc("millisecond", $"ts").as("expect"))
    println("HAPPY mismatches: " + rt.filter($"parsed" =!= $"expect").count())
    println("SQL surface: " + spark.sql(
      "SELECT parse_sqdata_ts('20240101123456789'), fingerprint64('hello')").collect().mkString)
    // PROBE: null input → null out (no NPE)
    println("PROBE null: " + spark.sql(
      "SELECT parse_sqdata_ts(CAST(NULL AS STRING)), fingerprint64(CAST(NULL AS STRING))").collect().mkString)
    // PROBE: too-short string → expect a per-row error
    try {
      spark.sql("SELECT parse_sqdata_ts('2024')").collect()
      println("PROBE short: NO ERROR (unexpected)")
    } catch { case e: Throwable => println("PROBE short: error ok: " + e.getClass.getSimpleName) }
    // PROBE: wrong input type → analysis-time error
    try {
      spark.sql("SELECT fingerprint64(42)").collect()
      println("PROBE type: NO ERROR (unexpected)")
    } catch { case e: Throwable => println("PROBE type: error ok: " + e.getMessage.take(120)) }
    // PROBE: codegen vs interpreted parity
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    println("PROBE nocodegen mismatches: " + rt.filter($"parsed" =!= $"expect").count())
    spark.stop()
  }
}
