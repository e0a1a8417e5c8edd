package graft

import org.apache.spark.sql.functions._

/** Native expressions vs independent reimplementations. */
class ExpressionSpec extends SparkTestBase {

  private def parse(s: String): java.sql.Timestamp =
    spark.sql(s"SELECT parse_sqdata_ts('$s') AS t").collect()(0)
      .getTimestamp(0)

  test("parse_sqdata_ts matches java.time for whole seconds") {
    import java.time._
    val cases = Seq("19700101000000", "20240229235959", "19991231235959",
      "20000301000000", "21001231120000", "19000228010203")
    for (c <- cases) {
      val expect = LocalDateTime.parse(c,
        format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss"))
        .toInstant(ZoneOffset.UTC)
      assert(parse(c).toInstant == expect, s"for $c")
    }
  }

  test("parse_sqdata_ts fraction digits: pad, truncate") {
    assert(parse("202401011230455").toInstant.getNano == 500000000) // ".5"
    assert(parse("20240101123045123").toInstant.getNano == 123000000)
    assert(parse("20240101123045123456").toInstant.getNano == 123456000)
    assert(parse("202401011230451234567").toInstant.getNano == 123456000) // >6 truncated
  }

  test("parse_sqdata_ts null propagates, short input errors") {
    val r = spark.sql("SELECT parse_sqdata_ts(CAST(NULL AS STRING))").collect()
    assert(r(0).isNullAt(0))
    intercept[Exception] { spark.sql("SELECT parse_sqdata_ts('2024')").collect() }
  }

  test("fingerprint64 matches an independent FNV-1a") {
    def fnv(s: String): Long = {
      var h = 0xcbf29ce484222325L
      for (b <- s.getBytes("UTF-8")) { h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    val cases = Seq("", "a", "hello", "the quick brown fox", "héllo wörld", "数据")
    val rows = spark.createDataFrame(cases.map(Tuple1(_))).toDF("s")
      .select(col("s"), GraftFunctions.fingerprint64(col("s")).as("fp"))
      .collect()
    for (r <- rows) assert(r.getLong(1) == fnv(r.getString(0)), s"for '${r.getString(0)}'")
  }

  test("expressions agree between codegen and interpreted eval") {
    val df = sources.Tables.documents(spark, sfDir).limit(50)
      .select(GraftFunctions.fingerprint64(col("text")).as("fp"))
    val withCodegen = df.collect().map(_.getLong(0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.collect().map(_.getLong(0)).toSeq
      assert(withCodegen == interpreted)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
