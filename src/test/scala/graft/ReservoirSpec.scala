package graft

import org.apache.spark.sql.functions._

/** Statistical checks for the reservoir-sample aggregate. */
class ReservoirSpec extends SparkTestBase {

  test("sample size: min(k, group size); values come from the group") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, (i % 3).toString)).toDF("v", "g")
    val got = df.groupBy("g")
      .agg(GraftFunctions.reservoir_sample(col("v"), 50).as("s"),
        count(lit(1)).as("n"))
      .collect()
    for (r <- got) {
      val g = r.getString(0)
      val s = r.getSeq[Long](1)
      assert(s.length == 50)
      assert(s.forall(v => (v % 3).toString == g), s"foreign values in group $g")
      assert(s.distinct.length == s.length, "duplicates in sample")
    }
    // tiny group: whole group returned
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("v", "g")
      .groupBy("g").agg(GraftFunctions.reservoir_sample(col("v"), 50).as("s"))
      .collect()(0).getSeq[Long](1)
    assert(tiny.sorted == Seq(1L, 2L))
  }

  test("sampling is roughly uniform across the value range") {
    import spark.implicits._
    // 20k values, sample 2k, split range into 10 deciles — each decile
    // expects ~200; a heavily position-biased sampler fails this wide gate
    val df = (0L until 20000L).toDF("v").repartition(8)
    val s = df.agg(GraftFunctions.reservoir_sample(col("v"), 2000).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(s.length == 2000)
    val byDecile = s.groupBy(_ / 2000L).view.mapValues(_.size)
    for (d <- 0L until 10L) {
      val n = byDecile.getOrElse(d, 0)
      assert(n > 100 && n < 320, s"decile $d has $n of 2000 — biased")
    }
  }

  test("top_k returns the exact k largest across partitions (merge path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val vals = Seq.fill(5000)(rnd.nextLong() % 1000000L)
    val got = vals.toDF("v").repartition(16) // force partial+merge
      .agg(GraftFunctions.top_k(col("v"), 25).as("t"))
      .collect()(0).getSeq[Long](0)
    assert(got == vals.sorted.reverse.take(25))
    // k larger than the data: everything, sorted desc
    val small = Seq(3L, 1L, 2L).toDF("v")
      .agg(GraftFunctions.top_k(col("v"), 10)).collect()(0).getSeq[Long](0)
    assert(small == Seq(3L, 2L, 1L))
  }

  test("SQL surface works") {
    GraftFunctions.register(spark)
    sources.Tables.documents(spark, sfDir).createOrReplaceTempView("docs_rs")
    val n = spark.sql(
      "SELECT size(reservoir_sample(doc_id, 7)) FROM docs_rs GROUP BY lang")
      .collect().map(_.getInt(0))
    assert(n.forall(_ == 7))
  }
}
