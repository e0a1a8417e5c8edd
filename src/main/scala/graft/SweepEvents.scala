package graft

import org.apache.spark.sql.functions._

/** Dev-only 1×/10×/100× EVENTS sweep (not part of the library
  * surface): duplicates sf0.1 `events` 10× and 100× with shifted
  * event/user ids — 100× USERS at constant per-user activity, the
  * realistic growth axis for per-entity operators — and times the
  * events-derived keys of the r11 third stretch (EWMA anomaly,
  * last-touch attribution, burst hours, A/B lift, windowed funnel,
  * winsorized stats). All are per-user windows/aggs or
  * distinct-value walks, so the decade ratios should track data
  * volume ~linearly on 32 fixed cores; a super-linear decade means a
  * frame that was supposed to stay bounded grew with the corpus.
  */
object SweepEvents {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val base = "/root/testdata/sf0.1"
    val n = 5000000L

    def build(mult: Int, dir: String): Unit = {
      if (new java.io.File(s"$dir/events.parquet").exists()) return
      new java.io.File(dir).mkdirs()
      val ev = spark.read.parquet(s"$base/events.parquet")
      (0 until mult).map(i => ev
          .withColumn("event_id", col("event_id") + lit(i * n))
          .withColumn("user_id", col("user_id") + lit(i * n)))
        .reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    build(10, "/tmp/sweep_ev10x")
    build(100, "/tmp/sweep_ev100x")

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    val keys = Seq("ewma_anomaly", "attribution", "burst_hours", "ab_lift",
      "window_funnel", "winsorized_stats", "twap_value", "cep_episodes",
      // r12 stretch: per-user two-window frames, the multi-touch
      // carry, the bounded hourly/daily spine profilers, and the
      // count-table join audit (its rank runs over per-user keys —
      // WindowGroupLimit top-k, growing with the user axis)
      "mean_shift_detect", "multi_touch_attribution", "acf_hourly",
      "daily_trend", "join_card_est")
    for (k <- keys) {
      val fn = SparkEntry.queries(k)
      val t = Seq(base, "/tmp/sweep_ev10x", "/tmp/sweep_ev100x").map { dir =>
        Seq.fill(3)(time(fn(spark, dir).write.format("noop")
          .mode("overwrite").save())).sorted.apply(1)
      }
      println(f"SWEEPEV $k%-18s 1x=${t(0)}%6.2f  10x=${t(1)}%6.2f  " +
        f"100x=${t(2)}%7.2f  ratio100=${t(2) / t(0)}%5.1f")
    }
    spark.stop()
  }
}
