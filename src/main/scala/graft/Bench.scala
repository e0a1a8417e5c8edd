package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query end-to-end at
  * SPARK_GRAFT_SF_DIR, forcing full materialization through the noop
  * sink (count() would let Spark skip computing projected columns).
  * Prints ONE JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime()
      fn
      (System.nanoTime() - t0) / 1e9
    }

    // JVM/codegen warm-up on the smallest SF so per-query numbers
    // measure the plan, not first-call JIT + codegen compilation.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").write.format("noop")
        .mode("overwrite").save()
      catch { case _: Throwable => }
    }

    // median of three measured passes: min-of-2 is not robust to
    // background machine load on the driver host (a loaded r2 run
    // recorded 2× the code's steady-state cost) — the median discards
    // one outlier in either direction, and the emitted per-query
    // [min, median, max] spread makes a loaded run self-diagnosing
    // (wide spread ⇒ distrust the total).
    //
    // Self-defense against host load (the r7 artifact recorded one
    // query at [1.58, 41.68, 51.27] — min equal to steady state,
    // median 26× it): a triple whose max/min spread exceeds
    // MaxSpread AND whose absolute swing is past the noise floor is
    // REJECTED and re-measured, up to MaxRetries; the best-spread
    // attempt wins, so a persistently loaded host degrades to
    // today's behavior (wide spread in the artifact) instead of
    // silently publishing a contaminated median.
    val MaxSpread = 5.0
    val NoiseFloorSec = 1.0
    val MaxRetries = 2
    def contaminated(runs: Seq[Double]): Boolean =
      runs.head > 0 && runs.last - runs.head > NoiseFloorSec &&
        runs.last / runs.head > MaxSpread
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Seq[Double] = try {
        Seq.fill(3)(
          time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())).sorted
      } catch { case _: Throwable => Seq(-1.0, -1.0, -1.0) }
      var best = once()
      var retries = 0
      while (contaminated(best) && retries < MaxRetries) {
        val again = once()
        if (again.head >= 0 && again.last / again.head < best.last / best.head)
          best = again
        retries += 1
      }
      name -> best
    }
    val qs = results.map { case (k, r) => s""""$k":${r(1)}""" }.mkString("{", ",", "}")
    val spread = results.map { case (k, r) =>
      s""""$k":[${r.head},${r(1)},${r.last}]""" }.mkString("{", ",", "}")
    val total = results.map(_._2(1)).filter(_ >= 0).sum
    // a crashed query must be LOUD in the artifact, not a silent -1
    // dropped from the total
    val failed = results.collect { case (k, r) if r(1) < 0 => s""""$k"""" }
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
