package graft

/** Dev scratchpad (labeled; not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val d = "/root/testdata/sf0.1"
    // warm
    SparkEntry.queries("hits_scores")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries("hits_scores")(spark, d)
        .write.format("noop").mode("overwrite").save()
      println(f"hits_scores pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
