package graft

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val d = "/root/testdata/sf0.1"
    // warm
    SparkEntry.queries("cdc_project")(spark, d).write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime()
    SparkEntry.queries("cdc_project")(spark, d).write.format("noop").mode("overwrite").save()
    println(f"CDC_PROJECT ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
