package graft

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    for (d <- Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")) {
      for (n <- Seq("window_rank", "topk_per_group")) {
        SparkEntry.queries(n)(spark, d).write.format("noop").mode("overwrite").save() // warm
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, d).write.format("noop").mode("overwrite").save()
        println(f"CMP $d $n ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
