package graft

/** Dev scratchpad (not part of the library surface): smoke-run the
  * flagship and print a couple of rows. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val df = SparkEntry.entry(spark)
    println("ENTRY rows: " + df.count())
    df.show(3, false)
    // drive any query by name: runMain graft.Scratch <key> [sfDir]
    args.headOption.foreach { key =>
      val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
      val q = SparkEntry.queries(key)(spark, dir)
      println(s"QUERY $key rows: " + q.count())
      q.show(5, false)
    }
    spark.stop()
  }
}
