package graft

/** Dev scratchpad (not part of the library surface): smoke-run the
  * flagship and print a couple of rows. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val df = SparkEntry.entry(spark)
    println("ENTRY rows: " + df.count())
    df.show(3, false)
    spark.stop()
  }
}
