package graft

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val df = SparkEntry.entry(spark)
    df.show(5, false)
    println("ENTRY rows: " + df.count())
    spark.stop()
  }
}
