package graft

/** Dev scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val d = "/root/testdata/sf0.1"
    for (name <- Seq("cdc_project", "session_agg", "rollup_agg", "range_join", "q5_supplier_volume")) {
      val df = SparkEntry.queries(name)(spark, d)
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Json") || l.contains("json")
          || l.contains("Window") || l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin")
          || l.contains("Expand") || l.contains("Generate") || l.contains("Scan parquet"))
        .map(_.take(150)).mkString("\n"))
    }
    spark.stop()
  }
}
