package graft

/** r19 optimization-round tooling: dump `.explain("formatted")` for
  * named queries to files, so plan-shape claims (Exchange counts, join
  * strategies, PushedFilters) are checkable without running Spark.
  *
  * `sbt "runMain graft.PlanDump plans/r19 before topk_diverse hits_scores"`
  * writes `plans/r19/topk_diverse_before.txt`, … against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1 — the bench's scale factor, so
  * the dumped plan is the one the bench times; AQE initial plan).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <key>...")
    val outDir = args(0)
    val tag = args(1)
    val keys = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    keys.foreach { key =>
      val df = SparkEntry.queries(key)(spark, sfDir)
      // queryExecution.explainString gives exactly what
      // .explain("formatted") prints, without capturing stdout
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val exchanges = "\\bExchange\\b".r.findAllIn(txt).size
      val header = s"== $key @ $sfDir ($tag) == exchange_mentions=$exchanges\n" +
        s"(builder-side materializations — localCheckpoint/persist of\n" +
        s" intermediate frames — run before this final plan; see query source)\n\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${key}_$tag.txt"),
        (header + txt).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"PLANDUMP $key -> $outDir/${key}_$tag.txt")
    }
    spark.stop()
  }
}
