package graft

/** r19 optimization round, guide §7.2 applied suite-wide: one compact
  * shape row per declared query — Exchange / join-strategy / window /
  * scan counts, cartesian products, and whether every parquet scan
  * carries a pruned ReadSchema — so "every operator examined" is a
  * checkable artifact (plans/r19/PLAN_SHAPE.txt) instead of prose.
  * AQE initial plans (same view PlanDump records).
  *
  * `sbt "runMain graft.PlanShape plans/r19/PLAN_SHAPE.txt"`
  */
object PlanShape {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("plans/r19/PLAN_SHAPE.txt")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val sb = new StringBuilder
    sb.append(s"# plan-shape audit @ $sfDir — one row per declared query\n")
    sb.append("# key exchanges smj bhj shj cartesian windows scans " +
      "full_readschema_scans plan_lines\n")
    def count(txt: String, re: String): Int = re.r.findAllIn(txt).size
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (key, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // a parquet scan reading every column of a wide base table is
        // the §6 pruning smell; count scans whose ReadSchema carries
        // 10+ fields (none of the base tables need that many anywhere)
        val wide = "ReadSchema: struct<[^>]*>".r.findAllIn(txt)
          .count(s => s.count(_ == ',') >= 9)
        sb.append(f"$key%-34s ${count(txt, "\\bExchange\\b")}%3d " +
          f"${count(txt, "SortMergeJoin")}%3d " +
          f"${count(txt, "BroadcastHashJoin")}%3d " +
          f"${count(txt, "ShuffledHashJoin")}%3d " +
          f"${count(txt, "CartesianProduct")}%3d " +
          f"${count(txt, "\\bWindow\\b")}%3d " +
          f"${count(txt, "Scan parquet")}%3d " +
          f"$wide%3d ${txt.linesIterator.size}%6d\n")
      } catch {
        case e: Throwable => sb.append(s"$key FAILED ${e.getMessage}\n")
      }
      spark.catalog.clearCache()
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"PLANSHAPE -> $out")
    spark.stop()
  }
}
