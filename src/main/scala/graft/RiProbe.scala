package graft

/** One-off shuffle/scan accounting for the ri_audit shape A/B (r17):
  * wall time on this host swings minute-to-minute with background
  * kernel/daemon load, so the decision metric is the DETERMINISTIC
  * one — bytes shuffled and records moved per run. Runs the current
  * ri_audit N times at the given dir and prints per-run shuffle
  * write bytes/records + wall (min-of-N wall as a secondary read).
  *
  * `sbt "runMain graft.RiProbe /tmp/bench10x 5"`
  */
object RiProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/bench10x")
    val n = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val shufB = new java.util.concurrent.atomic.AtomicLong
    val shufR = new java.util.concurrent.atomic.AtomicLong
    val inRec = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          shufB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          inRec.addAndGet(m.inputMetrics.recordsRead)
        }
      })
    val fn = SparkEntry.queries("ri_audit")
    fn(spark, dir).write.format("noop").mode("overwrite").save() // warm-up
    val walls = (1 to n).map { i =>
      val (b0, r0, i0) = (shufB.get, shufR.get, inRec.get)
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"RIPROBE run$i wall=$t%6.3fs shufMB=${(shufB.get - b0) / 1e6}%8.2f " +
        f"shufRecs=${shufR.get - r0}%10d inputRecs=${inRec.get - i0}%10d")
      t
    }
    println(f"RIPROBE minWall=${walls.min}%6.3fs dir=$dir")
    spark.stop()
  }
}
