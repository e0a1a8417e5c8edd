package graft

/** r16 verdict item 7 — storage-level audit of the dedup family's big
  * cached frames. ISOLATED_r16 observed the family reading 1.4-1.6×
  * under a 1.26-1.45× global host factor: its chain is
  * materialization-bound (oriented-pair / edge / label caches inside
  * [[graft.operators.Dedup.clusterPairs]] re-materialize under
  * block-manager pressure), and an executor under memory pressure at
  * 100 TB is the throttled-host case PERMANENTLY. This probe measures
  * dedup_best_rep / rep_length_bias / dedup_source_profile isolated,
  * with the clustering caches at MEMORY_AND_DISK vs DISK_ONLY
  * (`graft.dedup.cacheLevel` — read per call, so both arms run in ONE
  * JVM), under whatever heap the caller launched (the audit is meant
  * for a CONSTRAINED JVM, e.g. -Xmx3g, where the arms actually
  * diverge). Cold passes: plan cache cleared between runs.
  *
  * java -cp 'target/scala-2.13/classes:&lt;spark jars dir&gt;/&#42;'
  *   &lt;add-opens list&gt; -Xmx3g graft.StorageAudit /tmp/bench10x
  *   STORAGEAUDIT_r17.txt
  */
object StorageAudit {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/tmp/bench10x")
    val out = args.lift(1).getOrElse("STORAGEAUDIT_r17.txt")
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)

    val memSp = new java.util.concurrent.atomic.AtomicLong
    val dskSp = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          memSp.addAndGet(m.memoryBytesSpilled)
          dskSp.addAndGet(m.diskBytesSpilled)
        }
      })
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }

    val keys = Seq("dedup_best_rep", "rep_length_bias", "dedup_source_profile")
    val lines = scala.collection.mutable.ListBuffer.empty[String]
    def log(s: String): Unit = { println(s); lines += s }
    log(s"# heapMB=${Runtime.getRuntime.maxMemory / 1048576} dir=$dataDir")

    // signature-store scratch builds once per JVM (parquet, shared by
    // both arms — the audit targets the clustering caches, not the
    // store build); warm it before either arm measures
    keys.foreach { k =>
      try SparkEntry.queries(k)(spark, dataDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => log(s"# warmup $k failed: ${e.getMessage}") }
    }

    Seq("MEMORY_AND_DISK", "DISK_ONLY").foreach { arm =>
      if (arm == "DISK_ONLY") sys.props("graft.dedup.cacheLevel") = "DISK_ONLY"
      else sys.props.remove("graft.dedup.cacheLevel")
      keys.foreach { key =>
        val fn = SparkEntry.queries(key)
        val runs = Seq.fill(3) {
          spark.catalog.clearCache()
          val (m0, d0) = (memSp.get, dskSp.get)
          val t = time(fn(spark, dataDir).write.format("noop")
            .mode("overwrite").save())
          (t, (memSp.get - m0) / 1e6, (dskSp.get - d0) / 1e6)
        }
        val med = runs.sortBy(_._1).apply(1)
        log(f"STORAGEAUDIT $key%-22s $arm%-16s median=${med._1}%7.3fs " +
          f"runs=${runs.map(r => f"${r._1}%.2f").mkString("[", ",", "]")} " +
          f"spillMemMB=${med._2}%8.1f spillDskMB=${med._3}%8.1f")
      }
    }
    val header = "# STORAGEAUDIT — dedup-family clustering caches, " +
      "MEMORY_AND_DISK vs DISK_ONLY in one constrained JVM"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      (header +: lines).mkString("", "\n", "\n"))
    spark.stop()
  }
}
