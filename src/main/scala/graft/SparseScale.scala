package graft

import org.apache.spark.sql.functions._

/** r16 verdict item 6 — the 100× DECADE READ for the r16
  * postings-cache shape of `sparse_sim_topk` (and, cheaply alongside,
  * the coded-ANN keys `embed_pq_topk` / `embed_ivfpq_topk`): the one
  * claim in SPARSEPROBE_r16's scale contract that was argued, not
  * measured, is the cache-SPILL behavior — "at 100 TB the postings
  * cache spills to local disk; one write+read of the postings vs
  * re-tokenizing the corpus per consumer". This probe runs the three
  * keys at 1× (sf0.1), 10× and 100× mirror decades (the Sweep100
  * layout: ids shift, texts/vectors do not — the LSH-hostile
  * mirror corpus) and records, per run:
  *   - wall time (median of 3 COLD passes — cache cleared between
  *     passes, the r17 bench protocol);
  *   - shuffle-write + memory-spill + disk-spill bytes (stage
  *     metrics summed over the run);
  *   - the materialized cache's memory vs disk residency
  *     (RDDStorageInfo right after the action, before the clear) —
  *     the direct observation of MEMORY_AND_DISK overflow.
  *
  * `sbt "runMain graft.SparseScale"` (solo, quiet host; builds the
  * decade corpora under /tmp on first use).
  */
object SparseScale {
  def main(args: Array[String]): Unit = {
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val base = "/root/testdata/sf0.1"
    val docShift = 5000000L
    val vecShift = 5000000L

    // mirror decades: documents AND embeddings, so the sparse key and
    // the coded-ANN keys read the same dir per scale
    def build(mult: Int, dir: String): Unit = {
      val d = new java.io.File(dir)
      if (!new java.io.File(s"$dir/documents.parquet").exists()) {
        d.mkdirs()
        val docs = spark.read.parquet(s"$base/documents.parquet")
        (0 until mult).map(i =>
            docs.withColumn("doc_id", col("doc_id") + lit(i * docShift)))
          .reduce(_ unionByName _)
          .repartition(32).write.mode("overwrite")
          .parquet(s"$dir/documents.parquet")
      }
      if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
        val em = spark.read.parquet(s"$base/embeddings.parquet")
        (0 until mult).map(i =>
            em.withColumn("vec_id", col("vec_id") + lit(i * vecShift)))
          .reduce(_ unionByName _)
          .repartition(32).write.mode("overwrite")
          .parquet(s"$dir/embeddings.parquet")
      }
    }
    build(10, "/tmp/sparse_scale10x")
    build(100, "/tmp/sparse_scale100x")

    val shufW = new java.util.concurrent.atomic.AtomicLong
    val memSp = new java.util.concurrent.atomic.AtomicLong
    val dskSp = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          memSp.addAndGet(m.memoryBytesSpilled)
          dskSp.addAndGet(m.diskBytesSpilled)
        }
      })

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }

    val keys = Seq("sparse_sim_topk", "embed_pq_topk", "embed_ivfpq_topk")
    val dirs = Seq("1x" -> base, "10x" -> "/tmp/sparse_scale10x",
      "100x" -> "/tmp/sparse_scale100x")
    val lines = scala.collection.mutable.ListBuffer.empty[String]
    def log(s: String): Unit = { println(s); lines += s }

    keys.foreach { key =>
      val fn = SparkEntry.queries(key)
      dirs.foreach { case (tag, dir) =>
        // warm-up (JIT + page cache), excluded; cold passes after
        spark.catalog.clearCache()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val runs = Seq.fill(3) {
          spark.catalog.clearCache()
          val (s0, m0, d0) = (shufW.get, memSp.get, dskSp.get)
          val t = time(fn(spark, dir).write.format("noop")
            .mode("overwrite").save())
          // cache residency observed BEFORE the next clear — the
          // direct MEMORY_AND_DISK overflow read
          val st = spark.sparkContext.getRDDStorageInfo
            .filter(_.numCachedPartitions > 0)
          val (cm, cd) = (st.map(_.memSize).sum, st.map(_.diskSize).sum)
          (t, (shufW.get - s0) / 1e6, (memSp.get - m0) / 1e6,
            (dskSp.get - d0) / 1e6, cm / 1e6, cd / 1e6)
        }
        val med = runs.sortBy(_._1).apply(1)
        log(f"SPARSESCALE $key%-18s $tag%-5s median=${med._1}%8.3fs " +
          f"runs=${runs.map(r => f"${r._1}%.2f").mkString("[", ",", "]")} " +
          f"shufMB=${med._2}%9.1f spillMemMB=${med._3}%9.1f " +
          f"spillDskMB=${med._4}%9.1f cacheMemMB=${med._5}%8.1f " +
          f"cacheDskMB=${med._6}%8.1f")
      }
    }
    val out = args.headOption.getOrElse("SPARSESCALE_r17.txt")
    val header = "# SPARSESCALE — 1x/10x/100x mirror-decade read of the " +
      "r16 postings-cache shape (+ coded-ANN keys); cold passes, " +
      "cache residency read post-action"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      (header +: lines).mkString("", "\n", "\n"))
    spark.stop()
  }
}
