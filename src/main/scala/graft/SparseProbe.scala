package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.Tables

/** r15 adjudication probe for `sparse_sim_topk` (r14 verdict item 2:
  * two rounds on the watch list with an unexplained 2× isolated
  * variance — 3.6-6.3 s at 10× — while the suite reads a steady
  * 3.84 s). Runs the C75 query end-to-end at each passed data dir
  * (median of 7 after warm-up, per-run shuffle-write bytes AND
  * per-run final-plan join strategies from the AQE-executed plan),
  * then decomposes one run into the operator's real stages —
  * tokenize+tf, df-filter, tf·idf weighting join, postings join +
  * score aggregation, rank window — so the spread gets a NAMED owner.
  *
  * The specific suspicion this probe is built to confirm or kill:
  * `w` (the tf·idf weighted postings) is consumed TWICE (probe side
  * and candidate side), so the whole toks→dfs→join chain executes
  * twice per run, and the toks→dfs join sits near the broadcast
  * threshold at 10× — AQE may flip it between broadcast-hash and
  * sort-merge run-to-run, which would price exactly a ~2× swing.
  *
  * `sbt "runMain graft.SparseProbe /root/testdata/sf0.1 /tmp/bench10x"`
  */
object SparseProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass data dirs")
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)

    val shuf = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuf.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // AQE-final join strategies, compressed: e.g. "BHJ,SMJ,SMJ"
    def joins(df: DataFrame): String = {
      val p = df.queryExecution.executedPlan.toString
      val b = "BroadcastHashJoin".r.findAllIn(p).length
      val s = "SortMergeJoin".r.findAllIn(p).length
      val h = "ShuffledHashJoin".r.findAllIn(p).length
      s"bhj=$b smj=$s shj=$h"
    }

    args.foreach { dir =>
      val q = SparkEntry.queries("sparse_sim_topk")
      noop(q(spark, dir)) // JIT + page-cache warm-up, excluded
      val runs = Seq.fill(7) {
        val s0 = shuf.get
        val df = q(spark, dir)
        val t = time(noop(df))
        (t, (shuf.get - s0) / 1e6, joins(df))
      }
      val med = runs.map(_._1).sorted.apply(3)
      println(f"SPARSEPROBE $dir%-22s median=$med%7.3fs " +
        f"runs=${runs.map(r => f"${r._1}%.3f").mkString("[", ",", "]")}")
      println(f"SPARSEPROBE $dir%-22s shufMB=" +
        runs.map(r => f"${r._2}%.1f").mkString("[", ",", "]") +
        s" plans=${runs.map(_._3).distinct.mkString(" | ")}")

      // ---- stage decomposition (same operator internals as
      // TextAnalysis.sparseSimTopK, measured independently)
      val n = 3
      val docs = Tables.fanOut(Tables.documents(spark, dir))
      val toks = docs
        .select(col("doc_id").as("id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= n)
        .select(col("id"), explode(expr(
          s"transform(sequence(1, size(ws) - ${n - 1}), " +
            s"i -> concat_ws(' ', slice(ws, i, $n)))")).as("t"))
        .groupBy(col("id"), col("t")).agg(count(lit(1)).as("tf"))
      def dfs = toks.groupBy(col("t")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= 100L)
      def w = toks.join(dfs, "t")
        .select(col("id"), col("t"), expr("tf * (1000000 div df)").as("w"))
      def med3(fn: => Unit): Double = Seq.fill(3)(time(fn)).sorted.apply(1)
      val tToks = med3(noop(toks))
      val tDfs = med3(noop(dfs))
      val tW = med3(noop(w))
      // materialized-w variant: compute the weighted postings ONCE,
      // checkpoint, feed both sides of the postings join from it
      val wMat = w.localCheckpoint()
      val pwM = wMat.filter(col("id") % 37 === 0)
        .select(col("id").as("probe_id"), col("t"), col("w").as("wp"))
      val candM = wMat.select(col("id").as("cand_id"), col("t"), col("w").as("wc"))
      def scoredM = pwM.join(candM, "t")
        .filter(col("probe_id") =!= col("cand_id"))
        .groupBy(col("probe_id"), col("cand_id"))
        .agg(sum(col("wp") * col("wc")).as("score"))
      val tScoreMat = med3(noop(scoredM))
      val nCands = scoredM.count()
      println(f"SPARSEPROBE $dir%-22s stages: toks=$tToks%6.3fs " +
        f"dfs=$tDfs%6.3fs w(joined)=$tW%6.3fs " +
        f"score(matW)=$tScoreMat%6.3fs candPairs=$nCands")
    }
    spark.stop()
  }
}

/** One-off plan check for the SPARSEPROBE artifact: does the executed
  * 10× plan reuse the weighted-postings exchange across the probe and
  * candidate sides of the score join, or compute the chain twice? */
object SparsePlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/bench10x")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val df = SparkEntry.queries("sparse_sim_topk")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    def n(pat: String) = pat.r.findAllIn(p).length
    println(s"SPARSEPLAN $dir reusedExchange=${n("ReusedExchange")} " +
      s"exchanges=${n("Exchange ")} scans=${n("FileScan|Scan parquet")} " +
      s"bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")}")
    spark.stop()
  }
}
