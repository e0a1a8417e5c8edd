package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables

/** r15 isolated decomposition of the two slowest 10× keys with no
  * probe artifact on record (verdict item 7): `fd_audit`
  * (ScaleQueries — 2.82 s / 3.0× at 10×) and `curation_verdict`
  * (PipelineQueries — 3.01 s / 2.9×). CONTAMPROBE format: end-to-end
  * median of 5 with per-run shuffle-write bytes, then each stage of
  * the query measured in isolation (median of 3) so the 10× cost gets
  * a NAMED owner — fix or documented bound.
  *
  * `sbt "runMain graft.StageProbe /root/testdata/sf0.1 /tmp/bench10x"`
  */
object StageProbe {
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
    def med5(key: String, dir: String): Unit = {
      val q = SparkEntry.queries(key)
      noop(q(spark, dir)) // warm-up excluded
      val runs = Seq.fill(5) {
        val s0 = shuf.get
        val t = time(noop(q(spark, dir)))
        (t, (shuf.get - s0) / 1e6)
      }
      println(f"STAGEPROBE $key%-18s $dir%-22s median=${runs.map(_._1).sorted.apply(2)}%7.3fs " +
        f"runs=${runs.map(r => f"${r._1}%.3f").mkString("[", ",", "]")} " +
        f"shufMB=${runs.map(r => f"${r._2}%.1f").mkString("[", ",", "]")}")
    }
    def med3(fn: => Unit): Double = Seq.fill(3)(time(fn)).sorted.apply(1)

    args.foreach { dir =>
      // ================= fd_audit =================
      med5("fd_audit", dir)
      def check(df: DataFrame, xc: String, yc: String) =
        df.groupBy(col(xc))
          .agg(countDistinct(col(yc)).as("dv"), count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_keys"),
            sum(when(col("dv") > 1, 1L).otherwise(0L)).as("violating_keys"),
            sum(when(col("dv") > 1, col("n")).otherwise(0L)).as("violating_rows"),
            sum(col("n")).as("n_rows"))
      val b1 = med3(noop(check(Tables.lineitem(spark, dir), "l_orderkey", "l_returnflag")))
      val b2 = med3(noop(check(Tables.lineitem(spark, dir), "l_partkey", "l_suppkey")))
      val b3 = med3(noop(check(Tables.orders(spark, dir), "o_custkey", "o_orderpriority")))
      // scan-only floor: how much of each branch is the parquet read
      val sc1 = med3(noop(Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_returnflag")))
      val sc3 = med3(noop(Tables.orders(spark, dir)
        .select("o_custkey", "o_orderpriority")))
      println(f"STAGEPROBE fd_audit stages $dir%-22s " +
        f"orderkey->flag=$b1%6.3fs partkey->supp=$b2%6.3fs custkey->prio=$b3%6.3fs " +
        f"(lineitem 2-col scan=$sc1%6.3fs orders 2-col scan=$sc3%6.3fs)")

      // ================= curation_verdict =================
      med5("curation_verdict", dir)
      val docs = Tables.fanOut(Tables.documents(spark, dir))
      val probe = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id"), col("text"))
      val base = docs.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), col("text"))
      val leaked = probe.select((col("doc_id") + 2000000L).as("doc_id"),
        concat(lit("leak prefix words then "), col("text")).as("text"))
      val mirror = base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 4000000L).as("doc_id"), col("text"))
      val corpus = base.unionByName(leaked).unionByName(mirror)
      val tCorpus = med3(noop(corpus))
      val tCanon = med3(noop(corpus.groupBy(xxhash64(col("text")).as("h"))
        .agg(min(col("doc_id")).as("canon_id"))))
      val tHits = med3(noop(
        Dedup.contaminatedDocs(corpus, probe, "text", "doc_id", n = 8)))
      val tQuality = med3(noop(
        TextAnalysis.qualityFilter(corpus, "text", "doc_id")))
      println(f"STAGEPROBE curation_verdict stages $dir%-22s " +
        f"corpusUnion=$tCorpus%6.3fs canonAgg=$tCanon%6.3fs " +
        f"contamHits(8gram)=$tHits%6.3fs qualityFilter=$tQuality%6.3fs")
    }
    spark.stop()
  }
}
