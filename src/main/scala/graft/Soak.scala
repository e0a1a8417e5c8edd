package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}
import graft.streaming.TwsDedup

/** Dev-only streaming SOAK of the composed curation ingest (not part
  * of the library surface) — the one streaming path never previously
  * run at scale: raw JSON decode → quality gate → bloom
  * decontamination → MinHash signing → transformWithState near-dup
  * detection → exact-Jaccard verify against the persisted signature
  * store, under the RocksDB state store provider, fed the full 10×
  * mirror corpus (50 000 docs, the Sweep100 layout) as ~50 file-source
  * micro-batches.
  *
  * What the soak measures that the specs cannot: per-micro-batch
  * latency AS STATE GROWS. By the last batch the bucket-membership
  * state holds the whole admitted corpus × 16 bands, plus the
  * emitted-pair dedup state; if batch latency climbs with state size,
  * the "state is a RocksDB lookup, not a corpus rejoin" posture is
  * wrong and continuous ingest would fall behind. The artifact prints
  * one line per micro-batch (input rows, trigger ms, state rows,
  * state bytes) and a head/tail latency ratio — ~1 means flat.
  *
  * Production mapping: maxFilesPerTrigger=1 stands in for a Kafka
  * maxOffsetsPerTrigger-bounded batch; the 32 shuffle partitions are
  * 32 RocksDB shards exactly as a 32-executor cluster would hold; the
  * stream-static verify join re-reads the store parquet per batch, as
  * a production job re-reads the (append-only) signature table.
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val base = "/root/testdata/sf0.1"
    val n = 5000000L
    val nChunks = 50

    // 10× mirror corpus — same layout (and same /tmp dir) as Sweep100
    def build(mult: Int, dir: String): Unit = {
      if (new java.io.File(s"$dir/documents.parquet").exists()) return
      new java.io.File(dir).mkdirs()
      val docs = spark.read.parquet(s"$base/documents.parquet")
      (0 until mult).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * n)))
        .reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }
    build(10, "/tmp/sweep_docs10x")
    val universe = spark.read.parquet("/tmp/sweep_docs10x/documents.parquet")

    // benchmark suite: the fixed 1× %97 slice (~1% of contents, so
    // decontamination drops ~1% of arrivals — a realistic eval guard)
    val bench = spark.read.parquet(s"$base/documents.parquet")
      .filter(col("doc_id") % 97 === 0).select("doc_id", "text")
    val bloom = Dedup.buildGramBloom(bench, "text", "doc_id")

    // the curation chain — pure projections, so the SAME function runs
    // on the batch universe (store build) and the streaming frame
    def curate(raw: DataFrame): DataFrame = {
      val decoded = raw
        .select(from_json(col("value"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id BIGINT, text STRING")).as("d"))
        .select(col("d.doc_id").as("doc_id"), col("d.text").as("text"))
      val kept = TextAnalysis.withQualityFlag(decoded, "text", "doc_id",
        minWords = 8, maxWords = 1000000, minWordLenBp = 0,
        maxWordLenBp = 1000000, minStopwordBp = 0, maxDupBp = 10000)
        .filter(col("keep")).select("doc_id", "text")
      Dedup.contaminationFlagBloom(kept, bloom, "text", "doc_id")
        .filter(!col("contaminated")).select("doc_id", "text")
    }

    // persisted signature store over the curated universe — what an
    // ingest pipeline maintains anyway; the verify join's static side
    val storePath = "/tmp/soak_store.parquet"
    if (!new java.io.File(storePath).exists())
      Dedup.withMinHashSignatures(
        curate(universe.select(to_json(struct(col("doc_id"), col("text")))
          .as("value"))), "text", "doc_id")
        .write.mode("overwrite").parquet(storePath)
    val store = spark.read.parquet(storePath)

    // ingest dir: the universe as JSON values in ~nChunks files, one
    // file per micro-batch (mirror copies land in DIFFERENT batches —
    // the cross-batch state probe is the point)
    val inDir = "/tmp/soak_in"
    if (!new java.io.File(inDir).exists())
      universe
        .select(to_json(struct(col("doc_id"), col("text"))).as("value"),
          pmod(hash(col("doc_id")), lit(nChunks)).as("chunk"))
        .repartition(nChunks, col("chunk")).select("value")
        .write.mode("overwrite").parquet(inDir)

    val ckpt = "/tmp/soak_ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))

    val raw = spark.readStream
      .schema("value STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
    val sigs = Dedup.withMinHashSignatures(curate(raw), "text", "doc_id")
    val result = TwsDedup.verifiedPairs(
      TwsDedup.candidatePairs(sigs), store.select("id", "hs"))

    val t0 = System.nanoTime()
    val q = result.writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    q.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.toSeq
      .filter(p => p.numInputRows > 0 || p.batchId == 0)
    q.stop()

    val lines = progress.map { p =>
      val trig = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(-1L)
      val stateRows = p.stateOperators.map(_.numRowsTotal).sum
      val stateBytes = p.stateOperators.map(_.memoryUsedBytes).sum
      f"SOAK batch=${p.batchId}%3d rows=${p.numInputRows}%6d " +
        f"trigger_ms=$trig%6d ms_per_krow=${trig * 1000.0 / math.max(1L, p.numInputRows)}%7.0f " +
        f"state_rows=$stateRows%9d state_mb=${stateBytes / 1e6}%8.1f"
    }
    lines.foreach(println)
    val trigs = progress.map(p =>
      Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(0L).toDouble)
    // file-source batching varies rows/batch, so the state-growth
    // signal is the per-row normalized latency, not raw trigger time
    val perKrow = progress.map(p =>
      Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(0L) * 1000.0 / math.max(1L, p.numInputRows))
    def med(xs: Seq[Double]): Double =
      if (xs.isEmpty) 0 else xs.sorted.apply(xs.size / 2)
    val head10 = med(trigs.slice(1, 11)) // batch 0 pays stream init
    val tail10 = med(trigs.takeRight(10))
    val headK = med(perKrow.slice(1, 11))
    val tailK = med(perKrow.takeRight(10))
    println(f"SOAK summary batches=${trigs.size} wall=$wall%.1fs " +
      f"head10_med_ms=$head10%.0f tail10_med_ms=$tail10%.0f " +
      f"tail_over_head=${tail10 / math.max(1.0, head10)}%.2f " +
      f"head10_ms_per_krow=$headK%.0f tail10_ms_per_krow=$tailK%.0f " +
      f"tail_over_head_per_row=${tailK / math.max(1.0, headK)}%.2f " +
      f"final_state_rows=${progress.lastOption.map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)}")
    spark.stop()
  }
}
