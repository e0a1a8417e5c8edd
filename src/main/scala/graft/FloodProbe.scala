package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.streaming.TwsDedup

/** CROSS-BATCH over-cap mirror-flood pricing (r18 verdict item 5).
  *
  * The r18 fix suppressed SAME-batch mirror floods of a not-admitted
  * (over-cap) content: the batch-local sighting set means at most one
  * pair per (bucket × batch) for such a content. The documented
  * residual is CROSS-batch: an over-cap content has no byContent
  * entry (persisting one would grow state with over-cap distinct
  * contents, un-bounding the cap), so a sustained flood spanning
  * micro-batches emits one pair per batch — and when mirrors arrive
  * one per batch, that is one pair PER MIRROR. This probe measures the
  * residual directly so the "bounded-TTL negative cache" alternative
  * can be priced against a number instead of a fear.
  *
  * Three arms on a crafted corpus (content F arrives first and fills
  * the bucket; X is a near-dup of F so its mirrors land in F's
  * buckets; each input file becomes one micro-batch):
  *   1. overcap-batched : cap=1, 50 files × 100 X-mirrors — mirrors
  *      batch together, expect ≈1 pair per batch (the r18 fix).
  *   2. overcap-sparse  : cap=1, 50 files ×   1 X-mirror  — the worst
  *      case, one pair per mirror.
  *   3. admitted        : cap=2, 50 files × 100 X-mirrors — X admitted
  *      on first sighting, mirrors collapse, expect ≈1 pair total.
  * The invariant under test: residual pairs = #batches carrying
  * mirrors of an over-cap content (per content), NEVER per-mirror
  * within a batch — so the worst case is bounded by the trigger rate
  * (≤86,400 pairs/day/content at a 1 s trigger), each pair costing one
  * candidate row in the (pruned) verify probe.
  *
  * `sbt "runMain graft.FloodProbe FLOODPROBE_rNN.txt"`
  */
object FloodProbe {
  def main(args: Array[String]): Unit = {
    val outFile = args.headOption.getOrElse("FLOODPROBE.txt")
    // transformWithState needs column families → RocksDB provider (the
    // default HDFSBacked provider rejects TWS state with
    // STATE_STORE_MULTIPLE_COLUMN_FAMILIES), same as StreamBench
    val spark = GraftSession.builder("local[8]", 8)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val work = Files.createTempDirectory("graft_floodprobe")
    val lines = scala.collection.mutable.ListBuffer.empty[String]
    def log(s: String): Unit = { println(s); lines += s }

    // F: the bucket-filling first content; X: a near-dup (one word
    // swapped → most of the 16 bands collide with F's buckets)
    val textF = (1 to 40).map(i => s"word$i").mkString(" ")
    val textX = ((1 to 39).map(i => s"word$i") :+ "changed").mkString(" ")

    /** One parquet part per batch, mtimes ascending so the file source
      * admits them in order under maxFilesPerTrigger=1. */
    def buildCorpus(nFiles: Int, mirrorsPerFile: Int): Path = {
      val dir = work.resolve(s"corpus-$nFiles-$mirrorsPerFile")
      Files.createDirectories(dir)
      val t0 = System.currentTimeMillis() - 1000L * (nFiles + 2)
      def writeOne(idx: Int, rows: Seq[(Long, String)]): Unit = {
        val tmp = work.resolve(s"tmp-$nFiles-$mirrorsPerFile-$idx")
        rows.toDF("doc_id", "text").coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        val part = Files.list(tmp).filter(p =>
          p.getFileName.toString.startsWith("part-")).findFirst().get()
        val dst = dir.resolve(f"part-$idx%05d.parquet")
        Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
        dst.toFile.setLastModified(t0 + idx * 1000L); ()
      }
      writeOne(0, Seq(1L -> textF))
      (1 to nFiles).foreach { i =>
        writeOne(i, (0 until mirrorsPerFile).map(j =>
          (1000L + i * 1000L + j) -> textX))
      }
      dir
    }

    def runArm(name: String, nFiles: Int, mirrorsPerFile: Int,
               cap: Int): Unit = {
      val dir = buildCorpus(nFiles, mirrorsPerFile)
      val schema = spark.read.parquet(dir.toString).schema
      val pairs = new java.util.concurrent.atomic.AtomicLong
      val batchesWithPairs = new java.util.concurrent.atomic.AtomicLong
      val ckpt = work.resolve(s"ckpt-$name").toString
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(dir.toString)
      val t0 = System.nanoTime()
      val q = TwsDedup.candidatePairsCollapsed(
          graft.operators.Dedup.withMinHashSignatures(stream, "text", "doc_id"),
          maxBucket = cap).toDF()
        .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame,
                                     _: Long) =>
          val n = b.count()
          if (n > 0) { pairs.addAndGet(n); batchesWithPairs.incrementAndGet() }
          ()
        }
        .option("checkpointLocation", ckpt).start()
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      q.stop()
      val mirrors = nFiles * mirrorsPerFile
      log(f"FLOODPROBE $name%-16s cap=$cap mirrors=$mirrors%6d " +
        f"batches=${nFiles + 1}%3d pairs=${pairs.get()}%6d " +
        f"pairBatches=${batchesWithPairs.get()}%3d wall=$wall%6.1fs")
    }

    runArm("overcap-batched", nFiles = 50, mirrorsPerFile = 100, cap = 1)
    runArm("overcap-sparse", nFiles = 50, mirrorsPerFile = 1, cap = 1)
    runArm("admitted", nFiles = 50, mirrorsPerFile = 100, cap = 2)

    Files.writeString(Paths.get(outFile),
      ("# FLOODPROBE — cross-batch over-cap mirror-flood residual" +:
        lines).mkString("", "\n", "\n"))
    spark.stop()
  }
}
