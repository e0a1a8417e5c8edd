package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Clustering, Dedup, Similarity, TextAnalysis}

/** Dev-only 1×/10×/100× document-corpus sweep (not part of the
  * library surface): duplicates sf0.1 `documents` 10× and 100× with
  * shifted ids (5 000 → 50 000 → 500 000 docs) and times the
  * FULL-TABLE operator family — the operators themselves, not the
  * bounded-corpus query mirrors, so the dedup/index paths are
  * measured against the whole scaled table.
  *
  * The 100× layout is deliberately hostile to LSH: ids shift but
  * texts do not, so every document exists as 100 exact copies —
  * every MinHash band bucket holds ≥100 colliding docs, which is
  * precisely the crawl-mirror pathology the hot-bucket star-pairing
  * guard exists for. A super-linear ratio here means the guard
  * failed; ~linear means O(w) pairing held.
  */
object Sweep100 {
  /** The perturbed-decade generator, shared by the sweep and the
    * build-only [[BuildPerturbed]] entry (the GUARDBIAS gate depends
    * on this EXACT formula — copy i prepends "v<i>" and chops i % 7
    * trailing chars — so it must live in one place): every copy is a
    * UNIQUE near-dup of its base, nothing collapsible. */
  private[graft] def buildPerturbedCorpus(
      spark: org.apache.spark.sql.SparkSession, mult: Int, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val base = "/root/testdata/sf0.1"
    val n = 5000000L
    if (new java.io.File(s"$dir/documents.parquet").exists()) return
    new java.io.File(dir).mkdirs()
    val d = spark.read.parquet(s"$base/documents.parquet")
    (0 until mult).map { i =>
      if (i == 0) d
      else d.select((col("doc_id") + lit(i * n)).as("doc_id"),
        concat(lit(s"v$i "),
          expr(s"substring(text, 1, greatest(char_length(text) - ${i % 7}, 0))"))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val base = "/root/testdata/sf0.1"
    val n = 5000000L

    def build(mult: Int, dir: String): Unit = {
      if (new java.io.File(s"$dir/documents.parquet").exists()) return
      new java.io.File(dir).mkdirs()
      val docs = spark.read.parquet(s"$base/documents.parquet")
      (0 until mult).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * n)))
        .reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }
    build(10, "/tmp/sweep_docs10x")
    build(100, "/tmp/sweep_docs100x")

    // PERTURBED decades (r12): the mirror layout is exactly what the
    // exact-content collapse is designed to exploit — every copy is
    // byte-identical, so the LSH family measures collapsed growth. The
    // perturbed variant makes every copy UNIQUE but still a near-dup of
    // its base (DedupSpec's suffix-chop trick at sweep scale, plus a
    // per-copy prefix token so no two copies collide): copy i prepends
    // "v<i>" and chops i % 7 trailing characters. Jaccard vs base stays
    // ~1 for the 5-gram shingles, nothing collapses, every band bucket
    // holds the full multiplicity of DISTINCT contents — the
    // non-collapsible growth the hot-bucket guard must survive alone.
    def buildPerturbed(mult: Int, dir: String): Unit =
      Sweep100.buildPerturbedCorpus(spark, mult, dir)

    def docs(dir: String): DataFrame =
      spark.read.parquet(s"$dir/documents.parquet")

    // fixed benchmark probe (the 1× %97 slice, ids shifted into their
    // own space — the cross-dedup disjointness contract)
    lazy val probeCached = {
      val p = spark.read.parquet(s"$base/documents.parquet")
        .filter(col("doc_id") % 97 === 0)
        .select((col("doc_id") + lit(2000000000L)).as("doc_id"), col("text"))
        .cache()
      p.count(); p
    }
    def probeDocs(): DataFrame = probeCached

    val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
      "dup_gram_stats" -> (d => Dedup.dupGramStats(d, "text", "doc_id", n = 6)),
      "dup_span_intervals" -> (d => Dedup.dupSpanIntervals(d, "text", "doc_id", n = 6)),
      "tfidf_topk" -> (d => TextAnalysis.tfIdfTopK(d, "text", "doc_id", k = 5)),
      "inverted_index" -> (d => TextAnalysis.invertedIndex(d, "text", "doc_id", minDf = 10L)),
      // DEFAULT maxBucket — the r8 structural test: pre-r8, 100-copy
      // mirrors put all-pairs verification (shingle arrays per pair)
      // through ~25M candidates and spilled >80 GB at the default cap;
      // the exact-content collapse now runs LSH + verify over 5 000
      // distinct contents and re-expands bare id pairs, so the default
      // cap must survive the 100× mirror corpus.
      "minhash_lsh" -> (d => Dedup.minhashLsh(d, "text", "doc_id",
        minBp = 8000)),
      "simhash_pairs" -> (d => Dedup.simhashPairs(d, "text", "doc_id")),
      "exact_dedup" -> (d => Dedup.exact(d, "text", "doc_id")),
      "quality_filter" -> (d => TextAnalysis.qualityFilter(d, "text", "doc_id")),
      "lang_id" -> (d => TextAnalysis.langId(d, "text", "doc_id")),
      // r8 family. Mirrored ids shift but texts (and sources) do not,
      // so the DISTINCT vocab / gram-set / chunk-content is constant
      // across decades — these measure that the corpus-sized stages
      // are the only ones that grow.
      "bm25_topk" -> (d => TextAnalysis.bm25TopK(d, "text", "doc_id",
        Seq("join", "vector", "hash", "spark"), k = 10)),
      "bigram_rarity" -> (d => TextAnalysis.rarityScore(d, "text", "doc_id", n = 2)),
      "source_overlap" -> (d => Dedup.sourceOverlap(d, "text", "source", n = 3)),
      "key_skew" -> (d => graft.operators.Skew.keySkew(d, "source", topN = 20)),
      // r8 curation additions. The probe suite is FIXED at the 1×
      // slice (benchmarks don't grow with the corpus); the corpus is
      // the scaled side. Mirrors multiply the matching copies, so
      // cross_decontam's OUTPUT grows with multiplicity while its
      // join stays probe-sized — the measurement behind the
      // "corpus is never self-joined" claim. pmi's distinct-bigram
      // vocab is constant across decades; only the token stages grow.
      // late-r8: the trimming ACTION on top of the interval family —
      // adds one id-keyed join + in-scan HOF filter over the interval
      // machinery already swept above; must stay interval-shaped
      "trim_spans" -> (d => Dedup.trimSpans(d,
        Dedup.dupSpanIntervals(d, "text", "doc_id", n = 6), "text", "doc_id")),
      "contam_score" -> (d => Dedup.contaminationScore(d, probeDocs(), "text", "doc_id")),
      // r11: the surgical scrub as a pure scan projection (fixed probe
      // suite → bounded hash literal + bloom prefilter); should track
      // raw scan cost across decades — there is no other stage
      "decontam_scrub" -> (d => Dedup.trimContamProjectionExact(d,
        Dedup.probeGramHashes(probeDocs(), "text", "doc_id"), "text", "doc_id")),
      "cross_decontam" -> (d => Dedup.crossNearDupPairs(d, probeDocs(), "text", "doc_id",
        minBp = 8000)),
      "pmi_topk" -> (d => TextAnalysis.pmiTopK(d, "text", k = 50, minCount = 5L)))

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def buildEmb(mult: Int, dir: String): Unit = {
      if (new java.io.File(s"$dir/embeddings.parquet").exists()) return
      new java.io.File(dir).mkdirs()
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
      (0 until mult).map(i => emb.withColumn("vec_id", col("vec_id") + lit(i * n)))
        .reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    buildEmb(10, "/tmp/sweep_docs10x")
    buildEmb(100, "/tmp/sweep_docs100x")

    def emb(dir: String): DataFrame =
      spark.read.parquet(s"$dir/embeddings.parquet")
    // fixed query batch (8 vectors from the 1× slice): the corpus is
    // the scaled side, as in production (probe batches don't grow
    // with the index)
    val queryBatch = spark.read.parquet(s"$base/embeddings.parquet")
      .filter(col("vec_id") < 8).select("vec_id", "embedding").cache()
    queryBatch.count()

    // SemDeDup is deliberately absent: its blocking is the k-means
    // cluster, and 100 exact copies of a vector always share a
    // cluster, so within-cluster all-pairs is quadratic in the
    // multiplicity BY SEMANTICS — the pipeline order (CurationSpec)
    // runs exact dedup first, which collapses the mirrors before any
    // pairwise stage.
    val embOps: Seq[(String, DataFrame => DataFrame)] = Seq(
      "kmeans_k8" -> (e => Clustering.kmeans(e, "vec_id", "embedding",
        k = 8, passes = 2)),
      "brute_topk" -> (e => Similarity.bruteForceTopK(e, queryBatch,
        "vec_id", "embedding", k = 10)),
      "lsh_ann" -> (e => Similarity.lshTopK(e, queryBatch,
        "vec_id", "embedding", k = 10, numPlanes = 8, dim = 64, multiprobe = 1)),
      // 64 centroids ≤ CentroidLiteralMax exercises the literal path;
      // pass centroidLiteralMax = 16 to force the broadcast-join path
      // a production 2¹²-centroid index takes
      "ivf_ann" -> (e => Similarity.ivfTopK(e, queryBatch,
        "vec_id", "embedding", k = 10, nCentroids = 64, nProbe = 2,
        centroidLiteralMax = 16)),
      // fixed query batch votes over a growing labeled corpus — the
      // probe-bound claim for label propagation
      "knn_classify" -> (e => Similarity.knnClassify(e, queryBatch,
        "vec_id", "embedding", "label", k = 10)))

    // Persisted signature store per layout — the production shape:
    // signatures are computed at INGEST, so steady-state dedup cost
    // is the probe, not the signing. Built once per dir.
    def sigsOf(dir: String): DataFrame = {
      // derived artifact lives under /tmp keyed by layout — never
      // inside the (possibly shared, read-only-by-convention) input dir
      val path = s"/tmp/sweep_sigs_${dir.replaceAll("[^A-Za-z0-9]", "_")}.parquet"
      if (!new java.io.File(path).exists())
        Dedup.withMinHashSignatures(docs(dir), "text", "doc_id")
          .write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    // fixed 5 000-doc increment (the 1× corpus re-signed at a disjoint
    // id range): a daily crawl batch probing an ever-bigger corpus
    val incrementSigs = Dedup.withMinHashSignatures(
      spark.read.parquet(s"$base/documents.parquet")
        .withColumn("doc_id", col("doc_id") + lit(1000000000L)),
      "text", "doc_id").cache()
    incrementSigs.count()

    val dirOps: Seq[(String, String => DataFrame)] = Seq(
      // full connected-component clustering of the guarded pair set:
      // star pairing makes every mirror component diameter ≤ 2, so
      // label propagation converges in a round regardless of corpus
      "cluster_dedup" -> (dir => Dedup.clusterPairs(
        Dedup.minhashLsh(docs(dir), "text", "doc_id",
          minBp = 8000, maxBucket = 50), "doc_a", "doc_b")),
      // increment × corpus dedup against the PERSISTED signature
      // store — the O(increment) claim as a measurement: the corpus
      // is never self-joined, only band-bucket-matched. Default cap:
      // the exact-content collapse keeps mirror multiplicity out of
      // the bucket join and the verify payload.
      "minhash_incr" -> (dir => Dedup.minhashLshIncremental(
        incrementSigs, sigsOf(dir), minBp = 8000)),
      // late-r8 leakage-free split: cluster canonicals (star-guarded
      // pairs → diameter-≤2 components) left-joined back over the full
      // mirrored corpus, then the hash-fold projection — CC cost is
      // cluster_dedup's, the split adds one id join over 100× rows
      "grouped_split" -> { dir =>
        val clusters = Dedup.clusterPairs(
          Dedup.minhashLsh(docs(dir), "text", "doc_id",
            minBp = 8000, maxBucket = 50), "doc_a", "doc_b")
        val canon = docs(dir).join(clusters, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"))
        val bucket =
          (col("canonical_id") * lit(2654435761L)) % lit(1000000007L) % lit(100)
        canon.select(col("doc_id"), col("canonical_id"),
          when(bucket < 80, lit("train"))
            .when(bucket < 90, lit("val"))
            .otherwise(lit("test")).as("split"))
      })

    val all: Seq[(String, String => DataFrame)] =
      ops.map { case (k, f) => (k, (d: String) => f(docs(d))) } ++
        embOps.map { case (k, f) => (k, (d: String) => f(emb(d))) } ++
        dirOps
    // opt-in fourth decade: "+1000x" in args adds a 5M-doc point,
    // timed ONCE after warm-up (order-of-magnitude ratio, not median)
    val with1000x = args.contains("+1000x")
    if (with1000x) build(1000, "/tmp/sweep_docs1000x")
    // r13 (verdict item 8): "+1000xp" pushes the PERTURBED generator
    // to 1000x — 1000 UNIQUE near-dup variants per base doc, nothing
    // collapsible, every band bucket 1000 wide — and records the
    // shuffle/spill budget alongside wall time (a sweep that only
    // prints seconds hides exactly the disk-exhaustion failure mode
    // SWEEP100_r12 caught). Guarded LSH + cluster_dedup only: those
    // are the ops whose cost is the hot-bucket guard's to bound.
    val with1000xp = args.contains("+1000xp")
    val budget = new org.apache.spark.scheduler.SparkListener {
      val shufWrite = new java.util.concurrent.atomic.AtomicLong
      val spilled = new java.util.concurrent.atomic.AtomicLong
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spilled.addAndGet(m.diskBytesSpilled)
        }
      }
      def mark(): (Long, Long) = (shufWrite.get, spilled.get)
    }
    if (with1000xp) {
      spark.sparkContext.addSparkListener(budget)
      buildPerturbed(1000, "/tmp/sweep_docs1000x_pert")
      val pertOps: Seq[(String, String => DataFrame)] = Seq(
        "minhash_lsh" -> (dir => Dedup.minhashLsh(docs(dir), "text", "doc_id",
          minBp = 8000)),
        "cluster_dedup" -> (dir => Dedup.clusterPairs(
          Dedup.minhashLsh(docs(dir), "text", "doc_id", minBp = 8000),
          "doc_a", "doc_b")))
      for ((name, op) <- pertOps) {
        def one(dir: String): (Double, Double, Double) = {
          val (w0, s0) = budget.mark()
          val t = try time(op(dir).write.format("noop").mode("overwrite").save())
            catch { case e: Throwable =>
              println(s"SWEEP1000P $name $dir FAILED: ${e.getMessage}")
              return (-1, -1, -1) }
          val (w1, s1) = budget.mark()
          (t, (w1 - w0) / 1e9, (s1 - s0) / 1e9)
        }
        val (t1, w1, sp1) = one(base)
        val (tp, wp, spp) = one("/tmp/sweep_docs1000x_pert")
        println(f"SWEEP1000P $name%-14s 1x=$t1%7.2fs (shufW=$w1%6.2fGB spill=$sp1%6.2fGB)" +
          f" p1000=$tp%8.2fs (shufW=$wp%7.2fGB spill=$spp%7.2fGB) pr1000=${tp / t1}%7.2f")
      }
    }
    val opArgs = args.filterNot(a => a == "+1000x" || a == "+1000xp")
    val selected =
      if (opArgs.isEmpty) all else all.filter(o => opArgs.contains(o._1))
    // the dedup family additionally sweeps the PERTURBED decades — the
    // exact-content collapse cannot help there, so these columns price
    // the banding + hot-bucket guard against non-collapsible growth
    val perturbedOps = Set("minhash_lsh", "simhash_pairs", "exact_dedup",
      "cluster_dedup", "minhash_incr")
    if (selected.exists(o => perturbedOps.contains(o._1))) {
      buildPerturbed(10, "/tmp/sweep_docs10x_pert")
      buildPerturbed(100, "/tmp/sweep_docs100x_pert")
    }
    for ((name, op) <- selected) {
      def run(dir: String, passes: Int = 3): Double = {
        try op(dir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          println(s"$name $dir FAILED: ${e.getMessage}"); return -1 }
        Seq.fill(passes)(time(
          op(dir).write.format("noop").mode("overwrite").save()))
          .sorted.apply(passes / 2)
      }
      val t1 = run(base)
      val t10 = run("/tmp/sweep_docs10x")
      val t100 = run("/tmp/sweep_docs100x")
      val tail = if (with1000x) {
        val t1000 = run("/tmp/sweep_docs1000x", passes = 1)
        f" 1000x=$t1000%9.2fs r1000=${t1000 / t1}%7.2f"
      } else ""
      val pert = if (perturbedOps.contains(name)) {
        val p10 = run("/tmp/sweep_docs10x_pert")
        val p100 = run("/tmp/sweep_docs100x_pert")
        f" p10=$p10%7.2fs p100=$p100%8.2fs pr10=${p10 / t1}%5.2f pr100=${p100 / t1}%6.2f"
      } else ""
      println(f"SWEEP100 $name%-16s 1x=$t1%7.2fs 10x=$t10%7.2fs 100x=$t100%8.2fs " +
        f"r10=${t10 / t1}%5.2f r100=${t100 / t1}%6.2f" + tail + pert)
    }
    spark.stop()
  }
}

/** r14 (verdict item 6): pair-list RECALL of the hot-bucket star guard
  * at the SWEEP1000P perturbed corpus — the star-pairing trade
  * preserves clustering (PropertySpec) but the r13 artifact carried no
  * NUMBER for pair recall at maxBucket = 50. This probe: signs the
  * 5M-doc perturbed corpus once (persisted), materializes the DEFAULT
  * guarded pair list once (persisted), samples 12 hot buckets spread
  * across the width distribution, computes each bucket's EXACT
  * verified pair set (all within-bucket pairs at minBp 8000 — what
  * unguarded banding would emit), and reports how many of those pairs
  * the guarded output actually contains. Counts, not timings — host
  * load is irrelevant. */
/** Build-only entry for the perturbed decades (no sweep attached):
  * the GUARDBIAS standing gate needs /tmp/sweep_docs1000x_pert
  * without paying for the 1000xp sweep ops.
  * `sbt "runMain graft.BuildPerturbed 1000"` */
object BuildPerturbed {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(1000)
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Sweep100.buildPerturbedCorpus(spark, mult, s"/tmp/sweep_docs${mult}x_pert")
    spark.stop()
  }
}

object GuardRecall {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val dir = "/tmp/sweep_docs1000x_pert"
    require(new java.io.File(s"$dir/documents.parquet").exists,
      "run Sweep100 +1000xp first")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sigPath = "/tmp/sweep_sigs_pert1000.parquet"
    if (!new java.io.File(sigPath).exists)
      Dedup.withMinHashSignatures(docs, "text", "doc_id")
        .write.parquet(sigPath)
    val sigs = spark.read.parquet(sigPath)
    val pairPath = "/tmp/sweep_pairs_pert1000.parquet"
    if (!new java.io.File(pairPath).exists)
      Dedup.minhashLshFromSignatures(sigs, minBp = 8000)
        .write.parquet(pairPath)
    val guarded = spark.read.parquet(pairPath)
      .select(col("doc_a"), col("doc_b"))
    val buckets = Dedup.minhashBuckets(
      sigs.select("id", "hs", "sig"), bands = 16, numPerm = 64)
      .select("id", "band", "bh")
    val widths = buckets.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") > Dedup.DefaultMaxBucket)
    // 12 deterministic samples spread across the EXACTLY-MEASURABLE
    // width range (w ≤ 1200: ≤ ~720k verify pairs per bucket; the
    // distribution's mega-buckets get a member-sampled estimate below
    // — C(50k, 2) exact verification is ~1.2B array intersects)
    val measurable = widths.filter(col("w") <= 1200)
    val wOrd = Window.orderBy(col("w").asc, col("band").asc, col("bh").asc)
    val m = measurable.count()
    val mAll = widths.count()
    require(m > 0, "no hot buckets — nothing to measure")
    val step = math.max(1L, m / 12L)
    val sampled = measurable.withColumn("rn", row_number().over(wOrd))
      .filter((col("rn") % step === 0) || col("rn") === m)
      .limit(12).select("band", "bh", "w")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    println(s"GUARDRECALL hot buckets total=$mAll (w<=1200: $m) " +
      s"sampled=${sampled.length} " +
      s"widths=${sampled.map(_._3).mkString("[", ",", "]")}")
    val cond = sampled.map { case (b, h, _) =>
      s"(band = $b AND bh = ${h}L)" }.mkString(" OR ")
    val members = buckets.filter(expr(cond))
      .join(sigs.select(col("id"), col("hs")), "id")
      .localCheckpoint()
    val exact = members.as("x").join(broadcast(members.as("y")),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.id") < col("y.id"))
      .select(col("x.band").as("band"), col("x.bh").as("bh"),
        col("x.id").as("doc_a"), col("y.id").as("doc_b"),
        size(array_intersect(col("x.hs"), col("y.hs"))).as("common"),
        size(col("x.hs")).as("na"), size(col("y.hs")).as("nb"))
      .withColumn("bp", floor(lit(10000.0) * col("common") /
        (col("na") + col("nb") - col("common"))).cast("long"))
      .filter(col("bp") >= 8000)
      .select("band", "bh", "doc_a", "doc_b")
      .localCheckpoint()
    val recovered = exact.join(guarded, Seq("doc_a", "doc_b"), "left_semi")
    val perBucket = exact.groupBy("band", "bh").agg(count(lit(1)).as("n_exact"))
      .join(recovered.groupBy("band", "bh").agg(count(lit(1)).as("n_rec")),
        Seq("band", "bh"), "left")
      .na.fill(0L, Seq("n_rec"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val wOf = sampled.map { case (b, h, w) => (b, h) -> w }.toMap
    perBucket.sortBy(_._3).foreach { case (b, h, ne, nr) =>
      println(f"GUARDRECALL bucket band=$b%2d w=${wOf((b, h))}%5d " +
        f"exactPairs=$ne%8d recovered=$nr%7d recall_bp=${nr * 10000 / math.max(ne, 1)}%5d")
    }
    val te = perBucket.map(_._3).sum; val tr = perBucket.map(_._4).sum
    println(f"GUARDRECALL TOTAL exactPairs=$te recovered=$tr " +
      f"pair_recall_bp=${tr * 10000 / math.max(te, 1)} " +
      f"(cluster-membership recall = 10000 by PropertySpec — the guard's trade is pair EDGES, not components)")
    // The widest bucket, by member-sampled ESTIMATE: take ~500
    // deterministic members (hash-mod), verify all their pairs, count
    // how many of those appear in the guarded output — the per-pair
    // recall among sampled members estimates the full bucket's rate
    // (pairs are exchangeable under member sampling).
    val widest = widths.orderBy(col("w").desc).limit(1)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).head
    val (wb, wh, ww) = widest
    val mod = math.max(1L, ww / 500L)
    val wMembers = buckets
      .filter(col("band") === wb && col("bh") === wh &&
        pmod(xxhash64(col("id")), lit(mod)) === 0)
      .join(sigs.select(col("id"), col("hs")), "id")
      .localCheckpoint()
    val nS = wMembers.count()
    val wExact = wMembers.as("x").join(broadcast(wMembers.as("y")),
        col("x.id") < col("y.id"))
      .select(col("x.id").as("doc_a"), col("y.id").as("doc_b"),
        size(array_intersect(col("x.hs"), col("y.hs"))).as("common"),
        size(col("x.hs")).as("na"), size(col("y.hs")).as("nb"))
      .withColumn("bp", floor(lit(10000.0) * col("common") /
        (col("na") + col("nb") - col("common"))).cast("long"))
      .filter(col("bp") >= 8000)
      .select("doc_a", "doc_b").localCheckpoint()
    val wne = wExact.count()
    val wnr = wExact.join(guarded, Seq("doc_a", "doc_b"), "left_semi").count()
    println(f"GUARDRECALL WIDEST bucket band=$wb w=$ww sampledMembers=$nS " +
      f"sampledExactPairs=$wne recovered=$wnr " +
      f"est_recall_bp=${wnr * 10000 / math.max(wne, 1)} " +
      f"(star guard emits O(w) edges of the ~w²/2 in-bucket pairs — the by-design floor)")
    spark.stop()
  }
}

/** r15 (verdict item 4): bias MAGNITUDE of the star-skeleton pair list
  * vs the true in-bucket pair population at the 1000× perturbed
  * corpus, and validation of the weighted sampled estimator
  * ([[graft.operators.Dedup.minhashLshSampledPairs]]) against exact
  * enumeration on measurable buckets.
  *
  * Three histograms over jaccard_bp (500-bp bins, ≥ 8000), hot
  * buckets only (below the cap skeleton == truth by construction):
  *   1. SKELETON — the star edges the guarded list actually contains
  *      (what near_dup_jaccard_hist-style consumers see at scale);
  *   2. SAMPLED  — the weighted estimate (s = 12 members/bucket);
  *   3. EXACT    — ground truth on the 12 GuardRecall-style probe
  *      buckets (w ≤ 1200), vs the SAMPLED estimator restricted to
  *      those same buckets at s = 50 (validation of unbiasedness).
  * Estimand everywhere: in-bucket pair INCIDENCES (a pair co-bucketed
  * in b hot buckets counts b times on every side, so the three
  * histograms are commensurable). Counts, not timings. */
object GuardBias {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val sigPath = "/tmp/sweep_sigs_pert1000.parquet"
    require(new java.io.File(sigPath).exists, "run GuardRecall first")
    val sigs = spark.read.parquet(sigPath)
    val cap = Dedup.DefaultMaxBucket

    val buckets = Dedup.minhashBuckets(
      sigs.select("id", "hs", "sig"), bands = 16, numPerm = 64)
    val byBucket = Window.partitionBy(col("band"), col("bh"))
    val wb = buckets
      .withColumn("w", count(lit(1)).over(byBucket))
      .withColumn("rep", min(col("id")).over(byBucket))
      .filter(col("w") > cap)
      .localCheckpoint()

    val sets = sigs.select(col("id"), col("hs"))
    def verified(pairs: org.apache.spark.sql.DataFrame) = pairs
      .join(sets.withColumnRenamed("id", "doc_a").withColumnRenamed("hs", "hs_a"), "doc_a")
      .join(sets.withColumnRenamed("id", "doc_b").withColumnRenamed("hs", "hs_b"), "doc_b")
      .withColumn("common", size(array_intersect(col("hs_a"), col("hs_b"))))
      .withColumn("jaccard_bp",
        floor(lit(10000.0) * col("common") /
          (size(col("hs_a")) + size(col("hs_b")) - col("common"))).cast("long"))
      .filter(col("jaccard_bp") >= 8000)
    def hist(df: org.apache.spark.sql.DataFrame, weight: org.apache.spark.sql.Column) =
      df.select((expr("jaccard_bp div 500") * 500).as("bin_bp"), weight.as("wt"))
        .groupBy(col("bin_bp")).agg(sum(col("wt")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // 1) SKELETON: hot-bucket star edges, verified — per-bucket
    // incidences (no cross-bucket dedup, matching the estimand)
    val skeleton = hist(verified(
      wb.filter(col("id") =!= col("rep"))
        .select(col("rep").as("doc_a"), col("id").as("doc_b"))), lit(1L))

    // 2) SAMPLED, s=12, hot buckets only (inline: reuse wb)
    val bySample = byBucket.orderBy(
      xxhash64(col("id"), col("band"), col("bh")).asc, col("id").asc)
    def sampledPairs(s: Int, frame: org.apache.spark.sql.DataFrame) = {
      val kept = frame.withColumn("rn", row_number().over(bySample))
        .filter(col("rn") <= s)
        .withColumn("s", least(col("w"), lit(s.toLong)))
      kept.as("x").join(kept.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
        .select(col("x.id").as("doc_a"), col("y.id").as("doc_b"),
          expr("(x.w * (x.w - 1) * 1000) div (x.s * (x.s - 1))").as("weight_milli"))
    }
    val sampled = hist(verified(sampledPairs(12, wb)), col("weight_milli"))

    // 3) EXACT vs SAMPLED(s=50) on 12 probe buckets (w <= 1200),
    // spread across the width distribution like GuardRecall
    val measurable = wb.select("band", "bh", "w").distinct()
      .filter(col("w") <= 1200)
    val wOrd = Window.orderBy(col("w").asc, col("band").asc, col("bh").asc)
    val m = measurable.count()
    val step = math.max(1L, m / 12L)
    val probe = measurable.withColumn("rn", row_number().over(wOrd))
      .filter((col("rn") % step === 0) || col("rn") === m)
      .limit(12).select("band", "bh", "w").localCheckpoint()
    val pb = wb.join(probe.select("band", "bh"), Seq("band", "bh"), "left_semi")
      .localCheckpoint()
    val exact12 = hist(verified(
      pb.as("x").join(pb.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
        .select(col("x.id").as("doc_a"), col("y.id").as("doc_b"))), lit(1L))
    val sampled12 = hist(verified(sampledPairs(50, pb)), col("weight_milli"))

    val bins = (skeleton.keySet ++ sampled.keySet ++ exact12.keySet ++
      sampled12.keySet).toSeq.sorted
    def share(h: Map[Long, Long]) = {
      val t = math.max(1L, h.values.sum)
      (b: Long) => h.getOrElse(b, 0L) * 10000 / t
    }
    val (shS, shE, shEx, shS12) =
      (share(skeleton), share(sampled), share(exact12), share(sampled12))
    println("GUARDBIAS bin_bp | skeleton(n, share_bp) | sampled_est(n_milli/1000, share_bp)" +
      " | probe12_exact(n, share_bp) | probe12_sampled_est(share_bp)")
    bins.foreach { b =>
      println(f"GUARDBIAS $b%5d | ${skeleton.getOrElse(b, 0L)}%9d ${shS(b)}%5d | " +
        f"${sampled.getOrElse(b, 0L) / 1000}%12d ${shE(b)}%5d | " +
        f"${exact12.getOrElse(b, 0L)}%9d ${shEx(b)}%5d | ${shS12(b)}%5d")
    }
    val totSk = skeleton.values.sum
    val totSa = sampled.values.sum / 1000
    val totEx = exact12.values.sum
    val totS12 = sampled12.values.sum / 1000
    println(f"GUARDBIAS TOTALS skeletonEdges=$totSk sampledEstPairs=$totSa " +
      f"skeletonShareOfEst_bp=${totSk * 10000 / math.max(totSa, 1)}%d " +
      f"probe12 exact=$totEx sampledEst=$totS12 " +
      f"estVsExact_bp=${totS12 * 10000 / math.max(totEx, 1)}%d")
    spark.stop()
  }
}
