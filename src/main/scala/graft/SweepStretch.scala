package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Dev-only 1×/10×/100× sweep (not part of the library surface) for
  * the r12 stretch keys that SweepEvents does not cover: the
  * retrieval scorecards (rrf_fusion, mrr_eval, knn_calibration,
  * topk_diverse — embeddings-derived, fixed probe batches over a
  * growing store), the documents-derived curation profilers
  * (media_dedup, token_fertility, ks_drift, water_fill_alloc) and the
  * events-derived interval_union / lateness_profile. Each decade dir
  * is composed by symlink: documents/embeddings from the Sweep100
  * mirror builders, events from the SweepEvents builders, every other
  * table at 1× — so a key scales exactly the tables it reads, the
  * way a production store grows under fixed probe traffic.
  */
object SweepStretch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val base = "/root/testdata/sf0.1"
    val n = 5000000L

    def buildDocs(mult: Int, dir: String): Unit = {
      new java.io.File(dir).mkdirs()
      if (!new java.io.File(s"$dir/documents.parquet").exists()) {
        val docs = spark.read.parquet(s"$base/documents.parquet")
        (0 until mult).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * n)))
          .reduce(_ unionByName _)
          .repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
      if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
        val emb = spark.read.parquet(s"$base/embeddings.parquet")
        (0 until mult).map(i => emb.withColumn("vec_id", col("vec_id") + lit(i * n)))
          .reduce(_ unionByName _)
          .repartition(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      }
    }
    def buildEvents(mult: Int, dir: String): Unit = {
      if (new java.io.File(s"$dir/events.parquet").exists()) return
      new java.io.File(dir).mkdirs()
      val ev = spark.read.parquet(s"$base/events.parquet")
      (0 until mult).map(i => ev
          .withColumn("event_id", col("event_id") + lit(i * n))
          .withColumn("user_id", col("user_id") + lit(i * n)))
        .reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    // Orders axis (r13): 100× CUSTOMERS at constant orders-per-customer
    // and constant part catalog — order/line keys shift per copy, part
    // keys do not, so baskets multiply while basket SHAPE is constant
    // (the growth a retailer's fact tables actually see).
    def buildOrders(mult: Int, dir: String): Unit = {
      new java.io.File(dir).mkdirs()
      if (!new java.io.File(s"$dir/orders.parquet").exists()) {
        val o = spark.read.parquet(s"$base/orders.parquet")
        (0 until mult).map(i => o
            .withColumn("o_orderkey", col("o_orderkey") + lit(i * n))
            .withColumn("o_custkey", col("o_custkey") + lit(i * n)))
          .reduce(_ unionByName _)
          .repartition(32).write.mode("overwrite").parquet(s"$dir/orders.parquet")
      }
      if (!new java.io.File(s"$dir/lineitem.parquet").exists()) {
        val l = spark.read.parquet(s"$base/lineitem.parquet")
        (0 until mult).map(i => l
            .withColumn("l_orderkey", col("l_orderkey") + lit(i * n)))
          .reduce(_ unionByName _)
          .repartition(32).write.mode("overwrite")
          .parquet(s"$dir/lineitem.parquet")
      }
      // 100× customers means a 100× customer DIM too (km_survival's
      // segment join would otherwise drop every shifted custkey)
      if (!new java.io.File(s"$dir/customer.parquet").exists()) {
        val c = spark.read.parquet(s"$base/customer.parquet")
        (0 until mult).map(i => c
            .withColumn("c_custkey", col("c_custkey") + lit(i * n)))
          .reduce(_ unionByName _)
          .repartition(32).write.mode("overwrite")
          .parquet(s"$dir/customer.parquet")
      }
    }
    buildDocs(10, "/tmp/sweep_docs10x"); buildDocs(100, "/tmp/sweep_docs100x")
    buildEvents(10, "/tmp/sweep_ev10x"); buildEvents(100, "/tmp/sweep_ev100x")
    buildOrders(10, "/tmp/sweep_ord10x"); buildOrders(100, "/tmp/sweep_ord100x")

    val tables = ("region nation customer supplier part orders lineitem " +
      "events documents embeddings").split(" ")
    def compose(mult: Int, dir: String): Unit = {
      new java.io.File(dir).mkdirs()
      for (t <- tables) {
        val link = Paths.get(s"$dir/$t.parquet")
        val target = t match {
          case "documents" | "embeddings" => s"/tmp/sweep_docs${mult}x/$t.parquet"
          case "events" => s"/tmp/sweep_ev${mult}x/$t.parquet"
          case "orders" | "lineitem" | "customer" =>
            s"/tmp/sweep_ord${mult}x/$t.parquet"
          case _ => s"$base/$t.parquet"
        }
        // relink if a prior run's layout pointed this table elsewhere
        if (Files.isSymbolicLink(link) &&
            Files.readSymbolicLink(link) != Paths.get(target))
          Files.delete(link)
        if (!Files.exists(link))
          Files.createSymbolicLink(link, Paths.get(target))
      }
    }
    compose(10, "/tmp/sweep_str10x"); compose(100, "/tmp/sweep_str100x")

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    val defaults = Seq("rrf_fusion", "mrr_eval", "knn_calibration",
      "topk_diverse", "media_dedup", "token_fertility", "ks_drift",
      "water_fill_alloc", "interval_union", "lateness_profile",
      // r13 additions: fixed probe batches over a growing store
      // (embed_pq_topk, embed_ivfpq_topk, ndcg_eval), events-derived
      // audits (seq_gap_audit, fano_factor, transition_dwell), and
      // the vocab-bound word-graph ranker (resource_alloc — mirrored
      // docs add no distinct edges, only token-stage cost)
      "embed_pq_topk", "embed_ivfpq_topk", "ndcg_eval", "seq_gap_audit",
      "fano_factor", "transition_dwell", "resource_alloc",
      // r13 second wave: events-axis sweep-lines and spines
      // (cusum_alarm, dau_wau, streak_lengths, peak_concurrency),
      // orders-axis profiles (rfm_segments, order_gap_stats,
      // basket_rules — 100× customers, constant basket shape), and
      // docs-axis layout/graph ops (shard_plan — 100× granules
      // through the two-level scan; rich_club — mirrored docs add no
      // distinct edges, only token-stage cost)
      "cusum_alarm", "dau_wau", "streak_lengths", "peak_concurrency",
      "rfm_segments", "order_gap_stats", "basket_rules",
      "shard_plan", "rich_club")
    val keys = if (args.isEmpty) defaults else args.toSeq
    for (k <- keys) {
      val fn = SparkEntry.queries(k)
      val t = Seq(base, "/tmp/sweep_str10x", "/tmp/sweep_str100x").map { dir =>
        Seq.fill(3)(time(fn(spark, dir).write.format("noop")
          .mode("overwrite").save())).sorted.apply(1)
      }
      println(f"SWEEPSTR $k%-22s 1x=${t(0)}%6.2f  10x=${t(1)}%6.2f  " +
        f"100x=${t(2)}%7.2f  ratio100=${t(2) / t(0)}%5.1f")
    }
    // mutual_nn sweeps at the SCALED operating point, not the fixed
    // standing-key planes: symmetric LSH blocking pairs BOTH sides, so
    // fixed planes at 100× corpus means 100× bucket occupancy and
    // ~10⁴× candidate pairs — the documented "numPlanes scales with
    // the corpus" contract is the production posture (≈ +log₂(growth)
    // planes holds occupancy, hence candidates-per-bucket, flat).
    if (args.isEmpty || args.contains("mutual_nn")) {
      import graft.operators.Similarity
      for ((dir, mult, planes) <- Seq((base, 1, 8),
          ("/tmp/sweep_str10x", 10, 12), ("/tmp/sweep_str100x", 100, 15))) {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val t = Seq.fill(3)(time(
          Similarity.mutualNearest(emb.filter(col("vec_id") % 2 === 0),
              emb.filter(col("vec_id") % 2 === 1),
              "vec_id", "embedding", numPlanes = planes, dim = 64)
            .write.format("noop").mode("overwrite").save())).sorted.apply(1)
        println(f"SWEEPSTR mutual_nn/p$planes%-12s ${mult}x=$t%6.2f")
      }
    }
    spark.stop()
  }
}

/** r14 (verdict item 4): 1x/10x/100x decade for the RELATIONAL/TPC-H
  * core over the orders sweep axis (100x customers + facts, grown
  * dims), with the SWEEP1000P shuffle/spill budget columns — the 22
  * TPC-H shapes previously had only 10x bench evidence. Headline
  * eight per the verdict: q1, q3, q5, q9, q13, q18, q21, topn_orders.
  * After the timed runs the q13/q18 100x executed plans are dumped so
  * the artifact shows the AQE shuffle-read posture (coalesced /
  * skew-split partitions) on the two build-heavy shuffles. */
object SweepTpch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val base = "/root/testdata/sf0.1"
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
    spark.sparkContext.addSparkListener(budget)
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    val defaults = Seq("q1_pricing", "q3_shipping", "q5_supplier_volume",
      "q9_profit", "q13_custdist", "q18_big_orders", "q21_sole_fault",
      "topn_orders")
    val keys = if (args.isEmpty) defaults else args.toSeq
    for (k <- keys) {
      val fn = SparkEntry.queries(k)
      val cells = Seq(base, "/tmp/sweep_str10x", "/tmp/sweep_str100x").map { dir =>
        // median of 3 wall; budget deltas reported for the MEDIAN-cost
        // pass would interleave — report the per-decade delta of the
        // last pass instead (steady-state, post-warm)
        val t = Seq.fill(2)(time(fn(spark, dir).write.format("noop")
          .mode("overwrite").save())).sorted
        val (w0, s0) = budget.mark()
        val t3 = time(fn(spark, dir).write.format("noop")
          .mode("overwrite").save())
        val (w1, s1) = budget.mark()
        ((t :+ t3).sorted.apply(1), (w1 - w0) / 1e9, (s1 - s0) / 1e9)
      }
      val r = cells(2)._1 / cells(0)._1
      println(f"SWEEPTPCH ${k}%-20s 1x=${cells(0)._1}%6.2fs (shufW=${cells(0)._2}%5.2fGB spill=${cells(0)._3}%5.2fGB)" +
        f"  10x=${cells(1)._1}%6.2fs (shufW=${cells(1)._2}%5.2fGB spill=${cells(1)._3}%5.2fGB)" +
        f"  100x=${cells(2)._1}%7.2fs (shufW=${cells(2)._2}%6.2fGB spill=${cells(2)._3}%6.2fGB)" +
        f"  ratio100=$r%5.1f")
    }
    // AQE posture on the two build-heavy shuffles at 100x: execute,
    // then print the AQEShuffleRead lines of the FINAL adaptive plan
    for (k <- Seq("q13_custdist", "q18_big_orders")
         if args.isEmpty || args.contains(k)) {
      val df = SparkEntry.queries(k)(spark, "/tmp/sweep_str100x")
      // drive THIS df (a write would plan a separate QueryExecution and
      // hide the finalized adaptive stages — the PlanSpec convention)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val lines = plan.linesIterator.filter(l =>
        l.contains("AQEShuffleRead") || l.contains("ShuffleQueryStage"))
      println(s"SWEEPTPCH_AQE $k 100x final plan shuffle reads:")
      lines.foreach(l => println(s"SWEEPTPCH_AQE   ${l.trim}"))
    }
    spark.stop()
  }
}
