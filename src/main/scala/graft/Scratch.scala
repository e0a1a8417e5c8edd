package graft

/** Dev scratchpad (not part of the library surface): smoke-run the
  * flagship and print a couple of rows. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val df = SparkEntry.entry(spark)
    println("ENTRY rows: " + df.count())
    df.show(3, false)
    // drive any query by name: runMain graft.Scratch <key> [sfDir]
    // prefix the key with explain: to print the formatted plan instead
    args.headOption.foreach { key0 =>
      val explain = key0.startsWith("explain:")
      val key = key0.stripPrefix("explain:")
      val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
      val q = SparkEntry.queries(key)(spark, dir)
      if (explain) q.explain("formatted")
      else {
        println(s"QUERY $key rows: " + q.count())
        q.show(5, false)
      }
    }
    spark.stop()
  }
}

/** Dev probe: compare the fused distinct+sketch aggregate against a
  * split exact-distinct / sketch-agg plan for approx_sketch. */
object SketchProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ev = sources.Tables.events(spark, d)
      .select(col("event_type"), col("user_id"), col("value"))

    def time(label: String)(fn: => Unit): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime(); fn
        println(f"$label pass$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    time("fused") {
      ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          approx_count_distinct(col("user_id"), 0.01).as("au"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50a"),
          percentile_approx(col("value"), lit(0.95), lit(10000)).as("p95a"))
        .write.format("noop").mode("overwrite").save()
    }
    time("split") {
      val sk = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          approx_count_distinct(col("user_id"), 0.01).as("au"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50a"),
          percentile_approx(col("value"), lit(0.95), lit(10000)).as("p95a"))
      val nd = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      sk.join(nd, "event_type")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}

/** Dev probe (r12): minhash_lsh over the PERTURBED 100x corpus with the
  * hot-bucket guard at maxBucket=50 — the guarded counterpart of the
  * default-cap run that exhausts local disk (SWEEP100_r12 note). */
object PerturbedLshProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val d = spark.read.parquet("/tmp/sweep_docs100x_pert/documents.parquet")
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def run(): Unit = graft.operators.Dedup
      .minhashLsh(d, "text", "doc_id", minBp = 8000, maxBucket = 50)
      .write.format("noop").mode("overwrite").save()
    run() // warm-up
    val ts = Seq.fill(3)(time(run())).sorted
    println(f"PERTURBED_LSH_GUARDED 100x maxBucket=50 median=${ts(1)}%.2fs " +
      f"[${ts.head}%.2f, ${ts.last}%.2f]")
    spark.stop()
  }
}

/** Dev probe (r13): full approx_sketch stage breakdown at a given SF
  * dir — aggregate, exact-distinct, rank-coverage, full query. */
object SketchStageProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/tmp/bench10x")
    def time(label: String)(fn: => Unit): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime(); fn
        println(f"$label pass$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    time("full_query") {
      SparkEntry.queries("approx_sketch")(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}

/** Dev probe (r13): print executed plans for the second-wave ops. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    for (k <- args) {
      val df = SparkEntry.queries(k)(spark, "/root/testdata/sf0.001")
      println(s"===== $k =====")
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}

/** Dev probe (r14 verdict item 5): decompose contam_by_source's 100x
  * decade — full query vs the exact-gram scan (Dedup.contaminatedDocs
  * over the same corpus/probe construction) vs the corpus frame alone,
  * so the 11.5x SWEEPSTR4 ratio gets a named owner. Median of 3,
  * shuffle-write bytes from a listener. */
object ContamProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med3(fn: => Unit): Double = Seq.fill(3)(time(fn)).sorted.apply(1)
    for (dir <- args) {
      val q = SparkEntry.queries("contam_by_source")
      noop(q(spark, dir)) // warm
      val docs = graft.sources.Tables.fanOut(
        graft.sources.Tables.documents(spark, dir))
      val probe = docs.filter(col("doc_id") % 97 === 0)
      val leaked = probe.select((col("doc_id") + 2000000L).as("doc_id"),
        concat(lit("leak prefix words then "), col("text")).as("text"))
      val corp = docs.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), col("text")).unionByName(leaked)
      val tCorp = med3(noop(corp))
      val tGrams = med3(noop(
        graft.operators.Dedup.contaminatedDocs(corp, probe, "text", "doc_id", n = 8)))
      val s0 = shuf.get
      val tFull = med3(noop(q(spark, dir)))
      val sMB = (shuf.get - s0) / 3e6
      println(f"CONTAMPROBE $dir%-24s corpusFrame=$tCorp%6.2fs gramScan=$tGrams%6.2fs " +
        f"full=$tFull%6.2fs attrJoinDelta=${tFull - tGrams}%6.2fs shufMB/run=$sMB%7.1f")
    }
    spark.stop()
  }
}

/** Dev audit (r14): sweep EVERY query's physical plan for the
  * window_ntile failure class — Window/Sort shapes whose partition key
  * set is a constant-cardinality column over a data-sized frame — and
  * for SinglePartition exchanges. Prints one line per (key, window
  * partition-key list) plus per-key SinglePartition counts; eyeballed
  * against the vocab-window contract, recorded as PLANAUDIT_r14.txt. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val winRe = """Window \[[^\n]*?\], \[([^\]]*)\](, \[[^\]]*ASC|\s)""".r
    val keys = SparkEntry.queries.keys.toSeq.sorted
    for (k <- keys) {
      try {
        val plan = SparkEntry.queries(k)(spark, dir)
          .queryExecution.executedPlan.toString
        val parts = winRe.findAllMatchIn(plan)
          .map(_.group(1).replaceAll("#\\d+L?", "")).toSeq.distinct
        val sp = "Exchange SinglePartition".r.findAllIn(plan).size
        val gw = plan.linesIterator.count(l =>
          l.contains("Window [") && !l.contains("], ["))
        if (parts.nonEmpty || sp > 0)
          println(s"PLANAUDIT $k windows=${parts.mkString("{", " | ", "}")} " +
            s"singlePartitionExchanges=$sp globalWindows=$gw")
      } catch { case e: Throwable =>
        println(s"PLANAUDIT $k ERROR ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}

/** Dev audit (r14, scan-side dual of [[PlanAudit]]): for every query,
  * every parquet FileScan's ReadSchema column count vs the table's full
  * width — a scan reading all columns for a narrow projection wastes
  * I/O in proportion to table width at 100 TB. Prints (key, table,
  * readCols/fullCols) for any scan reading > the audit threshold. */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val widths = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
      .map(t => t -> spark.read.parquet(s"$dir/$t.parquet").columns.length)
      .toMap
    val scanRe = ("""FileScan parquet \[([^\]]*)\][^\n]*?""" +
      """Location: [^\n]*?/([a-z]+)\.parquet""").r
    for (k <- SparkEntry.queries.keys.toSeq.sorted) {
      try {
        val plan = SparkEntry.queries(k)(spark, dir)
          .queryExecution.executedPlan.toString
        val hits = scanRe.findAllMatchIn(plan).map { m =>
          val nCols = m.group(1).split(",").count(_.nonEmpty)
          val t = m.group(2)
          (t, nCols, widths.getOrElse(t, -1))
        }.toSeq.distinct
        val fat = hits.filter { case (t, n, full) =>
          full > 2 && n >= full && full >= 4 }
        if (fat.nonEmpty)
          println(s"SCANAUDIT $k " + fat.map { case (t, n, full) =>
            s"$t=$n/$full" }.mkString(" "))
      } catch { case e: Throwable =>
        println(s"SCANAUDIT $k ERROR ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}

/** Dev probe (r18 verdict item 4): like-for-like A/B of the
  * modularity_score COMPOSITION on one JVM, alternating cold passes —
  * OLD shape (raw word-adjacency edges cached; label propagation and
  * per-round scoring each derive the undirected frame themselves, two
  * edge-set distincts) vs NEW shape (ONE shared persisted undirected
  * frame — what the query ships since r18). Same data, same session,
  * interleaved order, cache cleared before every pass, so a host drift
  * hits both arms equally.
  *
  * `sbt "runMain graft.ModularityProbe /tmp/bench10x 3"` */
object ModularityProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val dir = args.headOption.getOrElse("/tmp/bench10x")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val Graph = graft.operators.Graph

    // the query's private word-adjacency base, reproduced for the probe
    def edgesDf(d: String) = {
      val toks = sources.Tables.documents(spark, d)
        .select(split(col("text"), " ").as("t"))
      toks.select(explode(expr(
          """CASE WHEN size(t) < 2 THEN array()
            |ELSE transform(sequence(0, size(t) - 2),
            |  i -> struct(t[i] AS src, t[i + 1] AS dst)) END""".stripMargin)).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .filter(col("src") =!= "" && col("dst") =!= "")
        .distinct()
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def runOld(d: String): Unit = {
      val edges = edgesDf(d).cache()
      val rounds = Graph.labelPropTrace(edges, "src", "dst", iters = 2)
      noop(Graph.modularityRounds(edges, "src", "dst",
        Seq(1L -> rounds(0), 2L -> rounds(1))))
      edges.unpersist()
    }
    def runNew(d: String): Unit = {
      val und = Graph.undirect(edgesDf(d), "src", "dst").persist()
      val rounds = Graph.labelPropTraceUnd(und, iters = 2)
      noop(Graph.modularityRoundsUnd(und,
        Seq(1L -> rounds(0), 2L -> rounds(1))))
      und.unpersist()
    }
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    // warm-up both arms (JIT + codegen), then interleaved cold passes
    runOld("/root/testdata/sf0.001"); runNew("/root/testdata/sf0.001")
    spark.catalog.clearCache(); System.gc()
    val (olds, news) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
    for (_ <- 1 to reps) {
      spark.catalog.clearCache()
      olds += time(runOld(dir))
      spark.catalog.clearCache()
      news += time(runNew(dir))
    }
    def stats(xs: Seq[Double]) = {
      val s = xs.sorted
      // locale-fixed (r18 ADVICE): the f interpolator follows the JVM
      // default locale — a comma-decimal default would corrupt the
      // probe numbers that feed adjudication notes
      s"med=${Bench.fmt(s(s.size / 2), 2)} " +
        s"[${Bench.fmt(s.head, 2)}..${Bench.fmt(s.last, 2)}]"
    }
    println(s"MODPROBE dir=$dir old(two-distinct) ${stats(olds.result())}")
    println(s"MODPROBE dir=$dir new(shared-und)   ${stats(news.result())}")
    spark.stop()
  }
}

/** Dev probe (r20): does an Observation on a plan fire when the action
  * is localCheckpoint / persist+count? Gate for the observe-based
  * scalar folding in Graph.pageRank/hits and Dedup.clusterPairs. */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.Observation
    import org.apache.spark.sql.functions._
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(100).select(col("id"), (col("id") % 7).as("m"))

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    def bounded(o: Observation): String =
      try Await.result(Future(o.get), 20.seconds).toString
      catch { case e: Throwable => s"TIMEOUT/${e.getClass.getSimpleName}" }

    val o1 = Observation("ckpt")
    val c = df.observe(o1, sum(col("m")).as("s"), count(lit(1)).as("n"))
      .localCheckpoint()
    println("localCheckpoint observed: " + bounded(o1))
    println("ckpt rows: " + c.count())

    val o2 = Observation("persist")
    val p = df.observe(o2, max(col("m")).as("mx")).persist()
    p.count()
    println("persist+count observed: " + bounded(o2))
    p.unpersist()
    spark.stop()
  }
}
