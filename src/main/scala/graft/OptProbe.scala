package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** r19 optimization round, guide §1: stage decomposition of the
  * slowest bench keys, so each multi-second median gets a NAMED owner
  * before anything is changed. Times each stage in isolation
  * (median of 3, cold plan cache) plus the full key, with shuffle
  * bytes from a listener.
  *
  * `sbt "runMain graft.OptProbe /root/testdata/sf0.1"`
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)

    val shuf = new java.util.concurrent.atomic.AtomicLong
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuf.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med(label: String)(mk: => DataFrame): Unit = {
      try {
        noop(mk) // warm-up (codegen/JIT) excluded
        val runs = Seq.fill(3) {
          spark.catalog.clearCache()
          val s0 = shuf.get; val j0 = jobs.get
          val t = time(noop(mk))
          (t, (shuf.get - s0) / 1e6, jobs.get - j0)
        }
        val ts = runs.map(_._1).sorted
        println(f"OPTPROBE $label%-42s median=${ts(1)}%7.3fs " +
          f"[${ts.head}%.3f,${ts.last}%.3f] shufMB=${runs.map(_._2).max}%.1f " +
          f"jobs=${runs.map(_._3).max}")
      } catch {
        case e: Throwable =>
          println(s"OPTPROBE $label FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    def full(key: String): Unit =
      med(s"$key/FULL")(SparkEntry.queries(key)(spark, d))

    // reproduce the private corpus construction (PipelineQueries.corpus)
    def corpus: DataFrame = {
      val base = Tables.documents(spark, d).filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
      val pert = base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          expr("substring(text, 1, greatest(char_length(text) - 7, 0))").as("text"))
      base.unionByName(pert)
    }

    val only = sys.env.get("SPARK_GRAFT_OPT_ONLY").map(_.split(",").toSet)
    def want(g: String): Boolean = only.forall(_.contains(g))

    if (want("scale")) {
      med("documents/scan_count")(
        Tables.documents(spark, d).agg(count(lit(1)).as("n")))
      med("documents/token_mass")(
        Tables.documents(spark, d)
          .agg(sum(size(split(col("text"), " "))).as("toks")))
      med("corpus/scan")(corpus.agg(count(lit(1)).as("n"),
        sum(length(col("text"))).as("chars")))
      med("events/scan")(Tables.events(spark, d).agg(count(lit(1)).as("n")))
      med("lineitem/scan")(Tables.lineitem(spark, d).agg(count(lit(1)).as("n")))
    }

    if (want("simhash")) {
      med("simhash_bit_balance/signature_only")(
        Dedup.simhashSignature(Tables.documents(spark, d), "text", "doc_id"))
      full("simhash_bit_balance")
    }

    if (want("mmr")) {
      med("topk_diverse/bruteforce_pool_only")(
        Similarity.bruteForceTopK(Tables.embeddings(spark, d),
          Tables.embeddings(spark, d).filter(col("vec_id") < 8),
          "vec_id", "embedding", 20))
      full("topk_diverse")
    }

    if (want("dedupchain")) {
      med("dedup/ngram_pairs_8000")(
        Dedup.ngramJaccardPairs(corpus, "text", "doc_id", k = 5, minBp = 8000))
      med("dedup/ngram_pairs_7000")(
        Dedup.ngramJaccardPairs(corpus, "text", "doc_id", k = 5, minBp = 7000))
      med("dedup/cluster_pairs_over_ngram8000") {
        val pairs = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
          k = 5, minBp = 8000).select("doc_a", "doc_b").localCheckpoint()
        Dedup.clusterPairs(pairs, "doc_a", "doc_b")
      }
      full("dedup_threshold_sensitivity")
      full("dedup_savings_report")
      full("dedup_best_rep")
      full("rep_length_bias")
      full("dup_length_matrix")
    }

    if (want("bestrep")) {
      // the dedup_best_rep / dedup_savings_report / rep_length_bias
      // shared chain, stage by stage, over the SAME persisted
      // signature store the keys use
      val sigs = graft.queries.PipelineQueries.corpusSignatures(spark, d)
      med("bestrep/lsh_from_sigs")(
        Dedup.minhashLshFromSignatures(sigs, minBp = 8000))
      med("bestrep/lsh+clusterPairs")(
        Dedup.clusterPairs(
          Dedup.minhashLshFromSignatures(sigs, minBp = 8000), "doc_a", "doc_b"))
      med("bestrep/full_chain")(
        Dedup.bestRepresentative(
          corpus.select(col("doc_id"), length(col("text")).as("score")),
          Dedup.minhashLshFromSignatures(sigs, minBp = 8000),
          "doc_id", "score"))
      full("dedup_best_rep")
    }

    if (want("events")) {
      full("pagerank_events")
      full("hits_scores")
      full("peak_concurrency")
    }

    if (want("text")) {
      full("bm25_topk")
      full("tfidf_topk")
      full("pmi_topk")
    }

    if (want("r20")) {
      // --- basket_rules stages ---
      def basketLi = Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      med("basket/li_distinct")(basketLi)
      med("basket/pairs_cab") {
        val li = basketLi.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        li.as("x").join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") < col("y.l_partkey"))
          .groupBy(col("x.l_partkey").as("part_a"),
            col("y.l_partkey").as("part_b"))
          .agg(count(lit(1)).as("cab"))
          .filter(col("cab") >= 3)
      }
      full("basket_rules")
      // --- word-adjacency graph family stages ---
      def wadj = {
        val toks = Tables.documents(spark, d)
          .select(split(col("text"), " ").as("t"))
        toks.select(explode(expr(
            """CASE WHEN size(t) < 2 THEN array()
              |ELSE transform(sequence(0, size(t) - 2),
              |  i -> struct(t[i] AS src, t[i + 1] AS dst)) END""".stripMargin)).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
          .filter(col("src") =!= "" && col("dst") =!= "")
          .distinct()
      }
      med("wadj/edges_distinct")(wadj)
      med("wadj/undirect")(graft.operators.Graph.undirect(wadj, "src", "dst"))
      med("wadj/triangles") {
        graft.operators.Graph.triangleCounts(wadj, "src", "dst")
      }
      full("graph_triangles")
      full("clustering_coeff")
      full("modularity_score")
      full("cluster_density_audit")
      // --- sparse_sim_topk stages ---
      def corpToks = {
        val pre = corpus
          .select(col("doc_id").as("id"), split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 3)
        pre.select(col("id"), explode(expr(
            "transform(sequence(1, size(ws) - 2), " +
              "i -> concat_ws(' ', slice(ws, i, 3)))")).as("t"))
          .groupBy(col("id"), col("t")).agg(count(lit(1)).as("tf"))
      }
      med("sparse/alltoks_agg")(corpToks)
      med("sparse/dfs") {
        corpToks.groupBy(col("t")).agg(count(lit(1)).as("df"))
          .filter(col("df") >= 2 && col("df") <= 100)
      }
      full("sparse_sim_topk")
      // --- CDC stages ---
      med("cdc/changelog_scan")(
        graft.sources.CdcEnvelope.ordersChangelog(spark, d))
      med("cdc/latest_image") {
        graft.operators.Cdc.latestImage(
          graft.sources.CdcEnvelope.ordersChangelog(spark, d), "o_orderkey")
      }
      full("cdc_upsert_merge")
      full("cdc_project")
      // --- token-explode family ---
      full("bigram_rarity")
      full("contam_overlap")
      full("contam_by_source")
      full("source_overlap")
      full("curation_verdict")
    }

    if (want("misc")) {
      full("basket_rules")
      full("abc_classification")
      full("fuzzy_decontaminate")
      full("q21_sole_fault")
      full("q7_nation_volume")
      full("clustering_coeff")
      full("ngram_novelty")
      full("dedup_source_profile")
    }

    spark.stop()
  }
}

/** Interpreted-vs-codegen parity probe for the r19 native SimHashSig
  * expression (verify-skill gotcha: probe custom Expressions with
  * wholeStage codegen off). Prints PARITY OK when both modes produce
  * identical (id, simhash) maps over the sf0.001 documents. */
object SimHashParityProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    def sigs(): Map[Long, Long] =
      graft.operators.Dedup.simhashSignature(
          graft.sources.Tables.documents(spark, d), "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val on = sigs()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val off = sigs()
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.conf.unset("spark.sql.codegen.factoryMode")
    require(on == off && on.nonEmpty, s"codegen/interp divergence: ${on.size} vs ${off.size}")
    println(s"SIMHASH PARITY OK over ${on.size} docs")
    spark.stop()
  }
}
