package graft

import org.apache.spark.sql.functions._

/** Dev-only 10× scaling sweep (not part of the library surface):
  * duplicates the sf0.1 `documents`/`embeddings` tables 10× with
  * shifted ids into a scratch dir, then times the r3-touched pipeline
  * queries at 1× vs 10× to check nothing is super-linear. */
object Sweep {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val base = "/root/testdata/sf0.1"
    val big = "/tmp/sweep10x"
    val f = new java.io.File(s"$big/documents.parquet")
    if (!f.exists()) {
      new java.io.File(big).mkdirs()
      val docs = spark.read.parquet(s"$base/documents.parquet")
      val n = 5000000L // id shift comfortably above the corpus range
      (0 until 10).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * n)))
        .reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite")
        .parquet(s"$big/documents.parquet")
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
      (0 until 10).map(i => emb.withColumn("vec_id", col("vec_id") + lit(i * n)))
        .reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite")
        .parquet(s"$big/embeddings.parquet")
      // events: shift user_id too, so the duplicated log keeps the
      // per-user structure (10× users, same events-per-user) — the
      // realistic growth axis for funnel/cohort/transition queries
      val ev = spark.read.parquet(s"$base/events.parquet")
      (0 until 10).map(i => ev
          .withColumn("event_id", col("event_id") + lit(i * n))
          .withColumn("user_id", col("user_id") + lit(i * n)))
        .reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite")
        .parquet(s"$big/events.parquet")
      // lineitem/customer for the self-contained relational ops
      // (grouped_corr, time_rollup, fuzzy_match join nothing else)
      val li = spark.read.parquet(s"$base/lineitem.parquet")
      (0 until 10).map(i => li.withColumn("l_orderkey", col("l_orderkey") + lit(i * n)))
        .reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite")
        .parquet(s"$big/lineitem.parquet")
      // customer: shift the key AND tag the name with a per-copy
      // 3-letter suffix (pairwise edit distance 3 > the fuzzy_match
      // threshold of 2), so fuzzy matches stay WITHIN a copy — probe
      // count and per-probe matches each grow 10×, output ~10×. With
      // identical names across copies every probe would match all 10
      // copies and the sweep would measure the duplication artifact
      // (~100× candidates), not realistic growth.
      val cu = spark.read.parquet(s"$base/customer.parquet")
      (0 until 10).map { i =>
        val tag = ("" + ('A' + i).toChar) * 3
        cu.withColumn("c_custkey", col("c_custkey") + lit(i * n))
          .withColumn("c_name", concat(col("c_name"), lit(" " + tag)))
      }
        .reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite")
        .parquet(s"$big/customer.parquet")
    }
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    val keys = Seq("dedup_minhash_lsh", "dedup_simhash", "dedup_clusters",
      "source_mix_sample", "embed_lsh_ann", "dedup_exact",
      "quality_filter", "dedup_incremental", "dedup_embed_cosine",
      "multimodal_features",
      // r4 additions
      "line_dedup", "embed_ivf_ann", "dedup_containment",
      "text_extract_html", "funnel_steps", "cohort_retention",
      "outlier_events", "event_transitions",
      "sessionize", "grouped_corr", "time_rollup", "fuzzy_match",
      "domain_cap")
    for (k <- keys) {
      val fn = SparkEntry.queries(k)
      def run(d: String) = {
        // warm once, then median of 3
        try fn(spark, d).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => println(s"$k $d FAILED: ${e.getMessage}") }
        Seq.fill(3)(time(
          fn(spark, d).write.format("noop").mode("overwrite").save())).sorted.apply(1)
      }
      val t1 = run(base)
      val t10 = run(big)
      println(f"SWEEP $k%-20s 1x=$t1%6.2fs 10x=$t10%6.2fs ratio=${t10 / t1}%5.2f")
    }
    spark.stop()
  }
}
