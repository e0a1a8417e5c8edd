package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev-only ANN probe-batch regime sweep (not part of the library
  * surface): pins the PROBE-SIDE scaling claim that the standing
  * 8-vector bench batch cannot distinguish from fixed overhead.
  *
  * Grid: query batches of 8 / 100 / 1000 vectors × corpus at 1×
  * (sf0.1, 5 000 vecs) and 100× (500 000 vecs, the Sweep100 mirror
  * layout) × three probe paths:
  *   - `lsh_store`  — [[Similarity.lshTopKBucketed]] against a
  *     bucket-partitioned persisted store (ingest-time
  *     [[Similarity.withLshBucket]], 8 planes, multiprobe 1): the
  *     partition-pruned production regime.
  *   - `ivf_store`  — [[Similarity.ivfTopKBucketed]] against a
  *     list-partitioned store (64 seed centroids, nProbe 2, broadcast
  *     centroid regime `centroidLiteralMax = 16` — the path a real
  *     2¹²-centroid index takes).
  *   - `brute`      — [[Similarity.bruteForceTopK]], the exact linear
  *     reference (single pass at 100×/1000q: it exists to be beaten).
  *
  * What the grid separates: per-query cost at q=8 is dominated by
  * fixed plan/scan overhead; at q=1000 the probed-bucket set saturates
  * (256 LSH buckets / 64 IVF lists), so the store is scanned ~once for
  * the whole batch and the per-query cost is the AMORTIZED scan+join —
  * the number that actually prices a production probe service. The
  * 100×/1× ratio at fixed q shows the corpus-side growth of that
  * amortized cost; sub-linear means the bucket join, not the scan, is
  * doing the work. A recall@10 line (vs brute, 1× corpus, q=1000)
  * guards against the probe regime quietly trading recall for the
  * ratio.
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val base = "/root/testdata/sf0.1"
    val n = 5000000L

    // 100× mirror corpus — same layout (and same /tmp dir) as Sweep100
    def buildEmb(mult: Int, dir: String): Unit = {
      if (new java.io.File(s"$dir/embeddings.parquet").exists()) return
      new java.io.File(dir).mkdirs()
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
      (0 until mult).map(i => emb.withColumn("vec_id", col("vec_id") + lit(i * n)))
        .reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    buildEmb(100, "/tmp/sweep_docs100x")
    val corpora = Seq(
      "1x" -> s"$base/embeddings.parquet",
      "100x" -> "/tmp/sweep_docs100x/embeddings.parquet")

    def emb(path: String): DataFrame = spark.read.parquet(path)

    // persisted stores, built once per corpus (ingest-time cost, not
    // probe cost — amortized over every later query batch)
    def lshStore(tag: String, path: String): DataFrame = {
      val out = s"/tmp/annprobe_lsh_$tag"
      if (!new java.io.File(out).exists())
        Similarity.withLshBucket(emb(path), "embedding", numPlanes = 8, dim = 64)
          .write.partitionBy("bucket").mode("overwrite").parquet(out)
      spark.read.parquet(out)
    }
    def cents(path: String): Array[(Long, Array[Float])] =
      Similarity.ivfCentroids(emb(path), "vec_id", "embedding", nCentroids = 64)
    def ivfStore(tag: String, path: String): DataFrame = {
      val out = s"/tmp/annprobe_ivf_$tag"
      if (!new java.io.File(out).exists())
        Similarity.withIvfLists(emb(path), "embedding", cents(path).toSeq,
          centroidLiteralMax = 16)
          .write.partitionBy("list_id").mode("overwrite").parquet(out)
      spark.read.parquet(out)
    }
    // r13: PQ code store (C98's production shape) joins the grid —
    // codebooks are trained ONCE on the 1× slice (fixed ingest
    // artifacts, exactly how a production quantizer ships) and both
    // corpora are encoded with them; probes never read vectors
    val pqBooks = Similarity.pqCodebooks(emb(s"$base/embeddings.parquet"),
      "vec_id", "embedding", 4, 16, 64)
    def pqStore(tag: String, path: String): DataFrame = {
      val out = s"/tmp/annprobe_pq_$tag"
      if (!new java.io.File(out).exists())
        Similarity.withPqCodes(emb(path), "embedding", pqBooks)
          .select(col("vec_id") +: (0 until 4).map(s => col(s"pq_code_$s")): _*)
          .write.mode("overwrite").parquet(out)
      spark.read.parquet(out)
    }

    // query batches from the 1× slice, ids shifted out of corpus range
    // (probe batches don't grow with the index; the batch SIZE is the
    // regime under test)
    def queryBatch(q: Int): DataFrame = {
      val b = emb(s"$base/embeddings.parquet")
        .filter(col("vec_id") < q)
        .select((col("vec_id") + lit(2000000000L)).as("vec_id"), col("embedding"))
        .cache()
      b.count(); b
    }
    val batches = Seq(8, 100, 1000).map(q => q -> queryBatch(q))

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def run(df: => DataFrame, passes: Int): Double = {
      df.write.format("noop").mode("overwrite").save() // warm-up
      Seq.fill(passes)(time(
        df.write.format("noop").mode("overwrite").save()))
        .sorted.apply(passes / 2)
    }

    for ((tag, path) <- corpora) {
      val lsh = lshStore(tag, path)
      val ivf = ivfStore(tag, path)
      val pq = pqStore(tag, path)
      val cs = cents(path).toSeq
      for ((q, batch) <- batches) {
        val tLsh = run(Similarity.lshTopKBucketed(lsh, batch,
          "vec_id", "embedding", k = 10, numPlanes = 8, dim = 64,
          multiprobe = 1), passes = 3)
        val tIvf = run(Similarity.ivfTopKBucketed(ivf, batch,
          "vec_id", "embedding", k = 10, cs, nProbe = 2,
          centroidLiteralMax = 16), passes = 3)
        val tPq = run(Similarity.pqTopKCoded(pq, batch,
          "vec_id", "embedding", k = 10, pqBooks), passes = 3)
        // brute is the linear reference: 100×/1000q is 500M pairs —
        // single pass, it exists to be beaten, not tuned
        val brutePasses = if (tag == "100x") 1 else 3
        val tBrute = run(Similarity.bruteForceTopK(emb(path), batch,
          "vec_id", "embedding", k = 10), passes = brutePasses)
        println(f"ANNPROBE corpus=$tag%-4s q=$q%-4d " +
          f"lsh_store=$tLsh%7.2fs (${tLsh * 1000 / q}%7.2f ms/q)  " +
          f"ivf_store=$tIvf%7.2fs (${tIvf * 1000 / q}%7.2f ms/q)  " +
          f"pq_store=$tPq%7.2fs (${tPq * 1000 / q}%7.2f ms/q)  " +
          f"brute=$tBrute%7.2fs (${tBrute * 1000 / q}%7.2f ms/q)")
      }
    }

    // recall-vs-probe-cost CURVE at the 1000-query batch, 1× corpus —
    // the guard that the amortized regime still finds the neighbors it
    // claims, measured as the dial it is. Queries are corpus vectors
    // under shifted ids, so every query has one planted exact neighbor
    // (cos = 1) and nine "true" neighbors that are merely the least
    // distant vectors of a synthetic corpus — nn1 (planted-neighbor
    // hit rate) should pin at 1.0 at any probe setting (identical
    // vectors share every bucket), while recall@10 buys tail neighbors
    // with probe width. The probe-cost column (same op, 100× corpus)
    // prices each recall point.
    val qb = batches.last._2
    val exact10 = Similarity.bruteForceTopK(emb(s"$base/embeddings.parquet"), qb,
      "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id")).cache()
    exact10.count()
    val nQ = 1000.0
    def recall(approx: DataFrame): (Double, Double) = {
      val a = approx.select(col("query_id"), col("neighbor_id"), col("rn"))
      val hits = exact10.join(a.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
      // planted exact neighbor (cos=1) found at rank 1
      val nn1 = a.filter(col("rn") === 1)
        .filter(col("neighbor_id") === col("query_id") - lit(2000000000L))
        .count()
      (hits / (10.0 * nQ), nn1 / nQ)
    }
    // The curve runs until it CROSSES the production retrieval contract
    // (recall@10 ≥ 0.9) so an operating point is on record with its
    // measured 100× cost — not just the cheap low-recall regimes. On
    // this corpus the true top-10 sits at cos ≈ 0.32–0.41 (isotropic
    // synthetic vectors, no cluster structure: top-10 same-label rate
    // ≈ 0.10 = chance), so per-plane disagreement is ~0.38 and ≥ 0.9
    // recall necessarily prices in probing most buckets/lists — the
    // honest cost of the contract on worst-case (separation-free)
    // geometry; clustered real embeddings cross far cheaper.
    val lsh1x = lshStore("1x", corpora.head._2)
    val lsh100x = lshStore("100x", corpora.last._2)
    val bruteCost100x = run(Similarity.bruteForceTopK(
      emb(corpora.last._2), qb, "vec_id", "embedding", k = 10), passes = 1)
    var lshOp: Option[(Int, Double, Double)] = None
    for (mp <- Seq(0, 1, 2, 3, 4, 5, 6)) {
      if (lshOp.isEmpty) {
        val (r10, nn1) = recall(Similarity.lshTopKBucketed(lsh1x, qb,
          "vec_id", "embedding", k = 10, numPlanes = 8, dim = 64, multiprobe = mp))
        val cost = run(Similarity.lshTopKBucketed(lsh100x, qb,
          "vec_id", "embedding", k = 10, numPlanes = 8, dim = 64, multiprobe = mp),
          passes = 3)
        println(f"ANNPROBE curve lsh_store multiprobe=$mp recall@10=$r10%5.3f " +
          f"nn1=$nn1%5.3f cost_100x_q1000=$cost%6.2fs")
        if (r10 >= 0.9) lshOp = Some((mp, r10, cost))
      }
    }
    val cs1x = cents(corpora.head._2).toSeq
    val cs100x = cents(corpora.last._2).toSeq
    val ivf1x = ivfStore("1x", corpora.head._2)
    val ivf100x = ivfStore("100x", corpora.last._2)
    var ivfOp: Option[(Int, Double, Double)] = None
    for (np <- Seq(1, 2, 4, 8, 16, 32, 48, 56)) {
      if (ivfOp.isEmpty) {
        val (r10, nn1) = recall(Similarity.ivfTopKBucketed(ivf1x, qb,
          "vec_id", "embedding", k = 10, cs1x, nProbe = np,
          centroidLiteralMax = 16))
        val cost = run(Similarity.ivfTopKBucketed(ivf100x, qb,
          "vec_id", "embedding", k = 10, cs100x, nProbe = np,
          centroidLiteralMax = 16), passes = 3)
        println(f"ANNPROBE curve ivf_store nProbe=$np%-2d    recall@10=$r10%5.3f " +
          f"nn1=$nn1%5.3f cost_100x_q1000=$cost%6.2fs")
        if (r10 >= 0.9) ivfOp = Some((np, r10, cost))
      }
    }
    // PQ has no probe dial: one point — recall is bounded by the
    // 4×16 quantizer (ADC scans every code, so cost is flat in
    // recall); nn1 still must pin at 1.0 (identical vectors share
    // every code)
    val (pqR10, pqNn1) = recall(Similarity.pqTopKCoded(
      pqStore("1x", corpora.head._2), qb, "vec_id", "embedding",
      k = 10, pqBooks))
    val pqCost = run(Similarity.pqTopKCoded(pqStore("100x", corpora.last._2),
      qb, "vec_id", "embedding", k = 10, pqBooks), passes = 3)
    println(f"ANNPROBE curve pq_store 4x16 ADC       recall@10=$pqR10%5.3f " +
      f"nn1=$pqNn1%5.3f cost_100x_q1000=$pqCost%6.2fs")
    println(f"ANNPROBE brute reference cost_100x_q1000=$bruteCost100x%6.2fs")
    lshOp.foreach { case (mp, r10, cost) =>
      println(f"ANNPROBE operating_point lsh_store numPlanes=8 multiprobe=$mp " +
        f"recall@10=$r10%5.3f cost_100x_q1000=$cost%6.2fs " +
        f"(${cost / bruteCost100x}%4.2fx of brute)") }
    ivfOp.foreach { case (np, r10, cost) =>
      println(f"ANNPROBE operating_point ivf_store nCentroids=64 nProbe=$np " +
        f"recall@10=$r10%5.3f cost_100x_q1000=$cost%6.2fs " +
        f"(${cost / bruteCost100x}%4.2fx of brute)") }
    spark.stop()
  }
}
