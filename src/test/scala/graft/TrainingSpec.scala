package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering

/** TrainingQueries (C32–C35) against plain-Scala naive references:
  * the k-means contract is verified value-for-value (bit-exact
  * doubles), packing and vocab against independent recomputation. */
class TrainingSpec extends SparkTestBase {

  private def vecs(): Seq[(Long, Array[Float])] =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

  /** Mirrors Clustering.kmeans exactly: sequential-fold distances,
    * integer-micro centroid update, ties to lowest cluster. */
  private def naiveKmeans(vs: Seq[(Long, Array[Float])], k: Int, passes: Int)
      : Map[Long, (Long, Double)] = {
    var cents: Seq[(Long, Array[Double])] =
      vs.sortBy(_._1).take(k).zipWithIndex
        .map { case ((_, v), i) => (i.toLong, v.map(_.toDouble)) }
    var assign: Map[Long, (Long, Double)] = Map.empty
    for (pass <- 1 to passes) {
      assign = vs.map { case (id, v) =>
        val best = cents.map { case (c, ct) =>
          var acc = 0.0d
          var i = 0
          while (i < v.length) {
            val d = v(i).toDouble - ct(i); acc += d * d; i += 1
          }
          (acc, c)
        }.min // (d, cluster) lexicographic = the engine tie-break
        id -> (best._2, best._1)
      }.toMap
      if (pass < passes) {
        val byC = vs.groupBy(v => assign(v._1)._1)
        cents = cents.map { case (c, prev) =>
          byC.get(c) match {
            case Some(members) =>
              val dim = members.head._2.length
              val sums = new Array[Long](dim)
              members.foreach { case (_, v) =>
                var i = 0
                while (i < dim) {
                  sums(i) += math.floor(v(i).toDouble * 1e6).toLong; i += 1
                }
              }
              (c, Array.tabulate(dim)(i => sums(i).toDouble / (1e6 * members.size)))
            case None => (c, prev)
          }
        }
      }
    }
    assign
  }

  test("kmeans matches the naive Lloyd reference bit-exactly") {
    val vs = vecs()
    val expect = naiveKmeans(vs, k = 8, passes = 2)
    val got = Clustering.kmeans(
        spark.read.parquet(s"$sfDir/embeddings.parquet"),
        "vec_id", "embedding", k = 8, passes = 2)
      .select("vec_id", "cluster", "d").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got.size === vs.size)
    // every assignment AND distance identical (== on doubles, not ~=)
    got.foreach { case (id, (c, d)) =>
      assert((c, d) === expect(id), s"vec $id")
    }
    // sanity: more than one cluster is actually populated
    assert(got.values.map(_._1).toSet.size > 1)
  }

  test("kmeans equals the naive reference on random vectors (varied n, dim, k)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    for ((n, dim, k, passes) <- Seq((40, 3, 4, 3), (100, 8, 7, 2), (9, 5, 9, 2))) {
      // k == n in the last case: every vector is near a seed; also
      // exercises empty-cluster carry-over (some seeds lose all
      // members after the first update)
      val vs = (0 until n).map(i =>
        (i.toLong, Array.fill(dim)((rnd.nextInt(2000) - 1000) / 997.0f)))
      val df = vs.toDF("vec_id", "embedding")
      val got = Clustering.kmeans(df, "vec_id", "embedding", k, passes)
        .select("vec_id", "cluster", "d").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
      val expect = naiveKmeans(vs, k, passes)
      assert(got.size === n, s"case ($n,$dim,$k,$passes)")
      got.foreach { case (id, cd) =>
        assert(cd === expect(id), s"case ($n,$dim,$k,$passes) vec $id")
      }
    }
  }

  test("kmeans assignment pass shuffles nothing") {
    val assigned = Clustering.kmeans(
      spark.read.parquet(s"$sfDir/embeddings.parquet"),
      "vec_id", "embedding", k = 8, passes = 1)
    // passes=1 is pure assignment: scan + project, no Exchange at all
    assert(!assigned.queryExecution.executedPlan.toString.contains("Exchange"),
      "assignment must be a narrow projection over the scan")
  }

  test("semDedup equals the naive within-cluster pair computation") {
    val vs = vecs()
    val assign = naiveKmeans(vs, k = 8, passes = 2)
    val byId = vs.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      // float multiply per element, then double fold — Similarity.dot
      def dot(x: Array[Float], y: Array[Float]): Double = {
        var acc = 0.0d
        var i = 0
        while (i < x.length) { acc += (x(i) * y(i)).toDouble; i += 1 }
        acc
      }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val ids = vs.map(_._1).sorted
    val expect = (for {
      a <- ids; b <- ids
      if a < b && assign(a)._1 == assign(b)._1
      if cos(byId(a), byId(b)) >= 0.9 // relaxed tau to get real pairs
    } yield (b, assign(b)._1)).toSet
    val got = Clustering.semDedup(
        spark.read.parquet(s"$sfDir/embeddings.parquet"),
        "vec_id", "embedding", k = 8, passes = 2, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expect)
  }

  test("semDedup hot-cluster guard: mirrored vectors pair O(w), not w²/2") {
    import spark.implicits._
    // crawl-mirror shape: one embedding duplicated 2000× — exact copies
    // ALWAYS co-cluster, so unguarded within-cluster pairing would be
    // ~2×10⁶ pairs; the guard stars them against the min-id rep
    val base = Seq.fill(8)(0.5f)
    val emb = ((0L until 2000L).map(i => (i, base)) ++
        Seq((5000L, Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
          (5001L, Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f))))
      .toDF("vec_id", "embedding")
    val assigned = Clustering.kmeans(emb, "vec_id", "embedding", k = 1, passes = 1)
    val nPairs = Clustering.semDedupPairs(assigned, "vec_id", "embedding",
      maxCluster = 100).count()
    assert(nPairs == 2001L, s"star pairing should give w-1 pairs, got $nPairs")
    val dropped = Clustering.semDedup(emb, "vec_id", "embedding",
        k = 1, passes = 1, tau = 0.99, maxCluster = 100)
      .collect().map(_.getLong(0)).toSet
    // every non-rep copy drops (cosine 1.0 against the rep); the two
    // distinct vectors survive (cosine ≈ 0.35)
    assert(dropped == (1L until 2000L).toSet)
    // below the cap the guard is a no-op: same corpus, cap above the
    // cluster width (2002) vs uncapped — identical drop set, nonempty
    val withCap = Clustering.semDedup(emb, "vec_id", "embedding",
        k = 1, passes = 1, tau = 0.99, maxCluster = 5000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val noCap = Clustering.semDedup(emb, "vec_id", "embedding",
        k = 1, passes = 1, tau = 0.99, maxCluster = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(withCap == noCap && withCap.nonEmpty)
  }

  test("seq_pack matches naive shard-local packing, no chunk starts past its boundary") {
    val got = SparkEntry.queries("seq_pack")(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.size === docs.length)
    val naive = docs.map { case (id, src, text) =>
      (id, src, (id * 2654435761L) % 1000000007L % 32L,
        text.split(" ", -1).length.toLong)
    }
    naive.groupBy(t => (t._2, t._3)).foreach { case ((src, shard), grp) =>
      var cum = 0L
      grp.sortBy(_._1).foreach { case (id, _, _, tok) =>
        val chunk = math.floor(cum.toDouble / 2048.0).toLong
        cum += tok
        assert(got(id) === ((src, shard, tok, chunk)), s"doc $id")
        // packing invariant: a chunk's first token index is below the
        // boundary the chunk id names
        assert((cum - tok) < (chunk + 1) * 2048)
      }
    }
  }

  test("table_profile matches per-column naive counts") {
    val rows = SparkEntry.queries("table_profile")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").collect()
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    assert(rows.keySet === cols.toSet)
    cols.foreach { c =>
      val vals = docs.map(r => r.get(r.fieldIndex(c)))
      val expect = (vals.count(_ == null).toLong,
        vals.filter(_ != null).distinct.length.toLong, docs.length.toLong)
      assert(rows(c) === expect, c)
    }
  }

  test("doc_chunk covers every token with the declared overlap") {
    val chunks = SparkEntry.queries("doc_chunk")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length.toLong).toMap
    assert(chunks.keySet === toks.keySet)
    chunks.foreach { case (id, cs) =>
      val n = toks(id)
      val sorted = cs.sortBy(_._2)
      // indices contiguous from 0; offsets follow the stride formula
      assert(sorted.map(_._2).toSeq === (0L until sorted.length))
      sorted.foreach { case (_, idx, start, end) =>
        assert(start === idx * 32)
        assert(end === math.min(idx * 32 + 48, n))
        assert(start < n) // no empty chunk
      }
      // full coverage: last chunk reaches the end, a further chunk
      // would start at or past the end of the previous window
      assert(sorted.last._4 === n)
      if (sorted.length > 1) assert(sorted.last._3 < n)
      assert(sorted.last._2 * 32 + 48 >= n)
    }
  }

  test("mix_temperature keeps the hash-thresholded set and flattens the mix") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySrc = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val w = bySrc.view.mapValues(n =>
      math.floor(math.sqrt(n.toDouble) * 1e6).toLong).toMap
    val wTot = w.values.sum
    val thr = w.map { case (s, wi) =>
      s -> math.floor(math.min(1.0,
        200.0 * wi.toDouble / wTot.toDouble / bySrc(s).toDouble) * 1e6).toLong
    }
    val expect = docs.filter { case (id, s) =>
      (id * 2654435761L) % 1000000007L % 1000000L < thr(s)
    }.toSet
    val got = SparkEntry.queries("mix_temperature")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === expect)
    // temperature flattening: rarer sources keep a HIGHER fraction
    val fracs = got.groupBy(_._2).view.mapValues(_.size).toMap
    val srcsBySize = bySrc.toSeq.sortBy(_._2)
    for (Seq((rare, nr), (common, nc)) <- srcsBySize.sliding(2) if nr < nc)
      assert(fracs.getOrElse(rare, 0).toDouble / nr >=
        fracs.getOrElse(common, 0).toDouble / nc - 0.02)
  }

  test("vocab_coverage is the minimal 95% frequency-ranked prefix") {
    val rows = SparkEntry.queries("vocab_coverage")(spark, sfDir)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val counts = docs.flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => (w, ws.length.toLong) }
    val total = counts.values.sum
    // ranks contiguous from 1
    assert(rows.map(_._3).toSeq === (1L to rows.length))
    // counts correct for every kept word
    rows.foreach { case (w, n, _) => assert(counts(w) === n, w) }
    // frequency-ranked: nothing excluded outranks anything kept
    val keptMin = rows.map(_._2).min
    val excluded = counts.keySet -- rows.map(_._1).toSet
    if (excluded.nonEmpty)
      assert(excluded.map(counts).max <= keptMin)
    // coverage: the kept prefix reaches 95%, dropping its last word
    // falls below (minimality) — integer arithmetic, no floats
    val cum = rows.map(_._2).sum
    assert(cum * 20 >= total * 19)
    assert((cum - rows.last._2) * 20 < total * 19)
  }

  test("powerIteration recovers a planted dominant direction, fixed-point exact") {
    import spark.implicits._
    // gram of a rank-dominant matrix: heavy diagonal on dim 2 with
    // cross terms; the dominant eigenvector must load on dim 2
    val dim = 6
    val tri = for { i <- 0 until dim; j <- i until dim } yield {
      val base = if (i == j) 1000L else 10L
      val planted = (if (i == 2) 50000L else 0L) + (if (j == 2) 50000L else 0L)
      (i.toLong, j.toLong, base + planted)
    }
    val got = Clustering.powerIteration(tri.toDF("i", "j", "g"), iters = 8)
      .as[(Long, Long)].collect().toMap
    // replay the SAME fixed-point recurrence densely on the driver
    val full = Array.tabulate(dim, dim)((a, b) =>
      tri.find(t => (t._1 == math.min(a, b)) && (t._2 == math.max(a, b))).get._3)
    var v = Array.fill(dim)(1000000L)
    for (_ <- 1 to 8) {
      val w = Array.tabulate(dim)(k => (0 until dim).map(j => full(k)(j) * v(j)).sum)
      val d = math.max(w.map(math.abs).max / 1000000L, 1L)
      v = w.map(_ / d)
    }
    assert(got == v.zipWithIndex.map { case (x, k) => k.toLong -> x }.toMap)
    // ∞-normalization bound from the scaled divisor: max|v| in [10⁶, 2·10⁶)
    val m = got.values.map(math.abs).max
    assert(m >= 1000000L && m < 2000000L, s"norm $m")
    assert(got.maxBy(kv => math.abs(kv._2))._1 == 2L, s"wrong dominant dim: $got")
  }
}
