package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-exact Lloyd's k-means over an embedding column
  * (`array<float>`), and SemDeDup-style cluster-blocked semantic
  * dedup on top of it (Abbas et al. 2023, "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication").
  *
  * Reproducibility contract (what makes a value-level DuckDB oracle
  * possible for an iterative float algorithm):
  *   - distances are sequential left folds over the dims (same order
  *     and precision as the oracle's `list_reduce`, see
  *     PipelineQueries.dotSql) — bit-identical doubles;
  *   - the centroid UPDATE never sums raw floats across rows: each
  *     element is floored to integer micro-units first
  *     (`floor(v * 1e6)`), and integer sums are partition- and
  *     engine-order-independent. A centroid dim is then the exact
  *     IEEE quotient `sum_micro / (1e6 * n)` — identical in any
  *     engine;
  *   - seeds are the k smallest-id vectors, ties on distance break
  *     to the lowest cluster id.
  * The micro-unit floor quantizes the update (|error| < 1e-6 per
  * element) — a documented contract, not an approximation bug: the
  * quantized algorithm is exactly reproducible everywhere.
  */
object Clustering {

  private val Micro = 1000000.0

  /** Squared L2 distance between a float-array vector and a
    * double-array centroid: per-element squared difference (float
    * widens to double exactly), then a sequential left fold into a
    * double accumulator — the codegen'd native fold
    * (graft.functions.VecDistSq), bit-identical to the
    * `aggregate(zip_with(...))` formulation it replaced. */
  def distSq(v: Column, c: Column): Column =
    graft.GraftFunctions.vec_dist_sq(v, c)

  /** Nearest centroid of `vec` as `struct(d, cluster)` — `array_min`
    * over per-centroid structs: struct ordering is lexicographic, so
    * the min is (smallest distance, then lowest cluster id). One
    * narrow codegen projection per row — no row explosion, no
    * shuffle, no join for the assignment step.
    *
    * The centroid matrix enters the plan through `typedlit`: ONE
    * literal node holding k×dim doubles as DATA (ArrayData), not a
    * k×dim tree of expression nodes — the serialized-plan-bloat
    * failure mode of per-value literals (see Similarity.scala's IVF
    * note) doesn't apply. */
  private def bestOf(cents: Seq[(Long, Seq[Double])], vec: Column): Column =
    array_min(transform(typedlit(cents), ct =>
      struct(distSq(vec, ct.getField("_2")).as("d"),
        ct.getField("_1").as("cluster"))))

  /** Lloyd's k-means: deterministic seeds (the k smallest-id
    * vectors), `passes` assignment passes with a centroid update
    * between consecutive passes (an empty cluster keeps its previous
    * centroid). Returns one row per vector:
    * `(idCol, vecCol, cluster, d)` with `d` the squared L2 distance
    * to the vector's final centroid.
    *
    * Scale posture: per pass, one corpus scan for the assignment
    * (centroids ride along broadcast inside a single array literal)
    * plus one partial-aggregated shuffle keyed (cluster, dim) for
    * the update whose OUTPUT is k×dim rows. The corpus is never
    * shuffled and never collected; driver-side state is the k×dim
    * centroid matrix — the same driver-coordinated round structure
    * as MLlib's KMeans. At a production k (SemDeDup uses ~n/160
    * clusters) the k×dim matrix is still MBs, not corpus-sized.
    */
  def kmeans(emb: DataFrame, idCol: String, vecCol: String,
             k: Int, passes: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(passes >= 1, s"passes must be >= 1, got $passes")
    // bounded control-plane collect: k seed rows
    val seeds: Seq[(Long, Seq[Double])] =
      emb.select(col(idCol), col(vecCol)).orderBy(col(idCol)).limit(k)
        .collect().zipWithIndex
        .map { case (r, i) => (i.toLong, r.getSeq[Float](1).map(_.toDouble)) }
        .toSeq

    var cents = seeds
    var assigned: DataFrame = emb
    for (pass <- 1 to passes) {
      assigned = emb
        .withColumn("__best", bestOf(cents, col(vecCol)))
        .select(col(idCol), col(vecCol),
          col("__best.cluster").as("cluster"), col("__best.d").as("d"))
      if (pass < passes) {
        // bounded control-plane collect: k×dim aggregated rows
        val upd = assigned
          .select(col("cluster"), posexplode(col(vecCol)).as(Seq("pos", "v")))
          .groupBy(col("cluster"), col("pos"))
          .agg(sum(floor(col("v").cast("double") * lit(Micro)).cast("long")).as("sm"),
            count(lit(1)).as("n"))
          .collect()
          .groupBy(_.getLong(0))
        cents = cents.map { case (c, prev) =>
          upd.get(c) match {
            case Some(rows) =>
              (c, rows.map(r => (r.getInt(1), r.getLong(2).toDouble / (Micro * r.getLong(3))))
                .sortBy(_._1).map(_._2).toSeq)
            case None => (c, prev)
          }
        }
      }
    }
    assigned
  }

  /** Within-cluster candidate pairs for [[semDedup]], with the
    * hot-cluster guard applied — exposed separately so the guard's
    * pair-count bound is directly assertable (TrainingSpec).
    *
    * Guard: exact copies always co-cluster, so an unguarded
    * within-cluster all-pairs join is quadratic in mirror
    * multiplicity BY SEMANTICS — the same shape the minhash family's
    * hot-bucket guard covers. A cluster with w members yields w²/2
    * pairs below `maxCluster` and switches to star pairing against
    * the cluster's min-id representative above it: O(w) pairs, and
    * exact copies still drop (cosine 1.0 against the rep). The traded
    * recall — a non-rep pair similar to each other but not to the rep
    * — only exists in clusters that exceeded the cap; run exact dedup
    * first (the CurationSpec pipeline order) and the cap never
    * triggers on mirrors at all. */
  private[graft] def semDedupPairs(assigned: DataFrame, idCol: String,
                                   vecCol: String, maxCluster: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byCluster = Window.partitionBy(col("cluster"))
    val aw = assigned
      .withColumn("__w", count(lit(1)).over(byCluster))
      .withColumn("__rep", min(col(idCol)).over(byCluster))
    val small = aw.filter(col("__w") <= maxCluster)
    val smallPairs = small
      .select(col("cluster"), col(idCol).as("__id_a"), col(vecCol).as("__va"))
      .join(small.select(col("cluster"), col(idCol).as("__id_b"),
        col(vecCol).as("__vb")), Seq("cluster"))
      .filter(col("__id_a") < col("__id_b"))
    // one row per hot cluster → the rep side is tiny (AQE broadcasts)
    val hot = aw.filter(col("__w") > maxCluster)
    val hotPairs = hot.filter(col(idCol) =!= col("__rep"))
      .select(col("cluster"), col(idCol).as("__id_b"), col(vecCol).as("__vb"))
      .join(hot.filter(col(idCol) === col("__rep"))
        .select(col("cluster"), col(idCol).as("__id_a"), col(vecCol).as("__va")),
        Seq("cluster"))
    smallPairs.select("cluster", "__id_a", "__id_b", "__va", "__vb")
      .unionByName(hotPairs.select("cluster", "__id_a", "__id_b", "__va", "__vb"))
  }

  /** SemDeDup: duplicates are detected only WITHIN a k-means cluster
    * — the paper's blocking step that turns an O(n²) corpus self-join
    * into k joins of cluster-sized blocks. For each within-cluster
    * pair with cosine >= `tau`, the larger id is dropped (a
    * deterministic stand-in for the paper's keep-one rule). Returns
    * DISTINCT `(idCol, cluster)` of dropped vectors.
    *
    * Scale: the pair join shuffles the corpus once, keyed by cluster;
    * with a production k (~n/160) each block is ~160 vectors, so the
    * within-block quadratic term is a constant — and clusters that
    * exceed `maxCluster` (mirrored content, degenerate centroids)
    * fall back to star pairing (see [[semDedupPairs]]), so no cluster
    * can detonate the pair join. Cross-cluster near-dups are out of
    * contract — that miss rate is the trade the paper measures and
    * accepts. */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
               k: Int, passes: Int, tau: Double,
               maxCluster: Int = 1000): DataFrame = {
    val a = kmeans(emb, idCol, vecCol, k, passes)
    semDedupPairs(a, idCol, vecCol, maxCluster)
      .filter(Similarity.cosine(col("__va"), col("__vb")) >= tau)
      .select(col("__id_b").as(idCol), col("cluster"))
      .distinct()
  }

  /** Fixed-point power iteration: the dominant eigenvector of a
    * symmetric integer matrix given as its upper triangle
    * `(i, j, g)` — the PCA eigensolve step downstream of
    * [[graft.functions.GramMatrix]]. Fixed `iters` rounds of
    * `w = G·v` followed by ∞-norm renormalization
    * `v = w div max(max|w| div 10⁶, 1)` in 64-bit integer arithmetic
    * with TRUNCATING division (Java `/` ≡ Spark `div` ≡ DuckDB `//`,
    * on negatives too — all three truncate toward zero), so any
    * engine replays the rounds bit-for-bit — a budgeted
    * deterministic computation, not a convergence test (production
    * PCA runs a fixed sweep budget the same way). The divisor is
    * pre-scaled (max|w| div 10⁶, never w·10⁶) so renormalization
    * itself cannot overflow; |v| stays ~10⁶ across rounds.
    *
    * DRIVER-SIDE BY DESIGN: the triangle is dim(dim+1)/2 rows —
    * bounded control-plane state like the k-means centroid fetch and
    * the IVF centroid table, NEVER corpus-sized; the corpus-sized
    * work already happened inside the Gram aggregate. Distributing a
    * dim×dim matvec would add shuffles to save microseconds.
    * Overflow headroom contract: dim · max|G| · ~2·10⁶ < 2⁶³
    * (max|G| < 7·10¹³ at dim 64) — rescale the Gram (shift the
    * quantization step) beyond that.
    *
    * Returns one row per dimension: `(k, v_micro)`, ∞-normalized so
    * max|v| = 10⁶. */
  def powerIteration(gramTriangle: DataFrame, iters: Int = 8): DataFrame = {
    val spark = gramTriangle.sparkSession
    val tri = gramTriangle.select(
      col("i").cast("int"), col("j").cast("int"), col("g").cast("long"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val dim = if (tri.isEmpty) 0 else tri.map(_._2).max + 1
    val full = Array.ofDim[Long](dim, dim)
    tri.foreach { case (i, j, g) => full(i)(j) = g; full(j)(i) = g }
    var v = Array.fill(dim)(1000000L)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim) { k =>
        var s = 0L
        var j = 0
        while (j < dim) { s += full(k)(j) * v(j); j += 1 }
        s
      }
      val m = w.map(math.abs).foldLeft(0L)(math.max)
      val dvr = math.max(m / 1000000L, 1L)
      v = w.map(_ / dvr)
    }
    import spark.implicits._
    v.zipWithIndex.map { case (x, k) => (k.toLong, x) }.toSeq
      .toDF("k", "v_micro")
  }
}
