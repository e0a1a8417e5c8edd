package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge-list frames — the same
  * join+aggregate-per-round shape as [[Dedup.clusterPairs]]'s label
  * propagation, so everything said there about distribution applies:
  * each round is one join shuffled on the source key plus one
  * aggregation shuffled on the destination key, no driver-side graph
  * state beyond single scalars.
  */
object Graph {

  /** Fixed-iteration weighted PageRank in integer micro-units — the
    * importance ranking for link/transition graphs (crawl frontier
    * prioritization, event-flow hub detection), engine-exact: ranks
    * start at `1e6 div n` and every update is
    * `base + (dampBp · Σ (pr·w div w_out)) div 10⁴` in 64-bit integer
    * arithmetic, so any engine reproduces the bits and a SQL oracle
    * can replay the unrolled iterations.
    *
    * Fixed iteration count (not convergence-tested): rank mass moves
    * one hop per round exactly like the label propagation, and
    * production PageRank runs a fixed small round budget anyway.
    * Dangling nodes (no out-edges) leak their mass each round — the
    * standard simplification; total mass is not conserved, relative
    * ranking is what the operator contracts.
    *
    * Scale: per round, ONE join of the rank frame against the
    * edge+out-weight frame (shuffle on src) and ONE dst-keyed
    * aggregation with map-side combine; the rank frame is nodes ×
    * 16 bytes. The driver holds exactly one scalar (the node count).
    * Zipf-headed in-degree (every real link graph) is the aggregation
    * skew case — AQE's skew handling or pre-salting the hottest dst
    * keys applies unchanged; plan depth grows linearly in rounds, so
    * long budgets would checkpoint every ~5 rounds like clusterPairs
    * (unnecessary at the fixed default of 3). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               wCol: String, iters: Int = 3, dampBp: Int = 8500): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("long").as("w"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().cache()
    val n = math.max(1L, nodes.count())
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("w_out"))
    val ew = e.join(outW, "src").cache()
    val init = 1000000L / n
    val base = ((10000L - dampBp) * init) / 10000L
    var pr = nodes.select(col("node"), lit(init).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = pr.join(ew, pr("node") === ew("src"))
        .select(col("dst").as("node"), expr("(pr * w) div w_out").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          expr(s"CAST($base AS BIGINT) + (CAST($dampBp AS BIGINT) * " +
            "coalesce(s, CAST(0 AS BIGINT))) div 10000").as("pr"))
    }
    pr
  }

  /** Bounded-hop BFS: minimum hop distance from any seed node within
    * `maxHops`, unreached nodes absent from the output — reachability
    * labeling for link graphs (crawl-depth from seed hosts, blast
    * radius from a flagged source).
    *
    * Each round joins the distance frame against the edge list and
    * folds with a min-aggregation, so the label set stays exact under
    * any execution order. The whole discovered set re-expands every
    * round (simplest exact form — fine for the small fixed hop
    * budgets this targets); a deep-traversal variant would carry only
    * the newly-discovered frontier per round and checkpoint lineage
    * like [[Dedup.clusterPairs]]. Seeds is any single-column frame. */
  def hopDistance(edges: DataFrame, srcCol: String, dstCol: String,
                  seeds: DataFrame, maxHops: Int = 3): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().cache()
    var dist = seeds.select(col(seeds.columns.head).as("node")).distinct()
      .withColumn("hops", lit(0L))
    for (_ <- 1 to maxHops) {
      val next = dist.join(e, dist("node") === e("src"))
        .select(col("dst").as("node"), (col("hops") + lit(1L)).as("hops"))
      dist = dist.unionByName(next)
        .groupBy(col("node")).agg(min(col("hops")).as("hops"))
    }
    dist
  }
}
