package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge-list frames — the same
  * join+aggregate-per-round shape as [[Dedup.clusterPairs]]'s label
  * propagation, so everything said there about distribution applies:
  * each round is one join shuffled on the source key plus one
  * aggregation shuffled on the destination key, no driver-side graph
  * state beyond single scalars.
  */
object Graph {

  /** Round-lineage truncation for the iterative operators. Default
    * (`reliable = false`) is `localCheckpoint` — executor-local blocks,
    * right for plan-depth control but lost with an executor, which on a
    * 1000-executor cluster would kill a multi-round lineage mid-run.
    * `reliable = true` switches every per-round materialization to
    * `checkpoint()` (written to `spark.sparkContext.setCheckpointDir`,
    * survives executor loss) — the same escape hatch as
    * [[Dedup.clusterPairs]], output-identical (GraphSpec pins parity
    * per operator). */
  private def ckpt(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) df.checkpoint() else df.localCheckpoint()

  /** Fixed-iteration weighted PageRank in integer micro-units — the
    * importance ranking for link/transition graphs (crawl frontier
    * prioritization, event-flow hub detection), engine-exact: ranks
    * start at `1e6 div n` and every update is
    * `base + (dampBp · (Σ (pr·w div w_out) + dangling_share)) div 10⁴`
    * in 64-bit integer arithmetic, so any engine reproduces the bits
    * and a SQL oracle can replay the unrolled iterations.
    *
    * DANGLING MASS: nodes with no out-edges would leak their rank
    * each round (the textbook simplification); with
    * `conserveDangling` (default) their summed rank is redistributed
    * uniformly — every node's inflow gains `dsum div n` before
    * damping, so total mass is conserved up to integer-floor dust
    * (≤ a few units per node per round; GraphSpec pins the
    * conservation bound). The dangling sum is a one-row aggregate
    * broadcast back — a scalar, never a driver-side collect. Set
    * `conserveDangling = false` for the leaky classic form.
    *
    * Fixed iteration count (not convergence-tested): rank mass moves
    * one hop per round exactly like the label propagation, and
    * production PageRank runs a fixed small round budget anyway.
    *
    * Scale: per round, ONE join of the rank frame against the
    * edge+out-weight frame (shuffle on src), ONE dst-keyed
    * aggregation with map-side combine, and (if conserving) one
    * anti-join aggregate producing a single scalar row. The rank
    * frame is nodes × 16 bytes. Zipf-headed in-degree (every real
    * link graph) is the aggregation skew case — AQE's skew handling
    * or pre-salting the hottest dst keys applies unchanged; plan
    * depth grows linearly in rounds, so long budgets would checkpoint
    * every ~5 rounds like clusterPairs (unnecessary at the fixed
    * default of 3). The result is eagerly materialized
    * (localCheckpoint) so the internal node/edge caches can be
    * unpersisted before returning — callers of repeated invocations
    * in a long-lived session don't accumulate dead cached blocks. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               wCol: String, iters: Int = 3, dampBp: Int = 8500,
               conserveDangling: Boolean = true,
               reliableCheckpoint: Boolean = false): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("long").as("w"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().cache()
    val n = math.max(1L, nodes.count())
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("w_out"))
    val ew = e.join(outW, "src").cache()
    val init = 1000000L / n
    val base = ((10000L - dampBp) * init) / 10000L
    // per-round lineage truncation (the hits() lesson, retrofitted):
    // un-truncated lineage re-executes earlier rounds once per later
    // consumer; also keeps plan depth constant in iters. The rank
    // frame is nodes × 16 bytes.
    if (conserveDangling) {
      // r19 hoisted the round-invariant dangling SET out of the loop;
      // r20 (guide §2.6 — fewer actions) folds the per-round dangling
      // SUM into the round's own checkpoint action: the flag
      // `__has_out` rides the rank frame, and each round's
      // Σ pr(dangling) is an OBSERVED metric of the checkpoint job —
      // the per-round broadcast-build job and its semi-join are gone.
      // The sum is an exact 64-bit integer either way, so injecting it
      // as a literal into the next round's expression is
      // value-identical to the old broadcast column.
      val nodesF = nodes.join(
          ew.select(col("src").as("node")).distinct()
            .withColumn("__has_out", lit(true)), Seq("node"), "left")
        .select(col("node"), coalesce(col("__has_out"), lit(false))
          .as("__has_out")).cache()
      def dsumOf(o: org.apache.spark.sql.Observation): Long =
        o.get.get("dsum") match {
          case Some(v: Long) => v
          case _ => 0L // no dangling nodes -> sum over empty = NULL
        }
      val obs0 = org.apache.spark.sql.Observation()
      var pr = ckpt(nodesF.select(col("node"), lit(init).as("pr"),
          col("__has_out"))
        .observe(obs0, sum(when(!col("__has_out"), col("pr"))).as("dsum")),
        reliableCheckpoint)
      var dsum = dsumOf(obs0)
      for (_ <- 1 to iters) {
        val contrib = pr.join(ew, pr("node") === ew("src"))
          .select(col("dst").as("node"), expr("(pr * w) div w_out").as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("s"))
        val obs = org.apache.spark.sql.Observation()
        pr = ckpt(nodesF.join(contrib, Seq("node"), "left")
          .select(col("node"),
            expr(s"CAST($base AS BIGINT) + (CAST($dampBp AS BIGINT) * " +
              s"(coalesce(s, CAST(0 AS BIGINT)) + CAST($dsum AS BIGINT) " +
              s"div $n)) div 10000").as("pr"),
            col("__has_out"))
          .observe(obs, sum(when(!col("__has_out"), col("pr"))).as("dsum")),
          reliableCheckpoint)
        dsum = dsumOf(obs)
      }
      // the returned frame is the final checkpoint minus the flag — a
      // lazy projection over checkpoint blocks, safe after unpersist
      val out = pr.select(col("node"), col("pr"))
      nodes.unpersist(); ew.unpersist(); nodesF.unpersist()
      out
    } else {
      var pr = nodes.select(col("node"), lit(init).as("pr"))
      for (_ <- 1 to iters) {
        val contrib = pr.join(ew, pr("node") === ew("src"))
          .select(col("dst").as("node"), expr("(pr * w) div w_out").as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("s"))
        pr = ckpt(nodes.join(contrib, Seq("node"), "left")
          .select(col("node"),
            expr(s"CAST($base AS BIGINT) + (CAST($dampBp AS BIGINT) * " +
              "coalesce(s, CAST(0 AS BIGINT))) div 10000").as("pr")),
          reliableCheckpoint)
      }
      nodes.unpersist()
      ew.unpersist()
      pr
    }
  }

  /** Bounded-hop BFS: minimum hop distance from any seed node within
    * `maxHops`, unreached nodes absent from the output — reachability
    * labeling for link graphs (crawl-depth from seed hosts, blast
    * radius from a flagged source).
    *
    * Each round joins the distance frame against the edge list and
    * folds with a min-aggregation, so the label set stays exact under
    * any execution order. The WHOLE discovered set re-expands every
    * round — the simplest exact form, right for small fixed hop
    * budgets over bounded alphabets (the B51 shape: hops ≤ 3, nodes =
    * an event-type vocabulary). For deep traversals over open graphs
    * use [[hopDistanceFrontier]], which joins only the
    * newly-discovered shell per round. Seeds is any single-column
    * frame. */
  def hopDistance(edges: DataFrame, srcCol: String, dstCol: String,
                  seeds: DataFrame, maxHops: Int = 3): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().cache()
    var dist = seeds.select(col(seeds.columns.head).as("node")).distinct()
      .withColumn("hops", lit(0L))
    val cached = scala.collection.mutable.ListBuffer.empty[DataFrame]
    for (h <- 1 to maxHops) {
      val next = dist.join(e, dist("node") === e("src"))
        .select(col("dst").as("node"), (col("hops") + lit(1L)).as("hops"))
      // r19 truncated each round eagerly (localCheckpoint — `dist`
      // feeds the round twice, so untruncated lineage re-executed
      // round r-1's subtree ~2× per later round). r20 (guide §2.6 —
      // fewer actions): only every SECOND round is an eager
      // checkpoint; the odd rounds in between are persisted LAZILY and
      // materialize inside the next checkpoint's job (the block
      // manager's per-partition locks make the twice-consumed cached
      // round compute once). The cadence must stay bounded: because
      // `dist` feeds each round twice, every un-truncated round
      // DOUBLES the logical tree — an early r20 form that lazy-
      // persisted all rounds built a 2^maxHops-node plan whose mere
      // analysis/explain OOMed at maxHops=10. Depth ≤ 2 keeps ≤ 4
      // subtree copies while halving the per-round actions. Same
      // min-fold per round.
      val folded = dist.unionByName(next)
        .groupBy(col("node")).agg(min(col("hops")).as("hops"))
      dist =
        if (h % 2 == 0 || h == maxHops) folded.localCheckpoint()
        else {
          val p = folded
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          cached += p
          p
        }
    }
    cached.foreach(_.unpersist())
    e.unpersist()
    dist
  }

  /** Deep-traversal BFS: identical output contract to
    * [[hopDistance]], but each round's join input is ONLY the
    * frontier — the nodes first discovered in the previous round —
    * so per-round work is O(frontier out-edges), not O(discovered
    * set), and a 100-hop traversal over a 100 TB link graph does not
    * re-expand hop-1 nodes 99 times. BFS invariant: any node
    * reachable through an already-discovered node was discovered at
    * an earlier-or-equal hop, so expanding non-frontier nodes can
    * never improve a distance — dropping them changes cost, not
    * results (GraphSpec pins equality with [[hopDistance]]).
    *
    * Each round's fresh shell is eagerly materialized
    * (localCheckpoint — the lineage checkpoint; cluster callers
    * needing durability swap in `checkpoint()` semantics upstream),
    * which both truncates the per-round plan and yields the frontier
    * size for free — the loop EXITS EARLY when a round discovers
    * nothing, so `maxHops` is a budget, not a forced cost.
    * `onRound(hop, frontierRows)` observes each round (specs assert
    * frontier-only inputs through it; production callers can log
    * traversal progress). */
  def hopDistanceFrontier(edges: DataFrame, srcCol: String, dstCol: String,
                          seeds: DataFrame, maxHops: Int = 20,
                          onRound: (Int, Long) => Unit = (_, _) => (),
                          reliableCheckpoint: Boolean = false): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().cache()
    var dist = ckpt(seeds.select(col(seeds.columns.head).as("node")).distinct()
      .withColumn("hops", lit(0L)), reliableCheckpoint)
    var frontier = dist
    var hop = 0
    var frontierRows = frontier.count()
    while (hop < maxHops && frontierRows > 0) {
      hop += 1
      val fresh = ckpt(frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(dist.select("node"), Seq("node"), "left_anti")
        .withColumn("hops", lit(hop.toLong)), reliableCheckpoint)
      frontierRows = fresh.count()
      onRound(hop, frontierRows)
      if (frontierRows > 0) dist = dist.unionByName(fresh)
      frontier = fresh
    }
    e.unpersist()
    dist
  }

  /** Per-node triangle participation counts on the UNDIRECTED simple
    * graph induced by an edge frame (direction and multiplicity
    * dropped, self-loops excluded) — the local clustering signal
    * behind community health checks (a crawl graph whose triangle
    * density collapses is turning into a star/spam shape) and the
    * numerator of clustering-coefficient dashboards.
    *
    * DEGREE ORIENTATION (the classic distributed-triangle trick):
    * each undirected edge {a,b} is oriented from its (degree, node)-
    * smaller endpoint to the larger, so every out-neighborhood has
    * size O(√m) and the wedge self-join does Σ outdeg(v)² = O(m^1.5)
    * work TOTAL regardless of degree skew — a hub of degree 10⁶ in a
    * raw wedge join would emit 10¹² wedges; oriented, hot nodes sit
    * on the IN side and emit none. Each triangle {u,v,w} is built
    * exactly once (at its orientation-minimal vertex) and credited to
    * all three corners via a 3-row explode of the 24-byte triangle
    * frame.
    *
    * Exact integer counts — any engine agrees bit-for-bit, and the
    * oracle replays orientation + wedge + closure in SQL. Scale: the
    * dedup/edge frames shuffle on node keys only (distinct, degree
    * agg, wedge join on the wedge apex, closure join on the (v,w)
    * pair); nothing driver-side. Nodes in no triangle are absent from
    * the output (deterministic both engines). */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = undirect(edges, srcCol, dstCol).cache()
    val out = triangleCountsUnd(und)
    und.unpersist()
    out
  }

  /** [[triangleCounts]] over a PRE-BUILT undirected simple frame
    * (columns `a`, `b` — see [[undirect]]); persistence of `und` is
    * caller-owned. Exposed (r19, guide §2.4 — the modularity_score
    * sharing lesson) so a caller composing triangles with other
    * per-node statistics over the SAME graph (clustering_coeff joins
    * triangle counts against the degree frame) derives and shuffles
    * the edge-set distinct ONCE instead of once per operator. */
  def triangleCountsUnd(und: DataFrame): DataFrame = {
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient {a,b} from (deg,node)-smaller to larger; join the bounded
    // degree frame twice (node-keyed; broadcast when the vocabulary is
    // small, shuffle-keyed otherwise — Catalyst's call)
    val o = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("f"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("t"))
    // wedges at a common apex f with t1 < t2, closed by an undirected
    // edge {t1,t2} — each triangle materializes exactly once
    val o1 = o.select(col("f"), col("t").as("v"))
    val o2 = o.select(col("f"), col("t").as("w"))
    val tri = o1.join(o2, Seq("f")).filter(col("v") < col("w"))
      .join(und, col("v") === und("a") && col("w") === und("b"))
      .select(col("f"), col("v"), col("w"))
    tri
      .select(explode(array(col("f"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
      .localCheckpoint()
  }

  /** Bounded-round k-core peeling on the undirected simple graph:
    * repeatedly drop nodes of degree < k (and their edges) for up to
    * `rounds` rounds, returning the surviving nodes with their
    * residual degree — the standard "dense stable subgraph" extractor
    * (link-graph spam cores, the connected backbone left after
    * stripping leaf chains).
    *
    * EARLY EXIT IS A FIXPOINT: peeling is monotone, so a round that
    * drops no edge makes every later round a no-op — the engine exits
    * there, and an oracle that unrolls the full `rounds` budget gets
    * an identical frame (the unrolled rounds re-derive the same
    * fixpoint). If the budget caps before convergence both engine and
    * oracle stop at exactly `rounds` peels — equal again, so the
    * bounded unrolled-SQL oracle is exact in every case.
    *
    * Scale: per round ONE both-sides degree aggregation (map-side
    * combined, node-keyed) and TWO semi-joins of the edge frame
    * against the surviving-node frame — all shuffles keyed on node
    * ids, the node frame is nodes × 8 bytes. Each round's survivor
    * edge frame is eagerly materialized (localCheckpoint — the
    * iterative-lineage convention of [[pageRank]]/[[hits]]), which
    * also makes the early-exit edge count free. Real graphs shed the
    * leaf tail in the first 1–2 rounds, so small budgets converge;
    * the budget is a cost cap, not a correctness knob. */
  def kcore(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int = 3, rounds: Int = 4,
            reliableCheckpoint: Boolean = false): DataFrame = {
    var cur = ckpt(edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct(), reliableCheckpoint)
    var m = cur.count()
    var r = 0
    var converged = false
    while (r < rounds && !converged && m > 0) {
      r += 1
      val deg = cur.select(col("a").as("node"))
        .unionByName(cur.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("node"))
      val next = ckpt(cur
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi"),
        reliableCheckpoint)
      val m2 = next.count()
      converged = m2 == m
      m = m2
      cur = next
    }
    // output = degrees over the post-peel edge frame, no extra filter:
    // this is exactly what `rounds` unrolled peels yield, so the
    // early-exited engine and the fully-unrolled oracle agree whether
    // or not the budget converged
    cur.select(col("a").as("node"))
      .unionByName(cur.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
  }

  /** Fixed-round SYNCHRONOUS label propagation on the undirected
    * simple graph (direction/multiplicity dropped, self-loops
    * excluded) — the cheap community detector (near-linear per round):
    * every node starts labeled with itself, and each round
    * simultaneously adopts the most frequent label among its
    * neighbors' PREVIOUS labels, ties broken by the smaller label —
    * so the update is a pure function of the prior round and any
    * engine reproduces it exactly (asynchronous LPA is
    * execution-order-dependent; this is deliberately the
    * deterministic synchronous form, and an unrolled SQL oracle
    * replays it round for round).
    *
    * The per-node argmax is `min(struct(-count, label))` — a
    * PARTIAL-AGGREGABLE min, so each round is exactly two map-side-
    * combined aggregations keyed on (node, label) then node, plus one
    * join of the 2-column label frame against the neighbor list
    * (shuffled on the neighbor key). No windows, no driver state;
    * per-round frames are eagerly materialized (localCheckpoint — the
    * iterative-lineage convention of [[pageRank]]/[[hits]]). Skewed
    * degree is the usual aggregation-skew case (AQE/salting).
    * Fixed small round budget: label mass moves one hop per round,
    * and synchronous LPA is known to oscillate rather than converge —
    * production runs cap rounds anyway. */
  def labelProp(edges: DataFrame, srcCol: String, dstCol: String,
                iters: Int = 2,
                reliableCheckpoint: Boolean = false): DataFrame =
    labelPropTrace(edges, srcCol, dstCol, iters, reliableCheckpoint).last

  /** [[labelProp]] with every round's label frame returned (index 0 =
    * round 1) — each round computed ONCE and localCheckpointed, so a
    * caller comparing partitions across rounds (the modularity audit)
    * pays no recomputation. */
  def labelPropTrace(edges: DataFrame, srcCol: String, dstCol: String,
                     iters: Int,
                     reliableCheckpoint: Boolean = false): Seq[DataFrame] =
    labelPropTraceUnd(undirect(edges, srcCol, dstCol), iters,
      reliableCheckpoint)

  /** The UNDIRECTED SIMPLE edge frame (a < b, no self-loops, distinct)
    * every graph operator here starts from — exposed so a caller
    * composing several operators over the SAME graph (the
    * modularity-audit query runs label propagation AND per-round
    * scoring) can derive it ONCE, persist it, and share it: the
    * distinct is a full shuffle of the edge set, the dominant cost at
    * 100 TB, and paying it once instead of per-operator halves the
    * composed plan's shuffle bill. */
  def undirect(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** [[labelPropTrace]] over a PRE-BUILT undirected simple frame
    * (columns `a`, `b` — see [[undirect]]); persistence of `und` is
    * caller-owned. */
  def labelPropTraceUnd(und: DataFrame, iters: Int,
                        reliableCheckpoint: Boolean = false): Seq[DataFrame] = {
    val nbr = und.select(col("a").as("node"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("node"), col("a").as("nbr")))
      .cache()
    var lab = nbr.select(col("node")).distinct()
      .select(col("node"), col("node").as("label"))
    val trace = Vector.newBuilder[DataFrame]
    for (_ <- 1 to iters) {
      // every node has >= 1 neighbor (it came from an edge), so the
      // inner join preserves the node set round to round
      lab = nbr.join(lab.select(col("node").as("nbr"), col("label")), "nbr")
        .groupBy(col("node"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("node"))
        .agg(min(struct((-col("c")).as("k"), col("label").as("label"))).as("m"))
        .select(col("node"), col("m.label").as("label"))
      lab = ckpt(lab, reliableCheckpoint)
      trace += lab
    }
    nbr.unpersist()
    trace.result()
  }

  /** Per-community NEWMAN MODULARITY of a node-labeling over the
    * undirected simple graph, in exact integers: for community c with
    * m_c intra-community edges and degree mass d_c on a graph of m
    * edges, `q_scaled = 4·m·m_c − d_c²` — modularity × 4m² with the
    * division deferred (Q = Σ_c q_scaled / (4m²)), so the partition
    * quality is cross-engine bit-exact with no floats. Q ≈ 0 means
    * the partition is no better than a random cut with the same
    * degree sequence — the audit every community detector
    * ([[labelProp]]) needs before its output is trusted.
    *
    * Overflow: 4·m·m_c ≤ 4m² and d_c² ≤ (2m)², so 63 bits hold to
    * m ≈ 1.5·10⁹ edges; beyond that, partition the graph or lift to
    * DECIMAL(38,0). Scale: one edge→label join pair keyed on the
    * node ids (intra counts), one both-endpoints degree aggregation
    * joined to labels, and the edge total broadcast back as a
    * one-row frame — nothing driver-side. `labels` is a
    * (node, label) frame covering every edge endpoint. */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
                 labels: DataFrame): DataFrame =
    modularityRounds(edges, srcCol, dstCol, Seq(1L -> labels)).drop("round")

  /** [[modularity]] for SEVERAL partitions of the same graph (the
    * round-by-round audit of [[labelPropTrace]]): the undirected
    * frame, the degree frame and the edge total are built ONCE and
    * shared across every partition; output carries a `round` column
    * tagging each labeling. */
  def modularityRounds(edges: DataFrame, srcCol: String, dstCol: String,
                       labelRounds: Seq[(Long, DataFrame)]): DataFrame = {
    val und = undirect(edges, srcCol, dstCol).cache()
    val out = modularityRoundsUnd(und, labelRounds)
    und.unpersist()
    out
  }

  /** [[modularityRounds]] over a PRE-BUILT undirected simple frame
    * (columns `a`, `b` — see [[undirect]]); persistence of `und` is
    * caller-owned, so a caller that already derived it for label
    * propagation shares ONE materialization across both operators
    * instead of re-shuffling the edge set into a second distinct. The
    * output is eagerly materialized (localCheckpoint — it is the tiny
    * per-community result frame), so the caller may unpersist `und`
    * immediately after this returns. */
  def modularityRoundsUnd(und: DataFrame,
                          labelRounds: Seq[(Long, DataFrame)]): DataFrame =
    modularityRoundsPlan(und, labelRounds).localCheckpoint()

  /** The un-materialized plan behind [[modularityRoundsUnd]] —
    * separate so PlanSpec can pin the shared-frame contract (every
    * fan-out arm reads the caller's persisted `und`, no re-derived
    * distinct) on the plan the checkpoint would otherwise hide. */
  private[graft] def modularityRoundsPlan(und: DataFrame,
      labelRounds: Seq[(Long, DataFrame)]): DataFrame = {
    val mrow = und.agg(count(lit(1)).as("m"))
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    labelRounds.map { case (round, labels) =>
      val lab = labels.select(col(labels.columns(0)).as("node"),
        col(labels.columns(1)).as("label"))
      val intra = und
        .join(lab.select(col("node").as("a"), col("label").as("la")), "a")
        .join(lab.select(col("node").as("b"), col("label").as("lb")), "b")
        .filter(col("la") === col("lb"))
        .groupBy(col("la").as("label")).agg(count(lit(1)).as("intra_edges"))
      deg.join(lab, "node")
        .groupBy(col("label"))
        .agg(sum(col("deg")).as("deg_sum"), count(lit(1)).as("n_nodes"))
        .join(intra, Seq("label"), "left")
        .crossJoin(broadcast(mrow))
        .select(lit(round).as("round"), col("label"), col("n_nodes"),
          coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
          col("deg_sum"),
          (coalesce(col("intra_edges"), lit(0L)) * col("m") * 4 -
            col("deg_sum") * col("deg_sum")).as("q_scaled"))
    }.reduce(_ unionByName _)
  }

  /** DEGREE ASSORTATIVITY (Newman's r) of the undirected simple
    * graph: the Pearson correlation of endpoint degrees over the
    * symmetrized edge set (both orientations) — "do hubs link to
    * hubs?" in one number (social graphs r > 0; word/web/biological
    * graphs r < 0). Moments accumulate as exact DECIMAL(38,0)
    * (order-independent at any scale); the statistic derives in pure
    * double arithmetic from those exact inputs via [[AssortSql]], so
    * any engine produces identical bits (sqrt is IEEE
    * correctly-rounded). Zero degree variance (regular graphs) guards
    * to r = 0. Output: one row (n, r_assort), n = 2m samples.
    *
    * Scale: one distinct, one degree aggregation, two node-keyed
    * joins of the 16-byte degree frame, one map-side-combined moment
    * aggregation — no windows, nothing driver-side. */
  def assortativity(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val pairs = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(col("da"), col("db"))
    val sym = pairs.select(col("da").as("x"), col("db").as("y"))
      .unionByName(pairs.select(col("db").as("x"), col("da").as("y")))
    val d38 = (c: Column) =>
      sum(c.cast(org.apache.spark.sql.types.DecimalType(38, 0))).cast("double")
    sym.agg(count(lit(1)).as("n"),
        d38(col("x")).as("sx"), d38(col("y")).as("sy"),
        d38(col("x") * col("y")).as("sxy"),
        d38(col("x") * col("x")).as("sxx"),
        d38(col("y") * col("y")).as("syy"))
      .select(col("n"), expr(AssortSql).as("r_assort"))
  }

  /** Top-k node pairs by COMMON-NEIGHBOR JACCARD — the classic
    * link-prediction / entity-similarity score: for a pair {u,v},
    * |N(u)∩N(v)| / |N(u)∪N(v)| over the undirected simple graph.
    *
    * Common-neighbor counting is a wedge enumeration: every shared
    * neighbor w contributes one wedge u–w–v, so the apex self-join
    * does Σ deg(w)² work — quadratic in each apex's degree, which a
    * hub turns into a stall (degree 10⁶ → 10¹² wedges). Degree
    * orientation does NOT apply here (it keeps only the wedges at a
    * pair's orientation-minimal apex — fine for triangle CLOSURE,
    * an undercount for neighbor INTERSECTION), so the guard is the
    * idf-style one every production similarity pipeline uses:
    * apexes with degree > `maxApexDeg` are excluded from wedge
    * generation (a stopword-grade hub connects everything and
    * carries no pair signal — same reasoning as the df cap on the
    * sparse-retrieval postings join). The guard is part of the
    * operator CONTRACT, not an approximation knob the result hides:
    * both engines apply it identically, union sizes use the EXACT
    * uncapped degrees, and capped-common ≤ min(deg) keeps the score
    * in [0, 1].
    *
    * Exact integers (common count, degrees, jaccard in bp via
    * cross-multiplied integer division). Scale: one distinct, one
    * degree agg, the capped apex self-join (Σ_{deg≤cap} deg² ≤
    * cap·m), one pair-keyed count agg, two node-keyed degree joins
    * of the bounded pair frame, TakeOrdered top-k — no windows,
    * nothing driver-side. */
  def commonNeighborJaccard(edges: DataFrame, srcCol: String, dstCol: String,
      maxApexDeg: Long, k: Int): DataFrame = {
    // eager localCheckpoint (NOT cache+unpersist — a lazy cache that
    // is unpersisted before the result materializes never populates,
    // and the distinct recomputes for every consumer): the m×16-byte
    // edge frame materializes once and feeds the degree agg plus both
    // wedge sides, while the RESULT plan stays lazy so the top-k
    // still plans as TakeOrderedAndProject (PlanSpec pins it)
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // adjacency both directions, apexes over the cap dropped BEFORE
    // the self-join — the only stage whose cost is degree-quadratic
    val adj = und.select(col("a").as("w"), col("b").as("x"))
      .unionByName(und.select(col("b").as("w"), col("a").as("x")))
      .join(deg.filter(col("deg") <= maxApexDeg)
        .select(col("node").as("w")), "w")
    val common = adj.select(col("w"), col("x").as("u"))
      .join(adj.select(col("w"), col("x").as("v")), Seq("w"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("common"))
    val out = common
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(col("u"), col("v"), col("common"), col("du"), col("dv"),
        expr("common * 10000 div (du + dv - common)").as("jaccard_bp"))
      .orderBy(col("jaccard_bp").desc, col("common").desc,
        col("u").asc, col("v").asc)
      .limit(k)
    out
  }

  /** Resource-allocation link prediction (Zhou, Lü & Zhang, EPJ B
    * 2009): RA(u,v) = Σ_{w ∈ N(u)∩N(v)} 1/deg(w) — the
    * common-neighbor count with each shared neighbor discounted by
    * its degree. Integer-exact: each wedge contributes
    * `10⁶ div deg(w)` (1/log-weighted Adamic–Adar is NOT
    * integer-expressible; RA both beats it on link-prediction
    * benchmarks and stays engine-exact). Identical wedge machinery,
    * hub guard, and scale shape as [[commonNeighborJaccard]] — the
    * guard is contract (apexes over `maxApexDeg` generate no
    * wedges), while the 1/deg weights use the EXACT uncapped
    * degrees. Deterministic top-k: (ra_ppm desc, common desc, u, v). */
  def resourceAllocation(edges: DataFrame, srcCol: String, dstCol: String,
      maxApexDeg: Long, k: Int): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val adj = und.select(col("a").as("w"), col("b").as("x"))
      .unionByName(und.select(col("b").as("w"), col("a").as("x")))
      .join(deg.select(col("node").as("w"), col("deg")), "w")
      .filter(col("deg") <= maxApexDeg)
    adj.select(col("w"), col("deg"), col("x").as("u"))
      .join(adj.select(col("w"), col("x").as("v")), Seq("w"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common"),
        sum(expr("1000000 div deg")).as("ra_ppm"))
      .orderBy(col("ra_ppm").desc, col("common").desc,
        col("u").asc, col("v").asc)
      .limit(k)
  }

  /** The assortativity statistic over the exact moment columns —
    * shared VERBATIM with the SQL oracle so the double operation
    * order (hence every IEEE rounding) is identical on both engines. */
  val AssortSql: String =
    """CASE WHEN sxx - sx * sx / n = 0 OR syy - sy * sy / n = 0
      |     THEN CAST(0 AS DOUBLE)
      |     ELSE (sxy - sx * sy / n)
      |          / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
      |END""".stripMargin

  /** Fixed-iteration weighted HITS (hubs & authorities, Kleinberg) in
    * integer micro-units — the bipartite-role twin of [[pageRank]]:
    * a node is a good HUB when it points at good authorities and a
    * good AUTHORITY when good hubs point at it (link-graph curation:
    * directory/index pages vs canonical-content pages; in event-flow
    * graphs, dispatcher states vs sink states). PageRank's single
    * score cannot separate the two roles.
    *
    * Engine-exact by the same convention as [[pageRank]]: every
    * half-round is `raw(v) = Σ counterpart·w` followed by L1
    * renormalization `raw · 10⁶ div Σraw` in 64-bit integer
    * arithmetic (Σraw floored at 1 so an edgeless graph divides by 1,
    * not 0), so a SQL oracle replays the unrolled iterations
    * bit-for-bit. Nodes with no in-edges get authority 0; no
    * out-edges, hub 0. After renormalization each score vector sums
    * to ≤ 10⁶ with integer-floor dust only (GraphSpec pins the
    * bound), so iterations cannot overflow: score ≤ 10⁶, and
    * Σ score·w ≤ 10⁶·Σw fits 63 bits for any real edge frame.
    *
    * Scale: per half-round, ONE join of the 16-byte score frame
    * against the edge list (shuffle on the score key) and ONE
    * map-side-combined aggregation on the opposite key; each L1 sum
    * is a one-row aggregate broadcast back — never a driver collect.
    * Skewed in-degree is the aggregation skew case (AQE / salting as
    * with [[pageRank]]). Each half-round's score frame is eagerly
    * materialized (localCheckpoint): the L1-sum broadcasts would
    * otherwise each replay the ENTIRE upstream half-round chain when
    * they materialize — four broadcasts deep, that is exponential-ish
    * re-execution (measured 7s → sub-second on a 5-node graph) —
    * and the checkpoint also keeps plan depth constant in `iters`.
    * The score frames are nodes × 16 bytes, so the checkpoint cost
    * is the half-round itself, paid exactly once. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           wCol: String, iters: Int = 2,
           reliableCheckpoint: Boolean = false): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("long").as("w")).cache()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().cache()
    // r19 checkpointed each half-round's raw frame so its two
    // consumers (L1-sum broadcast + renormalization join) read blocks
    // instead of re-running the score⋈edges⋈agg pipeline. r20 (guide
    // §2.6 — fewer actions): the L1 sum is now an OBSERVED metric of
    // that same checkpoint job, injected as a literal into the
    // renormalized frame — the per-half-round broadcast-build job is
    // gone, and the renormalized auth/hub frames are cheap lazy
    // projections over checkpoint blocks that no longer need their own
    // checkpoints (each is consumed by at most the next half-round's
    // checkpoint and the final join). Σraw is an exact 64-bit integer
    // either way, so `div lit(tot)` is bit-identical to the old
    // broadcast `div tot` column; the Σraw=0 floor (edgeless graph
    // divides by 1, not 0) moves onto the driver literal unchanged.
    def l1(o: org.apache.spark.sql.Observation): Long =
      math.max(1L, o.get.get("tot") match {
        case Some(v: Long) => v
        case _ => 0L // empty raw frame -> sum = NULL
      })
    var hub = nodes.select(col("node"), lit(1000000L).as("hub"))
    var auth = nodes.select(col("node"), lit(0L).as("auth"))
    for (_ <- 1 to iters) {
      val aobs = org.apache.spark.sql.Observation()
      val araw = ckpt(hub.join(e, hub("node") === e("src"))
        .select(col("dst").as("node"), (col("hub") * col("w")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("raw"))
        .observe(aobs, sum(col("raw")).as("tot")), reliableCheckpoint)
      val atot = l1(aobs)
      auth = nodes.join(araw, Seq("node"), "left")
        .select(col("node"),
          expr(s"coalesce(raw, CAST(0 AS BIGINT)) * 1000000 " +
            s"div CAST($atot AS BIGINT)").as("auth"))
      val hobs = org.apache.spark.sql.Observation()
      val hraw = ckpt(auth.join(e, auth("node") === e("dst"))
        .select(col("src").as("node"), (col("auth") * col("w")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("raw"))
        .observe(hobs, sum(col("raw")).as("tot")), reliableCheckpoint)
      val htot = l1(hobs)
      hub = nodes.join(hraw, Seq("node"), "left")
        .select(col("node"),
          expr(s"coalesce(raw, CAST(0 AS BIGINT)) * 1000000 " +
            s"div CAST($htot AS BIGINT)").as("hub"))
    }
    val out = ckpt(hub.join(auth, Seq("node")), reliableCheckpoint)
    nodes.unpersist()
    e.unpersist()
    out
  }
}
