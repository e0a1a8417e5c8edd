package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query end-to-end at
  * SPARK_GRAFT_SF_DIR, forcing full materialization through the noop
  * sink (count() would let Spark skip computing projected columns).
  * Prints ONE JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    // ERROR, not WARN: the driver keeps only a 2000-char tail of the
    // merged bench output, and per-query WindowExec WARN spam pushed
    // the final JSON line out of r10's window (BENCH_r10.json had
    // parsed=null). The bounded-window sites the warnings nag about
    // are pinned in PlanSpec/scaladoc instead.
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)

    // LOAD-GATED PRE-FLIGHT (r17 verdict item 6): refuse to START a
    // leg while the 1-min loadavg says another tenant is on the box —
    // cheaper than a round of post-hoc burst adjudication. Polls every
    // 30 s up to SPARK_GRAFT_LOAD_WAIT_MAX (default 10 min), then
    // PROCEEDS WITH ANNOTATION rather than failing: the driver's
    // unattended per-round run must still produce an artifact, and a
    // marked-loaded artifact is adjudication data, not a baseline.
    // Mid-suite reads at the suite's third boundaries extend the
    // sentinel timeline with the OS's own view of contention.
    val LoadGate = sys.env.get("SPARK_GRAFT_LOAD_GATE")
      .map(_.toDouble).getOrElse(1.0)
    val LoadWaitMaxSec = sys.env.get("SPARK_GRAFT_LOAD_WAIT_MAX")
      .map(_.toInt).getOrElse(600)
    // prime the host-contention counters (the first processCpuLoad /
    // /proc/stat reads have no baseline window); the start sample
    // below then carries real deltas over at least the 250 ms pause
    var hostTicks: Option[(Long, Long)] = hostRead(None)._2
    var preflightWaitSec = 0
    while (loadavg1() > LoadGate && preflightWaitSec < LoadWaitMaxSec) {
      Thread.sleep(30000); preflightWaitSec += 30
    }
    Thread.sleep(250)
    val loadReads = scala.collection.mutable.ListBuffer(
      "start" -> loadavg1())
    val hostReads = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var stealMax = -1.0
    var runnableOtherMax = -1
    def sampleHost(name: String): Unit = {
      val (j, t, st, ro) = hostRead(hostTicks)
      hostTicks = t; hostReads += (name -> j)
      stealMax = math.max(stealMax, st)
      runnableOtherMax = math.max(runnableOtherMax, ro)
    }
    sampleHost("start")

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime()
      fn
      (System.nanoTime() - t0) / 1e9
    }

    // JVM/codegen warm-up on the smallest SF so per-query numbers
    // measure the plan, not first-call JIT + codegen compilation.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").write.format("noop")
        .mode("overwrite").save()
      catch { case _: Throwable => }
    }
    // Drain the warm-up's wake before measuring: 200+ queries leave
    // tens of GB of young-gen garbage plus weakly-referenced broadcast
    // / localCheckpoint blocks whose ContextCleaner unpersist only
    // triggers on a GC. Without this, the first heavy allocator in
    // measurement order pays the warm-up's deferred GC + cleaner
    // backlog inside its own timing (r13 adjudication: approx_sketch,
    // 3rd alphabetically, recorded [11.5, 21.3, 25.1] s at 10x in two
    // independent full-bench runs vs 2.1 s in an isolated
    // BenchSubset JVM — min-of-3 polluted, so retries can't save it).
    // Standard benchmark hygiene: drop the warm-up's persisted plans
    // (CacheManager pins them until an explicit clear), force the GC
    // ourselves, give the cleaner a moment to process the reference
    // queue, then measure.
    spark.catalog.clearCache()
    System.gc()
    Thread.sleep(3000)
    System.gc()

    // median of three measured passes: min-of-2 is not robust to
    // background machine load on the driver host (a loaded r2 run
    // recorded 2× the code's steady-state cost) — the median discards
    // one outlier in either direction, and the emitted per-query
    // [min, median, max] spread makes a loaded run self-diagnosing
    // (wide spread ⇒ distrust the total).
    //
    // Self-defense against host load (the r7 artifact recorded one
    // query at [1.58, 41.68, 51.27] — min equal to steady state,
    // median 26× it): a triple whose max/min spread exceeds
    // MaxSpread AND whose absolute swing is past the noise floor is
    // REJECTED and re-measured, up to MaxRetries; the best-spread
    // attempt wins, so a persistently loaded host degrades to
    // today's behavior (wide spread in the artifact) instead of
    // silently publishing a contaminated median.
    val MaxSpread = 5.0
    val NoiseFloorSec = 1.0
    val MaxRetries = 2
    def contaminated(runs: Seq[Double]): Boolean =
      runs.head > 0 && runs.last - runs.head > NoiseFloorSec &&
        runs.last / runs.head > MaxSpread
    // Measurement order is alphabetical by default;
    // SPARK_GRAFT_BENCH_ORDER=reverse flips it. Two passes in opposite
    // orders separate a query's own cost from JVM/page-cache state
    // inherited from whoever ran before it (r10 adjudication: five
    // queries drifted 2.4-4x with no code change).
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1) match {
      case s if sys.env.get("SPARK_GRAFT_BENCH_ORDER").contains("reverse") => s.reverse
      case s => s
    }
    // HOST-LOAD SENTINEL: one fixed reference query measured before and
    // after the whole suite, with NO contamination retries (retries
    // would mask exactly the load the sentinel exists to expose). A
    // loaded driver host shows up as sentinel drift or a wide sentinel
    // spread, so the artifact self-identifies instead of needing
    // next-round adjudication (the r11 driver run recorded 125 s where
    // quiet same-code runs measured 91–102 s).
    val SentinelName = "q6_forecast"
    def sentinelRuns(): Seq[Double] = try {
      val fn = SparkEntry.queries(SentinelName)
      Seq.fill(3)(
        time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())).sorted
    } catch { case _: Throwable => Seq(-1.0, -1.0, -1.0) }
    val sentinelFirst = sentinelRuns()

    // MID-SUITE SENTINEL TIMELINE (r16): the endpoint sentinel pair
    // cannot see minute-scale host BURSTS inside the suite — two
    // same-code r16 legs both read "quiet" yet swung disjoint key
    // neighborhoods 0.26×-2.9× in opposite directions (alphabetical
    // neighbors slow together: a burst lands on whoever was running).
    // One single-run sentinel read every SentinelEvery keys yields a
    // load timeline; a gate hit whose suite position sits next to an
    // elevated timeline read is a burst suspect, not a code suspect.
    // Cost: ~(269/20) × ~0.2 s — noise-level.
    val SentinelEvery = 20
    val timeline = scala.collection.mutable.ListBuffer.empty[(String, Double)]
    def sentinelOnce(): Double = try {
      val fn = SparkEntry.queries(SentinelName)
      time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    } catch { case _: Throwable => -1.0 }

    val results = ordered.zipWithIndex.map { case ((name, fn), i) =>
      // keyed by the NAME about to run, so the artifact maps a burst
      // to the measurement-order neighborhood whatever the order env
      if (i % SentinelEvery == 0) timeline += ((name, sentinelOnce()))
      if (i == ordered.size / 3 || i == 2 * ordered.size / 3) {
        loadReads += (s"at_$name" -> loadavg1())
        sampleHost(s"at_$name")
      }
      // CLEAR THE PLAN CACHE BEFORE EVERY TIMED PASS (r17, advisor):
      // CacheManager dedupes persisted plans by canonicalized form, so
      // a builder that persist()s (basket_rules, sparse_sim_topk) had
      // passes 2-3 reading pass 1's materialized blocks — the median
      // reported warm-cache cost while every other key re-executed
      // fully, and round-over-round ratios read cache reuse as plan
      // improvement. Each pass now measures the cold end-to-end cost,
      // and the suite no longer accumulates session-lifetime cache
      // entries (CacheManager holds a STRONG ref until unpersist /
      // clearCache — ContextCleaner never frees these).
      def once(): Seq[Double] = try {
        Seq.fill(3) {
          spark.catalog.clearCache()
          time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
        }.sorted
      } catch { case _: Throwable => Seq(-1.0, -1.0, -1.0) }
      var best = once()
      var retries = 0
      while (contaminated(best) && retries < MaxRetries) {
        val again = once()
        if (again.head >= 0 && again.last / again.head < best.last / best.head)
          best = again
        retries += 1
      }
      name -> best
    }
    val sentinelLast = sentinelRuns()
    loadReads += ("end" -> loadavg1())
    sampleHost("end")
    spark.stop()
    val loadJson = {
      val reads = loadReads.map { case (k, v) => s""""$k":${fmt(v, 2)}""" }
        .mkString("{", ",", "}")
      // steal_max / runnable_other_max: the bounded co-tenancy summary
      // (max over the suite's rich host reads) that fits the compact
      // line — steal is never self-load, runnable_other excludes us
      s""""loadavg":{"gate":${fmt(LoadGate, 2)},"wait_sec":$preflightWaitSec,""" +
        s""""exceeded":${loadReads.head._2 > LoadGate},""" +
        s""""steal_max":${fmt(stealMax, 3)},""" +
        s""""runnable_other_max":$runnableOtherMax,"reads":$reads},"""
    }
    // FULL-artifact-only (the compact line is already near the
    // driver's stdout-tail budget): the rich contention reads —
    // see hostRead for why raw loadavg alone is self-confounded
    val hostJson = hostReads.map { case (k, v) => s""""$k":$v""" }
      .mkString(""""host_reads":{""", ",", "},")
    // report AFTER stop: the compact JSON must be the last line of
    // merged output so the driver's stdout-tail window catches it
    report(results, sfDir, Some((SentinelName, sentinelFirst, sentinelLast)),
      timeline.toSeq, loadJson, hostJson)
  }

  /** Emit the bench result twice:
    *  - the FULL json (per-query medians + [min,median,max] spreads +
    *    failures) to `SPARK_GRAFT_BENCH_OUT` (default
    *    `BENCH_FULL.json` in the working dir) — the machine-readable
    *    artifact of record;
    *  - a COMPACT final stdout line that fits the driver's 2000-char
    *    stdout tail window (the full line is ~10 KB for 127 queries
    *    and was head-truncated into an unparseable fragment in
    *    r7/r8's BENCH_r{N}.json): total, failures, the output path,
    *    and per-query medians as `qv`, an array aligned with the
    *    alphabetically-sorted query names (`results` is built sorted;
    *    3-decimal floats keep 127 entries near ~900 chars).
    */
  private[graft] def report(unsorted: Seq[(String, Seq[Double])], sfDir: String,
                            sentinel: Option[(String, Seq[Double], Seq[Double])] = None,
                            timeline: Seq[(String, Double)] = Seq.empty,
                            loadJson: String = "",
                            hostJson: String = ""): Unit = {
    // emit name-sorted regardless of measurement order, so the qv
    // array stays aligned with alphabetical query names
    val results = unsorted.sortBy(_._1)
    val qs = results.map { case (k, r) => s""""$k":${r(1)}""" }.mkString("{", ",", "}")
    val spread = results.map { case (k, r) =>
      s""""$k":[${r.head},${r(1)},${r.last}]""" }.mkString("{", ",", "}")
    val total = results.map(_._2(1)).filter(_ >= 0).sum
    // a crashed query must be LOUD in the artifact, not a silent -1
    // dropped from the total
    val failed = results.collect { case (k, r) if r(1) < 0 => s""""$k"""" }
      .mkString("[", ",", "]")
    val sentinelJson = sentinel.map { case (name, first, last) =>
      s""""sentinel":{"query":"$name","first":[${first.mkString(",")}],""" +
        s""""last":[${last.mkString(",")}],"verdict":"${
          sentinelVerdict(first, last)}"},"""
    }.getOrElse("")
    // FULL artifact only (too long for the compact stdout line): the
    // mid-suite load timeline — single sentinel reads keyed by the
    // measurement-order key they preceded. Burst forensics: a gate
    // hit between two elevated reads is host, not code.
    val timelineJson =
      if (timeline.isEmpty) ""
      else timeline.map { case (k, v) => s""""$k":${fmt(v, 3)}""" }
        .mkString(""""sentinel_timeline":{""", ",", "},")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    // r-over-r drift column (r12 verdict item 10): per-key ratio of
    // this run's median to the PREVIOUS round's, read from the last
    // committed round-versioned full artifact. The full per-key table
    // goes in the FULL artifact; the compact stdout line carries a
    // BOUNDED summary (median ratio + named drifters past 1.5× with a
    // >0.2 s absolute swing) — a second 193-entry array would push the
    // line past the driver's 2000-char stdout tail and head-truncate
    // the JSON (the r7/r8 failure mode this split exists to avoid).
    val prev = previousRoundMedians(outPath)
    val vsPrevFull = prev.map { case (tag, pm) =>
      val ratios = results.flatMap { case (k, r) =>
        pm.get(k).filter(p => p > 0 && r(1) >= 0)
          .map(p => k -> r(1) / p) }
      val rj = ratios.map { case (k, x) => s""""$k":${fmt(x, 3)}""" }
        .mkString("{", ",", "}")
      (tag, ratios, s""""qv_vs_prev":{"vs":"$tag","ratios":$rj},""")
    }
    val vsPrevFullJson = vsPrevFull.map(_._3).getOrElse("")
    // HOST FACTOR (r16 verdict item 1): the median per-key ratio vs
    // the previous round IS the round's host-speed multiplier — code
    // changes move a handful of keys, a throttled (or freshly quiet)
    // host moves all 269 together. The r16 night ran 1.26-1.45×
    // slow and every raw number carried it; conversely a quiet r17
    // host reads ~0.7× against that inflated baseline and a real
    // 2.5× regression would hide below the 2.0× bar. The gate now
    // normalizes by this factor; raw ratios stay in qv_vs_prev for
    // transparency.
    val hostFactor = hostFactorOf(vsPrevFull.map(_._2).getOrElse(Seq.empty))
    val regressionsJson =
      s""""regressions":${regressionGate(results.toMap, prev, hostFactor = hostFactor)},"""
    // compact stdout carries a BOUNDED regression summary (count +
    // worst 10) — the full array is unbounded (a loaded-host round
    // could name most of the suite) and would head-truncate the
    // driver's 2000-char stdout tail, the r7/r8 failure the
    // compact/full split exists to avoid (r14 ADVICE item 1)
    val regressionsCompact =
      s""""regressions":${regressionGate(results.toMap, prev, cap = 10, hostFactor = hostFactor)},"""
    // harness-protocol marker (r17): passes are cold — the plan cache
    // is cleared before every timed pass, so keys whose builders
    // persist() (basket_rules, sparse_sim_topk) read higher than the
    // r16-and-earlier warm-pass medians by measurement change, not
    // plan change
    val full = s"""{"metric":"total","value":$total,"unit":"sec","cache_cleared_between_passes":true,$loadJson$hostJson$sentinelJson$timelineJson$vsPrevFullJson$regressionsJson"queries":$qs,"spread":$spread,"failed":$failed,"sf":"$sfDir"}"""
    writeText(outPath, full)
    // ALSO write a round-versioned copy so no round's per-query data
    // lives only in the git history of the overwritten BENCH_FULL:
    // the driver's round N run happens with BENCH_r{01..N-1}.json
    // already committed in cwd, so max+1 names the current round.
    // NEVER clobber an existing round-versioned artifact (r15: the
    // driver's post-close leg on a throttled host overwrote the
    // round's quiet committed BENCH_FULL_r15.json, poisoning the next
    // round's qv_vs_prev baseline with 16%-inflated medians) — a
    // re-run lands at {base}_rNN_rerunK.json and the gate's baseline
    // stays whatever the round first recorded.
    versionedCopy(outPath).foreach(p => writeText(nonClobbering(p), full))
    val qv = results.map { case (_, r) => fmt(r(1), 3) }.mkString("[", ",", "]")
    val vsPrevCompact = vsPrevFull.map { case (tag, ratios, _) =>
      val sortedR = ratios.map(_._2).sorted
      val med = if (sortedR.isEmpty) 1.0 else sortedR(sortedR.size / 2)
      val drifters = ratios.filter { case (k, x) =>
        val p = prev.get._2(k)
        (x > 1.5 || x < 1.0 / 1.5) && math.abs(results.toMap.apply(k)(1) - p) > 0.2
      }.sortBy(-_._2)
      val dj = drifters.map { case (k, x) => s""""$k":${fmt(x, 2)}""" }
        .mkString("{", ",", "}")
      s""""qv_vs_prev":{"vs":"$tag","n":${ratios.size},"median":${fmt(med, 3)},"drifters":$dj},"""
    }.getOrElse("")
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","n_queries":${results.size},"failed":$failed,$loadJson$sentinelJson$vsPrevCompact$regressionsCompact"queries_file":"$outPath","qv_sorted_by_name":$qv}""")
  }

  /** PER-KEY REGRESSION GATE (r13 verdict item 8, host-normalized
    * r17): names every key whose median exceeds 2× its previous-round
    * median AFTER dividing out the round's host factor, with a > 0.2 s
    * host-adjusted absolute swing, worst first. A non-empty list trips
    * the round-close checklist (interpret alongside the sentinel
    * verdict and timeline: a burst regresses a measurement-order
    * neighborhood, a real plan regression names one key on a quiet
    * run).
    *
    * `hostFactor` is the suite-median per-key ratio vs the previous
    * round ([[hostFactorOf]]) — the gate compares `ratio/hostFactor`
    * against 2.0 so neither a throttled baseline (r16: every number
    * ×1.26-1.45) nor a throttled current leg moves the bar; the RAW
    * ratio is what the `worst` entries print (transparency — the full
    * per-key raw table is in qv_vs_prev), and `host_factor` is echoed
    * in the gate object so a reader can reconstruct the normalized
    * value.
    *
    * Shape is UNCONDITIONALLY `{"n":N,"n_raw":M,"host_factor":H,
    * "worst":[...]}` (r15 ADVICE: the old plain-array-under-cap form
    * changed JSON type exactly on the many-regression rounds, breaking
    * array-indexing consumers when it mattered most). `n_raw` is the
    * UN-normalized count (hostFactor forced to 1.0) — the r17-ADVICE
    * tell for a suite-wide real regression the normalization would
    * hide: n=0 with a large n_raw and a clamped-at-bound host_factor
    * reads "everything moved", not "the host moved". `cap` bounds
    * `worst` (worst-first) for the compact stdout line; the FULL
    * artifact passes Int.MaxValue and keeps every entry; `n` always
    * carries the true count. */
  private[graft] def regressionGate(results: Map[String, Seq[Double]],
      prev: Option[(String, Map[String, Double])],
      cap: Int = Int.MaxValue, hostFactor: Double = 1.0): String = {
    val hf = if (hostFactor > 0) hostFactor else 1.0
    def hits(f: Double): Seq[(String, Double)] = prev.map { case (_, pm) =>
      results.toSeq.collect {
        case (k, r) if pm.get(k).exists(p =>
            p > 0 && r(1) >= 0 && r(1) / (p * f) > 2.0 &&
              r(1) - p * f > 0.2) =>
          k -> results(k)(1) / pm(k)
      }.sortBy(-_._2)
    }.getOrElse(Seq.empty)
    val all = hits(hf)
    val nRaw = if (hf == 1.0) all.size else hits(1.0).size
    val shown = all.take(cap)
      .map { case (k, x) => s"""{"$k":${fmt(x, 2)}}""" }
      .mkString("[", ",", "]")
    s"""{"n":${all.size},"n_raw":$nRaw,"host_factor":${fmt(hf, 3)},"worst":$shown}"""
  }

  /** Locale-fixed numeric formatting for JSON emission (r17 ADVICE):
    * the `f` interpolator follows the JVM default locale, so a
    * comma-decimal locale (fr_FR, de_DE) would print `1,005` and
    * corrupt every artifact this file writes. All JSON-bound
    * fixed-point numbers go through here. */
  private[graft] def fmt(d: Double, decimals: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f",
      java.lang.Double.valueOf(d))

  /** Suite-median per-key ratio vs the previous round = the host-speed
    * multiplier between the two legs' environments. Robust because a
    * code change moves a handful of keys while the host moves all of
    * them; the median ignores the changed tail in either direction.
    * Falls back to 1.0 (no normalization) when fewer than 20 keys are
    * comparable — a tiny overlap (subset bench, first round) can't
    * estimate the host.
    *
    * CLAMPED to [0.5, 2.0] (r17 ADVICE): a genuine broad regression —
    * a shared operator used by many keys, a session-conf change, a
    * measurement-protocol change — shifts the median itself, and an
    * unclamped factor would normalize the whole suite-wide slowdown
    * away (gate reads n=0 on a real 3× regression). Every host swing
    * observed on this box sits inside 0.7-1.45×; a median outside the
    * clamp is better read as "the code moved everything" and the gate
    * should fire. The raw gate count (`n_raw`, hostFactor 1.0) rides
    * alongside in the gate object for the same reason. */
  private[graft] def hostFactorOf(ratios: Seq[(String, Double)]): Double = {
    val xs = ratios.map(_._2).filter(x => x > 0 && !x.isNaN).sorted
    if (xs.size < 20) 1.0
    else math.max(0.5, math.min(2.0, xs(xs.size / 2)))
  }

  /** Host-load verdict from the two sentinel triples: `loaded` when the
    * medians drift past 1.5× with an absolute swing over 0.3 s (the
    * host got busier/quieter mid-suite), `noisy` when either triple's
    * own min→max spread exceeds 2× with a swing over 0.5 s (transient
    * contention during a sentinel window), `quiet` otherwise; `unknown`
    * if a sentinel run crashed. The thresholds sit well above the
    * ±15 % swing measured on this host for identical code. */
  private[graft] def sentinelVerdict(first: Seq[Double], last: Seq[Double]): String = {
    if (first.head < 0 || last.head < 0) return "unknown"
    val (m1, m2) = (first(1), last(1))
    val drift = math.max(m1, m2) / math.max(1e-9, math.min(m1, m2))
    val wideTriple = Seq(first, last).exists(r =>
      r.head > 0 && r.last / r.head > 2.0 && r.last - r.head > 0.5)
    if (drift > 1.5 && math.abs(m1 - m2) > 0.3) "loaded"
    else if (wideTriple) "noisy"
    else "quiet"
  }

  /** The previous round's per-query medians: the highest-numbered
    * committed `{base}_rNN.json` sibling of `outPath`, its `"queries"`
    * object parsed with a flat regex (keys are `[a-z0-9_]+`, values
    * plain decimals — the exact shape [[report]] writes; no JSON lib
    * needed for a format we own). None when no prior artifact exists
    * (round 1, or run outside the repo root). */
  private[graft] def previousRoundMedians(
      outPath: String): Option[(String, Map[String, Double])] = {
    val dot = outPath.lastIndexOf('.')
    val base = if (dot < 0) outPath else outPath.substring(0, dot)
    val name = new java.io.File(base).getName
    val re = (java.util.regex.Pattern.quote(name) + "_r(\\d+)\\.json").r
    val dir = Option(new java.io.File(outPath).getAbsoluteFile.getParentFile)
    val prior = dir.map(d => Option(d.listFiles()).toSeq.flatten).getOrElse(Seq())
      .flatMap(f => re.findFirstMatchIn(f.getName)
        .map(m => (m.group(1).toInt, f)))
    if (prior.isEmpty) return None
    val (nn, f) = prior.maxBy(_._1)
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      val qStart = txt.indexOf("\"queries\":{")
      if (qStart < 0) return None
      val qEnd = txt.indexOf('}', qStart)
      val body = txt.substring(qStart + "\"queries\":{".length, qEnd)
      val pairRe = """"([a-z0-9_]+)":(-?[0-9.eE+-]+)""".r
      val m = pairRe.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
      if (m.isEmpty) None else Some((f"r$nn%02d", m))
    } catch { case _: Throwable => None }
  }

  /** 1-minute loadavg from /proc/loadavg; -1 when unreadable (the
    * pre-flight then never blocks — a host without procfs just loses
    * the gate, not the bench). */
  private[graft] def loadavg1(): Double = try {
    new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")),
      java.nio.charset.StandardCharsets.UTF_8).split("\\s+")(0).toDouble
  } catch { case _: Throwable => -1.0 }

  /** Cumulative (totalJiffies, stealJiffies) from /proc/stat's
    * aggregate cpu line; None when unreadable. Steal is field 8 —
    * hypervisor preemption time, the one signal that can NEVER be the
    * bench's own load. */
  private[graft] def cpuTicks(): Option[(Long, Long)] = try {
    scala.io.Source.fromFile("/proc/stat").getLines()
      .find(_.startsWith("cpu ")).map { line =>
        val f = line.trim.split("\\s+").drop(1).map(_.toLong)
        (f.sum, if (f.length > 7) f(7) else 0L)
      }
  } catch { case _: Throwable => None }

  /** Count of OTHER processes currently runnable or in uninterruptible
    * IO (state R/D in /proc/<pid>/stat, own pid excluded) — a direct
    * co-tenant signal the loadavg cannot give once the bench itself
    * saturates the box. The state char is parsed after the LAST ')'
    * (comm may contain spaces/parens). -1 when /proc is unreadable. */
  private[graft] def runnableOther(): Int = try {
    val self = ProcessHandle.current().pid()
    Option(new java.io.File("/proc").listFiles()).toSeq.flatten.count { f =>
      val n = f.getName
      n.nonEmpty && n.forall(_.isDigit) && n.toLong != self && (try {
        val s = new String(java.nio.file.Files.readAllBytes(
          f.toPath.resolve("stat")), java.nio.charset.StandardCharsets.UTF_8)
        val st = s.charAt(s.lastIndexOf(')') + 2)
        st == 'R' || st == 'D'
      } catch { case _: Throwable => false })
    }
  } catch { case _: Throwable => -1 }

  /** One rich host-contention read (r18 verdict: the at-thirds raw
    * loadavg reads measured the bench's OWN load — local[32] drives
    * loadavg to 15-23 at 10× by design, so the block could not
    * distinguish "burst mid-suite" from "suite is running"). Each read
    * now also records what this JVM itself consumes (`jvm_cpu`,
    * process CPU share of all cores), the system-wide share
    * (`sys_cpu`) — their DIFFERENCE is the co-tenant share a reader
    * previously had to estimate ad hoc — plus `steal_pct` since the
    * previous read (delta-based; -1 on the first read) and the
    * other-runnable process count. Per-read detail goes in the FULL
    * artifact (the compact stdout line is already near the driver's
    * tail window and carries only a bounded max-summary in its
    * loadavg block). `prevTicks` threads the /proc/stat snapshot
    * between reads; returns (json, newTicks, stealPct, runnableOther). */
  private[graft] def hostRead(prevTicks: Option[(Long, Long)])
      : (String, Option[(Long, Long)], Double, Int) = {
    val (jvm, sysc) =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean =>
          (b.getProcessCpuLoad, b.getCpuLoad)
        case _ => (-1.0, -1.0)
      }
    val now = cpuTicks()
    val steal = (prevTicks, now) match {
      case (Some((t0, s0)), Some((t1, s1))) if t1 > t0 =>
        100.0 * (s1 - s0) / (t1 - t0)
      case _ => -1.0
    }
    val other = runnableOther()
    val json = s"""{"load1":${fmt(loadavg1(), 2)},"jvm_cpu":${fmt(jvm, 3)},""" +
      s""""sys_cpu":${fmt(sysc, 3)},"steal_pct":${fmt(steal, 3)},""" +
      s""""runnable_other":$other}"""
    (json, now, steal, other)
  }

  private def writeText(path: String, s: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** First non-existing variant of `path`: `path` itself when free,
    * else `{base}_rerun1.json`, `{base}_rerun2.json`, … — the
    * no-overwrite rule for round-versioned artifacts (see report). */
  private[graft] def nonClobbering(path: String): String = {
    if (!new java.io.File(path).exists()) return path
    val dot = path.lastIndexOf('.')
    val (base, ext) =
      if (dot < 0) (path, "") else (path.substring(0, dot), path.substring(dot))
    Iterator.from(1).map(k => s"${base}_rerun$k$ext")
      .find(p => !new java.io.File(p).exists()).get
  }

  /** `BENCH_FULL.json` → `Some("BENCH_FULL_rNN.json")` with NN = one
    * past the highest committed `BENCH_rNN.json` in cwd; None when no
    * round artifacts are visible (e.g. run outside the repo root). */
  private[graft] def versionedCopy(outPath: String): Option[String] = {
    val re = "BENCH_r(\\d+)\\.json".r
    val rounds = Option(new java.io.File(".").listFiles()).toSeq.flatten
      .flatMap(f => re.findFirstMatchIn(f.getName).map(_.group(1).toInt))
    if (rounds.isEmpty) None
    else {
      val tag = f"r${rounds.max + 1}%02d"
      val dot = outPath.lastIndexOf('.')
      Some(if (dot < 0) s"${outPath}_$tag" else
        s"${outPath.substring(0, dot)}_$tag${outPath.substring(dot)}")
    }
  }
}

/** Targeted bench for iteration: time only the named queries (args),
  * same warm-up/median-of-3/spread-retry protocol as [[Bench]].
  * `sbt "runMain graft.BenchSubset dedup_minhash_lsh dedup_clusters"`. */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    val picked = SparkEntry.queries.filter { case (k, _) => args.contains(k) }
    val missing = args.filterNot(picked.keySet)
    require(missing.isEmpty, s"unknown queries: ${missing.mkString(",")}")
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    picked.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").write.format("noop")
        .mode("overwrite").save()
      catch { case _: Throwable => }
    }
    val results = picked.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs = try {
        // cold passes, same protocol as Bench (see the clearCache note
        // there): persisted-plan reuse across passes must not turn the
        // median into a warm-cache read
        Seq.fill(3) {
          spark.catalog.clearCache()
          time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
        }.sorted
      } catch { case _: Throwable => Seq(-1.0, -1.0, -1.0) }
      name -> runs
    }
    results.foreach { case (k, r) =>
      println(f"""$k%-28s min=${r.head}%.3f median=${r(1)}%.3f max=${r.last}%.3f""") }
    spark.stop()
  }
}
