package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{AsOfJoin, RangeJoin}
import graft.sources.Tables

/** §2.B — relational / OLAP core. Every query is declarative
  * DataFrame algebra (Catalyst does pushdown / pruning / join
  * selection); money math is decimal-exact so the DuckDB oracle
  * hashes bit-identically (SURVEY §6).
  */
object RelationalQueries {

  import QueryMath.{avgDec2, dec2, sumDbl2, sumDbl6}
  private def one = lit(1).cast(DecimalType(3, 2))

  /** revenue := extprice * (1 - discount), exact decimal. */
  private def revenue =
    dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B1 — scan + filter + hash-agg, partial aggregation before the
    // single shuffle; decimal-exact money math.
    "q1_pricing" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2000-12-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumDbl2(col("l_quantity")).as("sum_qty"),
          sumDbl2(col("l_extendedprice")).as("sum_base_price"),
          sum(revenue).cast("double").as("sum_disc_price"),
          sum(revenue * (one + dec2(col("l_tax")))).cast("double").as("sum_charge"),
          avgDec2(col("l_quantity")).as("avg_qty"),
          avgDec2(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
    },

    // B2 — 3-way join, agg, top-N. customer⋈orders⋈lineitem shuffle on
    // their keys; top-10 is TakeOrderedAndProject (no global sort).
    "q3_shipping" -> { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d).filter(col("o_orderdate") < lit("1999-01-01"))
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1999-01-01"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(revenue).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    },

    // B3 — 6-table star join. region/nation are tiny → broadcast;
    // customer/orders/lineitem/supplier shuffle on their keys with AQE.
    "q5_supplier_volume" -> { (s, d) =>
      val r = broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA"))
      val n = broadcast(Tables.nation(s, d))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
                col("o_orderdate") < lit("1998-01-01"))
      Tables.customer(s, d)
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(sum(revenue).cast("double").as("revenue"))
    },

    // B35 — TPC-H Q10-style returned-item report: top-20 customers by
    // revenue lost to returns in one year. Filters push into both
    // fact scans (date on orders, returnflag on lineitem), nation
    // broadcasts, the fact chain shuffles under AQE, and the global
    // top-20 over the aggregated customer frame runs take-ordered
    // (revenue is a cast from the exact decimal sum, so the rank
    // order is engine-identical).
    "q10_returns" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val n = broadcast(Tables.nation(s, d))
      Tables.customer(s, d)
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
                  col("o_orderdate") < lit("1997-01-01")),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(revenue).cast("double").as("revenue"))
        .withColumn("rank", row_number()
          .over(Window.orderBy(col("revenue").desc, col("c_custkey").asc)).cast("long"))
        .filter(col("rank") <= 20)
    },

    // B36 — TPC-H Q6-style forecast revenue: the pure scan-filter-agg
    // whose entire predicate set (date range, discount band, quantity
    // cap) pushes into the parquet scan — zero joins, one partial-agg
    // shuffle of a single accumulator pair.
    "q6_forecast" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
                col("l_shipdate") < lit("1997-01-01") &&
                col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
                col("l_quantity") < 24)
        .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
            .cast("double").as("forecast_revenue"),
          count(lit(1)).as("n_items"))
    },

    // B37 — TPC-H Q18-style large-volume orders: the group-filter
    // SEMI-JOIN pattern — the HAVING-filtered per-order quantity
    // aggregate IS the join build side (post-aggregation it is orders
    // × one counter, and after the > threshold filter it is tiny, so
    // AQE broadcasts it back against the fact chain).
    "q18_big_orders" -> { (s, d) =>
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 250)
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"),
          col("o_totalprice").cast("double").as("o_totalprice"),
          col("total_qty"))
    },

    // B24 — TPC-H Q7-style bilateral trade volume: supplier nation ×
    // customer nation × ship year. Nation joins in twice under two
    // roles — both broadcast (dim-scale); the fact chain
    // lineitem⋈orders⋈customer⋈supplier shuffles on its keys with AQE.
    // supp < cust keeps one row per unordered nation pair.
    "q7_nation_volume" -> { (s, d) =>
      val n1 = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("s_nk"))
        .join(n2, col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation") < col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(revenue).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // B25 — distribution window functions, DISTRIBUTED (r14): quartile
    // bucketing + relative rank WITHOUT a per-status raw-row window.
    // o_orderstatus has THREE values, so Window.partitionBy(status)
    // sorts the whole orders table in ≤3 tasks at any data size — the
    // r13 bench measured the drift (10×/1× 3.9× → 6.8×, worst in the
    // suite). Replaced by the abc_classification two-level prefix:
    // $64-wide price-range bins make a (status, bin) frame whose
    // counts map-side combine into a tiny (statuses × ~9k bins)
    // offset table; cumulative offsets come back via broadcast, a
    // (status, bin)-partitioned row_number ranks locally, and global
    // rank = offset + local rank. The sort key (price, orderkey) is
    // unique so rank == row_number, and ntile/percent_rank/cume_dist
    // all derive from (rank, n) in closed form: ntile(4)'s first
    // n mod 4 buckets take ceil(n/4) rows (the standard allocation
    // both engines implement); pct/cume are single correctly-rounded
    // double divisions of exact integers — bit-exact on any engine.
    // Value-equality with the oracle's naive one-window form is the
    // rewrite's correctness proof.
    "window_ntile" -> { (s, d) =>
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        // INPUT CONTRACT (r15, ADVICE): the two-pass form ranks only
        // non-null prices — a null bin would silently miss the offset
        // join where the old single-window form still ranked the row.
        // o_totalprice is non-null in TPC-H, so this filter is free
        // (and pushed to the scan); on nullable data the drop is now
        // explicit and visible here, not an artifact of join nulls.
        .filter(col("o_totalprice").isNotNull)
        // $64-wide bins: ~26k (status, bin) rank groups — parallelism
        // scales with the price RANGE, not the row count, so the
        // broadcast offset table stays ~26k rows at any data size
        // while no task ever sorts more than rows-per-bin
        .withColumn("bin", floor(col("o_totalprice") / 64d).cast("long"))
      val wOff = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("bin").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.partitionBy(col("o_orderstatus"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      // bin-count frame: ≤ |statuses|·|bins| rows — the only windows
      // ordered per status alone run over THIS frame, never raw orders
      val offs = o.groupBy(col("o_orderstatus"), col("bin"))
        .agg(count(lit(1)).as("bc"))
        .withColumn("off", coalesce(sum(col("bc")).over(wOff), lit(0L)))
        .withColumn("n", sum(col("bc")).over(wAll))
        .select(col("o_orderstatus"), col("bin"), col("off"), col("n"))
      val wLoc = Window.partitionBy(col("o_orderstatus"), col("bin"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      o.join(broadcast(offs), Seq("o_orderstatus", "bin"))
        .withColumn("rank", col("off") + row_number().over(wLoc))
        .select(
          col("o_orderkey").as("order_key"),
          col("o_orderstatus").as("status"),
          expr("""CAST(CASE
              WHEN rank <= (n div 4 + 1) * (n % 4)
                THEN (rank - 1) div (n div 4 + 1) + 1
              ELSE n % 4 + (rank - (n div 4 + 1) * (n % 4) - 1)
                     div (n div 4) + 1
            END AS BIGINT)""").as("quartile"),
          expr("CASE WHEN n > 1 THEN CAST(rank - 1 AS DOUBLE) /" +
            " CAST(n - 1 AS DOUBLE) ELSE 0.0D END").as("pct_rank"),
          expr("CAST(rank AS DOUBLE) / CAST(n AS DOUBLE)").as("cume"))
    },

    // B30 — fuzzy entity matching: probe names (every 97th customer,
    // one character dropped — a typo'd lookup list) matched against
    // the customer table within Levenshtein distance 2, via
    // operators.Fuzzy.editDistanceJoin: symmetric-delete blocking
    // (recall 1 by the SymSpell property) + threshold-capped verify.
    // NOT a cross join — the 10× sweep measured the nested-loop form
    // at 47× cost when both sides grow; the blocked join's key
    // generation is constant per row and candidates track only
    // genuinely-similar pairs, so it scales with data, not data².
    "fuzzy_match" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val probe = c.filter(col("c_custkey") % 97 === 0)
        .select(col("c_custkey").as("pk"),
          concat(substring(col("c_name"), 1, 9),
            expr("substring(c_name, 11)")).as("pn"))
      graft.operators.Fuzzy.editDistanceJoin(
          Tables.fanOut(c.select(col("c_custkey"), col("c_name"))),
          "c_custkey", "c_name", probe, "pk", "pn", maxDist = 2)
        .select(col("probe_id").as("probe_key"),
          col("probe_text").as("probe_name"),
          col("match_id").as("match_key"),
          col("match_text").as("match_name"),
          col("dist").cast("int").as("dist"))
    },

    // B31 — time-hierarchy ROLLUP: revenue totals at
    // year → quarter → month grain plus the grand total, one Expand
    // pass over lineitem (the calendar sibling of rollup_agg's
    // categorical hierarchy).
    "time_rollup" -> { (s, d) =>
      // the 4× Expand + decimal partial agg is CPU-bound — fan out the
      // single-row-group local scan so it runs on every core
      val l = Tables.fanOut(Tables.lineitem(s, d))
      l.rollup(year(col("l_shipdate")).cast("long").as("y"),
          quarter(col("l_shipdate")).cast("long").as("q"),
          month(col("l_shipdate")).cast("long").as("m"))
        .agg(sum(revenue).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // B4 — global top-K: TakeOrderedAndProject keeps K per partition
    // then merges on the driver — no full sort, no single-node shuffle.
    "topn_orders" -> { (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select(col("o_orderkey").as("order_key"),
          col("o_totalprice").as("total_price"),
          col("o_orderdate").as("order_date"))
    },

    // B5 — left-semi (EXISTS) + left-anti (NOT EXISTS), tagged union.
    "semi_anti_join" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val semi = c.join(o.filter(col("o_orderstatus") === "F"),
          c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey").as("cust_key"), col("c_name").as("cust_name"),
          lit("has_f_order").as("tag"))
      val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey").as("cust_key"), col("c_name").as("cust_name"),
          lit("no_orders").as("tag"))
      semi.unionByName(anti)
    },

    // B6 — scalar + IN subqueries on the SQL surface (Catalyst rewrites
    // the IN to a left-semi and the scalar to a broadcast subquery).
    "scalar_subquery" -> { (s, d) =>
      Tables.part(s, d).createOrReplaceTempView("part")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT p_partkey AS part_key, p_name AS part_name,
               p_retailprice AS retail_price
        FROM part
        WHERE p_retailprice > (SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                                      / count(*) FROM part)
          AND p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45)
      """)
    },

    // B7 — ROLLUP hierarchy totals in one pass (Expand + single agg).
    "rollup_agg" -> { (s, d) =>
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sumDbl2(col("o_totalprice")).as("total_price"))
    },

    // B8 — window functions: top-3 orders per customer; rank shares
    // place on price ties, row_number breaks them by key.
    "window_rank" -> { (s, d) =>
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      val priceOnly = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(byPrice))
        .withColumn("rnk", rank().over(priceOnly))
        .filter(col("rn") <= 3)
        .select(col("o_custkey").as("cust_key"), col("o_orderkey").as("order_key"),
          col("o_totalprice").as("total_price"),
          col("rn"), col("rnk"))
    },

    // B9 — UNION / INTERSECT / EXCEPT (distinct semantics), tagged.
    "set_ops" -> { (s, d) =>
      val cn = Tables.customer(s, d).select(col("c_nationkey").as("nation_key"))
      val sn = Tables.supplier(s, d).select(col("s_nationkey").as("nation_key"))
      cn.union(sn).distinct().withColumn("op", lit("union"))
        .unionByName(cn.intersect(sn).withColumn("op", lit("intersect")))
        .unionByName(cn.except(sn).withColumn("op", lit("except")))
    },

    // B10 — pivot: one shuffle, statuses become columns.
    "pivot_agg" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("priority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(dec2(col("o_totalprice"))).cast("double"))
        .withColumnRenamed("F", "total_f")
        .withColumnRenamed("O", "total_o")
        .withColumnRenamed("P", "total_p")
    },

    // B11 — as-of join: each event picks the customer's latest order
    // at or before the event time; same-date orders resolve to the
    // max orderkey inside the as-of window — ONE shuffle total.
    "asof_join" -> { (s, d) =>
      AsOfJoin.leftAsOf(
        Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts")),
        Tables.orders(s, d),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate",
        payload = Seq("o_orderkey", "o_totalprice"),
        rightTieBreak = Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("o_orderkey").as("order_key"),
          col("o_totalprice").as("order_total"))
    },

    // B46 — FORWARD as-of join: each event picks the customer's
    // EARLIEST order at or after the event time (what-happened-next);
    // same-date orders resolve to the min orderkey. Identical
    // single-shuffle union+running-last plan as B11, sort direction
    // flipped.
    "asof_forward" -> { (s, d) =>
      AsOfJoin.leftAsOfForward(
        Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts")),
        Tables.orders(s, d),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate",
        payload = Seq("o_orderkey", "o_totalprice"),
        rightTieBreak = Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("o_orderkey").as("order_key"),
          col("o_totalprice").as("order_total"))
    },

    // B47 — RANGE-frame trailing window: per customer, each order's
    // trailing-30-day revenue (order value sum over the preceding 30
    // days INCLUDING the current instant) — the moving-aggregate
    // feature ROWS frames can't express when event spacing is uneven.
    // One shuffle on the customer key; the frame bound is evaluated on
    // epoch seconds so both engines cut the identical row set; the sum
    // is decimal-exact before the final double cast.
    "range_frame_total" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(unix_timestamp(col("o_orderdate")))
        .rangeBetween(-30L * 86400, 0)
      Tables.orders(s, d).select(
        col("o_orderkey").as("order_key"),
        col("o_custkey").as("cust_key"),
        col("o_orderdate").as("order_date"),
        sum(dec2(col("o_totalprice"))).over(w).cast("double")
          .as("trailing_30d"),
        count(lit(1)).over(w).as("n_orders_30d"))
    },

    // B12 — range join: events within 10 minutes after each error
    // event of the same user; bucketed equi-join, no cross product.
    "range_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_event_id"), col("user_id").as("err_user"),
          col("ts").as("t0"), (col("ts") + expr("INTERVAL 10 MINUTES")).as("t1"))
      RangeJoin.pointInInterval(
        ev.select(col("user_id"), col("ts"), col("value")),
        err, pointKey = "user_id", intervalKey = "err_user",
        ptTs = "ts", startTs = "t0", endTs = "t1", bucketWidthSec = 600)
        .groupBy(col("err_event_id"), col("err_user").as("user_id"))
        .agg(count(lit(1)).as("n_in_window"), sumDbl6(col("value")).as("sum_value"))
    },

    // B61 — PARETO FRONT (2-D skyline): the parts no other part
    // dominates (size ≥, price ≤, strict somewhere) — the
    // multi-objective shortlist operator ("cheapest at every capacity
    // tier") behind build-vs-buy dashboards. NOT the quadratic
    // dominance join: a part is on the front iff it is cheapest AT
    // its size and strictly cheaper than every strictly-larger size's
    // cheapest — so ONE map-side-combined (size → min price) agg,
    // one running-min walk over the DISTINCT-SIZE frame (bounded by
    // the size vocabulary, ~50 rows at any corpus scale — the
    // vocab-window contract; never a window over raw parts), and one
    // broadcast join back. The ORACLE is the O(n²) NOT EXISTS
    // dominance definition itself — independent formulation, same
    // frame. Equal (size, price) twins are mutually non-dominating:
    // both stay, both engines.
    "pareto_front" -> { (s, d) =>
      val p = Tables.part(s, d)
        .select(col("p_partkey"), col("p_size").cast("long").as("p_size"),
          col("p_retailprice").cast(DecimalType(18, 2)).as("price"))
      val minp = p.groupBy(col("p_size")).agg(min(col("price")).as("minp"))
      val strictlyLarger = Window.orderBy(col("p_size").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val front = minp
        .withColumn("prevmin", min(col("minp")).over(strictlyLarger))
        .filter(col("prevmin").isNull || col("minp") < col("prevmin"))
        .select(col("p_size"), col("minp").as("price"))
      p.join(broadcast(front), Seq("p_size", "price"))
        // dominance compared in exact decimals; final cast to double
        // only for the cross-engine rendering (the suite convention)
        .select(col("p_partkey"), col("p_size"),
          col("price").cast("double").as("price"))
    },

    // B13 — exact distinct aggregation (Spark expands to a two-phase
    // agg; distinct keys shuffle once).
    "distinct_agg" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          sumDbl6(col("value")).as("sum_value"))
    },

    // B14 — sketches (HLL++, KLL-style quantiles): constant memory per
    // group at any scale. Sketch INTERNALS are engine-specific, so the
    // value-level contract is emitted instead of the sketch outputs:
    // each engine computes its own sketch AND its own exact answer,
    // and publishes booleans asserting the documented error bound —
    // |HLL − exact|·10⁴ ≤ 500·exact (rsd 0.01 → the bound is 5σ), and
    // the approx percentile's RANK COVERAGE (#values ≤ p̂) within
    // ±500 bp of target (p95 upper margin to 9800 bp: disc-value rank
    // granularity at small groups). A drifting sketch flips its
    // boolean on that engine only → hash mismatch → caught. All
    // comparisons are integer multiplications (no division, no
    // floats): count·10⁴ stays < 2⁶³ up to ~10¹⁵ events per group.
    // Scale posture: two scans of events + a per-group broadcast join
    // (groups are the event-type vocabulary, tiny); OperatorSpec keeps
    // the direct numeric-tolerance assertion on the sketch values.
    "approx_sketch" -> { (s, d) =>
      val ev = Tables.events(s, d).select(col("event_type"), col("user_id"), col("value"))
      // The exact distinct count runs as its OWN aggregate: fusing
      // countDistinct with the sketch aggs makes Spark's
      // single-distinct rewrite key the partial aggregate by
      // (event_type, user_id), building and merging one
      // 10000-accuracy QuantileSummaries buffer PER USER instead of
      // per group — measured 17x slower at sf0.1. Split, the sketch
      // agg is one map-side-combined pass per group and the distinct
      // pass carries no buffers; the join frames are group-vocabulary
      // sized.
      val sketch = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          approx_count_distinct(col("user_id"), 0.01).as("au"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50a"),
          percentile_approx(col("value"), lit(0.95), lit(10000)).as("p95a"))
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      val sk = sketch.join(exact, "event_type")
      val rk = ev.join(broadcast(sk.select("event_type", "p50a", "p95a")), "event_type")
        .groupBy(col("event_type"))
        .agg(sum(when(col("value") <= col("p50a"), 1L).otherwise(0L)).as("le50"),
          sum(when(col("value") <= col("p95a"), 1L).otherwise(0L)).as("le95"))
      sk.join(rk, "event_type").select(
        col("event_type"), col("n_users"), col("n_events"),
        (abs(col("au") - col("n_users")) * 10000 <= col("n_users") * 500).as("hll_within_bp"),
        (col("le50") * 10000 >= col("n_events") * 4500 &&
          col("le50") * 10000 <= col("n_events") * 5500).as("p50_within_bound"),
        (col("le95") * 10000 >= col("n_events") * 9000 &&
          col("le95") * 10000 <= col("n_events") * 9800).as("p95_within_bound"))
    })

  private val Rev =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  val oracles: Map[String, String] = Map(
    // B61: the O(n²) dominance definition — deliberately NOT the
    // engine's sorted-walk plan, so the skyline semantics themselves
    // are what's cross-checked.
    "pareto_front" -> """
      WITH p AS (
        SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
               CAST(p_retailprice AS DECIMAL(18,2)) AS price
        FROM part)
      SELECT x.p_partkey, x.p_size, CAST(x.price AS DOUBLE) AS price FROM p x
      WHERE NOT EXISTS (
        SELECT 1 FROM p y
        WHERE y.p_size >= x.p_size AND y.price <= x.price
          AND (y.p_size > x.p_size OR y.price < x.price))""",

    // B14: each engine checks its OWN sketches against its OWN exact
    // answers and publishes the bound booleans — the sketch values
    // themselves are engine-specific and never cross the compare.
    // Integer-multiplication comparisons only (no division, no
    // floats); CAST around DuckDB's sum→HUGEINT.
    "approx_sketch" -> """
      WITH sk AS (
        SELECT event_type,
               count(DISTINCT user_id) AS n_users,
               count(*) AS n_events,
               approx_count_distinct(user_id) AS au,
               approx_quantile(value, 0.5) AS p50a,
               approx_quantile(value, 0.95) AS p95a
        FROM events GROUP BY 1),
      rk AS (
        SELECT e.event_type,
               CAST(sum(CASE WHEN e.value <= sk.p50a THEN 1 ELSE 0 END) AS BIGINT) AS le50,
               CAST(sum(CASE WHEN e.value <= sk.p95a THEN 1 ELSE 0 END) AS BIGINT) AS le95
        FROM events e JOIN sk ON e.event_type = sk.event_type
        GROUP BY 1)
      SELECT sk.event_type, n_users, n_events,
             abs(au - n_users) * 10000 <= n_users * 500 AS hll_within_bp,
             le50 * 10000 BETWEEN n_events * 4500 AND n_events * 5500 AS p50_within_bound,
             le95 * 10000 BETWEEN n_events * 9000 AND n_events * 9800 AS p95_within_bound
      FROM sk JOIN rk ON sk.event_type = rk.event_type""",

    "q10_returns" -> s"""
      WITH agg AS (
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST(sum($Rev) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
                      JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY 1, 2, 3, 4)
      SELECT c_custkey, c_name, c_acctbal, n_name, revenue,
             CAST(row_number() OVER (ORDER BY revenue DESC, c_custkey) AS BIGINT) AS rank
      FROM agg QUALIFY rank <= 20""",

    "q18_big_orders" -> """
      SELECT c_name, c_custkey, o_orderkey, o_orderdate,
             CAST(o_totalprice AS DOUBLE) AS o_totalprice, total_qty
      FROM customer JOIN orders ON c_custkey = o_custkey
           JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
                 FROM lineitem GROUP BY 1
                 HAVING sum(l_quantity) > 250) b
             ON o_orderkey = b.l_orderkey""",

    "q6_forecast" -> """
      SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS forecast_revenue,
             CAST(count(*) AS BIGINT) AS n_items
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",

    "q1_pricing" -> s"""
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(sum($Rev) AS DOUBLE) AS sum_disc_price,
             CAST(sum($Rev * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
             count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      GROUP BY 1, 2""",

    "q3_shipping" -> s"""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
             CAST(sum($Rev) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
      GROUP BY 1, 2, 3
      ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",

    "q5_supplier_volume" -> s"""
      SELECT n_name AS nation, CAST(sum($Rev) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON o_orderkey = l_orderkey
                    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1""",

    "q7_nation_volume" -> s"""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(sum($Rev) AS DOUBLE) AS revenue,
             count(*) AS n_lines
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name < n2.n_name
      GROUP BY 1, 2, 3""",

    "window_ntile" -> """
      SELECT o_orderkey AS order_key, o_orderstatus AS status,
             CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             percent_rank() OVER w AS pct_rank,
             cume_dist() OVER w AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus
                   ORDER BY o_totalprice ASC, o_orderkey ASC)""",

    "fuzzy_match" -> """
      WITH probe AS (
        SELECT c_custkey AS probe_key,
               substr(c_name, 1, 9) || substr(c_name, 11) AS probe_name
        FROM customer WHERE c_custkey % 97 = 0)
      SELECT probe_key, probe_name, c_custkey AS match_key,
             c_name AS match_name,
             CAST(levenshtein(c_name, probe_name) AS INT) AS dist
      FROM customer CROSS JOIN probe
      WHERE levenshtein(c_name, probe_name) <= 2""",

    "time_rollup" -> s"""
      SELECT CAST(year(l_shipdate) AS BIGINT) AS y,
             CAST(quarter(l_shipdate) AS BIGINT) AS q,
             CAST(month(l_shipdate) AS BIGINT) AS m,
             CAST(sum($Rev) AS DOUBLE) AS revenue,
             count(*) AS n_lines
      FROM lineitem
      GROUP BY ROLLUP (year(l_shipdate), quarter(l_shipdate), month(l_shipdate))""",

    "topn_orders" -> """
      SELECT o_orderkey AS order_key,
             o_totalprice AS total_price,
             o_orderdate AS order_date
      FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""",

    "semi_anti_join" -> """
      SELECT c_custkey AS cust_key, c_name AS cust_name, 'has_f_order' AS tag
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      UNION ALL
      SELECT c_custkey, c_name, 'no_orders'
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",

    "scalar_subquery" -> """
      SELECT p_partkey AS part_key, p_name AS part_name,
             p_retailprice AS retail_price
      FROM part
      WHERE p_retailprice > (SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                                    / count(*) FROM part)
        AND p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45)""",

    "rollup_agg" -> """
      SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",

    "window_rank" -> """
      SELECT cust_key, order_key, total_price, rn, rnk FROM (
        SELECT o_custkey AS cust_key, o_orderkey AS order_key,
               o_totalprice AS total_price,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
               rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk
        FROM orders) WHERE rn <= 3""",

    "set_ops" -> """
      SELECT nation_key, 'union' AS op FROM (
        SELECT c_nationkey AS nation_key FROM customer
        UNION SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT nation_key, 'intersect' FROM (
        SELECT c_nationkey AS nation_key FROM customer
        INTERSECT SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT nation_key, 'except' FROM (
        SELECT c_nationkey AS nation_key FROM customer
        EXCEPT SELECT s_nationkey FROM supplier)""",

    "pivot_agg" -> """
      SELECT o_orderpriority AS priority,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'F') AS DOUBLE) AS total_f,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'O') AS DOUBLE) AS total_o,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'P') AS DOUBLE) AS total_p
      FROM orders GROUP BY 1""",

    "asof_join" -> """
      WITH o2 AS (
        SELECT * FROM (
          SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                    ORDER BY o_orderkey DESC) AS rn
          FROM orders) WHERE rn = 1)
      SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS order_key,
             o.o_totalprice AS order_total
      FROM events e ASOF LEFT JOIN o2 o
        ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""",

    // Forward as-of via min-of-struct over the future-restricted join
    // (DuckDB 1.0's ASOF only implements the backward direction):
    // lexicographic min of (date, key, price) = earliest date, then
    // smallest orderkey — exactly the engine's tie-break.
    "asof_forward" -> """
      |WITH j AS (
      |  SELECT e.event_id, e.user_id, e.ts,
      |         min({'d': o.o_orderdate, 'k': o.o_orderkey,
      |              'p': o.o_totalprice}) AS m
      |  FROM events e LEFT JOIN orders o
      |    ON e.user_id = o.o_custkey AND o.o_orderdate >= e.ts
      |  GROUP BY 1, 2, 3)
      |SELECT event_id, user_id, ts,
      |       m['k'] AS order_key, m['p'] AS order_total
      |FROM j""".stripMargin,

    "range_frame_total" -> """
      |SELECT o_orderkey AS order_key, o_custkey AS cust_key,
      |       o_orderdate AS order_date,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_30d,
      |       CAST(count(*) OVER w AS BIGINT) AS n_orders_30d
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
      |             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)""".stripMargin,

    "range_join" -> """
      SELECT e1.event_id AS err_event_id, e1.user_id,
             count(*) AS n_in_window,
             CAST(sum(CAST(e2.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events e1 JOIN events e2
        ON e1.user_id = e2.user_id
       AND e2.ts >= e1.ts AND e2.ts < e1.ts + INTERVAL 10 MINUTE
      WHERE e1.event_type = 'error'
      GROUP BY 1, 2""",

    "distinct_agg" -> """
      SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1""")
}
