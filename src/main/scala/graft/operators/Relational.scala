package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Relational analytics suite — the generalized engine surface (SURVEY §2.2).
  *
  * The reference engine's only relational primitives are hash-partitioned
  * grouped aggregation + final sort (core/map_reduce.go, master/main.go:292);
  * this module provides the full declarative surface a user of a
  * MapReduce-style engine would hand-roll: filters, joins of every flavor,
  * windows, rollups, unions, subqueries — all as Catalyst plans so pushdown,
  * join-reordering, broadcast selection and AQE apply.
  *
  * Oracle discipline (SURVEY §4): double aggregates are computed per-row in
  * IEEE double (deterministic in both engines), summed exactly as
  * DECIMAL(28,10) (order-independent), and emitted as DOUBLE — so results
  * hash-match DuckDB bit-for-bit regardless of partitioning/parallelism.
  *
  * Scale notes: every query keeps filters above the scan (pushdown), joins
  * fact tables on shuffle keys only, and lets small dims broadcast (Spark
  * auto-broadcasts below the threshold; at 100 TB the dims here —
  * region/nation/supplier/part/customer — remain broadcast-able or become
  * bucketed tables).
  */
object Relational {

  // exact cross-engine sums (oracle discipline §4) — see Compat
  import Compat.{osum, xsum}
  private val ONE = lit(1.0)

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1 shape: multi-key grouped aggregation with map-side combine. */
  def q1Agg: Q = (s, d) =>
    // CPU-floored (r16): four exact-decimal sum chains per row make
    // this the one scan-agg whose map stage is compute-bound (measured
    // 1.54 → 0.89 s; its cheap siblings q6/q18 measured flat-to-worse
    // and stay unfloored) — see [[graft.Tables.cpuFloored]]
    graft.Tables.cpuFloored(Tables.lineitem(s, d))
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        xsum(col("l_quantity")).as("sum_qty"),
        xsum(col("l_extendedprice")).as("sum_base_price"),
        xsum(col("l_extendedprice") * (ONE - col("l_discount"))).as("sum_disc_price"),
        xsum(col("l_extendedprice") * (ONE - col("l_discount")) * (ONE + col("l_tax"))).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Selection + projection — predicates and column pruning reach the scan. */
  def q2Filter: Q = (s, d) =>
    Tables.part(s, d)
      .where(col("p_type") === "PROMO" && col("p_size").between(10, 25))
      .select("p_partkey", "p_name", "p_brand", "p_retailprice")
      .orderBy("p_partkey")

  /** TPC-H Q3 shape: 3-way join + agg + top-N, read from the BUCKETED
    * fact layout (Sinks.bucketedFactTables): lineitem and orders are
    * co-bucketed on the order key, so the fact-fact join plans ZERO
    * exchanges on either input — the shuffle was paid once at write. The
    * filtered customer dim broadcasts EXPLICITLY so the custkey join
    * cannot re-partition orders and destroy its bucket partitioning; the
    * downstream group-by keys include l_orderkey, so the aggregation
    * inherits the join's partitioning exchange-free too, and the top-N is
    * a TakeOrdered. Net: zero shuffle exchanges in the whole plan
    * (asserted in PlanShapeSpec). */
  def q3Join: Q = (s, d) => {
    val (li0, ord0) = graft.sinks.Sinks.bucketedFactTables(s, d)
    val cust = Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
    val ord  = ord0.where(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val li   = li0.where(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
    broadcast(cust).join(ord, col("c_custkey") === col("o_custkey"))
      .join(li.hint("merge"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(xsum(col("l_extendedprice") * (ONE - col("l_discount"))).as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** EXISTS → left-semi join (TPC-H Q4 shape). */
  def q4Semijoin: Q = (s, d) => {
    val bigLines = Tables.lineitem(s, d).where(col("l_quantity") >= 48).select("l_orderkey")
    Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
             col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q5 shape: star join over all six relational tables. */
  def q5Multijoin: Q = (s, d) => {
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(s, d),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "ASIA" &&
             col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
             col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy("n_name")
      .agg(xsum(col("l_extendedprice") * (ONE - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q6 shape: scan-heavy filtered aggregate — pure pushdown test. */
  def q6ScanAgg: Q = (s, d) =>
    Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
             col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
             col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(xsum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  /** NOT EXISTS → left-anti join: customers with no recent orders. */
  def q7Antijoin: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_cust"))
      .orderBy("c_mktsegment")

  /** Window function: top order per customer (rank-in-partition). */
  def q8Window: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .where(col("rn") === 1).drop("rn")
      .orderBy("o_custkey")
  }

  /** ROLLUP: hierarchical aggregation nation → order status. */
  def q9Rollup: Q = (s, d) =>
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), xsum(col("o_totalprice")).as("total"))
      .orderBy(col("n_name").asc_nulls_first, col("o_orderstatus").asc_nulls_first)

  /** CUBE: all grouping-set combinations of (mktsegment, orderstatus). */
  def q23Cube: Q = (s, d) =>
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), xsum(col("o_totalprice")).as("total"))
      .orderBy(col("c_mktsegment").asc_nulls_first, col("o_orderstatus").asc_nulls_first)

  /** PIVOT: per-day event-type counts as columns (explicit value list —
    * the deterministic form; an open pivot would scan for values first). */
  def q24Pivot: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", Seq("view", "click", "purchase"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("view", "click", "purchase"))
      .orderBy("day")

  /** UNPIVOT / melt (`q42_unpivot`) — the inverse of [[q24Pivot]],
    * closing the reshape pair: the per-day (view, click, purchase)
    * count COLUMNS melt back into (day, event_type, n) ROWS via
    * Spark's native `unpivot` (plans as an Expand — map-only ×3
    * fan-out, no shuffle beyond the pivot's own). Composing the two
    * gates round-tripping: unpivot(pivot(x)) must equal the plain
    * groupBy — which is exactly what the oracle computes, so
    * result-identity machine-checks the inverse law (zero-filled cells
    * drop on the way back, mirroring rows that never existed). */
  def q42Unpivot: Q = (s, d) => {
    val wide = Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", Seq("view", "click", "purchase"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("view", "click", "purchase"))
    wide.unpivot(Array(col("day")),
        Array(col("view"), col("click"), col("purchase")),
        "event_type", "n")
      .where(col("n") > 0)
      .orderBy("day", "event_type")
  }

  /** EAGER AGGREGATION / aggregate pushdown (`q43_eageragg`) — the
    * classic "push the aggregate below the join" rewrite (Yan & Larson,
    * VLDB 1995; the groupjoin literature): revenue per nation computed
    * by collapsing lineitem to per-ORDER partial sums FIRST, re-rolling
    * to per-customer after the orders join, to per-nation after the
    * customer join — each join's probe side is the already-aggregated
    * frame, never the raw fact. Catalyst does not apply this rewrite
    * itself (it only splits aggregates into partial/final around one
    * shuffle); the l_orderkey pre-aggregation's hash partitioning is
    * REUSED by the orders equi-join (co-partitioned, no second
    * lineitem-sized exchange).
    *
    * MEASURED HONESTLY ([[graft.EagerStress]], 100×, result-identity
    * asserted): on THIS query the rewrite LOSES — flat 5.9-15.3 s warm
    * vs eager 17-57 s. The reason is instructive: the final aggregate
    * has 25 groups, so the flat plan's map-side combine already
    * collapses every task's output to 25 rows and its joins are what
    * AQE makes of them — while the eager form pays a 15 M-distinct-key
    * hash aggregate (≈4 rows/key: partial aggregation buys almost
    * nothing at that cardinality, and the aggregation map spills)
    * before any join shrinks. Yan & Larson's own applicability
    * condition says exactly this: eager aggregation pays off when the
    * pre-aggregation's reduction factor is large and the final
    * grouping is NOT already collapse-friendly — q1-style tiny-group
    * rollups over equi-joined facts are the rewrite's WORST case, kept
    * here (like `q20_salted`) as a measured mechanism demo with the
    * boundary documented: do not copy this plan for low-cardinality
    * rollups; reach for it when the per-key fan-in is 100:1+ or the
    * join multiplies rows.
    *
    * Cross-engine determinism: partial sums stay UNROUNDED exact
    * DECIMAL(28,10) through every regrouping level (decimal addition is
    * associative/commutative — regrouping cannot change the total);
    * only the final per-nation value rounds to 2dp and casts to double,
    * which is exactly [[Compat.xsum]]'s contract, so the three-level
    * eager tree is result-identical to the oracle's one flat join-agg
    * (the gate machine-checks the rewrite's correctness, not a mirrored
    * construction). */
  def q43EagerAgg: Q = (s, d) => {
    import org.apache.spark.sql.types.DecimalType
    val perOrder = Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(sum((col("l_extendedprice") * (ONE - col("l_discount")))
        .cast(DecimalType(28, 10))).as("ord_rev"))
    val perCust = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      .join(perOrder, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_custkey").agg(sum("ord_rev").as("cust_rev"))
    val perNation = perCust
      .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey").agg(sum("cust_rev").as("nat_rev"))
    perNation
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        col("nat_rev").cast(DecimalType(28, 2)).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** EAGER AGGREGATION IN ITS WINNING REGIME (`q45_eagermult`, r9) —
    * the other side of `q43_eageragg`'s measured boundary: per
    * order-priority, the total event value and event-order pair count
    * of each order's customer — a ROW-MULTIPLYING fact-to-fact join
    * (events ⋈ orders on the customer key: ~67 events × ~10 orders per
    * customer ⇒ ~1 M pairs at sf0.1, ~100 M at 100×, from two ≤600 k
    * inputs). Exactly Yan & Larson's applicability condition, both
    * halves: the pre-aggregation's reduction factor is HUGE (events
    * collapse 67:1 to one row per user before the join) and the join
    * MULTIPLIES rows (so the flat plan's shuffle+CPU scale with the
    * pair count, not the input count).
    *
    * Eager tree: events → per-user (sum, count) [map-side combine
    * collapses each task to ≈ distinct-users rows — the high fan-in is
    * what q43's 4-rows/key l_orderkey pre-agg lacked]; the per-user
    * frame then BROADCASTS to orders (users ≪ orders ≪ pairs), and the
    * final 5-group rollup is one combine-friendly pass over |orders|
    * rows. The multiplied pair set is never materialized anywhere.
    * Measured ([[graft.EagerStress]] `--mult`, 100×, warm min-of-2,
    * result-identity asserted): eager 3.0 s vs flat 6.3 s — a 2.1×
    * win where q43's shape LOSES 3-4× on the same machine, so the
    * Yan-Larson boundary now has both sides measured. (The gap is 2×,
    * not 10×: the flat form never materializes its ~100 M pairs — the
    * join streams them straight into a 5-group combine — so the
    * multiplied CPU, not shuffle bytes, is the whole difference.)
    * At user counts past broadcast range the per-user frame
    * instead co-partitions with orders on the customer key (both sides
    * shuffle |users| + |orders| rows — still never |pairs|).
    *
    * Determinism: per-event values cast to DECIMAL(28,10) BEFORE any
    * sum; regrouping Σ_pairs ≡ Σ_orders Σ_user-events is exact decimal
    * associativity (q43's argument); the pair count is Σ ev_n — exact
    * integers. Final round(2)+double is [[Compat.xsum]]'s contract. */
  def q45EagerMult: Q = (s, d) => {
    import org.apache.spark.sql.types.DecimalType
    val perUser = Tables.events(s, d).groupBy("user_id")
      .agg(sum(col("value").cast(DecimalType(28, 10))).as("ev_sum"),
        count(lit(1)).as("ev_n"))
    Tables.orders(s, d).select("o_custkey", "o_orderpriority")
      .join(broadcast(perUser), col("o_custkey") === col("user_id"))
      .groupBy("o_orderpriority")
      .agg(sum("ev_sum").as("dec_sum"), sum("ev_n").as("n_pairs"))
      .select(col("o_orderpriority"),
        col("dec_sum").cast(DecimalType(28, 2)).cast("double").as("ev_revenue"),
        col("n_pairs"))
      .orderBy("o_orderpriority")
  }

  val GroupTopK = 3

  /** GROUPED TOP-K through the native two-phase plan
    * ([[graft.plans.TopKPerKeyNode]]) — per customer, the
    * [[GroupTopK]] most expensive orders ranked 1..k. The native plan's
    * PARTIAL exec keeps a bounded heap per (map-partition, customer) so
    * the exchange carries at most partitions·customers·k candidate rows
    * — the partial-aggregation shape applied to ranking. Measured
    * honestly ([[graft.TopKStress]], 100×): Spark 4's own
    * `WindowGroupLimit` pushdown achieves the same shuffle cut and the
    * two forms TIE on wall (1.71 s vs 1.66 s); the native exec's
    * differential is bounded heap state instead of a full per-partition
    * sort (see the plan's scaladoc). Gated by the SAME oracle a window
    * formulation would use: native ≡ declarative, machine-checked. */
  def q44GroupTopK: Q = (s, d) =>
    graft.plans.TopKPlans.topKPerKey(
      Tables.orders(s, d).select("o_custkey", "o_orderkey", "o_totalprice"),
      "o_custkey", "o_totalprice", "o_orderkey", GroupTopK, "rank")
      .select(col("o_custkey"), col("rank"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rank")

  /** CORRELATED LATERAL subquery with per-row ORDER BY + LIMIT
    * (`q46_lateral`) — the THIRD declared form of grouped top-k, and
    * the one that gates Catalyst's LATERAL machinery end to end:
    * `q44_grouptopk` runs the native two-phase exec, a window+filter is
    * its declarative twin, and this key declares the same intent the
    * way SQL users actually write it — "for each customer, the 2
    * cheapest finished orders" as a correlated LATERAL derived table.
    * Catalyst must (a) resolve the outer reference through the lateral
    * boundary, (b) DECORRELATE the LIMIT-under-correlation (the
    * rank-rewrite `DecorrelateInnerQuery` performs — a correlated LIMIT
    * is only executable after rewriting to a per-key rank filter), and
    * (c) plan the result as ONE shuffle-join + per-key cut rather than
    * a per-outer-row re-execution. The oracle is DuckDB's own LATERAL —
    * both engines' decorrelators must agree row-for-row, ties broken by
    * (o_totalprice, o_orderkey) into a total order.
    *
    * Scale: after decorrelation the plan is the `q44` class — one
    * shuffle of orders on o_custkey with a rank cut (Spark 4 pushes
    * `WindowGroupLimit` below the exchange), plus the customer join.
    * The cautionary shape it exists to document: a NON-decorrelatable
    * lateral (e.g. correlated through a non-equi predicate only)
    * degenerates to nested-loop re-execution per outer row — at 100 TB
    * the difference between this plan and that one is the whole
    * operator. */
  def q46Lateral: Q = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("g46_customer")
    Tables.orders(s, d).createOrReplaceTempView("g46_orders")
    s.sql("""
      SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      FROM g46_customer c,
      LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM g46_orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
        ORDER BY o_totalprice, o_orderkey LIMIT 2) t
      ORDER BY c.c_custkey, t.o_totalprice, t.o_orderkey""")
  }

  /** Group + HAVING. */
  def q10Having: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_suppkey").agg(count(lit(1)).as("n_items"))
      .where(col("n_items") >= 600)
      .orderBy("l_suppkey")

  /** Multi-column DISTINCT. */
  def q11Distinct: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** Conditional (CASE WHEN) aggregation — TPC-H Q12 shape. */
  def q12CaseAgg: Q = (s, d) => {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate"))
      .groupBy("l_returnflag")
      // count(CASE WHEN …) keeps BIGINT in both engines (DuckDB SUM over
      // integers widens to HUGEINT, which would break the schema compare).
      .agg(
        count(when(high, 1)).as("high_line_count"),
        count(when(!high, 1)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  /** Left outer join + distribution — TPC-H Q13 shape, read from the
    * CUSTKEY bucketed layouts: customer and orders are co-bucketed on the
    * customer key (the orders table's second sort order — see
    * Sinks.bucketedLayout), so the outer join plans zero exchanges on
    * either input AND the per-customer count inherits the join's
    * partitioning exchange-free. Only the tiny c_count redistribution
    * (rows = distinct order counts) and the final sort shuffle. customer
    * cannot broadcast here (left-outer builds the right side, which is
    * the orders fact), so pre-bucketing both sides is the only
    * shuffle-free plan — plan-asserted in PlanShapeSpec. */
  def q13OuterJoin: Q = (s, d) => {
    graft.sinks.Sinks.customerBucketed(s, d).hint("merge")
      .join(graft.sinks.Sinks.ordersByCust(s, d),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** UNION ALL + aggregate. */
  def q14Union: Q = (s, d) => {
    val o = Tables.orders(s, d).select(lit("order").as("src"), col("o_totalprice").as("amount"))
    val l = Tables.lineitem(s, d).select(lit("item").as("src"), col("l_extendedprice").as("amount"))
    o.unionAll(l)
      .groupBy("src").agg(xsum(col("amount")).as("total"), count(lit(1)).as("n"))
      .orderBy("src")
  }

  /** Scalar subquery (max-of-aggregate) — TPC-H Q15 shape. The scalar
    * max is a BROADCAST join against the 1-row `revenue.agg(max)` —
    * scale-flat at any supplier count, unlike the previous
    * `Window.partitionBy()` argmax, whose single-partition sort-window
    * becomes a ceiling at tens of millions of suppliers (and spams
    * `WindowExec: No Partition Defined` warnings). Both sides of the
    * self-reference hang off the IDENTICAL l_suppkey shuffle, so AQE's
    * ReusedExchange materializes the revenue aggregate once — lineitem
    * is still scanned and shuffled a single time (verified in the final
    * adaptive plan). */
  def q15Subquery: Q = (s, d) => {
    // isnotnull at the base makes BOTH revenue subtrees byte-identical
    // (the supplier join pushes IsNotNull into only its side otherwise,
    // defeating exchange reuse → two lineitem scans); the oracle carries
    // the same predicate. No-op on TPC-H data (l_suppkey is never null).
    val revenue = Tables.lineitem(s, d)
      .where(col("l_suppkey").isNotNull)
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(xsum(col("l_extendedprice") * (ONE - col("l_discount"))).as("total_revenue"))
    val top = revenue
      .join(broadcast(revenue.agg(max(col("total_revenue")).as("mx"))),
        col("total_revenue") === col("mx"))
      .drop("mx")
    Tables.supplier(s, d)
      .join(top, col("s_suppkey") === col("supplier_no"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  /** Global total sort (range-partitioned exchange) + top-N. */
  def q16Sort: Q = (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** Per-group average subquery (decorrelated) — TPC-H Q17 shape. The
    * per-part average is a WINDOW over the one brand-filtered join, so
    * lineitem is scanned once and shuffled once on l_partkey (the
    * aggregate-then-rejoin form scanned lineitem twice with two
    * shuffles). Brand filter broadcasts; avg over integral-valued
    * doubles is exact (sum < 2^53), so the threshold is deterministic
    * across engines and partitionings. */
  def q17AvgSubq: Q = (s, d) => {
    val brandParts = Tables.part(s, d).where(col("p_brand") === "Brand#13")
    Tables.lineitem(s, d)
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      .withColumn("qty_limit",
        avg("l_quantity").over(Window.partitionBy("l_partkey")) * 0.2)
      .where(col("l_quantity") < col("qty_limit"))
      .agg((xsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
  }

  /** Aggregate + HAVING on fact + top-N — TPC-H Q18 shape. The quantity
    * aggregate runs over lineitem ALONE, keyed by order, with the HAVING
    * applied before any join: orders/customer join 1:1 per order, so the
    * per-order sum is identical — but the agg exchange carries
    * (orderkey, qty) instead of the fully-joined fact, and only the few
    * qualifying orders reach the joins at all. (The join-first form
    * grouped the joined fact on five columns — fine at gate scale,
    * needless fact-width shuffle at 100 TB.)
    *
    * r4: both facts read from the order-key BUCKETED layout — the
    * per-order quantity aggregate runs exchange-free inside lineitem's
    * buckets, the orders join is co-located, and customer broadcasts, so
    * the whole query plans ZERO shuffle exchanges (TakeOrdered handles
    * the top-N). Plan-asserted in PlanShapeSpec. */
  def q18TopNAgg: Q = (s, d) => {
    val (li, ord) = graft.sinks.Sinks.bucketedFactTables(s, d)
    val big = li
      .groupBy("l_orderkey")
      .agg(xsum(col("l_quantity")).as("sum_qty"))
      .where(col("sum_qty") > 180.0)
    ord.hint("merge")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("c_custkey") === col("o_custkey"))
      .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q19 shape: join under a DISJUNCTION of conjunct groups — the
    * optimizer must extract the common join key and push the residual
    * OR-of-ANDs below/onto the join rather than falling back to a
    * cartesian. */
  def q19Disjunct: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    li.join(p, col("l_partkey") === col("p_partkey") && (
      (col("p_brand") === "Brand#11" && col("p_size").between(1, 10) &&
        col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#22" && col("p_size").between(5, 20) &&
        col("l_quantity").between(5, 30)) ||
      (col("p_brand") === "Brand#33" && col("p_size").between(10, 30) &&
        col("l_quantity").between(10, 40))))
      .agg(xsum(col("l_extendedprice") * (ONE - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q21 shape: one EXISTS + one NOT EXISTS correlated on the same
    * key, decorrelated into a semi- and an anti-join: suppliers with a
    * line in a multi-supplier order where no OTHER supplier's line was
    * returned. */
  def q21MultiCorr: Q = (s, d) => {
    // ONE lineitem scan. The EXISTS ("another supplier in the order") and
    // NOT EXISTS ("no OTHER supplier with an R line") decorrelate into
    // per-order counts over the distinct (order, supplier) pairs:
    //   ∃ other supplier        ⟺ n_supp > 1
    //   ∄ other R-supplier      ⟺ n_r − has_r = 0
    // The semi+anti self-join form scanned lineitem three times with
    // three distinct-shuffles; here it is one grouped scan plus a window
    // over the order key — at 100 TB, one pass over the fact table
    // instead of three. r4: lineitem reads from the order-key BUCKETED
    // layout, so even that one pass plans no exchange: the (orderkey,
    // suppkey) group-by and the orderkey window both run inside the
    // buckets (HashPartitioning(l_orderkey) satisfies both clusterings);
    // the only shuffle left is the tiny per-supplier count.
    val pairs = graft.sinks.Sinks.lineitemBucketed(s, d)
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_r"))
    val w = Window.partitionBy("l_orderkey")
    pairs
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_r", sum(col("has_r")).over(w))
      .where(col("n_supp") > 1 && (col("n_r") - col("has_r")) === 0)
      .groupBy("l_suppkey").agg(count(lit(1)).as("n_orders"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_orders"))
      .orderBy(col("n_orders").desc, col("s_suppkey"))
      .limit(20)
  }

  /** TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS, grouped:
    * above-average-balance customers with no urgent orders, per nation.
    * Threshold derivation (exact decimal sum → one double division) is
    * identical in both engines, so the comparison is deterministic. */
  def q22AntiSubq: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    val thr = cust.where(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast("decimal(28,10)")).cast("double") /
        count(lit(1))).as("thr"))
    cust.join(broadcast(thr), col("c_acctbal") > col("thr"))
      .join(Tables.orders(s, d).where(col("o_orderpriority") === "1-URGENT")
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"), xsum(col("c_acctbal")).as("totacctbal"))
      .orderBy("c_nationkey")
  }

  /** Per-group ARGMIN (TPC-H Q2's min-cost-supplier shape on our schema,
    * which has no partsupp): for each PROMO part, the supplier selling it
    * at the lowest average price. The per-(part, supplier) aggregate
    * shuffles (partkey, suppkey, sums) only; the argmin is a window over
    * the part key (group-sized partitions); part and supplier broadcast.
    * Average = exact decimal sum / count, one double division — the rank
    * key is bit-identical across engines, so ties (broken on suppkey)
    * are deterministic. */
  def q27ArgMin: Q = (s, d) => {
    // the PROMO predicate is ~6× selective on partkey: push it below the
    // (partkey, suppkey) aggregate as a broadcast semi-join so the big
    // shuffle carries only surviving parts (per-partkey results unchanged)
    val promoKeys = Tables.part(s, d).where(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val ps = Tables.lineitem(s, d)
      .join(broadcast(promoKeys), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg((xsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"))
    val w = Window.partitionBy("l_partkey").orderBy(col("avg_price"), col("l_suppkey"))
    ps.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
      .join(broadcast(Tables.part(s, d).where(col("p_type") === "PROMO")),
        col("p_partkey") === col("l_partkey"))
      .join(broadcast(Tables.supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
        round(col("avg_price"), 4).as("avg_price"))
      .orderBy("p_partkey")
  }

  /** RUNNING TOTAL: cumulative daily order revenue — the canonical
    * unbounded-preceding window frame. The cumulation runs over the
    * DAY-AGGREGATED frame, never the fact table: day cardinality is
    * calendar-bounded (a decade ≈ 3.7k rows), so the single-partition
    * ordered window is scale-safe no matter how large orders grows —
    * the fact-sized work is the grouped aggregate before it. Exact
    * decimal sums end to end; doubles only at the final projection. */
  def q28Running: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(28,10)")).as("dtot"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // down-cast to scale 2 BEFORE the double cast (Compat.xsum rule): a
    // scale-10 decimal > 2^53 rounds differently across engines' double
    // conversions; at scale 2 the conversion is uniquely rounded
    daily
      .withColumn("cum", sum(col("dtot")).over(w))
      .select(col("day"),
        col("dtot").cast(DecimalType(28, 2)).cast("double").as("day_total"),
        col("cum").cast(DecimalType(38, 2)).cast("double").as("running_total"))
      .orderBy("day")
  }

  /** MOVING AVERAGE: 7-day trailing mean of daily purchase value over
    * the events stream — the bounded-frame window twin of [[q28Running]],
    * same day-aggregated-then-window scale shape. The mean divides two
    * exactly-aggregated numbers (decimal value sum, long event count), so
    * one double division + round(4) is engine-exact. */
  def q29MovAvg: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .where(col("event_type") === "purchase")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(28,10)")).as("dval"),
        count(lit(1)).as("n"))
    val w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("wval", sum(col("dval")).over(w))
      .withColumn("wn", sum(col("n")).over(w))
      // scale-2 down-cast before the double conversion — see q28Running
      .select(col("day"), col("n").as("n_purchases"),
        round(col("wval").cast(DecimalType(38, 2)).cast("double") / col("wn"), 4).as("ma7"))
      .orderBy("day")
  }

  /** Explicit GROUPING SETS with `grouping_id` disambiguation — the
    * generalized form of ROLLUP/CUBE (q9/q23): three hand-picked sets
    * (nation×status, nation, status) in ONE pass over the join, with
    * the grouping id distinguishing a genuine NULL key from a
    * rolled-up one. Same partial-aggregation scale shape as any
    * grouped agg. */
  def q30Gsets: Q = (s, d) =>
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupingSets(
        Seq(Seq(col("n_name"), col("o_orderstatus")), Seq(col("n_name")), Seq(col("o_orderstatus"))),
        col("n_name"), col("o_orderstatus"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"), xsum(col("o_totalprice")).as("total"))
      .orderBy(col("gid"), col("n_name").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)

  /** NTILE + per-tile aggregate: customers quartiled by account balance
    * (global ordered tiles), then per-tile stats — the
    * histogram-by-rank shape, computed as a DISTRIBUTED two-pass rank
    * (no global single-partition window anywhere in the plan):
    *
    *  1. one order-independent aggregate gives (min, max, count) — safe
    *     to evaluate on both plan branches, unlike approx_percentile
    *     whose merge order could differ between evaluations;
    *  2. each row is bucketed by equi-width value range, a monotone
    *     coarsening of the (acctbal DESC, custkey ASC) global order, so
    *     every window below is PARTITIONED by bucket — [[NtileBuckets]]
    *     parallel tasks, each over ~1/B of the rows;
    *  3. exclusive bucket offsets come from a triangular broadcast join
    *     over the B-row bucket-count frame (B², B = 32 — trivial);
    *  4. global rank = offset + local row_number, and the exact NTILE
    *     tile index is pure integer arithmetic on (rank, count).
    *
    * This is the plan that survives 100×: the only per-row shuffle is
    * the bucket hash (2 scalar columns), the serial zones are O(B) and
    * O(1) frames. Equi-width splits assume the order key isn't wildly
    * value-skewed; for skewed keys swap step 2's boundaries for
    * persisted approx-quantile splits (Sketches) — same steps 3-4. */
  val NtileBuckets = 32
  def q31Ntile: Q = (s, d) => {
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal"))
    val stats = cust.agg(
      min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"),
      count(lit(1)).as("n_total"))
    // monotone DESC bucketing: highest balances → bucket 0. Degenerate
    // lo==hi range ⇒ everything in bucket 0 (CaseWhen keeps the ANSI
    // divide-by-zero branch unevaluated).
    val bucketed = cust.crossJoin(broadcast(stats))
      .withColumn("bkt", when(col("hi") === col("lo"), lit(0)).otherwise(
        least(floor((col("hi") - col("c_acctbal")) /
          ((col("hi") - col("lo")) / NtileBuckets)), lit(NtileBuckets - 1L))
          .cast("int")))
    val wLoc = Window.partitionBy("bkt").orderBy(col("c_acctbal").desc, col("c_custkey"))
    val ranked = bucketed.withColumn("rn", row_number().over(wLoc).cast("long"))
    val cnts = bucketed.groupBy("bkt").agg(count(lit(1)).as("cnt"))
    val offs = cnts
      .join(broadcast(cnts.select(col("bkt").as("bkt2"), col("cnt").as("cnt2"))),
        col("bkt2") < col("bkt"), "left")
      .groupBy("bkt").agg(coalesce(sum(col("cnt2")), lit(0L)).as("off"))
    ranked.join(broadcast(offs), "bkt")
      .withColumn("r", col("off") + col("rn"))
      // exact NTILE(4) arithmetic: first (n%4) tiles hold ceil(n/4) rows
      .withColumn("base", expr("n_total div 4"))
      .withColumn("rem", col("n_total") % 4)
      .withColumn("cutoff", col("rem") * (col("base") + 1))
      .withColumn("tile", when(col("r") <= col("cutoff"),
          expr("(r - 1) div (base + 1) + 1"))
        .otherwise(expr("rem + (r - 1 - cutoff) div base + 1")))
      .groupBy("tile")
      .agg(count(lit(1)).as("n_cust"),
        xsum(col("c_acctbal")).as("bal_total"),
        min(col("c_acctbal")).as("bal_min"),
        max(col("c_acctbal")).as("bal_max"))
      .select(col("tile").cast("long").as("tile"), col("n_cust"),
        col("bal_total"), col("bal_min"), col("bal_max"))
      .orderBy("tile")
  }

  /** INTERSECT / EXCEPT set semantics in one result: nations that have
    * BOTH customers and suppliers vs customer-only nations — both sides
    * non-trivial at every SF (suppliers cover fewer nations than
    * customers). Set ops plan as aggregate + left-semi/anti join under
    * the hood, so only DISTINCT keys travel through the shuffle. */
  def q32SetOps: Q = (s, d) => {
    val custNations = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
    val suppNations = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
    val both = custNations.intersect(suppNations)
      .select(col("nationkey"), lit("both").as("bucket"))
    val custOnly = custNations.except(suppNations)
      .select(col("nationkey"), lit("cust_only").as("bucket"))
    both.unionAll(custOnly).orderBy("bucket", "nationkey")
  }

  /** FULL OUTER join — the reconciliation shape: per-customer URGENT
    * spend vs FINALIZED spend, keeping customers present on either side
    * (48 left-only / 180 right-only / rest matched at sf0.01). Both
    * inputs are filtered aggregates of the same fact keyed by custkey,
    * so they arrive at the join already hash-partitioned on the join
    * key — the full-outer SMJ adds sorts but no exchange. The `side`
    * tag is derived from value nullability (sides never emit NULL sums),
    * the pattern audit queries use to split matched/unmatched volume. */
  def q33FullOuter: Q = (s, d) => {
    val orders = Tables.orders(s, d)
    val urgent = orders.where(col("o_orderpriority") === "1-URGENT")
      .groupBy("o_custkey").agg(xsum(col("o_totalprice")).as("urgent_spend"))
    val fin = orders.where(col("o_orderstatus") === "F")
      .groupBy("o_custkey").agg(xsum(col("o_totalprice")).as("final_spend"))
    urgent.join(fin, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"), col("urgent_spend"), col("final_spend"),
        when(col("urgent_spend").isNull, lit("final_only"))
          .when(col("final_spend").isNull, lit("urgent_only"))
          .otherwise(lit("both")).as("side"))
      .orderBy("o_custkey")
  }

  /** MERGE INTO — the lakehouse CDC upsert, expressed as the one-pass
    * FULL OUTER join every table format ultimately plans it as: a
    * change batch of updates / deletes / inserts (derived
    * DETERMINISTICALLY from the snapshot here, so the oracle can mirror
    * it; keys are mutually exclusive per op, as MERGE requires) applied
    * in a single pass — matched-update via coalesce, matched-delete via
    * filter, not-matched-insert via the right-only rows. Untouched rows
    * tag 'K'.
    *
    * Scale: ONE co-partitioned join on the merge key — with the change
    * batch tiny relative to the snapshot it broadcasts; at
    * comparable sizes both sides hash on the key, and over the bucketed
    * layout (Sinks) the snapshot side would shuffle nothing, same as
    * q33's full-outer reconciliation. */
  def q34Merge: Q = (s, d) => {
    val snap = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    val updates = snap
      .where(col("c_custkey") % 7 === 0 && col("c_custkey") % 13 =!= 0)
      .select(col("c_custkey"), lit("U").as("op"),
        (col("c_acctbal") + 100.0).as("new_bal"),
        concat(lit("upd_"), col("c_name")).as("new_name"))
    val deletes = snap.where(col("c_custkey") % 13 === 0)
      .select(col("c_custkey"), lit("D").as("op"), nullD.as("new_bal"), nullS.as("new_name"))
    val inserts = snap.where(col("c_custkey") % 11 === 0)
      .select((col("c_custkey") + 10000000L).as("c_custkey"), lit("I").as("op"),
        lit(0.0).as("new_bal"), concat(lit("new_"), col("c_name")).as("new_name"))
    snap.join(updates.unionAll(deletes).unionAll(inserts), Seq("c_custkey"), "full_outer")
      .where(col("op").isNull || col("op") =!= "D")
      .select(col("c_custkey"),
        coalesce(col("new_name"), col("c_name")).as("name"),
        coalesce(col("new_bal"), col("c_acctbal")).as("acctbal"),
        coalesce(col("op"), lit("K")).as("op"))
      .orderBy("c_custkey")
  }

  /** HLL register discipline — shared with `ev_rolling_hll` via
    * [[Compat.Hll]] (single source of truth for both operators and both
    * oracles); m = 2^P = 256 registers, standard error 1.04/√m ≈ 6.5%. */
  private val HllP   = Compat.Hll.P
  private val HllM   = Compat.Hll.M
  private val HllW   = Compat.Hll.W
  private val HllPow = Compat.Hll.Pow
  private val HllC   = Compat.Hll.C

  /** Approximate COUNT DISTINCT via HyperLogLog — the bounded-state
    * alternative to the distinct shuffle, estimate and exact side by
    * side so the output shows the sketch's error (~1.04/√m ≈ 6.5%).
    *
    * One md5 per row (a strong mix is non-negotiable: feeding
    * sequential keys to a cheap linear-hash family leaves lattice
    * structure — three-distance theorem — that biased a K-minimum-
    * values prototype of this query +43%; and K linear hashes of a
    * SHARED set have correlated minima that bias the harmonic
    * estimator +20% even on ideal uniform input — both measured before
    * settling on HLL). The 60-bit hash splits into an 8-bit register
    * index (`h & 255`) and a 52-bit field whose leading-zero rank
    * ρ = 53 − bitlength (via `bin()`+`length()`, identical in both
    * engines) feeds max-registers. The register sum is EXACT scaled
    * integer — Σ 2^(53−ρ_max) as BIGINT (≤ 2^61, no rounding, so the
    * result is independent of partitioning/order where a double Σ2^−ρ
    * would round order-dependently) — with absent registers folded in
    * as (m − present)·2^53; the final α·m²·2^53/Z division is the one
    * IEEE double op, mirrored verbatim. No small/large-range
    * corrections (documented: below ~2.5m distincts the raw HLL
    * estimate reads high; the gated sf has n/m ≈ 43, squarely in HLL's
    * flat zone).
    *
    * Scale: THE way to count distincts at 100 TB. The plan is two tiny
    * grouped aggregations with map-side combine over O(m) state per
    * group — the shuffle carries groups×256 registers instead of the n
    * distinct keys a COUNT(DISTINCT) exchange moves; registers are
    * mergeable across partitions, days, and streams (max is
    * associative), which COUNT(DISTINCT) results are not. The exact
    * count computed alongside is the demo's error gauge — a production
    * query would drop it and with it the only expensive exchange here. */
  /** INCREMENTAL AGGREGATE MAINTENANCE (`q41_mergeagg`) — the lakehouse
    * materialized-rollup refresh: yesterday's per-customer aggregate
    * STATE merges with today's delta batch instead of recomputing over
    * the whole fact history. The algebra is the point: the state is
    * (count, decimal-sum) — Spark's own partial-aggregation pair,
    * applied ACROSS jobs — and the average derives from the MERGED
    * state; an avg-of-avgs would be wrong the moment batch sizes differ
    * (spec pins exactly that trap). The stand-in split
    * (`o_orderkey % 97 == 0` = the delta batch) mirrors the
    * text_decontam fixture pattern.
    *
    * Scale: the whole point at 100 TB — the rollup refresh touches
    * |state| + |delta| rows, never the fact history; states stay
    * mergeable across arbitrarily many batches/shards/streams because
    * (n, Σ) is a commutative monoid. One co-keyed union + re-aggregate
    * (both partial aggregates are combiner-friendly and share the
    * custkey partitioning). */
  def q41MergeAgg: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    mergeAgg(o.where(col("o_orderkey") % 97 =!= 0),
      o.where(col("o_orderkey") % 97 === 0))
  }

  /** Merge the (count, sum) aggregate states of two order batches —
    * see [[q41MergeAgg]]. */
  def mergeAgg(base: DataFrame, delta: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    def state(df: DataFrame): DataFrame =
      df.groupBy("o_custkey").agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(28, 10))).as("st"))
    state(base).unionAll(state(delta))
      .groupBy("o_custkey").agg(sum("n").as("n"), sum("st").as("st"))
      .select(col("o_custkey"), col("n"),
        col("st").cast(DecimalType(28, 2)).cast(DoubleType).as("total"))
      .withColumn("avg_price", round(col("total") / col("n").cast(DoubleType), 6))
      .orderBy("o_custkey")
  }

  val HqBuckets = 64
  val HqQs = Seq(0.5, 0.95, 0.99)

  /** HISTOGRAM QUANTILES (`q40_histq`) — approximate per-group
    * percentiles from a FIXED-SIZE equi-width histogram, estimate and
    * exact side by side with rel_err (the sketch-family completion:
    * q38_hll answers distincts, wc_cms frequencies, this answers
    * quantiles — all three cross-engine bit-deterministic where
    * Spark's t-digest `percentile_approx` is engine-specific and only
    * spec-boundable).
    *
    * Sketch: per (group, bucket) integer counts over [[HqBuckets]]
    * equi-width buckets between the group's min/max — bounded state,
    * MERGEABLE (counts sum across shards/days/streams), one
    * combiner-friendly shuffle whose width is groups×64 cells, never
    * rows. Estimate = linear interpolation inside the target bucket —
    * one fixed-order double chain, mirrored verbatim by the oracle,
    * rounded at 6dp.
    *
    * The exact gauge dodges the per-group global sort (few huge window
    * partitions — the worst key shape at 100 TB): the SAME bucket
    * offsets locate each quantile's bucket, so the exact value needs
    * only an in-bucket level window over DISTINCT (group, bucket,
    * value) rows — resolution-bounded per bucket — joined to the ≤
    * groups×|qs| candidate frame. A production query drops the exact
    * branch; the histogram side never sorts values at all. */
  def q40HistQuantile: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
    val stats = li.groupBy("g")
      .agg(min("x").as("lo"), max("x").as("hi"), count(lit(1)).as("n"))
    val w = (col("hi") - col("lo")) / HqBuckets
    val bktOf = when(col("hi") === col("lo"), lit(0L))
      .otherwise(least(floor((col("x") - col("lo")) / w), lit(HqBuckets - 1L)))
    val bucketed = li.join(broadcast(stats), "g")
      .withColumn("bkt", bktOf)
    val counts = bucketed.groupBy("g", "bkt").agg(count(lit(1)).as("cnt"))
    val wcum = Window.partitionBy("g").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = counts.withColumn("cb", coalesce(sum("cnt").over(wcum), lit(0L)))
    val qdf = { import s.implicits._; HqQs.toDF("p") }
    val cand = cum.join(broadcast(stats), "g").crossJoin(broadcast(qdf))
      .withColumn("target", ceil(col("p") * col("n")).cast("long"))
      .where(col("cb") < col("target") && col("target") <= col("cb") + col("cnt"))
      .withColumn("est", round(
        col("lo") + col("bkt").cast("double") * w +
          (col("target") - col("cb")).cast("double") / col("cnt").cast("double") * w,
        6))
    val lvl = bucketed.groupBy("g", "bkt", "x").agg(count(lit(1)).as("lcnt"))
    val wl = Window.partitionBy("g", "bkt").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val lc = lvl.withColumn("lin", coalesce(sum("lcnt").over(wl), lit(0L)))
    val exact = broadcast(cand.select("g", "p", "bkt", "cb", "target"))
      .join(lc, Seq("g", "bkt"))
      .where(col("cb") + col("lin") < col("target") &&
        col("target") <= col("cb") + col("lin") + col("lcnt"))
      .select(col("g"), col("p"), col("x").as("exact"))
    cand.select(col("g"), col("p"), col("est"))
      .join(exact, Seq("g", "p"))
      .select(col("g").as("l_returnflag"), col("p"), col("est"), col("exact"),
        round((col("est") - col("exact")) / col("exact"), 6).as("rel_err"))
      .orderBy("l_returnflag", "p")
  }

  val SkyBuckets = 32

  /** SKYLINE / Pareto frontier (`q39_skyline`) — the multi-criteria
    * optimization query (Börzsönyi et al. 2001, "The Skyline
    * Operator"): parts not DOMINATED on (minimize p_retailprice,
    * maximize p_size) — p dominates q iff p is ≤ on price, ≥ on size,
    * and strictly better on at least one. The classic form is a
    * quadratic NOT-EXISTS self-join (the oracle runs exactly that — at
    * oracle scale); at 100 TB the trick is that 2-D dominance only
    * needs PRICE-LEVEL MAXIMA: a row survives iff its size equals its
    * own level's max AND strictly-cheaper levels never reach its size.
    *
    * Plan: one combiner-friendly aggregate to the DISTINCT price-level
    * table (bounded by price resolution, not row count — the
    * text_ppl_bucket discipline), running maxima over levels via the
    * q31 two-level scan (equi-width price buckets partition the level
    * window; cross-bucket prefixes come from the triangular broadcast
    * join over the B-row bucket-max frame — no partition-less window
    * anywhere), then one hash join back to rows on the already-grouped
    * price key. Dominance never compares row pairs. */
  def q39Skyline: Q = (s, d) => skyline(Tables.part(s, d))

  /** The level-maxima skyline over any (p_partkey, p_retailprice,
    * p_size) frame — see [[q39Skyline]]. */
  def skyline(partIn: DataFrame): DataFrame = {
    val part = partIn.select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    val lvls = part.groupBy("p_retailprice").agg(max(col("p_size")).as("lvl_max"))
    val stats = lvls.agg(min("p_retailprice").as("lo"), max("p_retailprice").as("hi"))
    val bucketed = lvls.crossJoin(broadcast(stats))
      .withColumn("bkt", when(col("hi") === col("lo"), lit(0)).otherwise(
        least(floor((col("p_retailprice") - col("lo")) /
          ((col("hi") - col("lo")) / SkyBuckets)), lit(SkyBuckets - 1L)).cast("int")))
    val wIn = Window.partitionBy("bkt").orderBy("p_retailprice")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withIn = bucketed.withColumn("in_pre", max(col("lvl_max")).over(wIn))
    val bmax = bucketed.groupBy("bkt").agg(max("lvl_max").as("bmx"))
    val pre = bmax
      .join(broadcast(bmax.select(col("bkt").as("bkt2"), col("bmx").as("bmx2"))),
        col("bkt2") < col("bkt"), "left")
      .groupBy("bkt").agg(max("bmx2").as("pre"))
    // below = max size among strictly-cheaper levels (levels are
    // distinct prices, so the -1 rows frame IS the strict range frame)
    val lv = withIn.join(broadcast(pre), "bkt")
      .select(col("p_retailprice"),
        greatest(coalesce(col("pre"), lit(Int.MinValue)),
          coalesce(col("in_pre"), lit(Int.MinValue))).as("below"),
        col("lvl_max"))
    part.join(lv, "p_retailprice")
      .where(col("p_size") === col("lvl_max") && col("below") < col("p_size"))
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .orderBy("p_retailprice", "p_partkey")
  }

  def q38Hll: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val h = conv(substring(md5(concat(lit("hll:"), col("l_orderkey"))), 1, 15), 16, 10)
      .cast("long")
    val rem = shiftright(h, HllP)
    val rho = when(rem === 0L, lit(HllW + 1).cast("long"))
      .otherwise(lit(HllW + 1).cast("long") - length(bin(rem)).cast("long"))
    val regs = li
      .select(col("l_returnflag"), h.bitwiseAND(HllM - 1).as("bucket"), rho.as("rho"))
      .groupBy("l_returnflag", "bucket").agg(max(col("rho")).as("mx"))
    // exact scaled-integer register sum: 2^(53 - mx) per present register
    val term = expr(s"shiftleft(CAST(1 AS BIGINT), ${HllW + 1} - CAST(mx AS INT))")
    val sk2 = regs.groupBy("l_returnflag")
      .agg(sum(term).as("sp"), count(lit(1)).as("nb"))
      .withColumn("z", col("sp") + (lit(HllM.toLong) - col("nb")) * lit(HllPow))
      .select(col("l_returnflag"),
        (lit(HllC) / col("z").cast("double")).as("approx_distinct"))
    val ex = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("exact_distinct"))
    sk2.join(ex, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("approx_distinct"), col("exact_distinct"),
        ((col("approx_distinct") - col("exact_distinct").cast("double")) /
          col("exact_distinct").cast("double")).as("rel_err"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, Q] = Map(
    "q34_merge"    -> q34Merge,
    "q38_hll"      -> q38Hll,
    "q39_skyline"  -> q39Skyline,
    "q40_histq"    -> q40HistQuantile,
    "q41_mergeagg" -> q41MergeAgg,
    "q42_unpivot"  -> q42Unpivot,
    "q43_eageragg" -> q43EagerAgg,
    "q45_eagermult" -> q45EagerMult,
    "q44_grouptopk"-> q44GroupTopK,
    "q46_lateral"  -> q46Lateral,
    "q1_agg"       -> q1Agg,
    "q2_filter"    -> q2Filter,
    "q3_join"      -> q3Join,
    "q4_semijoin"  -> q4Semijoin,
    "q5_multijoin" -> q5Multijoin,
    "q6_scanagg"   -> q6ScanAgg,
    "q7_antijoin"  -> q7Antijoin,
    "q8_window"    -> q8Window,
    "q9_rollup"    -> q9Rollup,
    "q10_having"   -> q10Having,
    "q11_distinct" -> q11Distinct,
    "q12_caseagg"  -> q12CaseAgg,
    "q13_outerjoin"-> q13OuterJoin,
    "q14_union"    -> q14Union,
    "q15_subquery" -> q15Subquery,
    "q16_sort"     -> q16Sort,
    "q17_avg_subq" -> q17AvgSubq,
    "q18_topn_agg" -> q18TopNAgg,
    "q19_disjunct" -> q19Disjunct,
    "q21_multicorr"-> q21MultiCorr,
    "q22_anti_subq"-> q22AntiSubq,
    "q23_cube"     -> q23Cube,
    "q24_pivot"    -> q24Pivot,
    "q27_argmin"   -> q27ArgMin,
    "q28_running"  -> q28Running,
    "q29_movavg"   -> q29MovAvg,
    "q30_gsets"    -> q30Gsets,
    "q31_ntile"    -> q31Ntile,
    "q32_setops"   -> q32SetOps,
    "q33_fullouter"-> q33FullOuter,
  )

  val oracle: Map[String, String] = Map(
    // the plain long-form aggregate — result-identity proves
    // unpivot ∘ pivot = identity (modulo the zero-fill rows)
    // the window formulation the native plan replaces — native ≡
    // declarative is the whole gate
    "q44_grouptopk" ->
      s"""SELECT o_custkey, rank, o_orderkey, o_totalprice FROM (
         |  SELECT o_custkey, o_orderkey, o_totalprice,
         |    row_number() OVER (PARTITION BY o_custkey
         |      ORDER BY o_totalprice DESC, o_orderkey) AS rank
         |  FROM orders) t
         |WHERE rank <= $GroupTopK ORDER BY o_custkey, rank""".stripMargin,
    // DuckDB's own LATERAL decorrelator — both engines rewrite the
    // correlated LIMIT independently and must agree row-for-row
    "q46_lateral" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
        |  ORDER BY o_totalprice, o_orderkey LIMIT 2) t
        |ORDER BY c.c_custkey, t.o_totalprice, t.o_orderkey""".stripMargin,
    // deliberately the FLAT join-then-aggregate — independent of the
    // eager three-level construction it gates; exact-decimal partial
    // sums make regrouping invisible, so result identity machine-checks
    // the rewrite
    "q43_eageragg" ->
      """SELECT n_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation ON n_nationkey = c_nationkey
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    // the flat pair-level join-agg the eager tree must equal: exact
    // decimal associativity makes the per-user regrouping invisible
    "q45_eagermult" ->
      s"""SELECT o_orderpriority,
         |  ${Compat.osum("value")} AS ev_revenue,
         |  count(*) AS n_pairs
         |FROM events e JOIN orders o ON o.o_custkey = e.user_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q42_unpivot" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  event_type, count(*) AS n
        |FROM events
        |WHERE event_type IN ('view', 'click', 'purchase')
        |GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    // the oracle RECOMPUTES from scratch — result-identity proves
    // merged partial states equal the full aggregate
    "q41_mergeagg" ->
      s"""SELECT o_custkey, n, total, round(total / n, 6) AS avg_price
         |FROM (
         |  SELECT o_custkey, count(*) AS n,
         |    ${Compat.osum("o_totalprice")} AS total
         |  FROM orders GROUP BY o_custkey) t
         |ORDER BY o_custkey""".stripMargin,
    // same histogram, offsets, interpolation chain, and in-bucket level
    // windows — the whole sketch reproduces bit-for-bit
    "q40_histq" ->
      s"""WITH li AS (SELECT l_returnflag AS g, l_extendedprice AS x FROM lineitem),
         |st AS (SELECT g, min(x) AS lo, max(x) AS hi, count(*) AS n FROM li GROUP BY 1),
         |bk AS (SELECT li.g, x,
         |    CASE WHEN hi = lo THEN 0
         |         ELSE least(CAST(floor((x - lo) / ((hi - lo) / $HqBuckets)) AS BIGINT),
         |                    ${HqBuckets - 1}) END AS bkt
         |  FROM li JOIN st USING (g)),
         |bc AS (SELECT g, bkt, count(*) AS cnt FROM bk GROUP BY 1, 2),
         |cm AS (SELECT g, bkt, cnt,
         |    coalesce(sum(cnt) OVER (PARTITION BY g ORDER BY bkt
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM bc),
         |qs AS (SELECT unnest([${HqQs.map(q => s"CAST($q AS DOUBLE)").mkString(", ")}]) AS p),
         |cand AS (SELECT cm.g, qs.p, cm.bkt, cm.cnt, cm.cb, st.lo, st.hi,
         |    CAST(ceil(qs.p * st.n) AS BIGINT) AS target
         |  FROM cm JOIN st USING (g) CROSS JOIN qs
         |  WHERE cm.cb < CAST(ceil(qs.p * st.n) AS BIGINT)
         |    AND CAST(ceil(qs.p * st.n) AS BIGINT) <= cm.cb + cm.cnt),
         |est AS (SELECT g, p, bkt, cb, target,
         |    round(lo + CAST(bkt AS DOUBLE) * ((hi - lo) / $HqBuckets)
         |      + CAST(target - cb AS DOUBLE) / CAST(cnt AS DOUBLE)
         |        * ((hi - lo) / $HqBuckets), 6) AS est
         |  FROM cand),
         |lv AS (SELECT g, bkt, x, count(*) AS lcnt FROM bk GROUP BY 1, 2, 3),
         |lc AS (SELECT g, bkt, x, lcnt,
         |    coalesce(sum(lcnt) OVER (PARTITION BY g, bkt ORDER BY x
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lin
         |  FROM lv),
         |ex AS (SELECT e.g, e.p, lc.x AS exact
         |  FROM est e JOIN lc ON lc.g = e.g AND lc.bkt = e.bkt
         |  WHERE e.cb + lc.lin < e.target AND e.target <= e.cb + lc.lin + lc.lcnt)
         |SELECT e.g AS l_returnflag, e.p AS p, e.est, ex.exact,
         |  round((e.est - ex.exact) / ex.exact, 6) AS rel_err
         |FROM est e JOIN ex ON ex.g = e.g AND ex.p = e.p
         |ORDER BY l_returnflag, e.p""".stripMargin,
    // the classic quadratic dominance form — fine at oracle scale, and
    // deliberately independent of the level-maxima construction it gates
    "q39_skyline" ->
      """SELECT p_partkey, p_retailprice, p_size FROM part q
        |WHERE NOT EXISTS (SELECT 1 FROM part p
        |  WHERE p.p_retailprice <= q.p_retailprice AND p.p_size >= q.p_size
        |    AND (p.p_retailprice < q.p_retailprice OR p.p_size > q.p_size))
        |ORDER BY p_retailprice, p_partkey""".stripMargin,
    "q38_hll" ->
      s"""WITH hs AS (
         |  SELECT l_returnflag,
         |    ('0x' || substr(md5('hll:' || l_orderkey::VARCHAR), 1, 15))::BIGINT AS h
         |  FROM lineitem),
         |regs AS (
         |  SELECT l_returnflag, h & ${HllM - 1} AS bucket,
         |    max(CASE WHEN (h >> $HllP) = 0 THEN ${HllW + 1}
         |             ELSE ${HllW + 1} - length(bin(h >> $HllP)) END) AS mx
         |  FROM hs GROUP BY 1, 2),
         |sk AS (
         |  SELECT l_returnflag,
         |    sum((1::BIGINT << (${HllW + 1} - mx))::BIGINT) AS sp,
         |    count(*) AS nb
         |  FROM regs GROUP BY 1),
         |est AS (
         |  SELECT l_returnflag,
         |    (0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 9007199254740992.0)
         |      / CAST(sp + ($HllM - nb) * $HllPow AS DOUBLE) AS approx_distinct
         |  FROM sk),
         |ex AS (SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_distinct
         |       FROM lineitem GROUP BY 1)
         |SELECT l_returnflag, approx_distinct, exact_distinct,
         |  (approx_distinct - CAST(exact_distinct AS DOUBLE))
         |    / CAST(exact_distinct AS DOUBLE) AS rel_err
         |FROM est JOIN ex USING (l_returnflag)
         |ORDER BY l_returnflag""".stripMargin,
    "q34_merge" ->
      """WITH snap AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |changes AS (
        |  SELECT c_custkey, 'U' AS op, c_acctbal + 100.0 AS new_bal,
        |    'upd_' || c_name AS new_name
        |  FROM snap WHERE c_custkey % 7 = 0 AND c_custkey % 13 <> 0
        |  UNION ALL
        |  SELECT c_custkey, 'D', NULL, NULL FROM snap WHERE c_custkey % 13 = 0
        |  UNION ALL
        |  SELECT c_custkey + 10000000, 'I', 0.0, 'new_' || c_name
        |  FROM snap WHERE c_custkey % 11 = 0)
        |SELECT coalesce(s.c_custkey, c.c_custkey) AS c_custkey,
        |  coalesce(c.new_name, s.c_name) AS name,
        |  coalesce(c.new_bal, s.c_acctbal) AS acctbal,
        |  coalesce(c.op, 'K') AS op
        |FROM snap s FULL OUTER JOIN changes c ON s.c_custkey = c.c_custkey
        |WHERE c.op IS NULL OR c.op <> 'D'
        |ORDER BY c_custkey""".stripMargin,
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${osum("l_quantity")} AS sum_qty,
         |  ${osum("l_extendedprice")} AS sum_base_price,
         |  ${osum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${osum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter" ->
      """SELECT p_partkey, p_name, p_brand, p_retailprice FROM part
        |WHERE p_type = 'PROMO' AND p_size BETWEEN 10 AND 25
        |ORDER BY p_partkey""".stripMargin,
    "q3_join" ->
      s"""SELECT l_orderkey, ${osum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  o_orderdate, o_orderpriority
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q4_semijoin" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q5_multijoin" ->
      s"""SELECT n_name, ${osum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_scanagg" ->
      s"""SELECT ${osum("l_extendedprice * l_discount")} AS revenue FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q7_antijoin" ->
      """SELECT c_mktsegment, count(*) AS n_cust FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q8_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q9_rollup" ->
      s"""SELECT n_name, o_orderstatus, count(*) AS n_orders, ${osum("o_totalprice")} AS total
         |FROM orders, customer, nation
         |WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
         |GROUP BY ROLLUP (n_name, o_orderstatus)
         |ORDER BY n_name ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,
    "q10_having" ->
      """SELECT l_suppkey, count(*) AS n_items FROM lineitem
        |GROUP BY l_suppkey HAVING count(*) >= 600 ORDER BY l_suppkey""".stripMargin,
    "q11_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q12_caseagg" ->
      """SELECT l_returnflag,
        |  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
        |  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey AND l_shipdate > o_orderdate
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q13_outerjoin" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q14_union" ->
      s"""SELECT src, ${osum("amount")} AS total, count(*) AS n FROM (
         |  SELECT 'order' AS src, o_totalprice AS amount FROM orders
         |  UNION ALL
         |  SELECT 'item' AS src, l_extendedprice AS amount FROM lineitem) t
         |GROUP BY src ORDER BY src""".stripMargin,
    "q15_subquery" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no,
         |    ${osum("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
         |  FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue FROM supplier, revenue
         |WHERE s_suppkey = supplier_no
         |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin,
    "q16_sort" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q17_avg_subq" ->
      s"""SELECT ${osum("l_extendedprice")} / 7.0 AS avg_yearly
         |FROM lineitem, part
         |WHERE p_partkey = l_partkey AND p_brand = 'Brand#13'
         |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
         |                    WHERE l2.l_partkey = part.p_partkey)""".stripMargin,
    "q18_topn_agg" ->
      s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
         |  ${osum("l_quantity")} AS sum_qty
         |FROM customer, orders, lineitem
         |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
         |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
         |HAVING ${osum("l_quantity")} > 180.0
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q19_disjunct" ->
      s"""SELECT ${osum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  count(*) AS n_lines
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey AND (
         |  (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 10
         |     AND l_quantity BETWEEN 1 AND 20) OR
         |  (p_brand = 'Brand#22' AND p_size BETWEEN 5 AND 20
         |     AND l_quantity BETWEEN 5 AND 30) OR
         |  (p_brand = 'Brand#33' AND p_size BETWEEN 10 AND 30
         |     AND l_quantity BETWEEN 10 AND 40))""".stripMargin,
    "q21_multicorr" ->
      """WITH ls AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
        |SELECT s_suppkey, s_name, n_orders FROM (
        |  SELECT l_suppkey, count(*) AS n_orders FROM ls a
        |  WHERE EXISTS (SELECT 1 FROM ls b
        |                WHERE b.l_orderkey = a.l_orderkey
        |                  AND b.l_suppkey <> a.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM lineitem c
        |                    WHERE c.l_orderkey = a.l_orderkey
        |                      AND c.l_suppkey <> a.l_suppkey
        |                      AND c.l_returnflag = 'R')
        |  GROUP BY l_suppkey) g
        |JOIN supplier ON s_suppkey = l_suppkey
        |ORDER BY n_orders DESC, s_suppkey LIMIT 20""".stripMargin,
    "q23_cube" ->
      s"""SELECT c_mktsegment, o_orderstatus, count(*) AS n_orders,
         |  ${osum("o_totalprice")} AS total
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY CUBE (c_mktsegment, o_orderstatus)
         |ORDER BY c_mktsegment ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,
    "q24_pivot" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q27_argmin" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE)
        |      / COUNT(*) AS avg_price
        |  FROM lineitem GROUP BY 1, 2),
        |b AS (SELECT * FROM ps
        |      QUALIFY row_number() OVER (PARTITION BY l_partkey
        |        ORDER BY avg_price, l_suppkey) = 1)
        |SELECT p_partkey, p_name, s_suppkey, s_name,
        |  round(avg_price, 4) AS avg_price
        |FROM b JOIN part ON p_partkey = l_partkey
        |       JOIN supplier ON s_suppkey = l_suppkey
        |WHERE p_type = 'PROMO'
        |ORDER BY p_partkey""".stripMargin,
    "q28_running" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        |    SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS dtot
        |  FROM orders GROUP BY 1)
        |SELECT day, CAST(ROUND(dtot, 2) AS DOUBLE) AS day_total,
        |  CAST(ROUND(SUM(dtot) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
        |    AS running_total
        |FROM daily ORDER BY day""".stripMargin,
    "q29_movavg" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    SUM(CAST(value AS DECIMAL(28,10))) AS dval, COUNT(*) AS n
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT day, n AS n_purchases,
        |  round(CAST(ROUND(SUM(dval) OVER w, 2) AS DOUBLE)
        |        / SUM(n) OVER w, 4) AS ma7
        |FROM daily
        |WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,
    "q30_gsets" ->
      s"""SELECT n_name, o_orderstatus,
         |  CAST(GROUPING(n_name, o_orderstatus) AS BIGINT) AS gid,
         |  count(*) AS n_orders, ${osum("o_totalprice")} AS total
         |FROM orders, customer, nation
         |WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
         |GROUP BY GROUPING SETS ((n_name, o_orderstatus), (n_name), (o_orderstatus))
         |ORDER BY gid, n_name NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q31_ntile" ->
      s"""SELECT tile, count(*) AS n_cust, ${osum("c_acctbal")} AS bal_total,
         |  min(c_acctbal) AS bal_min, max(c_acctbal) AS bal_max
         |FROM (SELECT c_custkey, c_acctbal,
         |        ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS tile
         |      FROM customer) t
         |GROUP BY tile ORDER BY tile""".stripMargin,
    "q32_setops" ->
      """SELECT nationkey, 'both' AS bucket FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT
        |  SELECT s_nationkey AS nationkey FROM supplier) a
        |UNION ALL
        |SELECT nationkey, 'cust_only' AS bucket FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT
        |  SELECT s_nationkey AS nationkey FROM supplier) b
        |ORDER BY bucket, nationkey""".stripMargin,
    "q33_fullouter" ->
      s"""WITH u AS (SELECT o_custkey, ${osum("o_totalprice")} AS urgent_spend
         |           FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
         |f AS (SELECT o_custkey, ${osum("o_totalprice")} AS final_spend
         |      FROM orders WHERE o_orderstatus = 'F' GROUP BY 1)
         |SELECT o_custkey, urgent_spend, final_spend,
         |  CASE WHEN urgent_spend IS NULL THEN 'final_only'
         |       WHEN final_spend IS NULL THEN 'urgent_only'
         |       ELSE 'both' END AS side
         |FROM u FULL OUTER JOIN f USING (o_custkey)
         |ORDER BY o_custkey""".stripMargin,
    "q22_anti_subq" ->
      s"""WITH t AS (
         |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,10))) AS DOUBLE)
         |           / COUNT(*) AS thr
         |  FROM customer WHERE c_acctbal > 0.0)
         |SELECT c_nationkey, count(*) AS numcust,
         |  ${osum("c_acctbal")} AS totacctbal
         |FROM customer c, t
         |WHERE c.c_acctbal > t.thr
         |  AND NOT EXISTS (SELECT 1 FROM orders o
         |                  WHERE o.o_custkey = c.c_custkey
         |                    AND o.o_orderpriority = '1-URGENT')
         |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
  )
}
