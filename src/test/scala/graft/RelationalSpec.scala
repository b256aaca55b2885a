package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  // Every declared query runs, has its declared deterministic shape, and
  // (except the deliberately-filtered ones) returns rows at sf0.001.
  private val mayBeEmpty = Set("q7_antijoin", "q10_having")

  for ((name, q) <- Relational.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and is non-degenerate") {
      val df = q(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      // re-running yields identical results (deterministic total order)
      val a = df.collect().toSeq
      val b = q(spark, sf).collect().toSeq
      assert(a == b, s"$name is not deterministic")
    }
  }

  test("q34_merge: deletes gone, updates applied, inserts present, keys unique") {
    import org.apache.spark.sql.functions._
    val m = operators.Relational.q34Merge(spark, sf)
    val snap = Tables.customer(spark, sf)
    // no deleted key survives, and no 'D' rows are emitted
    assert(m.where(col("op") === "D").count() == 0)
    assert(m.where(col("c_custkey") % 13 === 0 && col("c_custkey") < 10000000L).count() == 0)
    // every update key carries its bumped balance and tagged name
    assert(m.where(col("op") === "U" && !col("name").startsWith("upd_")).count() == 0)
    // inserts: one per %11 source key, offset into fresh key space
    val nIns = snap.where(col("c_custkey") % 11 === 0).count()
    assert(m.where(col("op") === "I").count() == nIns)
    assert(m.where(col("op") === "I" && col("c_custkey") < 10000000L).count() == 0)
    // merge output keys are unique (MERGE's cardinality contract)
    assert(m.groupBy("c_custkey").count().where(col("count") > 1).count() == 0)
  }

  test("q1_agg groups are the distinct (returnflag, linestatus) pairs") {
    val q1 = Relational.q1Agg(spark, sf)
    val pairs = Relational.q11Distinct(spark, sf).count()
    assert(q1.count() == pairs)
  }

  test("q13_outerjoin distribution sums to customer count") {
    import org.apache.spark.sql.functions._
    val total = Relational.q13OuterJoin(spark, sf)
      .agg(sum(col("custdist"))).collect()(0).getLong(0)
    assert(total == Tables.customer(spark, sf).count())
  }

  test("every query has a DuckDB oracle") {
    assert(Relational.queries.keySet == Relational.oracle.keySet)
  }

  test("q38_hll estimates distinct orderkeys within sketch error at sf0.001") {
    import org.apache.spark.sql.functions._
    val r = Relational.q38Hll(spark, sf).collect()
    assert(r.nonEmpty)
    for (row <- r) {
      val exact = row.getAs[Long]("exact_distinct")
      val err = row.getAs[Double]("rel_err")
      assert(exact > 0)
      // n/m ≈ 6 at sf0.001 sits below HLL's flat zone (no small-range
      // correction by design) — allow 3× the asymptotic 6.5% stderr
      assert(math.abs(err) < 0.35, s"rel_err $err too large (exact=$exact)")
    }
  }

  test("q33_fullouter covers every customer from either side exactly once") {
    import org.apache.spark.sql.functions._
    val r = Relational.q33FullOuter(spark, sf)
    val orders = Tables.orders(spark, sf)
    val expected = orders.where(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey")
      .union(orders.where(col("o_orderstatus") === "F").select("o_custkey"))
      .distinct().count()
    assert(r.count() == expected)
    assert(r.groupBy("o_custkey").count().where(col("count") > 1).count() == 0)
    // side tag is consistent with value nullability
    assert(r.where(col("side") === "both" &&
      (col("urgent_spend").isNull || col("final_spend").isNull)).count() == 0)
    assert(r.where(col("side") === "urgent_only" && col("final_spend").isNotNull).count() == 0)
    assert(r.where(col("side") === "final_only" && col("urgent_spend").isNotNull).count() == 0)
  }

  test("skyline: dominance edges — ties survive, duplicates survive, strict dominance removes") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val pts = Seq(
      (1L, 10.0, 5),  // skyline (cheapest)
      (2L, 10.0, 5),  // duplicate of 1 — neither dominates, both stay
      (3L, 10.0, 3),  // same price, smaller size → dominated by 1
      (4L, 20.0, 9),  // skyline (bigger than everything cheaper)
      (5L, 20.0, 9),  // duplicate of 4
      (6L, 30.0, 9),  // same size as 4, pricier → dominated
      (7L, 25.0, 7),  // dominated by 4 (cheaper AND bigger)
      (8L, 40.0, 12)) // skyline (max size)
      .toDF("p_partkey", "p_retailprice", "p_size")
    val got = Relational.skyline(pts).select("p_partkey").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 4L, 5L, 8L), s"got $got")
    // frontier is monotone: sizes strictly increase along increasing price levels
    val sky = Relational.skyline(pts).select("p_retailprice", "p_size")
      .distinct().orderBy("p_retailprice").as[(Double, Int)].collect()
    assert(sky.sliding(2).forall(w => w.length < 2 || w(1)._2 > w(0)._2))
  }

  test("mergeAgg: merged states equal full recompute where avg-of-avgs would be wrong") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // base: one order of 10; delta: three orders of 20 → true avg 17.5,
    // but avg-of-batch-avgs = (10 + 20) / 2 = 15
    val base = Seq((7L, 1L, 10.0)).toDF("o_custkey", "o_orderkey", "o_totalprice")
    val delta = Seq((7L, 97L, 20.0), (7L, 194L, 20.0), (7L, 291L, 20.0))
      .toDF("o_custkey", "o_orderkey", "o_totalprice")
    val got = Relational.mergeAgg(base, delta)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq((7L, 4L, 70.0, 17.5)), s"got $got")
    // empty delta: state passes through unchanged
    val none = Relational.mergeAgg(base, delta.where(lit(false)))
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(none == Seq((7L, 1L, 10.0, 10.0)), s"got $none")
  }

  test("q40_histq: estimate within one bucket width of exact; quantiles monotone per group") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val r = Relational.q40HistQuantile(spark, sf).cache()
    assert(r.count() == 3 * Relational.HqQs.size)
    // histogram guarantee: estimate and exact sit in the same bucket
    val widths = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(((max("l_extendedprice") - min("l_extendedprice")) /
        Relational.HqBuckets).as("w"))
    val bad = r.join(widths, "l_returnflag")
      .where(abs(col("est") - col("exact")) > col("w") + lit(1e-9))
    assert(bad.count() == 0, bad.collect().mkString("; "))
    // per group, higher p never yields a smaller estimate or exact value
    val ordered = r.orderBy("l_returnflag", "p")
      .select("l_returnflag", "est", "exact")
      .as[(String, Double, Double)].collect().grouped(Relational.HqQs.size)
    assert(ordered.forall(g => g.sliding(2).forall(w =>
      w.length < 2 || (w(1)._2 >= w(0)._2 && w(1)._3 >= w(0)._3))))
    r.unpersist()
  }

  test("q43_eageragg: three-level eager tree is result-identical to the flat join-agg") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val s = spark
    import s.implicits._
    val eager = Relational.q43EagerAgg(spark, sf)
      .as[(String, Double)].collect().toSeq
    // the flat form the oracle runs, built independently in Spark
    val flat = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, sf), col("c_custkey") === col("o_custkey"))
      .join(Tables.nation(spark, sf), col("n_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(28, 10))).cast(DecimalType(28, 2)).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
      .as[(String, Double)].collect().toSeq
    assert(eager.nonEmpty && eager == flat,
      s"eager=${eager.take(3)} flat=${flat.take(3)}")
    // the rewrite's point: lineitem collapses before any join — the plan
    // aggregates on l_orderkey below the orders join
    val plan = Relational.q43EagerAgg(spark, sf).queryExecution.optimizedPlan.toString
    assert(plan.contains("l_orderkey"), plan.take(500))
  }
}
