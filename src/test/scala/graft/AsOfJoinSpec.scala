package graft

import graft.operators.Events
import graft.plans.GraftPlans
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  private def ev = Tables.events(spark, sf)

  test("native as-of join: the custom physical operator actually plans") {
    val plan = Events.asofNative(ev).queryExecution.executedPlan.toString
    // the exec node renders as "AsOfJoin" (Spark strips the Exec suffix)
    assert(plan.contains("AsOfJoin "), s"native node missing from plan:\n$plan")
    // EnsureRequirements gave it the sort-merge-join treatment: both
    // children co-partition on the key and sort (key, time)
    assert("Exchange hashpartitioning\\((user_id|vuser)".r
      .findAllIn(plan).size >= 2, s"expected co-partitioning exchanges:\n$plan")
  }

  test("native as-of join: window edges, latest-wins, cross-user isolation, inner drop") {
    val s = spark
    import s.implicits._
    def t(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000)
    val left = Seq(
      (1L, 100L, t(50)),  // matches view at 50 (exact tie, inclusive) over 10
      (1L, 101L, t(49)),  // matches view at 10
      (2L, 102L, t(50)),  // user 2's only view is AFTER → drops
      (3L, 103L, t(50)))  // user 3 has no views → drops
      .toDF("user_id", "purchase_id", "ts")
    val right = Seq(
      (1L, t(10), 11L), (1L, t(50), 15L), (1L, t(60), 16L),
      (2L, t(51), 25L))
      .toDF("vuser", "vts", "view_id")
    val got = GraftPlans.asofJoin(left, right,
        key = ("user_id", "vuser"), time = ("ts", "vts"), payload = Seq("view_id"))
      .select("user_id", "purchase_id", "view_id")
      .orderBy("user_id", "purchase_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 100L, 15L), (1L, 101L, 11L)), s"got $got")
  }

  test("native as-of join: null keys and null times never match, never crash") {
    val s = spark
    import s.implicits._
    def t(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000)
    val left = Seq(
      (Some(1L), Some(t(50)), 100L),
      (None: Option[Long], Some(t(50)), 101L),    // null key → drops
      (Some(1L), None: Option[java.sql.Timestamp], 102L)) // null time → drops
      .toDF("user_id", "ts", "purchase_id")
    val right = Seq(
      (Some(1L), Some(t(10)), 11L),
      (None: Option[Long], Some(t(5)), 90L),      // null key: not a candidate
      (Some(1L), None: Option[java.sql.Timestamp], 91L)) // null time: not a candidate
      .toDF("vuser", "vts", "view_id")
    val got = GraftPlans.asofJoin(left, right,
        key = ("user_id", "vuser"), time = ("ts", "vts"), payload = Seq("view_id"))
      .select("purchase_id", "view_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((100L, 11L)), s"got $got")
  }

  test("native as-of over co-bucketed inputs plans ZERO exchanges") {
    // the operator's 100 TB claim: ClusteredDistribution is satisfied by
    // a bucketed layout, so the as-of join runs with no shuffle at all —
    // the exchanges were paid once at write time
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_bkt").toString
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts"))
    val views = ev.where(col("event_type") === "view")
      .groupBy(col("user_id").as("vuser"), col("ts").as("vts"))
      .agg(max(col("event_id")).as("view_id"))
    graft.sinks.Sinks.writeBucketed(purchases, "asof_p_bkt", s"$dir/p", "user_id", 4)
    graft.sinks.Sinks.writeBucketed(views, "asof_v_bkt", s"$dir/v", "vuser", 4)
    try {
      val joined = graft.plans.GraftPlans.asofJoin(
        s.table("asof_p_bkt"), s.table("asof_v_bkt"),
        key = ("user_id", "vuser"), time = ("ts", "vts"), payload = Seq("view_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin "), plan)
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
      // and it still computes the right thing
      val expected = Events.asofNative(ev).count()
      assert(joined.count() == expected)
    } finally {
      s.sql("DROP TABLE IF EXISTS asof_p_bkt")
      s.sql("DROP TABLE IF EXISTS asof_v_bkt")
    }
  }

  test("native as-of result equals the declarative window formulation on the corpus") {
    val native = Events.asofNative(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val declarative = Events.asofAttribution(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(native == declarative)
    assert(native.nonEmpty)
  }
}
