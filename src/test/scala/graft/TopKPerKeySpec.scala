package graft

import graft.plans.TopKPlans
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {

  test("topKPerKey: bounded heap keeps exactly the window form's rows, ranks included") {
    val s = spark
    import s.implicits._
    val d = Seq(
      // key 1: four rows — rank by (v desc, id asc); id 11 beats 12 on the 5.0 tie
      (1L, 11L, 5.0), (1L, 12L, 5.0), (1L, 13L, 9.0), (1L, 14L, 1.0),
      // key 2: fewer than k rows — all emit
      (2L, 21L, 3.0),
      // key 3: exactly k
      (3L, 31L, 2.0), (3L, 32L, 8.0), (3L, 33L, 4.0)
    ).toDF("k", "id", "v").repartition(4) // spread rows over map partitions
    val r = TopKPlans.topKPerKey(d, "k", "v", "id", 3, "rank")
      .select("k", "rank", "id", "v").orderBy("k", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(r == Seq(
      (1L, 1L, 13L, 9.0), (1L, 2L, 11L, 5.0), (1L, 3L, 12L, 5.0),
      (2L, 1L, 21L, 3.0),
      (3L, 1L, 32L, 8.0), (3L, 2L, 33L, 4.0), (3L, 3L, 31L, 2.0)), r.toString)
  }

  test("topKPerKey: NULL key/order/id mirror the window form (NULLS LAST, null key = own group)") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (Some(1L), Some(11L), Some(2.0)), (Some(1L), Some(12L), None),
      (None, Some(13L), Some(9.0)), (Some(1L), None, Some(9.0)),
      (Some(1L), Some(15L), Some(1.0)), (None, Some(16L), Some(3.0))
    ).toDF("k", "id", "v").repartition(3)
    val r = TopKPlans.topKPerKey(d, "k", "v", "id", 3, "rank")
      .select("k", "rank", "id").orderBy(col("k").asc_nulls_last, col("rank"))
      .as[(Option[Long], Long, Option[Long])].collect().toSeq
    // window semantics: v DESC NULLS LAST, id ASC NULLS LAST; NULL key
    // partitions together. k=1: null-id@9.0, 11@2.0, 15@1.0 (12@null v
    // falls past k=3); null key: 13@9.0, 16@3.0.
    assert(r == Seq(
      (Some(1L), 1L, None), (Some(1L), 2L, Some(11L)), (Some(1L), 3L, Some(15L)),
      (None, 1L, Some(13L)), (None, 2L, Some(16L))), r.toString)
    // and the window form agrees row for row
    val w = Window.partitionBy("k").orderBy(col("v").desc_nulls_last, col("id").asc_nulls_last)
    val decl = d.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3).select("k", "rank", "id")
      .orderBy(col("k").asc_nulls_last, col("rank"))
      .as[(Option[Long], Long, Option[Long])].collect().toSeq
    assert(r == decl, s"native=$r decl=$decl")
  }

  test("topKPerKey: double keys normalize -0.0/0.0 and NaN like the window form") {
    val s = spark
    import s.implicits._
    // -0.0 and 0.0 must land in ONE group; NaNs in one group
    val d = Seq(
      (0.0, 1L, 5.0), (-0.0, 2L, 7.0), (Double.NaN, 3L, 4.0),
      (Double.NaN, 4L, 6.0), (1.0, 5L, 1.0)
    ).toDF("k", "id", "v").repartition(3)
    val native = TopKPlans.topKPerKey(d, "k", "v", "id", 1, "rank")
      .select("id").orderBy("id").as[Long].collect().toSeq
    // one winner per normalized group: {±0.0}→id 2 (7.0), {NaN}→id 4
    // (6.0), {1.0}→id 5
    assert(native == Seq(2L, 4L, 5L), native.toString)
    // fewer than k non-null rows still all emit, ranks 1..n
    val few = Seq((1L, 1L, 2.0)).toDF("k", "id", "v")
    val fr = TopKPlans.topKPerKey(few, "k", "v", "id", 3, "rank")
      .select("rank").as[Long].collect().toSeq
    assert(fr == Seq(1L))
  }

  test("topKPerKey: partial-state cap flushes mid-partition without changing the answer") {
    val s = spark
    import s.implicits._
    // many interleaved keys in few partitions, so a tiny cap forces
    // several flush cycles per partition (same key spans cycles — the
    // final exec must merge its flushed candidate sets correctly)
    val d = (0 until 2000).map { i =>
      (i % 97L, i.toLong, ((i * 2654435761L) % 1009).toDouble)
    }.toDF("k", "id", "v").repartition(3)
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc_nulls_last)
    val expected = d.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 5).select("k", "rank", "id", "v")
      .orderBy("k", "rank").as[(Long, Long, Long, Double)].collect().toSeq
    spark.conf.set("spark.graft.topk.maxPartialEntries", "16")
    try {
      val r = TopKPlans.topKPerKey(d, "k", "v", "id", 5, "rank")
        .select("k", "rank", "id", "v").orderBy("k", "rank")
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(r == expected, s"flushed partial diverged from window form (${r.size} vs ${expected.size} rows)")
    } finally spark.conf.unset("spark.graft.topk.maxPartialEntries")
  }

  test("topKPerKey: partial/final split — two execs, the exchange sees only survivors") {
    val s = spark
    import s.implicits._
    val d = (1L to 1000L).map(i => (i % 5, i, (i % 97).toDouble))
      .toDF("k", "id", "v").repartition(8)
    val q = TopKPlans.topKPerKey(d, "k", "v", "id", 3, "rank")
    val plan = q.queryExecution.executedPlan.toString
    // node name prints without the Exec suffix
    assert("TopKPerKey\\b".r.findAllIn(plan).length == 2, plan)
    // partial below the exchange, final above: partitions(8)·keys(5)·k(3)
    // = ≤120 candidate rows cross the wire, not 1000
    val idx = plan.indexOf("ENSURE_REQUIREMENTS")
    assert(idx >= 0, "no exchange planned for the final ClusteredDistribution")
    assert(plan.indexOf("TopKPerKey") < idx, "final exec must sit above the exchange")
    assert(plan.indexOf("TopKPerKey", idx) > idx, "partial exec must sit below the exchange")
    // equivalence vs the declarative window form on the same data
    val native = q.select("k", "rank", "id").orderBy("k", "rank")
      .as[(Long, Long, Long)].collect().toSeq
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    val decl = d.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3).select("k", "rank", "id").orderBy("k", "rank")
      .as[(Long, Long, Long)].collect().toSeq
    assert(native == decl)
  }
}
