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
}
