package graft

import org.apache.spark.sql.DataFrame

/** Plan-shape regression guards: the scale claims in SURVEY §5, asserted
  * against the actual physical plans so they cannot silently rot.
  * Executed plans are built at sf0.001 — shapes, not timings. */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def exchanges(p: String): Int =
    "(?m)^\\s*[+:*-]*\\s*Exchange ".r.findAllIn(p).length

  test("no query in the suite plans a CartesianProduct") {
    // BroadcastNestedLoopJoin against a tiny broadcast side is the
    // intended shape for brute-force/centroid comparisons; an unbounded
    // CartesianProduct is never acceptable.
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val p = plan(fn(spark, sf))
      if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("map-only operators shuffle at most once (their boundary sort)") {
    // these claim "zero shuffles before the query-boundary sort"
    val mapOnly = Seq("dedup_minhash", "dedup_simhash_native", "ann_lsh",
      "text_langid", "text_quality", "text_tokencount", "text_fingerprint",
      "text_sample")
    for (name <- mapOnly) {
      val p = plan(SparkEntry.queries(name)(spark, sf))
      assert(exchanges(p) <= 1, s"$name should be map-only + one sort, got:\n$p")
    }
  }

  test("star-join dims broadcast, facts never build side") {
    val p = plan(SparkEntry.queries("q5_multijoin")(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("brute-force ANN broadcasts the query side, never shuffles the corpus vectors") {
    val p = plan(SparkEntry.queries("ann_bruteforce")(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // corpus vectors live only below the broadcast join; every exchange
    // above it carries (query_id, neighbor_id, cos) triples, so no
    // exchange row is wider than three columns of scalars
    val afterJoin = p.substring(p.indexOf("BroadcastNestedLoopJoin"))
    assert(!afterJoin.contains("Exchange hashpartitioning(neighbor_id"), p)
  }

  test("scan pushdown: filtered relational queries reach the parquet scan") {
    val p = plan(SparkEntry.queries("q6_scanagg")(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull"), p)
  }
}
