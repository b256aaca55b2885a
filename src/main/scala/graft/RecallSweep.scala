package graft

import org.apache.spark.sql.SparkSession

/** Recall-vs-cost sweep for `ann_graph_search` — measures recall@5
  * against the exact brute-force ground truth across the three
  * traversal dials (beam width, beam rounds, graph degree) so a user
  * can pick an operating point instead of inheriting the gate's demo
  * setting. The GATE is unchanged (it pins the traversal mechanism at
  * the default dials); this main is the measurement harness whose
  * results land in SURVEY §5c.
  *
  * Usage: runMain graft.RecallSweep <sfDir> [beam,rounds,degree ...]
  * With no combos given, sweeps beam ∈ {8,16,32} × rounds ∈ {4,6} ×
  * degree ∈ {3,8}. The literal combo `derived` evaluates the
  * corpus-derived [[Dials]] operating point (r13) — the production
  * default a user actually gets. Prints one line per combo:
  * `sweep beam=B rounds=R degree=D recall@5=X secs=S` (secs = full
  * build+search wall, cold caches per combo — the honest per-dial
  * cost; the build dominates, so marginal query cost is far lower).
  *
  * `SPARK_GRAFT_RECALL_SAMPLE=k` restricts the exact ground truth to
  * queries with `query_id % k == 0` (an unbiased recall estimate over
  * a 1/k query sample) — what makes the sweep runnable at the ×100
  * corpus, where full-truth brute force is 200 k × 200 k cosines but a
  * sampled truth is 1/k of that; the predicate is on the window's own
  * partition key, so Catalyst pushes it below the rank window into the
  * broadcast join's query side and the pruning is real, not cosmetic.
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Dials.init(spark, sfDir)
    val em = Tables.embeddings(spark, sfDir)

    import operators.Similarity
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val sample = sys.env.getOrElse("SPARK_GRAFT_RECALL_SAMPLE", "1").toLong
    val truth: Map[Long, Set[Long]] = Similarity.bruteForce(em)
      .where(pmod(col("query_id"), lit(sample)) === 0)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val denom = truth.valuesIterator.map(_.size).sum.toDouble
    println(s"truth over ${truth.size} queries (sample 1/$sample)")

    val combos: Seq[(Int, Int, Int)] =
      if (args.length > 1) args.drop(1).toSeq.map {
        case "derived" => (Dials.graphBeam, Dials.graphRounds, Dials.graphDegree)
        case s => val Array(b, r, d) = s.split(","); (b.toInt, r.toInt, d.toInt)
      }
      else for { d <- Seq(3, 8); b <- Seq(8, 16, 32); r <- Seq(4, 6) }
        yield (b, r, d)

    for ((b, r, d) <- combos) {
      Cleanup.releaseAll(spark)
      val t0 = System.nanoTime()
      val got = Similarity.graphSearch(em, b, r, d).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      // recall estimated over the sampled-truth queries only
      val hits = got.count(x => truth.getOrElse(x.getLong(0), Set.empty)
        .contains(x.getLong(2)))
      println(f"sweep beam=$b rounds=$r degree=$d " +
        f"recall@5=${hits / denom}%.3f secs=$secs%.1f")
    }
    Cleanup.releaseAll(spark)
    spark.stop()
  }
}
