package graft

import graft.operators.Relational
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool (like [[SkewStress]]): measure the native partial/final
  * grouped top-k ([[graft.plans.TopKPlans.topKPerKey]], the
  * `q44_grouptopk` operator) against the declarative window form
  * (`row_number().over(...) <= k`) on the same orders table — the
  * native plan's claim is that the exchange carries only per-partition
  * survivors while the window form shuffles and sorts every row, so the
  * gap should WIDEN with scale and with per-key row count.
  *
  * Result-identity between the two forms is asserted per run (both
  * orderings are total), so the timing comparison can never silently
  * compare different answers.
  *
  * `--flood` (r9) reaches the MEMORY regime the plan's scaladoc claims
  * (a map partition much larger than the sort budget): a synthetic
  * frame floods 90% of its rows onto ONE key across 4 fat partitions,
  * and the JVM should be started with a small heap (e.g. -Xmx1536m,
  * SPARK_GRAFT_CPUS=4) so the window form's per-partition sort runs
  * under genuine memory pressure (UnsafeExternalSorter spills) while
  * the heap exec holds O(keys·k) state and never touches a sort
  * buffer. Row count via SPARK_GRAFT_FLOOD_ROWS (default 20 M).
  *
  * Usage: runMain graft.TopKStress <sfDir> [--flood]
  * Prints one JSON line per variant: {"variant":...,"sec":...}.
  */
object TopKStress {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val flood = args.contains("--flood")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base =
      if (flood) {
        // 90% of rows on key 0, the rest spread over 1000 keys; 4 fat
        // partitions so each map task sorts millions of rows. Values
        // are hash-derived, deterministic, unique-id tie-broken.
        val n = sys.env.getOrElse("SPARK_GRAFT_FLOOD_ROWS", "20000000").toLong
        spark.range(n).select(
            when(col("id") % 10 < 9, lit(0L))
              .otherwise(pmod(col("id"), lit(1000L))).as("o_custkey"),
            col("id").as("o_orderkey"),
            pmod(col("id") * 2654435761L, lit(1000003L)).cast("double")
              .as("o_totalprice"))
          .repartition(4)
      } else Tables.orders(spark, sfDir)
        .select("o_custkey", "o_orderkey", "o_totalprice")

    def time(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"variant":"$name","sec":$sec%.2f,"rows":$n}""")
      n
    }

    val k = Relational.GroupTopK
    // min-of-2 per variant, interleaved, cache dropped between runs
    var nativeRows = 0L
    var windowRows = 0L
    for (_ <- 1 to 2) {
      Cleanup.releaseAll(spark)
      nativeRows = time("native_partial_final") {
        graft.plans.TopKPlans
          .topKPerKey(base, "o_custkey", "o_totalprice", "o_orderkey", k, "rank")
          .count()
      }
      Cleanup.releaseAll(spark)
      windowRows = time("window_rank_filter") {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        base.withColumn("rank", row_number().over(w).cast("long"))
          .where(col("rank") <= k).count()
      }
    }
    require(nativeRows == windowRows,
      s"result divergence: native $nativeRows vs window $windowRows")
    // full result-identity, not just cardinality
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val diff = graft.plans.TopKPlans
      .topKPerKey(base, "o_custkey", "o_totalprice", "o_orderkey", k, "rank")
      .select("o_custkey", "rank", "o_orderkey")
      .exceptAll(base.withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= k).select("o_custkey", "rank", "o_orderkey"))
      .count()
    require(diff == 0L, s"result divergence: $diff native rows not in window form")
    println(s"""{"variant":"identity","diff":$diff}""")
    spark.stop()
  }
}
