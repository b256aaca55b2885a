package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan and timed row count for
  * one `SparkEntry.queries` entry.
  * Usage: runMain graft.Explain <queryName> [sfDir] */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Dials.init(spark, sfDir) // corpus-derived dial defaults
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(s"==== $name @ $sfDir ====")
    df.explain("formatted")
    val t0 = System.nanoTime()
    // execute THIS query's physical plan (df.count() would wrap it in a
    // new agg plan, leaving df's own AdaptiveSparkPlan un-finalized — the
    // post-run print below would show isFinalPlan=false forever)
    val n = df.queryExecution.executedPlan.execute().count()
    println(f"==== $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s ====")
    // the FINAL adaptive plan (visible only after execution) shows what
    // AQE actually did: ReusedExchange/ReusedSubquery, skew splits,
    // coalesced partitions
    println(s"==== $name final adaptive plan ====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
