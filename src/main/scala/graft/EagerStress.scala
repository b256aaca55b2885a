package graft

import graft.operators.Relational
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev tool (like [[TopKStress]]): measure the eager-aggregation
  * rewrite (`q43_eageragg` — lineitem collapsed per-order BEFORE any
  * join) against the flat join-then-aggregate form its oracle runs.
  * The claim under test: the first aggregate cuts the join input from
  * |lineitem| to |orders| rows before any exchange, so the eager tree
  * should win and the gap should track the lineitem:orders fan-in.
  * Result-identity is asserted per run (exact-decimal partials make
  * regrouping invisible), so the timing comparison can never compare
  * different answers.
  *
  * Usage: runMain graft.EagerStress <sfDir>
  * Prints one JSON line per variant: {"variant":...,"sec":...}.
  */
object EagerStress {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def flat = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, sfDir), col("c_custkey") === col("o_custkey"))
      .join(Tables.nation(spark, sfDir), col("n_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(28, 10))).cast(DecimalType(28, 2)).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

    def time(name: String)(f: => Array[(String, Double)]): Array[(String, Double)] = {
      val t0 = System.nanoTime()
      val r = f
      println(f"""{"variant":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      r
    }

    var eagerR: Array[(String, Double)] = Array.empty
    var flatR: Array[(String, Double)] = Array.empty
    val s2 = spark
    import s2.implicits._
    for (_ <- 1 to 2) {
      Cleanup.releaseAll(spark)
      eagerR = time("eager_three_level") {
        Relational.q43EagerAgg(spark, sfDir).as[(String, Double)].collect()
      }
      Cleanup.releaseAll(spark)
      flatR = time("flat_join_agg") { flat.as[(String, Double)].collect() }
    }
    require(eagerR.toSeq == flatR.toSeq,
      s"result divergence: ${eagerR.take(2).toSeq} vs ${flatR.take(2).toSeq}")
    println(s"""{"variant":"identity","rows":${eagerR.length}}""")
    spark.stop()
  }
}
