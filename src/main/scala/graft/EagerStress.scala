package graft

import graft.operators.Relational
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev tool (like [[TopKStress]]): measure the eager-aggregation
  * rewrite against the flat join-then-aggregate form its oracle runs —
  * BOTH regimes of the Yan-Larson applicability boundary:
  *
  *  - default: `q43_eageragg` (lineitem collapsed per-order before the
  *    joins) vs its flat form — the LOSING shape (15 M-key pre-agg, 25
  *    collapse-friendly final groups), kept as the boundary's far side;
  *  - `--mult`: `q45_eagermult` (events collapsed per-user before the
  *    row-multiplying events ⋈ orders join) vs ITS flat form — the
  *    winning shape (67:1 pre-agg fan-in, pair-count-sized flat join).
  *
  * Result-identity is asserted per run (exact-decimal partials make
  * regrouping invisible), so the timing comparison can never compare
  * different answers.
  *
  * Usage: runMain graft.EagerStress <sfDir> [--mult]
  * Prints one JSON line per variant: {"variant":...,"sec":...}.
  */
object EagerStress {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mult = args.contains("--mult")
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

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"""{"variant":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      r
    }

    // the flat pair-level form of q45_eagermult: the join MULTIPLIES
    // (67 events × ~10 orders per customer) and the aggregate runs over
    // the pair set — what the eager tree avoids materializing
    def flatMult = Tables.events(spark, sfDir)
      .join(Tables.orders(spark, sfDir).select("o_custkey", "o_orderpriority"),
        col("o_custkey") === col("user_id"))
      .groupBy("o_orderpriority")
      .agg(sum(col("value").cast(DecimalType(28, 10)))
          .cast(DecimalType(28, 2)).cast("double").as("ev_revenue"),
        count(lit(1)).as("n_pairs"))
      .orderBy("o_orderpriority")

    val s2 = spark
    import s2.implicits._
    if (mult) {
      var eagerR: Array[(String, Double, Long)] = Array.empty
      var flatR: Array[(String, Double, Long)] = Array.empty
      for (_ <- 1 to 2) {
        Cleanup.releaseAll(spark)
        eagerR = time("eager_mult") {
          Relational.q45EagerMult(spark, sfDir).as[(String, Double, Long)].collect()
        }
        Cleanup.releaseAll(spark)
        flatR = time("flat_mult") { flatMult.as[(String, Double, Long)].collect() }
      }
      require(eagerR.toSeq == flatR.toSeq,
        s"result divergence: ${eagerR.take(2).toSeq} vs ${flatR.take(2).toSeq}")
      println(s"""{"variant":"identity","rows":${eagerR.length}}""")
    } else {
      var eagerR: Array[(String, Double)] = Array.empty
      var flatR: Array[(String, Double)] = Array.empty
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
    }
    spark.stop()
  }
}
