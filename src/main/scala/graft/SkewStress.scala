package graft

import graft.operators.Skew
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (like [[ScaleUp]]): measure hot-key join skew for real —
  * plain join (no AQE), AQE-only (runtime skew split), whole-dim
  * salting ([[Skew.saltedJoin]], the q20 demo shape), and targeted
  * hot-key salting ([[Skew.saltedJoinHot]], the production shape).
  *
  * Fixture: the given sf dir's lineitem with ~`hotFrac` of rows remapped
  * to ONE existing orderkey (deterministic hash choice), joined back to
  * the UNMODIFIED orders table — one key carrying a constant fraction of
  * the fact no matter the scale, which is exactly the case AQE's
  * same-key split cannot shrink below the key's own width and salting
  * exists for. All four variants compute the identical q20-style
  * aggregate; row-identity across variants is asserted per run.
  *
  * Usage: runMain graft.SkewStress <sfDir> [hotFrac=0.2] [salts=8]
  * Prints one JSON line per variant: {"variant":...,"sec":...}.
  */
object SkewStress {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val hotFrac = if (args.length > 1) args(1).toDouble else 0.2
    val salts = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = spark.conf

    // ---- fixture: remap ~hotFrac of lineitem rows onto one hot key ----
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority")
    val hotKey = ord.agg(min("o_orderkey")).collect()(0).getLong(0)
    val mod = math.max(1L, math.round(1.0 / hotFrac))
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_linenumber"))
      .withColumn("l_orderkey",
        when(pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(mod)) === 0, lit(hotKey))
          .otherwise(col("l_orderkey")))
    val skewDir = s"${System.getProperty("java.io.tmpdir")}/graft_skew_fixture"
    li.write.mode(SaveMode.Overwrite).parquet(skewDir)
    val fact = spark.read.parquet(skewDir)
    val nRows = fact.count()
    val nHot = fact.where(col("l_orderkey") === hotKey).count()
    System.err.println(f"[skew] fixture: $nRows rows, hot key $hotKey carries $nHot (${100.0 * nHot / nRows}%.1f%%)")

    def agg(joined: DataFrame): DataFrame = {
      import graft.operators.Compat._
      joined.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"), xsum(col("l_extendedprice")).as("revenue"))
        .orderBy("o_orderpriority")
    }
    val salt = hash(col("l_orderkey"), col("l_linenumber"))
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "plain_noaqe" -> (() => agg(fact.join(ord, col("l_orderkey") === col("o_orderkey")))),
      "aqe_only"    -> (() => agg(fact.join(ord, col("l_orderkey") === col("o_orderkey")))),
      "salt_all"    -> (() => agg(Skew.saltedJoin(fact, ord, "l_orderkey", "o_orderkey", salt, salts))),
      "salt_hot"    -> (() => agg(Skew.saltedJoinHot(fact, ord, "l_orderkey", "o_orderkey", salt, Seq(hotKey), salts))),
    )

    var expect: Option[Seq[String]] = None
    val lines = variants.map { case (name, mk) =>
      // AQE off isolates the unsplit hot partition; every other variant
      // runs the session defaults (AQE on, skew split available).
      c.set("spark.sql.adaptive.enabled", (name != "plain_noaqe").toString)
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1") // orders must never broadcast
      Cleanup.releaseAll(spark)
      val t0 = System.nanoTime()
      val rows = mk().collect().map(_.toString).toSeq
      val sec = (System.nanoTime() - t0) / 1e9
      expect match {
        case None => expect = Some(rows)
        case Some(e) => require(rows == e, s"$name diverged from plain join result")
      }
      f"""{"variant":"$name","sec":$sec%.2f,"salts":$salts}"""
    }
    lines.foreach(println)
    spark.stop()
  }
}

/** Dev tool: the hot-USER interval-join claim measured for real.
  * [[graft.operators.Events.intervalJoin]]'s scaladoc says per-user
  * fan-out (Σ_user |P_u|·|C_u|) makes a hot user "AQE skew-split
  * territory" — this harness builds that user and times the claim.
  *
  * Fixture: the sf dir's events with ~`hotFrac` of ALL rows remapped to
  * ONE existing user (deterministic hash choice) — the hot user's
  * pair-evaluation product grows quadratically in hotFrac while total
  * rows stay fixed, exactly the workload an organic hot account (a bot,
  * a load tester) creates in an event lake. Both variants compute the
  * identical interval join; the (row count, Σclicks, Σvalue) summary is
  * asserted identical across variants (AQE must never change results).
  *
  * Usage: runMain graft.IntervalSkew <sfDir> [hotFrac=0.01]
  * Prints one JSON line per variant: {"variant":...,"sec":...}.
  */
object IntervalSkew {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val hotFrac = if (args.length > 1) args(1).toDouble else 0.01
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = spark.conf

    val ev0 = Tables.events(spark, sfDir)
    val hotUser = ev0.agg(min("user_id")).collect()(0).getLong(0)
    val mod = math.max(1L, math.round(1.0 / hotFrac))
    val skewDir = s"${System.getProperty("java.io.tmpdir")}/graft_evskew_fixture"
    ev0.withColumn("user_id",
        when(pmod(hash(col("event_id")), lit(mod)) === 0, lit(hotUser))
          .otherwise(col("user_id")))
      .write.mode(SaveMode.Overwrite).parquet(skewDir)
    val ev = spark.read.parquet(skewDir)
    val nHot = ev.where(col("user_id") === hotUser).count()
    System.err.println(f"[evskew] hot user $hotUser carries $nHot of ${ev.count()} events")

    def summarize(df: DataFrame): Seq[String] = {
      import graft.operators.Compat._
      df.agg(count(lit(1)), xsum(col("n_clicks")), xsum(col("click_value")))
        .collect().map(_.toString).toSeq
    }
    var expect: Option[Seq[String]] = None
    val variants: Seq[(String, DataFrame => DataFrame)] = Seq(
      ("plain_noaqe", graft.operators.Events.intervalJoin _),
      ("aqe_only",    graft.operators.Events.intervalJoin _),
      // the r8 native trailing-window exec: O(|L|+|R|), no pair work
      ("native_exec", graft.operators.Events.intervalNative _))
    val lines = variants.map { case (name, mk) =>
      c.set("spark.sql.adaptive.enabled", (name != "plain_noaqe").toString)
      Cleanup.releaseAll(spark)
      val t0 = System.nanoTime()
      val rows = summarize(mk(ev))
      val sec = (System.nanoTime() - t0) / 1e9
      expect match {
        case None => expect = Some(rows)
        case Some(e) => require(rows == e, s"$name diverged from plain result")
      }
      f"""{"variant":"$name","sec":$sec%.2f,"hotFrac":$hotFrac}"""
    }
    lines.foreach(println)
    spark.stop()
  }
}
