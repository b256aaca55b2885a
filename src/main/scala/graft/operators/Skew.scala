package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-key (skew) handling for shuffle joins. AQE's skew-join split
  * handles most skew at runtime; explicit SALTING is the static form for
  * the pathological case — one key carrying an unbounded share of the
  * fact side, where even a split partition must still co-locate the key.
  *
  * `saltedJoin` spreads every join key over `salts` shuffle partitions:
  * the fact side gets a deterministic per-row salt, the build side is
  * replicated once per salt value, and the join runs on (key, salt).
  * The result set is IDENTICAL to the unsalted join — `q20_salted`'s
  * oracle is the plain join SQL, so the equivalence is machine-checked,
  * not asserted. */
object Skew {

  /** Equi-join `fact.factKey = dim.dimKey` with `salts`-way key spreading.
    * `factSalt` must be deterministic per fact row (any hash of fact
    * columns); it never escapes the join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                 factSalt: Column, salts: Int): DataFrame = {
    val sf = fact.withColumn("__salt", pmod(factSalt, lit(salts)))
    val sd = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    sf.join(sd, col(factKey) === col(dimKey) && sf("__salt") === sd("__salt"))
      .drop("__salt")
  }

  /** TARGETED salting — the form that scales when the dim side is
    * fact-sized: [[saltedJoin]] replicates the WHOLE dim once per salt
    * (8× a 15 M-row orders table is more work than the skew it cures),
    * so production salting splits the fact on a known hot-key set and
    * salts ONLY that slice; the dim replicates just its hot rows
    * (|hotKeys|·salts rows) and the cold 80 % joins plain. Result
    * identical to the plain join (SkewSpec; SkewStress measures the
    * wall-clock side against plain and AQE at 100×). */
  def saltedJoinHot(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                    factSalt: Column, hotKeys: Seq[Long], salts: Int): DataFrame = {
    val hotF = fact.where(col(factKey).isin(hotKeys: _*))
      .withColumn("__salt", pmod(factSalt, lit(salts)))
    val hotD = dim.where(col(dimKey).isin(hotKeys: _*))
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    val hot = hotF.join(hotD, col(factKey) === col(dimKey) && hotF("__salt") === hotD("__salt"))
      .drop("__salt")
    val cold = fact.where(!col(factKey).isin(hotKeys: _*))
      .join(dim, col(factKey) === col(dimKey))
    hot.unionByName(cold)
  }

  /** Salted fact⋈dim aggregate: lineitem revenue per order priority.
    * Functionally the plain join; physically each l_orderkey spreads
    * over 8 shuffle partitions. MECHANISM demo: whole-dim replication is
    * measured WORSE than both AQE and targeted salting beyond toy dims
    * (SkewStress, SURVEY §5c-r6: 33.3 s vs 26.2 s vs 9.8 s at 100×) —
    * the RECOMMENDED production form is [[q35SaltedHot]]. */
  def q20Salted: (SparkSession, String) => DataFrame = (s, d) => {
    import Compat._
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_linenumber"))
    val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
    saltedJoin(li, ord, "l_orderkey", "o_orderkey",
        hash(col("l_orderkey"), col("l_linenumber")), salts = 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"), xsum(col("l_extendedprice")).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** Heavy hitters collected by the hot-key pre-pass: top keys by fact
    * row count. TINY by construction (the pre-pass is one map-side-
    * combined aggregate; only these N ids reach the driver — the
    * standard heavy-hitter detection step real salting deploys run
    * from table stats). */
  val HotTopN = 3
  val HotSalts = 8

  /** `q35_salted_hot`: the RECOMMENDED skew pattern, gated — TARGETED
    * hot-key salting ([[saltedJoinHot]]): a heavy-hitter pre-pass finds
    * the [[HotTopN]] heaviest fact keys, ONLY that slice is salted
    * [[HotSalts]] ways (the dim replicates just its hot rows —
    * N·salts rows, not the whole table), and the cold remainder joins
    * plain. Same aggregate and plain-join oracle as `q20_salted`, so
    * result-identity is machine-checked; SkewStress measures the
    * wall-clock side (targeted 9.8 s vs whole-dim 33.3 s at 100×). */
  def q35SaltedHot: (SparkSession, String) => DataFrame = (s, d) => {
    import Compat._
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_linenumber"))
    val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
    val hot = li.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("l_orderkey")).limit(HotTopN)
      .collect().map(_.getLong(0)).toSeq
    saltedJoinHot(li, ord, "l_orderkey", "o_orderkey",
        hash(col("l_orderkey"), col("l_linenumber")), hot, HotSalts)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"), xsum(col("l_extendedprice")).as("revenue"))
      .orderBy("o_orderpriority")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q20_salted" -> q20Salted, "q35_salted_hot" -> q35SaltedHot)

  /** The PLAIN join — salting (whole-dim or targeted) must be invisible
    * in the result. */
  private val plainJoinSql =
    s"""SELECT o_orderpriority, count(*) AS n_lines,
       |  ${Compat.osum("l_extendedprice")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val oracle: Map[String, String] = Map(
    "q20_salted" -> plainJoinSql,
    "q35_salted_hot" -> plainJoinSql,
  )
}
