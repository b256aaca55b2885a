package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Runtime-filter demonstrations (SURVEY §2.2 extension, r3): the two
  * mechanisms that cut a 100 TB fact scan down to the partitions/rows a
  * selective dimension filter actually reaches, WITHOUT any literal
  * pushdown being possible at plan time —
  *
  *  - **Dynamic partition pruning**: the fact side is a
  *    partition-by-join-key table; Spark executes the filtered dim side
  *    first and injects the surviving join keys as a partition filter
  *    into the fact scan, so only matching partition directories are
  *    read at all. On a date- or tenant-partitioned 100 TB fact table
  *    this is the difference between scanning 5/25 of the data and all
  *    of it.
  *  - **Bloom-filter runtime filter** (`InjectRuntimeFilter`): for
  *    non-partition join keys, a bloom filter built from the dim side is
  *    applied row-wise at the fact scan. Demonstrated in PlanShapeSpec
  *    (thresholds lowered to fire at test scale); the plan contains
  *    `bloom_filter_agg`/`might_contain`.
  *
  * The reference has no analogue — its mappers always read every chunk
  * (`core/map_reduce.go` Map stage) — this is pure Spark-side gain.
  *
  * The partitioned fact is a [[graft.sources.Fixtures]] layout written
  * from the driver's own `customer` table (the values are identical, so
  * the DuckDB oracle runs over the original parquet).
  */
object RuntimeFilters {

  /** Partitioned copy of `customer` on the join key, written once and
    * reused while the source parquet is unchanged — the 100 TB analogue
    * is the fact table already living partitioned in the lake, so
    * steady-state timings exclude the one-time layout cost. */
  def partitionedCustomer(s: SparkSession, d: String): DataFrame = {
    val dir = graft.sources.Fixtures.dirFor("dpp_customer", d, "customer")
    if (!graft.sources.Fixtures.ready(dir))
      Tables.customer(s, d).write.mode("overwrite")
        .partitionBy("c_nationkey").parquet(dir)
    s.read.parquet(dir)
  }

  /** Customers-per-nation for ONE region, where the nation set is known
    * only at runtime (it comes through the region join): the customer
    * scan must be pruned by DYNAMIC partition pruning, not a static
    * predicate. PlanShapeSpec asserts `dynamicpruning` reaches the scan's
    * PartitionFilters. */
  def dppJoin(s: SparkSession, d: String): DataFrame = {
    val fact = partitionedCustomer(s, d)
    val dim = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).where(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    fact.join(broadcast(dim), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_custs"),
        Compat.xsum(col("c_acctbal")).as("total_acctbal"))
      .orderBy("n_name")
  }

  /** EXPLICIT bloom-filter semi-join (`q36_bloom`): the row-level twin of
    * [[dppJoin]]'s partition pruning, declared in the query instead of
    * left to `InjectRuntimeFilter`'s cost gates — the pattern for a
    * 100 TB fact joined on a NON-partition key to a selective dim:
    *
    *  1. one aggregate over the filtered dim builds a bloom filter of its
    *     join keys (Spark's own `BloomFilterAggregate`, exposed as
    *     `graft_bloom_agg`) — a scalar subquery, so the ~KB filter binary
    *     broadcasts to every fact task;
    *  2. `graft_might_contain` applies it row-wise ABOVE the fact scan,
    *     dropping non-matching rows BEFORE the join shuffle — at 0.1 %
    *     dim selectivity that is ~99.9 % of shuffled fact bytes gone;
    *  3. the real join removes the bloom's false positives, so the result
    *     is EXACTLY the plain join's (the oracle) — the filter changes
    *     bytes moved, never rows out.
    *
    * PlanShapeSpec pins the shape: might_contain sits in a Filter on the
    * lineitem side below the join. Keys hash through `xxhash64` (the
    * aggregate's LongType input contract, same as the injected filter). */
  def bloomJoin(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftFunctions.register(s)
    s.sql(
      s"""SELECT l_returnflag, count(*) AS n_rows,
         |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10)))
         |       AS DECIMAL(28,2)) AS DOUBLE) AS revenue
         |FROM (
         |  SELECT l_orderkey, l_returnflag, l_extendedprice, l_discount
         |  FROM parquet.`$d/lineitem.parquet`
         |  WHERE graft_might_contain(
         |    (SELECT graft_bloom_agg(xxhash64(o_orderkey))
         |     FROM parquet.`$d/orders.parquet` WHERE o_orderpriority = '1-URGENT'),
         |    xxhash64(l_orderkey))
         |) l
         |JOIN (SELECT o_orderkey FROM parquet.`$d/orders.parquet`
         |      WHERE o_orderpriority = '1-URGENT') o
         |  ON l.l_orderkey = o.o_orderkey
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin)
  }

  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map(
    "q25_dpp" -> ((s, d) => dppJoin(s, d)),
    "q36_bloom" -> ((s, d) => bloomJoin(s, d)),
  )

  val oracle: Map[String, String] = Map(
    "q25_dpp" ->
      s"""SELECT n_name, count(*) AS n_custs,
         |  ${Compat.osum("c_acctbal")} AS total_acctbal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    // the PLAIN join — the bloom pre-filter must be result-invisible
    "q36_bloom" ->
      s"""SELECT l_returnflag, count(*) AS n_rows,
         |  ${Compat.osum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin,
  )
}
