package graft.sinks

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Output surface (SURVEY §2.8): the layouts a 100 TB deployment writes,
  * chosen so DOWNSTREAM reads avoid work the layout already did.
  *
  *  - partitioned parquet → partition pruning: a reader filtering on the
  *    partition column scans only matching directories;
  *  - bucketed (+ sorted) tables → co-located joins and aggregations: two
  *    tables bucketed by the same key into the same bucket count join
  *    with NO shuffle exchange on either side (verified by plan assertion
  *    in SinksSpec AND driver-gated end to end by `q26_bucketed`) — the
  *    bucketing IS the shuffle, paid once at write;
  *  - plain sorted parquet → min/max zone skipping on the sort column.
  *
  * This is the Spark-native replacement for the reference's reducer-
  * output placement (`master/main.go` collects reducer files; here the
  * layout itself encodes the partitioning for the next job).
  */
object Sinks {

  /** Partitioned parquet directory — readers prune on `partitionCols`. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + in-bucket-sorted table registered in the catalog at
    * `path`. Joins/aggs on `bucketCol` between tables with equal bucket
    * counts need no exchange and no sort.
    *
    * The pre-write `repartition(buckets, bucketCol)` matters: bucket
    * assignment and DataFrame hash partitioning use the same Murmur3
    * pmod, so each write task holds exactly one bucket and emits ONE
    * file per bucket (a non-aligned write scatters every bucket across
    * every task). Note on sorts: since Spark 3.0 the bucketed scan does
    * not REPORT in-bucket order by default
    * (`spark.sql.legacy.bucketedTableScan.outputOrdering` — a planning
    * cost tradeoff), so a downstream merge join still plans in-partition
    * Sorts; they run exchange-free over already-sorted runs. The
    * eliminated shuffles are the scale win. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, buckets: Int): Unit =
    df.repartition(buckets, col(bucketCol))
      .write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Sorted single-layout parquet — parquet row-group min/max statistics
    * on the sort column give zone-skipping for range predicates. */
  def writeSorted(df: DataFrame, path: String, sortCol: String): Unit =
    df.sortWithinPartitions(sortCol).write.mode(SaveMode.Overwrite).parquet(path)

  /** Corpus-derived (Dials.joinBuckets): 8 at every gate scale, grows
    * with the fact table past ~64 M rows so per-bucket agg state stays
    * bounded (§5d-r12). Env override SPARK_GRAFT_JOIN_BUCKETS wins. */
  def JoinBuckets: Int = graft.Dials.joinBuckets

  /** Bucketed layout of one fact table, written once per (sf dir, source
    * stamp) and reused: the catalog entry is re-created per session (each
    * Verify/Bench session has a fresh in-memory catalog), the parquet
    * layout persists. This is the engine's DEFAULT fact read path for
    * join-key-heavy queries (q3/q13/q18/q21/q26): the bucketing IS the
    * join shuffle, paid once at write instead of per query — at 100 TB
    * the difference between re-shuffling the fact table for every query
    * and never. A table may carry layouts on several keys (orders on
    * o_orderkey for order joins AND o_custkey for customer joins) — the
    * multi-sort-order / projection technique columnar warehouses use. */
  def bucketedLayout(s: SparkSession, d: String, name: String, bucketCol: String,
                     src: (SparkSession, String) => DataFrame): DataFrame = {
    val path = graft.sources.Fixtures.dirFor(s"bkt${JoinBuckets}_${name}_$bucketCol", d, name)
    val table = s"graft_bkt_${name}_${bucketCol}_${graft.functions.Md5Hash.hex(d).take(8)}"
    if (graft.sources.Fixtures.ready(path)) {
      val cols = src(s, d).schema.fields
        .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      s.sql(s"""CREATE TABLE IF NOT EXISTS $table ($cols) USING parquet
               |CLUSTERED BY (`$bucketCol`) SORTED BY (`$bucketCol`)
               |INTO $JoinBuckets BUCKETS LOCATION '$path'""".stripMargin)
    } else writeBucketed(src(s, d), table, path, bucketCol, JoinBuckets)
    s.table(table)
  }

  def lineitemBucketed(s: SparkSession, d: String): DataFrame =
    bucketedLayout(s, d, "lineitem", "l_orderkey", Tables.lineitem)
  def ordersBucketed(s: SparkSession, d: String): DataFrame =
    bucketedLayout(s, d, "orders", "o_orderkey", Tables.orders)
  def ordersByCust(s: SparkSession, d: String): DataFrame =
    bucketedLayout(s, d, "orders", "o_custkey", Tables.orders)
  def customerBucketed(s: SparkSession, d: String): DataFrame =
    bucketedLayout(s, d, "customer", "c_custkey", Tables.customer)

  /** lineitem + orders co-bucketed on the order key (the layout
    * `q26_bucketed` gates and q3/q18/q21 read). */
  def bucketedFactTables(s: SparkSession, d: String): (DataFrame, DataFrame) =
    (lineitemBucketed(s, d), ordersBucketed(s, d))

  /** Co-located fact-fact join (SURVEY §2.8, driver-gated): lineitem ⋈
    * orders on the shared bucket key, aggregated per priority. The
    * `merge` hint pins SortMergeJoin (at gate scale orders would
    * auto-broadcast and hide the point); with both sides co-bucketed the
    * join runs with ZERO exchanges below it — the shuffle was paid once
    * at write time, which at 100 TB is the difference between
    * re-shuffling the fact table per query and never (the remaining
    * in-partition Sorts are exchange-free; see [[writeBucketed]]).
    * Plan-asserted in PlanShapeSpec. */
  def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    val (li, ord) = bucketedFactTables(s, d)
    li.hint("merge")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        graft.operators.Compat.xsum(col("l_extendedprice")).as("total_price"))
      .orderBy("o_orderpriority")
  }

  /** Morton Z-VALUE of two non-negative int keys: bit-interleave the low
    * [[ZBits]] bits of each (a's bit i → position 2i, b's → 2i+1). Pure
    * codegen'd shift/and/or chain — no UDF. 16 bits cover keys < 65,536
    * (every sf here; a production layout widens to 21 bits/dim, the
    * Delta OPTIMIZE ZORDER default, without changing shape). */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  val ZBits = 16
  val ZFiles = 16

  /** lineitem re-laid out along the (l_partkey, l_suppkey) Z-CURVE —
    * multi-dimensional clustering for data skipping, the layout move
    * (Delta/Iceberg `OPTIMIZE ZORDER`) for the 100 TB fact table that
    * serves range predicates on MORE THAN ONE column: a single-column
    * sort gives tight parquet min/max zones on that column only; sorting
    * by the interleaved-bit Morton value makes every file/row-group a
    * small RECTANGLE in (partkey, suppkey) space, so min/max stats are
    * tight on BOTH columns and a 2-D box predicate prunes most row
    * groups at scan time. The z column itself is dropped before the
    * write — the locality lives in the row ORDER, not in a stored key.
    * `repartitionByRange` on the z-value gives non-overlapping file
    * extents (each write task owns a contiguous z-range). */
  def lineitemZordered(s: SparkSession, d: String): DataFrame = {
    val path = graft.sources.Fixtures.dirFor(s"zorder${ZBits}_lineitem_ps", d, "lineitem")
    if (!graft.sources.Fixtures.ready(path)) {
      Tables.lineitem(s, d)
        .withColumn("__zv", zValue(col("l_partkey"), col("l_suppkey")))
        .repartitionByRange(ZFiles, col("__zv"))
        .sortWithinPartitions("__zv")
        .drop("__zv")
        .write.mode(SaveMode.Overwrite).parquet(path)
    }
    s.read.parquet(path)
  }

  // 2-D box, absolute keys so the same SQL text holds at every sf:
  // ~40%×60% of the key space at sf0.001, ~4%×6% at sf0.01
  val ZBoxP = (100, 180)
  val ZBoxS = (2, 7)

  /** Z-ORDER DATA-SKIPPING gate (`q37_zorder`, driver-gated): a 2-D box
    * aggregate served from the z-ordered layout. Result-invisible by
    * construction — the oracle runs the same query over the plain
    * table; the layout only changes WHICH row groups the scan reads
    * (SourcesSinksSpec asserts the skipping via scan metrics: the
    * z-layout scan materializes a fraction of the rows the linear
    * layout reads for the same predicate). */
  def zorderBoxAgg(s: SparkSession, d: String): DataFrame =
    lineitemZordered(s, d)
      .where(col("l_partkey").between(ZBoxP._1, ZBoxP._2) &&
        col("l_suppkey").between(ZBoxS._1, ZBoxS._2))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        graft.operators.Compat.xsum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")

  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map(
    "q26_bucketed" -> ((s, d) => bucketedJoin(s, d)),
    "q37_zorder"   -> ((s, d) => zorderBoxAgg(s, d)),
  )

  val oracle: Map[String, String] = Map(
    "q26_bucketed" ->
      s"""SELECT o_orderpriority, count(*) AS n_items,
         |  ${graft.operators.Compat.osum("l_extendedprice")} AS total_price
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // the layout is result-invisible: the oracle is the SAME box
    // aggregate over the plain table
    "q37_zorder" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${graft.operators.Compat.osum("l_quantity")} AS sum_qty
         |FROM lineitem
         |WHERE l_partkey BETWEEN ${ZBoxP._1} AND ${ZBoxP._2}
         |  AND l_suppkey BETWEEN ${ZBoxS._1} AND ${ZBoxS._2}
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
