package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output surface (SURVEY §2.8): the layouts a 100 TB deployment writes,
  * chosen so DOWNSTREAM reads avoid work the layout already did.
  *
  *  - partitioned parquet → partition pruning: a reader filtering on the
  *    partition column scans only matching directories;
  *  - bucketed (+ sorted) tables → co-located joins and aggregations: two
  *    tables bucketed by the same key into the same bucket count join
  *    with NO shuffle exchange on either side (verified by plan assertion
  *    in SinksSpec) — the bucketing IS the shuffle, paid once at write;
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
    * counts need no exchange and no sort. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Sorted single-layout parquet — parquet row-group min/max statistics
    * on the sort column give zone-skipping for range predicates. */
  def writeSorted(df: DataFrame, path: String, sortCol: String): Unit =
    df.sortWithinPartitions(sortCol).write.mode(SaveMode.Overwrite).parquet(path)
}
