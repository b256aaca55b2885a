package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * At cluster scale these would be partitioned/bucketed external tables;
  * here each is a single parquet file. All access goes through `spark.read
  * .parquet` so filter pushdown + column pruning reach the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` has shipped in three parquet flavors across testdata
    * regenerations; normalize all of them to a session-TZ `TimestampType`
    * in µs so downstream `unix_micros(ts)` always works:
    *
    *  - TIMESTAMP(NANOS): Spark 4 refuses to read it as a timestamp. Read
    *    nanos as long (legacy conf) and convert with exact integer
    *    division — ns epoch values exceed 2^53, so float division would
    *    corrupt them.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) → `TIMESTAMP_NTZ`: cast
    *    to `TimestampType`. The session TZ is UTC, so the cast is an
    *    exact relabel and matches the DuckDB oracle's
    *    `epoch_us(CAST(ts AS TIMESTAMP))`.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=true) → already `TimestampType`,
    *    pass through. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
