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

  /** Parallelism floor for a CPU-DOMINANT map stage (r16; guide §2.5
    * "input skew — unsplittable input: repartition immediately after
    * the read"). The bench-scale tables are ONE parquet row group each,
    * and a row group is one scan task no matter the session's cores —
    * so a map stage rooted at such a scan runs serially until its first
    * exchange. Where that stage is heavy per-row compute (the MinHash
    * shingle+signature pass, the PII regex bank, the language-marker
    * argmax), one deterministic round-robin exchange spreads the work
    * across the session and wins multiples; where the scan's work is
    * cheap (plain counts, one md5, projections) the exchange costs more
    * than it buys (measured: dedup_exact +0.5 s, the pipeline's
    * per-stage counts +0.2 s each) — so this is applied PER OPERATOR as
    * a measured decision, never table-wide. No-op whenever the input
    * already plans at least the session's parallelism (any production
    * layout, the ×1000 ladder tables) or the frame is mid-pipeline
    * (already exchanged/cached at session width). Results are
    * partitioning-independent everywhere by construction (the
    * two-phase-rank contract); the full oracle gate re-proves it.
    *
    * INPUT CONTRACT (r17, ADVICE r16): call this on SCAN-ROOTED frames
    * only (a read + row-local projections/filters). The probe below
    * forces `df.rdd`, and under AQE a frame with upstream EXCHANGES
    * resolves its final plan by eagerly RUNNING those shuffle stages —
    * silent execution at plan-build time. Every current call site is a
    * raw table/fixture scan; a mid-pipeline frame is already exchanged
    * at session width and needs no floor anyway. */
  def cpuFloored(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

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
