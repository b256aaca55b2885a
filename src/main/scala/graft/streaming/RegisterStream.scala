package graft.streaming

import graft.operators.Events
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming maintenance of the per-day HLL register store — the
  * streaming face of `ev_rolling_hll` (SURVEY §2.6), in the
  * [[CorpusStream]] mold: the sketch state is a STORED parquet table
  * (it must outlive the query, be shared with batch jobs, and answer
  * windows the stream never asked about), not stream state. Each
  * micro-batch of events folds its own daily registers
  * ([[Events.dailyRegisters]]) under a `batch_id=<id>` partition; the
  * merged view max-aggregates across partitions.
  *
  * The algebra does the heavy lifting: register max-merge is
  * commutative, associative, AND idempotent, so the merged store is
  * independent of how the stream was split into micro-batches (spec:
  * replay-converged against the one-shot batch sketch) — and re-sent
  * batches are doubly safe: the dynamic-partition overwrite replaces
  * the batch's own partition (the [[CorpusStream]] idempotence
  * contract), and even a hypothetical duplicated fold would change
  * nothing, because max(x, x) = x. Exact distinct counts have neither
  * property — that asymmetry is the whole reason the rolling-window
  * metric ships as a sketch. */
object RegisterStream {

  /** Seed the store from an existing corpus (batch_id = -1). */
  def seedRegisters(existing: DataFrame, path: String): Unit =
    Events.dailyRegisters(existing).withColumn("batch_id", lit(-1L))
      .write.partitionBy("batch_id").mode(SaveMode.Overwrite).parquet(path)

  private[graft] def registerBatch(batch: DataFrame, batchId: Long, path: String): Unit =
    Events.dailyRegisters(batch).withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite).parquet(path)

  /** The streaming sink: fold each micro-batch's daily registers into
    * the store. */
  def incrementalRegisters(events: DataFrame, path: String): DataStreamWriter[Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      registerBatch(batch, batchId, path)
    }

  /** Merged daily registers across every fold — the (d, bucket, mx)
    * frame any trailing-window query starts from. */
  def mergedRegisters(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).groupBy("d", "bucket").agg(max("mx").as("mx"))

  /** Trailing-window estimates straight off the store — no events
    * re-read, the point of persisting sketches. */
  def rollingFromStore(spark: SparkSession, path: String): DataFrame =
    Events.rollingApprox(mergedRegisters(spark, path))
}
