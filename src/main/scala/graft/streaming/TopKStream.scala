package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming maintenance of a per-key TOP-K store — the streaming face
  * of `q44_grouptopk` (the live "top 3 purchases per user" leaderboard
  * view), in the [[RegisterStream]] mold: state is a STORED parquet
  * table of per-batch LOCAL top-k candidate rows under `batch_id=<id>`
  * partitions, and the serving view re-ranks the candidates. That is
  * EXACTLY the algebra the native plan's PARTIAL exec runs per map
  * partition — with the store standing in for the exchange and
  * micro-batches standing in for map partitions.
  *
  * Why it converges: (value desc, event_id asc) is a TOTAL order, so
  * top-k is a selection aggregate — top-k(A ∪ B) =
  * top-k(top-k(A) ∪ top-k(B)) — and the merged view is independent of
  * how the stream was split into micro-batches (spec:
  * replay-converged against the one-shot batch ranking). Re-sent
  * batches replace their own partition (dynamic partition overwrite,
  * the [[CorpusStream]] idempotence contract), and an event belongs to
  * exactly one batch, so no id is ever double-counted.
  *
  * Scale: each fold writes ≤ keys·k candidate rows; the store holds
  * ≤ batches·keys·k rows between compactions, and compacting it is
  * the SAME top-k query over the store (run it, rewrite batch_id=-1)
  * — the changelog-compaction shape `ev_compact` documents, applied
  * to ranking state. */
object TopKStream {

  val K = 3

  /** Per-key local top-k candidates of one events frame — the partial
    * phase. Only purchases rank; rank itself is dropped (it is
    * batch-local and meaningless after merge). */
  private[graft] def candidates(batch: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id"))
    batch.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("r", row_number().over(w)).where(col("r") <= K).drop("r")
  }

  /** Seed the store from an existing corpus (batch_id = -1). */
  def seed(existing: DataFrame, path: String): Unit =
    candidates(existing).withColumn("batch_id", lit(-1L))
      .write.partitionBy("batch_id").mode(SaveMode.Overwrite).parquet(path)

  private[graft] def foldBatch(batch: DataFrame, batchId: Long, path: String): Unit =
    candidates(batch).withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite).parquet(path)

  /** The streaming sink: fold each micro-batch's local top-k into the
    * store. */
  def incrementalTopK(events: DataFrame, path: String): DataStreamWriter[Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      foldBatch(batch, batchId, path)
    }

  /** The serving view: re-rank the stored candidates — the final
    * phase. The input is ≤ batches·keys·k rows, never event-sized. */
  def topKFromStore(spark: SparkSession, path: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id"))
    spark.read.parquet(path)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= K)
      .select("user_id", "rank", "event_id", "value")
      .orderBy("user_id", "rank")
  }

  /** The batch twin the stream must converge to. */
  def batchTopK(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id"))
    events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= K)
      .select("user_id", "rank", "event_id", "value")
      .orderBy("user_id", "rank")
  }
}
