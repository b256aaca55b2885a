package graft

import graft.streaming.{Event, TopKStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

class TopKStreamSpec extends SparkSpec {

  test("streamed top-k folds converge to the batch ranking; store stays candidate-bounded") {
    val s = spark
    import s.implicits._
    val batchDf = Tables.events(spark, sf)
    val evs = batchDf
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_topk_stream").toString
    val path = s"$dir/topk"
    TopKStream.seed(batchDf.where(lit(false)), path)

    val input = MemoryStream[Event](s)
    val q = TopKStream.incrementalTopK(input.toDF(), path)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      val (a, b) = evs.splitAt(evs.size / 3)
      val (b1, b2) = b.splitAt(b.size / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    // selection-aggregate convergence: top-k(∪ of per-batch top-ks) ≡
    // top-k of everything, regardless of the split
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows(TopKStream.topKFromStore(spark, path)) ==
      rows(TopKStream.batchTopK(batchDf)))

    // the store holds candidates, not history: ≤ batches·keys·K rows
    val stored = spark.read.parquet(path)
    val nBatches = stored.select("batch_id").distinct().count()
    val nKeys = stored.select("user_id").distinct().count()
    assert(stored.count() <= nBatches * nKeys * TopKStream.K)

    // re-delivered batch (same id, same content) is a no-op.
    // LIMIT without an ordering is not stable across executions —
    // materialize the sample ONCE so both folds really see the same rows
    val redelivered = spark.createDataFrame(
      batchDf.limit(500).collect().toIndexedSeq.asJava, batchDf.schema)
    def snapshot() = rows(TopKStream.topKFromStore(spark, path))
    TopKStream.foldBatch(redelivered, 99L, path)
    val before = snapshot()
    TopKStream.foldBatch(redelivered, 99L, path)
    assert(snapshot() == before)

    // compaction: rewriting the store as its own top-k (batch_id = -1)
    // changes nothing the serving view returns
    val compacted = TopKStream.topKFromStore(spark, path)
      .select("user_id", "event_id", "value")
    val cdir = s"$dir/topk2"
    compacted.withColumn("batch_id", lit(-1L))
      .write.partitionBy("batch_id").mode("overwrite").parquet(cdir)
    assert(rows(TopKStream.topKFromStore(spark, cdir)) == before)
  }
}
