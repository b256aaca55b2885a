package graft

import graft.operators.Events
import graft.streaming.{Event, RegisterStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class RegisterStreamSpec extends SparkSpec {

  test("streamed register folds converge to the one-shot batch sketch; re-sent batch is a no-op") {
    val s = spark
    import s.implicits._
    val batchDf = Tables.events(spark, sf)
    val evs = batchDf
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_reg_stream").toString
    val path = s"$dir/registers"
    // seed with an empty store so the first fold creates the layout
    RegisterStream.seedRegisters(batchDf.where(lit(false)), path)

    val input = MemoryStream[Event](s)
    val q = RegisterStream.incrementalRegisters(input.toDF(), path)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      // three arbitrary micro-batches — the merged store must not care
      val (a, b) = evs.splitAt(evs.size / 3)
      val (b1, b2) = b.splitAt(b.size / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    // streamed store ≡ batch-computed registers (max-merge algebra)
    val streamed = RegisterStream.mergedRegisters(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val oneShot = Events.dailyRegisters(batchDf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == oneShot)

    // and the windowed estimates off the store equal the batch query's
    val fromStore = RegisterStream.rollingFromStore(spark, path)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batchQ = Events.rollingActiveHll(batchDf)
      .select((unix_micros(col("day")) / 86400000000L).cast("long").as("t"), col("approx_7d"))
      .where(col("approx_7d") > 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // store covers explode targets beyond the spine; compare on the spine
    assert(batchQ.forall { case (t, v) => fromStore.get(t).contains(v) },
      s"store estimates diverge: ${batchQ.filterNot { case (t, v) => fromStore.get(t).contains(v) }}")

    // re-delivering a batch (same batchId, same content — what
    // Structured Streaming replays after a failure) is a no-op
    def snapshot() = RegisterStream.mergedRegisters(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    RegisterStream.registerBatch(batchDf.limit(500), 99L, path)
    val before = snapshot()
    RegisterStream.registerBatch(batchDf.limit(500), 99L, path)
    assert(snapshot() == before)
  }
}
