package graft

import graft.streaming.TopKStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (like [[SkewStress]]/[[TopKStress]]): replay a streaming
  * STORE fold at volume — the §5d streaming-state measurement VERDICT
  * r12 #7 asked for. The spec (TopKStreamSpec) pins the convergence
  * algebra at gate scale; this measures the two claims that only show
  * at volume, against the ×100 events table (10 M events):
  *
  *  - per-batch fold cost ∝ batch size (each fold is one window over
  *    the BATCH plus a ≤ keys·k candidate write — never a read of the
  *    store), so per-batch wall should stay flat across the replay;
  *  - the store stays candidate-bounded (≤ batches·keys·K rows, vs the
  *    10 M-row event history it replaces), and the serving view +
  *    compaction cost is store-sized, not history-sized.
  *
  * The replay splits events into `nBatches` contiguous event_id ranges
  * (an event belongs to exactly ONE batch — the foldBatch contract),
  * folds each with per-batch wall printed, then times the serving view
  * and a compaction pass, asserts the store bound, and verifies the
  * view ≡ the one-shot batch ranking (distributed except, no collect).
  *
  * Usage: runMain graft.StreamStress <sfDir> [nBatches]
  */
object StreamStress {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = Tables.events(spark, sfDir).persist()
    val n = ev.count()
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_stress").toString
    val path = s"$dir/topk"
    TopKStream.seed(ev.where(lit(false)), path)

    val bounds = ev.agg(min("event_id"), max("event_id")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val width = (hi - lo) / nBatches + 1
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val foldSecs = (0 until nBatches).map { i =>
      val b = ev.where(col("event_id") >= lo + i * width &&
        col("event_id") < lo + (i + 1) * width)
      val (_, s) = timed(TopKStream.foldBatch(b, i.toLong, path))
      println(f"[stream-stress] fold batch $i: $s%.2f s")
      s
    }

    val stored = spark.read.parquet(path)
    val storeRows = stored.count()
    val nKeys = stored.select("user_id").distinct().count()
    val bound = (nBatches + 1) * nKeys * TopKStream.K // +1: the empty seed
    assert(storeRows <= bound,
      s"store exceeded candidate bound: $storeRows > $bound")

    val (_, viewSecs) =
      timed(TopKStream.topKFromStore(spark, path).queryExecution.toRdd.count())
    // compaction = the store's own serving view rewritten as batch_id=-1
    // (the ev_compact changelog shape; TopKStreamSpec pins invariance)
    val (_, compactSecs) = timed {
      TopKStream.topKFromStore(spark, path)
        .select("user_id", "event_id", "value").withColumn("batch_id", lit(-1L))
        .write.partitionBy("batch_id").mode("overwrite").parquet(s"$dir/compacted")
    }
    val compactedRows = spark.read.parquet(s"$dir/compacted").count()

    // convergence at volume: view ≡ one-shot batch ranking (set equality
    // via two distributed excepts — the view is keys·K rows, never
    // collected)
    val view = TopKStream.topKFromStore(spark, path)
    val batch = TopKStream.batchTopK(ev)
    val diff = view.except(batch).count() + batch.except(view).count()
    assert(diff == 0, s"stream/batch divergence: $diff rows differ")

    println(f"""{"events":$n,"batches":$nBatches,"fold_min":${foldSecs.min}%.2f,"fold_max":${foldSecs.max}%.2f,"fold_total":${foldSecs.sum}%.2f,"store_rows":$storeRows,"bound":$bound,"keys":$nKeys,"view_sec":$viewSecs%.2f,"compact_sec":$compactSecs%.2f,"compacted_rows":$compactedRows,"converged":true}""")
    spark.stop()
  }
}
