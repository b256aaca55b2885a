package graft

import java.nio.file.Files

import graft.model.Doc
import graft.operators.Dedup
import graft.streaming.CorpusStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class CorpusStreamSpec extends SparkSpec {

  test("streaming incremental dedup replay-converges to batch incrementalPairs") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf)
    // even/odd split gives a dense enough fresh set at sf0.001 that
    // both pair sources (index probe AND within/across-batch) fire
    val existing = docs.where(pmod(col("doc_id"), lit(2)) =!= 0)
    val freshDf = docs.where(pmod(col("doc_id"), lit(2)) === 0)

    val tmp = Files.createTempDirectory("graft_corpus_stream").toString
    val batchIndex = s"$tmp/index_batch"
    val streamIndex = s"$tmp/index_stream"
    val pairsPath = s"$tmp/pairs"
    // the one-shot batch expectation (seeds batchIndex itself)
    val expected = Dedup.incrementalPairs(existing, freshDf, batchIndex)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture too sparse: no incremental pairs to converge on")

    // seed the stream's index with the SAME existing-corpus bands
    Dedup.minhashBanded(existing).write.parquet(streamIndex)

    // replay the fresh set in three micro-batches
    val fresh = freshDf.select("doc_id", "text", "lang", "source", "n_chars")
      .as[Doc].collect().toSeq
    val splits = fresh.grouped(math.max(1, fresh.size / 3 + 1)).toSeq
    val input = MemoryStream[Doc](s)
    val q = CorpusStream.incrementalDedup(input.toDF(), streamIndex, pairsPath)
      .start()
    try {
      for (chunk <- splits) {
        input.addData(chunk)
        q.processAllAvailable() // force a micro-batch boundary per chunk
      }
    } finally q.stop()

    val got = spark.read.parquet(pairsPath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"stream/batch divergence: missing=${expected -- got} extra=${got -- expected}")
    // and the folded index now covers the whole corpus: re-probing the
    // same fresh docs yields no NEW pairs beyond re-findings (idempotent
    // refresh — every candidate was already emitted)
    val again = spark.read.parquet(streamIndex).select("doc_id").distinct().count()
    assert(again == Dedup.minhashBanded(docs).select("doc_id").distinct().count())
  }

  test("streaming incremental clustering folds every batch into labels that match from-scratch") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf)
    val existing = docs.where(pmod(col("doc_id"), lit(2)) =!= 0)
    val freshDf = docs.where(pmod(col("doc_id"), lit(2)) === 0)

    val tmp = Files.createTempDirectory("graft_corpus_clust").toString
    val indexPath = s"$tmp/index"
    val labelsPath = s"$tmp/labels"
    val pairsPath = s"$tmp/pairs"
    // seed the stored state from the existing corpus, as production would
    Dedup.minhashBanded(existing).write.parquet(indexPath)
    Dedup.minhashClustersLS(existing).write.parquet(labelsPath)
    Cleanup.releaseAll(spark) // the seeding run's caller-must-clear

    val fresh = freshDf.select("doc_id", "text", "lang", "source", "n_chars")
      .as[Doc].collect().toSeq
    val splits = fresh.grouped(math.max(1, fresh.size / 3 + 1)).toSeq
    val input = MemoryStream[Doc](s)
    val before = s.sparkContext.getPersistentRDDs.keySet
    val q = CorpusStream.incrementalClusters(input.toDF(), indexPath, labelsPath, pairsPath)
      .start()
    try {
      for (chunk <- splits) { input.addData(chunk); q.processAllAvailable() }
    } finally q.stop()
    // storage hygiene: the stream released every block it pinned
    assert((s.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "stream left checkpoint blocks resident")

    // stored labels now equal clustering the WHOLE corpus from scratch
    val got = spark.read.parquet(labelsPath)
      .select("doc_id", "cluster_id", "is_canonical")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Dedup.minhashClustersLS(docs)
      .select("doc_id", "cluster_id", "is_canonical")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want,
      s"folded labels diverge from from-scratch: missing=${want -- got} extra=${got -- want}")
  }
}
