package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming corpus maintenance — the r5 composition of the two r4
  * incremental-dedup pieces into the PRODUCTION corpus-refresh topology:
  * new documents arrive as a stream, are checked against the stored
  * corpus index, and become part of that index for every later arrival.
  *
  * Unlike the event twins (whose state lives in the state store), the
  * dedup state here IS the stored band index — a parquet table, not
  * stream state: it must outlive the query, be shared with batch jobs,
  * and scale with the corpus rather than the watermark horizon. The
  * stream therefore runs as a `foreachBatch` sink over three
  * batch-composable steps per micro-batch, reusing the exact operators
  * the batch path gates:
  *
  *  1. the batch's MinHash bands (map-only, [[Dedup.minhashBanded]]);
  *  2. candidate pairs = broadcast probe of the STORED index
  *     (new↔existing) ∪ within-batch self-join (new↔new), distinct —
  *     the same shape as [[Dedup.incrementalPairs]];
  *  3. APPEND the batch's bands to the index, so later micro-batches
  *     see this batch's documents as existing.
  *
  * Step 3 makes the emitted pair-set independent of how the fresh corpus
  * is split into micro-batches: a pair inside one batch surfaces from
  * its self-join, a pair across batches surfaces when the later doc
  * probes the index — so the union over ANY replay equals the one-shot
  * batch `incrementalPairs(existing, fresh)` (spec: replay-converged,
  * CorpusStreamSpec).
  *
  * Scale: per-batch cost ∝ batch size (signature pass + banded index
  * probe); the index is only ever appended to and the probe side
  * broadcasts, so the stored corpus is never reshuffled — the property
  * that makes a 100 TB corpus refresh affordable. Reference analogue:
  * /root/reference/core/map_reduce.go keeps reducer state alive across
  * rounds for the same reason.
  */
object CorpusStream {

  /** `foreachBatch` writer for a stream of new documents (`doc_id`,
    * `text`, …): emits candidate pairs to `pairsPath` (append) and
    * folds each batch into the band index at `indexPath`. The index
    * must be seeded with the existing corpus's bands before the query
    * starts (e.g. `Dedup.minhashBanded(existing).write.parquet(...)`). */
  /** One micro-batch's candidate pairs: broadcast probe of the stored
    * index (new↔existing) ∪ within-batch self-join (new↔new). */
  private def probePairs(bands: DataFrame, index: DataFrame): DataFrame = {
    val cross = broadcast(
      bands.select(col("doc_id").as("new_id"), col("band"), col("band_hash")))
      .join(index.select(col("doc_id").as("old_id"), col("band"), col("band_hash")),
        Seq("band", "band_hash"))
      .where(col("new_id") =!= col("old_id"))
      .select(least(col("new_id"), col("old_id")).as("doc_a"),
        greatest(col("new_id"), col("old_id")).as("doc_b"))
    val l = bands.select(col("doc_id").as("doc_a"), col("band"), col("band_hash"))
    val r = bands.select(col("doc_id").as("doc_b"), col("band"), col("band_hash"))
    val self = l.join(r, Seq("band", "band_hash"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    cross.unionAll(self).distinct()
  }

  def incrementalDedup(freshDocs: DataFrame, indexPath: String,
                       pairsPath: String): DataStreamWriter[Row] =
    freshDocs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      // computed once, used three times (probe, self-join, index append)
      val bands = Dedup.minhashBanded(batch).localCheckpoint(true)
      try {
        probePairs(bands, spark.read.parquet(indexPath))
          .write.mode(SaveMode.Append).parquet(pairsPath)
        // fold the batch into the corpus AFTER probing (probe-then-append
        // keeps within-batch pairs sourced from the self-join only)
        bands.write.mode(SaveMode.Append).parquet(indexPath)
      } finally bands.unpersist()
    }

  /** The FULL production corpus-refresh loop as a stream — the
    * streaming face of [[Dedup.incrementalClusters]]: per micro-batch,
    * probe + fold the band index (as [[incrementalDedup]]), then fold
    * the batch's pairs into the STORED cluster labels — old components
    * compressed to star edges (connectivity-exact), large-star/small-
    * star re-run over stars ∪ new pairs, labels table rewritten. After
    * any batch split of the fresh corpus, the stored labels equal the
    * from-scratch clustering of everything seen (CorpusStreamSpec).
    *
    * Per-batch cost ∝ |labels| + |batch pairs| — the old corpus is
    * never re-shingled; the label rewrite is the one corpus-sized
    * output, which production would keep as a versioned table. Storage
    * hygiene: every block this batch pinned (band/label checkpoints,
    * the CC loop's converged edges) is released before the batch ends —
    * a long-running refresh stream accumulates nothing. */
  def incrementalClusters(freshDocs: DataFrame, indexPath: String,
                          labelsPath: String, pairsPath: String): DataStreamWriter[Row] =
    freshDocs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      val pinned = spark.sparkContext.getPersistentRDDs.keySet
      val bands = Dedup.minhashBanded(batch).localCheckpoint(true)
      try {
        val pairs = probePairs(bands, spark.read.parquet(indexPath))
          .localCheckpoint(true)
        pairs.write.mode(SaveMode.Append).parquet(pairsPath)
        bands.write.mode(SaveMode.Append).parquet(indexPath)
        val labels = spark.read.parquet(labelsPath)
        val stars = labels.where(col("doc_id") =!= col("cluster_id"))
          .select(col("doc_id").as("doc_a"), col("cluster_id").as("doc_b"))
        val ids = labels.select("doc_id").unionAll(batch.select("doc_id")).distinct()
        // checkpoint BEFORE overwriting the path the plan read from
        val folded = Dedup.connectedComponents(
            ids, stars.unionAll(pairs.select("doc_a", "doc_b")).distinct())
          .localCheckpoint(true)
        folded.write.mode(SaveMode.Overwrite).parquet(labelsPath)
      } finally {
        val now = spark.sparkContext.getPersistentRDDs
        (now.keySet -- pinned).foreach(id => now.get(id).foreach(_.unpersist(false)))
      }
    }
}
