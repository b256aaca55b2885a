package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingestion surface beyond the driver's parquet tables (SURVEY §2.8).
  *
  * The reference engine's input path is raw text files, concatenated and
  * split into fixed-size chunks that are then mapped independently
  * (`core/utils.go:320-343`, CHUNK_SIZE=32768; replication and S3
  * staging around it are subsumed by the cluster file system). These
  * readers re-express that surface Spark-first:
  *
  *  - line/whole-file readers are plain `spark.read.text` scans — Spark's
  *    FileSourceScan already does the reference's chunk-placement job
  *    (splits, locality, replication) via the storage layer;
  *  - [[chunked]] reproduces the reference's fixed-size-chunk DATA MODEL
  *    (including its split-token boundary artifact) per document. Note
  *    one deliberate divergence: the reference concatenates ALL input
  *    files into a single string before slicing (`core/utils.go`
  *    `strings.Join(filesData, "")`), so its chunk boundaries can also
  *    merge/split tokens ACROSS file boundaries, and depend on file
  *    enumeration order; per-document chunking keeps the intra-document
  *    boundary-split semantics while staying deterministic and
  *    embarrassingly parallel.
  */
object Sources {

  /** One row per line with its source file — `spark.read.text` scan;
    * splittable, predicate/projection pushdown applies. */
  def textLines(spark: SparkSession, dir: String): DataFrame =
    spark.read.text(dir)
      .select(input_file_name().as("path"), col("value").as("line"))

  /** One row per file (wholetext) — the per-document shape. */
  def textFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(dir)
      .select(input_file_name().as("path"), col("value").as("text"))

  /** Header CSV with an EXPLICIT schema — `inferSchema` is banned at
    * scale (it is a full extra pass over the data before the real one). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** JSON-lines with an explicit schema (same no-inference rule; schema
    * also prunes the parse to the projected fields). */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Fixed-size chunking of a (doc_id, text) corpus — the reference's
    * chunkization (`core/utils.go:320-343`) as a per-row transform:
    * doc i yields ceil(len/chunkSize) chunks, (doc_id, chunk_no, chunk).
    * Chunk boundaries may split a token, exactly as the reference's byte
    * chunking does; downstream tokenization then sees the same split
    * tokens. Map-only: one generator per row, no shuffle. */
  def chunked(docs: DataFrame, chunkSize: Int): DataFrame = {
    val nChunks = ceil(length(col("text")).cast("double") / chunkSize).cast("int")
    val idx = when(col("nc") > 0, sequence(lit(0), col("nc") - 1))
      .otherwise(array().cast("array<int>"))
    docs
      .select(col("doc_id"), col("text"), nChunks.as("nc"))
      .select(col("doc_id"),
        posexplode(transform(idx,
          i => col("text").substr(i * chunkSize + 1, lit(chunkSize))))
          .as(Seq("chunk_no", "chunk")))
      .where(col("chunk") =!= "")
  }
}
