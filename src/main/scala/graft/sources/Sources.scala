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

  /** Schema for the (doc_id, lang, text) round-trip fixtures. */
  private val DocSchema = StructType.fromDDL("doc_id BIGINT, lang STRING, text STRING")

  /** Per-language text-integrity summary used by the CSV/JSONL gate
    * keys: doc count, exact char total, and a content hash summed over
    * every document — a single flipped byte anywhere in any text
    * changes `sum_h`, so a hash-match proves the reader configuration
    * round-trips the corpus byte-exactly (quoting, escaping, encoding,
    * null handling). */
  private def integrity(docs: DataFrame): DataFrame =
    docs.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("sum_chars"),
        sum(graft.operators.Dedup.h32(lit("rt"), col("text"))).as("sum_h"))
      .orderBy("lang")

  /** Driver-gated CSV read path (`src_csv`): corpus staged as header CSV
    * (quote-all on write so delimiter/quote-bearing text stays exact),
    * read back with the EXPLICIT schema, integrity-summarized against
    * the parquet oracle. */
  def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = Fixtures.dirFor("src_csv", d, "documents")
    if (!Fixtures.ready(dir)) {
      val docs = graft.Tables.documents(s, d).select("doc_id", "lang", "text")
      // the reader under test is the splittable (non-multiLine) form, so
      // embedded line breaks would split records — refuse them loudly
      Fixtures.requireLineSafe(docs, "src_csv")
      docs.write.mode("overwrite")
        .option("header", "true").option("quoteAll", "true").csv(dir)
    }
    integrity(csv(s, dir, DocSchema))
  }

  /** Driver-gated JSONL read path (`src_jsonl`): same integrity contract
    * through the JSON-lines writer/reader pair. */
  def jsonlRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = Fixtures.dirFor("src_jsonl", d, "documents")
    if (!Fixtures.ready(dir))
      // JSON escapes \n, so line breaks in text are safe here
      graft.Tables.documents(s, d).select("doc_id", "lang", "text")
        .write.mode("overwrite").json(dir)
    integrity(jsonl(s, dir, DocSchema))
  }

  /** Driver-gated ORC read path (`src_orc`): the second columnar format
    * Spark ships natively (vectorized reader, predicate pushdown, column
    * pruning — same scan machinery as parquet). Binary formats don't
    * have CSV's quoting hazards, so the integrity gate here proves the
    * writer/reader pair and type mapping, closing the
    * parquet/ORC/CSV/JSONL/text matrix of built-in sources. */
  def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = Fixtures.dirFor("src_orc", d, "documents")
    if (!Fixtures.ready(dir))
      graft.Tables.documents(s, d).select("doc_id", "lang", "text")
        .write.mode("overwrite").orc(dir)
    integrity(s.read.schema(DocSchema).orc(dir))
  }

  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map(
    "src_csv"   -> ((s, d) => csvRoundtrip(s, d)),
    "src_jsonl" -> ((s, d) => jsonlRoundtrip(s, d)),
    "src_orc"   -> ((s, d) => orcRoundtrip(s, d)),
  )

  private val integritySql =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
      |  CAST(SUM(('0x' || substr(md5('rt:' || text), 1, 8))::BIGINT) AS BIGINT) AS sum_h
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  val oracle: Map[String, String] = Map(
    "src_csv"   -> integritySql,
    "src_jsonl" -> integritySql,
    "src_orc"   -> integritySql,
  )

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
