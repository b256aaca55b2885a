package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *    (including its split-token boundary artifact) per document —
  *    deterministic and embarrassingly parallel, the recommended shape;
  *  - [[concatChunked]] (r8) reproduces the reference's FULL semantic:
  *    all inputs concatenated into ONE stream before slicing
  *    (`core/utils.go:330-343` `strings.Join(filesData, "")`), so chunk
  *    boundaries also merge the last token of doc i with the first of
  *    doc i+1 and split tokens at global offsets — implemented as a
  *    distributed prefix-sum, never a driver-side concatenation.
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

  /** Driver-gated AVRO read path (`src_avro`, r11) — the ROW-oriented
    * binary interchange format next to the columnar pair (parquet/ORC):
    * what Kafka pipelines and schema registries ship, and the one
    * mainstream format that was missing from the source matrix. Spark 4
    * bundles the avro datasource implementation (`org.apache.spark.sql
    * .avro`, inside spark-sql — addressed by class name, see
    * [[AvroFormat]]); the
    * fixture round-trips the corpus through the Avro writer/reader with
    * the same byte-exact integrity contract as the CSV/JSONL/ORC/XML
    * keys. Avro-specific hazards the gate proves out: the
    * Catalyst↔Avro type mapping (long/string nullability maps to Avro
    * unions with null) and UTF-8 round-tripping through Avro's own
    * string encoding.
    *
    * Scale note: Avro files are splittable on block boundaries (the
    * sync-marker design), so the scan parallelizes like the text
    * sources — but it is a ROW format: no column pruning, no predicate
    * pushdown, every byte decodes even for a 2-column projection. The
    * production rule this key documents: ingest Avro once, convert to
    * parquet/ORC for the analytic path (`sinks`), never scan Avro
    * repeatedly. */
  def avroRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = Fixtures.dirFor("src_avro", d, "documents")
    if (!Fixtures.ready(dir))
      graft.Tables.documents(s, d).select("doc_id", "lang", "text")
        .write.mode("overwrite").format(avroFormat).save(dir)
    integrity(s.read.schema(DocSchema).format(avroFormat).load(dir))
  }

  /** The avro FileFormat by fully-qualified class name: this Spark
    * distribution ships the complete implementation inside spark-sql
    * but not the spark-avro module's META-INF service registration, so
    * the "avro" SHORT name fails `lookupDataSource` while the class
    * itself loads and runs fine. The class is `private[sql]`
    * implementation, not public API — it can move or change visibility
    * across Spark upgrades, and the raw failure mode would be an
    * unexplained ClassNotFound on every src_avro run. Resolve it ONCE,
    * eagerly, with a self-diagnosing error naming the workaround. */
  private lazy val avroFormat: String = {
    val cls = "org.apache.spark.sql.avro.AvroFileFormat"
    try { Class.forName(cls); cls }
    catch {
      case e: Throwable => throw new IllegalStateException(
        s"avro datasource class $cls not loadable on this Spark " +
          "distribution — the src_avro path addresses the FileFormat by " +
          "internal class name because the 'avro' short-name service " +
          "registration (META-INF DataSourceRegister) is absent here; " +
          "after a Spark upgrade, re-point this constant at the moved " +
          "class or switch to format(\"avro\") if the registration now " +
          "ships", e)
    }
  }

  /** Driver-gated XML read path (`src_xml`, r10) — the semi-structured
    * source Spark 4 ships NATIVELY (the spark-xml datasource graduated
    * into core): corpus staged as one <doc> element per record, read
    * back with the explicit schema and the same byte-exact integrity
    * contract as the CSV/JSONL keys. The XML-specific hazards the gate
    * proves out: entity escaping of &<>"' in text, and
    * `ignoreSurroundingSpaces` — the reader TRIMS element text by
    * default, so the option is pinned false (leading/trailing
    * whitespace is corpus content; a trim changes sum_chars AND sum_h
    * and fails loud). */
  def xmlRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = Fixtures.dirFor("src_xml", d, "documents")
    if (!Fixtures.ready(dir))
      graft.Tables.documents(s, d).select("doc_id", "lang", "text")
        .write.mode("overwrite").option("rowTag", "doc").format("xml").save(dir)
    integrity(s.read.schema(DocSchema).option("rowTag", "doc")
      .option("ignoreSurroundingSpaces", "false").format("xml").load(dir))
  }

  /** Driver-gated SCHEMA-EVOLUTION read path (`src_evolve`, r10b) — the
    * longest-lived production hazard of a columnar lake: one logical
    * table whose early files were written under an OLD schema and later
    * files under a WIDER one. Staged as two parquet generations of the
    * corpus — gen1 (doc_id even) carries only (doc_id, text); gen2
    * (doc_id odd) adds (lang, n_chars) — read back in ONE scan with
    * `mergeSchema=true`: Spark unions the file footers into the widest
    * schema and NULL-fills the absent columns of old files. The gate
    * proves BOTH halves of that contract: gen1 rows surface as
    * lang NULL (grouped under the NULLS FIRST row, the §4 rule) and
    * their n_chars contributes NULL to the sum (an all-NULL group sums
    * to NULL, identically in DuckDB).
    *
    * Scale note: `mergeSchema` is a FOOTER union (per-file metadata,
    * not data) — but it reads every footer, so production tables pin
    * the merged schema in the catalog after evolution; the per-file
    * NULL-fill itself is free (missing columns never materialize). */
  def evolveRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = Fixtures.dirFor("src_evolve", d, "documents")
    // the generations live in subdirs, so readiness gates on BOTH
    // (dir root never gets a _SUCCESS; gating on it would rewrite the
    // fixture on every invocation)
    if (!(Fixtures.ready(dir + "/gen1") && Fixtures.ready(dir + "/gen2"))) {
      val docs = graft.Tables.documents(s, d)
      docs.where(pmod(col("doc_id"), lit(2)) === 0).select("doc_id", "text")
        .write.mode("overwrite").parquet(dir + "/gen1")
      docs.where(pmod(col("doc_id"), lit(2)) === 1)
        .select("doc_id", "text", "lang", "n_chars")
        .write.mode("overwrite").parquet(dir + "/gen2")
    }
    s.read.option("mergeSchema", "true").parquet(dir + "/gen1", dir + "/gen2")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("sum_chars"),
        sum(col("n_chars")).as("sum_n"))
      .orderBy(col("lang").asc_nulls_first)
  }

  /** Words per planted prose paragraph in the [[htmlCorpusDir]] pages —
    * shared with `text_extract`'s oracle, which re-derives the kept
    * block set from the same chunk arithmetic. */
  val HtmlBlockWords = 40

  /** Deterministic per-document page URL with PLANTED NON-CANONICAL
    * VARIANTS — the fixture behind `dedup_url` and the raw-web chain's
    * stage-0 URL dedup. Every crawl frontier sees the same page under
    * many spellings; this synthesizes the five standard ones from
    * doc_id arithmetic (integer/string ops both engines mirror, the
    * h32 discipline):
    *
    *  - host case: every 3rd doc spells the host `WWW.Example.COM`;
    *  - explicit default port: every 5th doc carries `:443`;
    *  - trailing slash: every odd doc;
    *  - query-parameter order: odd docs swap to `?b=2&a=1`;
    *  - fragment: every 7th doc carries `#sec2`.
    *
    * The PATH is shared in pairs — doc 8k+1 reuses doc 8k's path (a
    * ~12.5 % duplicate-URL rate, the order real crawl frontiers see) —
    * and the paired docs NEVER agree on the raw string (opposite
    * parity ⇒ slash and query order always differ), so the pair
    * collides only through [[graft.operators.Dedup.canonicalUrl]]:
    * every canonicalization rule is load-bearing for the gate hash. */
  def docUrl: Column = concat(
    lit("https://"),
    when(pmod(col("doc_id"), lit(3)) === 0, "WWW.Example.COM")
      .otherwise("www.example.com"),
    when(pmod(col("doc_id"), lit(5)) === 0, ":443").otherwise(""),
    lit("/d/"),
    when(pmod(col("doc_id"), lit(8)) === 1, col("doc_id") - 1)
      .otherwise(col("doc_id")).cast("string"),
    when(pmod(col("doc_id"), lit(2)) === 1, "/").otherwise(""),
    when(pmod(col("doc_id"), lit(2)) === 0, "?a=1&b=2").otherwise("?b=2&a=1"),
    when(pmod(col("doc_id"), lit(7)) === 0, "#sec2").otherwise(""))

  /** [[docUrl]]'s DuckDB mirror (same arithmetic, same literals). */
  val docUrlSql: String =
    """'https://' ||
      |  CASE WHEN doc_id % 3 = 0 THEN 'WWW.Example.COM' ELSE 'www.example.com' END ||
      |  CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END || '/d/' ||
      |  (CASE WHEN doc_id % 8 = 1 THEN doc_id - 1 ELSE doc_id END)::VARCHAR ||
      |  CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END ||
      |  CASE WHEN doc_id % 2 = 0 THEN '?a=1&b=2' ELSE '?b=2&a=1' END ||
      |  CASE WHEN doc_id % 7 = 0 THEN '#sec2' ELSE '' END""".stripMargin

  /** HTML entity escape for element text — &amp; first on escape, last
    * on unescape (the standard order; reversed it double-decodes). A
    * no-op on this corpus (no &<> in documents.text) but the honest
    * staging step for real web text, mirrored by the extractor's
    * unescape so the recovered words are byte-identical to the source. */
  private def escapeHtml(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  /** One deterministic single-line HTML page per document — the
    * RAW-WEB staging fixture `text_extract` ingests (the first stage of
    * a real corpus build: WARC/HTML, not clean text). Layout per page:
    * a <nav> link bar, the document's words as <p> paragraphs of
    * [[HtmlBlockWords]] words, a next/prev link <div>, and a <footer>
    * whose text is link-dominated — nav/div fail the extractor's
    * min-words rule, the footer passes min-words but fails LINK DENSITY
    * (that's the planted case proving density does real work), and
    * every prose paragraph of ≥ min words survives. Single-line pages
    * (one page per text record) keep the read splittable and the
    * record boundary trivial — the WARC-extracted-record shape. */
  def htmlPage: Column = {
    val ws = filter(split(col("text"), " "), w => w =!= "")
    val nb = floor((size(ws) + lit(HtmlBlockWords - 1)) / lit(HtmlBlockWords)).cast("int")
    val idx = when(nb > 0, sequence(lit(1), nb)).otherwise(array().cast("array<int>"))
    val prose = transform(idx, i => concat(lit("<p>"),
      escapeHtml(concat_ws(" ",
        slice(ws, (i - 1) * HtmlBlockWords + 1, lit(HtmlBlockWords)))),
      lit("</p>")))
    concat(
      lit("<html lang=\""), col("lang"),
      lit("\"><head><title>Doc "), col("doc_id").cast("string"),
      lit("</title></head><body><nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> <a href=\"/s/"),
      col("source"), lit("\">"), escapeHtml(col("source")), lit("</a></nav>"),
      concat_ws("", prose),
      lit("<div><a href=\"/d/"), (col("doc_id") + 1).cast("string"),
      lit("\">Next "), (col("doc_id") + 1).cast("string"),
      lit("</a> <a href=\"/d/"), (col("doc_id") - 1).cast("string"),
      lit("\">Prev</a></div><footer>Copyright <a href=\"/t\">"),
      escapeHtml(col("source")),
      lit("</a> <a href=\"/c\">contact</a> <a href=\"/a\">admin</a> team</footer></body></html>"))
  }

  /** Fixture dir of the single-line HTML corpus (one page per line,
    * written once from the documents table — the src_xml pattern). */
  def htmlCorpusDir(s: SparkSession, d: String): String = {
    // "src_html3": layout version key — r12 added the lang attribute
    // (the `pipe_web` chain recovers declared language from the page);
    // r16 split the staging into a corpus-derived FILE COUNT: the
    // single text file the docs scan produced (documents.parquet is one
    // row group at gate scale) capped the boilerplate-extraction head of
    // `pipe_web`/`text_extract` at the source's task count, and
    // extraction is the CPU-bound stage of the raw-web chain. A real
    // page store is many objects — file count is the head's
    // parallelism — floored at the media staging's
    // [[graft.operators.Multimodal.MediaFileFloor]] (same CPU-bound
    // rationale), growing with the corpus like the WARC staging's dial.
    val dir = Fixtures.dirFor("src_html3", d, "documents")
    if (!Fixtures.ready(dir)) {
      val docs = graft.Tables.documents(s, d)
      Fixtures.requireLineSafe(docs, "src_html")
      val nFiles = math.max(graft.operators.Multimodal.MediaFileFloor,
        (docs.count() / 50000L).toInt)
      docs.select(htmlPage.as("value")).repartition(nFiles)
        .write.mode("overwrite").text(dir)
    }
    dir
  }

  /** Fixed WARC-Date for the staged records — deterministic fixtures. */
  private val WarcDate = "2026-01-01T00:00:00Z"

  /** One serialized WARC/1.0 record (ISO 28500 framing: a CRLF-joined
    * header block, a blank line, exactly `Content-Length` payload
    * bytes, then the two-CRLF record separator). Content-Length counts
    * BYTES of the UTF-8 payload — the framing that makes WARC safe for
    * payloads containing newlines, binary runs, or anything else (the
    * property the line-oriented text staging can never have, which is
    * why [[htmlCorpusDir]] needs [[Fixtures.requireLineSafe]] and this
    * writer does not). */
  private def warcRecord(typ: String, uri: String, id: String,
                         payload: Array[Byte]): Array[Byte] = {
    val uriLine = if (uri == null) "" else s"WARC-Target-URI: $uri\r\n"
    val ct = if (typ == "response") "text/html" else "application/warc-fields"
    val hdr =
      s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Record-ID: <urn:graft:$id>\r\n" +
        s"WARC-Date: $WarcDate\r\n$uriLine" +
        s"Content-Type: $ct\r\nContent-Length: ${payload.length}\r\n\r\n"
    hdr.getBytes(java.nio.charset.StandardCharsets.UTF_8) ++ payload ++
      "\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Fixture dir of the WARC-framed web corpus — the byte layout a real
    * crawl delivers (Common Crawl's WARC/1.0, ISO 28500): each file
    * opens with a `warcinfo` record (which a correct reader must SKIP)
    * followed by one `response` record per page, each carrying the
    * page's URL (with [[docUrl]]'s planted non-canonical variants) in
    * `WARC-Target-URI` and the single-line HTML page as its payload,
    * framed by `Content-Length`. Files are written per task partition —
    * at 100 TB the unit of parallelism for WARC is the FILE (the format
    * is sequentially framed, not block-splittable; every production
    * crawl pipeline sizes ~1 GB .warc.gz files and parallelizes across
    * them), so fixture file count stands in for the crawler's file
    * sizing. */
  def warcDir(s: SparkSession, d: String): String = {
    val dir = Fixtures.dirFor("src_warc", d, "documents")
    if (!Fixtures.ready(dir)) {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      val docs = graft.Tables.documents(s, d)
      // file count rides the corpus (≈50 k pages ≈ 50 MB per .warc,
      // floored at the gate-scale 8): production sizes WARC segments
      // ~1 GB and parallelizes across files, and a FIXED file count is
      // the same dial bug as a fixed bucket count — 8 files at the
      // ×1000 tier were 650 MB each and capped the scan at 8 tasks
      val nFiles = math.max(8, (docs.count() / 50000L).toInt)
      docs
        .select(col("doc_id"), docUrl.as("url"), htmlPage.as("page"))
        .repartition(nFiles)
        .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val out = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(s"$dir/part_$pid.warc"))
          try {
            out.write(warcRecord("warcinfo", null, s"info:$pid",
              "software: graft\r\n".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            rows.foreach { r =>
              out.write(warcRecord("response", r.getString(1),
                r.getLong(0).toString,
                r.getString(2).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            }
          } finally out.close()
        }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "_SUCCESS"), Array[Byte]())
    }
    dir
  }

  /** Fixture dir of the GZIPPED WARC corpus (`.warc.gz`) — the layout
    * real Common Crawl segments actually ship: ONE GZIP MEMBER PER
    * RECORD, members concatenated into the file. The member boundary IS
    * the record boundary — that is what keeps the compressed format
    * per-file parallel (and range-seekable in production; this reader
    * streams whole files, so it only relies on concatenated members
    * inflating to the plain byte stream). Same records as [[warcDir]]
    * (warcinfo head + one response per page), same file-count dial. */
  def warcGzDir(s: SparkSession, d: String): String = {
    val dir = Fixtures.dirFor("src_warcgz", d, "documents")
    if (!Fixtures.ready(dir)) {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      val docs = graft.Tables.documents(s, d)
      val nFiles = math.max(8, (docs.count() / 50000L).toInt)
      docs
        .select(col("doc_id"), docUrl.as("url"), htmlPage.as("page"))
        .repartition(nFiles)
        .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val out = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(s"$dir/part_$pid.warc.gz"))
          // one gzip member per record: a fresh GZIPOutputStream per
          // record over the SHARED file stream, finished (trailer
          // written) but never closed (close would close the file);
          // the member's Deflater is ended explicitly — finish() alone
          // leaves native zlib state to the finalizer
          def member(rec: Array[Byte]): Unit = {
            val gz = new java.util.zip.GZIPOutputStream(out, 1 << 16) {
              def endMember(): Unit = { finish(); `def`.end() }
            }
            gz.write(rec); gz.endMember()
          }
          try {
            member(warcRecord("warcinfo", null, s"info:$pid",
              "software: graft\r\n".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            rows.foreach { r =>
              member(warcRecord("response", r.getString(1),
                r.getLong(0).toString,
                r.getString(2).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            }
          } finally out.close()
        }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "_SUCCESS"), Array[Byte]())
    }
    dir
  }

  /** Content-Length-framed WARC record walk over one file's bytes —
    * never a delimiter scan (a payload may legally CONTAIN the
    * `\r\n\r\nWARC/1.0` byte sequence; only the declared length decides
    * where a record ends). Yields (WARC-Target-URI, payload-as-UTF-8)
    * for `response` records; all other record types (warcinfo, request,
    * metadata, revisit) are skipped after being length-framed past.
    * Fail-loud on malformed framing — a truncated record means a
    * corrupt fetch, and silently resyncing would hide it. */
  /** STREAMING record walk over one WARC byte stream — O(record)
    * memory, never O(file) (r13: the first cut walked a whole-file
    * byte array; a ×1000-tier 650 MB .warc then materialized as ONE
    * row and the scan died — exactly the shape a 1 GB Common Crawl
    * segment would hit in production). The header block is read byte
    * by byte to its CRLFCRLF terminator (headers are small by spec);
    * the payload is read by its DECLARED length — never a delimiter
    * scan — and non-response payloads are still consumed so the walk
    * stays frame-aligned. Fails loud on truncation (readNBytes short)
    * and on a missing version line or Content-Length. */
  /** Per-record payload cap for [[parseWarcStream]] — the reader
    * materializes each payload as one in-memory String, so this is its
    * stated memory contract, not an arbitrary limit. 1 GiB covers any
    * real crawl record (Common Crawl truncates response bodies at 1 MiB). */
  private[graft] val MaxRecordBytes: Long = 1L << 30

  private[graft] def parseWarcStream(in: java.io.InputStream): Iterator[(String, String)] =
    new Iterator[(String, String)] {
      private var nextRec: (String, String) = null
      private var recNo = 0
      // returns null at clean EOF (stream ends at a record boundary)
      private def readHeader(): String = {
        val buf = new java.io.ByteArrayOutputStream(256)
        var b = in.read()
        // tolerate inter-record CRLF runs (the two-CRLF separator)
        while (b == '\r') {
          val nl = in.read()
          require(nl == '\n', s"WARC: lone CR between records (record $recNo)")
          b = in.read()
        }
        if (b < 0) return null
        var state = 0 // count of consecutive \r\n\r\n bytes matched
        while (state < 4) {
          require(b >= 0, s"WARC: unterminated header block (record $recNo)")
          buf.write(b)
          state = (state, b) match {
            case (0, '\r') => 1
            case (1, '\n') => 2
            case (2, '\r') => 3
            case (3, '\n') => 4
            case (_, '\r') => 1
            case _         => 0
          }
          if (state < 4) b = in.read()
        }
        val s = buf.toString(java.nio.charset.StandardCharsets.UTF_8)
        s.substring(0, s.length - 4) // drop the written \r\n\r\n terminator
      }
      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null) {
          val header = readHeader()
          if (header == null) return
          recNo += 1
          val lines = header.split("\r\n")
          require(lines.head.startsWith("WARC/"),
            s"WARC: record $recNo does not start with a WARC version line")
          val fields = lines.tail.flatMap { l =>
            val i = l.indexOf(':')
            if (i < 0) None else Some(l.take(i).trim -> l.drop(i + 1).trim)
          }.toMap
          // toLong, not toInt: a legal WARC Content-Length may exceed
          // 2 GiB, and .toInt would overflow NEGATIVE and fail the
          // readNBytes require with a confusing message. Records above
          // [[MaxRecordBytes]] fail loud with the real reason instead
          // (this reader materializes the payload as one String, so an
          // explicit cap IS the memory contract).
          val lenL = fields.getOrElse("Content-Length",
            sys.error(s"WARC: record $recNo missing Content-Length")).toLong
          require(lenL >= 0 && lenL <= MaxRecordBytes,
            s"WARC: record $recNo declares $lenL payload bytes — " +
              s"outside this reader's per-record cap ($MaxRecordBytes)")
          val len = lenL.toInt
          val body = in.readNBytes(len)
          require(body.length == len,
            s"WARC: truncated payload in record $recNo (declared $len, got ${body.length})")
          if (fields.getOrElse("WARC-Type", "") == "response")
            nextRec = (fields.getOrElse("WARC-Target-URI", ""),
              new String(body, java.nio.charset.StandardCharsets.UTF_8))
        }
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): (String, String) = {
        val r = nextRec; advance(); r
      }
    }

  /** Byte-array form — the spec's harness entry; delegates to the
    * streaming walk so there is exactly one framing implementation. */
  private[graft] def parseWarc(bytes: Array[Byte]): Iterator[(String, String)] =
    parseWarcStream(new java.io.ByteArrayInputStream(bytes))

  /** The WARC corpus as a (url, value) frame: the FILE LIST comes from
    * `binaryFile` (pruned to `path` — the format skips content for
    * unreferenced columns, so enumeration is metadata-only) and each
    * task STREAMS its files' records through [[parseWarcStream]] —
    * map-only, zero shuffles, O(record) memory per task regardless of
    * file size (a 650 MB ×1000-tier .warc killed the whole-file-row
    * form this replaced). Files open through the Hadoop FileSystem
    * API with the session's hadoopConfiguration broadcast, so
    * object-store URIs and credentials pass through exactly as the
    * parquet scans' do. A 1000-executor cluster saturates on file
    * count, exactly as every production WARC pipeline does. */
  def readWarc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      s.sparkContext.hadoopConfiguration)
    val bconf = s.sparkContext.broadcast(conf)
    val files = s.read.format("binaryFile").load(dir)
      .where(col("path").endsWith(".warc") || col("path").endsWith(".warc.gz"))
      .select(col("path")).as[String]
    // SPREAD THE PATH LIST (r17; guide §2.5 "unsplittable input:
    // repartition immediately after the read"): the binaryFile scan
    // PACKS small files into FilePartitions by maxPartitionBytes — the
    // gate-scale staging (8 × ~0.5 MB) planned as a SINGLE task, so the
    // framed parse, the chain's CPU stage, ran serially on a 32-core
    // session. Round-robin over the path list (a row per file —
    // metadata strings, never payload bytes) spreads the streams across
    // the session. NO-OP whenever the scan already plans at least the
    // session's parallelism (production file counts — thousands of
    // ~1 GB unsplittable segments — plan one file per task), the
    // cpuFloored discipline.
    val target = s.sparkContext.defaultParallelism
    val spread =
      if (files.rdd.getNumPartitions >= target) files
      else files.repartition(target)
    spread
      .mapPartitions { paths =>
        paths.flatMap { p =>
          val uri = new java.net.URI(p)
          val fs = org.apache.hadoop.fs.FileSystem.get(uri, bconf.value.value)
          val raw = new java.io.BufferedInputStream(
            fs.open(new org.apache.hadoop.fs.Path(uri)), 1 << 16)
          // .warc.gz is the Common Crawl layout — ONE gzip member per
          // record, members concatenated, so the member boundary IS the
          // record boundary (what keeps the format per-file parallel and
          // lets a range request start at any member). GZIPInputStream
          // reads concatenated members natively, so the inflated stream
          // is byte-identical to the plain .warc and the framed walk is
          // shared verbatim.
          // the GZIPInputStream CONSTRUCTOR eagerly reads and validates
          // the first member's header, so an empty or corrupt .warc.gz
          // throws here — before warcRecords registers the
          // task-completion close — and would strand `raw` open (the
          // exact leak class the r14 close contract fixed; ADVICE r14)
          val in: java.io.InputStream =
            if (p.endsWith(".warc.gz"))
              try new java.util.zip.GZIPInputStream(raw, 1 << 16)
              catch { case e: Throwable => raw.close(); throw e }
            else raw
          warcRecords(in)
        }
      }
      .toDF("url", "value")
  }

  /** The framed walk with its close contract: close is REGISTERED ON
    * THE TASK LIFECYCLE, not only on iterator exhaustion — a parse
    * require-failure (the fail-loud truncation path), a task kill, or a
    * downstream limit/take that stops consuming the iterator would
    * otherwise strand the open stream until executor death; on an
    * object store that is a held connection per file (r13 shipped with
    * exhaustion-only close and a comment claiming a wrapper that didn't
    * exist; ADVICE r13). Eager close on exhaustion stays (close is
    * idempotent) so a fully-drained file frees its handle before the
    * task ends. GZIPInputStream.close closes the wrapped raw stream. */
  private[graft] def warcRecords(in: java.io.InputStream): Iterator[(String, String)] = {
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
    new Iterator[(String, String)] {
      private val it = parseWarcStream(in)
      override def hasNext: Boolean = {
        val h = it.hasNext; if (!h) in.close(); h
      }
      override def next(): (String, String) = it.next()
    }
  }

  /** `src_warc` gate: read the WARC corpus back through the framed
    * parser and run the raw-web extraction over every response payload,
    * joined with the record's own `WARC-Target-URI`. The oracle
    * re-derives the extraction columns from the source words
    * (`text_extract`'s chunk arithmetic) and the URL from [[docUrlSql]]
    * — so a hash match proves the Content-Length framing returned every
    * payload byte-exactly (any framing slip corrupts a page and its
    * `text_h`), the warcinfo skip is right (an extra record forges a
    * doc_id-NULL row), and the header parse recovered each URI. */
  def warcRoundtrip(s: SparkSession, d: String): DataFrame =
    warcRoundtripOver(readWarc(s, warcDir(s, d)))

  /** `src_warcgz` gate: the IDENTICAL roundtrip over the gzipped twin —
    * same oracle text as `src_warc`, so a hash match proves the
    * member-per-record inflation returns the exact plain byte stream
    * (any member misalignment or trailer slip corrupts a record's
    * framing and fails loud or hash-mismatches). */
  def warcGzRoundtrip(s: SparkSession, d: String): DataFrame =
    warcRoundtripOver(readWarc(s, warcGzDir(s, d)))

  private def warcRoundtripOver(recs: DataFrame): DataFrame = {
    val urls = recs.select(
      regexp_extract(col("value"), "<title>Doc ([0-9]+)</title>", 1)
        .cast("long").as("doc_id"),
      col("url"))
    graft.operators.TextAnalysis.extractText(recs.select("value"))
      .join(urls, Seq("doc_id"))
      .select("doc_id", "url", "n_blocks", "n_kept", "words_kept", "text_h")
      .orderBy("doc_id")
  }

  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map(
    "src_evolve" -> ((s, d) => evolveRoundtrip(s, d)),
    "src_csv"   -> ((s, d) => csvRoundtrip(s, d)),
    "src_jsonl" -> ((s, d) => jsonlRoundtrip(s, d)),
    "src_orc"   -> ((s, d) => orcRoundtrip(s, d)),
    "src_xml"   -> ((s, d) => xmlRoundtrip(s, d)),
    "src_avro"  -> ((s, d) => avroRoundtrip(s, d)),
    "src_warc"  -> ((s, d) => warcRoundtrip(s, d)),
    "src_warcgz" -> ((s, d) => warcGzRoundtrip(s, d)),
  )

  private val integritySql =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
      |  CAST(SUM(('0x' || substr(md5('rt:' || text), 1, 8))::BIGINT) AS BIGINT) AS sum_h
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // LAZY is load-bearing: src_warc's oracle composes
  // TextAnalysis.oracle("text_extract"), and TextAnalysis's own init
  // reads Sources.HtmlBlockWords — an eager val here would re-enter
  // TextAnalysis mid-<clinit> and read a null map. Deferring to first
  // access (SparkEntry.oracleSql, after both objects exist) breaks the
  // cycle.
  lazy val oracle: Map[String, String] = Map(
    // the merged-scan semantics derived straight from the source table:
    // even doc_ids are the gen1 (narrow-schema) rows → lang NULL,
    // n_chars NULL; an all-NULL group sums to NULL in both engines
    "src_evolve" ->
      """SELECT CASE WHEN doc_id % 2 = 0 THEN NULL ELSE lang END AS lang,
        |  count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars,
        |  CAST(sum(CASE WHEN doc_id % 2 = 0 THEN NULL ELSE n_chars END) AS BIGINT) AS sum_n
        |FROM documents GROUP BY 1 ORDER BY lang NULLS FIRST""".stripMargin,
    "src_csv"   -> integritySql,
    "src_jsonl" -> integritySql,
    "src_orc"   -> integritySql,
    "src_xml"   -> integritySql,
    "src_avro"  -> integritySql,
    // the text_extract arithmetic rederivation (Spark extracts from the
    // ACTUAL framed payloads; the oracle from source-word chunk math)
    // joined with the docUrl mirror for the WARC-Target-URI header
    "src_warc" -> warcOracleSql,
    // the gz twin answers from the SAME source-table rederivation: the
    // compressed layout must be observationally invisible
    "src_warcgz" -> warcOracleSql,
  )

  private lazy val warcOracleSql: String =
    s"""SELECT e.doc_id, u.url, e.n_blocks, e.n_kept, e.words_kept, e.text_h
       |FROM (${graft.operators.TextAnalysis.oracle("text_extract")}) e
       |JOIN (SELECT doc_id, $docUrlSql AS url FROM documents) u
       |  USING (doc_id)
       |ORDER BY doc_id""".stripMargin

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

  /** The reference's CROSS-FILE concatenation chunkization, exact
    * (`core/utils.go:330-343`: `allStr = strings.Join(filesData, "")`
    * then fixed-size slices of the single stream): documents concatenate
    * in doc_id order with NO separator, so a chunk boundary can both
    * MERGE the last token of doc i with the first token of doc i+1 and
    * SPLIT a token at a global offset — the two boundary artifacts that
    * are part of the reference's semantics. (The reference slices Go
    * string BYTES; this slices CHARACTERS — identical on the ASCII gate
    * corpus, and the char definition is the one both engines share.)
    *
    * Scale shape — the global concatenation is never materialized; the
    * stream exists only as COORDINATES (a distributed prefix-sum):
    *
    *  1. range-partition by doc_id, so each partition holds a
    *     contiguous run of the enumeration order;
    *  2. within-partition exclusive running length (partition-local
    *     window — parallel);
    *  3. per-partition totals → a PARTITION-COUNT-sized frame whose own
    *     prefix scan is one tiny single-task window, broadcast back
    *     (the classic two-phase scan: the only global sequential step
    *     is O(#partitions), not O(rows));
    *  4. each doc emits its overlapped piece per covered chunk
    *     (fan-out ceil(len/chunkSize)+1, map-only), and chunks
    *     reassemble with one groupBy(chunk_no) shuffle whose groups are
    *     chunk-sized by construction.
    *
    * Output: (chunk_no, chunk), the reference's CHUNK array. */
  def concatChunked(docs: DataFrame, chunkSize: Int): DataFrame = {
    val cs = chunkSize.toLong
    globalOffsets(docs).where(col("len") > 0)
      .select(col("off"), col("text"),
        explode(sequence(expr(s"off div $cs"), expr(s"(off + len - 1) div $cs")))
          .as("chunk_no"))
      .select(col("chunk_no"), col("off"),
        col("text").substr(
          (greatest(col("chunk_no") * cs, col("off")) - col("off") + 1).cast("int"),
          (least((col("chunk_no") + 1) * cs, col("off") + length(col("text")))
            - greatest(col("chunk_no") * cs, col("off"))).cast("int")).as("piece"))
      .transform(reassemble)
  }

  /** The reference's OTHER chunkize branch, exact (`core/utils.go:
    * 325-329` + 339-341, the `CHUNK_SIZE ≤ 0` default path a user
    * running `configurations/config.json` hits — WORKER_NUM_MAP = 5
    * fixed chunks): `chunkSize = total div numChunks`, chunk x slices
    * `[x·cs, (x+1)·cs)`, and the REMAINDER (`total mod numChunks`)
    * appends to the LAST chunk (`filesChunkized[len-1] =
    * allStr[low : high+reminder]`) — so the last worker's chunk is up
    * to `numChunks−1` chars bigger, a boundary artifact this key pins.
    * Degenerate corpus (< numChunks chars ⇒ cs = 0): the reference
    * slices every chunk empty and the remainder rule hands the WHOLE
    * stream to the last chunk — mirrored by the cs = 0 branch.
    *
    * Same distributed shape as [[concatChunked]]: the global
    * concatenation exists only as prefix-sum COORDINATES; the one new
    * input is the 1-row corpus-length aggregate, broadcast. At scale
    * numChunks is the worker count, so per-chunk reassembly groups are
    * corpus/numChunks-sized — the reference's own per-worker payload. */
  def concatChunkedN(docs: DataFrame, numChunks: Int): DataFrame = {
    val k = numChunks.toLong
    val tot = docs.agg(
      coalesce(sum(length(col("text")).cast("long")), lit(0L)).as("tot"))
    globalOffsets(docs).where(col("len") > 0)
      .crossJoin(broadcast(tot))
      .withColumn("cs", expr(s"tot div $k"))
      // chunk index of a global offset: uniform cs-wide slices, the
      // overflow past (k−1)·cs all folding into the LAST chunk —
      // integer `div` end to end (no double division at corpus offsets)
      .withColumn("first_c",
        when(col("cs") === 0, lit(k - 1))
          .otherwise(least(expr("off div cs"), lit(k - 1))))
      .withColumn("last_c",
        when(col("cs") === 0, lit(k - 1))
          .otherwise(least(expr("(off + len - 1) div cs"), lit(k - 1))))
      .select(col("off"), col("text"), col("cs"), col("tot"),
        explode(sequence(col("first_c"), col("last_c"))).as("chunk_no"))
      // chunk c spans [c·cs, (c+1)·cs) — except the last, which runs to
      // the end of the stream (the remainder rule)
      .withColumn("cstart", col("chunk_no") * col("cs"))
      .withColumn("cend",
        when(col("chunk_no") === k - 1, col("tot")).otherwise((col("chunk_no") + 1) * col("cs")))
      .select(col("chunk_no"), col("off"),
        col("text").substr(
          (greatest(col("cstart"), col("off")) - col("off") + 1).cast("int"),
          (least(col("cend"), col("off") + length(col("text")))
            - greatest(col("cstart"), col("off"))).cast("int")).as("piece"))
      .transform(reassemble)
  }

  /** (doc_id, text, len, off): exclusive global prefix offsets of the
    * doc_id-ordered no-separator concatenation — the two-phase
    * distributed scan both chunkize modes share:
    *
    *  1. range-partition by doc_id, so each partition holds a
    *     contiguous run of the enumeration order;
    *  2. within-partition exclusive running length (partition-local
    *     window — parallel);
    *  3. per-partition totals → a PARTITION-COUNT-sized frame whose own
    *     prefix scan is one tiny single-task window, broadcast back
    *     (the classic two-phase scan: the only global sequential step
    *     is O(#partitions), not O(rows)). */
  private def globalOffsets(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sized = docs.select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("len"))
      .repartitionByRange(col("doc_id"))
      .withColumn("pid", spark_partition_id())
    val wLocal = Window.partitionBy("pid").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wBases = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = sized.groupBy("pid").agg(sum("len").as("plen"))
      .withColumn("base", coalesce(sum("plen").over(wBases), lit(0L)))
      .select("pid", "base")
    sized
      .withColumn("loff", coalesce(sum("len").over(wLocal), lit(0L)))
      .join(broadcast(bases), "pid")
      .select(col("doc_id"), col("text"), col("len"),
        (col("base") + col("loff")).as("off"))
  }

  /** (chunk_no, off, piece) → (chunk_no, chunk): one groupBy(chunk_no)
    * shuffle, pieces reassembled in offset order. */
  private def reassemble(pieces: DataFrame): DataFrame =
    pieces.groupBy("chunk_no")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("off"), col("piece")))),
        e => e.getField("piece")), "").as("chunk"))
}
