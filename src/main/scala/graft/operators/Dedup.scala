package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family for a training-data pipeline (SURVEY §2.3):
  * exact, MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Portable hashing: H(seed, s) = first 8 hex digits of md5("seed:s") as
  * an unsigned 32-bit value — identical in Spark (`conv(substr(md5(…)))`)
  * and DuckDB (`('0x'||substr(md5(…),1,8))::BIGINT`), so every stage of
  * every pipeline is oracle-checked, not just row counts.
  *
  * Scale design (100 TB):
  *  - signatures are computed map-side from an explode → per-doc partial
  *    aggregation (one shuffle keyed by doc_id, combine enabled);
  *  - LSH banding turns O(n²) comparison into a shuffle keyed by
  *    (band, band_hash) whose buckets are the only quadratic zones;
  *  - n-gram Jaccard joins on (source, bigram) — an inverted-index join,
  *    never a cross join;
  *  - no driver-side collection anywhere.
  */
object Dedup {

  /** Portable 32-bit hash as a non-negative long. */
  def h32(seed: Column, s: Column): Column =
    conv(substring(md5(concat(seed.cast("string"), lit(":"), s)), 1, 8), 16, 10).cast("long")

  private def wordsCol: Column =
    filter(split(col("text"), WordCount.TokenRe), w => w =!= "")

  /** Exact dedup: canonical doc (min doc_id) per content hash. */
  def exact(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("content_hash")
    docs.select(col("doc_id"), md5(col("text")).as("content_hash"))
      .withColumn("keep_id", min("doc_id").over(w))
      .withColumn("is_dup", (col("doc_id") =!= col("keep_id")).cast("long"))
      .orderBy("doc_id")
  }

  val NumHashes = 16
  val Bands = 4
  val RowsPerBand: Int = NumHashes / Bands

  /** 1-based index array [1 .. size-(n-1)] — empty when the doc is too
    * short (a bare `sequence(1, size-2)` would run backwards for short
    * docs and then index out of bounds). */
  private def gramIdx(ws: Column, n: Int): Column =
    when(size(ws) >= n, sequence(lit(1), size(ws) - (n - 1)))
      .otherwise(array().cast("array<int>"))

  /** Word 3-shingles of a document, as one row per distinct shingle. */
  def shingles(docs: DataFrame): DataFrame = {
    val ws = wordsCol
    // shingle_i = w_i ⧺ ' ' ⧺ w_{i+1} ⧺ ' ' ⧺ w_{i+2}, via codegen'd
    // transform over an index sequence — no UDF.
    val sh = transform(gramIdx(ws, 3),
      i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2)))
    docs.select(col("doc_id"), explode(sh).as("shingle")).distinct()
  }

  /** MinHash signatures, banded: (doc_id, band, band_hash). The LSH
    * "bucket key" table — docs sharing any (band, band_hash) are
    * near-duplicate candidates. */
  def minhashBands(docs: DataFrame): DataFrame = {
    val sig = shingles(docs)
      .select(col("doc_id"), explode(sequence(lit(0), lit(NumHashes - 1))).as("j"),
        col("shingle"))
      .select(col("doc_id"), col("j"), h32(col("j"), col("shingle")).as("h"))
      .groupBy("doc_id")
      .agg(min(when(col("j") === 0, col("h"))).as("s0"),
        (1 until NumHashes).map(j => min(when(col("j") === j, col("h"))).as(s"s$j")): _*)
    val bandCols = (0 until Bands).map { b =>
      val sigs = (0 until RowsPerBand).map(r => col(s"s${b * RowsPerBand + r}").cast("string"))
      md5(concat_ws(",", sigs: _*)).as(s"bh$b")
    }
    val banded = sig.select(col("doc_id") +: bandCols: _*)
    val stackExpr = (0 until Bands).map(b => s"$b, bh$b").mkString(", ")
    banded.selectExpr("doc_id", s"stack($Bands, $stackExpr) AS (band, band_hash)")
      .select(col("doc_id"), col("band").cast("long").as("band"), col("band_hash"))
      .orderBy("doc_id", "band")
  }

  /** Candidate near-duplicate pairs: docs colliding in any LSH band. */
  def minhashPairs(docs: DataFrame): DataFrame = {
    val b = minhashBands(docs)
    val l = b.select(col("doc_id").as("doc_a"), col("band"), col("band_hash"))
    val r = b.select(col("doc_id").as("doc_b"), col("band"), col("band_hash"))
    l.join(r, Seq("band", "band_hash"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .orderBy("doc_a", "doc_b")
  }

  val SimhashBits = 32

  /** 32-bit SimHash per document from term frequencies. */
  def simhash(docs: DataFrame): DataFrame = {
    val counts = WordCount.tokens(docs, col("doc_id"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("cnt"), h32(lit("sh"), col("word")).as("h"))
    counts
      .select(col("doc_id"), col("cnt"), col("h"),
        explode(sequence(lit(0), lit(SimhashBits - 1))).as("b"))
      .select(col("doc_id"), col("b"),
        when(expr("(shiftright(h, b) & 1) = 1"), col("cnt")).otherwise(-col("cnt")).as("c"))
      .groupBy("doc_id", "b").agg(sum(col("c")).as("s"))
      .groupBy("doc_id")
      .agg(sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))"))
        .otherwise(0L)).as("simhash"))
      .orderBy("doc_id")
  }

  /** Word-bigram Jaccard: top-20 most similar same-source pairs, via an
    * inverted-index join on (source, bigram) — the scalable shape. */
  def ngramJaccard(docs: DataFrame): DataFrame = {
    val ws = wordsCol
    val bi = transform(gramIdx(ws, 2),
      i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1)))
    val docBigrams = docs
      .select(col("doc_id"), col("source"), explode(bi).as("bigram")).distinct()
    val sizes = docBigrams.groupBy("doc_id").agg(count(lit(1)).as("nset"))
    val a = docBigrams.select(col("doc_id").as("doc_a"), col("source"), col("bigram"))
    val b = docBigrams.select(col("doc_id").as("doc_b"), col("source"), col("bigram"))
    a.join(b, Seq("source", "bigram"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("nset", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("nset", "nb"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("shared").cast("double") / (col("na") + col("nb") - col("shared"))).as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** Same simhash via the native codegen'd expression
    * [[graft.functions.SimHash32]] — map-only, no 32× bit-row blowup. */
  def simhashNative(docs: DataFrame): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    docs.selectExpr("doc_id", "graft_simhash32(text) AS simhash").orderBy("doc_id")
  }

  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map(
    "dedup_exact"          -> ((s, d) => exact(Tables.documents(s, d))),
    "dedup_minhash"        -> ((s, d) => minhashBands(Tables.documents(s, d))),
    "dedup_minhash_pairs"  -> ((s, d) => minhashPairs(Tables.documents(s, d))),
    "dedup_simhash"        -> ((s, d) => simhash(Tables.documents(s, d))),
    "dedup_simhash_native" -> ((s, d) => simhashNative(Tables.documents(s, d))),
    "dedup_ngram"          -> ((s, d) => ngramJaccard(Tables.documents(s, d))),
  )

  // ---- DuckDB oracles ----

  private val W =
    "list_filter(regexp_split_to_array(text, '[^A-Za-z]+'), w -> w <> '')"

  /** H(seed, s) on the DuckDB side. */
  private def oh32(seed: String, s: String): String =
    s"('0x' || substr(md5($seed || ':' || $s), 1, 8))::BIGINT"

  private val shinglesSql =
    s"""SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
       |FROM (SELECT doc_id, $W AS words FROM documents) dw,
       |     unnest(range(1, len(words) - 1)) AS u(i)""".stripMargin

  private val sigSql = {
    val mins = (0 until NumHashes)
      .map(j => s"min(CASE WHEN j = $j THEN h END) AS s$j").mkString(", ")
    s"""SELECT doc_id, $mins FROM (
       |  SELECT doc_id, j, ${oh32("j::VARCHAR", "shingle")} AS h
       |  FROM ($shinglesSql) sh, (SELECT unnest(range(0, $NumHashes)) AS j) js) hs
       |GROUP BY doc_id""".stripMargin
  }

  private val bandsSql = {
    val bandRows = (0 until Bands).map { b =>
      val parts = (0 until RowsPerBand).map(r => s"s${b * RowsPerBand + r}::VARCHAR")
      s"SELECT doc_id, $b::BIGINT AS band, md5(${parts.mkString(" || ',' || ")}) AS band_hash FROM sig"
    }
    s"WITH sig AS ($sigSql) " + bandRows.mkString(" UNION ALL ")
  }

  private val simhashSql =
    s"""SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
       |FROM (
       |  SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN cnt ELSE -cnt END) AS s
       |  FROM (
       |    SELECT doc_id, cnt, ${oh32("'sh'", "word")} AS h, b
       |    FROM (SELECT doc_id, word, count(*) AS cnt FROM (
       |            SELECT doc_id, unnest($W) AS word FROM documents) tk
       |          GROUP BY doc_id, word) wc,
       |         (SELECT unnest(range(0, $SimhashBits)) AS b) bits) hb
       |  GROUP BY doc_id, b) sb
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT doc_id, md5(text) AS content_hash,
        |  min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id,
        |  (doc_id <> min(doc_id) OVER (PARTITION BY md5(text)))::BIGINT AS is_dup
        |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_minhash" ->
      s"""SELECT doc_id, band, band_hash FROM ($bandsSql) b
         |ORDER BY doc_id, band""".stripMargin,
    "dedup_minhash_pairs" ->
      s"""SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM ($bandsSql) a JOIN ($bandsSql) b
         |  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_simhash" -> simhashSql,
    // the native expression implements the identical algorithm, so it
    // shares the declarative pipeline's oracle
    "dedup_simhash_native" -> simhashSql,
    "dedup_ngram" ->
      s"""WITH db AS (
         |  SELECT DISTINCT doc_id, source, words[i] || ' ' || words[i+1] AS bigram
         |  FROM (SELECT doc_id, source, $W AS words FROM documents) dw,
         |       unnest(range(1, len(words))) AS u(i)),
         |sz AS (SELECT doc_id, count(*) AS nset FROM db GROUP BY doc_id)
         |SELECT doc_a, doc_b,
         |  shared::DOUBLE / (sa.nset + sb.nset - shared) AS jaccard
         |FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM db a JOIN db b ON a.source = b.source AND a.bigram = b.bigram
         |    AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2) p
         |JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
         |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 20""".stripMargin,
  )
}
