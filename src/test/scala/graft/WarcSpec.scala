package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.operators.{TextAnalysis, TrainingPipeline}
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Pins the WARC/1.0 framing contract (`src_warc`) and the crawl-head
  * composition (`pipe_warc`): Content-Length framing (never delimiter
  * scanning), non-response record skip, fail-loud truncation, and the
  * stage-0 URL dedup wiring. */
class WarcSpec extends SparkSpec {

  private def rec(typ: String, uri: String, payload: String): Array[Byte] = {
    val p = payload.getBytes(UTF_8)
    val uriLine = if (uri == null) "" else s"WARC-Target-URI: $uri\r\n"
    (s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Record-ID: <urn:t:1>\r\n" +
      s"WARC-Date: 2026-01-01T00:00:00Z\r\n$uriLine" +
      s"Content-Length: ${p.length}\r\n\r\n").getBytes(UTF_8) ++
      p ++ "\r\n\r\n".getBytes(UTF_8)
  }

  test("parseWarc: Content-Length framing survives a payload containing the header terminator") {
    // the payload embeds "\r\n\r\nWARC/1.0" — a delimiter-scanning
    // parser would split here; a length-framed one must not
    val evil = "before\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nafter"
    val bytes = rec("warcinfo", null, "software: t\r\n") ++
      rec("response", "https://a/1", evil) ++
      rec("response", "https://a/2", "plain")
    val got = Sources.parseWarc(bytes).toList
    assert(got == List("https://a/1" -> evil, "https://a/2" -> "plain"))
  }

  test("parseWarc: non-response records (warcinfo, request, metadata) are framed past, not emitted") {
    val bytes = rec("warcinfo", null, "x") ++ rec("request", "https://a/1", "GET /") ++
      rec("metadata", "https://a/1", "k: v\r\n") ++ rec("response", "https://a/1", "body")
    assert(Sources.parseWarc(bytes).toList == List("https://a/1" -> "body"))
  }

  test("parseWarc: truncated payload fails loud instead of resyncing") {
    val whole = rec("response", "https://a/1", "0123456789")
    val truncated = whole.take(whole.length - 8) // cuts into the payload
    assertThrows[IllegalArgumentException](Sources.parseWarc(truncated).toList)
  }

  test("parseWarc: UTF-8 payload lengths are counted in bytes, not chars") {
    val multi = "café über naïve" // 3 two-byte chars
    val bytes = rec("response", "https://a/1", multi) ++
      rec("response", "https://a/2", "next")
    // a char-counted length would leave 3 stray bytes and derail record 2
    assert(Sources.parseWarc(bytes).toList ==
      List("https://a/1" -> multi, "https://a/2" -> "next"))
  }

  private def gzMember(rec: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(rec); gz.close()
    bos.toByteArray
  }

  test("warc.gz: one gzip member per record, members concatenated — inflates to the plain byte stream") {
    val recs = Seq(rec("warcinfo", null, "software: t\r\n"),
      rec("response", "https://a/1", "first body"),
      rec("response", "https://a/2", "second body"))
    val concatenated = recs.map(gzMember).reduce(_ ++ _)
    // the member boundary IS the record boundary (Common Crawl layout):
    // a multi-member file must read WHOLE, identical to the plain form
    val got = Sources.parseWarcStream(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(concatenated))).toList
    assert(got == Sources.parseWarc(recs.reduce(_ ++ _)).toList)
    assert(got == List("https://a/1" -> "first body", "https://a/2" -> "second body"))
  }

  test("warcRecords: a downstream limit that stops consuming does not strand the stream (task-lifecycle close)") {
    val bytes = rec("response", "https://a/1", "one") ++
      rec("response", "https://a/2", "two") ++
      rec("response", "https://a/3", "three")
    val closedAcc = spark.sparkContext.longAccumulator("warc_closed")
    val taken = spark.sparkContext.parallelize(Seq(bytes), 1)
      .mapPartitions { bs =>
        bs.flatMap { b =>
          val in = new java.io.ByteArrayInputStream(b) {
            override def close(): Unit = { closedAcc.add(1); super.close() }
          }
          // take(1) leaves the iterator UNEXHAUSTED, so the eager
          // close-on-exhaustion path never fires — only the
          // TaskContext completion listener can close the stream
          Sources.warcRecords(in).take(1)
        }
      }.collect()
    assert(taken.toList == List("https://a/1" -> "one"))
    assert(closedAcc.value == 1L)
  }

  test("parseWarc: an oversized Content-Length fails with the cap message, not an overflow artifact") {
    val huge = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://a/1\r\n" +
      s"Content-Length: ${3L * Int.MaxValue}\r\n\r\n").getBytes(UTF_8)
    val e = intercept[IllegalArgumentException](Sources.parseWarc(huge).toList)
    assert(e.getMessage.contains("per-record cap"))
  }

  test("src_warcgz roundtrip: gz and plain stagings answer identically") {
    val viaGz = Sources.warcGzRoundtrip(spark, sf)
    val viaPlain = Sources.warcRoundtrip(spark, sf)
    assert(viaGz.collect().toSeq == viaPlain.collect().toSeq)
  }

  test("src_warc roundtrip: extraction through WARC framing matches extraction over the text staging") {
    val viaWarc = Sources.warcRoundtrip(spark, sf)
    val viaText = TextAnalysis.extractText(
      spark.read.text(Sources.htmlCorpusDir(spark, sf)))
    val n = Tables.documents(spark, sf).count()
    assert(viaWarc.count() == n)
    // identical per-doc extraction columns: the framed payloads are
    // byte-identical to the staged pages
    val j = viaWarc.alias("w").join(viaText.alias("t"), Seq("doc_id"))
    assert(j.where(col("w.text_h") =!= col("t.text_h") ||
      col("w.words_kept") =!= col("t.words_kept")).count() == 0)
    // the WARC-Target-URI header carries the planted docUrl verbatim
    val urls = Tables.documents(spark, sf)
      .select(col("doc_id"), Sources.docUrl.as("u"))
    assert(viaWarc.join(urls, Seq("doc_id"))
      .where(col("url") =!= col("u")).count() == 0)
  }

  test("pipe_warc: URL dedup is stage 0 — w1 = distinct canonical URLs, p0 = w1, stages monotone") {
    val out = TrainingPipeline.queries("pipe_warc")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(spark, sf)
    assert(out("w0_fetched") == docs.count())
    val distinctCanon = docs
      .select(graft.operators.Dedup.canonicalUrl(Sources.docUrl).as("c"))
      .distinct().count()
    assert(out("w1_url") == distinctCanon)
    assert(out("w1_url") < out("w0_fetched")) // planted variants collide
    assert(out("p0_input") == out("w1_url"))  // extraction sees only survivors
    val chain = Seq("p0_input", "p1_langid", "p2_quality", "p3_gopher",
      "p4_decontam", "p5_exact", "p6_neardup").map(out)
    assert(chain.zip(chain.tail).forall { case (a, b) => b <= a })
    assert(chain.last > 0)
  }
}
