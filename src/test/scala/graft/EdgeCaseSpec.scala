package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degenerate-document hardening: every text operator must survive (no
  * throw, no spurious rows) docs that are empty, whitespace-only,
  * letterless, non-ASCII, or sub-shingle-length — the classes the
  * sf corpora don't contain. */
class EdgeCaseSpec extends SparkSpec {

  private def weird: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "", "en", "src0", 0L),
      (2L, "   ", "en", "src0", 3L),
      (3L, "123 456 !!", "en", "src0", 10L),            // letterless
      (4L, "héllo wörld Ψυχή héllo", "de", "src0", 22L), // non-ASCII letters
      (5L, "one", "en", "src0", 3L),                     // < shingle width
      (6L, "two words", "en", "src0", 9L),
      (7L, "the the the the", "en", "src0", 15L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("wordcount: unicode letters tokenize, letterless docs contribute nothing") {
    val wc = WordCount.wordCount(weird).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc("héllo") == 2L && wc("Ψυχή") == 1L && wc("the") == 4L)
    assert(!wc.keySet.exists(_.exists(_.isDigit)))
  }

  test("quality: zero-token docs get NULL ratios, not a crash") {
    val q = TextAnalysis.quality(weird)
    val zeroTok = q.where(col("n_tokens") === 0)
    assert(zeroTok.count() == 3) // docs 1, 2, 3
    assert(zeroTok.where(col("mean_wlen").isNotNull || col("quality").isNotNull).count() == 0)
    assert(q.where(col("n_tokens") > 0 && col("quality").isNull).count() == 0)
  }

  test("tokencount/fingerprint/langid: one row per doc, including degenerate docs") {
    assert(TextAnalysis.tokenCount(weird).count() == 7)
    assert(TextAnalysis.fingerprint(weird).count() == 7)
    val l = TextAnalysis.langId(weird)
    assert(l.count() == 7)
    assert(l.where(col("doc_id").isin(1L, 2L, 3L) && col("pred_lang") =!= "und").count() == 0)
  }

  test("minhash: only docs with >= 3 words get bands; native simhash drops letterless docs") {
    val b = Dedup.minhashBands(weird)
    assert(b.select("doc_id").distinct().collect().map(_.getLong(0)).toSet ==
      Set(4L, 7L)) // the only docs with >= 3 words
    val declarative = Dedup.simhash(weird).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = Dedup.simhashNative(weird).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(declarative == native) // same doc set AND same values, unicode included
  }

  test("ngram jaccard: repeated-word doc collapses to its distinct bigram set") {
    val j = Dedup.ngramJaccard(weird)
    // no pair may involve a doc without bigrams (docs 1,2,3,5)
    assert(j.where(col("doc_a").isin(1L, 2L, 3L, 5L) ||
      col("doc_b").isin(1L, 2L, 3L, 5L)).count() == 0)
  }

  test("percentiles: a single-doc language has p50=p90=p99=its own length") {
    val p = TextAnalysis.lengthPercentiles(
      weird.where(col("doc_id") === 4L)) // lone 'de' doc
    val r = p.collect()(0)
    assert(r.getLong(2) == 22L && r.getLong(3) == 22L && r.getLong(4) == 22L)
  }

  test("normalize: letterless doc collapses to the empty-string hash") {
    val n = TextAnalysis.normalize(weird)
    val emptyHash = "d41d8cd98f00b204e9800998ecf8427e" // md5("")
    val letterless = n.where(col("doc_id").isin(1L, 2L, 3L)).collect()
    assert(letterless.forall(r => r.getString(1) == emptyHash && r.getLong(2) == 0L))
  }

  test("as-of attribution on a user with views only emits nothing") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, new java.sql.Timestamp(1000), 7L, "view", 1.0),
      (2L, new java.sql.Timestamp(2000), 7L, "view", 1.0),
      (3L, new java.sql.Timestamp(3000), 8L, "purchase", 1.0), // purchase, never viewed
      (4L, new java.sql.Timestamp(500), 9L, "view", 1.0),
      (5L, new java.sql.Timestamp(600), 9L, "purchase", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val a = Events.asofAttribution(ev).collect()
    assert(a.length == 1 && a(0).getLong(0) == 9L && a(0).getLong(2) == 4L)
  }

  test("multimodal resize survives empty-content blobs") {
    val resized = Multimodal.resize(Multimodal.ingest(weird), 16, 16).collect()
    assert(resized.length == 7)
    // doc 1 has empty text but is an audio row: the real WAV codec still
    // emits a decodable 256-frame blob (digest head + zero amplitude)
    val empty = resized.find(_.media_id == 1L).get
    assert(empty.kind == "audio")
    assert(graft.operators.AudioCodec.decode(empty.content, 1L)._1 == 256)
  }

  test("chunked source: empty docs yield zero chunks, others reassemble") {
    val ch = graft.sources.Sources.chunked(weird, 4)
    assert(ch.where(col("doc_id") === 1L).count() == 0)
    val re = ch.where(col("doc_id") === 4L).orderBy("chunk_no")
      .agg(concat_ws("", collect_list("chunk"))).head().getString(0)
    assert(re == "héllo wörld Ψυχή héllo")
  }

  test("r9 operators on degenerate corpora: empty frames, thresholded dedup, fixed-N chunks") {
    val s = spark
    import s.implicits._
    val none = weird.where(lit(false))
    // fixed-N chunkize of an EMPTY corpus: tot = 0, no pieces, no rows
    assert(graft.sources.Sources.concatChunkedN(none, 5).count() == 0)
    assert(operators.WordCount.chunkedNWordCount(none).count() == 0)
    // weird corpus: chunk set reassembles to the full concatenated stream
    val total = weird.agg(sum(length(col("text")))).head().getLong(0)
    val chunks = graft.sources.Sources.concatChunkedN(weird, 5)
      .agg(sum(length(col("chunk")))).head().getLong(0)
    assert(chunks == total, s"fixed-N chunks lost chars: $chunks != $total")
    // thresholded dedup: docs under 3 words have no signatures — no
    // pairs, no crash; the repeated-word doc pairs with nothing
    assert(operators.Dedup.minhashThresholded(weird).count() == 0)
    assert(operators.Dedup.minhashThresholded(none).count() == 0)
    // eager-mult on an empty events frame: zero groups, not a crash
    val ev0 = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val orders = Seq((1L, 1L, "1-URGENT")).toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val perUser = ev0.groupBy("user_id")
      .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 10))).as("ev_sum"),
        count(lit(1)).as("ev_n"))
    val r = orders.join(broadcast(perUser), col("o_custkey") === col("user_id"))
      .groupBy("o_orderpriority").agg(sum("ev_sum"), sum("ev_n"))
    assert(r.count() == 0)
  }

  test("bpe: empty/whitespace docs vanish, non-ASCII letters become per-code-point UNKs") {
    val b = TextAnalysis.bpeTokens(weird)
    assert(b.where(col("doc_id").isin(1L, 2L)).count() == 0) // no words → no row
    // "héllo" = h + UNK(é) + l + l + o → 2 words ⇒ n_unk ≥ 2 for doc 4
    val d4 = b.where(col("doc_id") === 4L).head()
    assert(d4.getLong(3) >= 2L, s"expected UNKs for non-ASCII letters: $d4")
    // letterless-but-worded doc 3 tokenizes digits (0-9 are in-vocab)
    val d3 = b.where(col("doc_id") === 3L).head()
    assert(d3.getLong(3) >= 2L) // the '!' bangs are UNK
    // packing over bpe counts stays gap-free on the weird corpus
    val p = TextAnalysis.bpePacking(weird)
    assert(p.where(col("n_tokens") <= 0).count() == 0)
  }

  test("unigram log-prob: wordless docs vanish, single-corpus-word doc scores ln(p) exactly") {
    val u = TextAnalysis.unigramLogProb(weird)
    assert(u.where(col("doc_id").isin(1L, 2L)).count() == 0)
    assert(u.where(col("sum_lp") >= 0).count() == 0)
  }

  test("r8 text ops survive degenerate docs: cdc zeroes, ppl buckets skip wordless, pii residual 0") {
    // cdc: empty/whitespace/letterless docs emit (0, 0, 0) rows, never vanish
    val cdc = TextAnalysis.cdcChunks(weird).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(cdc.keySet == (1L to 7L).toSet)
    assert(cdc(1L) == ((0L, 0L, 0L)) && cdc(2L) == ((0L, 0L, 0L)) && cdc(3L) == ((0L, 0L, 0L)))
    assert(cdc(7L)._1 >= 1L)
    // ppl buckets: wordless docs (empty/whitespace — the LM splits on
    // spaces) are unscored and absent; scored docs bucket 1..3
    val ppl = TextAnalysis.pplBuckets(weird).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(ppl.map(_._1).toSet == Set(3L, 4L, 5L, 6L, 7L), ppl.toSeq.toString)
    assert(ppl.forall(t => t._2 >= 1 && t._2 <= 3))
    // textrank: single-word docs contribute no edges; the repeated-word
    // doc yields the self-loop graph and still converges
    val tr = TextAnalysis.textRank(weird).collect().map(_.getString(0))
    assert(tr.contains("the") && !tr.contains("one"),
      s"nodes must come from bigram edges only: ${tr.toSeq}")
    // pii: degenerate docs redact nothing and leave residual 0
    val pii = TextAnalysis.piiRedact(weird).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(pii.values.forall(_ == 0L))
  }

  test("ohlc on an empty frame yields zero bars, not a crash") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Events.ohlc(empty).collect().isEmpty)
  }

  test("scd2/fill: a user with one purchase yields one open version and a one-day spine") {
    val s = spark
    import s.implicits._
    val one = Seq(
      (10L, new java.sql.Timestamp(1704067200000L), 7L, "purchase", 5.0),
      (11L, new java.sql.Timestamp(1704067200000L + 3600_000L), 8L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val v = Events.scd2(one)
    assert(v.count() == 1)
    val r = v.head()
    assert(r.getLong(5) == 1L && r.isNullAt(4)) // is_current, valid_to NULL
    val f = Events.fillDaily(one)
    assert(f.count() == 1 && f.head().getLong(3) == 0L) // 1-day spine, not a gap
  }

  test("graph family on degenerate corpora: no edges, letterless, empty") {
    // weird's only multi-edge doc is "héllo wörld Ψυχή héllo" — a
    // 3-CYCLE (the last adjacency closes back to héllo), so exactly one
    // triangle exists; self-loops ("the the") drop; all three graph
    // operators must survive and partition the vocabulary
    val bfs = WordCount.bfs(weird).collect()
    val vocab = WordCount.tokens(weird).distinct().count()
    assert(bfs.map(_.getLong(1)).sum == vocab)
    val lpa = WordCount.lpa(weird).collect()
    assert(lpa.map(_.getLong(1)).sum == vocab)
    val tri = WordCount.triangles(weird).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Seq("héllo", "wörld", "Ψυχή").forall(w => tri.get(w).contains(1L)), tri)
    assert(tri.filterKeys(w => !Set("héllo", "wörld", "Ψυχή")(w)).values.forall(_ == 0L), tri)
  }

  test("new event operators on a single-event corpus: no crashes, sane zeros") {
    val s = spark
    import s.implicits._
    val one = Seq((1L, new java.sql.Timestamp(1704067200000L), 8L, "purchase", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Events.markov2(one).count() == 0)      // no pairs → empty matrix
    val sm = Events.seqMatch(one).collect()       // "p" matches nothing
    assert(sm.length == Events.SeqPatterns.length && sm.forall(_.getLong(2) == 0L))
    val ft = Events.features(one).head()
    assert(ft.isNullAt(2) && ft.getLong(3) == -1L && ft.getLong(4) == 0L)
    val ab = Events.abTest(one).head()            // one arm empty → den=0 path
    assert(ab.getLong(7) == 0L)
  }
}
