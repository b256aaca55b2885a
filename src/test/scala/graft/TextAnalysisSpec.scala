package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("bpeTrain: hand-traced merge trajectory, leftmost non-overlap, early exhaustion") {
    val s = spark
    import s.implicits._
    // word counts: aaab×2, ab×1. Round 1: (a,a) weight 4 beats (a,b) 3
    // — and aaab merges LEFTMOST to [aa, a, b], not [a, aa, b]; round
    // 2: (a,b) 3 beats (aa,a) 2; round 3: (aa,ab) 2; round 4+: every
    // word is one symbol — training exhausts at 3 merges, not 8
    val d = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeTrain(d).as[(Long, String, String, Long)].collect().toSeq
    assert(r == Seq((1L, "a", "a", 4L), (2L, "a", "b", 3L), (3L, "aa", "ab", 2L)),
      r.toString)
    // the aaaa overlap case: merge (a,a) must produce [aa, aa] (two
    // disjoint merges), so round 2's (aa,aa) weight equals the word
    // count — the shared-separator encoding bug this pins
    val d2 = Seq((1L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val r2 = TextAnalysis.bpeTrain(d2).as[(Long, String, String, Long)].collect().toSeq
    assert(r2 == Seq((1L, "a", "a", 9L), (2L, "aa", "aa", 3L)), r2.toString)
  }

  /** In-test reference BPE encode: chars, then each learned merge as a
    * leftmost non-overlapping literal replace on the pipe-delimited
    * form — the SAME semantics both engines' `replace` implement,
    * derived independently of the distributed loop under test. */
  private def refSeg(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var seq = "|" + word.map(_.toString).mkString("||") + "|"
    for ((l, r) <- merges) seq = seq.replace(s"|$l||$r|", s"|$l$r|")
    seq.stripPrefix("|").stripSuffix("|").split("\\|\\|").toSeq
  }

  test("bpe train→tokenize: the learned merges drive the encode, each changing the next round's tokenization") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "banana banana banana bandana"),
      (2L, "banana apple apple bananas"),
      (3L, "ananas apple bandana banana cabana")).toDF("doc_id", "text")
    val (mergesDf, vocabDf) =
      TextAnalysis.bpeTrainRounds(d, TextAnalysis.BpeTrainMerges)
    val merges = mergesDf.orderBy("step")
      .select("merge_left", "merge_right").as[(String, String)].collect().toSeq
    assert(merges.size == TextAnalysis.BpeTrainMerges, merges.toString)
    // 1. the final training vocab IS the learned encode: every word's
    //    seq equals the reference replay of the merges over its chars
    val vocab = vocabDf.select("word", "seq").as[(String, String)].collect().toMap
    for ((w, seq) <- vocab)
      assert(seq == "|" + refSeg(w, merges).mkString("||") + "|",
        s"$w: $seq != replayed merges")
    // 2. the VERDICT pin: a merge learned in round k changes round-k+1
    //    tokenization — total symbol count strictly drops at every k
    for (k <- 1 to merges.size) {
      val before = vocab.keys.toSeq.map(w => refSeg(w, merges.take(k - 1)).size).sum
      val after = vocab.keys.toSeq.map(w => refSeg(w, merges.take(k)).size).sum
      assert(after < before, s"merge $k (${merges(k - 1)}) changed no word's tokenization")
    }
    // 3. the gated per-doc stats equal an independent recomputation
    //    from the reference segmentation of each occurrence
    val got = TextAnalysis.bpeLearnedTokens(d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val want = Seq((1L, "banana banana banana bandana"),
        (2L, "banana apple apple bananas"),
        (3L, "ananas apple bandana banana cabana"))
      .map { case (id, text) =>
        val ws = text.split(" ").filter(_.nonEmpty).toSeq
        val segs = ws.map(w => refSeg(w, merges))
        (id, ws.size.toLong,
          segs.map(_.size.toLong).sum,
          segs.map(_.zipWithIndex.map { case (sym, i) => (i + 1).toLong * sym.length }.sum).sum)
      }
    assert(got == want, s"$got != $want")
  }

  test("bpe learned encode survives training exhaustion (vocab persists past empty rounds)") {
    val s = spark
    import s.implicits._
    // aaab/ab exhaust after 3 merges (hand-traced above): rounds 4-8
    // learn nothing, and the learned segmentation must still cover
    // every word — one symbol each by then
    val d = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeLearnedTokens(d).as[(Long, Long, Long, Long)].collect().toSeq
    // 3 words, each a single learned symbol of full word length:
    // checksum = Σ 1·len = 4+4+2
    assert(r == Seq((1L, 3L, 3L, 10L)), r.toString)
  }

  test("collocations: lift is the exact double ratio; support floor filters; corpus run sorted") {
    val s = spark
    import s.implicits._
    // 6 docs "ka kb" + 4 docs "ma mb": N_uni = 20, N_big = 10;
    // lift(ka,kb) = 6·20² / (6·6·10) — computed HERE with the operator's
    // exact parenthesization, so the equality is bit-for-bit;
    // (ma,mb) has c12 = 4 < CollocMinCount and must be filtered
    val d = ((1 to 6).map(i => (i.toLong, "ka kb")) ++
      (7 to 10).map(i => (i.toLong, "ma mb"))).toDF("doc_id", "text")
    val r = TextAnalysis.collocations(d)
      .as[(String, String, Long, Double)].collect()
    assert(r.length == 1, r.mkString("; "))
    val (w1, w2, c12, lift) = r.head
    assert((w1, w2, c12) == ("ka", "kb", 6L))
    assert(lift == 6.0 * 20.0 * 20.0 / ((6.0 * 6.0) * 10.0), lift.toString)
    // corpus: sorted by lift desc, every survivor meets the floor
    val c = TextAnalysis.collocations(Tables.documents(spark, sf))
      .as[(String, String, Long, Double)].collect()
    assert(c.length <= TextAnalysis.CollocTop)
    assert(c.forall(_._3 >= TextAnalysis.CollocMinCount))
    val lifts = c.map(_._4).toSeq
    assert(lifts == lifts.sortBy(-_), "not sorted by lift desc")
  }

  test("dsir: target-vocabulary docs outrank source-vocabulary docs, weights are exact integer sums") {
    val s = spark
    import s.implicits._
    // two disjoint vocabularies: 'en' docs speak A, others speak B —
    // so A-grams have high target/source ratio, B-grams low
    val d = Seq(
      (1L, "alpha beta gamma alpha beta", "en"),
      (2L, "alpha gamma beta gamma", "en"),
      (3L, "omega psi chi omega psi", "de"),
      (4L, "psi chi omega chi", "de"),
      // the probe: an 'fr' doc written in TARGET vocabulary must
      // outrank an 'en'-tagged doc written in source-only vocabulary —
      // DSIR scores CONTENT, not the label that trained the model
      (5L, "alpha beta gamma beta", "fr"),
      (6L, "omega psi chi psi", "en"))
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.dsir(d).as[(Long, Long, Long)].collect()
    val byDoc = r.map(t => t._1 -> t._3).toMap
    // ordering: every A-vocab doc above every B-vocab doc
    val aDocs = Seq(1L, 2L, 5L).map(byDoc)
    val bDocs = Seq(3L, 4L, 6L).map(byDoc)
    assert(aDocs.min > bDocs.max, r.mkString(", "))
    // the content-not-label pin, explicitly
    assert(byDoc(5L) > byDoc(6L), r.mkString(", "))
    // exactness: recompute doc 1's weight from first principles
    val grams1 = Seq("alpha", "beta", "gamma", "alpha", "beta",
      "alpha beta", "beta gamma", "gamma alpha", "alpha beta")
    val all = Seq(
      (1L, "alpha beta gamma alpha beta", "en"), (2L, "alpha gamma beta gamma", "en"),
      (3L, "omega psi chi omega psi", "de"), (4L, "psi chi omega chi", "de"),
      (5L, "alpha beta gamma beta", "fr"), (6L, "omega psi chi psi", "en"))
    def gramsOf(t: String) = {
      val w = t.split(" ").filter(_.nonEmpty)
      w.toSeq ++ w.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    }
    def bucket(g: String) = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dsir:$g".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5, 16) % TextAnalysis.DsirBuckets
    }
    val occ = all.flatMap { case (id, t, l) => gramsOf(t).map(g => (id, l, bucket(g))) }
    val tsN = occ.size.toLong
    val ttN = occ.count(_._2 == "en").toLong
    val b = TextAnalysis.DsirBuckets
    val lpd8 = occ.groupBy(_._3).map { case (bk, os) =>
      val cs = os.size.toLong
      val ct = os.count(_._2 == "en").toLong
      bk -> BigDecimal(math.log((ct + 1).toDouble * (tsN + b) /
        ((cs + 1).toDouble * (ttN + b))) * 1e8)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val want1 = grams1.map(g => lpd8(bucket(g))).sum
    assert(byDoc(1L) == want1, s"${byDoc(1L)} != $want1")
  }

  test("piiRedact: real-world formats scrub, look-alikes survive, residual is zero") {
    val s = spark
    import s.implicits._
    // doc_ids chosen ≡ 0 (mod 5) so the injection layer adds NOTHING —
    // the assertions are purely about the handcrafted payloads
    val d = Seq(
      (5L,  "reach me at jane.doe+spam@sub.example.co.uk today"),
      (10L, "ssn 078-05-1120 phone 212-555-0187 host 192.168.001.1"),
      (15L, "v1.2.3 released; call 555-0187 re 12-34-5678"),  // look-alikes: short phone, 2-4 ver, 2-2-4
      (20L, "10.0.0.1 10.0.0.2 a@b.io c@d.io")).toDF("doc_id", "text")
    val r = operators.TextAnalysis.piiRedact(d)
      .as[(Long, Long, Long, Long, Long, Long, String, Long)].collect()
      .map(t => t._1 -> t).toMap
    // (doc_id, n_email, n_ssn, n_phone, n_ip, n_residual, hash, len)
    assert(r(5L)._2 == 1 && r(5L)._5 == 0)              // full RFC-ish email caught
    assert(r(10L)._3 == 1 && r(10L)._4 == 1 && r(10L)._5 == 1)
    assert(r(15L)._2 == 0 && r(15L)._3 == 0 && r(15L)._4 == 0 && r(15L)._5 == 0)
    assert(r(20L)._5 == 2 && r(20L)._2 == 2)            // multiple entities per doc
    assert(r.values.forall(_._6 == 0), "residual matches after redaction")
    // the cleaned text really carries the masks
    val cleaned = operators.TextAnalysis.piiRedact(d)
    val masked = d.select(col("doc_id"),
        operators.TextAnalysis.PiiPatterns.foldLeft(col("text")) {
          case (c, (_, pat, mask)) => regexp_replace(c, pat, mask) }.as("m"))
      .as[(Long, String)].collect().toMap
    assert(masked(10L) == "ssn <SSN> phone <PHONE> host <IP>")
  }

  test("trainPerceptron: learns a separable signal; final model classifies the train set") {
    val s = spark
    import s.implicits._
    // label +1 docs contain 'shiny', -1 docs contain 'rusty'; filler shared
    val docs = (1L to 40L).map { i =>
      val marker = if (i % 2 == 0) "shiny" else "rusty"
      (i, s"filler common words $marker here")
    }.toDF("doc_id", "text")
    val labels = docs.select(col("doc_id"),
      (when(pmod(col("doc_id"), lit(2)) === 0, 1L).otherwise(-1L)).as("y"))
    val w = operators.TextAnalysis.trainPerceptron(docs, labels)
      .as[(Long, Long)].collect().toMap
    def bucket(word: String): Long =
      spark.range(1).select(
          (operators.Dedup.h32(lit("clf"), lit(word))
            % operators.TextAnalysis.ClfBuckets).as("b"))
        .collect()(0).getLong(0)
    // the discriminative words carry opposite-sign weights
    assert(w(bucket("shiny")) > 0, s"shiny weight: ${w.get(bucket("shiny"))}")
    assert(w(bucket("rusty")) < 0, s"rusty weight: ${w.get(bucket("rusty"))}")
    // and the learned model separates the training set perfectly: the
    // shared filler weights cancel in the score difference
    val score = (marker: String) =>
      Seq("filler", "common", "words", marker, "here")
        .map(t => w.getOrElse(bucket(t), 0L)).sum
    assert(score("shiny") > 0 && score("rusty") <= 0)
  }

  test("pplBuckets: per-lang tercile order holds; equal scores share a bucket") {
    val docs = Tables.documents(spark, sf)
    val r = operators.TextAnalysis.pplBuckets(docs)
      .select("doc_id", "lang", "avg_lp", "bucket")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getDouble(2), x.getLong(3)))
    assert(r.nonEmpty && r.forall(t => t._4 >= 1 && t._4 <= 3))
    // within a language: higher score (less perplexity) → same-or-better
    // bucket, and every doc sharing a score shares a bucket
    for ((_, byLang) <- r.groupBy(_._2)) {
      val sorted = byLang.sortBy(-_._3)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 <= b._4 || a._3 == b._3
        case _           => true
      }, "bucket must be monotone in score")
      for ((_, grp) <- byLang.groupBy(_._3))
        assert(grp.map(_._4).distinct.length == 1, "score-granular cut violated")
    }
    // every lang with ≥3 distinct scores populates all three buckets
    for ((lang, byLang) <- r.groupBy(_._2) if byLang.map(_._3).distinct.length >= 3)
      assert(byLang.map(_._4).distinct.sorted.sameElements(Seq(1L, 2L, 3L)),
        s"lang $lang missing a tercile")
  }

  test("textRank: hand-computed 3-node fixpoint; in-degree drives rank") {
    val s = spark
    import s.implicits._
    // edges: a→b (×2), c→b (×1); out(a)=2, out(c)=1; N=3, r0=1/3
    // epoch1: b ← 0.15+0.85·(r0·2/2 + r0·1/1) ; a,c ← 0.15 (no in-edges)
    // epoch2+: b ← 0.15+0.85·(0.15+0.15) = 0.405 — fixpoint
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "c b"))
      .toDF("doc_id", "text")
    val r = operators.TextAnalysis.textRank(docs)
      .as[(String, Double)].collect().toMap
    assert(r.keySet == Set("a", "b", "c"))
    assert(r("a") == 0.15 && r("c") == 0.15, s"no-inbound ranks: $r")
    assert(r("b") == 0.405, s"hub rank after ${operators.TextAnalysis.PrIters} epochs: $r")
  }

  test("cdc chunking: an insertion only disturbs chunks near the edit; fixed chunking shifts everything") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val base = Vector.fill(400)(vocab(rng.nextInt(vocab.length)))
    val edited = (base.take(200) ++ Vector("INSERTED", "WORDS", "HERE") ++ base.drop(200))
    val docs = Seq((1L, base.mkString(" ")), (2L, edited.mkString(" ")))
      .toDF("doc_id", "text")
    val ch = operators.TextAnalysis.cdcChunkTable(docs)
      .select("doc_id", "chunk_hash").as[(Long, String)].collect()
    val h1 = ch.filter(_._1 == 1L).map(_._2).toSet
    val h2 = ch.filter(_._1 == 2L).map(_._2).toSet
    val shared = (h1 intersect h2).size
    // chunks away from the edit keep their boundaries AND hashes: the
    // overwhelming majority must survive the insertion
    assert(shared >= h1.size - 4,
      s"only $shared of ${h1.size} chunks survived a 3-word insertion")
    // contrast: fixed-size chunking shares almost nothing after the shift
    val fixed1 = base.grouped(16).map(_.mkString(" ")).toSet
    val fixed2 = edited.grouped(16).map(_.mkString(" ")).toSet
    assert((fixed1 intersect fixed2).size <= shared / 2,
      "fixed chunking should lose most chunks to the offset shift")
    // and the gate query itself flags the cross-doc duplicate chunks
    val gate = operators.TextAnalysis.cdcChunks(docs)
      .select("doc_id", "n_dup_chunks").as[(Long, Long)].collect().toMap
    assert(gate(1L) >= (h1.size - 4).toLong)
  }

  test("inline flag columns agree exactly with the staged langId/quality frames") {
    val docs = Tables.documents(spark, sf)
    val inline = docs.select(col("doc_id"),
        operators.TextAnalysis.langAgreeCol.cast("long").as("agree_i"),
        operators.TextAnalysis.qualityScoreCol.as("quality_i"))
    val staged = operators.TextAnalysis.langId(docs).select("doc_id", "agree")
      .join(operators.TextAnalysis.quality(docs).select("doc_id", "quality"), "doc_id")
    val joined = inline.join(staged, "doc_id")
    // null-SAFE inequality: a one-sided NULL (e.g. a dropped nullif
    // guard on one form) must fail the test, not be filtered by it
    assert(joined.where(!(col("agree_i") <=> col("agree"))).count() == 0)
    // exact same double arithmetic, not approximate agreement
    assert(joined.where(!(col("quality_i") <=> col("quality"))).count() == 0)
  }

  private def docs = Tables.documents(spark, sf)

  test("curriculum: phase-major positions, within-phase order matches the seeded permutation") {
    val got = TextAnalysis.curriculum(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // positions are a permutation 0..n-1
    assert(got.map(_._3).sorted.toSeq == (0L until got.length).toSeq)
    // phase-major: every phase-p position precedes every phase-(p+1) one
    val byPhase = got.groupBy(_._2)
    for (p <- byPhase.keys; q <- byPhase.keys; if p < q)
      assert(byPhase(p).map(_._3).max < byPhase(q).map(_._3).min,
        s"phase $p positions overlap phase $q")
    // phase assignment matches the gated quality arithmetic (NULL → 2)
    val quality = TextAnalysis.quality(docs).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(7)) None else Some(r.getDouble(7)))).toMap
    for ((id, ph, _, _, _) <- got) {
      val want = quality(id) match {
        case Some(s) if s >= TextAnalysis.CurriculumHi => 0L
        case Some(s) if s >= TextAnalysis.QualityMin   => 1L
        case _                                         => 2L
      }
      assert(ph == want, s"doc $id phase $ph want $want (q=${quality(id)})")
    }
    // within-phase order is the seeded h32 permutation (same key as
    // text_shard — replay it)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(id: Long): Long = java.lang.Long.parseLong(
      md.digest(s"shard:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8), 16)
    for ((p, rows) <- byPhase) {
      val inOrder = rows.sortBy(_._3).map(_._1).toSeq
      val want = rows.map(_._1).sortBy(id => (h32(id), id)).toSeq
      assert(inOrder == want, s"phase $p within-phase order diverges")
    }
    // shard arithmetic from position
    assert(got.forall { case (_, _, pos, sid, spos) =>
      sid == pos / TextAnalysis.ShardSize && spos == pos % TextAnalysis.ShardSize })
    // all three phases actually populated on the corpus
    assert(byPhase.keySet == Set(0L, 1L, 2L), s"phases: ${byPhase.keySet}")
  }

  test("lineDedup: keep-first removal — planted duplicate blocks die everywhere but their first site") {
    val s = spark
    import s.implicits._
    val eight = "w1 w2 w3 w4 w5 w6 w7 w8" // one aligned block
    val other = "x1 x2 x3 x4 x5 x6 x7 x8"
    val d = Seq(
      (1L, s"$eight $other"),       // blocks 1,2 — both first occurrences
      (2L, s"$eight $eight"),       // both blocks duplicate doc 1's block 1
      (3L, s"$other tail"),         // block 1 dups doc 1's block 2; "tail" unique short block
      (4L, "short")                 // single 1-word block, unique
    ).toDF("doc_id", "text")
    val r = TextAnalysis.lineDedup(d).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    // doc 1: 2 lines, both kept (first occurrences), 16 words kept
    assert(r(1L) == (2L, 2L, 16L))
    // doc 2: 2 lines, both removed (doc 1 block 1 is the keeper)
    assert(r(2L) == (2L, 0L, 0L))
    // doc 3: "other" removed, "tail" kept (unique) — 1 word survives
    assert(r(3L) == (2L, 1L, 1L))
    // doc 4: unique short block kept
    assert(r(4L) == (1L, 1L, 1L))
    // within-doc duplicates ALSO dedup: doc 2's two identical blocks
    // both lose to doc 1, but if doc 1 didn't exist the first would win
    val r2 = TextAnalysis.lineDedup(d.where(col("doc_id") =!= 1L)).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r2(2L) == (2L, 1L), "first of the two identical blocks must survive")
    // and the real corpus genuinely loses lines to the pass
    val c = TextAnalysis.lineDedup(docs)
      .agg(sum("n_lines"), sum("n_kept")).collect()(0)
    assert(c.getLong(1) < c.getLong(0), "corpus has no duplicated lines to remove")
  }

  test("sharding: matches a driver-side replay of the seeded permutation; shards fill in order") {
    val got = TextAnalysis.sharding(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // independent replay: md5-derived key, rank over (key, doc_id)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(id: Long): Long = {
      val hex = md.digest(s"shard:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val want = ids.map(id => (h32(id), id)).sortBy(identity).zipWithIndex
      .map { case ((_, id), pos) =>
        (id, pos.toLong, pos / TextAnalysis.ShardSize, pos % TextAnalysis.ShardSize) }
    assert(got.sortBy(_._2).toSeq == want.toSeq)
    // positions are a permutation 0..n-1; every shard except the last
    // is exactly full, and shard order is position order
    assert(got.map(_._2).sorted.toSeq == (0L until ids.length).toSeq)
    val byShard = got.groupBy(_._3).toSeq.sortBy(_._1)
    assert(byShard.dropRight(1).forall(_._2.length == TextAnalysis.ShardSize))
    // deterministic: a rerun produces the identical assignment
    val again = TextAnalysis.sharding(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.sortBy(_._2).toSeq == got.sortBy(_._2).toSeq)
    // and the permutation genuinely shuffles: ingestion order broken
    val byPos = got.sortBy(_._2).map(_._1)
    assert(byPos.zip(byPos.tail).exists { case (a, b) => a > b })
  }

  test("tfidf: top-k per doc, ranks contiguous, score consistent with tf/df") {
    val docs = Tables.documents(spark, sf)
    val t = TextAnalysis.tfidf(docs)
    // ≤ TopK rows per doc with ranks 1..k
    val perDoc = t.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("rnk").as("mx"), min("rnk").as("mn"))
    assert(perDoc.where(col("n") > TextAnalysis.TfidfTopK ||
      col("mx") =!= col("n") || col("mn") =!= 1).count() == 0)
    // score recomputes from the emitted integers
    val nDocs = docs.count().toDouble
    val bad = t.where(
      abs(col("tfidf") - round(col("tf") * log(lit(nDocs) / col("df")), 4)) > 1e-9)
    assert(bad.count() == 0)
    // a word appearing in every document scores 0
    assert(t.where(col("df") === docs.count() && col("tfidf") =!= 0.0).count() == 0)
  }

  test("langid: one row per doc, pred in known set") {
    val l = TextAnalysis.langId(docs)
    assert(l.count() == docs.count())
    val preds = l.select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(TextAnalysis.Markers.map(_._1).toSet + "und"))
  }

  test("percentiles: ordered p50<=p90<=p99 within observed range, n_docs sums to total") {
    val p = TextAnalysis.lengthPercentiles(docs)
    assert(p.where(col("p50") > col("p90") || col("p90") > col("p99")).count() == 0)
    val total = p.agg(sum("n_docs")).head().getLong(0)
    assert(total == docs.count())
    val joined = p.join(
      docs.groupBy("lang").agg(min("n_chars").as("mn"), max("n_chars").as("mx")), "lang")
    assert(joined.where(col("p50") < col("mn") || col("p99") > col("mx")).count() == 0)
  }

  test("hash sample: deterministic, membership depends only on doc_id") {
    val s1 = TextAnalysis.hashSample(docs).collect().map(_.getLong(0)).toSeq
    val s2 = TextAnalysis.hashSample(docs.repartition(7)).collect().map(_.getLong(0)).toSeq
    assert(s1 == s2 && s1.nonEmpty && s1.length < docs.count())
  }

  test("quality: ratios bounded, score in (0, 1]") {
    val q = TextAnalysis.quality(docs)
    assert(q.where(col("stop_ratio") < 0 || col("stop_ratio") > 1).count() == 0)
    assert(q.where(col("distinct_ratio") <= 0 || col("distinct_ratio") > 1).count() == 0)
    assert(q.where(col("quality") <= 0 || col("quality") > 1).count() == 0)
  }

  test("tokencount: regex tokens >= whitespace tokens on clean text") {
    val t = TextAnalysis.tokenCount(docs)
    assert(t.where(col("re_tokens") < col("ws_tokens")).count() == 0)
    assert(t.where(col("bpe_tokens") < col("ws_tokens")).count() == 0)
  }

  test("fingerprint: fp_shape invariant under word reorder, fp_content not") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(d).collect()
    assert(fp(0).getString(2) == fp(1).getString(2))  // fp_shape equal
    assert(fp(0).getString(1) != fp(1).getString(1))  // fp_content differs
  }

  test("domain mix: one audit row per source, kept within total, rates in the derived set") {
    val m = operators.TextAnalysis.domainMix(Tables.documents(spark, sf))
    val docs = Tables.documents(spark, sf)
    assert(m.count() == docs.select("source").distinct().count())
    assert(m.where(col("n_kept") > col("n_docs") || col("n_kept") < 0).count() == 0)
    assert(m.where(!col("rate_pct").isin(20L, 35L, 50L, 65L, 80L)).count() == 0)
    // determinism: membership depends only on (doc_id, source)
    val again = operators.TextAnalysis.domainMix(docs.repartition(7))
    assert(m.exceptAll(again).isEmpty && again.exceptAll(m).isEmpty)
  }

  test("unigram log-prob: negative scores, avg bounded by per-word extremes, count matches tokens") {
    val docs = Tables.documents(spark, sf)
    val u = operators.TextAnalysis.unigramLogProb(docs)
    assert(u.count() > 0)
    // every word probability < 1 ⇒ every sum/avg strictly negative
    assert(u.where(col("sum_lp") >= 0 || col("avg_lp") >= 0).count() == 0)
    // n_words agrees with the whitespace token count of the same doc
    val wc = docs.select(col("doc_id"),
      size(filter(split(col("text"), " "), w => w =!= "")).cast("long").as("n"))
    assert(u.join(wc, "doc_id").where(col("n_words") =!= col("n")).count() == 0)
    // a doc of only the corpus's most common words scores above (less
    // negative than) one containing its rarest word — the filter signal
    val ext = u.agg(min("avg_lp").as("lo"), max("avg_lp").as("hi")).collect()(0)
    assert(ext.getDouble(0) < ext.getDouble(1))
  }

  test("gopher rules: one row per doc, fractions bounded, repetition caught") {
    val s = spark
    import s.implicits._
    val g = TextAnalysis.gopherRules(docs)
    assert(g.count() == docs.count())
    assert(g.where(col("top_frac") <= 0 || col("top_frac") > 1).count() == 0)
    assert(g.where(col("dup_frac") < 0 || col("dup_frac") >= 1).count() == 0)
    assert(g.where(!col("passes").isin(0L, 1L)).count() == 0)
    // a pure-repetition doc must fail, a varied stopworded doc must pass
    val synth = Seq(
      (1L, Array.fill(30)("spam spam").mkString(" ")),
      (2L, (1 to 30).map(i => s"w$i").mkString("the ", " ", " end"))).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(synth).collect()
      .map(x => x.getLong(0) -> x.getLong(6)).toMap
    assert(r(1L) == 0L && r(2L) == 1L)
  }

  test("packing: per-language streams tile with no gaps or overlaps") {
    import org.apache.spark.sql.expressions.Window
    val p = TextAnalysis.packing(docs)
    // each doc starts exactly where its predecessor ended
    val w = Window.partitionBy("lang").orderBy("doc_id")
    val gaps = p.withColumn("prev_end",
        lag(col("start_off") + col("n_tokens"), 1, 0L).over(w))
      .where(col("start_off") =!= col("prev_end"))
    assert(gaps.count() == 0)
    // n_seqs covers at least ceil(n_tokens / seqLen) sequences (one more
    // when the doc straddles a boundary); `div`, not `/` — the double
    // quotient would compare 1 < 1.17 and flag every non-multiple doc
    assert(p.where(col("n_seqs") <
      expr(s"(n_tokens + ${TextAnalysis.PackSeqLen - 1}) div ${TextAnalysis.PackSeqLen}"))
      .count() == 0)
  }

  test("decontam: benchmark docs never flagged, hits are real shared 4-grams") {
    val d = TextAnalysis.decontaminate(docs)
    assert(d.where(col("doc_id") % TextAnalysis.BenchMod === 0).count() == 0)
    assert(d.where(col("n_hits") <= 0).count() == 0)
    // the composed cleaning step: anti-join removes exactly the flagged docs
    val clean = docs.join(d, Seq("doc_id"), "left_anti")
    assert(clean.count() == docs.count() - d.count())
  }

  test("classify: score is the exact integer sum of per-token bucket weights") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "x x y"), (2L, "y")).toDF("doc_id", "text")
    def wt(w: String): Long = {
      def h32(seed: String, v: String): Long =
        java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(s"$seed:$v".getBytes("UTF-8"))
            .take(4).map("%02x".format(_)).mkString, 16)
      h32("wgt", (h32("clf", w) % TextAnalysis.ClfBuckets).toString) % 2001 - 1000
    }
    val got = TextAnalysis.classify(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val s1 = 2 * wt("x") + wt("y")
    assert(got(1L) == (3L, s1, if (s1 > 0) 1L else 0L), got.toString)
    assert(got(2L) == (1L, wt("y"), if (wt("y") > 0) 1L else 0L), got.toString)
  }

  test("bigramLogProb: seen bigrams use conditional prob; unseen back off; OOV floors") {
    val s = spark
    import s.implicits._
    // force the split: find doc ids landing in train (h%100<80) and eval
    def h(id: Long): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"lm:$id".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16) % 100
    val trainId = (1L to 100L).find(h(_) < TextAnalysis.LmTrainPct).get
    val evalId = (1L to 100L).find(h(_) >= TextAnalysis.LmTrainPct).get
    // train: "a b a b" → bigrams ab, ba, ab; unigrams a:2 b:2, N=4
    // eval:  "a b c a z" → ab (seen), bc (unseen, c OOV), ca (unseen,
    //        a seen), az (unseen, z OOV)
    val d = Seq((trainId, "a b a b"), (evalId, "a b c a z")).toDF("doc_id", "text")
    val row = TextAnalysis.bigramLogProb(d).where(col("doc_id") === evalId).collect()(0)
    assert(row.getLong(1) == 4L)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = r6(math.log(2.0 / 2.0)) +             // ab: n_bi=2, n_a=2
      r6(math.log(0.4 * 0.5 / 4)) +                    // bc: c OOV floor
      r6(math.log(0.4 * 2.0 / 4)) +                    // ca: a seen in train
      r6(math.log(0.4 * 0.5 / 4))                      // az: z OOV floor
    assert(math.abs(row.getDouble(2) - expect) < 1e-9, s"${row.getDouble(2)} vs $expect")
  }

  test("entropy: uniform distribution maxes out, constant doc scores zero") {
    val s = spark
    import s.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d = Seq(
      (1L, "a a b b"),      // uniform over 2 → H = 2·round(−0.5·ln 0.5)
      (2L, "a a a a"),      // constant → H = 0, norm 0 (guarded div)
      (3L, "a a a b"))      // skewed → strictly between
      .toDF("doc_id", "text")
    val got = TextAnalysis.entropy(d)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    val h1 = 2 * r6(-0.5 * math.log(0.5))
    assert(got(0) == ((1L, 4L, 2L, h1, r6(h1 / math.log(2.0)))), s"got ${got(0)}")
    assert(got(1) == ((2L, 4L, 1L, 0.0, 0.0)), s"got ${got(1)}")
    val h3 = r6(-0.75 * math.log(0.75)) + r6(-0.25 * math.log(0.25))
    assert(got(2) == ((3L, 4L, 2L, h3, r6(h3 / math.log(2.0)))), s"got ${got(2)}")
    assert(h3 > 0 && h3 < h1)
  }

  test("winnow: short-doc domain edge, guarantee on a shared 7-word run, all-equal tie-break") {
    val s = spark
    import s.implicits._
    // distinct filler words so no accidental k-gram collisions
    def words(prefix: String, n: Int) = (0 until n).map(i => s"$prefix$i").mkString(" ")
    val shared = "alpha beta gamma delta epsilon zeta eta" // w+k-1 = 7 words
    val d = Seq(
      (1L, words("a", 6)),                                // 6 words < 7: no full window
      (2L, words("b", 7)),                                // exactly one full window
      (3L, s"${words("c", 9)} $shared ${words("d", 5)}"), // guarantee pair...
      (4L, s"${words("e", 4)} $shared"),                  // ...shares the 7-word run
      (5L, "rep rep rep rep rep rep rep rep rep rep")     // all k-grams equal
    ).toDF("doc_id", "text")
    val r = TextAnalysis.winnow(d)
      .as[(Long, Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    // doc 1: 3 valid k-grams, no full window of 4 → zero fingerprints
    assert(r(1L) == ((1L, 3L, 0L, 0L, 0L)), s"short doc: ${r(1L)}")
    // doc 2: 4 k-grams = exactly one window → exactly one fingerprint
    assert(r(2L)._2 == 4L && r(2L)._3 == 1L, s"one-window doc: ${r(2L)}")
    // docs 3 & 4 share a run of w+k-1 = 7 words → the winnowing
    // GUARANTEE: both must have at least one shared fingerprint hash
    assert(r(3L)._4 >= 1L && r(4L)._4 >= 1L, s"guarantee violated: ${r(3L)} ${r(4L)}")
    // doc 5: all 7 k-gram hashes equal → rightmost tie-break selects
    // every position from the first full window: n_fp = windows = 4
    assert(r(5L)._2 == 7L && r(5L)._3 == 4L, s"tie-break: ${r(5L)}")
    // corpus: density ≈ 2/(w+1), and a selection persists ≤ w windows →
    // n_fp bounds hold for every doc
    val c = TextAnalysis.winnow(docs)
      .select("n_kgrams", "n_fp").as[(Long, Long)].collect()
    c.foreach { case (nk, nf) =>
      val windows = math.max(nk - (TextAnalysis.WinW - 1), 0L)
      assert(nf <= windows || windows == 0, s"more fps than windows: $nk $nf")
      assert(nf >= (windows + TextAnalysis.WinW - 1) / TextAnalysis.WinW,
        s"fewer fps than ceil(windows/w): $nk $nf")
    }
  }

  test("weightedSample: Efraimidis-Spirakis selection matches a local recompute exactly") {
    val s = spark
    import s.implicits._
    val got = TextAnalysis.weightedSample(docs).as[(Long, Long)].collect().toSeq
    assert(got.map(_._1) == (1L to TextAnalysis.WSampleK.toLong), "ranks must be 1..k")
    // identical formula computed driver-side: ln((h+1)/2^32)/w, top-k
    val local = docs.select("doc_id", "n_chars").as[(Long, Long)].collect()
      .filter(_._2 > 0)
      .map { case (id, w) =>
        val h = graft.functions.Md5Hash.prefix32("ws:" + id)
        (id, math.log((h + 1).toDouble / 4294967296.0) / w.toDouble)
      }
      .sortBy { case (id, p) => (-p, id) }
      .take(TextAnalysis.WSampleK)
      .zipWithIndex.map { case ((id, _), i) => (i + 1L, id) }.toSeq
    assert(got == local, s"selection diverged: ${got.take(3)} vs ${local.take(3)}")
  }

  test("trainServe: keep rates cover the corpus, ppm identity holds, filter actually binds") {
    val s = spark
    import s.implicits._
    val r = TextAnalysis.trainServe(docs)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r.map(_._2).sum == docs.count(), "per-lang docs must cover the corpus")
    r.foreach { case (lang, n, keep, ppm) =>
      assert(keep >= 0 && keep <= n, s"$lang: $keep of $n")
      assert(ppm == keep * 1000000L / n, s"$lang: ppm identity")
    }
    // the trained filter must BIND: neither keep-everything nor drop-everything
    val total = r.map(_._2).sum.toDouble
    val kept = r.map(_._3).sum.toDouble
    assert(kept > 0 && kept < total, s"degenerate filter: $kept of $total")
  }

  test("knBigram: hand-computed continuation probabilities; corpus pkn in (0,1]") {
    val s = spark
    import s.implicits._
    // bi: ab:2 ba:1 bc:1 ca:1 → types=4
    // ctx: a(c1=2,n1f=1) b(2,2) c(1,1); pred: a←{b,c}=2, b←{a}=1, c←{b}=1
    val d = Seq((1L, "a b a b c"), (2L, "c a")).toDF("doc_id", "text")
    val r = TextAnalysis.knBigram(d)
      .as[(String, String, Long, Double)].collect()
      .map(x => (x._1, x._2) -> (x._3, x._4)).toMap
    assert(r(("a", "b")) == ((2L, 0.71875)), r.toString)  // 1.25/2 + (.75·1/2)(1/4)
    assert(r(("b", "a")) == ((1L, 0.5)), r.toString)      // .25/2 + (.75·2/2)(2/4)
    assert(r(("b", "c")) == ((1L, 0.3125)), r.toString)   // .25/2 + (.75·2/2)(1/4)
    assert(r(("c", "a")) == ((1L, 0.625)), r.toString)    // .25/1 + (.75·1/1)(2/4)
    // corpus: probabilities are probabilities
    val c = TextAnalysis.knBigram(docs).select("pkn").as[Double].collect()
    assert(c.nonEmpty && c.forall(p => p > 0.0 && p <= 1.0))
  }

  test("extractText: prose survives, nav dies on min-words, footer dies on link density") {
    val s = spark
    import s.implicits._
    // hand-built pages, NOT the generator — the extractor must stand on
    // its own against adversarial block layouts
    val prose = (1 to 12).map(i => s"word$i").mkString(" ") // 12 words, no links
    val pages = Seq(
      // nav chrome (3 link words < 5), one prose <p>, link-stuffed
      // footer: its text "Copyright acme contact admin team" is 5 words
      // (PASSES min-words) but 3·link_chars > chars → density kills it
      s"""<html><head><title>Doc 7</title></head><body><nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">acme</a></nav><p>$prose</p><footer>Copyright <a href="/t">acme</a> <a href="/c">contact</a> <a href="/a">admin</a> team</footer></body></html>""",
      // entity-escaped prose: extraction must UNESCAPE before hashing;
      // a 4-word <p> fails min-words; a link-bearing prose block whose
      // text dwarfs its one link passes density
      s"""<html><head><title>Doc 9</title></head><body><p>x &lt;tag&gt; y &amp; z plus more words here now</p><p>too few words here</p><div>$prose with one <a href="/x">tiny</a> link inside</div></body></html>""")
    val r = TextAnalysis.extractText(pages.toDF("value"))
      .collect().map(x => x.getLong(0) -> x).toMap
    // Doc 7: blocks nav+p+footer=3; only the prose kept
    assert(r(7L).getLong(1) == 3L && r(7L).getLong(2) == 1L, r(7L).toString)
    assert(r(7L).getLong(3) == 12L, r(7L).toString)
    val h7 = graft.functions.Md5Hash.prefix32(s"ex:$prose")
    assert(r(7L).getLong(4) == h7, r(7L).toString)
    // Doc 9: 3 blocks; the escaped <p> (9 words) and the link-light div
    // (15 words) survive, the 4-word <p> dies
    assert(r(9L).getLong(1) == 3L && r(9L).getLong(2) == 2L, r(9L).toString)
    val kept9 = s"x <tag> y & z plus more words here now $prose with one tiny link inside"
    assert(r(9L).getLong(4) == graft.functions.Md5Hash.prefix32(s"ex:$kept9"), r(9L).toString)
    // and over the staged fixture corpus: every doc surfaces, chrome is
    // never kept (n_kept = prose-chunk arithmetic from the source words)
    val dir = graft.sources.Sources.htmlCorpusDir(spark, sf)
    val got = TextAnalysis.extractText(spark.read.text(dir))
    val n = Tables.documents(spark, sf).count()
    assert(got.count() == n)
    val bw = graft.sources.Sources.HtmlBlockWords
    val expected = Tables.documents(spark, sf)
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.filter(
            split(col("text"), " "), w => w =!= "")).cast("long").as("nw"))
      .select(col("doc_id"),
        ((col("nw") / bw).cast("long") +
          when(pmod(col("nw"), lit(bw)) >= TextAnalysis.ExtractMinWords, 1L)
            .otherwise(0L)).as("want"))
    val joined = got.join(expected, "doc_id")
      .where(col("n_kept") =!= col("want")).count()
    assert(joined == 0L, "kept-block count diverged from the chunk arithmetic")
  }

  test("extractedCorpus: page metadata (lang, source) recovers byte-exactly from the HTML") {
    val dir = graft.sources.Sources.htmlCorpusDir(spark, sf)
    val ex = TextAnalysis.extractedCorpus(spark.read.text(dir))
      .select(col("doc_id"), col("lang").as("x_lang"), col("source").as("x_source"))
    val mismatches = Tables.documents(spark, sf).join(ex, "doc_id")
      .where(col("lang") =!= col("x_lang") || col("source") =!= col("x_source"))
      .count()
    assert(mismatches == 0L, "lang/source did not round-trip through the page")
    assert(ex.count() == Tables.documents(spark, sf).count())
  }
}
