package graft

import graft.operators.WordCount
import org.apache.spark.sql.functions._

class WordCountSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  test("wordCount matches a driver-side recount and reference sort order") {
    val wc = WordCount.wordCount(docs).collect()
    assert(wc.nonEmpty)
    // counts sum to total token count
    val total = WordCount.tokens(docs).count()
    assert(wc.map(_.getLong(1)).sum == total)
    // reference SORT_FINAL: count desc, word asc tie-break
    val pairs = wc.map(r => (r.getLong(1), r.getString(0)))
    assert(pairs.sameElements(pairs.sortBy { case (c, w) => (-c, w) }))
  }

  test("wc_route: byte-offset-sum routing exact; ASCII corpora provably starve reducer 2") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "abc"), (2L, "héllo")).toDF("doc_id", "text")
    val r = WordCount.routeCounts(d).as[(Long, Long, Long)].collect().toSeq
    // abc: rune offsets 0+1+2 = 3, +96 → 99 % 3 = 0;
    // héllo: é is 2 UTF-8 bytes so offsets are 0,1,3,4,5 = 13, +96 →
    // 109 % 3 = 1 — the Go range-over-string quirk, reproduced
    assert(r == Seq((0L, 1L, 1L), (1L, 1L, 1L)), r.toString)
    // the skew artifact this key gates: for ASCII words the sum is
    // l(l−1)/2, and l(l−1)/2 mod 3 never equals 2 (l≡0,1 mod 3 → the
    // product has a factor ≡ 0; l ≡ 2 → l(l−1)/2 ≡ 2·1/2 = 1) — so
    // ONE OF THE REFERENCE'S THREE REDUCERS receives nothing from any
    // all-ASCII corpus, a content-blind skew now machine-verified
    assert((1 to 500).forall(l => (l.toLong * (l - 1) / 2) % 3 != 2))
    val corpus = WordCount.routeCounts(Tables.documents(spark, sf))
    assert(corpus.where(col("reducer") === 2).count() == 0)
    // and the per-reducer totals conserve the corpus
    val (w, t) = corpus.agg(sum("n_words"), sum("n_tokens"))
      .as[(Long, Long)].head()
    assert(w == WordCount.wordCount(Tables.documents(spark, sf)).count())
    assert(t == WordCount.tokens(Tables.documents(spark, sf)).count())
  }

  test("wc_routecost: per-mapper combiner × estimateTokenSize, chunk-split words counted per chunk") {
    val s = spark
    import s.implicits._
    // one doc, chunk width 256 — "ab" and "cd" in one chunk; a doc with
    // a repeated word exercises the combiner (distinct within chunk)
    val d = Seq((1L, "ab cd ab")).toDF("doc_id", "text")
    val r = WordCount.routeCostMatrix(d).as[(Long, Long, Long)].collect().toSeq
    // ab: offsets 0+1=1, +96 → 97 % 3 = 1, cost 2+4=6, ONE combiner
    // entry despite two occurrences; cd: same length → reducer 1 too
    assert(r == Seq((1L, 12L, 2L)), r.toString)
    // a word straddling chunks counts once per chunk it appears in:
    // 300 a's chunk at 256 into "a"*256 and "a"*44 — same word, two
    // mappers, two combiner entries, two route-cost contributions
    val long = Seq((1L, "a" * 300)).toDF("doc_id", "text")
    val r2 = WordCount.routeCostMatrix(long).as[(Long, Long, Long)].collect().toSeq
    // "a"*256: sum 255·256/2 = 32640 + 96 → %3 = 0; "a"*44: 43·44/2 =
    // 946 +96 = 1042 % 3 = 1 — the two pieces even route differently
    assert(r2 == Seq((0L, 260L, 1L), (1L, 48L, 1L)), r2.toString)
  }

  test("wc_place: argmax edge contracts, remaining reducers go to reduce-only workers in order") {
    val s = spark
    import s.implicits._
    // under the default-config fixed-N model (r10 ADVICE fix), "aa bb"
    // (5 chars, cs = 5 div 5 = 1) splits into single-char chunks
    // "a","a"," ","b","b" on workers 0..4; chunk words "a"/"b" route to
    // reducer 0 (prefix-offset sum 0, +96 → 96 % 3 = 0), each edge cost
    // 1+4 = 5 — a four-way cost tie, broken by (worker, reducer) asc →
    // top edge (w0, r0); r1/r2 fall to only-reduce slots 0/1 in order
    val d = Seq((1L, "aa bb")).toDF("doc_id", "text")
    val r = WordCount.placement(d).as[(Long, Long, String)].collect().toSeq
    assert(r == Seq((0L, 0L, "locality"), (1L, 0L, "only_reduce"),
      (2L, 1L, "only_reduce")), r.toString)
    // corpus: always RouteReducers rows, exactly one locality binding
    // (maxContractions = 3 − 2 = 1), hosts within their ranges
    val c = WordCount.placement(Tables.documents(spark, sf))
      .as[(Long, Long, String)].collect().toSeq
    assert(c.map(_._1) == (0L until WordCount.RouteReducers.toLong))
    assert(c.count(_._3 == "locality") == 1)
    assert(c.filter(_._3 == "locality").forall(x => x._2 >= 0 && x._2 < WordCount.NumChunksFixed))
    assert(c.filter(_._3 == "only_reduce").map(_._2) == Seq(0L, 1L))
  }

  test("tokens: case-sensitive, non-letter splits, no empties") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "Hello, hello WORLD-x1y")).toDF("doc_id", "text")
    val t = WordCount.tokens(d).as[String].collect().toSeq
    assert(t == Seq("Hello", "hello", "WORLD", "x", "y"))
  }

  test("concatChunked: cross-doc token merge and global-offset split, exact reassembly") {
    val s = spark
    import s.implicits._
    // stream = "abc" + "defg" + "hi j" = "abcdefghi j" (11 chars); CS=4
    // chunks: "abcd" | "efgh" | "i j" — "abc"+"d" MERGED across docs,
    // "defg" SPLIT at a global offset, trailing chunk short
    val d = Seq((1L, "abc"), (2L, "defg"), (3L, "hi j")).toDF("doc_id", "text")
    val ch = graft.sources.Sources.concatChunked(d, 4)
      .orderBy("chunk_no").as[(Long, String)].collect().toSeq
    assert(ch == Seq((0L, "abcd"), (1L, "efgh"), (2L, "i j")))
    // tokens of the chunkized stream: reference boundary artifacts exact
    val words = WordCount.wordCount(
        graft.sources.Sources.concatChunked(d, 4).withColumnRenamed("chunk", "text"))
      .as[(String, Long)].collect().toMap
    assert(words == Map("abcd" -> 1L, "efgh" -> 1L, "i" -> 1L, "j" -> 1L))
    // an empty doc shifts nothing and emits nothing
    val d2 = Seq((1L, "abc"), (2L, ""), (3L, "defg")).toDF("doc_id", "text")
    val ch2 = graft.sources.Sources.concatChunked(d2, 4)
      .orderBy("chunk_no").as[(Long, String)].collect().toSeq
    assert(ch2 == Seq((0L, "abcd"), (1L, "efg")))
  }

  test("concatChunkedN: avg-size slices, remainder appended to the LAST chunk, cs=0 degenerate") {
    val s = spark
    import s.implicits._
    // stream = "aaaa bb"+"cc"+"ddd" = "aaaa bbccddd" (12 chars); K=5 ⇒
    // cs = 12 div 5 = 2, remainder 2 → last chunk [8,12) gets 4 chars
    val d = Seq((1L, "aaaa bb"), (2L, "cc"), (3L, "ddd")).toDF("doc_id", "text")
    val ch = graft.sources.Sources.concatChunkedN(d, 5)
      .orderBy("chunk_no").as[(Long, String)].collect().toSeq
    assert(ch == Seq((0L, "aa"), (1L, "aa"), (2L, " b"), (3L, "bc"), (4L, "cddd")), ch.toString)
    // tokens: the reference's cross-doc merge ("bc") and remainder-fed
    // last chunk ("cddd") are the gated artifacts
    val words = WordCount.chunkedNWordCount(d).as[(String, Long)].collect().toMap
    assert(words == Map("aa" -> 2L, "b" -> 1L, "bc" -> 1L, "cddd" -> 1L), words.toString)
    // corpus shorter than K chars ⇒ cs = 0: the reference slices every
    // chunk empty and the remainder rule hands the WHOLE stream to the
    // last chunk (core/utils.go:339-341)
    val tiny = Seq((1L, "xy")).toDF("doc_id", "text")
    val ch2 = graft.sources.Sources.concatChunkedN(tiny, 5)
      .orderBy("chunk_no").as[(Long, String)].collect().toSeq
    assert(ch2 == Seq((4L, "xy")), ch2.toString)
  }

  test("topK is the head of the full ranking") {
    val full = WordCount.wordCount(docs).collect()
    val top = WordCount.topK(docs, 5).collect()
    assert(top.toSeq == full.take(5).toSeq)
  }

  test("distinctPerLang covers every language present") {
    val langs = docs.select("lang").distinct().count()
    assert(WordCount.distinctPerLang(docs).count() == langs)
  }

  test("perDocCounts: n_distinct <= n_tokens, one row per non-empty doc") {
    val pd = WordCount.perDocCounts(docs)
    assert(pd.where(col("n_distinct") > col("n_tokens")).count() == 0)
    val nonEmpty = docs.where(length(trim(col("text"))) > 0).count()
    assert(pd.count() == nonEmpty)
  }

  test("wc_cms: one-sided error — estimates never undercount, bound holds") {
    val docs = Tables.documents(spark, sf)
    val r = WordCount.cmsHeavyHitters(docs).collect()
    assert(r.nonEmpty)
    val total = WordCount.tokens(docs).count()
    // CMS guarantee: est >= exact always; overcount <= N*e/w whp
    for (row <- r) {
      val over = row.getAs[Long]("overcount")
      assert(over >= 0, s"CMS undercounted ${row.getAs[String]("word")}")
      assert(over <= math.ceil(total * math.E / WordCount.CmsWidth).toLong * 4,
        s"overcount $over way past the eps*N bound")
    }
    // a colliding hand corpus: two words forced into shared cells still
    // never read below their exact counts
    val s2 = spark
    import s2.implicits._
    val tiny = Seq((1L, ("x " * 50) + ("y " * 30))).toDF("doc_id", "text")
    val est = WordCount.cmsHeavyHitters(tiny).collect()
      .map(r2 => r2.getAs[String]("word") -> r2.getAs[Long]("est_cnt")).toMap
    assert(est("x") >= 50 && est("y") >= 30)
  }

  test("cooccur: window-±2 pairs, unordered canonicalization, PMI sign sanity") {
    val s = spark
    import s.implicits._
    // "a b c" yields offset-1 pairs (a,b),(b,c) and offset-2 (a,c);
    // "c a" yields (a,c) again — canonicalized despite reversed order
    val d = Seq((1L, "a b c"), (2L, "c a")).toDF("doc_id", "text")
    val got = WordCount.cooccur(d).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == Map(("a", "b") -> 1L, ("b", "c") -> 1L, ("a", "c") -> 2L), got.toString)
    // PMI: (a,c) co-occurs twice out of 4 pairs with n_a=2, n_c=2 of 5
    // tokens: pmi = ln(2*25/(4*2*2)) = ln(3.125) > 0 — check via sign
    val pmiAC = WordCount.cooccur(d).where(col("w1") === "a" && col("w2") === "c")
      .collect()(0).getDouble(3)
    assert(math.abs(pmiAC - math.log(2.0 * 25 / (4 * 2 * 2))) < 1e-6, pmiAC.toString)
  }

  test("invertedIndex: df/cf/postings pinned on a hand corpus; head cap respected") {
    val s = spark
    import s.implicits._
    val d = Seq((3L, "b a a"), (1L, "a c"), (2L, "a")).toDF("doc_id", "text")
    val got = WordCount.invertedIndex(d)
      .as[(String, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      ("a", 3L, 4L, "1,2,3"),   // postings sorted by doc_id, not arrival
      ("b", 1L, 1L, "3"),
      ("c", 1L, 1L, "1")), s"got $got")
    // cap: 10 docs of "z" → df 10, head holds only the first 8
    val many = (1L to 10L).map(i => (i, "z")).toDF("doc_id", "text")
    val z = WordCount.invertedIndex(many).as[(String, Long, Long, String)].head()
    assert(z == ("z", 10L, 10L, (1 to 8).mkString(",")))
  }

  test("grep: match and occurrence counts per pattern, regex alternation works") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "scan the scan"), (2L, "join"), (3L, "stream streaming string"))
      .toDF("doc_id", "text")
    val got = WordCount.grep(d).as[(String, Long, Long)].collect().toSeq
    // "string" does not match str(eam|ing) at 'str'+'ing'? it does: s-t-r-i-n-g
    assert(got == Seq(
      ("jo.n", 1L, 1L),
      ("scan", 1L, 2L),
      ("str(eam|ing)", 1L, 3L)), s"got $got")
  }

  test("triangles: hand-computed K3 and K4; spectators and dangling edges excluded") {
    val s = spark
    import s.implicits._
    // doc 1: cycle a-b-c-a → one triangle; doc 2: dangling edge a-d
    val d = Seq((1L, "a b c a"), (2L, "a d")).toDF("doc_id", "text")
    val got = WordCount.triangles(d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 1L, "c" -> 1L), got.toString)
    // adjacency chain covering all 6 edges of K4 → C(4,3) = 4 triangles,
    // each word on 3 of them
    val k4 = Seq((1L, "a b c d a c b d a")).toDF("doc_id", "text")
    val got4 = WordCount.triangles(k4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got4 == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L), got4.toString)
    // duplicate adjacency must not double-count (edges are DISTINCT)
    val dup = Seq((1L, "a b c a"), (2L, "b a"), (3L, "c b")).toDF("doc_id", "text")
    val gotDup = WordCount.triangles(dup).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotDup == Map("a" -> 1L, "b" -> 1L, "c" -> 1L), gotDup.toString)
  }

  test("bfs: levels on a path graph, hop bound cuts the tail, disconnected words land at -1") {
    val s = spark
    import s.implicits._
    // "s" is the most frequent word (count 3) → seed; the path
    // s-a-b-c-d-e puts e at distance 5 > BfsMaxHop; x-y is disconnected
    val d = Seq(
      (1L, "s s s"), (2L, "s a"), (3L, "a b"), (4L, "b c"),
      (5L, "c d"), (6L, "d e"), (7L, "x y")
    ).toDF("doc_id", "text")
    val r = WordCount.bfs(d)
      .as[(Long, Long, String, String)].collect().map(t => t._1 -> t).toMap
    assert(r(-1L) == ((-1L, 3L, "e", "y")), s"unreached: ${r.get(-1L)}") // e, x, y
    assert(r(0L) == ((0L, 1L, "s", "s")))
    assert(r(1L) == ((1L, 1L, "a", "a")))
    assert(r(2L) == ((2L, 1L, "b", "b")))
    assert(r(3L) == ((3L, 1L, "c", "c")))
    assert(r(4L) == ((4L, 1L, "d", "d")))
    // corpus: levels partition the vocabulary — counts sum to vocab size
    val corpus = docs
    val vocab = corpus.select(explode(filter(split(col("text"), WordCount.TokenRe),
      w => w =!= "")).as("w")).distinct().count()
    val levels = WordCount.bfs(corpus).as[(Long, Long, String, String)].collect()
    assert(levels.map(_._2).sum == vocab, "BFS levels must partition the vocabulary")
    assert(levels.find(_._1 == 0L).get._2 == 1L, "exactly one seed")
  }

  test("graph base (r16 one-scan tokenPairs): empty/1-word docs, self-pairs, unicode, seed ties") {
    val s = spark
    import s.implicits._
    // the r16 single-scan derivation pads each doc's LAST token with a
    // NULL successor — these docs hit every boundary: empty text (no
    // rows), single word (one (w, null) row — vocabulary member, no
    // edge), an adjacent self-pair "c c" (vocab count 2, edge dropped),
    // and a multibyte token (regex \p{L} keeps it whole)
    val d = Seq((1L, "x"), (2L, "a b a"), (3L, ""), (4L, "c c"), (5L, "a ü a"))
      .toDF("doc_id", "text")
    // bfs: most frequent word is a (4) → seed; b and ü are its
    // neighbors; x and c have no edges → hop −1
    val r = WordCount.bfs(d)
      .as[(Long, Long, String, String)].collect().map(t => t._1 -> t).toMap
    assert(r(0L) == ((0L, 1L, "a", "a")), r.toString)
    assert(r(1L) == ((1L, 2L, "b", "ü")), r.toString)
    assert(r(-1L) == ((-1L, 2L, "c", "x")), r.toString)
    // cc: isolated vocabulary members (x, c — c's only pair is the
    // dropped self-pair) are their own components
    val cc = WordCount.components(d).as[(String, Long, String, String)]
      .collect().toSet
    assert(cc == Set(("a", 3L, "a", "ü"), ("c", 1L, "c", "c"), ("x", 1L, "x", "x")),
      cc.toString)
  }

  test("kcore: cascade peel — pendant then its support; the 4-clique survives at degree 3") {
    val s = spark
    import s.implicits._
    // clique {wa,wb,wc,wd} (all 6 edges) + we—{wa,wb,wf} + pendant wf:
    // round 1 peels wf (deg 1); round 2 peels we (deg 2 once wf is
    // gone) — the CASCADE a single degree filter cannot express;
    // the clique stabilizes at degree 3 (wa/wb lose the we edge)
    val d = Seq("wa wb", "wa wc", "wa wd", "wb wc", "wb wd", "wc wd",
        "we wa", "we wb", "we wf")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val r = WordCount.kcore(d).as[(String, Long)].collect().toSet
    assert(r == Set(("wa", 3L), ("wb", 3L), ("wc", 3L), ("wd", 3L)), r.toString)
    // corpus: all degrees >= KCoreK is NOT guaranteed (4-round peel, not
    // the converged core) — but the output is bounded, sorted, positive
    val c = WordCount.kcore(Tables.documents(spark, sf)).as[(String, Long)].collect()
    assert(c.length <= 50)
    assert(c.forall(_._2 >= 1))
    val degs = c.map(_._2).toSeq
    assert(degs == degs.sortBy(-_), "not sorted by degree desc")
  }

  test("sssp: matches an independent Bellman-Ford replay; relaxation beats the direct edge; hop bound cuts") {
    val s = spark
    import s.implicits._
    // "s" most frequent → seed; triangle s-a-t plus direct s-t (the
    // relaxation case), chain t-c-d-e-f (f at 5 hops > SsspRounds)
    val d = Seq(
      (1L, "s s s"), (2L, "s a"), (3L, "a t"), (4L, "s t"),
      (5L, "t c"), (6L, "c d"), (7L, "d e"), (8L, "e f")
    ).toDF("doc_id", "text")
    val got = WordCount.sssp(d).as[(String, Long)].collect().toMap
    // independent replay: same edges, same md5 weights, textbook BF
    def h32(seed: String, x: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$x".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val adj = Seq(("s","a"), ("a","t"), ("s","t"), ("t","c"), ("c","d"), ("d","e"), ("e","f"))
    def w(u: String, v: String): Long = {
      val (lo, hi) = if (u < v) (u, v) else (v, u)
      1L + h32("sssp", s"$lo $hi") % WordCount.SsspWgtMod
    }
    val edges = adj.flatMap { case (u, v) => Seq((u, v), (v, u)) }.distinct
    var dist = Map("s" -> 0L)
    for (_ <- 1 to WordCount.SsspRounds)
      dist = (dist.toSeq ++ edges.flatMap { case (u, v) =>
        dist.get(u).map(du => v -> (du + w(u, v))) })
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
    assert(got == dist, s"$got != $dist")
    // the relaxation contract, explicitly: t costs the cheaper of the
    // direct edge and the 2-hop detour (whichever md5 makes cheaper)
    assert(got("t") == math.min(w("s", "t"), w("s", "a") + w("a", "t")))
    // hop bound: f is 5 edges out — absent from the distance frame
    assert(!got.contains("f"))
    // corpus smoke: integer dists, seed at 0, total order respected
    val corpus = WordCount.sssp(docs).as[(String, Long)].collect()
    assert(corpus.length <= 50 && corpus.head._2 == 0L)
    assert(corpus.sliding(2).forall { case Array(x, y) =>
      x._2 < y._2 || (x._2 == y._2 && x._1 < y._1); case _ => true })
  }

  test("mst: matches an independent two-round Borůvka replay; the bridge edge always selected") {
    val s = spark
    import s.implicits._
    // two triangles joined by a single bridge c-x: round 1 works inside
    // the triangles (plus the bridge if it is some vertex's min); any
    // correct 2-round Borůvka must select the bridge by round 2 at the
    // latest (each contracted triangle's only outgoing edge)
    val d = Seq((1L, "a b a c b c"), (2L, "x y x z y z"), (3L, "c x"))
      .toDF("doc_id", "text")
    val got = WordCount.mst(d).as[(Long, String, String, Long)].collect()
      .map { case (r, a, b, w) => (r, a, b, w) }.toSet
    def h32(seed: String, x: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$x".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    def w(u: String, v: String): Long = {
      val (lo, hi) = if (u < v) (u, v) else (v, u)
      1L + h32("sssp", s"$lo $hi") % WordCount.SsspWgtMod
    }
    val und = Seq(("a","b"), ("a","c"), ("b","c"), ("x","y"), ("x","z"), ("y","z"), ("c","x"))
    val es = und.map { case (u, v) =>
      val (lo, hi) = if (u < v) (u, v) else (v, u); (lo, hi, w(lo, hi)) }
    def argmin(cands: Seq[(String, String, Long)]) =
      cands.minBy { case (a, b, wt) => (wt, a, b) }
    val verts = es.flatMap(e => Seq(e._1, e._2)).distinct
    val f1 = verts.map(v => argmin(es.filter(e => e._1 == v || e._2 == v))).toSet
    // contract: components of f1 (tiny graph — fixpoint label spread)
    var comp = verts.map(v => v -> v).toMap
    for (_ <- 1 to verts.size; (a, b, _) <- f1) {
      val m = if (comp(a) < comp(b)) comp(a) else comp(b)
      comp += a -> m; comp += b -> m
    }
    val cross = es.filter(e => comp(e._1) != comp(e._2))
    val f2 = (cross.map(e => (comp(e._1), e)) ++ cross.map(e => (comp(e._2), e)))
      .groupBy(_._1).values.map(cands => argmin(cands.map(_._2))).toSet
    val want = f1.map { case (a, b, wt) => (1L, a, b, wt) } ++
      f2.map { case (a, b, wt) => (2L, a, b, wt) }
    assert(got == want, s"got $got\nwant $want")
    // the bridge is in the forest, whichever round picked it
    assert(got.exists { case (_, a, b, _) => (a, b) == (("c", "x")) })
  }

  test("cc: string-vertex components via the shared star contraction, isolated included") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "a b"), (2L, "a c"), (3L, "d e"), (4L, "z z"))
      .toDF("doc_id", "text")
    val r = WordCount.components(d).as[(String, Long, String, String)].collect().toSeq
    assert(r == Seq(("a", 3L, "a", "c"), ("d", 2L, "d", "e"), ("z", 1L, "z", "z")), r.toString)
    // corpus: component sizes partition the vocabulary (top-50 covers it here)
    val vocab = WordCount.tokens(docs).distinct().count()
    val sizes = WordCount.components(docs).as[(String, Long, String, String)].collect()
    assert(sizes.map(_._2).sum <= vocab)
    assert(sizes.map(_._2).toSeq == sizes.map(_._2).toSeq.sorted.reverse)
  }

  test("lpa: hand-traced 3 rounds on a star + pair, ties to max label, isolated keep labels") {
    val s = spark
    import s.implicits._
    // graph: a-b, a-c (star at a), d-e (pair), z isolated (self-pair drops)
    val d = Seq((1L, "a b"), (2L, "a c"), (3L, "d e"), (4L, "z z"))
      .toDF("doc_id", "text")
    // r1: a←max(b,c)="c", b←"a", c←"a", d←"e", e←"d"
    // r2: a←"a" (b,c both carry "a"), b←"c", c←"c", d←"d", e←"e"
    // r3: a←"c", b←"a", c←"a", d←"e", e←"d"; z never moves
    val r = WordCount.lpa(d).as[(String, Long, String, String)].collect().toSeq
    assert(r == Seq(
      ("a", 2L, "b", "c"),
      ("c", 1L, "a", "a"), ("d", 1L, "e", "e"), ("e", 1L, "d", "d"),
      ("z", 1L, "z", "z")), r.toString)
    // corpus: labels partition the vocabulary (top-50 cut ≤ vocab)
    val sizes = WordCount.lpa(docs).as[(String, Long, String, String)].collect()
    assert(sizes.nonEmpty && sizes.map(_._2).sum > 0)
    assert(sizes.map(_._2).toSeq == sizes.map(_._2).toSeq.sorted.reverse,
      "communities ordered by size desc")
  }
}
