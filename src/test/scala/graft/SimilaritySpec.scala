package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def em = Tables.embeddings(spark, sf)

  /** Independent replay of the IMI coarse buckets (r15): the same
    * Signs-constant signed sums [[graft.functions.LshImpl.buckets]]
    * folds (float widened to double, left-to-right — exact for the
    * corpus's float-derived values). */
  private def bucketsOf(a: Array[Double], bits: Int): Seq[Long] =
    (0 until graft.functions.LshImpl.NumTables).map { t =>
      (0 until bits).foldLeft(0L) { (acc, j) =>
        val sgn = graft.functions.LshImpl.Signs(t)(j)
        var sum = 0.0; var i = 0
        while (i < math.min(a.length, graft.functions.LshImpl.Dim)) {
          sum += a(i) * sgn(i); i += 1
        }
        if (sum > 0) acc | (1L << j) else acc
      }
    }

  /** Independent replay of the r15 IMI-pruned top-n cells: score only
    * coarse-bucket-sharing centroids, full-scan fallback when a vector
    * shares no bucket with any centroid. */
  private def prunedCellsReplay(vecs: Map[Long, Array[Double]], cents: Seq[Long],
                                cos: (Array[Double], Array[Double]) => Double)
      : (Long, Int) => Seq[Long] = {
    val bits = Similarity.ImiBits(Similarity.TrainedK)
    val centB: Map[Long, Seq[Long]] =
      cents.map(c => c -> bucketsOf(vecs(c), bits)).toMap
    (v: Long, n: Int) => {
      val vb = bucketsOf(vecs(v), bits)
      val cands = cents.filter(c =>
        (0 until graft.functions.LshImpl.NumTables).exists(t => centB(c)(t) == vb(t)))
      val pool = if (cands.isEmpty) cents else cands
      pool.map(c => (c, cos(vecs(v), vecs(c))))
        .sortBy { case (c, s) => (-s, c) }.take(n).map(_._1)
    }
  }

  test("bruteforce: TopK neighbors per query, no self-matches, ranks 1..k") {
    val bf = Similarity.bruteForce(em)
    val perQuery = bf.groupBy("query_id").count().select("count").distinct().collect()
    assert(perQuery.map(_.getLong(0)).toSet == Set(Similarity.TopK.toLong))
    assert(bf.where(col("query_id") === col("neighbor_id")).count() == 0)
    val ranks = bf.select("rank").distinct().collect().map(_.getLong(0)).toSet
    assert(ranks == (1 to Similarity.TopK).map(_.toLong).toSet)
  }

  test("knnGraph: full-corpus coverage, no self edges, lists match an independent in-cell brute force") {
    val g = Similarity.knnGraph(em).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(g.forall { case (v, _, n) => v != n })
    // ranks contiguous from 1 per vector, at most KnnK
    val byVec = g.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byVec.values.forall(rs => rs == (1L to rs.length)))
    assert(byVec.values.forall(_.length <= Similarity.KnnK))
    // EVERY vector appears except the singleton-cell ones — and the
    // graph covers far more than the query stride (the point of the key)
    assert(byVec.size > em.count() / 2, s"${byVec.size} of ${em.count()}")
    // independent replay: recompute one busy vector's neighbor list from
    // scratch (stride cents -> IMI-pruned closure cells (r15) -> exact
    // cosines over every vector sharing a probed cell)
    val vecs = em.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val cents = vecs.keys.filter(_ % Similarity.CentroidStride == 0).toSeq.sorted
    val cellsOf = prunedCellsReplay(vecs, cents, cos)
    val probe = byVec.keys.min
    val probeCells = cellsOf(probe, Similarity.BuildProbes).toSet
    val members = vecs.keys.filter(v => v != probe &&
      cellsOf(v, Similarity.BuildProbes).exists(probeCells))
    val expect = members.toSeq
      .map(n => (n, cos(vecs(probe), vecs(n))))
      .sortBy { case (n, s) => (-s, n) }
      .take(Similarity.KnnK).map(_._1)
    val got = g.filter(_._1 == probe).sortBy(_._2).map(_._3).toSeq
    assert(got == expect, s"probe $probe: got $got expected $expect")
  }

  test("knnEdges: per-cell candidate cap confines neighbors to the hub sample; the floor doesn't bind at gate scale") {
    def lists(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.select("vec_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // the production floor is ABOVE every gate cell's occupancy, so the
    // default build must equal the genuinely uncapped one byte-for-byte
    assert(lists(Similarity.knnEdges(em)) ==
      lists(Similarity.knnEdges(em, Similarity.KnnK, Int.MaxValue)))
    // a BINDING cap (4) keeps only hub-sample members as neighbors:
    // recompute the hub sample independently (h32("knncap", id) rank
    // within each 2-probe cell, ties by id)
    val vecs = em.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val cents = vecs.keys.filter(_ % Similarity.CentroidStride == 0).toSeq.sorted
    val pruned = prunedCellsReplay(vecs, cents, cos)
    def cellsOf(v: Long): Seq[Long] = pruned(v, Similarity.BuildProbes)
    val assign = vecs.keys.toSeq.flatMap(v => cellsOf(v).map(c => (v, c)))
    val cap = 4
    val hubs: Map[Long, Set[Long]] = assign.groupBy(_._2).view.mapValues {
      ms => ms.map(_._1).sortBy(v => (h32(s"knncap:$v"), v)).take(cap).toSet
    }.toMap
    val capped = lists(Similarity.knnEdges(em, Similarity.KnnK, cap))
    for ((v, ns) <- capped; n <- ns) {
      val shared = cellsOf(v).exists(c => hubs(c).contains(n) && cellsOf(n).contains(c))
      assert(shared, s"vec $v neighbor $n is not a hub of any shared probed cell")
    }
    // coverage survives the cap: the query side is uncapped, so every
    // vector whose probed cells hold ANY hub other than itself keeps a list
    val covered = vecs.keys.count(v =>
      cellsOf(v).exists(c => (hubs(c) - v).nonEmpty))
    assert(capped.size == covered, s"${capped.size} lists vs $covered coverable")
  }

  test("text_decontam_embed: a paraphrased benchmark plant the n-gram filter provably misses is flagged in embedding space") {
    val s0 = spark; import s0.implicits._
    // doc 0 sits in the % BenchMod == 0 benchmark slice; doc 1 is a
    // PARAPHRASE sharing ZERO 4-grams with it (every content word
    // replaced); doc 2 is unrelated
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "a swift russet fox leaps above one sleepy hound"),
      (2L, "completely unrelated text about spark plans entirely")
    ).toDF("doc_id", "text")
    val ngram = graft.operators.TextAnalysis.contaminatedIds(docs, docs)
      .collect().map(_.getLong(0)).toSet
    assert(!ngram.contains(1L), "the plant must be invisible to the n-gram filter")
    // in embedding space the paraphrase is nearly parallel to its
    // benchmark source — but sits ACROSS A CELL BOUNDARY from it
    // (vec 1's nearest centroid is c1; the bench vec 0's is c0), the
    // exact miss 1-probe assignment provably makes (r14 "What's wrong
    // #3"): they are only compared because the BENCH side probes its
    // 2 nearest cells (DedupProbes) and its second probe IS c1
    val corpus = Seq(
      (0L, Array(1.0, 0.0, 0.0)),    // bench (0 % BenchMod == 0): top-1 c0, probes {c0, c1}
      (1L, Array(0.75, 0.66, 0.0)),  // paraphrase: top-1 c1 (≠ bench's), cos to bench 0.75
      (2L, Array(0.0, 0.0, 1.0))     // unrelated: top-1 c2, never probed by bench
    ).toDF("vec_id", "v")
    val cents = Seq(
      (0L, Array(1.0, 0.0, 0.0)),
      (1L, Array(0.8, 0.6, 0.0)),
      (2L, Array(0.0, 0.0, 1.0))
    ).toDF("cent_id", "cv")
    val out = Similarity.embedDecontamOver(corpus, cents)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // the boundary is REAL: bench and paraphrase disagree on top-1 cell
    assert(out(1L)._1 == 1L, "paraphrase assigns to c1")
    assert(out(1L) == (1L, 1L, 1L),
      "boundary plant: caught via the bench side's second probe (1-probe misses it)")
    assert(out(2L) == (2L, 0L, 0L), "unrelated: no bench exposure")
  }

  test("alphaPrune: near-duplicate candidates demote, direction-diverse far candidates survive, degree stays k") {
    val s0 = spark; import s0.implicits._
    // directions in 3-space around query 0:
    //   1 ≈ parallel to the query            (cos ≈ .995)
    //   2 ≈ parallel to 1                    (occluded by 1)
    //   3 ≈ orthogonal, slightly query-ward  (cos ≈ .119, survivor)
    //   4 ≈ parallel to 3, ranked below it   (occluded by 3)
    val vecs: Map[Long, Array[Double]] = Map(
      0L -> Array(1.0, 0.0, 0.0),
      1L -> Array(10.0, 1.0, 0.0),
      2L -> Array(10.0, 1.2, 0.0),
      3L -> Array(1.2, 10.0, 0.0),
      4L -> Array(1.0, 10.0, 0.0))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    // independent replay of the relaxed rule: candidate c occluded iff
    // SOME higher-cos candidate r has cos(r,c) >= 1 - (1-cos(q,c))/alpha
    val cands = Seq(1L, 2L, 3L, 4L).map(i => (i, cos(vecs(0L), vecs(i))))
      .sortBy(-_._2)
    val occluded = cands.map { case (c, qc) =>
      c -> cands.takeWhile(_._1 != c).exists { case (r, _) =>
        cos(vecs(r), vecs(c)) >= 1.0 - (1.0 - qc) / 1.2 }
    }.toMap
    assert(occluded == Map(1L -> false, 2L -> true, 4L -> true, 3L -> false))
    val scored = cands.map { case (c, qc) => (0L, c, qc) }
      .toDF("vec_id", "neighbor_id", "cos")
    val qv = vecs.toSeq.map { case (i, v) => (i, v) }.toDF("vec_id", "v")
    val got = Similarity.alphaPrune(scored, qv, 2, Some(1.2))
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    // k = 2 keeps the two SURVIVORS — the nearest neighbor (rank 1 is
    // never occluded) and the direction-diverse far candidate — not the
    // two highest cosines (2 outranks 3 by cosine but is occluded)
    assert(got.toSeq == Seq((1L, 1L), (2L, 3L)))
  }

  test("nnDescent: refinement is monotone (rank-1 cosine never drops) and actually improves lists") {
    val vecs = em.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    def lists(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val g0 = lists(Similarity.knnGraph(em))
    val g1 = lists(Similarity.nnDescent(em))
    // candidates ⊇ current edges ⇒ per-vector best cosine can only rise
    for ((v, l1) <- g1; l0 <- g0.get(v)) {
      val b0 = cos(vecs(v), vecs(l0.head))
      val b1 = cos(vecs(v), vecs(l1.head))
      assert(b1 >= b0 - 1e-12, s"vec $v: refined best $b1 < graph best $b0")
    }
    // every graph vector keeps a list (cand ⊇ G(x) — no one loses edges)
    assert(g0.keySet.subsetOf(g1.keySet))
    // and the round genuinely DOES something: 2-hop/reverse candidates
    // found closer neighbors for a measurable slice of the corpus
    val changed = g0.count { case (v, l0) => g1(v) != l0 }
    assert(changed > 0, "NN-descent round changed no neighbor list")
    info(s"refinement changed $changed of ${g0.size} neighbor lists")
  }

  test("graphSearch: matches an independent beam replay; recall vs brute force measured") {
    val vecs = em.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    // the graph the search walks is the nn-descent chain at the
    // DERIVED production degree (Dials.graphDegree — same chain the
    // ann_nn_descent gate pins at KnnK), symmetrized — replay the
    // whole traversal in Scala from it at the derived beam/rounds
    val g = Similarity.nnDescentEdges(em, Similarity.GraphDegree)
      .select("vec_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val adj = (g ++ g.map(_.swap)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val queries = vecs.keys.filter(_ % Similarity.QueryStride == 0).toSeq.sorted
    // IVF-seeded entry: the query's EntryProbes nearest stride
    // centroids (r14 multi-seed), same tie order as the build's
    // cell assignment
    val centIds = vecs.keys.filter(_ % Similarity.CentroidStride == 0).toSeq.sorted
    def entryOf(q: Long): Seq[Long] =
      centIds.map(c => (c, cos(vecs(q), vecs(c))))
        .sortBy { case (c, s) => (-s, c) }.take(Similarity.EntryProbes).map(_._1)
    def replay(q: Long): Seq[Long] = {
      var beam = entryOf(q)
      for (_ <- 1 to Similarity.BeamRounds) {
        val cand = (beam ++ beam.flatMap(v => adj.getOrElse(v, Set.empty))).distinct
        beam = cand.map(c => (c, cos(vecs(q), vecs(c))))
          .sortBy { case (c, s) => (-s, c) }.take(Similarity.Beam).map(_._1)
      }
      beam.filter(_ != q).map(c => (c, cos(vecs(q), vecs(c))))
        .sortBy { case (c, s) => (-s, c) }.take(Similarity.TopK).map(_._1)
    }
    val got = Similarity.graphSearch(em).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(got.keySet == queries.toSet)
    for (q <- queries)
      assert(got(q) == replay(q), s"query $q: got ${got(q)} want ${replay(q)}")
    // no self-matches; ranks contiguous
    assert(got.forall { case (q, ns) => !ns.contains(q) })
    // recall vs exact — a DIAL of (Beam, BeamRounds, graph degree);
    // since r13 the defaults are the Dials-derived production point
    // ((48, 6, 16) at every gate corpus, §5c-r12's measured
    // 0.955-at-sf0.1 / 1.00-at-500-vectors band), so the floor is the
    // production contract, not the old 0.2 demo-dial floor
    val exact = Similarity.bruteForce(em).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = queries.map(q => (got(q).toSet & exact(q)).size).sum.toDouble
    val recall = hits / (queries.size * Similarity.TopK)
    info(f"graph-search recall@${Similarity.TopK} vs brute force: $recall%.3f")
    assert(recall >= 0.9, f"derived production dial misses its recall band ($recall%.3f)")
  }

  test("graphSearch: query-banded traversal is result-identical to the single pass (r16)") {
    // queries are independent — slicing the query set by pmod and
    // walking each slice sequentially must reproduce the single-pass
    // answer row for row, at the default (floor) beam AND at a wider
    // beam on the calibrated path's ladder (the two shapes the ×1000
    // tiers run)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val one = rows(Similarity.graphSearch(em, queryBands = 1))
    val two = rows(Similarity.graphSearch(em, queryBands = 2))
    assert(two == one, "2-band traversal diverged from the single pass")
    val three = rows(Similarity.graphSearch(em, queryBands = 3))
    assert(three == one, "3-band traversal diverged from the single pass")
    val wide = Similarity.Beam * 2 // a non-floor rung, the calibrated-path shape
    val oneW = rows(Similarity.graphSearch(em, beam = wide, queryBands = 1))
    val twoW = rows(Similarity.graphSearch(em, beam = wide, queryBands = 2))
    assert(twoW == oneW, "banded traversal diverged at the wide-beam rung")
  }

  test("graphSearchPq: deterministic, band-identical, shape-correct; recall vs exact measured (r16)") {
    val cents = Similarity.trainPqCodebook(em)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = rows(Similarity.graphSearchPqWith(em, cents))
    // deterministic: the SDC scores are fixed-order sums of 6dp-rounded
    // lookups, ties by cand_id — a re-run must reproduce byte for byte
    assert(rows(Similarity.graphSearchPqWith(em, cents)) == got)
    // query banding is result-identical on the PQ path too
    assert(rows(Similarity.graphSearchPqWith(em, cents, queryBands = 2)) == got)
    val byQ = got.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val queries = em.collect().map(_.getLong(0))
      .filter(_ % Similarity.QueryStride == 0).toSet
    assert(byQ.keySet == queries)
    assert(got.forall { case (q, _, n) => q != n }, "self-match leaked")
    assert(byQ.values.forall(_.size == Similarity.TopK))
    // recall on the fixture corpus is DATA-LIMITED (near-orthogonal
    // random vectors: the 4×16 quantization error swamps the ~1e-3
    // cosine gaps SDC must rank — the same regime note as LSH/IVF in
    // the Similarity scaladoc); measure it, but ASSERT on the clustered
    // corpus below, the regime PQ retrieval is proven in
    val exact = Similarity.bruteForce(em).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = queries.toSeq.map(q => (byQ(q).toSet & exact(q)).size).sum.toDouble
    val recall = hits / (queries.size * Similarity.TopK)
    info(f"pq-traversal recall@${Similarity.TopK} on the random fixture: $recall%.3f")
    // clustered corpus: quantized round ranking must retrieve — and the
    // exact-refined tail means the answer list order is true cosine
    val corpus = clusteredCorpus
    val cCents = Similarity.trainPqCodebook(corpus)
    val truth = topkSets(Similarity.bruteForce(corpus))
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val g = topkSets(df)
      truth.keys.toSeq.map(q => (g.getOrElse(q, Set.empty[Long]) & truth(q)).size)
        .sum.toDouble / (truth.size * Similarity.TopK)
    }
    val recallC = recallOf(Similarity.graphSearchPqWith(corpus, cCents))
    // the exact-rerank form on the SAME corpus at the same dials — the
    // VERDICT-asked side-by-side: quantized rounds + exact refine must
    // stay within reach of the all-exact traversal
    val recallE = recallOf(Similarity.graphSearch(corpus))
    info(f"traversal recall@${Similarity.TopK} on the clustered corpus: " +
      f"pq-scored $recallC%.3f vs exact $recallE%.3f")
    assert(recallC >= 0.8, f"SDC-ranked beam must retrieve on clustered data ($recallC%.3f)")
    assert(recallC >= recallE - 0.2,
      f"quantized rounds collapsed vs the exact form ($recallC%.3f vs $recallE%.3f)")
  }

  test("graphClusters: matches an independent 2-round LPA replay over the knn graph") {
    val g = Similarity.knnGraph(em).collect().map(r => (r.getLong(0), r.getLong(2)))
    val edges = (g ++ g.map(_.swap)).distinct
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    var labels = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to Similarity.GraphLpaRounds) {
      val next = labels.map { case (node, lab) =>
        val counts = adj(node).map(labels).groupBy(identity).view.mapValues(_.size).toMap
        if (counts.isEmpty) node -> lab
        else {
          val mc = counts.values.max
          node -> counts.filter(_._2 == mc).keys.max
        }
      }
      labels = next
    }
    val want = labels.groupBy(_._2).map { case (lab, m) =>
      (lab, m.size.toLong, m.keys.min, m.keys.max) }.toSeq
      .sortBy { case (lab, n, _, _) => (-n, lab) }.take(20)
    val got = Similarity.graphClusters(em).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"got ${got.take(5)}...\nwant ${want.take(5)}...")
    assert(got.size > 1, "degenerate single community")
  }

  test("cosine of a vector with itself is 1") {
    val s = spark
    import s.implicits._
    val d = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val c = d.select(Similarity.cosine(
      transform(col("a"), x => x.cast("double")),
      transform(col("b"), x => x.cast("double"))).as("c")).collect()(0).getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("lsh buckets: every vec in every table, buckets within 2^LshBits") {
    val b = Similarity.lshBuckets(em)
    assert(b.count() == em.count() * Similarity.LshTables)
    assert(b.select("tbl").distinct().count() == Similarity.LshTables)
    val bad = b.where(col("bucket") < 0 || col("bucket") >= (1L << Similarity.LshBits)).count()
    assert(bad == 0)
  }

  test("dedup_embed: ordered distinct pairs, all above the cosine threshold") {
    val dups = Similarity.embedDup(em)
    assert(dups.where(col("vec_a") >= col("vec_b")).count() == 0)
    assert(dups.groupBy("vec_a", "vec_b").count().where(col("count") > 1).count() == 0)
    // re-verify the threshold by recomputing cosine for returned pairs
    val va = em.select(col("vec_id").as("vec_a"),
      transform(col("embedding"), x => x.cast("double")).as("av"))
    val vb = em.select(col("vec_id").as("vec_b"),
      transform(col("embedding"), x => x.cast("double")).as("bv"))
    val below = dups.join(va, "vec_a").join(vb, "vec_b")
      .where(Similarity.cosine(col("av"), col("bv")) < Similarity.DupCosine)
    assert(below.count() == 0)
  }

  test("ivf topk: unique ranks within TopK, no self-matches") {
    val ivf = Similarity.ivfTopK(em)
    assert(ivf.where(col("query_id") === col("neighbor_id")).count() == 0)
    assert(ivf.where(col("rank") > Similarity.TopK).count() == 0)
    assert(ivf.groupBy("query_id", "rank").count().where(col("count") > 1).count() == 0)
  }

  test("lsh topk is a subset of brute-force candidate space (same bucket ⇒ ranked subset)") {
    val topk = Similarity.lshTopK(em)
    // each (query, rank) unique and rank <= TopK
    assert(topk.where(col("rank") > Similarity.TopK).count() == 0)
    assert(topk.groupBy("query_id", "rank").count().where(col("count") > 1).count() == 0)
  }

  /** Deterministic CLUSTERED corpus: 8 well-separated centroids (uniform
    * md5-derived components), 50 points each = tight noise around its
    * centroid. Unlike the driver's random near-orthogonal test vectors
    * (where true neighbors barely beat chance and bucketed recall is
    * data-limited — see the Similarity scaladoc), this is the regime real
    * embeddings live in, and where an index must PROVABLY retrieve. */
  private def clusteredCorpus: org.apache.spark.sql.DataFrame = clusteredCorpus(0.1)

  /** 8 md5-derived cluster centers, 50 members each, member = center +
    * noise·u. noise 0.1 ⇒ near-duplicate-tight clusters; larger noise
    * loosens within-cluster cosine (≈ 1/(1+noise²)) for recall-curve
    * measurements. */
  private def clusteredCorpus(noise: Double) = {
    val s = spark
    import s.implicits._
    val dim = graft.functions.LshImpl.Dim
    def u(key: String): Double = // uniform in [-1, 1), md5-derived
      graft.functions.Md5Hash.prefix32(key).toDouble / (1L << 31) - 1.0
    val rows = (0L until 400L).map { id =>
      val k = id % 8
      val emb = Array.tabulate(dim) { i =>
        (u(s"cent:$k:$i") + noise * u(s"noise:$id:$i")).toFloat
      }
      (id, emb.toSeq, s"c$k")
    }
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
  }

  private def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  test("ANN recall on clustered vectors: LSH and IVF both retrieve (recall ≥ 0.8 vs brute force)") {
    val corpus = clusteredCorpus
    val truth = topkSets(Similarity.bruteForce(corpus))
    assert(truth.nonEmpty)
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = truth.map { case (q, t) =>
        approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }
      per.sum / per.size
    }
    val lshR = recall(topkSets(Similarity.lshTopK(corpus)))
    val ivfR = recall(topkSets(Similarity.ivfTopK(corpus)))
    assert(lshR >= 0.8, f"LSH recall $lshR%.3f < 0.8 on clustered corpus")
    assert(ivfR >= 0.8, f"IVF recall $ivfR%.3f < 0.8 on clustered corpus")
    // SQ8 quantization noise barely perturbs 64-dim cosine ordering —
    // near-exact retrieval is the selling point of scalar quantization
    val sqR = recall(topkSets(Similarity.sqTopK(corpus)))
    assert(sqR >= 0.9, f"SQ8 recall $sqR%.3f < 0.9 on clustered corpus")
  }

  test("ann_mips_ivf: augmented-space cells retrieve MIPS (recall ≥ 0.8 vs exact scan)") {
    val corpus = clusteredCorpus
    // exact MIPS = the norm-augmented brute scan (order-equivalent to
    // raw dot product — the gated ann_mips equivalence)
    val truth = topkSets(Similarity.mipsTopK(corpus))
    assert(truth.nonEmpty)
    val aug = Similarity.augmented(corpus)
    val cents = Similarity.trainCodebook(
      aug.select(col("vec_id"), col("av").as("embedding")))
      .select(col("cent_id"), col("cv"))
    val approx = topkSets(Similarity.mipsIvfWith(corpus, aug, cents))
    val per = truth.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
    val r = per.sum / per.size
    assert(r >= 0.8, f"index-backed MIPS recall $r%.3f < 0.8 on clustered corpus")
  }

  test("ann_filtered_ivf: filter ∧ cell — only allowed neighbors, recall ≥ 0.8 vs filtered scan") {
    val s = spark
    import s.implicits._
    val corpus = clusteredCorpus
    // allow ~half the corpus by a deterministic predicate
    val docs = corpus.select(col("vec_id").as("doc_id"),
      when(col("vec_id") % 2 === 0, "en").otherwise("de").as("lang"))
    val truth = topkSets(Similarity.filteredTopK(corpus, docs))
    assert(truth.nonEmpty)
    val cents = Similarity.trainCodebook(corpus)
      .select(col("cent_id"), col("cv"))
    val allowed = docs.where(col("lang") === Similarity.FilterLang).select("doc_id")
    val res = Similarity.filteredIvfWith(corpus, allowed, cents)
    // the predicate is structural: NO disallowed id can ever appear
    val ids = res.select("neighbor_id").as[Long].collect()
    assert(ids.nonEmpty && ids.forall(_ % 2 == 0), "disallowed neighbor leaked through")
    val approx = topkSets(res)
    val per = truth.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
    val r = per.sum / per.size
    // measured 0.775 at NProbe=2: the filter halves every probed cell's
    // membership while probe depth stays fixed, so filter ∧ cell gives
    // up a little more recall than unfiltered IVF (0.8+ here) — the
    // production dial is raising NProbe with predicate selectivity
    assert(r >= 0.7, f"filtered-IVF recall $r%.3f < 0.7 on clustered corpus")
    info(f"filter ∧ cell recall vs exact filtered scan: $r%.3f (NProbe=${Similarity.NProbe})")
  }

  test("ann_sq_ivf: cell-restricted SQ retrieval keeps near-exact recall on clustered vectors") {
    val corpus = clusteredCorpus
    val truth = topkSets(Similarity.bruteForce(corpus))
    assert(truth.nonEmpty)
    val cents = Similarity.trainCodebook(corpus).select(col("cent_id"), col("cv"))
    val approx = topkSets(Similarity.sqIvfWith(corpus, cents))
    val per = truth.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
    val r = per.sum / per.size
    // IVF cell restriction (recall ≥ 0.8 family) stacked on SQ
    // quantization (recall ≥ 0.9 family): measured 0.75 — the loss is
    // the candidate source, not the quantizer (ivfCandidates runs the
    // IMI coarse prune, whose approximate ASSIGNMENT is part of the
    // gated semantics and costs a little recall vs the plain n·K
    // assignment ivfTopK's 0.8+ uses)
    assert(r >= 0.7, f"IVF+SQ recall $r%.3f < 0.7 on clustered corpus")
    // the composition claim itself: ranking the SAME cell-restricted
    // candidates by EXACT cosine measures the cell restriction alone
    // (0.775); SQ's quantization noise costs ≤ 0.05 on top (measured
    // 0.025 — one boundary neighbor per ~2 queries flips, consistent
    // with the exhaustive ann_sq spec's near-exact 0.9+ band)
    val d2 = (c: org.apache.spark.sql.Column) => transform(c, x => x.cast("double"))
    val wx = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("xcos").desc, col("neighbor_id"))
    val exactRes = Similarity.ivfCandidates(corpus, cents)
      .join(corpus.select(col("vec_id").as("query_id"), d2(col("embedding")).as("qv")), "query_id")
      .join(corpus.select(col("vec_id").as("neighbor_id"), d2(col("embedding")).as("nv")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("qv"), col("nv")).as("xcos"))
      .withColumn("rank", row_number().over(wx))
      .where(col("rank") <= Similarity.TopK)
    val approxExact = topkSets(exactRes)
    val perE = truth.map { case (q, t) =>
      approxExact.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
    val rExact = perE.sum / perE.size
    assert(r >= rExact - 0.05,
      f"SQ lost recall beyond the cell restriction: sq $r%.3f vs exact $rExact%.3f")
    info(f"IVF(IMI)+SQ recall $r%.3f; same-candidates exact ranking $rExact%.3f")
  }

  test("sqTopK: codes bounded to [0, 255]; degenerate constant dimension survives") {
    val s = spark
    import s.implicits._
    // dim 2 constant (hi == lo) must not divide by zero; extremes land
    // exactly on code 0 / 255
    val rows = Seq(
      (0L, Array(0.0f, 5.0f, -1.0f), 0),
      (50L, Array(1.0f, 5.0f, 0.0f), 0),
      (100L, Array(0.5f, 5.0f, 1.0f), 0),
      (150L, Array(0.25f, 5.0f, 0.5f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.sqTopK(rows)
    // 4 queries (stride 50 → all), each ranks the other 3
    assert(r.count() == 4 * 3)
    assert(r.select("rank").distinct().count() == 3)
  }

  test("PQ: codes compress to M small ints; SDC top-k retrieves on clustered vectors") {
    val corpus = clusteredCorpus
    val truth = topkSets(Similarity.bruteForce(corpus))
    val cents = Similarity.trainPqCodebook(corpus)
    // a codebook per subspace, each at most PqKs entries
    val perM = cents.groupBy("m").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perM.keySet == (0 until Similarity.PqM).map(_.toLong).toSet)
    assert(perM.values.forall(_ <= Similarity.PqKs))
    val pq = Similarity.pqWith(corpus, cents)
    // SDC scores are quantized to code-pair granularity: every member of
    // a tight cluster shares its codes, so exact top-5 identity is
    // tie-broken, not cosine-ranked — the property a 16^4-cell quantizer
    // DOES guarantee is cluster identity. Measure cluster precision:
    // retrieved neighbors belong to the query's true cluster (chance = 1/8).
    val labels = corpus.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pqSets = topkSets(pq)
    val prec = pqSets.map { case (q, ns) =>
      ns.count(n => labels(n) == labels(q)).toDouble / ns.size }.sum / pqSets.size
    info(f"PQ (SDC) cluster precision on clustered corpus: $prec%.3f")
    assert(prec >= 0.9, f"PQ cluster precision $prec%.3f < 0.9 (chance 0.125)")
    assert(truth.nonEmpty && pqSets.keySet == truth.keySet)
    // scores are bounded like similarities: each of the 4 lookups is a
    // cosine in [-1, 1], so the SDC sum lives in [-PqM, PqM]
    val s = pq.agg(min("score"), max("score")).collect()(0)
    assert(s.getDouble(0) >= -Similarity.PqM && s.getDouble(1) <= Similarity.PqM)
  }

  test("IVFPQ recall curve, both regimes: cell restriction loses little vs exhaustive SDC; floors hold") {
    // the gated ann_pq path (pqCells) vs the spec-only exhaustive SDC
    // scan (pqWith) it replaced: same codes, same LUT — only the
    // candidate source differs. Measured in both noise regimes so the
    // SDC-granularity trade is a number, not a claim.
    def measure(noise: Double): (Double, Double, Double, Double) = {
      val corpus = clusteredCorpus(noise)
      val truth = topkSets(Similarity.bruteForce(corpus))
      val labels = corpus.select("vec_id", "label").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      def recall(approx: Map[Long, Set[Long]]): Double = {
        val per = truth.map { case (q, t) =>
          approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
        per.sum / per.size
      }
      def precision(approx: Map[Long, Set[Long]]): Double = {
        val per = approx.map { case (q, ns) =>
          ns.count(n => labels(n) == labels(q)).toDouble / ns.size }
        per.sum / per.size
      }
      val pqCents = Similarity.trainPqCodebook(corpus)
      val ivfCents = Similarity.trainCodebook(corpus)
      val cells = topkSets(Similarity.pqCells(corpus, ivfCents, pqCents))
      val exhaustive = topkSets(Similarity.pqWith(corpus, pqCents))
      (recall(cells), recall(exhaustive), precision(cells), precision(exhaustive))
    }
    val (cellsTight, exTight, pCellsTight, pExTight) = measure(0.1)
    info(f"tight: IVFPQ recall=$cellsTight%.3f exhaustive=$exTight%.3f " +
      f"precision=$pCellsTight%.3f/$pExTight%.3f")
    val (cellsLoose, exLoose, pCellsLoose, pExLoose) = measure(0.4)
    info(f"loose: IVFPQ recall=$cellsLoose%.3f exhaustive=$exLoose%.3f " +
      f"precision=$pCellsLoose%.3f/$pExLoose%.3f")
    // cluster precision floor holds in BOTH regimes for the gated path
    assert(pCellsTight >= 0.9, f"tight IVFPQ cluster precision $pCellsTight%.3f < 0.9")
    assert(pCellsLoose >= 0.5, f"loose IVFPQ cluster precision $pCellsLoose%.3f < 0.5 (chance 0.125)")
    // the cell restriction must not collapse recall vs the exhaustive scan
    assert(cellsTight >= exTight - 0.1,
      f"tight: cell restriction lost recall: $cellsTight%.3f vs exhaustive $exTight%.3f")
    assert(cellsLoose >= exLoose - 0.1,
      f"loose: cell restriction lost recall: $cellsLoose%.3f vs exhaustive $exLoose%.3f")
  }

  test("PQ rerank: exact refine over the SDC shortlist matches or beats the pure-SDC ranking") {
    // ann_pq_rerank = the same cell-restricted SDC chain, cut at ShortR,
    // re-ranked by TRUE cosine. Quantization error can reorder an SDC
    // top-k; it cannot reorder the refined one — so against brute-force
    // truth the refined list must hold (small tolerance: the ShortR cut
    // itself can drop a true neighbor SDC mis-scored below rank 15).
    def measure(noise: Double): (Double, Double) = {
      val corpus = clusteredCorpus(noise)
      val truth = topkSets(Similarity.bruteForce(corpus))
      def recall(approx: Map[Long, Set[Long]]): Double = {
        val per = truth.map { case (q, t) =>
          approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
        per.sum / per.size
      }
      val pqCents = Similarity.trainPqCodebook(corpus)
      val ivfCents = Similarity.trainCodebook(corpus)
      (recall(topkSets(Similarity.pqRerankWith(corpus, ivfCents, pqCents))),
        recall(topkSets(Similarity.pqCells(corpus, ivfCents, pqCents))))
    }
    // SDC granularity (4 subspaces × 16 centroids) is the binding error
    // in both regimes — the refine is exactly what buys it back. Measured
    // +0.20 tight / +0.25 loose; require half that, not just parity.
    // (Absolute recall stays candidate-limited — the ShortR cut and cell
    // restriction bound it, which is the PQ trade the curve test owns.)
    val (rrTight, sdcTight) = measure(0.1)
    info(f"tight: rerank recall=$rrTight%.3f sdc=$sdcTight%.3f")
    assert(rrTight >= sdcTight + 0.1,
      f"tight: exact refine did not recover recall over pure SDC: $rrTight%.3f vs $sdcTight%.3f")
    val (rrLoose, sdcLoose) = measure(0.4)
    info(f"loose: rerank recall=$rrLoose%.3f sdc=$sdcLoose%.3f")
    assert(rrLoose >= sdcLoose + 0.1,
      f"loose: exact refine did not recover recall over pure SDC: $rrLoose%.3f vs $sdcLoose%.3f")
  }

  test("trained codebook: k-means centroids retrieve at least as well as the corpus slice at equal K") {
    // the ann_ivf_trained model contract: at the SAME centroid budget,
    // Lloyd-adapted centroids must not lose recall vs the vec_id-stride
    // stand-in (they should win — 8 natural clusters, adapted centers).
    // Loose clusters (noise 0.4): the regime where centroid quality
    // actually shows (the tight corpus saturates both at 1.0)
    val corpus = clusteredCorpus(0.4)
    val truth = topkSets(Similarity.bruteForce(corpus))
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = truth.map { case (q, t) =>
        approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      per.sum / per.size
    }
    val strideK = corpus.where(col("vec_id") % Similarity.CentroidStride === 0).count().toInt
    val trained = Similarity.trainCodebook(corpus, k = strideK)
    assert(trained.count() <= strideK) // empty cells may drop, never grow
    val strideR = recall(topkSets(Similarity.ivfTopK(corpus)))
    val trainedR = recall(topkSets(Similarity.ivfWith(corpus, trained)))
    info(f"IVF recall at K=$strideK: stride=$strideR%.3f trained=$trainedR%.3f")
    assert(trainedR >= strideR,
      f"trained codebook lost recall: $trainedR%.3f < $strideR%.3f at K=$strideK")
    assert(trainedR >= 0.8, f"trained IVF recall $trainedR%.3f < 0.8")
  }

  test("lsh buckets: a null element zeroes every bucket (oracle NULL-propagation)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val dim = graft.functions.LshImpl.Dim
    val withNull: Array[Any] = Array.tabulate[Any](dim)(i => 1.0f)
    withNull(3) = null
    val out = graft.functions.LshImpl.buckets(new GenericArrayData(withNull))
    assert((0 until graft.functions.LshImpl.NumTables).forall(t => out.getLong(t) == 0L))
    // sanity: the same vector without the null does NOT bucket to all-zeros
    val clean = new GenericArrayData(Array.tabulate[Any](dim)(i => 1.0f))
    val outClean = graft.functions.LshImpl.buckets(clean)
    assert((0 until graft.functions.LshImpl.NumTables).exists(t => outClean.getLong(t) != 0L))
  }

  test("lsh bits dial recall curve: recall falls monotonically as buckets narrow, floor holds") {
    // the recall half of the corpus-density dial's tradeoff, measured on
    // the clustered fixture (the regime real corpora live in): fewer
    // bits = wider buckets = more candidates = higher recall. The 100×
    // capacity half is measured in SURVEY §5c; together they are the
    // dial's contract.
    def curve(noise: Double): Map[Int, Double] = {
      val corpus = clusteredCorpus(noise)
      val truth = topkSets(Similarity.bruteForce(corpus))
      def recall(approx: Map[Long, Set[Long]]): Double = {
        val per = truth.map { case (q, t) =>
          approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
        per.sum / per.size
      }
      Seq(8, 12, 16).map(b => b -> recall(topkSets(Similarity.lshTopK(corpus, b)))).toMap
    }
    // tight clusters (the near-dup regime): the dial is essentially free
    val tight = curve(0.1)
    info(f"tight   recall@bits: 8=${tight(8)}%.3f 12=${tight(12)}%.3f 16=${tight(16)}%.3f")
    assert(tight(8) >= 0.8 && tight(16) >= 0.8,
      s"near-dup recall must survive every dial setting: $tight")
    // loose clusters (moderate similarity): the tradeoff becomes visible
    val loose = curve(0.4)
    info(f"loose   recall@bits: 8=${loose(8)}%.3f 12=${loose(12)}%.3f 16=${loose(16)}%.3f")
    assert(loose(8) >= loose(12) && loose(12) >= loose(16),
      s"recall must fall as buckets narrow: $loose")
    assert(loose(8) > loose(16),
      s"loose-cluster curve should be strictly decreasing end to end: $loose")
  }

  test("lsh bits dial: higher-bit buckets REFINE the 8-bit partition (low bits identical)") {
    // the corpus-density dial's safety property: planes are a fixed
    // prefix sequence, so bucket_12 & 0xFF == bucket_8 for every vector
    // and table — an index built at a higher setting coarsens exactly to
    // a lower one, and the default (gated) 8-bit behavior is unchanged
    graft.plans.GraftFunctions.register(spark)
    val rows = Tables.embeddings(spark, sf).limit(50)
      .selectExpr("graft_lsh_buckets(embedding) AS b8",
        "graft_lsh_buckets(embedding, 12) AS b12")
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows; t <- 0 until graft.functions.LshImpl.NumTables) {
      val b8 = r.getSeq[Long](0)(t)
      val b12 = r.getSeq[Long](1)(t)
      assert((b12 & 0xFFL) == b8, s"table $t: $b12 does not refine $b8")
      assert(b12 < (1L << 12))
    }
    // and with the env dial unset, the operator surface runs at 8 bits
    assert(graft.operators.Similarity.LshBits == graft.functions.LshImpl.Bits)
  }

  test("graft_lsh_buckets builder rejects non-literal bits, NULL bits, and wrong arity as analysis errors") {
    // the builder evals the bits argument at plan build — unguarded that
    // was a raw ClassCastException/NPE/MatchError instead of a clean
    // AnalysisException
    graft.plans.GraftFunctions.register(spark)
    val df = Tables.embeddings(spark, sf).limit(1)
    def fails(sel: String): Unit = {
      val e = intercept[Exception](df.selectExpr(s"$sel AS b").collect())
      assert(e.isInstanceOf[org.apache.spark.sql.AnalysisException],
        s"$sel: expected AnalysisException, got ${e.getClass}: ${e.getMessage}")
      assert(e.getMessage.contains("graft_lsh_buckets"), e.getMessage)
    }
    fails("graft_lsh_buckets(embedding, vec_id)") // non-foldable bits
    fails("graft_lsh_buckets(embedding, NULL)") // null literal
    fails("graft_lsh_buckets(embedding, 8, 9)") // arity
  }

  test("cosine fails loudly on zero-norm vectors (NaN would rank first in every top-k)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val z = new GenericArrayData(Array.tabulate[Any](4)(_ => 0.0))
    val v = new GenericArrayData(Array[Any](1.0, 2.0, 3.0, 4.0))
    val e = intercept[IllegalArgumentException](graft.functions.CosineImpl.cosine(z, v))
    assert(e.getMessage.contains("zero-norm"))
  }

  test("hybridSearch: RRF favors both-list docs; ranks are dense and lists truncate") {
    val docs = Tables.documents(spark, sf)
    val em = Tables.embeddings(spark, sf)
    val r = operators.Similarity.hybridSearch(docs, em)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1),
        Option(x.get(2)).map(_.asInstanceOf[Long]),
        Option(x.get(3)).map(_.asInstanceOf[Long])))
    assert(r.length == operators.Similarity.HybK)
    assert(r.map(_._1).toSeq == (1L to operators.Similarity.HybK).toSeq, "dense fused ranks")
    // every emitted doc was retrieved by at least one modality, within depth
    assert(r.forall(t => t._3.isDefined || t._4.isDefined))
    assert(r.flatMap(_._3).forall(_ <= operators.Similarity.ListK))
    assert(r.flatMap(_._4).forall(_ <= operators.Similarity.ListK))
    // RRF property: a doc near the top of BOTH lists must outrank a doc
    // retrieved by only one list at middling depth — check the extremes:
    // the fused #1 has a better (smaller) best-rank-sum than the fused last
    def rrf(t: (Long, Long, Option[Long], Option[Long])): Double =
      t._3.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        t._4.map(x => 1.0 / (60 + x)).getOrElse(0.0)
    assert(rrf(r.head) >= rrf(r.last), "fused order must follow RRF score")
  }

  test("mips: a longer vector beats a better-aligned one — the ranking cosine cannot produce") {
    val s = spark
    import s.implicits._
    // query q=(1,0): corpus a=(1,0) is PERFECTLY aligned (cos=1) but
    // b=(3,3) has the larger dot product (3 > 1) — MIPS must rank b
    // first, cosine ranks a first; c is a distractor dominated on both
    val d = Seq(
      (0L, Array(1.0f, 0.0f), 0),  // vec_id % QueryStride == 0 → query
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(3.0f, 3.0f), 0),
      (3L, Array(0.1f, -0.5f), 0)
    ).toDF("vec_id", "embedding", "label")
    val mips = Similarity.mipsTopK(d)
      .select("rank", "neighbor_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(mips.take(2).toSeq == Seq((1L, 2L), (2L, 1L)),
      s"MIPS must rank by dot product (b,a,...): ${mips.toSeq}")
    val cosTop = Similarity.bruteForce(d)
      .select("rank", "neighbor_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(cosTop.head == ((1L, 1L)), s"cosine control must rank a first: ${cosTop.toSeq}")
  }

  test("mips reduction: augmented-cosine ranking equals direct dot-product ranking on the corpus") {
    val s = spark
    import s.implicits._
    val reduced = Similarity.mipsTopK(em)
      .as[(Long, Long, Long)].collect().toSeq
    // independent direct formulation: rank by the raw dot product
    val vecs = em.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect()
    val qs = vecs.filter(_._1 % Similarity.QueryStride == 0)
    val direct = qs.flatMap { case (qid, qv) =>
      vecs.filter(_._1 != qid)
        .map { case (nid, nv) => (nid, qv.zip(nv).map { case (a, b) => a * b }.sum) }
        .sortBy { case (nid, dot) => (-dot, nid) }
        .take(Similarity.TopK).zipWithIndex
        .map { case ((nid, _), r) => (qid, (r + 1).toLong, nid) }
    }.toSeq.sortBy(t => (t._1, t._2))
    assert(reduced == direct, "norm-augmentation reduction changed the MIPS ranking")
  }

  test("filteredTopK: every neighbor passes the predicate, every query still fills k") {
    val s = spark
    import s.implicits._
    val em = Tables.embeddings(spark, sf)
    val docs = Tables.documents(spark, sf)
    val r = Similarity.filteredTopK(em, docs).cache()
    // pre-filter semantics: ONLY allowed neighbors appear
    val enIds = docs.where(col("lang") === Similarity.FilterLang)
      .select(col("doc_id")).as[Long].collect().toSet
    val neigh = r.select("neighbor_id").as[Long].collect()
    assert(neigh.nonEmpty && neigh.forall(enIds), "non-en neighbor leaked through")
    // and k still fills (the post-filter failure mode): every query has TopK rows
    val perQ = r.groupBy("query_id").count().select("count").as[Long].collect()
    assert(perQ.forall(_ == Similarity.TopK.toLong), perQ.mkString(","))
    // filtering changed SOMETHING vs the unfiltered ranking (non-en docs
    // exist in some brute top-k)
    val brute = Similarity.bruteForce(em)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    val filt = r.select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(filt != brute, "predicate never bound — fixture too permissive")
    r.unpersist()
  }

  test("ann_ivf_upsert: stored index ∪ batch assignment ≡ full rebuild, and only the batch is assigned") {
    val s = spark
    import s.implicits._
    val corpus = clusteredCorpus.cache()
    val cents = Similarity.trainCodebook(corpus, k = 16, iters = 2).cache()
    def vecs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    // the maintained state: base corpus assigned ONCE (what ivfUpsert persists)
    val stored = Similarity.cellAssign(
      vecs(corpus.where(col("vec_id") % Similarity.UpsertMod =!= 0)), cents)
    val fresh = vecs(corpus.where(col("vec_id") % Similarity.UpsertMod === 0))
    val upsert = Similarity.ivfUpsertWith(corpus, cents, stored, fresh)
      .as[(Long, Long, Long)].collect().toSeq
    // upsert ≡ rebuild: assignment under a fixed codebook is per-vector
    // deterministic, so the merged index must reproduce the full
    // ivfWith answer EXACTLY — rank ties included
    val rebuild = Similarity.ivfWith(corpus, cents)
      .as[(Long, Long, Long)].collect().toSeq
    assert(upsert == rebuild, "upsert path diverged from full rebuild")
    // cost ∝ batch: the fresh side really is the 1/20 slice, and the
    // stored side covers exactly the rest (no re-assignment happened)
    val nFresh = fresh.count()
    assert(nFresh > 0 && nFresh < corpus.count() / 10,
      s"batch split degenerate: $nFresh fresh of ${corpus.count()}")
    assert(stored.count() + nFresh == corpus.count(),
      "stored ∪ fresh does not partition the corpus")
    corpus.unpersist(); cents.unpersist()
  }

  test("dedup_semantic: a near-duplicate pair split by a cell boundary is caught by the closure probe (r15)") {
    val s0 = spark; import s0.implicits._
    // va's top-1 cell is c0, its near-duplicate vb's is c1 — under
    // 1-probe confinement they NEVER meet (the r14 boundary blindness);
    // both probe {c0, c1}, so the closure pair join catches vb
    val corpus = Seq(
      (0L, Array(1.0, 0.0, 0.0)),
      (1L, Array(0.75, 0.66, 0.0)),  // cos to vec 0 = 0.75 ≥ DupCosine
      (2L, Array(0.0, 0.0, 1.0))
    ).toDF("vec_id", "v")
    val cents = Seq(
      (0L, Array(1.0, 0.0, 0.0)),
      (1L, Array(0.8, 0.6, 0.0)),
      (2L, Array(0.0, 0.0, 1.0))
    ).toDF("cent_id", "cv")
    val out = Similarity.semanticDedupOver(corpus, cents)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0L) == (0L, 0L), "keeper: lower id is never the flagged side")
    assert(out(1L)._1 == 1L, "the duplicate assigns to a DIFFERENT cell than its keeper")
    assert(out(1L) == (1L, 1L), "boundary duplicate: flagged via the shared probe cell")
    assert(out(2L) == (2L, 0L), "unrelated vector stays clean")
  }

  test("nnDescentEdges: band-sequential 2-hop join is result-identical to the single pass (r15)") {
    def lists(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      df.select("vec_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // plain keep step
    val one = lists(Similarity.nnDescentEdges(em, Similarity.KnnK, None, 1))
    val banded = lists(Similarity.nnDescentEdges(em, Similarity.KnnK, None, 3))
    assert(banded == one, "3-band build diverged from the single-pass build")
    // and under the α keep step (the accumulator must carry the α
    // path's wider top-2k candidate list for equality to hold)
    val oneA = lists(Similarity.nnDescentEdges(em, Similarity.KnnK, Some(1.2), 1))
    val bandedA = lists(Similarity.nnDescentEdges(em, Similarity.KnnK, Some(1.2), 3))
    assert(bandedA == oneA, "3-band α build diverged from the single-pass α build")
  }

  test("beam calibration separates the geometries: manifold floor-stops at recall ≥ 0.95, adversarial climbs (r16)") {
    // VERDICT r15 #6: the navigable-vs-adversarial divergence lived
    // only on the §5d ladder — make the geometry distinction ITSELF the
    // asserted thing, side by side at spec scale. Same constructions as
    // the ladder fixtures: a low-intrinsic-dimension manifold (greedy
    // routing works -> the log-n floor suffices, the HNSW regime) vs
    // isometric sign-flip islands over a random base (no navigable
    // structure -> the floor's sampled recall misses the bar and the
    // calibration must climb the ladder).
    val s = spark
    import s.implicits._
    val dim = graft.functions.LshImpl.Dim
    def u(key: String): Double =
      graft.functions.Md5Hash.prefix32(key).toDouble / (1L << 31) - 1.0
    val n = 2000
    val idim = graft.ScaleUp.ManifoldDim
    val proj = Array.tabulate(dim, idim)((j, t) => u(s"mproj:$j:$t"))
    val mani = (0L until n).map { id =>
      val uu = Array.tabulate(idim)(t => u(s"mu:$id:$t"))
      (id, Array.tabulate(dim)(j =>
        (0 until idim).map(t => uu(t) * proj(j)(t)).sum.toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val base = Array.tabulate(200, dim)((i, j) => u(s"base:$i:$j"))
    val adv = (0L until n).map { id =>
      val copy = (id / 200).toInt
      val i = (id % 200).toInt
      (id, Array.tabulate(dim) { j =>
        val sgn = if (graft.functions.Md5Hash.prefix32(s"flip:$copy:$j") % 2 == 0) 1.0 else -1.0
        (base(i)(j) * sgn).toFloat
      }.toSeq)
    }.toDF("vec_id", "embedding")
    val (degree, rounds, floor, cap) = (8, 4, 24, 256)
    val bMani = Similarity.calibrateBeam(mani, degree, rounds, floor, cap)
    val bAdv = Similarity.calibrateBeam(adv, degree, rounds, floor, cap)
    info(s"calibrated beams: manifold $bMani, adversarial $bAdv (floor $floor, cap $cap)")
    assert(bMani == floor, s"navigable geometry must stop at the floor, got $bMani")
    assert(bAdv > floor, s"adversarial geometry must climb past the floor, got $bAdv")
  }

  test("calibrateBeam: deterministic, ladder-valued, and floor-stopping when the floor already clears the bar (r15)") {
    val floor = 8
    val cap = 60
    val b1 = Similarity.calibrateBeam(em, degree = 8, rounds = 4, floor = floor, cap = cap)
    val b2 = Similarity.calibrateBeam(em, degree = 8, rounds = 4, floor = floor, cap = cap)
    assert(b1 == b2, "calibration must be deterministic")
    val ladder = Iterator.iterate(floor)(_ * 2).takeWhile(_ < cap).toSeq :+ cap
    assert(ladder.contains(b1), s"beam $b1 not on the ladder $ladder")
    // the gate corpus is navigable at this degree: a generous beam
    // clears the bar, so calibration must NOT run to the cap blindly
    val bWide = Similarity.calibrateBeam(em, degree = 16, rounds = 6, floor = 48, cap = 60)
    assert(bWide == 48, s"floor beam already clears 0.95 at the gate corpus, got $bWide")
  }
}
