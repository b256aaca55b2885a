package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame

/** Plan-shape regression guards: the scale claims in SURVEY §5, asserted
  * against the actual physical plans so they cannot silently rot.
  * Executed plans are built at sf0.001 — shapes, not timings. */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def exchanges(p: String): Int =
    "(?m)^\\s*[+:*-]*\\s*Exchange ".r.findAllIn(p).length

  /** Exchanges that move data BY KEY — what the map-only claims are
    * about. The r16 scan-parallelism floor (Tables.cpuFloored) adds a
    * keyless RoundRobinPartitioning exchange when the input plans fewer
    * partitions than the session (one row group at spec scale); it
    * redistributes the same bytes for parallelism, never groups them,
    * so the map-only contract ("no keyed data movement before the
    * boundary sort") deliberately does not count it. */
  private def keyedExchanges(p: String): Int =
    // both patterns line-anchored identically (r17, ADVICE r16): an
    // unanchored subtraction also matched ReusedExchange lines that
    // PRINT ', Exchange RoundRobinPartitioning(...)' inline, so the
    // count over-subtracted and could mask a real keyed exchange
    "(?m)^\\s*[+:*-]*\\s*Exchange ".r.findAllIn(p).length -
      "(?m)^\\s*[+:*-]*\\s*Exchange RoundRobinPartitioning".r.findAllIn(p).length

  test("no query in the suite plans a CartesianProduct") {
    // BroadcastNestedLoopJoin against a tiny broadcast side is the
    // intended shape for brute-force/centroid comparisons; an unbounded
    // CartesianProduct is never acceptable.
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val p = plan(fn(spark, sf))
      if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("map-only operators shuffle at most once (their boundary sort)") {
    // these claim "zero shuffles before the query-boundary sort"
    val mapOnly = Seq("dedup_minhash", "dedup_simhash_native", "ann_lsh",
      "text_langid", "text_quality", "text_tokencount", "text_fingerprint",
      "text_sample", "text_extract")
    for (name <- mapOnly) {
      val p = plan(SparkEntry.queries(name)(spark, sf))
      assert(keyedExchanges(p) <= 1, s"$name should be map-only + one sort, got:\n$p")
    }
  }

  test("star-join dims broadcast, facts never build side") {
    val p = plan(SparkEntry.queries("q5_multijoin")(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("brute-force ANN broadcasts the query side, never shuffles the corpus vectors") {
    val p = plan(SparkEntry.queries("ann_bruteforce")(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // corpus vectors live only below the broadcast join; every exchange
    // above it carries (query_id, neighbor_id, cos) triples, so no
    // exchange row is wider than three columns of scalars
    val afterJoin = p.substring(p.indexOf("BroadcastNestedLoopJoin"))
    assert(!afterJoin.contains("Exchange hashpartitioning(neighbor_id"), p)
  }

  test("q46_lateral: the correlated LIMIT decorrelates — rank cut below the exchange, no per-row loop") {
    val p = plan(SparkEntry.queries("q46_lateral")(spark, sf))
    // the LIMIT-under-correlation must rewrite to a per-key group limit,
    // with the PARTIAL cut pushed below the orders exchange…
    assert(p.contains("WindowGroupLimit"), p)
    val firstCut = p.indexOf("WindowGroupLimit")
    assert(p.indexOf("Exchange", firstCut) >= 0 || p.lastIndexOf("WindowGroupLimit") > firstCut, p)
    // …and never fall back to re-executing the subquery per outer row
    assert(!p.contains("CartesianProduct"), p)
  }

  test("scan pushdown: filtered relational queries reach the parquet scan") {
    val p = plan(SparkEntry.queries("q6_scanagg")(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull"), p)
  }

  test("q25_dpp: dynamic partition pruning reaches the fact scan's partition filters") {
    val p = plan(SparkEntry.queries("q25_dpp")(spark, sf))
    assert(p.contains("dynamicpruning"),
      s"expected dynamicpruningexpression in PartitionFilters, got:\n$p")
  }

  test("bloom-filter runtime filter injects on a selective shuffle join") {
    // At real scale InjectRuntimeFilter fires on its own (creation side
    // under 10 MB, application scan over 10 GB); at test scale we lower
    // the application-side threshold and disable auto-broadcast so the
    // join is a shuffle join — the mechanism under test is the rewrite
    // itself: the fact scan gains a might_contain(bloom_filter_agg(...))
    // row filter built from the filtered dim side.
    val c = spark.conf
    val savedBroadcast = c.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val li = Tables.lineitem(spark, sf)
      val urgent = Tables.orders(spark, sf)
        .where(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      val joined = li.join(urgent,
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("bloom_filter") || opt.contains("might_contain"),
        s"expected a bloom runtime filter in the optimized plan, got:\n$opt")
    } finally {
      c.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcast)
      c.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    }
  }

  test("q36_bloom: the explicit bloom semi-filter sits on the fact scan, below the join") {
    val p = plan(SparkEntry.queries("q36_bloom")(spark, sf))
    // the declared graft_might_contain survives to the physical fact-side
    // filter (scalar-subquery bloom, applied before any join exchange)
    val iJoin = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
      .map(p.indexOf).filter(_ >= 0).minOption.getOrElse(p.length)
    val iFilter = p.indexOf("might_contain")
    assert(iFilter >= 0, s"expected might_contain in the physical plan, got:\n$p")
    assert(iFilter > iJoin, // plan strings print top-down: deeper = later
      s"bloom filter should sit BELOW the join (fact scan side), got:\n$p")
  }

  test("q26_bucketed: co-located merge join — no exchange below the join, buckets used") {
    val p = plan(SparkEntry.queries("q26_bucketed")(spark, sf))
    assert(p.contains("SortMergeJoin"), p)
    assert(p.contains("Bucketed: true"), p)
    // exactly two exchanges in the whole plan: the post-join aggregation
    // and the final orderBy — ZERO on the join inputs (the bucketing was
    // the shuffle, paid at write time). The in-partition Sorts below the
    // join remain: since Spark 3.0 the bucketed scan does not report
    // in-bucket sort order by default (planning-cost tradeoff,
    // spark.sql.legacy.bucketedTableScan.outputOrdering) — they are
    // exchange-free timsorts over already-sorted runs, not shuffles.
    val joinSubtree = p.substring(p.indexOf("SortMergeJoin"))
    assert(!joinSubtree.contains("Exchange"),
      s"expected no exchange below the bucketed join, got:\n$p")
    assert(exchanges(p) <= 2, s"expected only agg+sort exchanges, got:\n$p")
  }

  test("bucketed fact read path: q3/q13/q18/q21 plan zero fact-side exchanges") {
    // The r4 default read path (Sinks.bucketedLayout): order-key-joined
    // facts (q3/q18/q21) and custkey-joined facts (q13) read co-bucketed
    // layouts, so every fact join and every fact-keyed aggregation runs
    // inside the buckets — the shuffle was paid once at write time.
    def sortMergeSubtreeHasNoExchange(p: String): Boolean = {
      val i = p.indexOf("SortMergeJoin")
      i >= 0 && !p.substring(i).contains("Exchange hashpartitioning")
    }
    // q3: broadcast dim + co-located fact SMJ + in-bucket agg + TakeOrdered
    val p3 = plan(SparkEntry.queries("q3_join")(spark, sf))
    assert(p3.contains("Bucketed: true"), p3)
    assert(exchanges(p3) == 0, s"q3 should plan ZERO shuffle exchanges:\n$p3")
    // q18: in-bucket per-order agg + co-located SMJ + broadcast customer
    val p18 = plan(SparkEntry.queries("q18_topn_agg")(spark, sf))
    assert(p18.contains("Bucketed: true"), p18)
    assert(exchanges(p18) == 0, s"q18 should plan ZERO shuffle exchanges:\n$p18")
    // q21: in-bucket (orderkey, suppkey) group + orderkey window; only the
    // tiny per-supplier count shuffles
    val p21 = plan(SparkEntry.queries("q21_multicorr")(spark, sf))
    assert(p21.contains("Bucketed: true"), p21)
    assert(exchanges(p21) <= 1, s"q21 should shuffle only the supplier count:\n$p21")
    // q13: co-located outer SMJ + in-bucket per-customer count; only the
    // c_count redistribution and the final sort shuffle
    val p13 = plan(SparkEntry.queries("q13_outerjoin")(spark, sf))
    assert(p13.contains("Bucketed: true"), p13)
    assert(sortMergeSubtreeHasNoExchange(p13), s"q13 join inputs must be exchange-free:\n$p13")
    assert(exchanges(p13) <= 2, s"q13 should shuffle only c_count + final sort:\n$p13")
  }

  test("AQE splits a skewed join partition at runtime (isSkew in the final plan)") {
    // one hot key carrying ~all rows: the shape salting (q20_salted)
    // handles manually, here handled by AQE's runtime skew-join split.
    // Thresholds lowered so test-scale data crosses them; at real scale
    // the defaults (256 MB partition, 5× median) fire on genuine skew.
    val s = spark
    import s.implicits._
    val c = s.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    ).map(k => k -> c.get(k)).toMap
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // NOTE: no aggregation above the join — a downstream operator that
      // reuses the join's hash partitioning forbids the skew split (AQE
      // would have to re-shuffle); payload is low-compressibility so the
      // hot partition's shuffle bytes cross the lowered threshold
      val hot = (1L to 50000L)
        .map(i => (if (i % 100 == 0) i % 997 else 7L, s"payload-$i-${i * 2654435761L}"))
        .toDF("k", "payload")
      val dim = (1L to 1000L).map(i => (i, s"d$i")).toDF("k", "attr")
      val joined = hot.join(dim, "k")
      joined.queryExecution.executedPlan.execute().count()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isSkew=true") || finalPlan.contains("skew=true"),
        s"expected a runtime skew split in the final adaptive plan:\n$finalPlan")
    } finally saved.foreach { case (k, v) => c.set(k, v) }
  }

  test("text_pack's offsets join is size-gated: no broadcast when offs is big, no exchange on the big side") {
    // The offs frame is O(n_docs/64) rows — it may broadcast only under
    // the PackBroadcastMaxDocs count gate. Build the ABOVE-gate plan
    // (broadcastOffs = false, threshold -1 so the planner can't re-add
    // one by estimate) and assert the degraded plan is the one we want
    // at 100 TB: a sort-merge join whose big side reuses the packing
    // window's hashpartitioning(lang, rng) + ordering — exactly ONE
    // exchange (the window's own) and NO sort above the window — while
    // only the small offs side re-shuffles.
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.functions.{col, size => fsize, split, filter => ffilter}
    val c = spark.conf
    val saved = c.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val docs = Tables.documents(spark, sf)
      val nTok = fsize(ffilter(split(col("text"), " "), w => w =!= "")).cast("long")
      val tokens = docs.select(col("doc_id"), col("lang"), nTok.as("n_tokens"))
      // executedPlan (post-EnsureRequirements), unwrapped from AQE so the
      // exchanges are visible; pre-execution this is the initial plan
      val p = TextAnalysis.packingOf(tokens, broadcastOffs = false)
        .queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case o => o
      }
      assert(p.collect { case b: BroadcastExchangeExec => b }.isEmpty,
        s"offs must not broadcast once the planner sizes it big:\n$p")
      val smjs = p.collect { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, s"expected the offsets join as SMJ:\n$p")
      // the big (local-runs) side is the subtree whose window partitions
      // by BOTH keys (lang, rng) — the offs side's window partitions by
      // lang alone; it must carry no exchange above that window and no
      // re-sort between window and join
      def twoKeyWin(p: org.apache.spark.sql.execution.SparkPlan) =
        p.collect { case w: WindowExec if w.partitionSpec.size == 2 => w }
      val j = smjs.head
      val big = if (twoKeyWin(j.left).nonEmpty) j.left else j.right
      val win = twoKeyWin(big)
      assert(win.nonEmpty, s"big side lost its (lang, rng) window:\n$big")
      assert(big.collect { case e: ShuffleExchangeExec => e }.size == 1,
        s"big side must shuffle exactly once (the window's own partitioning):\n$big")
      def above(node: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
        if (node eq win.head) Seq.empty
        else node +: node.children.flatMap(above)
      assert(!above(big).exists(_.isInstanceOf[SortExec]),
        s"join must reuse the window's (lang, rng, doc_id) ordering, not re-sort:\n$big")
    } finally c.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("r6 additions keep their scale shapes: one-shuffle bigrams, TakeOrdered path mining") {
    // wc_bigrams: map-only pair construction ⇒ exactly one exchange
    // (the count's) and a TakeOrdered top-k, never a global sort
    val pb = plan(SparkEntry.queries("wc_bigrams")(spark, sf))
    assert(pb.contains("TakeOrderedAndProject"), pb)
    assert(exchanges(pb) == 1, s"wc_bigrams should shuffle exactly once:\n$pb")
    // ev_paths: the session windows share ONE user_id partitioning;
    // only the (path, count) aggregate adds a second exchange; top-k is
    // a TakeOrdered
    val pp = plan(SparkEntry.queries("ev_paths")(spark, sf))
    assert(pp.contains("TakeOrderedAndProject"), pp)
    assert(exchanges(pp) == 2, s"ev_paths should shuffle twice (user window + path count):\n$pp")
  }

  test("wc_cooccur: ONE tokenize pass — every consumer reads the cached count table") {
    // r6 shape re-exploded the corpus three times (pairs, unigrams,
    // totals); r7 funnels everything through one persisted count table.
    // The executed plan must read the corpus parquet at most once (the
    // cache fill) and serve every other consumer from InMemoryTableScan.
    // node-walk (not plan text: the printer re-prints the cached
    // fragment under every InMemoryTableScan): zero FileSourceScans in
    // the consumer tree — the only corpus read is the cache fill inside
    // the InMemoryRelation
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case _                        => p.children
      }
      p +: kids.flatMap(nodes)
    }
    val df = SparkEntry.queries("wc_cooccur")(spark, sf)
    try {
      val ns = nodes(df.queryExecution.executedPlan)
      val cacheReads = ns.count(_.isInstanceOf[InMemoryTableScanExec])
      val fileScans = ns.count(_.isInstanceOf[FileSourceScanExec])
      assert(cacheReads >= 4,
        s"top-k, two unigram joins, and both totals should read the cache, got $cacheReads")
      assert(fileScans == 0,
        s"no consumer may re-scan the corpus parquet, got $fileScans file scans")
    } finally Cleanup.releaseAll(spark)
  }

  test("q35_salted_hot: hot/cold union — one explode on the hot dim slice only, two joins") {
    // the RECOMMENDED skew shape (vs q20's whole-dim mechanism demo):
    // the dim replicates ONLY its hot rows (one explode, fed by the
    // hot-key filter), the cold remainder joins plain, and the two
    // halves union before the aggregate.
    val p = plan(SparkEntry.queries("q35_salted_hot")(spark, sf))
    assert(p.contains("Union"), s"expected hot/cold union:\n$p")
    assert("Generate explode".r.findAllIn(p).length == 1,
      s"exactly one salt explode (the hot dim slice), not whole-dim:\n$p")
    assert("Join".r.findAllIn(p).length >= 2,
      s"expected the salted hot join AND the plain cold join:\n$p")
    // both fact slices carry the hot-key membership filter (IN / NOT IN)
    assert(p.contains(" IN ") || p.contains("INSET"), s"expected hot-key filters:\n$p")
  }

  test("no query in the suite plans a partition-less (single-task) window") {
    // The scale test the r4 audit flagged: Window.orderBy without
    // partitionBy funnels the whole input through ONE task. q31_ntile
    // (distributed two-pass rank) and text_pack (two-level distributed
    // scan) were rebuilt so every WindowExec in the suite is partitioned;
    // this pins the whole surface so a global window cannot sneak back.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case r: ReusedExchangeExec    => Seq(r.child)
        case _                        => p.children
      }
      p +: kids.flatMap(nodes)
    }
    // Allowed: global windows whose INPUT cardinality is bounded by the
    // time axis or the cluster topology, not the data volume — q28/q29
    // window over a per-DAY aggregate (≤ a few thousand rows for a
    // decade of data at any SF), so the single task carries O(days)
    // scalars, never O(rows); wc_concat's and wc_chunked_n's prefix-sum
    // windows over the PER-PARTITION length sums (one row per partition
    // — O(P) scalars, the canonical distributed prefix-sum shape,
    // sources/Sources.scala globalOffsets), never the documents
    // themselves.
    // ann_hybrid's three global windows assign ranks WITHIN frames a
    // LIMIT (TakeOrdered, ≤ListK=100 rows) has already cut — O(k)
    // scalars per window, never corpus rows.
    // text_wsample follows the same LIMIT-then-rank shape: TakeOrdered
    // cuts the corpus to k=50 rows before its rank window runs.
    // wc_place embeds the same prefix-sum shape (via concatChunked) and
    // adds a ≤3-row binding window (reducer count — cluster topology,
    // not data volume)
    // text_shard is the same two-phase scan transposed onto the
    // permutation-key order: its global window runs over the
    // per-partition COUNT frame — O(#partitions) scalars, topology
    // not data
    // text_curriculum adds one more global window over the PHASE-count
    // frame (3 rows — a program constant, the wc_place class); its
    // bases window is phase-partitioned. pipe_shard embeds text_shard's
    // scan (same O(#partitions) bases frame) over the cleaned corpus.
    val boundedCardinality =
      Set("q28_running", "q29_movavg", "wc_concat", "wc_chunked_n",
        "wc_place", "ann_hybrid", "text_wsample", "text_shard",
        "text_curriculum", "pipe_shard")
    val offenders = SparkEntry.queries.toSeq
      .filterNot { case (name, _) => boundedCardinality(name) }
      .flatMap { case (name, fn) =>
        nodes(fn(spark, sf).queryExecution.executedPlan).collect {
          case w: WindowExec if w.partitionSpec.isEmpty           => s"$name: $w"
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => s"$name: $w"
        }
      }
    assert(offenders.isEmpty, s"partition-less windows in:\n${offenders.mkString("\n")}")
  }

  test("no query in the suite plans a frequency-unbounded window key") {
    // The r10-r12 straggler family: count()/min()/first() over
    // Window.partitionBy(<content-derived key>) funnels EVERY
    // occurrence of a hot key (a 10⁸-copy boilerplate page's
    // content_hash, a stop-bigram, a hot span digest, the empty-string
    // dup cluster) into ONE window partition and sorts it — before the
    // cap/filter that exists to bound it can run. The fixed form is a
    // map-side-combinable groupBy(key).agg joined back on the
    // already-shuffled key (dedup_exact, dedup_ngram,
    // dedup_containment, dedup_substring, dedup_best, dedup_lcs,
    // wc_mst). This sweep pins the invariant suite-wide: no WindowExec
    // may partition by a content-derived key — a digest/hash, an
    // n-gram/shingle, or a dup-cluster label, whose per-key cardinality
    // grows with corpus frequency rather than with an entity (doc,
    // query, user, order) or the topology (partition, phase, bucket).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case r: ReusedExchangeExec    => Seq(r.child)
        case _                        => p.children
      }
      p +: kids.flatMap(nodes)
    }
    val bannedExact = Set("gh", "bigram", "shingle", "cluster_id", "sig", "band")
    def banned(n: String): Boolean =
      bannedExact(n.toLowerCase) || n.toLowerCase.contains("hash")
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      nodes(fn(spark, sf).queryExecution.executedPlan).flatMap {
        case w: WindowExec =>
          w.partitionSpec.flatMap(_.references).map(_.name).filter(banned)
            .map(k => s"$name: window partitioned by content-derived '$k'")
        case w: WindowGroupLimitExec =>
          w.partitionSpec.flatMap(_.references).map(_.name).filter(banned)
            .map(k => s"$name: group-limit partitioned by content-derived '$k'")
        case _ => Nil
      }
    }
    assert(offenders.isEmpty, s"frequency-unbounded window keys:\n${offenders.mkString("\n")}")
  }

  test("iterative operators leave no storage behind after releaseAll") {
    // the caller-must-clear contract's other half: after a composed
    // pipeline run, one releaseAll returns the session to zero cached
    // frames and zero persistent RDDs (checkpoint blocks included)
    val st = operators.TrainingPipeline.stages(Tables.documents(spark, sf))
    st.last._2.count()
    operators.TrainingPipeline.release(st)
    Cleanup.releaseAll(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"persistent RDDs remain: ${spark.sparkContext.getPersistentRDDs.keys}")
  }
}
