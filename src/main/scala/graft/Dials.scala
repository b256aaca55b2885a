package graft

import graft.functions.LshImpl
import org.apache.spark.sql.SparkSession

/** Corpus-derived defaults for the two similarity scale dials.
  *
  * Both dials have measured-correct settings at every probed scale, but
  * r5 left their DEFAULTS as constants that fail at 100× (8-bit LSH
  * buckets OOM at 200 k vectors; the stride-37 centroid slice makes IVF
  * assignment quadratic). A dial whose safe value depends on n must
  * derive from n — so the mains ([[Verify]], [[Bench]], [[Explain]])
  * record the corpus's vector count here once per JVM, and the defaults
  * follow it:
  *
  *  - LSH bits: bucket occupancy is n/2^bits per table, so
  *    `bits = ceil(log2(n / TargetOccupancy))`, floored at the gated
  *    [[LshImpl.Bits]] (the plane prefix is refinement-safe, so raising
  *    bits only splits buckets) and capped at [[LshImpl.MaxBits]] (the
  *    planes materialized up front). At the gate scales (500–2 k
  *    vectors) this stays at the floor — behavior unchanged; at the
  *    100× stress corpus (200 k) it derives 12, the measured-good
  *    setting (SURVEY §5c).
  *  - IVF centroid stride: K ≈ n/stride centroids, and assignment
  *    evaluates n·K cosines — a fixed stride is quadratic in n. Deriving
  *    `stride = floor(sqrt(n))` keeps K ≈ √n, the classic IVF codebook
  *    size, so assignment stays n^1.5 and cells hold ~√n vectors each.
  *
  * The env overrides (`SPARK_GRAFT_LSH_BITS`, `SPARK_GRAFT_IVF_STRIDE`)
  * still win for operators pinning a deployment-tuned value.
  *
  * Consistency contract: the DuckDB oracles interpolate these SAME
  * values as literals, so query and oracle can only agree if the oracle
  * SQL is built in the same JVM AFTER [[init]] — which is how the mains
  * run (Verify inits, runs the queries, then dumps `oracle_sql.json`).
  * Uninitialized (unit specs on synthetic frames), both dials fall back
  * to the r5 constants, keeping spec fixtures stable.
  */
object Dials {

  /** LSH bucket-occupancy target: vectors per bucket per table the
    * candidate self-join is sized for (~50²/2 candidate rows each). */
  val TargetOccupancy = 50L

  @volatile private var nVectors: Option[Long] = None
  @volatile private var nFactRows: Option[Long] = None
  @volatile private var nDocs: Option[Long] = None
  @volatile private var dir: Option[String] = None
  @volatile private var sparkRef: Option[SparkSession] = None
  @volatile private var calibratedBeam: Option[Int] = None

  /** Record the gated corpus's vector count (parquet footer count —
    * metadata-only, no scan) and sf dir. Called once by each main after
    * session build; later calls re-derive (a JVM benching two dirs
    * follows the most recent). Also (r16, VERDICT r15 #3):
    *
    *  - derives `spark.sql.shuffle.partitions` from the corpus size
    *    ([[shufflePartitionsFor]]) — the ×1000 graph-family runs needed
    *    a hand-set 128 while every other scale knob was a derived Dial;
    *    now the session partition count follows the corpus like the
    *    rest. The env override (`SPARK_GRAFT_SHUFFLE_PARTITIONS`, which
    *    the mains pass through at session build) still wins.
    *  - resolves the calibrated graph beam EAGERLY (ADVICE r15):
    *    [[graphBeam]] was a getter that could run a multi-minute
    *    calibration probe on first access — inside a TIMED bench query
    *    if the fixture was cold. Resolving here moves the probe (and
    *    its fixture write) before any timed section. */
  def init(spark: SparkSession, sfDir: String): Unit = {
    nVectors = Some(Tables.embeddings(spark, sfDir).count())
    nFactRows = Some(Tables.lineitem(spark, sfDir).count())
    nDocs = Some(Tables.documents(spark, sfDir).count())
    dir = Some(sfDir)
    sparkRef = Some(spark)
    synchronized { calibratedBeam = None } // a new corpus invalidates the memo
    if (!sys.env.contains("SPARK_GRAFT_SHUFFLE_PARTITIONS")) {
      val cur = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val derived = shufflePartitionsFor(nVectors.getOrElse(0L), cur)
      if (derived != cur)
        spark.conf.set("spark.sql.shuffle.partitions", derived.toString)
    }
    if (envPosInt("SPARK_GRAFT_GRAPH_BEAM").isEmpty) resolveCalibratedBeam()
  }

  /** The recorded corpus size, if a main has initialized it. */
  def vectorCount: Option[Long] = nVectors

  /** The recorded document-corpus size, if a main has initialized it. */
  def docCount: Option[Long] = nDocs

  /** Docs below which the band-sequential dedup loops skip their
    * inter-band driver GC (r16). The GC exists to let the
    * ContextCleaner delete a superseded band's shuffle files BEFORE the
    * next band stages — a scratch-DISK bound measured only at the
    * ×1000 tier (5 M docs, §5c-r12: the stacked form overran ~53 GB of
    * scratch). At gate scale the same call is pure wall cost inside the
    * timed path: 4 bands × 2 bench runs = 8 full young+old collections
    * per bench of `dedup_minhash_thresh` for kilobyte-scale shuffle
    * files the cleaner reclaims trivially later. A million docs' banded
    * index (4 fixed-width rows/doc) stages well under a GB per band —
    * orders of magnitude inside any scratch disk — so the GC buys
    * nothing below this bound. Same class as the traversal/2-hop band
    * GCs, which are already implicitly gated by their derived
    * bands > 1. */
  val BandGcMinDocs = 1000000L

  /** Whether the band-sequential loops should drive the inter-band GC:
    * local master (it is this JVM's scratch disk) AND a corpus big
    * enough that band shuffle files actually pressure it. UNKNOWN corpus
    * size (a library caller invoking the banded dedups without [[init]])
    * FAILS OPEN (r17, ADVICE r16): the GC is the safety valve against
    * the r12 ~53 GB scratch overrun, and a multi-million-doc direct
    * caller must not silently lose it — the cost of a spurious GC on a
    * small uninitialized corpus is milliseconds. The mains always init,
    * so gate/bench behavior is unchanged. */
  def bandGcNeeded: Boolean = nDocs.forall(_ >= BandGcMinDocs)

  /** The recorded sf dir — lets oracle builders locate fixture paths
    * (e.g. the persisted IVF codebook) for the corpus under test. */
  def sfDir: Option[String] = dir

  private def ceilLog2(v: Long): Int =
    if (v <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(v - 1)

  /** The pure derivation behind [[lshBits]] — exposed so DialsSpec
    * asserts the PRODUCTION formula at known counts instead of
    * re-implementing it (a drifted re-implementation asserts nothing). */
  private[graft] def lshBitsFor(n: Long): Int = {
    val buckets = (n + TargetOccupancy - 1) / TargetOccupancy
    math.min(LshImpl.MaxBits, math.max(LshImpl.Bits, ceilLog2(buckets)))
  }

  /** Bits per LSH table: env override, else corpus-derived, else the
    * gated constant. */
  def lshBits: Int =
    sys.env.get("SPARK_GRAFT_LSH_BITS").map(_.toInt).getOrElse(
      nVectors.fold(LshImpl.Bits)(lshBitsFor))

  /** The pure derivation behind [[ivfStride]]. */
  private[graft] def ivfStrideFor(n: Long): Long =
    math.max(1L, math.sqrt(n.toDouble).toLong)

  /** IVF centroid stride: env override, else floor(sqrt(n)), else the
    * gated constant. */
  def ivfStride: Long =
    sys.env.get("SPARK_GRAFT_IVF_STRIDE").map(_.toLong).getOrElse(
      nVectors.fold(37L)(ivfStrideFor))

  /** Target fact rows per bucket in the default bucketed fact layout.
    * Sized so the in-bucket per-key hash aggregations the layout exists
    * to serve (q18's per-order group being the canonical one) keep
    * their state within one executor's memory: ~8 M fact rows ≈ 2 M
    * order groups per bucket. */
  val FactRowsPerBucket = 8000000L

  /** Bucket count for the co-located fact layouts: corpus-derived
    * power of two (Spark coalesces power-of-two bucket ratios without a
    * shuffle), floored at the gated 8 (every gate scale derives the
    * floor — behavior byte-identical), capped at 1024. A FIXED bucket
    * count is the same class of bug as a fixed LSH bits dial: at 1000×
    * (600 M fact rows) 8 buckets put ~19 M aggregation groups in one
    * in-bucket hash-agg partition and spilled (§5d-r12, q18's 133×);
    * deriving 128 buckets there (ceil(600 M / 8 M) = 75 → next power of
    * two) holds per-bucket state constant as the corpus grows. The
    * count rides the fixture dir key, so a changed derivation rewrites
    * the layout instead of silently mismatching. */
  def joinBuckets: Int =
    envPosInt("SPARK_GRAFT_JOIN_BUCKETS").getOrElse(
      nFactRows.fold(8)(joinBucketsFor))

  /** The pure derivation behind [[joinBuckets]] — exposed for DialsSpec
    * (see [[lshBitsFor]]'s rationale). */
  private[graft] def joinBucketsFor(n: Long): Int = {
    val want = (n + FactRowsPerBucket - 1) / FactRowsPerBucket
    val p2 = 1 << ceilLog2(math.max(1L, want))
    math.min(1024, math.max(8, p2))
  }

  /** Graph-ANN traversal dials (`ann_graph_search`) — the §5c-r12
    * recall sweep's measured rule promoted into derived defaults, so a
    * user gets the ≥0.95-recall operating point without reading the
    * survey. Two findings drive the formulas:
    *
    *  - At the sf0.1 gate corpus (2 000 vectors) the measured
    *    production point is (beam 48, rounds 6, degree 16) ⇒
    *    recall@5 = 0.955 for the same wall cost as the old
    *    0.15-recall demo dial (the graph build dominates; beam/degree
    *    only widen the skinny candidate frames).
    *  - Recall at FIXED dials decays as the corpus grows (32/6/8:
    *    0.96 at 500 vectors → 0.655 at 2 000) — the HNSW rule that
    *    graph degree must grow ~log n (M-sizing, Malkov & Yashunin
    *    2016). Anchored at the measured point: degree =
    *    ceil([[GraphDegreeC]]·log₂ n), which lands exactly 16 at
    *    n = 2 000 and 25 at the 200 k ×100 corpus; beam stays at the
    *    measured 3× ratio ([[GraphBeamFactor]]).
    *
    * FLOORED at the sf0.1 operating point, so every gate corpus
    * (500–2 000 vectors) derives the SAME (48, 6, 16) dial — one
    * oracle unroll depth across all gate dirs, and recall at the floor
    * is ≥0.95 everywhere it was measured (1.00 at 500 vectors for the
    * weaker 48/6/12). Rounds stay fixed at 6: the beam walk's reach is
    * degree^rounds, so the log-n growth rides degree (the measured
    * lever), keeping the unrolled oracle CTE chain and plan depth
    * static. Env overrides for deployment-tuned values, as with the
    * other dials; uninitialized falls back to the floor. */
  val GraphDegreeFloor = 16
  val GraphDegreeC = 1.4
  val GraphBeamFactor = 3
  val GraphRoundsDefault = 6

  /** Per-cell CANDIDATE cap for the k-NN graph build (r14, VERDICT r13
    * #1) — the one superlinear component left: with K ≈ √n cells of
    * ~√n members each (and SPANN closure assignment doubling
    * occupancy), uncapped within-cell pair enumeration is n^1.5
    * candidate rows — at 10¹⁰ vectors that is 10¹⁵ pairs, an exponent
    * no cluster shape saves. The cap bounds each vector's candidate
    * list at a CONSTANT budget (per probed cell, the `knncap`-hashed
    * hub sample of the cell's members — the dedup family's DF-cap
    * discipline applied to cells), making total build candidates
    * ≤ n·BuildProbes·cap — linear. Edges the cap drops are recovered
    * by NN-descent (already gated, O(n·degree·iter)) — the published
    * way this graph is built at scale (Dong et al., WWW 2011).
    *
    * CONSTANT, deliberately not n-derived: a growing cap re-smuggles
    * the exponent in. Floored ABOVE every gate corpus's measured max
    * 2-probe cell occupancy (55/61/116 at sf0.001/0.01/0.1), so at
    * every gate corpus the hub sample IS the whole cell and behavior
    * is byte-identical to the uncapped build. */
  val KnnCellCapFloor = 192

  def knnCellCap: Int =
    envPosInt("SPARK_GRAFT_KNN_CELL_CAP").getOrElse(KnnCellCapFloor)

  /** Validated positive-int env dial: a value ≤ 0 here would silently
    * produce degenerate behavior (e.g. a cap of 0 keeps NO hub sample →
    * an edgeless k-NN graph on both engines, gate-green and useless)
    * and garbage would throw a bare NumberFormatException with no dial
    * name — the failure mode `spark.graft.topk.maxPartialEntries` fixed
    * loudly at plan time (ADVICE r14). */
  private[graft] def envPosInt(name: String): Option[Int] =
    sys.env.get(name).map { raw =>
      val parsed = try raw.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$name must be a positive integer, got '$raw'")
      }
      require(parsed > 0, s"$name must be > 0, got $parsed")
      parsed
    }

  /** The pure derivation behind [[graphDegree]]. */
  private[graft] def graphDegreeFor(n: Long): Int =
    math.max(GraphDegreeFloor,
      math.ceil(GraphDegreeC * math.log(math.max(2L, n).toDouble) / math.log(2.0)).toInt)

  /** Graph out-degree kept per vector in the refined k-NN graph. */
  def graphDegree: Int =
    envPosInt("SPARK_GRAFT_GRAPH_DEGREE").getOrElse(
      nVectors.fold(GraphDegreeFloor)(graphDegreeFor))

  /** Two-point calibration of the beam width against the ADVERSARIAL
    * ladder corpus (§5c-r14): with the α-diversified graph, recall at
    * ×100 (200 k vectors, 100 orthogonal isometric islands) is a pure
    * function of beam — 75→0.604, 150→0.762, 300→0.894, 600→0.960 at
    * fixed (rounds 6, degree 25) — while doubling ROUNDS buys nothing
    * (75-beam/12-rounds: 0.611) and query cost is nearly flat in beam
    * (the build dominates; 600-beam searched at the same wall the r13
    * 75-beam build did). 0.96-recall beam grows ≈ √n on this geometry
    * (48@2 k → 600@200 k), NOT log n: when clusters share no boundary
    * structure, the beam must hold a cluster-sized working set. A real
    * manifold needs only the log-n HNSW sizing (the 3·degree floor) —
    * measured on the r15 navigable (intrinsic-dim-4) ladder fixture.
    * Since r15 ceil([[BeamRecallC]]·√n) is the calibration CEILING,
    * not the default: the default beam comes from a build-time
    * SAMPLED-RECALL probe ([[graft.operators.Similarity.calibratedBeamFor]]
    * — VERDICT r14 #2), which lands at the log-n floor on navigable
    * corpora and reproduces ~√n only where the geometry demands it. */
  val BeamRecallC = 1.34

  /** The worst-case-geometry beam ceiling for corpus size `n`:
    * max(3·degree, ceil([[BeamRecallC]]·√n)) — what r14 shipped as the
    * unconditional default, now the top rung of the calibration
    * ladder. */
  private[graft] def graphBeamCeiling(n: Long): Int =
    math.max(GraphBeamFactor * graphDegree,
      math.ceil(BeamRecallC * math.sqrt(n.toDouble)).toInt)

  /** Beam width kept per query per traversal round. Resolution order:
    *
    *  1. `SPARK_GRAFT_GRAPH_BEAM` — deployment-pinned.
    *  2. CALIBRATED (r15, VERDICT r14 #2): a fixture-cached build-time
    *     sampled-recall probe — build the refined graph once, search a
    *     deterministic query sample at beams floor, 2·floor, … up to
    *     [[graphBeamCeiling]], keep the first beam whose sampled
    *     recall@5 vs exact truth clears the target. A navigable corpus
    *     stops at the 3·degree log-n floor (the √n default overpaid
    *     ~√n/log n there); the adversarial ladder corpus reproduces
    *     the measured √n ceiling. Memoized per init; persisted per
    *     corpus (the codebook-fixture discipline), so the probe runs
    *     once per corpus, not once per session. Skipped entirely when
    *     the ceiling IS the floor (every gate corpus ≤ ~1.3 k vectors).
    *  3. Uninitialized (unit specs): the 3·degree floor.
    *
    * The oracle interpolates the RESOLVED value (the mains init Dials
    * before any oracle text is built), so both engines always unroll
    * the same beam. */
  def graphBeam: Int =
    envPosInt("SPARK_GRAFT_GRAPH_BEAM").getOrElse(resolveCalibratedBeam())

  /** The memoized calibrated-beam resolution — SYNCHRONIZED (ADVICE
    * r15: the memo was an unguarded check-then-act, so two concurrent
    * first calls could each run the multi-minute probe). [[init]] calls
    * this eagerly, so in the mains the probe never lands inside a timed
    * query; the guard covers direct library use. */
  private def resolveCalibratedBeam(): Int = synchronized {
    calibratedBeam.getOrElse {
      val resolved = (for { s <- sparkRef; d <- dir } yield
        graft.operators.Similarity.calibratedBeamFor(s, d))
      resolved.foreach(b => calibratedBeam = Some(b))
      resolved.getOrElse(GraphBeamFactor * graphDegree)
    }
  }

  /** Fixed traversal rounds (static plan depth / oracle unroll).
    * Validated (ADVICE r15): a zero/negative rounds value would
    * silently yield a traversal — and an oracle unroll — that returns
    * entry seeds only, gate-green on both engines and useless. */
  def graphRounds: Int =
    envPosInt("SPARK_GRAFT_GRAPH_ROUNDS").getOrElse(GraphRoundsDefault)

  /** Corpus rows per mid-vertex band of the NN-descent 2-hop self-join
    * (r15, VERDICT r14 #3). The 2-hop join shuffles the vector-bearing
    * gv frame on BOTH sides; at ×1000 (2 M vectors, degree ~30) that
    * is two ~35 GB exchanges against ~55 GB of local scratch — past
    * the single-box wall r14 recorded as out of reach. Banding the
    * join's MID vertex (`pmod(mid, bands)`) and running the bands
    * SEQUENTIALLY — each band's skinny scored triples fold into a
    * running per-vector top-L accumulator, the `dedup_minhash_thresh`
    * band-sequential discipline — caps peak scratch at ~1/bands of the
    * exchange while producing the EXACT same edge list (top-k is
    * band-decomposable under the total order; spec-pinned). */
  val NndBandRows = 250000L

  /** Mid-vertex bands for the NN-descent 2-hop join: 1 (the r14
    * single-pass plan, byte-identical) up to the measured ×100 tier;
    * ceil(n / [[NndBandRows]]) above it. */
  def nndHop2Bands: Int =
    envPosInt("SPARK_GRAFT_NND_BANDS").getOrElse(
      nVectors.fold(1)(n => math.max(1, ((n + NndBandRows - 1) / NndBandRows).toInt)))

  /** Corpus vector rows per shuffle partition the session is sized for
    * (r16, VERDICT r15 #3): ~15.6 k of the 520-byte embedding rows ≈
    * 8 MB per partition on the vector-bearing exchanges the graph
    * family runs — the frame class every ×1000 disk wall traced back
    * to. The ×1000 runs needed a hand-set 128 partitions; 2 M vectors /
    * 15 625 derives exactly that.
    *
    * HEAP is the one scale knob that cannot be a runtime dial — it is a
    * JVM launch parameter (`SPARK_DRIVER_MEM`, wired through build.sbt's
    * forked javaOptions; a cluster sizes executor memory in deployment
    * config the same way). Measured guidance for the single-JVM
    * local[32] ladder: the default 8g holds every gate tier and ×100;
    * the ×1000 graph family (2 M vectors: ~1 GB corpus-vector cache +
    * 32 concurrent task buffers over 8 MB partitions + broadcast query
    * frames) wants 16–24g — r15's navigable ×1000 run used 24g and is
    * the recorded reference protocol. */
  val VecRowsPerPartition = 15625L

  /** The pure derivation behind the [[init]]-time
    * `spark.sql.shuffle.partitions` setting: next power of two of
    * n / [[VecRowsPerPartition]] (power of two so AQE coalescing and
    * bucket-ratio joins stay shuffle-free), FLOORED at the session's
    * configured count (a cluster sizes that to total cores; the floor
    * keeps every gate corpus byte-identical to the hand-set 32) and
    * capped at 1024. */
  private[graft] def shufflePartitionsFor(n: Long, floor: Int): Int = {
    val want = (n + VecRowsPerPartition - 1) / VecRowsPerPartition
    val p2 = 1 << ceilLog2(math.max(1L, want))
    math.max(floor, math.min(1024, p2))
  }

  /** Pre-distinct candidate rows per traversal round per QUERY BAND the
    * beam search is sized for (r16, VERDICT r15 #1): one round over one
    * band exchanges ≤ this many skinny (query_id, cand_id, cos) rows
    * (~5 GB at the measured ~35 B/row) — well inside single-box scratch
    * where the unbanded adversarial ×1000 round's ~2.3 G rows (~80 GB)
    * was the recorded disk wall. */
  val TraversalBandCandRows = 150000000L

  /** The pure derivation behind [[traversalBands]]: per-round
    * pre-distinct candidate volume is |Q|·beam·(2·degree+1) (each beam
    * slot re-emits itself plus its symmetrized out/in neighbors), split
    * into ceil(volume / [[TraversalBandCandRows]]) sequential query
    * slices. Queries are INDEPENDENT — banding the query axis changes
    * no result row (spec-pinned) — so this is the `dedup_minhash_thresh`
    * band-sequential discipline applied to the one traversal axis that
    * decomposes trivially. */
  private[graft] def traversalBandsFor(qCount: Long, beam: Int, degree: Int): Int = {
    val perRound = qCount * beam.toLong * (2L * degree + 1L)
    math.max(1, ((perRound + TraversalBandCandRows - 1) / TraversalBandCandRows).toInt)
  }

  /** Query bands for the graph-ANN beam traversal: 1 (the r15
    * single-pass plan, byte-identical) at every gate and ×100 tier;
    * derived from the resolved beam at the tiers whose per-round
    * exchange would otherwise out-size scratch. */
  def traversalBands(qCount: Long, beam: Int, degree: Int): Int =
    envPosInt("SPARK_GRAFT_TRAVERSAL_BANDS").getOrElse(
      traversalBandsFor(qCount, beam, degree))
}
