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
  @volatile private var dir: Option[String] = None

  /** Record the gated corpus's vector count (parquet footer count —
    * metadata-only, no scan) and sf dir. Called once by each main after
    * session build; later calls re-derive (a JVM benching two dirs
    * follows the most recent). */
  def init(spark: SparkSession, sfDir: String): Unit = {
    nVectors = Some(Tables.embeddings(spark, sfDir).count())
    nFactRows = Some(Tables.lineitem(spark, sfDir).count())
    dir = Some(sfDir)
  }

  /** The recorded corpus size, if a main has initialized it. */
  def vectorCount: Option[Long] = nVectors

  /** The recorded sf dir — lets oracle builders locate fixture paths
    * (e.g. the persisted IVF codebook) for the corpus under test. */
  def sfDir: Option[String] = dir

  private def ceilLog2(v: Long): Int =
    if (v <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(v - 1)

  /** Bits per LSH table: env override, else corpus-derived, else the
    * gated constant. */
  def lshBits: Int =
    sys.env.get("SPARK_GRAFT_LSH_BITS").map(_.toInt).getOrElse(
      nVectors.fold(LshImpl.Bits) { n =>
        val buckets = (n + TargetOccupancy - 1) / TargetOccupancy
        math.min(LshImpl.MaxBits, math.max(LshImpl.Bits, ceilLog2(buckets)))
      })

  /** IVF centroid stride: env override, else floor(sqrt(n)), else the
    * gated constant. */
  def ivfStride: Long =
    sys.env.get("SPARK_GRAFT_IVF_STRIDE").map(_.toLong).getOrElse(
      nVectors.fold(37L)(n => math.max(1L, math.sqrt(n.toDouble).toLong)))

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
    * deriving 64 buckets there holds per-bucket state constant as the
    * corpus grows. The count rides the fixture dir key, so a changed
    * derivation rewrites the layout instead of silently mismatching. */
  def joinBuckets: Int =
    sys.env.get("SPARK_GRAFT_JOIN_BUCKETS").map(_.toInt).getOrElse(
      nFactRows.fold(8) { n =>
        val want = (n + FactRowsPerBucket - 1) / FactRowsPerBucket
        val p2 = 1 << ceilLog2(math.max(1L, want))
        math.min(1024, math.max(8, p2))
      })
}
