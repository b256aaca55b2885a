package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation — the realistic 100 TB path for
  * cardinality and quantile questions, where the exact forms
  * (`countDistinct`, rank-selection percentiles) pay a full shuffle of
  * the distinct values. Sketches are fixed-size, merge associatively
  * (map-side partials stay tiny), and their error is configured, not
  * data-dependent.
  *
  * Not DuckDB-oracle-able — sketch internals are engine-specific — so
  * this family is bound by ScalaTest invariants against the exact
  * operators (relative-error tolerance) instead of the driver gate.
  */
object Sketches {

  val RelativeSD = 0.02    // HLL++ target relative standard deviation
  val QuantileErr = 0.01   // percentile_approx accuracy = 1/err

  /** Approximate distinct-token count per language — HLL++ twin of
    * [[WordCount.distinctPerLang]]. */
  def approxDistinctPerLang(docs: DataFrame): DataFrame =
    WordCount.tokens(docs, col("lang"))
      .groupBy("lang")
      .agg(approx_count_distinct(col("word"), RelativeSD).as("n_distinct_approx"))
      .orderBy("lang")

  /** Approximate per-language length quantiles — sketch twin of
    * [[TextAnalysis.lengthPercentiles]]. */
  def approxLengthPercentiles(docs: DataFrame): DataFrame = {
    def q(p: Double, name: String): Column =
      percentile_approx(col("n_chars"), lit(p), lit((1 / QuantileErr).toInt)).as(name)
    docs.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), q(0.5, "p50"), q(0.9, "p90"), q(0.99, "p99"))
      .orderBy("lang")
  }

  /** MERGEABLE sketches, made explicit: per-(lang, source) HLL sketch
    * BYTES (Datasketches HllSketch, `hll_sketch_agg`), then a second
    * aggregation that UNIONS the serialized sketches up to per-language
    * estimates — the two-phase shape a 100 TB deployment runs (build
    * sketches per partition/day/shard, persist the bytes, merge on
    * demand; distinct values never travel). `approx_count_distinct`
    * hides the same mergeability inside one operator; this surfaces the
    * sketch as DATA so pre-aggregation across jobs/days composes. */
  def distinctTokenSketches(docs: DataFrame): DataFrame =
    WordCount.tokens(docs, col("lang"), col("source"))
      .groupBy("lang", "source")
      .agg(hll_sketch_agg(col("word")).as("sketch"))

  /** Merge phase: union stored sketch bytes per language, estimate. */
  def mergeDistinctSketches(sketches: DataFrame): DataFrame =
    sketches.groupBy("lang")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("n_distinct_approx"))
      .orderBy("lang")

  val CmsEps = 0.001       // CountMin over-estimate bound: eps · total items
  val CmsConfidence = 0.99
  val CmsSeed = 42

  /** COUNT-MIN heavy hitters — the frequency-sketch member of the
    * family: a fixed-size CountMinSketch over the token stream
    * (one distributed build via `df.stat.countMinSketch`; only
    * depth×width counters travel to the driver, never tokens), then
    * point estimates for candidate heavy hitters. CMS never
    * under-counts and over-counts by at most eps·N with the configured
    * confidence — the property the spec binds against exact counts.
    * At 100 TB the sketch size is unchanged; per-shard sketches merge
    * with `mergeInPlace` exactly like the HLL bytes above. */
  def heavyHitters(docs: DataFrame, candidates: Seq[String]): Seq[(String, Long)] = {
    val cms = WordCount.tokens(docs)
      .stat.countMinSketch(col("word"), CmsEps, CmsConfidence, CmsSeed)
    candidates.map(w => w -> cms.estimateCount(w))
  }

  /** Two-phase CMS: per-shard sketches merged associatively — the
    * persist-per-shard shape; returns the merged sketch's estimates. */
  def heavyHittersSharded(docs: DataFrame, shardCol: String,
                          shardValues: Seq[String], candidates: Seq[String]): Seq[(String, Long)] = {
    val merged = shardValues
      .map(v => WordCount.tokens(docs.where(col(shardCol) === v))
        .stat.countMinSketch(col("word"), CmsEps, CmsConfidence, CmsSeed))
      .reduce { (a, b) => a.mergeInPlace(b); a }
    candidates.map(w => w -> merged.estimateCount(w))
  }
}
