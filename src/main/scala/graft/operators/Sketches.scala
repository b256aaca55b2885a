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
}
