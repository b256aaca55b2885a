package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The five-stage TrainingPipeline summary exercises text analysis,
    * dedup, clustering, and aggregation in one composed run. */
  def entry(spark: SparkSession): DataFrame =
    TrainingPipeline.summary(Tables.documents(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    WordCount.queries ++ Relational.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ Events.queries ++
      Multimodal.queries ++ TrainingPipeline.queries ++ Skew.queries ++
      RuntimeFilters.queries ++ graft.sinks.Sinks.queries ++
      graft.sources.Sources.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    WordCount.oracleAll ++ Relational.oracle ++ TextAnalysis.oracle ++
      Dedup.oracle ++ Similarity.oracle ++ Events.oracle ++
      Multimodal.oracle ++ TrainingPipeline.oracle ++ Skew.oracle ++
      RuntimeFilters.oracle ++ graft.sinks.Sinks.oracle ++
      graft.sources.Sources.oracle
}
