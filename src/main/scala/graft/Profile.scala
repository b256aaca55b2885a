package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (like [[Explain]]): time the training pipeline's stages one
  * by one so the cost head of the pipe family is measured, not guessed.
  * Usage: runMain graft.Profile <sfDir>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Dials.init(spark, sfDir)
    // warmup
    try {
      SparkEntry.entry(spark).count()
      spark.read.parquet(s"$sfDir/documents.parquet").count()
    } catch { case e: Throwable => System.err.println(s"warmup failed: $e") }

    import org.apache.spark.sql.functions._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    for (round <- 1 to 2) {
      System.err.println(s"[profile] --- round $round ---")
      Cleanup.releaseAll(spark)
      val docs = Tables.documents(spark, sfDir)
      val flagged = t("flags (lang+quality)") {
        val f = docs
          .withColumn("g_lang_ok", operators.TextAnalysis.langAgreeCol)
          .withColumn("g_qual_ok", operators.TextAnalysis.qualityScoreCol >= operators.TrainingPipeline.QualityMin)
          .persist()
        f.count(); f
      }
      val docCols = docs.columns.map(col).toSeq
      val s2 = flagged.where(col("g_lang_ok") && col("g_qual_ok")).select(docCols: _*)
      val s3 = t("gopherRules") {
        val x = s2.join(
          operators.TextAnalysis.gopherRules(s2).where(col("passes") === 1).select("doc_id"), "doc_id").persist()
        x.count(); x
      }
      val s4 = t("contaminatedIds") {
        val x = s3.join(operators.TextAnalysis.contaminatedIds(s3, docs), Seq("doc_id"), "left_anti").persist()
        x.count(); x
      }
      val s5 = t("exact dedup") {
        val x = s4.join(
          operators.Dedup.exact(s4).where(col("doc_id") === col("keep_id")).select("doc_id"), "doc_id").persist()
        x.count(); x
      }
      val s6 = t("minhashClustersLS") {
        val x = s5.join(
          operators.Dedup.minhashClustersLS(s5).where(col("is_canonical") === 1).select("doc_id"), "doc_id")
        x.count(); x
      }
      t("summary end-to-end (fresh)") {
        Cleanup.releaseAll(spark)
        operators.TrainingPipeline.summary(Tables.documents(spark, sfDir))
          .queryExecution.toRdd.count()
      }
      t("pipe_warc end-to-end (fresh)") {
        Cleanup.releaseAll(spark)
        SparkEntry.queries("pipe_warc")(spark, sfDir).queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
