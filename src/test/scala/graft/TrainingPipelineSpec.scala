package graft

import graft.operators.TrainingPipeline
import org.apache.spark.sql.functions._

class TrainingPipelineSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)
  // one pipeline build for the whole suite — stages() eagerly runs the
  // clustering loop, so rebuilding it per test doubles the work
  private lazy val st = TrainingPipeline.stages(docs)

  test("stage counts decrease monotonically and summary matches stage frames") {
    val counts = st.map { case (n, df) => n -> df.count() }
    assert(counts.map(_._2) == counts.map(_._2).sorted.reverse)
    val fromSummary = TrainingPipeline.summary(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromSummary == counts.toMap)
  }

  test("cleaned corpus writes lang-partitioned and reads back pruned") {
    val out = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    graft.sinks.Sinks.writePartitioned(st.last._2, out, "lang")
    val back = spark.read.parquet(out)
    assert(back.count() == st.last._2.count())
    val en = back.where(col("lang") === "en")
    assert(en.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(lang"))
    assert(en.count() == st.last._2.where(col("lang") === "en").count())
  }

  test("cleaned corpus survivors pass every stage's own predicate") {
    val c = st.last._2
    // each survivor agrees on language and clears the quality bar
    val lang = graft.operators.TextAnalysis.langId(docs)
      .select(col("doc_id"), col("agree"))
    val bad = c.join(lang, "doc_id").where(col("agree") =!= 1)
    assert(bad.count() == 0)
    // survivors are pairwise distinct by content hash
    val dup = c.groupBy(md5(col("text"))).count().where(col("count") > 1)
    assert(dup.count() == 0)
  }
}
