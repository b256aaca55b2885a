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

  test("tokens: case-sensitive, non-letter splits, no empties") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "Hello, hello WORLD-x1y")).toDF("doc_id", "text")
    val t = WordCount.tokens(d).as[String].collect().toSeq
    assert(t == Seq("Hello", "hello", "WORLD", "x", "y"))
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
}
