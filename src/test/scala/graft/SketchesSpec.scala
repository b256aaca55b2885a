package graft

import graft.operators.{Sketches, TextAnalysis, WordCount}
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  test("HLL distinct-per-lang within 5% of exact") {
    val exact = WordCount.distinctPerLang(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Sketches.approxDistinctPerLang(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((lang, a) <- approx) {
      val e = exact(lang)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$lang: approx $a vs exact $e")
    }
  }

  test("two-phase sketch-merge (hll_sketch_agg bytes → hll_union_agg) matches exact within 5%") {
    val exact = WordCount.distinctPerLang(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // phase 1 materialized as plain bytes — what a 100 TB run persists
    // per shard/day; phase 2 merges WITHOUT touching the raw tokens
    val sketches = Sketches.distinctTokenSketches(docs)
    assert(sketches.schema("sketch").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val merged = Sketches.mergeDistinctSketches(sketches).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet == exact.keySet)
    for ((lang, a) <- merged) {
      val e = exact(lang)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$lang: merged $a vs exact $e")
    }
  }

  test("CountMin heavy hitters: never under-count, over-count bounded by eps·N") {
    val exact = WordCount.wordCount(docs).limit(20).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = WordCount.tokens(docs).count()
    val est = Sketches.heavyHitters(docs, exact.keys.toSeq).toMap
    for ((w, ex) <- exact) {
      assert(est(w) >= ex, s"CMS under-counted $w: ${est(w)} < $ex")
      assert(est(w) <= ex + (Sketches.CmsEps * total).toLong + 1,
        s"CMS over-counted $w beyond eps*N: ${est(w)} vs $ex (N=$total)")
    }
    // two-phase shard merge estimates the same counts within the same bound
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSeq
    val sharded = Sketches.heavyHittersSharded(docs, "lang", langs, exact.keys.toSeq).toMap
    for ((w, ex) <- exact) {
      assert(sharded(w) >= ex && sharded(w) <= ex + (Sketches.CmsEps * total).toLong + 1,
        s"merged CMS out of bounds for $w: ${sharded(w)} vs $ex")
    }
  }

  test("approx percentiles within one neighbor of the exact rank selection") {
    val exact = TextAnalysis.lengthPercentiles(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val approx = Sketches.approxLengthPercentiles(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(approx.keySet == exact.keySet)
    for ((lang, (a50, a90, a99)) <- approx) {
      val (e50, e90, e99) = exact(lang)
      // tolerance: 5% of the value range per lang
      val spread = math.max(10L, (e99 - e50) / 5)
      assert(math.abs(a50 - e50) <= spread && math.abs(a90 - e90) <= spread &&
        math.abs(a99 - e99) <= spread, s"$lang: $approx vs $exact")
    }
  }
}
