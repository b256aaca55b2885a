package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def em = Tables.embeddings(spark, sf)

  test("bruteforce: TopK neighbors per query, no self-matches, ranks 1..k") {
    val bf = Similarity.bruteForce(em)
    val perQuery = bf.groupBy("query_id").count().select("count").distinct().collect()
    assert(perQuery.map(_.getLong(0)).toSet == Set(Similarity.TopK.toLong))
    assert(bf.where(col("query_id") === col("neighbor_id")).count() == 0)
    val ranks = bf.select("rank").distinct().collect().map(_.getLong(0)).toSet
    assert(ranks == (1 to Similarity.TopK).map(_.toLong).toSet)
  }

  test("cosine of a vector with itself is 1") {
    val s = spark
    import s.implicits._
    val d = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val c = d.select(Similarity.cosine(
      transform(col("a"), x => x.cast("double")),
      transform(col("b"), x => x.cast("double"))).as("c")).collect()(0).getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("lsh buckets: every vec in every table, buckets within 2^LshBits") {
    val b = Similarity.lshBuckets(em)
    assert(b.count() == em.count() * Similarity.LshTables)
    assert(b.select("tbl").distinct().count() == Similarity.LshTables)
    val bad = b.where(col("bucket") < 0 || col("bucket") >= (1L << Similarity.LshBits)).count()
    assert(bad == 0)
  }

  test("dedup_embed: ordered distinct pairs, all above the cosine threshold") {
    val dups = Similarity.embedDup(em)
    assert(dups.where(col("vec_a") >= col("vec_b")).count() == 0)
    assert(dups.groupBy("vec_a", "vec_b").count().where(col("count") > 1).count() == 0)
    // re-verify the threshold by recomputing cosine for returned pairs
    val va = em.select(col("vec_id").as("vec_a"),
      transform(col("embedding"), x => x.cast("double")).as("av"))
    val vb = em.select(col("vec_id").as("vec_b"),
      transform(col("embedding"), x => x.cast("double")).as("bv"))
    val below = dups.join(va, "vec_a").join(vb, "vec_b")
      .where(Similarity.cosine(col("av"), col("bv")) < Similarity.DupCosine)
    assert(below.count() == 0)
  }

  test("ivf topk: unique ranks within TopK, no self-matches") {
    val ivf = Similarity.ivfTopK(em)
    assert(ivf.where(col("query_id") === col("neighbor_id")).count() == 0)
    assert(ivf.where(col("rank") > Similarity.TopK).count() == 0)
    assert(ivf.groupBy("query_id", "rank").count().where(col("count") > 1).count() == 0)
  }

  test("lsh topk is a subset of brute-force candidate space (same bucket ⇒ ranked subset)") {
    val topk = Similarity.lshTopK(em)
    // each (query, rank) unique and rank <= TopK
    assert(topk.where(col("rank") > Similarity.TopK).count() == 0)
    assert(topk.groupBy("query_id", "rank").count().where(col("count") > 1).count() == 0)
  }
}
