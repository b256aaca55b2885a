package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY §2.4):
  * brute-force cosine top-k as the correctness baseline, and
  * random-hyperplane LSH bucketing as the scale path.
  *
  * Determinism across engines: outputs carry (query_id, rank, neighbor_id)
  * but NO floating-point scores — each engine orders by its own cosine
  * (gaps between distinct random vectors are ~1e-3, far above the ~1e-15
  * cross-engine FP divergence; exact-duplicate vectors tie exactly and
  * fall back to the vec_id tie-break), so the integer output is stable
  * while the float stays internal.
  *
  * Scale design (100 TB):
  *  - the query side is tiny and broadcast: brute force is one pass over
  *    the corpus per partition (a broadcast nested-loop join), with the
  *    top-k cut by a per-query window — no shuffle of the corpus;
  *  - LSH replaces the full scan with a bucket-equijoin: corpus shuffles
  *    once on bucket id, candidates are only same-bucket rows;
  *  - at 1000 executors the brute-force cosine is embarrassingly parallel
  *    and the window's shuffle carries only (query × corpus-partition)
  *    partial top-k rows once AQE kicks in.
  */
object Similarity {

  val TopK = 5
  val QueryStride = 50   // vec_id % stride == 0 ⇒ query vector
  val LshBits = 6        // 64 buckets

  /** Embedding as array<double> — keeps both engines in IEEE double. */
  private def vec(c: Column): Column = transform(c, x => x.cast("double"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), _ + _)

  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), _ + _))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def queriesDf(em: DataFrame): DataFrame =
    em.where(col("vec_id") % QueryStride === 0)
      .select(col("vec_id").as("query_id"), vec(col("embedding")).as("qv"))

  /** Brute-force cosine top-k: every query against the whole corpus. */
  def bruteForce(em: DataFrame): DataFrame = {
    val corpus = em.select(col("vec_id").as("neighbor_id"), vec(col("embedding")).as("nv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(queriesDf(em))
      .join(corpus, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("nv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= TopK)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** Deterministic ±1 hyperplane component for (plane j, dim i):
    * sign of bit 0 of H(j, i). */
  private def planeSign(j: Column, i: Column): Column =
    when(Dedup.h32(j, i.cast("string")) % 2 === 0, lit(1.0)).otherwise(lit(-1.0))

  /** LSH bucket id of a (double-cast) vector: bit j = [dot(v, plane_j) > 0]. */
  private def bucketOf(v: Column): Column = {
    val bits = (0 until LshBits).map { j =>
      // dot with ±1 plane = signed sum of components, left-to-right
      val signed = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * planeSign(lit(j), i)),
        lit(0.0), _ + _)
      when(signed > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Bucket assignment for the whole corpus — the LSH index itself. */
  def lshBuckets(em: DataFrame): DataFrame =
    em.select(col("vec_id"), bucketOf(vec(col("embedding"))).as("bucket"))
      .orderBy("vec_id")

  /** ANN via LSH: top-k among same-bucket candidates only. */
  def lshTopK(em: DataFrame): DataFrame = {
    val b = lshBuckets(em)
    val corpus = em.select(col("vec_id").as("neighbor_id"), vec(col("embedding")).as("nv"))
      .join(b.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
    val qs = queriesDf(em)
      .join(b.withColumnRenamed("vec_id", "query_id"), "query_id")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    qs.join(corpus, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("nv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= TopK)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map(
    "ann_bruteforce" -> ((s, d) => bruteForce(Tables.embeddings(s, d))),
    "ann_lsh"        -> ((s, d) => lshBuckets(Tables.embeddings(s, d))),
    "ann_lsh_topk"   -> ((s, d) => lshTopK(Tables.embeddings(s, d))),
  )

  // ---- DuckDB oracles ----

  private val V = "embedding::DOUBLE[]"

  private def oh32(seed: String, s: String): String =
    s"('0x' || substr(md5($seed || ':' || $s), 1, 8))::BIGINT"

  // bucket via per-plane signed sums; mirrors bucketOf
  private val bucketSql: String = {
    val bits = (0 until LshBits).map { j =>
      val sign = s"CASE WHEN ${oh32(s"'$j'", "(i - 1)::VARCHAR")} % 2 = 0 THEN 1.0 ELSE -1.0 END"
      s"""(CASE WHEN (SELECT sum(v[i] * $sign)
         |       FROM (SELECT unnest(range(1, len(v) + 1)) AS i) ix) > 0
         |  THEN ${1L << j} ELSE 0 END)""".stripMargin
    }
    bits.mkString(" + ")
  }

  val oracle: Map[String, String] = Map(
    "ann_bruteforce" ->
      s"""SELECT query_id, rank, neighbor_id FROM (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY list_cosine_similarity(q.$V, n.$V) DESC, n.vec_id) AS rank
         |  FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
         |  WHERE q.vec_id % $QueryStride = 0) t
         |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin,
    "ann_lsh" ->
      s"""SELECT vec_id, CAST($bucketSql AS BIGINT) AS bucket
         |FROM (SELECT vec_id, $V AS v FROM embeddings) e
         |ORDER BY vec_id""".stripMargin,
    "ann_lsh_topk" ->
      s"""WITH bk AS (
         |  SELECT vec_id, CAST($bucketSql AS BIGINT) AS bucket
         |  FROM (SELECT vec_id, $V AS v FROM embeddings) e)
         |SELECT query_id, rank, neighbor_id FROM (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY list_cosine_similarity(q.$V, n.$V) DESC, n.vec_id) AS rank
         |  FROM embeddings q
         |  JOIN bk qb ON qb.vec_id = q.vec_id
         |  JOIN bk nb ON nb.bucket = qb.bucket
         |  JOIN embeddings n ON n.vec_id = nb.vec_id AND n.vec_id <> q.vec_id
         |  WHERE q.vec_id % $QueryStride = 0) t
         |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin,
  )
}
