package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (like [[Explain]]): materialize an N× scale-up of a test sf
  * dir for scale-stress runs, preserving each copy's INTERNAL structure
  * exactly while decorrelating copies from each other — so operator cost
  * scales the way a genuinely larger corpus would, not the quadratic way
  * naive replication would (10 identical copies of every document would
  * multiply every near-dup cluster by 10 and candidate pairs by ~100).
  *
  *  - documents: copy i appends a copy-specific salt to EVERY word.
  *    w → w·salt is injective on words, so shingle SETS transform
  *    bijectively: within-copy Jaccard/MinHash/SimHash structure is
  *    IDENTICAL to the original; across copies shingle sets are
  *    disjoint. n_chars is recomputed to stay consistent.
  *  - embeddings: copy i flips the sign of component j iff
  *    xxhash64(j,i) is odd. A diagonal ±1 matrix is an isometry —
  *    within-copy inner products (hence cosines, LSH buckets' relative
  *    geometry) are exactly preserved; across copies the patterns are
  *    pseudo-random, so cosines collapse toward 0.
  *  - lineitem/orders: order keys shift by copy·OFFSET on both sides,
  *    preserving the join fan-out per key.
  *
  * Usage: runMain graft.ScaleUp <srcSfDir> <dstDir> <copies>
  */
object ScaleUp {

  val IdOffset = 100000000L

  /** Intrinsic dimensionality of the `manifold` fixture. */
  val ManifoldDim = 4

  def main(args: Array[String]): Unit = {
    val (src, dst, copiesStr) = (args(0), args(1), args(2))
    val copies = copiesStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // NAVIGABLE fixture (r15, VERDICT r14 #2): `... <copies> manifold`
    // replaces the embeddings with srcCount·copies vectors drawn from a
    // LOW-INTRINSIC-DIMENSION subspace — u ∈ [-1,1]^ManifoldDim
    // hash-uniform per vector, embedded through a fixed hash-derived
    // 64×ManifoldDim map. Low intrinsic dimension is what makes greedy
    // graph routing work (the navigable-small-world regime HNSW's
    // log-n sizing assumes); the default sign-flip ladder corpus is the
    // deliberately ADVERSARIAL opposite (orthogonal isometric islands),
    // so the beam calibration needs BOTH geometries to demonstrate it
    // lands at the floor where the floor suffices and reproduces ~√n
    // only where the geometry demands it. All other tables copy through
    // (the ann keys read only embeddings; Dials.init needs lineitem).
    if (args.length > 3 && args(3) == "manifold") {
      import org.apache.spark.sql.functions.{array, element_at, xxhash64}
      val baseN = spark.read.parquet(s"$src/embeddings.parquet").count()
      val n = baseN * copies
      val proj: Array[Array[Double]] = Array.tabulate(64, ManifoldDim)((j, t) =>
        (graft.functions.Md5Hash.prefix32(s"mani:$j:$t") % 2001 - 1000) / 1000.0)
      val withU = spark.range(n).select(col("id").as("vec_id"),
        array((0 until ManifoldDim).map(t =>
          (pmod(xxhash64(col("id"), lit(t)), lit(2001L)) - 1000L)
            .cast("double") / 1000.0): _*).as("u"))
      withU.select(col("vec_id"),
          array((0 until 64).map(j =>
            (0 until ManifoldDim).map(t =>
              element_at(col("u"), t + 1) * lit(proj(j)(t))).reduce(_ + _)
              .cast("float")): _*).as("embedding"),
          lit(0).as("label"))
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/embeddings.parquet")
      println(s"[scaleup] embeddings (manifold dim $ManifoldDim): $baseN -> " +
        spark.read.parquet(s"$dst/embeddings.parquet").count())
      for (t <- Seq("documents", "lineitem", "orders", "region", "nation",
                    "customer", "supplier", "part", "events")) {
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
      }
      spark.stop()
      return
    }

    def replicate(name: String)(xform: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val out = (0 until copies).map(i => xform(base, i)).reduce(_ unionAll _)
      out.write.mode(SaveMode.Overwrite).parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name: ${base.count()} -> ${spark.read.parquet(s"$dst/$name.parquet").count()}")
    }

    replicate("documents") { (df, i) =>
      // LETTERS-ONLY salt (r12): the first cut salted with s"x$i" —
      // but the digit characters are TOKEN SEPARATORS to the dedup
      // family's letters-only tokenizer ([^\p{L}]+), so every copy
      // i ≥ 1 tokenized "wordx$i" to the same "wordx": copies 1..N-1
      // were token-IDENTICAL, every LSH band bucket held N-1 docs, and
      // candidate pairs went QUADRATIC in copies (measured: 2.7G
      // band-0 pairs at ×1000, 4 573 buckets of 999 — the r11 "disk
      // wall" was this artifact, not the operator). Digits map to
      // letters (0→a … 9→j) so the salt survives EVERY tokenizer and
      // copies stay pairwise shingle-disjoint as intended.
      val letterSalt = "x" + i.toString.map(c => ('a' + (c - '0')).toChar)
      val salted =
        if (i == 0) df.withColumn("text", col("text"))
        else df.withColumn("text",
          // drop empty tokens (consecutive/leading/trailing spaces) so a
          // salted copy never materializes bare salt words — keeps the
          // within-copy token counts and n-grams IDENTICAL to copy 0
          array_join(transform(filter(split(col("text"), " "), w => w =!= ""),
            w => concat(w, lit(letterSalt))), " "))
      salted
        .withColumn("doc_id", col("doc_id") + lit(i * IdOffset))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }

    replicate("embeddings") { (df, i) =>
      val flipped =
        if (i == 0) df
        else df.withColumn("embedding",
          transform(col("embedding"),
            (x, j) => x * (lit(1.0f) - lit(2.0f) * pmod(xxhash64(j, lit(i)), lit(2)).cast("float"))))
      flipped.withColumn("vec_id", col("vec_id") + lit(i * IdOffset))
    }

    replicate("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * IdOffset))
    }
    replicate("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * IdOffset))
    }
    // dims pass through unchanged (queries under scale-stress broadcast
    // them or don't read them)
    for (t <- Seq("region", "nation", "customer", "supplier", "part")) {
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
    }
    // events: copy i shifts user_id and event_id — each copy is a
    // disjoint user population with identical per-user timelines, so
    // user-keyed operator cost (sessions, transitions, anomalies, SCD2)
    // scales linearly with copies, exactly like a larger event lake.
    // Read through Tables.events (nanos→µs conversion); the scaled table
    // stores a native µs timestamp, which Tables.events passes through.
    val ev = Tables.events(spark, src)
    (0 until copies).map { i =>
      ev.withColumn("user_id", col("user_id") + lit(i * IdOffset))
        .withColumn("event_id", col("event_id") + lit(i * IdOffset))
    }.reduce(_ unionAll _)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/events.parquet")
    println(s"[scaleup] events: ${ev.count()} -> " +
      spark.read.parquet(s"$dst/events.parquet").count())
    spark.stop()
  }
}
