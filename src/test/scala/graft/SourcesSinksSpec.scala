package graft

import java.nio.file.Files

import graft.operators.WordCount
import graft.sinks.Sinks
import graft.sources.Sources
import org.apache.spark.sql.functions._

class SourcesSinksSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  test("chunked: concatenating a doc's chunks restores the text, chunk count is ceil(len/size)") {
    val size = 64
    val ch = Sources.chunked(docs, size)
    val restored = ch.groupBy("doc_id")
      .agg(concat_ws("", sort_array(collect_list(struct(col("chunk_no"), col("chunk"))))
        .getField("chunk")).as("rebuilt"),
        count(lit(1)).as("nc"))
    val joined = restored.join(docs.select(col("doc_id"), col("text")), "doc_id")
    assert(joined.where(col("rebuilt") =!= col("text")).count() == 0)
    assert(joined.where(col("nc") =!=
      ceil(length(col("text")).cast("double") / size).cast("long")).count() == 0)
  }

  test("chunked word count converges to direct word count for chunks larger than any doc") {
    val big = Sources.chunked(docs, 1 << 20).withColumnRenamed("chunk", "text")
    val direct = WordCount.wordCount(docs).collect().map(r => (r.getString(0), r.getLong(1)))
    val viaChunks = WordCount.wordCount(big).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(direct.toSeq == viaChunks.toSeq)
  }

  test("text file readers round-trip a corpus written to disk") {
    val dir = Files.createTempDirectory("graft-src").toString
    docs.limit(20).select(col("text"))
      .write.mode("overwrite").text(dir)
    val files = Sources.textFiles(spark, dir)
    assert(files.count() > 0)
    val lines = Sources.textLines(spark, dir)
    assert(lines.count() == 20) // one doc per line (no newlines in corpus)
  }

  test("Tables resolves Hadoop-style URIs, not just bare paths (object-store pass-through)") {
    // Every loader goes through spark.read.parquet(s"$dir/$name.parquet"),
    // which resolves via the Hadoop FileSystem API — so an object-store
    // deployment changes only the dir string (s3a://bucket/sf — same
    // resolution path as the file:// scheme exercised here), never the
    // Tables/Sources code. Pin that no local-path assumption creeps in.
    val uri = "file://" + sf
    assert(Tables.documents(spark, uri).count() == Tables.documents(spark, sf).count())
    assert(Tables.events(spark, uri).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("csv and jsonl readers round-trip the documents table with explicit schemas") {
    val sample = docs.limit(50).select("doc_id", "text", "lang")
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val expected = asSet(sample)
    val csvDir = Files.createTempDirectory("graft-csv").toString
    sample.write.mode("overwrite").option("header", "true").csv(csvDir)
    assert(asSet(Sources.csv(spark, csvDir, sample.schema)) == expected)
    val jsonDir = Files.createTempDirectory("graft-json").toString
    sample.write.mode("overwrite").json(jsonDir)
    assert(asSet(Sources.jsonl(spark, jsonDir, sample.schema)) == expected)
  }

  test("xml reader round-trips entity-laden and whitespace-edged text byte-exactly") {
    val sp = spark
    import sp.implicits._
    // the XML hazards the source gate exists for: &<>'" escaping and
    // surrounding whitespace (the reader trims unless told not to)
    val tricky = Seq(
      (1L, "en", "a & b < c > d 'quoted' \"double\""),
      (2L, "de", "  leading and trailing  "),
      (3L, "fr", "plain"))
      .toDF("doc_id", "lang", "text")
    val dir = Files.createTempDirectory("graft-xml").toString + "/x"
    tricky.write.option("rowTag", "doc").format("xml").save(dir)
    val back = spark.read.schema(tricky.schema).option("rowTag", "doc")
      .option("ignoreSurroundingSpaces", "false").format("xml").load(dir)
    val asSet = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(asSet(back) == asSet(tricky))
  }

  test("avro reader round-trips UTF-8 and nullable columns byte-exactly") {
    val sp = spark
    import sp.implicits._
    // the avro hazards the source gate exists for: the union-with-null
    // type mapping (a NULL lang must survive) and Avro's own UTF-8
    // string codec (multi-byte chars must round-trip)
    val tricky = Seq(
      (1L, "en", "plain ascii"),
      (2L, null.asInstanceOf[String], "null lang survives the union"),
      (3L, "ja", "日本語 ünïcødé 🎯"))
      .toDF("doc_id", "lang", "text")
    val dir = Files.createTempDirectory("graft-avro").toString + "/a"
    tricky.write.format("org.apache.spark.sql.avro.AvroFileFormat").save(dir)
    val back = spark.read.schema(tricky.schema)
      .format("org.apache.spark.sql.avro.AvroFileFormat").load(dir)
    val asSet = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(asSet(back) == asSet(tricky))
  }

  test("bucketed tables join with no shuffle exchange on either side") {
    val s = spark
    val whA = Files.createTempDirectory("graft-ba").toString
    val whB = Files.createTempDirectory("graft-bb").toString
    s.sql("DROP TABLE IF EXISTS b_orders")
    s.sql("DROP TABLE IF EXISTS b_customer")
    Sinks.writeBucketed(Tables.orders(s, sf), "b_orders", whA, "o_custkey", 4)
    Sinks.writeBucketed(Tables.customer(s, sf), "b_customer", whB, "c_custkey", 4)
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = s.table("b_orders")
        .join(s.table("b_customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val physical = j.queryExecution.executedPlan.toString
      // the co-located join itself must not shuffle; the only exchange
      // allowed is the one for the final small aggregation
      val joinPart = physical.split("HashAggregate").last
      assert(joinPart.contains("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"),
        s"bucketed join should have no exchange below the join:\n$physical")
      // and it returns the same result as the plain join
      val plain = Tables.orders(s, sf)
        .join(Tables.customer(s, sf), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(j.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
        plain.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("partitioned write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft-part").toString
    Sinks.writePartitioned(docs, dir, "lang")
    val scan = spark.read.parquet(dir).where(col("lang") === "en")
    val planStr = scan.queryExecution.executedPlan.toString
    assert(scan.count() == docs.where(col("lang") === "en").count())
    assert(planStr.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition filter in:\n$planStr")
  }

  test("zValue: bit interleave is monotone-rectangular (hand-checked Morton codes)") {
    val s = spark
    import s.implicits._
    val r = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (3, 3), (5, 9))
      .toDF("a", "b")
      .select(Sinks.zValue(col("a"), col("b")).as("z"))
      .as[Long].collect()
    // z(a,b): a bits at even positions, b at odd — 0,1,2,3; 4,8,15; z(5,9)=
    // a=0101 evens→1+16, b=1001 odds→2+128 = 147
    assert(r.toSeq == Seq(0L, 1L, 2L, 3L, 4L, 8L, 15L, 147L), r.toSeq.toString)
  }

  test("q37_zorder: z-layout scan materializes fewer rows than the linear layout for the same box") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case r: ReusedExchangeExec    => Seq(r.child)
        case _                        => p.children
      }
      p +: kids.flatMap(nodes)
    }
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      nodes(df.queryExecution.executedPlan)
        .collect { case f: FileSourceScanExec => f.metrics("numOutputRows").value }
        .sum
    }
    val box = col("l_partkey").between(Sinks.ZBoxP._1, Sinks.ZBoxP._2) &&
      col("l_suppkey").between(Sinks.ZBoxS._1, Sinks.ZBoxS._2)
    val zRows = scanRows(Sinks.lineitemZordered(spark, sf).where(box))
    val linRows = scanRows(Tables.lineitem(spark, sf).where(box))
    val total = Tables.lineitem(spark, sf).count()
    // the result itself is oracle-gated (q37_zorder); here we assert the
    // layout actually SKIPS: the z-scan must materialize well under the
    // linear scan's rows AND well under the full table
    assert(zRows < linRows, s"z=$zRows vs linear=$linRows (total=$total)")
    assert(zRows <= total * 3 / 4, s"z-layout skipped too little: $zRows of $total")
  }
}
