package graft

import graft.operators.Dedup
import graft.plans.GraftFunctions

class SimHashExprSpec extends SparkSpec {

  test("native SimHash32 expression equals the declarative pipeline on real docs") {
    val docs = Tables.documents(spark, sf)
    val pipe = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = Dedup.simhashNative(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pipe == native)
  }

  test("expression works through SQL after registration and codegen") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_simhash32('hello world hello') AS h").collect()(0).getLong(0)
    assert(r >= 0 && r <= 0xFFFFFFFFL)
    // null flows through as null
    val n = spark.sql("SELECT graft_simhash32(CAST(NULL AS STRING)) AS h").collect()(0)
    assert(n.isNullAt(0))
  }

  test("tokenization matches the reference splitter (ASCII letters only)") {
    GraftFunctions.register(spark)
    val a = spark.sql("SELECT graft_simhash32('foo1bar') AS h").collect()(0).getLong(0)
    val b = spark.sql("SELECT graft_simhash32('foo bar') AS h").collect()(0).getLong(0)
    assert(a == b) // digits split words exactly like spaces
  }
}
