package graft

import graft.model._

class ModelSpec extends SparkSpec {

  test("typed loaders round-trip every table with full row counts") {
    val docs = Tables.documentsDs(spark, sf)
    assert(docs.count() == Tables.documents(spark, sf).count())
    assert(docs.filter(_.n_chars > 0).count() == docs.count())
    val em = Tables.embeddingsDs(spark, sf)
    assert(em.filter(_.embedding.length == 64).count() == em.count())
    val ev = Tables.eventsDs(spark, sf)
    assert(ev.count() == Tables.events(spark, sf).count())
  }

  test("typed groupByKey agrees with the untyped groupBy") {
    val s = spark
    import s.implicits._
    val typed = Tables.documentsDs(spark, sf)
      .groupByKey(_.lang).count().collect().toMap
    val untyped = Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typed == untyped)
  }
}
