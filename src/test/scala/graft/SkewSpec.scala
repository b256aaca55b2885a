package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedJoinHot: targeted salting is invisible in the result (hot, cold, and missing keys)") {
    val s = spark
    import s.implicits._
    // key 7 is hot (60% of rows), key 99 has no dim row (drops out),
    // keys 1-5 are cold
    val fact = ((1L to 60L).map(i => (7L, i)) ++
      (1L to 30L).map(i => (i % 5 + 1, i)) ++
      Seq((99L, 1L))).toDF("k", "v")
    val dim = (1L to 10L).map(i => (i, s"attr$i")).toDF("dk", "attr")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "attr").collect().map(_.toString).sorted.toSeq
    val plain = canon(fact.join(dim, col("k") === col("dk")))
    val salted = canon(Skew.saltedJoinHot(fact, dim, "k", "dk",
      hash(col("k"), col("v")), hotKeys = Seq(7L), salts = 4))
    assert(salted == plain)
    assert(plain.size == 90) // 60 hot + 30 cold; key 99 dropped
  }
}
