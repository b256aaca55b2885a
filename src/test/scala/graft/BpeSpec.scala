package graft

import graft.functions.BpeImpl
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  private def id(p: String): Int = BpeImpl.Vocab.indexOf(p) + 1

  test("encode is greedy longest-match, not char-by-char") {
    assert(id("the") > 0 && id("scan") > 0 && id("ing") > 0)
    assert(BpeImpl.encode("the").toSeq == Seq(id("the")))
    // "scanning" = scan + n + ing (no 4/3/2-piece covers "ni...")
    assert(BpeImpl.encode("scanning").toSeq == Seq(id("scan"), id("n"), id("ing")))
    // longest wins over a shorter prefix piece: "th" exists but "the" is taken
    assert(BpeImpl.encode("the").toSeq != Seq(id("th"), id("e")))
  }

  test("encode handles UNK, empty input, and non-BMP code points") {
    assert(BpeImpl.encode("").isEmpty)
    assert(BpeImpl.encode("a~b").toSeq == Seq(id("a"), BpeImpl.UnkId, id("b")))
    // one UNK per CODE POINT (a surrogate pair is one token, not two) —
    // the code-point discipline that keeps the Java loop aligned with
    // DuckDB's substr/length arithmetic
    assert(BpeImpl.encode("a😀b").toSeq ==
      Seq(id("a"), BpeImpl.UnkId, id("b")))
  }

  test("every vocab piece round-trips to exactly itself") {
    for (p <- BpeImpl.Vocab)
      assert(BpeImpl.encode(p).toSeq == Seq(id(p)), s"piece $p")
  }

  test("graft_bpe_ids expression matches BpeImpl.encode (codegen path)") {
    val s = spark
    import s.implicits._
    graft.plans.GraftFunctions.register(s)
    val words = Seq("the", "scanning", "a~b", "x", "tablesort", "whichever")
    val got = words.toDF("w")
      .selectExpr("w", "graft_bpe_ids(w) AS ids")
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    for (w <- words)
      assert(got(w) == BpeImpl.encode(w).toSeq, s"word $w")
  }

  test("bpeTokens over the corpus: clean a-z text has zero UNKs, subwords >= words") {
    val out = TextAnalysis.bpeTokens(Tables.documents(spark, sf))
    assert(out.count() > 0)
    assert(out.where(col("n_unk") =!= 0).count() == 0)
    assert(out.where(col("n_subwords") < col("n_words")).count() == 0)
    assert(out.where(col("checksum") <= 0).count() == 0)
  }
}
