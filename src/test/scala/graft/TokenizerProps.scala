package graft

import scala.jdk.CollectionConverters._

import graft.functions.SimHashImpl
import graft.operators.WordCount
import org.scalacheck.{Gen, Prop, Properties}

/** Property: the native expression's single-pass code-point tokenizer is
  * EXACTLY the `[^\p{L}]+` regex tokenizer, over arbitrary mixes of
  * ASCII, accented, Greek, CJK, supplementary-plane letters, digits,
  * punctuation, and whitespace — the drift guard between
  * `graft_simhash32` and every TokenRe-based operator. */
object TokenizerProps extends Properties("tokenizer") {

  private val atom: Gen[String] = Gen.oneOf(
    Gen.alphaStr,
    Gen.oneOf(" ", "\t", "\n", "1", "42", "!", ".", "-", "_"),
    Gen.oneOf("é", "ö", "ß", "Ψυχή", "héllo", "字符串", "𝒜"))

  private val genText: Gen[String] = Gen.listOf(atom).map(_.mkString)

  property("native tokenCounts == TokenRe split multiset") =
    Prop.forAll(genText) { s =>
      val expected = s.split(WordCount.TokenRe).filter(_.nonEmpty)
        .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val actual = SimHashImpl.tokenCounts(s).asScala.toMap
        .map { case (k, v) => k -> v.longValue() }
      actual == expected
    }
}
