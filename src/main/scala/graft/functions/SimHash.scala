package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass SimHash implementation shared by interpreted eval and
  * generated code. Algorithm identical to the declarative pipeline in
  * [[graft.operators.Dedup.simhash]] (and therefore to its DuckDB
  * oracle): tokenize on non-letters, count terms, H = first 8 md5 hex
  * digits of "sh:word" as uint32, bit b gets +count/−count, sign → bit. */
object SimHashImpl {
  val Bits = 32

  def h32(word: String): Long = Md5Hash.prefix32("sh:" + word)

  /** Tokenize + count in one pass: Unicode-letter runs by code point —
    * must match WordCount.TokenRe ("[^\p{L}]+"): Character.isLetter(int)
    * is exactly category L. Kept separately callable so the equivalence
    * with the regex tokenizer is property-tested (TokenizerProps). */
  def tokenCounts(s: String): java.util.HashMap[String, Long] = {
    val counts = new java.util.HashMap[String, Long]()
    var i = 0
    val n = s.length
    val sb = new java.lang.StringBuilder
    while (i < n) {
      val cp = s.codePointAt(i)
      if (Character.isLetter(cp)) sb.appendCodePoint(cp)
      else if (sb.length > 0) {
        counts.merge(sb.toString, 1L, (a, b) => a + b); sb.setLength(0)
      }
      i += Character.charCount(cp)
    }
    if (sb.length > 0) counts.merge(sb.toString, 1L, (a, b) => a + b)
    counts
  }

  def simhash32(text: UTF8String): Long = {
    if (text == null) return 0L
    val counts = tokenCounts(text.toString)
    val acc = new Array[Long](Bits)
    counts.forEach { (w, c) =>
      val h = h32(w)
      var b = 0
      while (b < Bits) {
        if (((h >> b) & 1L) == 1L) acc(b) += c else acc(b) -= c
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < Bits) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** Native Catalyst expression: `graft_simhash32(text)` → 32-bit SimHash
  * as LONG, computed in one pass per row.
  *
  * Why an Expression and not the declarative pipeline: the functions-only
  * version explodes every (doc, term) into 32 bit-rows — a 32× row blowup
  * through two aggregations. This expression keeps the whole computation
  * inside whole-stage codegen (`defineCodeGen` emits a static call), so at
  * 100 TB the simhash is map-only at scan speed. The declarative pipeline
  * remains as the cross-engine oracle-checked reference.
  */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.simhash32($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash32"
}
