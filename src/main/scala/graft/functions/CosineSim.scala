package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Cosine similarity over two double arrays, single pass, shared by
  * interpreted eval and generated code. Accumulation order is ascending
  * index — the same left-to-right fold as the declarative
  * `aggregate(zip_with(...))` form it replaces, so values agree to the
  * ulp and downstream rank/threshold comparisons are unchanged. */
object CosineImpl {
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    // fail LOUDLY on ragged or null-holding vectors, matching the strict
    // behavior of the declarative form / DuckDB list_cosine_similarity —
    // a silently truncated cosine is a cross-engine divergence waiting
    // to ship
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_cosine: length mismatch ($n vs ${b.numElements()})")
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"graft_cosine: null element at $i")
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // zero-norm (or empty) input would yield 0/0 = NaN, and Spark orders
    // NaN GREATEST — a degenerate vector would silently rank first in
    // every cosine-DESC top-k. Same fail-loud contract as ragged/null:
    // a zero embedding is upstream corruption, not a similarity of NaN.
    if (na == 0.0 || nb == 0.0)
      throw new IllegalArgumentException(
        s"graft_cosine: zero-norm vector (n=$n, |a|²=$na, |b|²=$nb)")
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Native Catalyst expression: `graft_cosine(a, b)` → DOUBLE.
  *
  * Why an Expression: the `aggregate`/`zip_with` higher-order form is
  * interpreted (HOFs don't participate in codegen) and allocates a
  * lambda frame per element; this is one static call inside whole-stage
  * codegen — the difference is ~10× on the ANN hot loops, where cosine
  * runs once per (query, candidate) pair. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_cosine expects (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineImpl.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineImpl.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}
