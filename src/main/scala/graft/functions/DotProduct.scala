package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Inner product of two double arrays, single pass, ascending-index
  * accumulation — the same left-to-right fold DuckDB's
  * `list_inner_product` runs, so when both sides consume the same
  * doubles the SCORES are bit-identical, not merely order-equivalent.
  *
  * Why it exists (r10, closing the ADVICE ulp-risk item on the MIPS
  * gates): `mipsTopK`/`mipsIvfWith` used to rank candidates by
  * AUGMENTED cosine, whose division by the per-vector recomputed
  * |x_aug| differs from the constant M by a few ulps per neighbor —
  * monotone-equivalent to the oracle's raw inner product only in exact
  * arithmetic, so near-tie scores could rank differently
  * data-dependently. Ranking by the augmented DOT instead removes the
  * division entirely: the query's augmented slot is 0.0, so
  * q_aug·x_aug accumulates exactly the 64 raw products q_i·x_i plus a
  * trailing +0.0 (an identity on every non-NaN double) — bit-equal to
  * the oracle's raw `list_inner_product`, same tie-break column, zero
  * FP divergence surface. Per-query |q| scaling never affected the
  * per-query ranking; now nothing per-neighbor does either. */
object DotImpl {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    // fail LOUDLY on ragged or null-holding vectors — the graft_cosine
    // contract: a silently truncated score is a cross-engine divergence
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_dot: length mismatch ($n vs ${b.numElements()})")
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"graft_dot: null element at $i")
      dot += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    dot
  }
}

/** Native Catalyst expression: `graft_dot(a, b)` → DOUBLE. Same
  * rationale as [[CosineSim]]: one static call inside whole-stage
  * codegen on the per-(query, candidate) hot loop, where the
  * interpreted `aggregate`/`zip_with` higher-order form measured 2.8×
  * slower (§5c-r9, ann_mips_ivf 22.0 → 7.9 s). */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_dot expects (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotImpl.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}
