package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH bucket computation shared by interpreted eval
  * and generated code.
  *
  * The ±1 hyperplane sign matrices are CONSTANTS, derived once at class
  * load (md5 parity of "table:plane:dim" — the same public derivation the
  * DuckDB oracle unrolls as literal `±v[i]` sums), so the per-row work is
  * `Tables×Bits` signed component sums — zero hash calls per row. Fold
  * order is left-to-right over dims in IEEE double (multiplying by ±1.0
  * is exact), bit-identical to the oracle's unrolled expression.
  *
  * A vector shorter than [[Dim]] buckets to 0 in every table (the oracle's
  * `v[i]` past the end is NULL, nulling the whole sum → every bit 0).
  */
object LshImpl {
  val Dim = 64       // embedding model dimension (fixed per deployment)
  val Bits = 8       // default bits per hash table → 2^8 buckets
  /** Planes materialized for the corpus-density dial. Raised 16 → 24
    * (r12): the §5d 1000× tier showed bucket width growing with n once
    * the derived bits hit the old ceiling (~3.2 M vectors at the
    * 50-occupancy target); 24 bits holds the target occupancy to
    * ~800 M vectors. Plane constants are prefix-stable (bucket_b =
    * bucket_{b+k} mod 2^b), so every gate below the old ceiling is
    * byte-identical — only corpora big enough to derive >16 bits plan
    * differently, which is the point. Cost: the Signs constant grows to
    * 4×24×64 doubles — still trivially broadcast as part of codegen. */
  val MaxBits = 24
  val NumTables = 4  // OR-amplified tables

  private def planeSign(t: Int, j: Int, i: Int): Double =
    if (Md5Hash.prefix32(s"$t:$j:$i") % 2 == 0) 1.0 else -1.0

  /** Signs(t)(j)(i) — derived once, driver- and executor-side identical.
    * All [[MaxBits]] planes exist up front; a query using `bits` < MaxBits
    * reads a PREFIX of them, so raising the dial strictly REFINES the
    * bucket partition (bucket_b = bucket_{b+k} mod 2^b) — an index built
    * at a higher setting remains exactly coarsenable to a lower one. */
  val Signs: Array[Array[Array[Double]]] =
    Array.tabulate(NumTables, MaxBits, Dim)(planeSign)

  /** Bucket ids for all tables: out(t) has bit j set iff
    * dot(v, plane_tj) > 0. A NULL element anywhere in the first [[Dim]]
    * components zeroes EVERY bucket — mirroring the oracle, where a NULL
    * `v[i]` nulls each plane's whole sum and `sum > 0` is then false for
    * every bit (previously a null element silently read as 0.0 under
    * UnsafeArrayData, diverging from that semantics). */
  def buckets(arr: ArrayData): ArrayData = buckets(arr, Bits)

  /** `bits` is the corpus-density dial (SURVEY §5: bucket width ∝
    * n/2^bits — raise it as the corpus grows, raise NumTables to buy
    * recall back). 1 ≤ bits ≤ [[MaxBits]], enforced at expression
    * construction. */
  def buckets(arr: ArrayData, bits: Int): ArrayData = {
    val out = new Array[Long](NumTables)
    var hasNull = false
    if (arr.numElements() >= Dim) {
      var i = 0
      while (i < Dim && !hasNull) { hasNull = arr.isNullAt(i); i += 1 }
    }
    if (arr.numElements() >= Dim && !hasNull) {
      var t = 0
      while (t < NumTables) {
        var bucket = 0L
        var j = 0
        while (j < bits) {
          val s = Signs(t)(j)
          var sum = 0.0
          var i = 0
          while (i < Dim) {
            sum += arr.getFloat(i).toDouble * s(i)
            i += 1
          }
          if (sum > 0) bucket |= (1L << j)
          j += 1
        }
        out(t) = bucket
        t += 1
      }
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: `graft_lsh_buckets(embedding[, bits])` →
  * ARRAY<LONG> of per-table LSH bucket ids, computed in one pass per row.
  * The optional `bits` literal (default [[LshImpl.Bits]]) is the
  * corpus-density dial; buckets at b bits are the low-b-bit prefix of
  * buckets at any higher setting (same plane constants).
  *
  * Why an Expression: the declarative form is a ±element chain of
  * Dim×Bits×Tables = 2048 terms, which overflows Janino's method limit
  * and falls back to interpreted eval; `defineCodeGen` emits a single
  * static call, keeping the whole scan inside whole-stage codegen — at
  * 100 TB the index build runs map-only at scan speed. */
case class LshBuckets(child: Expression, bits: Int = LshImpl.Bits)
    extends UnaryExpression {
  require(bits >= 1 && bits <= LshImpl.MaxBits,
    s"graft_lsh_buckets bits must be in [1, ${LshImpl.MaxBits}], got $bits")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_lsh_buckets expects ARRAY<FLOAT>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    LshImpl.buckets(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LshImpl.buckets($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)

  override def prettyName: String = "graft_lsh_buckets"
}
