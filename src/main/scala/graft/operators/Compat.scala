package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine exact-arithmetic helpers shared by the operator modules
  * (oracle discipline: SURVEY §4). */
private[graft] object Compat {

  /** Exact, order-independent sum of a double expression; emits DOUBLE. */
  def xsum(c: Column): Column =
    sum(c.cast(DecimalType(28, 10))).cast(DecimalType(28, 2)).cast(DoubleType)

  /** DuckDB text of [[xsum]]. ROUND is HALF_UP in DuckDB, matching Spark's
    * decimal down-cast; a plain decimal cast would truncate. */
  def osum(e: String): String =
    s"CAST(ROUND(SUM(CAST($e AS DECIMAL(28,10))), 2) AS DOUBLE)"

  /** Shared HyperLogLog register discipline — the cross-engine-exact
    * sketch construction of `q38_hll` (Relational.scala), reused by the
    * mergeable rolling-window variant `ev_rolling_hll` (Events.scala):
    * one md5 mix per row, 60-bit hash split into a [[P]]-bit register
    * index and a 52-bit field whose ρ = 53 − bitlength comes from
    * `bin()`+`length()` (identical in both engines); register sums are
    * EXACT scaled integers (Σ 2^(53−ρ_max) as BIGINT), so sketches are
    * order/partitioning-independent and hash-match DuckDB bit-for-bit. */
  object Hll {
    val P = 8
    val M: Int = 1 << P                        // 256 registers
    val W: Int = 60 - P                        // 52-bit rho field
    val Pow: Long = 1L << (W + 1)              // 2^53, the exact register scale
    /** α_m·m²·2^53 — the oracle evaluates the same literal expression
      * text, so both engines produce the identical IEEE double. */
    val C: Double =
      0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 9007199254740992.0
    /** DuckDB text of [[C]] (kept as the literal arithmetic, not a
      * pre-evaluated constant, so the two engines share the expression). */
    val CSql: String =
      "(0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 9007199254740992.0)"

    def hash(prefix: String, key: Column): Column =
      conv(substring(md5(concat(lit(prefix), key)), 1, 15), 16, 10).cast("long")
    def bucket(h: Column): Column = h.bitwiseAND(M - 1)
    def rho(h: Column): Column = {
      val rem = shiftright(h, P)
      when(rem === 0L, lit(W + 1).cast("long"))
        .otherwise(lit(W + 1).cast("long") - length(bin(rem)).cast("long"))
    }
    /** Exact scaled-integer term for a merged register column `mx`. */
    val TermSql: String = s"shiftleft(CAST(1 AS BIGINT), ${W + 1} - CAST(mx AS INT))"
    /** DuckDB twins of [[hash]]/[[rho]]/[[TermSql]]. */
    def oHash(prefix: String, key: String): String =
      s"('0x' || substr(md5('$prefix' || $key::VARCHAR), 1, 15))::BIGINT"
    def oRho(h: String): String =
      s"CASE WHEN ($h >> $P) = 0 THEN ${W + 1} ELSE ${W + 1} - length(bin($h >> $P)) END"
    val OTerm: String = s"(1::BIGINT << (${W + 1} - mx))::BIGINT"
  }
}
