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
}
