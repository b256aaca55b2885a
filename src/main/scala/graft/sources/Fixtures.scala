package graft.sources

/** Scratch locations for driver-gated queries that must START from an
  * on-disk layout the parquet test tables don't provide (raw text files,
  * partitioned tables, bucketed tables). Each fixture is (re)written by
  * the query itself from the driver's own tables — so the oracle stays
  * expressible over the original parquet — and lives in the JVM temp
  * dir. Layouts are REUSED across runs when their `_SUCCESS` marker
  * exists: the dir key hashes the sf dir PLUS the source parquet's
  * (mtime, length), so regenerated test data invalidates stale fixtures
  * automatically. Writes are small (document/customer-sized, never
  * fact-scan-sized) and deterministic. */
object Fixtures {
  /** Fixture dir whose identity tracks the source table's file stamp —
    * reusable layouts derived from `table.parquet` invalidate
    * automatically when the test data regenerates. */
  def dirFor(kind: String, sfDir: String, table: String): String = {
    val f = new java.io.File(s"$sfDir/$table.parquet")
    val base = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    val ident = s"$sfDir|${f.lastModified}|${f.length}"
    s"$base/graft_fixture_${kind}_${graft.functions.Md5Hash.hex(ident).take(8)}"
  }

  /** True if `path` holds a completed write (reuse it instead of
    * rewriting). */
  def ready(path: String): Boolean = new java.io.File(s"$path/_SUCCESS").exists()

  /** Fail-loud precondition for fixtures whose on-disk layout is
    * line-oriented (raw text lines, non-multiLine CSV, JSON lines): a
    * document containing a line break would silently split into multiple
    * records and the gate's hash compare would chase a phantom reader
    * bug. One cheap action, paid only when a fixture is (re)written. */
  def requireLineSafe(docs: org.apache.spark.sql.DataFrame, what: String): Unit = {
    val bad = docs.where(org.apache.spark.sql.functions.col("text").rlike("[\\n\\r]")).count()
    require(bad == 0,
      s"$what fixture needs newline-free text; $bad documents contain \\n or \\r")
  }
}
