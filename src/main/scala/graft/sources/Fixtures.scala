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
  def dir(kind: String, sfDir: String): String = key(kind, sfDir)

  /** Fixture dir whose identity also tracks the source table's file
    * stamp — use for reusable layouts derived from `table.parquet`. */
  def dirFor(kind: String, sfDir: String, table: String): String = {
    val f = new java.io.File(s"$sfDir/$table.parquet")
    key(kind, s"$sfDir|${f.lastModified}|${f.length}")
  }

  /** True if `path` holds a completed write (reuse it instead of
    * rewriting). */
  def ready(path: String): Boolean = new java.io.File(s"$path/_SUCCESS").exists()

  private def key(kind: String, ident: String): String = {
    val base = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    s"$base/graft_fixture_${kind}_${graft.functions.Md5Hash.hex(ident).take(8)}"
  }
}
