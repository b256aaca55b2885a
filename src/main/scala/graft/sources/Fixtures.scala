package graft.sources

/** Scratch locations for driver-gated queries that must START from an
  * on-disk layout the parquet test tables don't provide (raw text files,
  * partitioned tables). Each fixture is (re)written by the query itself
  * from the driver's own tables — so the oracle stays expressible over
  * the original parquet — and lives in the JVM temp dir, keyed by the sf
  * dir so concurrent sf runs never collide. Fixture writes are small
  * (document/customer-sized, never fact-sized) and deterministic. */
object Fixtures {
  def dir(kind: String, sfDir: String): String = {
    val key = graft.functions.Md5Hash.hex(sfDir).take(8)
    val base = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    s"$base/graft_fixture_${kind}_$key"
  }
}
