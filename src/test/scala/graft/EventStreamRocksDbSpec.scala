package graft

import org.apache.spark.sql.SparkSession

/** The ENTIRE streaming-twin suite re-run under the RocksDB state store
  * provider with changelog checkpointing — the store configuration a
  * 100 TB streaming deployment runs (state spills off-heap/disk instead
  * of living on the JVM heap), and the operational mitigation for
  * `funnelFlags`' by-design unbounded keyed state. Inherits every
  * EventStreamSpec test (replay convergence, shuffled-batch replays,
  * sentinel-driven timeouts, sink round-trips); only the session's state
  * store provider differs, so a green run proves the twins'
  * convergence guarantees are provider-independent.
  */
class EventStreamRocksDbSpec extends EventStreamSpec {
  override def spark: SparkSession = EventStreamRocksDbSpec.session
}

object EventStreamRocksDbSpec {
  /** Isolated child session: state-store confs are per-query, read from
    * the session conf at query start, so a `newSession()` (own conf +
    * temp-view namespace, shared SparkContext) scopes RocksDB to this
    * suite without touching the other suites' queries. */
  lazy val session: SparkSession = {
    val s = SparkSpec.spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    graft.plans.GraftFunctions.register(s)
    s
  }
}
