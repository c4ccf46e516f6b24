package graft

import org.apache.spark.sql.SparkSession

/** The one local SparkSession builder behind the driver-facing mains
  * ([[Bench]], [[Verify]]) — a shared helper so the engines they
  * measure and gate can never drift apart config-by-config.
  */
object LocalSession {

  def build(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    // many short queries in one long-lived session: materialized
    // indexes (localCheckpoint blocks) are only reclaimed by the
    // ContextCleaner after a driver GC, and a large heap may not GC
    // for the whole run — periodic GC keeps the block manager from
    // accumulating dead checkpoints (measured 3.6x on a late-running
    // dedup query without it); 120s keeps the full-GC pauses rare
    // enough not to tax the long-running queries themselves
    .config("spark.cleaner.periodicGC.interval", "120s")
    // transformWithState (s08) requires the RocksDB provider; every
    // other stateful operator is provider-agnostic, so set it globally
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
