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
    // AQE partition coalescing sized by BYTES, not by core count
    // (guide §2.2 "fewer, larger reduce partitions"): the default
    // parallelismFirst=true pins every post-shuffle stage at
    // ~defaultParallelism partitions regardless of volume, so the
    // suite's many small-shuffle stages ran 32 near-empty tasks each
    // (measured: t39 10.2→2.2 s, p03 21.9→3.6 s, d17 14.1→5.5 s,
    // p13 13.5→3.0 s cold-sample A/B at sf0.1/local[32]; the
    // well-parallel gates p16/t32/e12/s18/e15 moved ±10% — noise).
    // Scale-adaptive by construction: a production-sized shuffle
    // (>> advisory bytes) still fans out to thousands of partitions,
    // exactly what Spark's own tuning guide recommends on busy
    // clusters.
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    .config("spark.sql.session.timeZone", "UTC")
    // Local FS WITHOUT the Hadoop checksum wrapper (guide §6 file-layout
    // overhead, same finding as TreeCopy): LocalFileSystem routes every
    // open/create/rename through ChecksumFileSystem — a .crc sidecar
    // read-verify/regenerate plus extra metadata calls PER FILE — which
    // taxes every write-commit rename, streaming offset/commit-log
    // entry, and state-store snapshot at milliseconds apiece. Parquet
    // carries its own page/footer CRCs, so the sidecar layer is
    // redundant for the engine's data; raw local FS is the same
    // FileSystem minus the wrapper. Scheme-scoped by construction: on a
    // production cluster data lives on hdfs://|s3://|abfs:// and this
    // binding never engages. Both bindings needed — FileSystem for
    // batch/parquet/manifests, AbstractFileSystem for the FileContext
    // the streaming checkpoint manager uses.
    .config("spark.hadoop.fs.file.impl",
      "org.apache.hadoop.fs.RawLocalFileSystem")
    .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
      "org.apache.hadoop.fs.local.RawLocalFs")
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
