package graft.functions

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Packed-shard output stage (`Curation.writeShards` /
  * `shardManifest`). The p04 gate pins the manifest arithmetic against
  * DuckDB; here we pin the on-disk layout, the files==manifest
  * round-trip, rerun stability, and partition pruning on a
  * shard-targeted read.
  */
class ShardWriteSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    ("en", 1L, 800L), ("en", 2L, 900L), ("en", 3L, 700L),
    ("en", 4L, 600L), ("de", 10L, 1500L), ("de", 11L, 900L),
    ("fr", 20L, 100L)
  ).toDF("lang", "doc_id", "n_toks")

  test("layout, manifest parity, and rerun stability") {
    val path = Files.createTempDirectory("graft_shards").toString
    val m1 = Curation.writeShards(corpus, "lang", "doc_id", "n_toks",
      budget = 2000L, path = path).orderBy("stratum", "bin").collect()
    // en: cum 800,1700,2400,3000 -> bins 0,0,0(1700-700?)... bin uses
    // (cum - toks)/budget: 0,800,1700,2400 -> 0,0,0,1
    assert(m1.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq(("de", 0L, 2L), ("en", 0L, 3L), ("en", 1L, 1L), ("fr", 0L, 1L)))
    // Hive directory layout
    assert(Files.isDirectory(Paths.get(path, "stratum=en", "bin=0")))
    assert(Files.isDirectory(Paths.get(path, "stratum=en", "bin=1")))
    // files round-trip: every (stratum, bin) group matches its
    // manifest row
    val back = spark.read.parquet(path)
      .groupBy(col("stratum"), col("bin").cast("long").as("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .orderBy("stratum", "bin").collect()
    assert(back.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
      == m1.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq)
    // rerun overwrites to the identical state
    val m2 = Curation.writeShards(corpus, "lang", "doc_id", "n_toks",
      budget = 2000L, path = path).orderBy("stratum", "bin").collect()
    assert(m1.toSeq == m2.toSeq)
  }

  test("shard-targeted read prunes partitions") {
    val path = Files.createTempDirectory("graft_shards_prune").toString
    Curation.writeShards(corpus, "lang", "doc_id", "n_toks",
      budget = 2000L, path = path).collect()
    val one = spark.read.parquet(path)
      .filter(col("stratum") === "en" && col("bin") === 1)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("stratum") || plan.contains("isnotnull")),
      s"no partition pruning in:\n$plan")
    assert(one.select("doc_id").as[Long].collect().toSeq == Seq(4L))
  }

  test("readShards: bin-range load reads ONLY the requested directories " +
      "(metric-level, on the epoch layout)") {
    val path = Files.createTempDirectory("graft_shards_read").toString + "/t"
    // appendShards layout (stratum/bin/epoch) — the harder case; the
    // reader must also drop the epoch column
    Curation.appendShards(corpus, "lang", "doc_id", "n_toks",
      budget = 2000L, path = path, epoch = 0L)
    val out = Curation.readShards(spark, path, "en", binFrom = 0L, binTo = 0L)
    val rows = out.collect()
    assert(!out.columns.contains("epoch"))
    assert(rows.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 2L, 3L),
      "bin-0 content mismatch")
    // metric-level pruning (the e12 discipline): partitions read ==
    // exactly the en/bin-0 dirs on disk, never the other strata/bins
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    val scan = allScans(out.queryExecution.executedPlan).head
    val wanted = new java.io.File(s"$path/stratum=en/bin=0").listFiles()
      .count(_.getName.startsWith("epoch="))
    val total = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("stratum=")).flatMap(_.listFiles()).length
    assert(scan.metrics("numPartitions").value == wanted.toLong,
      s"read ${scan.metrics("numPartitions").value} partitions, wanted $wanted")
    assert(wanted < total, "pruning demonstrated nothing")
  }
}
