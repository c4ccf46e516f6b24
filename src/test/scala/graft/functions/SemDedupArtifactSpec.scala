package graft.functions

import org.apache.spark.sql.functions._

import graft.{Scratch, SparkSpec}

/** The SemDeDup artifact lifecycle (`Similarity.writeSemDedupModel` /
  * `semDedupIncrement` / `appendSemDedupModel`, d36) and its streaming
  * dual (`CorpusStream.semDedupIngest`, s22). The d36/s22 gates
  * hash-pin the full chain against the DuckDB replay; here we pin the
  * lifecycle contracts: frozen-archive labeling, the transitive
  * attach-through-the-batch rule, the bridge rule (archive groups stay
  * distinct), the COMBINED hot-cluster guard, artifact growth, the
  * mid-stream retrain (stale-frames rule), and loud failure on a
  * meta-less tree.
  */
class SemDedupArtifactSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 4

  private def v(ax: Int, wobble: Double): Seq[Float] =
    (0 until dims).map(d =>
      if (d == ax) 1.0f
      else if (d == (ax + 1) % dims) wobble.toFloat else 0.0f)

  /** Archive: two tight bundles on orthogonal axes + a singleton. */
  private def archiveDf = Seq(
    (1L, v(0, 0.00)), (2L, v(0, 0.01)),   // group A, rep 1
    (10L, v(2, 0.00)), (11L, v(2, 0.01)), // group B, rep 10
    (20L, v(1, 0.00))                     // singleton
  ).toDF("vec_id", "embedding")

  private def freshModel(tag: String): String = {
    val path = Scratch.path("/root/testdata/sf0.001", tag)
    Scratch.reset(path)
    Similarity.writeSemDedupModel(archiveDf, path, k = 3,
      threshold = 0.95)
    path
  }

  test("artifact roundtrip: archived labels persist and match the " +
      "inline semDedup run; meta rides inside the root") {
    val path = freshModel("sdart_rt")
    val got = Similarity.readSemDedupLabels(spark, path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L))
    val (thr, cap) = Similarity.readSemDedupMeta(spark, path)
    assert(thr === 0.95)
    assert(cap === 100000)
  }

  test("semDedupIncrement: a match joins its archived rep; an inc-only " +
      "pair groups under its min id; a clean vector self-labels; " +
      "transitive attach through a batch member works") {
    val path = freshModel("sdart_inc")
    val inc = Seq(
      (100L, v(0, 0.005)), // near group A -> rep 1
      (101L, v(2, 0.02)),  // near group B -> rep 10
      (200L, v(3, 0.00)), (201L, v(3, 0.001)), // inc-only pair -> 200
      (300L, v(3, 0.60)),  // near nothing (cos to 200/201 ~0.86) -> itself
      // the SemDedupSpec chain wobbles: 400 matches the archive
      // singleton 20 (cos ~0.977) but 401 matches ONLY 400
      // (cos(401,20) ~0.915 < 0.95, cos(401,400) ~0.980) — the
      // transitive attach: 401 must inherit 20 THROUGH 400
      (400L, v(1, 0.22)), (401L, v(1, 0.44))
    ).toDF("vec_id", "embedding")
    val got = Similarity.semDedupIncrement(spark, path, inc)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(100L) === 1L)
    assert(got(101L) === 10L)
    assert(got(200L) === 200L)
    assert(got(201L) === 200L)
    assert(got(300L) === 300L)
    assert(got(400L) === 20L)
    assert(got(401L) === 20L)
    // archived labels are untouched by an increment query
    assert(Similarity.readSemDedupLabels(spark, path).count() === 5L)
  }

  test("REP PRIORITY: an increment id SMALLER than the archived rep " +
      "it reaches still labels with the rep — increment labels union " +
      "consistently with the archive's") {
    // archive ids start at 5; the increment uses ids 1-3, all below
    // the archived reps — under plain min-reachable the increment id
    // would win and silently split the semantic group
    val arch = Seq(
      (5L, v(0, 0.00)), (7L, v(0, 0.01)), // group, rep 5
      (9L, v(2, 0.00))                    // singleton
    ).toDF("vec_id", "embedding")
    val path = Scratch.path("/root/testdata/sf0.001", "sdart_reppri")
    Scratch.reset(path)
    Similarity.writeSemDedupModel(arch, path, k = 2, threshold = 0.95)
    val inc = Seq(
      (1L, v(0, 0.005)), // matches group {5,7} -> must take rep 5
      (2L, v(2, 0.01)),  // matches singleton 9 -> must take rep 9
      (3L, v(1, 0.00))   // matches nothing -> itself
    ).toDF("vec_id", "embedding")
    val got = Similarity.semDedupIncrement(spark, path, inc)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 5L, 2L -> 9L, 3L -> 3L))
  }

  test("a fully-taken-down artifact stays usable: delete-all empties " +
      "the index, a second delete is a no-op, compaction works, and " +
      "a fresh increment self-labels") {
    val path = freshModel("sdart_delall")
    val all = archiveDf.select(col("vec_id"))
    Similarity.deleteFromSemDedupModel(spark, path, all)
    assert(Similarity.readSemDedupLabels(spark, path).count() === 0L)
    Similarity.deleteFromSemDedupModel(spark, path, all) // idempotent
    Similarity.compactSemDedupModel(spark, path)
    val got = Similarity.semDedupIncrement(spark, path,
        Seq((100L, v(0, 0.005))).toDF("vec_id", "embedding"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(100L -> 100L),
      "an emptied archive must anchor nothing")
  }

  test("bridge rule: an increment vector matching TWO archive groups " +
      "takes the smaller rep; the archive groups stay distinct " +
      "(frozen-archive contract)") {
    // one bundle, split into two archive groups by clustering is hard
    // to force; instead plant two groups in the SAME cluster by
    // building the model with k=1 (everything co-clusters) over two
    // bundles far apart... they wouldn't pair. So bridge via an inc
    // vector equal to members of group A and group B is impossible for
    // cos-separated groups. Instead: two archive vectors at cos ~0.94
    // (below threshold -> distinct groups), inc vector between them at
    // cos >= 0.95 to both.
    val arch = Seq(
      (1L, v(0, 0.00)),  // group {1}
      (2L, v(0, 0.66))   // cos(1,2) ~ 0.835 < 0.95 -> group {2}
    ).toDF("vec_id", "embedding")
    val path = Scratch.path("/root/testdata/sf0.001", "sdart_bridge")
    Scratch.reset(path)
    Similarity.writeSemDedupModel(arch, path, k = 1, threshold = 0.95)
    val archived = Similarity.readSemDedupLabels(spark, path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(archived === Map(1L -> 1L, 2L -> 2L), "fixture lost its point")
    val inc = Seq((100L, v(0, 0.30))).toDF("vec_id", "embedding")
    // cos(inc, 1) ~ 0.958, cos(inc, 2) ~ 0.965 — bridges both
    val got = Similarity.semDedupIncrement(spark, path, inc)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(100L) === 1L, "bridge takes the smaller archived rep")
    val after = Similarity.readSemDedupLabels(spark, path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after === archived, "archive labels must stay frozen")
  }

  test("combined hot-cluster guard: archive + increment past the cap " +
      "excludes the cluster (increment members self-label), small " +
      "clusters still dedup") {
    val arch = (0 until 6).map(i => (100L + i, v(0, 0.001 * i))) ++
      Seq((1L, v(2, 0.00)))
    val path = Scratch.path("/root/testdata/sf0.001", "sdart_hot")
    Scratch.reset(path)
    // cap 8: archive alone (6 in the axis-0 cell) is under it
    Similarity.writeSemDedupModel(arch.toDF("vec_id", "embedding"),
      path, k = 2, threshold = 0.95, maxClusterSize = 8)
    val inc = Seq(
      (200L, v(0, 0.002)), (201L, v(0, 0.003)), (202L, v(0, 0.004)),
      (300L, v(2, 0.01))
    ).toDF("vec_id", "embedding")
    // axis-0 cell: 6 archived + 3 increment = 9 > 8 -> excluded
    val got = Similarity.semDedupIncrement(spark, path, inc)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(200L) === 200L)
    assert(got(201L) === 201L)
    assert(got(202L) === 202L)
    assert(got(300L) === 1L, "the small cluster must still dedup")
  }

  test("appendSemDedupModel grows the archive: a later increment " +
      "dedups against appended rows; growth is O(increment)-shaped " +
      "(labels row count grows by the batch)") {
    val path = freshModel("sdart_grow")
    val inc1 = Seq((200L, v(3, 0.00))).toDF("vec_id", "embedding")
    val lab1 = Similarity.appendSemDedupModel(spark, path, inc1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab1 === Map(200L -> 200L))
    assert(Similarity.readSemDedupLabels(spark, path).count() === 6L)
    // the second increment matches ONLY the appended row
    val inc2 = Seq((300L, v(3, 0.001))).toDF("vec_id", "embedding")
    val lab2 = Similarity.semDedupIncrement(spark, path, inc2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab2 === Map(300L -> 200L),
      "an appended row must be visible to later increments")
  }

  test("deleteFromSemDedupModel removes rows from index AND labels; " +
      "survivors keep labels verbatim (a rep_id may outlive its row); " +
      "idempotent; later increments no longer match deleted rows") {
    val path = freshModel("sdart_del")
    // delete the rep of group A (vec 1) and the singleton 20
    val ids = Seq(1L, 20L).toDF("vec_id")
    Similarity.deleteFromSemDedupModel(spark, path, ids)
    Similarity.deleteFromSemDedupModel(spark, path, ids) // idempotent
    val labels = Similarity.readSemDedupLabels(spark, path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // survivor 2 keeps rep_id = 1 VERBATIM even though row 1 is gone
    assert(labels === Map(2L -> 1L, 10L -> 10L, 11L -> 10L))
    assert(spark.read.parquet(s"$path/index")
      .filter(col("vec_id").isin(1L, 20L)).count() === 0L,
      "deleted embeddings must leave the index")
    // an increment near the DELETED singleton 20 now matches nothing
    val inc = Seq((400L, v(1, 0.005))).toDF("vec_id", "embedding")
    val got = Similarity.semDedupIncrement(spark, path, inc)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(400L) === 400L,
      "a deleted row must stop anchoring future increments")
    // meta and centroids survive the rewrite
    assert(Similarity.readSemDedupMeta(spark, path) === ((0.95, 100000)))
  }

  test("compactSemDedupModel folds append debris into one clean file " +
      "set per cell without changing a row") {
    val path = freshModel("sdart_compact")
    (0 until 3).foreach { i =>
      Similarity.appendSemDedupModel(spark, path,
        Seq((200L + i, v(3, 0.001 * i))).toDF("vec_id", "embedding"))
    }
    val before = Similarity.readSemDedupLabels(spark, path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    def filesPerCell: Map[String, Int] =
      fs.globStatus(new org.apache.hadoop.fs.Path(
          s"$path/index/centroid_id=*")).map { d =>
        d.getPath.getName ->
          fs.listStatus(d.getPath).count(s => s.isFile &&
            !s.getPath.getName.startsWith("_"))
      }.toMap
    val grown = filesPerCell
    assert(grown.values.exists(_ > 1),
      "fixture lost its point: appends must leave per-batch files")
    Similarity.compactSemDedupModel(spark, path)
    val after = Similarity.readSemDedupLabels(spark, path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after === before, "compaction must not change a row")
    assert(filesPerCell.values.forall(_ <= grown.values.max),
      "compaction must not grow file counts")
    assert(filesPerCell.values.sum < grown.values.sum,
      "compaction must merge the per-append files")
  }

  test("the increment's archive read is PARTITION-PRUNED to the " +
      "touched cells (metric-level, the e12 discipline): untouched " +
      "centroid_id= dirs are never listed or read") {
    val path = freshModel("sdart_prune")
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    val cells = new java.io.File(s"$path/index").listFiles()
      .filter(_.getName.startsWith("centroid_id=")).map(_.getName).sorted
    assert(cells.length >= 2, "fixture lost its point: need >= 2 cells")
    // the EXACT frame semDedupIncrement reads, restricted to one cell
    val oneCell = cells.head.stripPrefix("centroid_id=").toInt
    val frame = Similarity.semDedupArchiveCells(spark, path, Seq(oneCell))
    frame.collect()
    val scan = allScans(frame.queryExecution.executedPlan).head
    assert(scan.metrics("numPartitions").value === 1L,
      s"read ${scan.metrics("numPartitions").value} cells, wanted 1 " +
        s"of ${cells.length}")
  }

  test("empty increment labels to an empty frame with the gate schema") {
    val path = freshModel("sdart_empty")
    val inc = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val got = Similarity.semDedupIncrement(spark, path, inc)
    assert(got.columns.toSeq === Seq("vec_id", "rep_id"))
    assert(got.count() === 0L)
  }

  test("a meta-less tree fails loudly, not with a wrong default") {
    val path = Scratch.path("/root/testdata/sf0.001", "sdart_nometa")
    Scratch.reset(path)
    archiveDf.write.mode("overwrite").parquet(s"$path/labels")
    val e = intercept[IllegalArgumentException] {
      Similarity.semDedupIncrement(spark, path,
        Seq((1L, v(0, 0.0))).toDF("vec_id", "embedding"))
    }
    assert(e.getMessage.contains("_meta_semdedup"))
  }

  test("appendSemDedupGrowth: later epochs dedup against earlier " +
      "ones; a replayed epoch OVERWRITES instead of duplicating; " +
      "semDedupIncrement sees the whole growth area") {
    val path = freshModel("sdart_grow2")
    // epoch 0: a new group anchor on axis 3
    val e0 = Seq((200L, v(3, 0.00))).toDF("vec_id", "embedding")
    val l0 = Similarity.appendSemDedupGrowth(spark, path, e0, epoch = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l0 === Map(200L -> 200L))
    // epoch 1: matches ONLY the epoch-0 row -> must take its label
    val e1 = Seq((300L, v(3, 0.001))).toDF("vec_id", "embedding")
    val l1 = Similarity.appendSemDedupGrowth(spark, path, e1, epoch = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l1 === Map(300L -> 200L),
      "a later epoch must dedup against earlier growth")
    // REPLAY epoch 1: overwrites its own dirs — row counts unchanged
    Similarity.appendSemDedupGrowth(spark, path, e1, epoch = 1L)
    val gRows = spark.read.parquet(
      Similarity.semDedupGrowthPath(path))
    assert(gRows.count() === 2L, "replay must overwrite, not duplicate")
    // a batch-orchestrated increment sees base + ALL growth
    val got = Similarity.semDedupIncrement(spark, path,
        Seq((400L, v(3, 0.002)), (401L, v(0, 0.005)))
          .toDF("vec_id", "embedding"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(400L -> 200L, 401L -> 1L))
  }

  test("compactSemDedupModel ABSORBS the growth area: rows join the " +
      "base artifact, epoch dirs vanish, absorbed markers land, and " +
      "takedown reaches stream-grown rows") {
    val path = freshModel("sdart_absorb")
    Similarity.appendSemDedupGrowth(spark, path,
      Seq((200L, v(3, 0.00))).toDF("vec_id", "embedding"), epoch = 0L)
    Similarity.appendSemDedupGrowth(spark, path,
      Seq((300L, v(3, 0.001))).toDF("vec_id", "embedding"), epoch = 1L)
    // simulate the STREAM's lineage binding so the absorb has a
    // lineage to scope its markers to (orchestrated growth without a
    // stream writes none — orchestration owns its own replay)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val linOut = fs.create(new org.apache.hadoop.fs.Path(
      s"$path/_stream_lineage"), true)
    linOut.write("test-lineage".getBytes("UTF-8")); linOut.close()
    Similarity.compactSemDedupModel(spark, path)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      Similarity.semDedupGrowthPath(path))), "growth must be absorbed")
    (0L to 1L).foreach(e => assert(fs.exists(new org.apache.hadoop.fs.Path(
      Similarity.semDedupAbsorbedMarker(path, "test-lineage", e))),
      s"absorbed marker for epoch $e must land, lineage-scoped"))
    val labels = Similarity.readSemDedupLabels(spark, path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(200L) === 200L)
    assert(labels(300L) === 200L)
    assert(labels.size === 7, "base 5 + absorbed 2")
    // an increment still dedups against the absorbed rows
    val got = Similarity.semDedupIncrement(spark, path,
        Seq((400L, v(3, 0.002))).toDF("vec_id", "embedding"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(400L -> 200L))
    // and a takedown reaches them
    Similarity.deleteFromSemDedupModel(spark, path,
      Seq(200L, 300L).toDF("vec_id"))
    val after = Similarity.semDedupIncrement(spark, path,
        Seq((500L, v(3, 0.003))).toDF("vec_id", "embedding"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after === Map(500L -> 500L),
      "takedown must reach stream-grown rows")
  }

  test("semDedupGrowIngest: two in-order batches — the second dedups " +
      "against the first; a post-absorb restart replaying the final " +
      "batch SKIPS re-growing and re-derives its labels; a fresh " +
      "checkpoint over grown state fails loudly") {
    val dir = "/root/testdata/sf0.001"
    val path = freshModel("sdart_gstream")
    val in = Scratch.path(dir, "sdart_g_in")
    val out = Scratch.path(dir, "sdart_g_out")
    val ckpt = Scratch.path(dir, "sdart_g_ckpt")
    Seq(in, out, ckpt).foreach(Scratch.reset)
    val b0 = Seq((200L, v(3, 0.00))).toDF("vec_id", "embedding")
    val b1 = Seq((300L, v(3, 0.001))).toDF("vec_id", "embedding")
    Seq(b0, b1).foreach(_.coalesce(1).write.mode("append").parquet(in))
    val stream = spark.readStream.schema(b0.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = graft.streaming.CorpusStream.semDedupGrowIngest(stream,
      path, out, checkpointPath = Some(ckpt),
      trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    q.awaitTermination()
    val got = spark.read.parquet(out).drop("batch")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(200L -> 200L, 300L -> 200L),
      "batch 1 must dedup against batch 0")
    // absorb: markers land SCOPED to this stream's lineage
    Similarity.compactSemDedupModel(spark, path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val lin = {
      val p = new org.apache.hadoop.fs.Path(s"$ckpt/graft_lineage")
      val in0 = fs.open(p)
      try scala.io.Source.fromInputStream(in0, "UTF-8").mkString.trim
      finally in0.close()
    }
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      Similarity.semDedupAbsorbedMarker(path, lin, 1L))))
    // SAME-LINEAGE post-absorb replay (the crash window): a new batch
    // id under the ORIGINAL checkpoint whose marker exists must
    // re-derive labels from the absorbed archive and NOT re-grow
    val m2 = new org.apache.hadoop.fs.Path(
      Similarity.semDedupAbsorbedMarker(path, lin, 2L))
    fs.mkdirs(m2.getParent); fs.create(m2, true).close()
    b0.coalesce(1).write.mode("append").parquet(in) // becomes batch 2
    val stream2 = spark.readStream.schema(b0.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q2 = graft.streaming.CorpusStream.semDedupGrowIngest(stream2,
      path, out, checkpointPath = Some(ckpt),
      trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    q2.awaitTermination()
    val replayed = spark.read.parquet(s"$out/batch=2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(replayed === Map(200L -> 200L),
      "the absorbed-batch replay must re-derive labels from the base")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      Similarity.semDedupGrowthPath(path))),
      "the absorbed-batch replay must NOT re-grow")
    // a FRESH checkpoint is a NEW lineage: the old lineage's markers
    // must not shadow its genuinely-new batch 0 — it GROWS normally
    val in3 = Scratch.path(dir, "sdart_g_in3")
    val ckpt3 = Scratch.path(dir, "sdart_g_ckpt3")
    val out3 = Scratch.path(dir, "sdart_g_out3")
    Seq(in3, ckpt3, out3).foreach(Scratch.reset)
    Seq((500L, v(1, 0.60))).toDF("vec_id", "embedding")
      .coalesce(1).write.mode("append").parquet(in3)
    val stream3 = spark.readStream.schema(b0.schema)
      .option("maxFilesPerTrigger", "1").parquet(in3)
    val q3 = graft.streaming.CorpusStream.semDedupGrowIngest(stream3,
      path, out3, checkpointPath = Some(ckpt3),
      trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    q3.awaitTermination()
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"${Similarity.semDedupGrowthPath(path)}/epoch=0")),
      "a new lineage's batch 0 must grow despite the old lineage's " +
        "absorbed epoch-0 marker")
  }

  test("streaming semDedupIngest labels per batch against the frozen " +
      "artifact and picks up a MID-STREAM retrain at the next batch " +
      "(the s14 stale-frames rule)") {
    val dir = "/root/testdata/sf0.001"
    val path = freshModel("sdart_stream")
    val in = Scratch.path(dir, "sdart_s_in")
    val out = Scratch.path(dir, "sdart_s_out")
    val ckpt = Scratch.path(dir, "sdart_s_ckpt")
    Seq(in, out, ckpt).foreach(Scratch.reset)
    val b1 = Seq((100L, v(0, 0.005))).toDF("vec_id", "embedding")
    b1.coalesce(1).write.mode("append").parquet(in)
    val stream1 = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q1 = graft.streaming.CorpusStream.semDedupIngest(stream1, path,
      out, checkpointPath = Some(ckpt),
      trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    q1.awaitTermination()
    val got1 = spark.read.parquet(out).drop("batch")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got1 === Map(100L -> 1L))
    // RETRAIN mid-stream: rebuild the artifact over a different
    // archive (group A removed), then deliver a second batch — the
    // rebuilt model must take effect without a stream restart
    Similarity.writeSemDedupModel(
      archiveDf.filter(col("vec_id") >= 10L), path, k = 2,
      threshold = 0.95)
    val b2 = Seq((101L, v(0, 0.005)), (102L, v(2, 0.02)))
      .toDF("vec_id", "embedding")
    b2.coalesce(1).write.mode("append").parquet(in)
    val stream2 = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q2 = graft.streaming.CorpusStream.semDedupIngest(stream2, path,
      out, checkpointPath = Some(ckpt),
      trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    q2.awaitTermination()
    val got2 = spark.read.parquet(out).drop("batch")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 101 matched group A before the retrain — A is gone now, so it
    // self-labels; 102 still matches group B in the rebuilt model
    assert(got2 === Map(100L -> 1L, 101L -> 101L, 102L -> 10L))
  }
}
