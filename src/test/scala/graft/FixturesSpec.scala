package graft

import org.apache.spark.sql.functions._

/** The shared gate-fixture layer (`Fixtures`, VERDICT r16 #1). The
  * 223 oracle gates prove the fixtures feed correct results; here we
  * pin the layer's own contracts: build-once memoization and the
  * copy-on-mutate isolation that keeps a mutating gate's samples
  * independent of the canonical tree.
  */
class FixturesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("cold-map tree-before-model order builds cleanly (VERDICT r17 " +
      "#1: nested fixture lookups must not re-enter the memo update)") {
    // The detonating order: a tree fixture (whose builder itself
    // calls ivfPqModel — a nested Fixtures.of) is the FIRST touch on
    // an empty memo. Under the old computeIfAbsent memo this threw
    // IllegalStateException("Recursive update") whenever the nested
    // key landed in the bin under update; the lazy-cell memo runs
    // builders outside any map bin, so nesting is always safe.
    Fixtures.resetForTest()
    val tree = Fixtures.ivfPqTreeFull(spark, dir)
    assert(new java.io.File(tree).isDirectory)
    // and the model the tree built en passant is now memoized
    val (c1, _) = Fixtures.ivfPqModel(spark, dir)
    val (c2, _) = Fixtures.ivfPqModel(spark, dir)
    assert(c1 eq c2)
    // every other tree flavor nests the same way — all must build
    assert(new java.io.File(
      Fixtures.ivfPqTreeHalfEven(spark, dir)).isDirectory)
    assert(new java.io.File(
      Fixtures.ivfPqTree5Epoch(spark, dir)).isDirectory)
    assert(new java.io.File(
      Fixtures.ivfPqTreeStale(spark, dir)).isDirectory)
  }

  test("fixtures memoize: the same canonical path/frames come back " +
      "on every call, and the tree exists on disk") {
    val p1 = Fixtures.ivfPqTreeFull(spark, dir)
    val p2 = Fixtures.ivfPqTreeFull(spark, dir)
    assert(p1 === p2)
    assert(new java.io.File(p1).isDirectory)
    val (c1, b1) = Fixtures.ivfPqModel(spark, dir)
    val (c2, b2) = Fixtures.ivfPqModel(spark, dir)
    assert(c1 eq c2)
    assert(b1 eq b2)
  }

  test("copyTree isolates mutation: deleting rows in the copy leaves " +
      "the canonical tree byte-identical") {
    val canonical = Fixtures.ivfPqTreeFull(spark, dir)
    val before = spark.read.parquet(canonical).count()
    val copy = Fixtures.copyTree(spark, canonical, dir, "fxspec_copy")
    assert(copy !== canonical)
    assert(spark.read.parquet(copy).count() === before)
    // mutate the copy (the e19 verb shape: drop some rows' files)
    val cellDirs = new java.io.File(copy).listFiles()
      .filter(_.getName.startsWith("centroid_id="))
    assert(cellDirs.nonEmpty)
    cellDirs.head.listFiles().foreach(_.delete())
    assert(cellDirs.head.delete())
    assert(spark.read.parquet(copy).count() < before,
      "mutation did not take")
    assert(spark.read.parquet(canonical).count() === before,
      "canonical tree must be untouched by a copy's mutation")
    // a re-copy starts fresh from the canonical tree
    val copy2 = Fixtures.copyTree(spark, canonical, dir, "fxspec_copy")
    assert(spark.read.parquet(copy2).count() === before)
  }

  test("webSurvivors and linkageEntities return re-readable frames " +
      "with the gate schemas") {
    val surv = Fixtures.webSurvivors(spark, dir)
    assert(surv.columns.toSet === Set("doc_id", "url", "text"))
    assert(surv.count() > 0)
    val ents = Fixtures.linkageEntities(spark, dir)
    assert(ents.columns.toSet === Set("rec_id", "entity_id"))
    assert(ents.count() > 0)
    val labels = Fixtures.semDedupLabels(spark, dir)
    assert(labels.columns.toSet === Set("vec_id", "rep_id", "dist"))
    assert(labels.count() > 0)
  }
}
