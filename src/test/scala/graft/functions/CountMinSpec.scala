package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-Min sketch (x14/x15): the deterministic properties the
  * hash-gated oracle replay can't isolate — never-undercount, the
  * collision-mass ceiling, linearity, topology-independence, null
  * skipping, and the loud guards.
  */
class CountMinSpec extends SparkSpec {

  import spark.implicits._

  private val Depth = 3
  private val Width = 16

  private def sketchOf(items: Seq[String], parts: Int = 4): Array[Long] =
    items.toDF("item").repartition(parts)
      .agg(Sketches.cmsSketch(col("item"), Depth, Width).as("sk"))
      .head.getSeq[Long](0).toArray

  private def estimates(sk: Array[Long],
      probes: Seq[String]): Map[String, Long] =
    probes.map { p =>
      p -> (0 until Depth).map { j =>
        sk(j * Width + expressions.CountMinSketch.bucket(j, p, Width))
      }.min
    }.toMap

  private val Items: Seq[String] =
    Seq.fill(40)("alpha") ++ Seq.fill(15)("beta") ++ Seq.fill(5)("gamma") ++
      Seq("delta", "epsilon", "zeta", "eta", "theta", "iota", "kappa")

  test("estimates never undercount and are bounded by total mass") {
    val sk = sketchOf(Items)
    val truth = Items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = estimates(sk, truth.keys.toSeq :+ "absent")
    truth.foreach { case (item, f) =>
      assert(est(item) >= f, s"undercount on $item")
      assert(est(item) <= Items.size.toLong, s"over total mass on $item")
    }
    // the absent item reads pure collision mass: non-negative, bounded
    assert(est("absent") >= 0L && est("absent") <= Items.size.toLong)
    // total per row is exactly the input size (every item lands once
    // per row) — the invariant any drop or double-count would break
    (0 until Depth).foreach { j =>
      assert(sk.slice(j * Width, (j + 1) * Width).sum === Items.size.toLong)
    }
  }

  test("column-side cmsEstimate equals the JVM bucket arithmetic") {
    val probes = Seq("alpha", "beta", "gamma", "absent")
    val sk = Items.toDF("item")
      .agg(Sketches.cmsSketch(col("item"), Depth, Width).as("sk"))
    val viaColumn = probes.toDF("item").crossJoin(sk)
      .select(col("item"),
        Sketches.cmsEstimate(col("sk"), col("item"), Depth, Width).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaColumn === estimates(sketchOf(Items), probes))
  }

  test("linearity: merged half-sketches equal the one-shot sketch") {
    val (a, b) = Items.zipWithIndex.partition(_._2 % 2 == 0)
    val skA = sketchOf(a.map(_._1))
    val skB = sketchOf(b.map(_._1))
    val merged = skA.zip(skB).map { case (x, y) => x + y }
    assert(merged.toSeq === sketchOf(Items).toSeq)
    // and through the column-side combine
    val dfA = a.map(_._1).toDF("item")
      .agg(Sketches.cmsSketch(col("item"), Depth, Width).as("sk_a"))
    val dfB = b.map(_._1).toDF("item")
      .agg(Sketches.cmsSketch(col("item"), Depth, Width).as("sk_b"))
    val viaMerge = dfA.crossJoin(dfB)
      .select(Sketches.cmsMerge(col("sk_a"), col("sk_b")).as("sk"))
      .head.getSeq[Long](0).toSeq
    assert(viaMerge === sketchOf(Items).toSeq)
  }

  test("topology-independence: 1 vs 8 partitions build the same matrix") {
    assert(sketchOf(Items, parts = 1).toSeq === sketchOf(Items, parts = 8).toSeq)
  }

  test("null items are skipped (aggregate-function semantics)") {
    val sk = Seq(Some("a"), None, Some("a"), None).toDF("item")
      .agg(Sketches.cmsSketch(col("item"), Depth, Width).as("sk"))
      .head.getSeq[Long](0)
    (0 until Depth).foreach { j =>
      assert(sk.slice(j * Width, (j + 1) * Width).sum === 2L)
    }
  }

  test("degenerate depth/width are rejected loudly") {
    def build(d: Int, w: Int): Unit = {
      Seq("a").toDF("item")
        .agg(Sketches.cmsSketch(col("item"), d, w)).collect(); ()
    }
    assert(intercept[IllegalArgumentException](build(0, 16))
      .getMessage.contains("depth"))
    assert(intercept[IllegalArgumentException](build(17, 16))
      .getMessage.contains("depth"))
    assert(intercept[IllegalArgumentException](build(3, 1))
      .getMessage.contains("width"))
    assert(intercept[IllegalArgumentException](
      Seq("a").toDF("item").select(
        Sketches.cmsEstimate(col("item"), col("item"), 0, 16)).collect())
      .getMessage.contains("depth"))
  }
}
