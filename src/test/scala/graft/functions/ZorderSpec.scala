package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order clustering ([[Curation.zorderValue]] /
  * [[Curation.zorderLayout]]): hand-computed Morton interleaves, the
  * loud out-of-range contract, and the property the layout exists
  * for — measured file-level data skipping on BOTH dimensions of a
  * uniform grid, vs the 1-D sort that serves only its own key. The
  * p08 gate hash-checks the z computation against the DuckDB shift
  * mirror; the layout geometry is pinned here.
  */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  private def z(a: Long, b: Long, bits: Int = 6): Long =
    Seq((a, b)).toDF("a", "b")
      .select(Curation.zorderValue(col("a"), col("b"), bits).as("z"))
      .head().getLong(0)

  test("hand-computed Morton interleaves") {
    assert(z(0, 0) == 0L)
    assert(z(1, 0) == 1L)   // a bit 0 → z bit 0
    assert(z(0, 1) == 2L)   // b bit 0 → z bit 1
    assert(z(3, 3, bits = 2) == 15L)
    assert(z(5, 3, bits = 3) == 27L)  // a=101 → 1+16; b=011 → 2+8
    assert(z(63, 63) == 4095L)
  }

  test("out-of-range and null dimensions fail loudly") {
    intercept[IllegalArgumentException](
      Curation.zorderValue(col("a"), col("b"), bits = 0))
    intercept[Exception] { z(64, 0) }   // >= 2^bits
    intercept[Exception] { z(0, -1) }   // negative
    intercept[Exception] {
      Seq((Some(1L), Option.empty[Long])).toDF("a", "b")
        .select(Curation.zorderValue(col("a"), col("b"), 6)).head()
    }
  }

  test("z-layout skips files on BOTH dimensions; 1-D sort on one") {
    // uniform 64×64 grid, 8 write tasks; "files touched" = partitions
    // whose [min, max] of the predicate column overlap the range —
    // exactly what parquet footer min/max pruning decides with
    val grid = spark.range(4096)
      .select((col("id") / 64).cast("long").as("a"),
        (col("id") % 64).as("b"))
    def touched(layout: org.apache.spark.sql.DataFrame,
        dim: String): Long =
      layout.withColumn("__pid", spark_partition_id())
        .groupBy("__pid").agg(min(dim).as("lo"), max(dim).as("hi"))
        .filter(col("lo") <= 15 && col("hi") >= 8)
        .count()
    val zLayout = Curation.zorderLayout(grid, col("a"), col("b"),
      bits = 6, numFiles = 8).cache()
    val aSorted = grid.repartitionByRange(8, col("a"))
      .sortWithinPartitions(col("a")).cache()
    val (za, zb) = (touched(zLayout, "a"), touched(zLayout, "b"))
    val (sa, sb) = (touched(aSorted, "a"), touched(aSorted, "b"))
    assert(sb >= 7, "1-D sort serves its own key only: b-range reads ALL")
    assert(zb < sb, s"z-layout must skip on b: touched $zb of 8")
    assert(za < 8, s"z-layout must still skip on a: touched $za of 8")
    assert(za + zb < sa + sb,
      s"box workload: z-layout $za+$zb files vs 1-D $sa+$sb")
    zLayout.unpersist(); aSorted.unpersist()
  }

  test("N-dim: D=2 view equals the classic form; hand-computed 3-D") {
    def z3(a: Long, b: Long, c: Long, bits: Int = 4): Long =
      Seq((a, b, c)).toDF("a", "b", "c")
        .select(Curation.zorderValue(
          Seq(col("a"), col("b"), col("c")), bits).as("z"))
        .head().getLong(0)
    assert(z3(1, 0, 0) == 1L)   // dim0 bit 0 → z bit 0
    assert(z3(0, 1, 0) == 2L)   // dim1 bit 0 → z bit 1
    assert(z3(0, 0, 1) == 4L)   // dim2 bit 0 → z bit 2
    assert(z3(2, 0, 0) == 8L)   // dim0 bit 1 → z bit 3
    assert(z3(7, 7, 7, bits = 3) == 511L)
    // D=2 through the Seq form is bit-identical to the classic layout
    val pairs = Seq((5L, 3L), (63L, 0L), (17L, 42L))
    pairs.foreach { case (a, b) =>
      val viaSeq = Seq((a, b)).toDF("a", "b")
        .select(Curation.zorderValue(Seq(col("a"), col("b")), 6))
        .head().getLong(0)
      assert(viaSeq == z(a, b), s"($a, $b)")
    }
    // bits·D must fit one signed long; each dim keeps its own guard
    intercept[IllegalArgumentException](
      Curation.zorderValue(Seq(col("a"), col("b"), col("c")), bits = 22))
    intercept[IllegalArgumentException](
      Curation.zorderValue(Seq.empty[org.apache.spark.sql.Column], 6))
    intercept[Exception] { z3(0, 16, 0) } // dim1 >= 2^bits
  }

  test("3-D layout: a single-dimension predicate skips files on EVERY dim") {
    // uniform 16×16×16 grid, 8 write tasks
    val grid = spark.range(4096)
      .select((col("id") / 256).cast("long").as("a"),
        ((col("id") / 16) % 16).cast("long").as("b"),
        (col("id") % 16).as("c"))
    def touched(layout: org.apache.spark.sql.DataFrame,
        dim: String): Long =
      layout.withColumn("__pid", spark_partition_id())
        .groupBy("__pid").agg(min(dim).as("lo"), max(dim).as("hi"))
        .filter(col("lo") <= 3 && col("hi") >= 2)
        .count()
    val z3Layout = Curation.zorderLayout(grid,
      Seq(col("a"), col("b"), col("c")), bits = 4, numFiles = 8).cache()
    val aSorted = grid.repartitionByRange(8, col("a"))
      .sortWithinPartitions(col("a")).cache()
    val (za, zb, zc) =
      (touched(z3Layout, "a"), touched(z3Layout, "b"), touched(z3Layout, "c"))
    val (sa, sb, sc) =
      (touched(aSorted, "a"), touched(aSorted, "b"), touched(aSorted, "c"))
    assert(sb >= 7 && sc >= 7,
      "1-D sort serves its own key only: b/c ranges read ALL")
    assert(za < 8 && zb < 8 && zc < 8,
      s"3-D z-layout must skip on every dim: touched ($za, $zb, $zc) of 8")
    assert(za + zb + zc < sa + sb + sc,
      s"box workload: 3-D z $za+$zb+$zc files vs 1-D $sa+$sb+$sc")
    z3Layout.unpersist(); aSorted.unpersist()
  }

  test("layout preserves an existing __z column instead of clobbering it") {
    val df = spark.range(64).select(col("id").as("a"),
      (col("id") % 8).as("b"), lit(99L).as("__z"))
    val out = Curation.zorderLayout(df, Seq(col("a") % 8, col("b")),
      bits = 3, numFiles = 2)
    assert(out.columns.toSeq == Seq("a", "b", "__z"),
      "the caller's __z column must survive the layout")
    assert(out.select("__z").distinct().collect().map(_.getLong(0)).toSeq
      == Seq(99L))
  }
}
