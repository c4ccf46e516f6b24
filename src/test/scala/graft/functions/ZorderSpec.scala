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
}
