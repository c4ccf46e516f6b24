package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) tables: the shuffle-free co-located join.
  *
  * Writing both sides of a recurring join bucketed by the join key into
  * the warehouse lets every subsequent join/aggregation on that key skip
  * its Exchange entirely — at 100 TB the difference between a nightly
  * pipeline re-shuffling the fact table per query and reading
  * co-located buckets in place. (Spark bucketing requires `saveAsTable`
  * — bucket metadata lives in the catalog, not in plain parquet paths.)
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the catalog). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
