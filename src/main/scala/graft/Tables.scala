package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Every query function in [[SparkEntry]] is self-contained: it loads
  * exactly the tables it needs from the given scale-factor directory, so
  * Catalyst sees one lazily-composed plan per query and pushes
  * filters/column pruning into the parquet scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def df(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.parquet has shipped ts as either parquet TIMESTAMP(NANOS)
      // (which Spark's vectorized reader rejects — read the nanos as a
      // long via the legacy flag, then truncate losslessly to µs) or a
      // plain µs timestamp (NTZ). Normalize both to the session-zone
      // TimestampType every downstream consumer expects. The flag is
      // only consulted while the relation is being resolved, so it is
      // saved/restored around the read — later parquet reads in the
      // session are unaffected.
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prior = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      val raw =
        try spark.read.parquet(s"$dir/$name.parquet")
        finally prior match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      val ts = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          expr("timestamp_micros(ts div 1000)")
        case _ => col("ts").cast(org.apache.spark.sql.types.TimestampType)
      }
      raw.withColumn("ts", ts).select(raw.columns.map(col): _*)
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Register all tables as temp views (for the spark.sql pass-through
    * surface — the reference's entire query language is SQL strings fed
    * to an engine, see SURVEY.md §2.C / reference query_iterator.py:131).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => df(spark, dir, n).createOrReplaceTempView(n))
}
