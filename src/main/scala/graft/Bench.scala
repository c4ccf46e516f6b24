package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every [[SparkEntry]] query on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line
  * `{"metric","value","unit","queries",...,"sf"}`.
  *
  * Measurement discipline (VERDICT r1 #4):
  *   - median of `SPARK_GRAFT_BENCH_RUNS` (default 3) executions per
  *     query — a single sample on a contended sandbox is noise;
  *   - the action is a noop-sink WRITE, not `count()`: under `count()`
  *     Catalyst's EliminateSorts removes every top-level ORDER BY, so
  *     sort cost was never measured; a write keeps the sort in the plan;
  *   - failures are REPORTED (per-query `"errors"` map) instead of being
  *     swallowed as a fast "-1" sample.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the session once (JVM/JIT, codegen compiler, parquet footer
    // caches) so per-query timings measure the queries, not first-job
    // startup; standard benchmark practice, not counted in the totals
    try SparkEntry.entry(spark).count() catch {
      case e: Throwable =>
        // a broken entry() means the first measured query absorbs JVM
        // startup — warn loudly instead of silently skipping warmup
        System.err.println(s"WARN bench warmup failed: $e")
    }

    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val samples = (0 until runs).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          // noop sink: full distributed execution incl. final sorts, no
          // driver materialization, nothing written
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            errors.getOrElseUpdate(name,
              s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
            None
        }
      }
      if (samples.isEmpty) None
      else Some(name -> samples.sorted.apply(samples.size / 2))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
