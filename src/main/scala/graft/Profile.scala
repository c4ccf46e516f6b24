package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Measurement-only main for the optimization rounds (guide §1.1: find
  * where the wall-clock goes before touching anything): runs the named
  * gates once each through the same noop-sink action [[Bench]] times,
  * with a listener that records every Spark job's wall time and call
  * site, then prints a per-gate job breakdown. The per-job rows expose
  * what a single per-gate number hides — how much of a streaming gate
  * is micro-batch overhead vs real work, how many driver-scheduled
  * jobs an iterative verb launches, which single job dominates.
  *
  * Usage: `graft.Profile <gate[,gate...]>` with the bench env contract
  * (`SPARK_GRAFT_SF_DIR`, `SPARK_GRAFT_CPUS`). Not part of any gate or
  * driver surface; pure diagnostics.
  */
object Profile {

  private final case class JobRow(id: Int, desc: String, start: Long,
      var end: Long = 0L)

  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(',').map(_.trim).filter(_.nonEmpty))
      .getOrElse(Array.empty[String])
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalSession.build(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // A/B knobs for experiments: SPARK_GRAFT_PROFILE_CONF="k=v;k2=v2"
    // applied as runtime SQLConf before any gate runs
    sys.env.get("SPARK_GRAFT_PROFILE_CONF").foreach(_.split(';')
        .filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k.trim, v.trim)
    })

    val jobs = new ConcurrentLinkedQueue[JobRow]()
    val open = new java.util.concurrent.ConcurrentHashMap[Int, JobRow]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        val row = JobRow(js.jobId, desc, js.time)
        open.put(js.jobId, row)
        jobs.add(row)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val row = open.remove(je.jobId)
        if (row != null) row.end = je.time
      }
    })

    // same warmup the bench does: entry smoke + shared fixtures, so the
    // profiled sample is the gate's verb, not JVM/fixture startup
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    try Fixtures.prewarm(spark, sfDir) catch { case _: Throwable => () }

    val fns = SparkEntry.queries
    for (name <- names if fns.contains(name)) {
      jobs.clear(); open.clear()
      val t0 = System.nanoTime()
      fns(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"== $name%s  wall=$wall%.2f s")
      val rows = jobs.toArray(Array.empty[JobRow]).sortBy(_.start)
      val base = rows.headOption.map(_.start).getOrElse(0L)
      var covered = 0L
      var lastEnd = 0L
      for (r <- rows) {
        val dur = math.max(0L, r.end - r.start)
        val gap = r.start - math.max(base, lastEnd)
        if (gap > 50)
          println(f"   [driver gap ${gap / 1e3}%.2f s before job ${r.id}%d]")
        println(f"   job ${r.id}%4d  +${(r.start - base) / 1e3}%7.2f s  dur ${dur / 1e3}%6.2f s  ${r.desc.take(110)}%s")
        covered += dur
        lastEnd = math.max(lastEnd, r.end)
      }
      println(f"   -- jobs=${rows.length}%d sumJobDur=${covered / 1e3}%.2f s wall=$wall%.2f s (driver/non-job=${wall - covered / 1e3}%.2f s)")
    }
    spark.stop()
  }
}
