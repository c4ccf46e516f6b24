package graft

/** Per-process scratch paths for gate queries that exercise
  * write-then-read round-trips (x03–x08 and friends).
  *
  * Paths stay PID-suffixed — two JVMs running the gate suite
  * concurrently (driver verify + a local bench) must never overwrite
  * each other's tree mid-read, the documented x03 race rationale — and
  * every handed-out path is registered with ONE JVM shutdown hook that
  * deletes it recursively, so a run can never leak a temp tree (the
  * pid suffix otherwise defeats `mode("overwrite")` reuse across runs
  * and each distinct JVM leaks one directory per round-trip gate).
  */
object Scratch {

  private val paths = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      paths.forEach(p => deleteRecursively(new java.io.File(p)))))

  /** tmpdir/graft_<tag>_<dataDirName>_<pid><suffix>, registered for
    * recursive deletion at JVM exit. */
  def path(dataDir: String, tag: String, suffix: String = ""): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_${tag}_${java.nio.file.Paths.get(dataDir).getFileName}_" +
        s"${ProcessHandle.current().pid()}$suffix").toString
    hookInstalled
    paths.add(p)
    p
  }

  /** Delete a scratch tree NOW. Gate bodies that accumulate state
    * across invocations (staging trees, stream checkpoints) must call
    * this up front — the bench samples a gate several times in one JVM,
    * so a per-pid path alone does not isolate re-runs. */
  def reset(p: String): Unit = deleteRecursively(new java.io.File(p))

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
    ()
  }
}
