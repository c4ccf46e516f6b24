package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench harness plumbing: the self-refreshing cost-hints file
  * (VERDICT r5 #3). The sweep/refine phases themselves are exercised by
  * the driver's per-round run; here we pin the hint round-trip so a
  * malformed or missing file can never break ordering.
  */
class BenchSpec extends AnyFunSuite {

  test("cost hints round-trip through save + load") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hints")
    val path = dir.resolve("cost_hints.json").toString
    val costs = Map("q01_filter_project" -> 0.31, "t04_winnowing" -> 6.25,
      "d07_simhash_pairs" -> 5.9)
    Bench.saveCostHints(path, costs)
    val loaded = Bench.loadCostHints(path)
    assert(loaded === costs)
    // sorted cheapest-first on disk for human diffing
    val body = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    assert(body.indexOf("q01_filter_project") < body.indexOf("d07_simhash_pairs"))
    assert(body.indexOf("d07_simhash_pairs") < body.indexOf("t04_winnowing"))
  }

  test("missing or malformed hints degrade to empty (baked-in fallback)") {
    assert(Bench.loadCostHints("/nonexistent/path/hints.json") === Map.empty)
    val dir = java.nio.file.Files.createTempDirectory("graft-hints")
    val bad = dir.resolve("bad.json")
    java.nio.file.Files.write(bad, "not json at all {{{".getBytes("UTF-8"))
    assert(Bench.loadCostHints(bad.toString) === Map.empty)
  }

  test("parseCostHints tolerates scientific notation and ignores junk values") {
    val parsed = Bench.parseCostHints("""{"a":1.5e-1,"b":2,"c":0.75}""")
    assert(parsed === Map("a" -> 0.15, "b" -> 2.0, "c" -> 0.75))
  }
}
