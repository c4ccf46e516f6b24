package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fuzzy record linkage (`Dedup.linkRecordPairs` / `linkRecords`):
  * blocking, bounded edit-distance pairing, hot-block guard, and
  * transitive-closure entity assignment. The d24 gate proves the full
  * pipeline against the DuckDB oracle (identical levenshtein DP); here
  * we pin blocking semantics, the chain case, the guard, and its
  * accounting.
  */
class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  private lazy val recs = Seq(
    // block "X": a typo chain — smith / smyth / smythe link pairwise
    // at dist <= 1, smith–smythe only transitively (dist 2)
    (1L, "smith", "X"), (2L, "smyth", "X"), (3L, "smythe", "X"),
    // block "X": unrelated name, no links
    (4L, "jones", "X"),
    // block "Y": same surface forms as 1/2, but a different block —
    // must NOT link across blocks
    (5L, "smith", "Y"), (6L, "taylor", "Y")
  ).toDF("rec_id", "name", "blk")

  test("pairs: within-block edit-distance matches only") {
    val pairs = Dedup.linkRecordPairs(recs, col("rec_id"), col("name"),
        col("blk"), maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // smith~smyth (1), smyth~smythe (1); smith~smythe is dist 2; no
    // cross-block pair (1,5) despite identical names' block mates
    assert(pairs == Set((1L, 2L, 1), (2L, 3L, 1)))
  }

  test("entities: transitive closure links the chain, singletons keep themselves") {
    val ents = Dedup.linkRecords(recs, col("rec_id"), col("name"),
        col("blk"), maxDist = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ents == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 5L, 6L -> 6L))
  }

  test("hot-block guard: an oversized block is dropped and accounted") {
    // a degenerate "UNKNOWN" block of 5 identical names would do 10
    // pairwise comparisons; cap at 4 members
    val dirty = recs.unionByName(
      (10L to 14L).map(i => (i, "unknown", "Z")).toDF("rec_id", "name", "blk"))
    val pairs = Dedup.linkRecordPairs(dirty, col("rec_id"), col("name"),
        col("blk"), maxDist = 1, maxBlockSize = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)), "Z block must contribute no pairs")
    val dropped = Dedup.linkDroppedBlocks(dirty, col("blk"), maxBlockSize = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dropped == Map("Z" -> 5L))
    // guarded records still get (singleton) entity assignments
    val ents = Dedup.linkRecords(dirty, col("rec_id"), col("name"),
        col("blk"), maxDist = 1, maxBlockSize = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (10L to 14L).foreach(i => assert(ents(i) == i))
  }

  test("canonical selection: highest keepBy wins, ties take the lowest id") {
    val scored = Seq(
      (1L, "smith", "X", 10.0), (2L, "smyth", "X", 90.0),
      (3L, "smythe", "X", 90.0), (4L, "jones", "X", 50.0)
    ).toDF("rec_id", "name", "blk", "score")
    val out = Dedup.linkRecordsCanonical(scored, col("rec_id"), col("name"),
        col("blk"), maxDist = 1, keepBy = col("score"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // chain 1-2-3 → entity 1, canonical = id 2 (score 90 ties with 3,
    // lower id wins); singleton 4 is its own canonical
    assert(out == Map(1L -> ((1L, 2L)), 2L -> ((1L, 2L)),
      3L -> ((1L, 2L)), 4L -> ((4L, 4L))))
  }

  test("maxDist 0 degenerates to exact-match linkage within blocks") {
    val ents = Dedup.linkRecords(recs.unionByName(
        Seq((7L, "smith", "X")).toDF("rec_id", "name", "blk")),
        col("rec_id"), col("name"), col("blk"), maxDist = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ents(7L) == 1L)
    assert(ents(2L) == 2L, "smyth no longer links at dist 0")
  }

  test("sorted-neighborhood: pairs within the rank window only") {
    // sorted by name: aaaa(0) aaab(1) aaac(2) zzzz(3)
    val df = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "aaac"), (4L, "zzzz"))
      .toDF("rec_id", "name")
    def run(w: Int) = Dedup.linkRecordPairsSorted(df, col("rec_id"),
        col("name"), col("name"), window = w, maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // window 2: adjacent ranks only — (aaaa,aaab), (aaab,aaac); the
    // dist-1 pair (aaaa,aaac) sits 2 positions apart and must NOT pair
    assert(run(2) == Set((1L, 2L, 1), (2L, 3L, 1)))
    // window 3 reaches it; zzzz pairs with nothing at dist 1
    assert(run(3) == Set((1L, 2L, 1), (2L, 3L, 1), (1L, 3L, 1)))
  }

  test("sorted-neighborhood: a constant key cannot create a hot block") {
    // the degenerate all-same-key case that forces linkRecordPairs'
    // guard to drop the block entirely: SNM's candidate count stays
    // exactly n·(window-1) and the order falls to the id tiebreak
    val dirty = (1L to 6L).map(i => (i, "unknown")).toDF("rec_id", "name")
    val pairs = Dedup.linkRecordPairsSorted(dirty, col("rec_id"),
        col("name"), lit("k"), window = 2, maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)))
  }

  test("sorted-neighborhood: ranks are exact across partition boundaries") {
    // 40 ids under 32 shuffle partitions → the range partitioning
    // splits the sorted order many times; every adjacent-rank pair
    // must still appear exactly once (no boundary loss, no dup)
    val df = (1L to 40L).map(i => (i, f"n$i%03d")).toDF("rec_id", "name")
    val pairs = Dedup.linkRecordPairsSorted(df, col("rec_id"),
        col("name"), col("name"), window = 2, maxDist = 99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == 39)
    assert(pairs.toSet == (1L to 39L).map(i => (i, i + 1)).toSet)
  }

  test("multi-pass SNM: a second ordering recovers first-char typos " +
      "the name sort teleports away; duplicates collapse to one row") {
    // 30 sorted names + ONE first-character typo twin of n015: under
    // the name sort 'x015…' lands after everything (30 positions from
    // its mate — invisible to window 4); reverse(name) keys on the
    // untouched suffix and puts the pair adjacent
    val base = (1L to 30L).map(i => (i, f"n$i%03dq")).toDF("rec_id", "name")
    val df = base.unionByName(Seq((999L, "x015q")).toDF("rec_id", "name"))
    def pairsOf(keys: Seq[org.apache.spark.sql.Column]) =
      Dedup.linkRecordPairsSortedMulti(df, col("rec_id"), col("name"),
          keys, window = 4, maxDist = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val single = pairsOf(Seq(col("name")))
    assert(!single.contains((15L, 999L, 1)),
      "the single ordering should NOT see the teleported typo (test setup)")
    val multi = pairsOf(Seq(col("name"), reverse(col("name"))))
    assert(multi.contains((15L, 999L, 1)),
      s"reverse ordering must recover the typo pair: $multi")
    // recall composes: every single-pass pair survives the union…
    assert(single.subsetOf(multi))
    // …and multi-pass duplicates collapsed: one row per (id_a, id_b)
    val multiKeys = multi.toSeq.map(p => (p._1, p._2))
    assert(multiKeys.distinct.size == multiKeys.size)
  }
}
