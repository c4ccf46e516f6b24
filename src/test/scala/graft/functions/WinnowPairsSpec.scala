package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Dedup.winnowPairs]]: local near-copy detection over shared
  * winnowing fingerprints.
  */
class WinnowPairsSpec extends SparkSpec {
  import spark.implicits._

  private val k = 8
  private val w = 4

  private def fps(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"),
        graft.functions.TextFunctions.gramHashes(col("text"), k).as("__g"))
      .select(col("doc_id"),
        explode(TextFunctions.winnowFromGrams(col("__g"), w)).as("fp"))

  test("a lifted run is caught even when whole-doc similarity is low") {
    // 40-char run copied from doc 1 into doc 2's otherwise-unrelated
    // text — winnowing guarantees shared fingerprints for any copied
    // run of >= k + w - 1 = 11 chars
    val lifted = "zq1wx2ce3rv4bt5ny6um7ik8ol9pa0sd1fg2hj3k"
    val docs = Seq(
      (1L, s"aaaa bbbb cccc $lifted dddd eeee ffff"),
      (2L, s"totally different prose here $lifted and more unrelated text"),
      (3L, "nothing shared with the others at all in this one qqq")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(fps(docs), minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"lifted run not detected: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc matched: $pairs")
  }

  test("maxFpDocFreq drops boilerplate fingerprints from the index") {
    // hand-built index: fp 100 is boilerplate (df = 4), fp 7 is a real
    // shared fingerprint between docs 1 and 2 (df = 2)
    val idx = (Seq(1L, 2L, 3L, 4L).map(d => (d, 100L)) ++
      Seq((1L, 7L), (2L, 7L))).toDF("doc_id", "fp")
    val uncapped = Dedup.winnowPairs(idx, minShared = 1L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(uncapped.size == 6 && uncapped((1L, 2L)) == 2L, s"$uncapped")
    val capped = Dedup.winnowPairs(idx, minShared = 1L, maxFpDocFreq = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // only the rare fingerprint survives: exactly the (1,2) pair, and
    // its shared count no longer includes the dropped boilerplate hit
    assert(capped == Map((1L, 2L) -> 1L),
      s"boilerplate fingerprints survived the doc-freq cap: $capped")
  }

  test("shared counts equal the brute-force intersection") {
    val docs = Seq(
      (1L, "abcdefghijklmnop qrstuvwx"),
      (2L, "abcdefghijklmnop yz012345"),
      (3L, "zzzzzzzzzzzzzzzz 99999999")
    ).toDF("doc_id", "text")
    val f = fps(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = (for {
      a <- f.keys; b <- f.keys if a < b
      n = f(a).intersect(f(b)).size if n >= 1
    } yield ((a, b), n.toLong)).toMap
    val got = Dedup.winnowPairs(fps(docs), minShared = 1L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == want, s"got $got want $want")
  }
}
