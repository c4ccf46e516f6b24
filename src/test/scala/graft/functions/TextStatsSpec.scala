package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-7 text-quality operators: Gopher-style repetition stats and
  * percentile-band trimming.
  */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("hashEmbed: matches an independent Scala reference; zero shuffle") {
    val docs = Seq((1L, "a b a c"), (2L, "x"), (3L, "a a a a"))
      .toDF("doc_id", "text")
    val dims = 8
    val out = docs.select(col("doc_id"),
        TextFunctions.hashEmbed(col("text"), dims).as("vec"))
    // independent reference: same md5 bucket/sign arithmetic in plain Scala
    def h(w: String): (Int, Long) = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bucket = (java.lang.Long.parseLong(md5.substring(0, 14), 16) % dims).toInt
      val sgn = if (java.lang.Long.parseLong(md5.substring(14, 15), 16) % 2 == 0) 1L else -1L
      (bucket, sgn)
    }
    def ref(text: String): Seq[Long] = {
      val v = Array.fill(dims)(0L)
      text.split("\\s+").foreach { w => val (b, s) = h(w); v(b) += s }
      v.toSeq
    }
    val got = out.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == ref("a b a c"))
    assert(got(2L) == ref("x"))
    assert(got(3L) == ref("a a a a"))
    // repeated word accumulates: doc 3's "a" bucket carries ±4
    assert(got(3L).map(math.abs).sum == 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hashEmbed must not shuffle:\n$plan")
  }

  test("repetitionStats computes known values on crafted docs") {
    val docs = Seq(
      (1L, "a a a b"),        // 4 words, 2 distinct, top word 3, bigrams: "a a","a a","a b"
      (2L, "x y z"),          // all distinct, top word 1, top bigram 1/2
      (3L, "loop")            // single word: no bigrams
    ).toDF("doc_id", "text")
    val got = TextFunctions.repetitionStats(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) null else r.getDouble(4)))).toMap

    assert(got(1L) == ((4L, 0.5, 0.75, 2.0 / 3.0)))
    assert(got(2L) == ((3L, 1.0, 1.0 / 3.0, 0.5)))
    assert(got(3L) == ((1L, 1.0, 1.0, null)))
  }

  test("repetitionStats flags a looped document against the corpus") {
    val docs = Tables.df(spark, sf(), "documents")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((900000L, Seq.fill(40)("spam spam ham").mkString(" ")))
        .toDF("doc_id", "text"))
    val stats = TextFunctions.repetitionStats(docs, col("doc_id"), col("text"))
    // the planted looped doc has the corpus's highest top_bigram_frac
    val top = stats.orderBy(col("top_bigram_frac").desc).select("doc_id")
      .first().getLong(0)
    assert(top == 900000L, s"looped doc not ranked most repetitive: $top")
  }

  test("repetitionStats is a zero-shuffle projection") {
    val plan = TextFunctions.repetitionStats(
        Tables.df(spark, sf(), "documents"), col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("quantileTrim keeps exactly the in-band rows per stratum") {
    // stratum A: 1..10 → p10 = 1.9, p90 = 9.1 (interpolated) → keep 2..9
    // stratum B: 100..104 → p10 = 100.4, p90 = 103.6 → keep 101..103
    val df = ((1 to 10).map(v => ("A", v.toLong)) ++
      (100 to 104).map(v => ("B", v.toLong))).toDF("s", "v")
    val kept = TextFunctions.quantileTrim(df, col("s"), col("v"), 0.10, 0.90)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val expected = ((2 to 9).map(v => ("A", v.toLong)) ++
      (101 to 103).map(v => ("B", v.toLong))).toSet
    assert(kept == expected, s"got $kept")
  }

  test("packSequences: start-offset bins, straddling docs, determinism") {
    // stratum A token runs: 800, 800, 800 → starts 0, 800, 1600 → bins
    // 0, 0, 1 at budget 1000; a 2500-token doc then starts at 2400 →
    // bin 2 (straddles into 4, still ONE row, start bin)
    val df = Seq(
      ("A", 1L, 800L), ("A", 2L, 800L), ("A", 3L, 800L), ("A", 4L, 2500L),
      ("B", 1L, 100L), ("B", 2L, 950L)
    ).toDF("s", "id", "n")
    val got = TextFunctions.packSequences(df, col("s"), col("id"), col("n"), 1000L)
      .select(col("s"), col("id"), col("bin"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == Map(
      ("A", 1L) -> 0L, ("A", 2L) -> 0L, ("A", 3L) -> 1L, ("A", 4L) -> 2L,
      ("B", 1L) -> 0L, ("B", 2L) -> 0L), s"got $got")

    // rerun-stable under a different physical partitioning
    val again = TextFunctions.packSequences(
        df.repartition(7), col("s"), col("id"), col("n"), 1000L)
      .select(col("s"), col("id"), col("bin"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(again == got)
  }

  test("packSequences shuffles once, on the stratum key") {
    val plan = TextFunctions.packSequences(
        graft.Tables.df(spark, sf(), "documents"),
        col("lang"), col("doc_id"), col("n_chars"), 2000L)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1,
      s"expected exactly one Exchange:\n$plan")
  }

  test("chunkDocuments: coverage, overlap, short docs, exact boundaries") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "only three words"),                       // shorter than window
      (3L, (1 to 9).map(i => s"x$i").mkString(" ")))  // ragged tail
      .toDF("doc_id", "text")
    val out = TextFunctions.chunkDocuments(
        docs, col("doc_id"), col("text"), window = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
    val byDoc = out.groupBy(_.getLong(0))
    // n=10, w=4, s=3 → ceil((10-4)/3)+1 = 3 chunks at starts 0,3,6
    assert(byDoc(1L).length == 3)
    assert(byDoc(1L)(0).getString(2) == "w1 w2 w3 w4")
    assert(byDoc(1L)(1).getString(2) == "w4 w5 w6 w7") // 1-token overlap
    assert(byDoc(1L)(2).getString(2) == "w7 w8 w9 w10")
    assert(byDoc(1L).forall(_.getInt(3) == 4))
    // a doc shorter than the window still yields its one full chunk
    assert(byDoc(2L).length == 1)
    assert(byDoc(2L)(0).getString(2) == "only three words")
    assert(byDoc(2L)(0).getInt(3) == 3)
    // ragged tail: last chunk is short but every token is covered
    assert(byDoc(3L).length == 3)
    assert(byDoc(3L)(2).getString(2) == "x7 x8 x9")
    assert(byDoc(3L)(2).getInt(3) == 3)
    // chunk ids are 0-based and dense per doc
    byDoc.values.foreach(rows =>
      assert(rows.map(_.getInt(1)).toSeq == rows.indices.toSeq))
  }

  test("chunkDocuments is a zero-shuffle row-multiplying projection") {
    val plan = TextFunctions.chunkDocuments(
        Tables.df(spark, sf(), "documents"), col("doc_id"), col("text"),
        window = 32, stride = 24)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("quantileTrim broadcasts the bounds (fact side not re-shuffled)") {
    val plan = TextFunctions.quantileTrim(
        Tables.df(spark, sf(), "documents"), col("lang"), col("n_chars"),
        0.10, 0.90)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bounds join is not broadcast:\n$plan")
  }

  test("wordRankScore: mean corpus-frequency rank, ties broken by word") {
    import spark.implicits._
    // corpus counts: the=4 (rank 1), beta=2 (rank 2), alpha=1 and
    // rare=1 tie at count 1 -> alpha rank 3, rare rank 4 (word order)
    val df = Seq(
      (1L, "the the the beta"),
      (2L, "the beta alpha rare")
    ).toDF("doc_id", "text")
    val out = TextFunctions.wordRankScore(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((4L, 1L + 1 + 1 + 2, 5.0 / 4)))
    assert(out(2L) == ((4L, 1L + 2 + 3 + 4, 10.0 / 4)),
      "stopword-heavy doc 1 scores below the rare-token doc 2")
  }

  test("lineLanguageSegments: runs group, boundaries split, und lines") {
    import spark.implicits._
    val df = Seq(
      // en, en, de, en -> 3 segments
      (1L, "the cat and the hat\nof the house\nder hund und nicht\nthe end of it"),
      // single language -> 1 segment
      (2L, "the one and only\nthe other of them"),
      // no markers anywhere -> one und segment
      (3L, "xyzzy plugh")
    ).toDF("doc_id", "text")
    val segs = TextFunctions.lineLanguageSegments(df, col("doc_id"), col("text"))
      .orderBy("doc_id", "seg_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getInt(4), r.getInt(5)))
    assert(segs.toSeq == Seq(
      (1L, 1L, "en", 2L, 0, 1),
      (1L, 2L, "de", 1L, 2, 2),
      (1L, 3L, "en", 1L, 3, 3),
      (2L, 1L, "en", 2L, 0, 1),
      (3L, 1L, "und", 1L, 0, 0)))
  }
}
