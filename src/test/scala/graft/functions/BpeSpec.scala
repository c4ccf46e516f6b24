package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.SparkSpec

/** BPE tokenizer lifecycle (t36/t37/t38): the distributed trainer
  * against an INDEPENDENT in-memory reference implementation (plain
  * nested loops, sequential-pass apply — no shared code), the encode
  * expression's min-rank-repeat against the literal sequential-pass
  * semantics it documents, the artifact round-trip, and the loud
  * guards.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  // ---- independent reference implementation (sequential-pass form) ----

  /** One left-to-right non-overlapping pass of a single merge. */
  private def refPass(syms: List[String], l: String, r: String): List[String] =
    syms match {
      case a :: b :: rest if a == l && b == r => (l + r) :: refPass(rest, l, r)
      case a :: rest => a :: refPass(rest, l, r)
      case Nil => Nil
    }

  /** Sequential apply: every merge in rank order, one pass each. */
  private def refApply(word: String,
      merges: Seq[(String, String)]): List[String] = {
    var syms = word.codePoints().toArray.toList
      .map(cp => new String(Character.toChars(cp)))
    merges.foreach { case (l, r) => syms = refPass(syms, l, r) }
    syms
  }

  /** Reference trainer: literal Sennrich loop over a word-freq map. */
  private def refTrain(ws: Seq[String], numMerges: Int,
      minPairCount: Long = 1L,
      minWordCount: Long = 1L): Seq[(String, String)] = {
    val freq = ws.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minWordCount).toMap
    var state: Map[String, (List[String], Long)] = freq.map { case (w, f) =>
      (w, (w.codePoints().toArray.toList
        .map(cp => new String(Character.toChars(cp))), f))
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var stop = false
    while (out.size < numMerges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.values.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        if (best._2 < minPairCount) stop = true
        else {
          out += best._1
          state = state.map { case (w, (syms, f)) =>
            (w, (refPass(syms, best._1._1, best._1._2), f))
          }
        }
      }
    }
    out.toSeq
  }

  private def trainSpark(ws: Seq[String], numMerges: Int,
      minPairCount: Long = 1L, minWordCount: Long = 1L): Seq[(String, String)] =
    TextFunctions.bpeTrain(ws.toDF("text"), col("text"), numMerges,
        minPairCount, minWordCount)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  private def encodeSpark(text: String,
      merges: Seq[(String, String)]): Seq[String] =
    Seq(text).toDF("t")
      .select(TextFunctions.bpeEncode(col("t"), merges).as("tok"))
      .head.getSeq[String](0)

  // the Sennrich corpus (arXiv:1508.07909 fig. 1 shape, no EOW marker):
  // hand-derivable merge order incl. three tie-breaks
  private val Sennrich: Seq[String] =
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")

  test("trainer learns the hand-derived Sennrich merges in order") {
    val merges = trainSpark(Sennrich, 7)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"),
      ("e", "w"), ("ew", "est"), ("n", "ewest")))
  }

  test("distributed trainer == independent reference on random corpora") {
    val rnd = new scala.util.Random(42)
    (1 to 4).foreach { trial =>
      val alphabet = "abcd"
      val ws = Seq.fill(60 + trial * 10)(
        (0 until (1 + rnd.nextInt(7)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      assert(trainSpark(ws, 10) === refTrain(ws, 10),
        s"trial $trial diverged")
    }
  }

  test("encode min-rank-repeat == sequential-pass reference on trained lists") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    val ws = Seq.fill(80)(
      (0 until (1 + rnd.nextInt(8)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val merges = refTrain(ws, 12)
    // encode both seen words and fresh ones (incl. unknown chars)
    val probes = ws.take(20) ++ Seq("abcabc", "cccc", "xyzzy", "aXbYc")
    probes.foreach { w =>
      assert(encodeSpark(w, merges) === refApply(w, merges), s"word $w")
    }
  }

  test("encode fixtures: one-pass non-overlap, rank order, words, unknowns") {
    // single left-to-right pass: [a,a,a] under (a,a) -> [aa, a]
    assert(encodeSpark("aaa", Seq(("a", "a"))) === Seq("aa", "a"))
    // rank order chains: (a,b) then (ab,c)
    assert(encodeSpark("abcabc", Seq(("a", "b"), ("ab", "c")))
      === Seq("abc", "abc"))
    // merges never cross the whitespace word boundary
    assert(encodeSpark("a b", Seq(("a", "b"))) === Seq("a", "b"))
    // unknown characters are their own tokens (no UNK)
    assert(encodeSpark("qab", Seq(("a", "b"))) === Seq("q", "ab"))
    // empty and all-whitespace inputs produce zero tokens
    assert(encodeSpark("", Seq(("a", "b"))) === Seq.empty)
    assert(encodeSpark("  \t ", Seq(("a", "b"))) === Seq.empty)
    // null stays null (expression null semantics)
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
      .select(TextFunctions.bpeEncode(col("t"), Seq(("a", "b"))).as("tok"))
      .head
    assert(r.isNullAt(0))
  }

  private def trainIncSpark(ws: Seq[String], numMerges: Int,
      minPairCount: Long = 1L, minWordCount: Long = 1L): Seq[(String, String)] =
    TextFunctions.bpeTrainIncremental(ws.toDF("text"), col("text"),
        numMerges, minPairCount, minWordCount)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  test("incremental trainer is bit-equal to the from-scratch trainer " +
      "(Sennrich tie-breaks, random corpora, knob parity)") {
    // the hand-derived fixture incl. its three tie-breaks
    assert(trainIncSpark(Sennrich, 7) === trainSpark(Sennrich, 7))
    // random corpora, enough merges that training exhausts some pairs
    val rnd = new scala.util.Random(1234)
    (1 to 3).foreach { trial =>
      val alphabet = "abcd"
      val ws = Seq.fill(50 + trial * 20)(
        (0 until (1 + rnd.nextInt(7)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      assert(trainIncSpark(ws, 12) === refTrain(ws, 12),
        s"trial $trial diverged from the reference")
    }
    // knob parity: early stop below minPairCount, hapax pruning
    val ws = Seq("ab", "ab", "cd")
    assert(trainIncSpark(ws, 5, minPairCount = 3L) === Seq.empty)
    assert(trainIncSpark(ws, 1, minWordCount = 2L) === Seq(("a", "b")))
    // pair exhaustion: more merges requested than pairs exist
    assert(trainIncSpark(Seq("ab"), 10) === refTrain(Seq("ab"), 10))
  }

  private def trainBatchedSpark(ws: Seq[String], numMerges: Int,
      batch: Int, minPairCount: Long = 1L,
      minWordCount: Long = 1L): Seq[(String, String)] =
    TextFunctions.bpeTrainBatched(ws.toDF("text"), col("text"),
        numMerges, batch, minPairCount, minWordCount)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  test("batched trainer: bit-equal to bpeTrain at batch=1; batched " +
      "rounds select pairwise symbol-disjoint pairs in Sennrich order") {
    // batch=1 degenerates to the global argmax — bit-equal everywhere
    assert(trainBatchedSpark(Sennrich, 7, batch = 1) ===
      trainSpark(Sennrich, 7))
    val rnd = new scala.util.Random(77)
    (1 to 2).foreach { trial =>
      val alphabet = "abcd"
      val ws = Seq.fill(60 + trial * 20)(
        (0 until (1 + rnd.nextInt(7)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      assert(trainBatchedSpark(ws, 12, batch = 1) === refTrain(ws, 12),
        s"trial $trial diverged at batch=1")
      // batch=4: the documented batched rule — within every round the
      // selected pairs share no symbol, so the merges commute; the
      // result is a VALID deterministic merge list of the requested
      // length over the same corpus (not necessarily sequential
      // Sennrich — that is the documented semantics seam)
      val batched = trainBatchedSpark(ws, 12, batch = 4)
      assert(batched.size === refTrain(ws, 12).size)
      assert(batched.distinct.size === batched.size, "duplicate merges")
      // determinism: a rerun reproduces the list exactly
      assert(trainBatchedSpark(ws, 12, batch = 4) === batched)
    }
    // knob parity and exhaustion at batch > 1
    val ws = Seq("ab", "ab", "cd")
    assert(trainBatchedSpark(ws, 5, batch = 4, minPairCount = 3L)
      === Seq.empty)
    assert(trainBatchedSpark(ws, 1, batch = 4, minWordCount = 2L)
      === Seq(("a", "b")))
    assert(trainBatchedSpark(Seq("ab"), 10, batch = 4)
      === refTrain(Seq("ab"), 10))
    // disjointness observable on a crafted corpus: 'a b' and 'b c'
    // conflict on b — one round may select only the winner, the loser
    // (or its successor pair) lands in a later round, and the final
    // list still covers the corpus deterministically
    val crafted = Seq.fill(10)("abc") ++ Seq.fill(6)("bc") ++
      Seq.fill(5)("ab")
    val got = trainBatchedSpark(crafted, 3, batch = 2)
    assert(got.nonEmpty && got.distinct.size === got.size)
  }

  test("trainer knobs: minPairCount stops early, minWordCount prunes") {
    // best pair count is 2 ("ab" twice); threshold 3 stops before any merge
    val ws = Seq("ab", "ab", "cd")
    assert(trainSpark(ws, 5, minPairCount = 3L) === Seq.empty)
    assert(trainSpark(ws, 5, minPairCount = 3L)
      === refTrain(ws, 5, minPairCount = 3L))
    // minWordCount drops the hapax "cd" before any counting
    assert(trainSpark(ws, 1, minWordCount = 2L) === Seq(("a", "b")))
  }

  test("ill-formed or degenerate merge lists are rejected loudly") {
    def enc(merges: Seq[(String, String)]): Unit = {
      encodeSpark("ab", merges); ()
    }
    val e1 = intercept[IllegalArgumentException](enc(Seq.empty))
    assert(e1.getMessage.contains("empty merge list"))
    val e2 = intercept[IllegalArgumentException](enc(Seq(("a", ""))))
    assert(e2.getMessage.contains("empty side"))
    val e3 = intercept[IllegalArgumentException](
      enc(Seq(("a", "b"), ("a", "b"))))
    assert(e3.getMessage.contains("duplicate"))
    // (x, yz) before yz exists: the case where min-rank-repeat and
    // sequential-pass genuinely diverge -> must be rejected, not chosen
    val e4 = intercept[IllegalArgumentException](
      enc(Seq(("x", "yz"), ("y", "z"))))
    assert(e4.getMessage.contains("ill-formed"))
    val e5 = intercept[IllegalArgumentException](enc(Seq(("a b", "c"))))
    assert(e5.getMessage.contains("whitespace"))
  }

  test("artifact round-trip: model + meta, encode bit-equal to live") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    try {
      val corpus = Sennrich.toDF("text")
      TextFunctions.writeBpeModel(corpus, col("text"), dir,
        numMerges = 7, minPairCount = 1L, minWordCount = 1L)
      val meta = spark.read.parquet(s"$dir/meta").head
      assert(meta.getAs[Int]("num_merges") === 7)
      assert(meta.getAs[Long]("min_pair_count") === 1L)
      assert(meta.getAs[Long]("min_word_count") === 1L)
      val merges = TextFunctions.readBpeModel(spark, dir)
      assert(merges === trainSpark(Sennrich, 7))
      val docs = Seq((1L, "lowest newest low"), (2L, "wider than widest"))
        .toDF("doc_id", "text")
      val viaModel = TextFunctions.bpeEncodeWithModel(docs, col("text"), dir)
        .select(col("doc_id"), col("bpe_tokens")).collect()
        .map(r => (r.getLong(0), r.getSeq[String](1))).toMap
      val live = docs.select(col("doc_id"),
          TextFunctions.bpeEncode(col("text"), merges).as("tok")).collect()
        .map(r => (r.getLong(0), r.getSeq[String](1))).toMap
      assert(viaModel === live)
    } finally {
      def rm(p: java.io.File): Unit = {
        val cs = p.listFiles(); if (cs != null) cs.foreach(rm); p.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("codegen and interpreted evaluation agree on corpus prose") {
    val merges = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("in", "g"),
      ("e", "r"), ("a", "n"))
    val docs = graft.Tables.df(spark, sf(), "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        TextFunctions.bpeEncode(col("text"), merges).as("tok"))
    // the '*(1)' marker: the bpeencode projection sits INSIDE the
    // whole-stage-codegen span over the parquet scan
    assert(docs.queryExecution.executedPlan.toString
      .matches("(?s).*\\*\\(1\\) Project .*bpeencode.*"))
    val viaCodegen = docs.collect().map(r =>
      r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaInterp = spark.createDataFrame(docs.rdd, docs.schema) // breaks WSCG
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaCodegen === viaInterp)
    assert(viaCodegen.nonEmpty)
  }
}
