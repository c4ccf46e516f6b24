package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The vocab-driven greedy tokenizer
  * ([[TextFunctions.tokenizeGreedy]] / `expressions.GreedyTokenize`):
  * longest-match semantics, UNK codepoint advance, constructor
  * rejections, codegen/interpreted parity, and the exact-count
  * integration with [[TextFunctions.packSequences]]. The t27 gate
  * hash-checks the walk against the DuckDB recursive mirror; here we
  * pin what the oracle can't express.
  */
class TokenizeGreedySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq("the", "th", "he", "a", "ab", "abc", "ing")

  private def ids(texts: String*): Seq[Seq[Int]] =
    texts.toSeq.toDF("txt")
      .select(TextFunctions.tokenizeGreedy(col("txt"), vocab).as("ids"))
      .collect().map(_.getSeq[Int](0).toSeq).toSeq

  test("longest match wins over every shorter prefix; UNK fills gaps") {
    assert(ids("theatre") == Seq(Seq(0, 3, -1, -1, -1))) // the|a|t|r|e
    assert(ids("abcabx") == Seq(Seq(5, 4, -1)))          // abc|ab|x
    assert(ids("thething") == Seq(Seq(0, 1, 6)))         // the|th|ing
    assert(ids("ab") == Seq(Seq(4)))                     // exact at end
    assert(ids("") == Seq(Seq.empty[Int]))               // empty → none
    assert(ids("zzz") == Seq(Seq(-1, -1, -1)))           // all UNK
  }

  test("UNK advances one CODE POINT: a surrogate pair is one token") {
    // U+1F600 (astral, 2 Java chars) twice, then a vocab hit
    val astral = new String(Character.toChars(0x1F600))
    assert(ids(s"$astral${astral}the") == Seq(Seq(-1, -1, 0)),
      "surrogate pair must consume as ONE UNK, not two")
  }

  test("degenerate vocabs fail loudly at construction") {
    intercept[IllegalArgumentException](
      TextFunctions.tokenizeGreedy(col("t"), Seq.empty))
    intercept[IllegalArgumentException](
      TextFunctions.tokenizeGreedy(col("t"), Seq("a", "")))
    intercept[IllegalArgumentException](
      TextFunctions.tokenizeGreedy(col("t"), Seq("a", "b", "a")))
  }

  test("codegen and interpreted evaluation agree on corpus prose") {
    val docs = graft.Tables.df(spark, sf(), "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        TextFunctions.tokenizeGreedy(col("text"), vocab).as("ids"))
    val viaCodegen = docs.collect().map(r =>
      r.getLong(0) -> r.getSeq[Int](1)).toMap
    val viaInterp = spark.createDataFrame(docs.rdd, docs.schema) // breaks WSCG
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(viaCodegen == viaInterp)
    assert(viaCodegen.nonEmpty && viaCodegen.values.exists(_.contains(0)),
      "corpus prose should hit 'the' somewhere")
  }

  test("exact counts feed packSequences: same bins as a precomputed column") {
    val docs = graft.Tables.df(spark, sf(), "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), col("lang"),
        size(TextFunctions.tokenizeGreedy(col("text"), vocab))
          .cast("long").as("n_tok"))
    val inline = TextFunctions.packSequences(docs, col("lang"),
        col("doc_id"), col("n_tok"), budget = 500L)
      .select(col("doc_id"), col("bin"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pre = docs.persist()
    val materialized = TextFunctions.packSequences(pre, col("lang"),
        col("doc_id"), col("n_tok"), budget = 500L)
      .select(col("doc_id"), col("bin"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pre.unpersist()
    assert(inline == materialized && inline.nonEmpty)
  }
}
