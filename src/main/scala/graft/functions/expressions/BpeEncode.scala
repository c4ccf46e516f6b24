package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: apply a learned BPE merge list (Sennrich
  * et al., "Neural Machine Translation of Rare Words with Subword
  * Units", arXiv:1508.07909 §3.2) to a text column — the ENCODE half of
  * the tokenizer lifecycle whose TRAIN half is
  * [[graft.functions.TextFunctions.bpeTrain]]. Where [[GreedyTokenize]]
  * segments by longest-match against a flat vocabulary (the
  * WordPiece-style walk), BPE applies the trainer's merge OPERATIONS in
  * the order they were learned, so encode reproduces exactly the
  * segmentation the trainer's final state assigns to every word it saw.
  *
  * Semantics (mirrored by the t37/t38 DuckDB oracles' list_reduce
  * folds): whitespace splits words (merges never cross a word
  * boundary); each word starts as its code-point sequence; merges apply
  * in rank order, each as ONE left-to-right non-overlapping pass
  * (`[a,a,a]` under `(a,a)` gives `[aa,a]`); the output is every word's
  * final token strings concatenated in document order. Unknown
  * characters are their own tokens — BPE has no UNK by construction.
  *
  * Implementation is the min-rank-repeat loop (the GPT-2 encoder's
  * form): repeatedly find the lowest-rank pair adjacent anywhere in the
  * word and run that rank's single pass. For a WELL-FORMED merge list —
  * every side of merge `i` is a single code point or the output of an
  * earlier merge, which any [[graft.functions.TextFunctions.bpeTrain]]
  * output satisfies — the two forms are provably identical: a merge at
  * rank `r` only creates tokens whose own creating rank is `r`, so it
  * can never create an adjacency some rank `< r` would have consumed
  * (BpeSpec pins the equivalence against the literal sequential-pass
  * reference). Ill-formed lists are rejected up front, because for them
  * the forms genuinely diverge. Why min-rank-repeat: its cost is
  * O(word length squared) hash lookups INDEPENDENT of the merge count,
  * where the sequential form scans all M merges per word — at a
  * production M = 50k over 10^9 documents that difference is the whole
  * budget.
  *
  * Scale: a pure per-row projection over a rank map built ONCE per
  * expression instance (the merge list is a plan literal — the
  * broadcast-artifact contract, same as the t27 trie and the PQ
  * codebooks) — zero shuffle, codegen'd, runs inside the parquet scan
  * stage like every other text kernel here.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  BpeEncode.validate(merges)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects string, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val table = new BpeEncode.Merges(merges)

  override def nullSafeEval(input: Any): Any =
    BpeEncode.compute(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("merges", table,
      classOf[BpeEncode.Merges].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.BpeEncode.compute($c, $m);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {

  /** Column-level entry point. */
  def apply(s: Column, merges: Seq[(String, String)]): Column =
    GraftExpressionBridge.column(
      BpeEncode(GraftExpressionBridge.expression(s), merges))

  private def isSingleCodePoint(s: String): Boolean =
    s.nonEmpty && s.length == Character.charCount(s.codePointAt(0))

  /** Reject empty or whitespace-bearing sides, duplicate pairs, and
    * ill-formed lists (a side that is neither a single code point nor
    * an earlier merge's output) — the precondition under which
    * min-rank-repeat equals the documented sequential-pass semantics.
    */
  private[expressions] def validate(merges: Seq[(String, String)]): Unit = {
    require(merges.nonEmpty, "bpe_encode: empty merge list")
    require(merges.forall(m => m._1.nonEmpty && m._2.nonEmpty),
      "bpe_encode: merge with an empty side")
    require(merges.forall(m => !(m._1 + m._2).exists(isWs)),
      "bpe_encode: merge side contains whitespace (words are " +
        "whitespace-split, so such a merge could never apply)")
    require(merges.distinct.size == merges.size,
      "bpe_encode: duplicate merge pair (later copy could never apply)")
    val made = new java.util.HashSet[String]()
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      require((isSingleCodePoint(l) || made.contains(l)) &&
          (isSingleCodePoint(r) || made.contains(r)),
        s"bpe_encode: merge $i ($l, $r) is ill-formed - each side must " +
          "be a single code point or the output of an earlier merge " +
          "(a later-created side would make rank order ambiguous)")
      made.add(l + r)
    }
  }

  /** Rank lookup keyed on `left + ' ' + right` — unambiguous because
    * merge sides are whitespace-free (validated) and word tokens can
    * never contain whitespace. Built once per expression instance and
    * shipped to executors as a codegen reference object. */
  final class Merges(merges: Seq[(String, String)]) extends Serializable {
    private[BpeEncode] val ranks =
      new java.util.HashMap[String, Integer](merges.size * 2)
    merges.iterator.zipWithIndex.foreach { case ((l, r), i) =>
      ranks.put(l + " " + r, Integer.valueOf(i))
    }
    private[BpeEncode] def rank(l: String, r: String): Integer =
      ranks.get(l + " " + r)
  }

  /** The encode loop. Public static so generated code can call it. */
  def compute(s: UTF8String, m: Merges): ArrayData = {
    val str = s.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any](
      math.max(8, str.length / 4))
    var i = 0
    val n = str.length
    while (i < n) {
      // skip the \s+ run (the words() pre-tokenizer's class:
      // space/tab/LF/VT/FF/CR)
      while (i < n && isWs(str.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(str.charAt(i))) i += 1
      if (i > start) encodeWord(str, start, i, m, out)
    }
    new GenericArrayData(out.toArray)
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0B

  private def encodeWord(str: String, start: Int, end: Int, m: Merges,
      out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    // code-point symbols (surrogate pair = one symbol, matching the
    // oracle's regexp_extract_all(w, '.') replay)
    var toks = new scala.collection.mutable.ArrayBuffer[String](end - start)
    var p = start
    while (p < end) {
      val w = Character.charCount(str.codePointAt(p))
      toks += str.substring(p, p + w)
      p += w
    }
    var done = toks.length < 2
    while (!done) {
      // lowest-rank pair adjacent anywhere in the word
      var best: Integer = null
      var j = 0
      while (j < toks.length - 1) {
        val r = m.rank(toks(j), toks(j + 1))
        if (r != null && (best == null || r.intValue() < best.intValue()))
          best = r
        j += 1
      }
      if (best == null) done = true
      else {
        // that rank's single left-to-right non-overlapping pass
        val next = new scala.collection.mutable.ArrayBuffer[String](toks.length)
        var k = 0
        while (k < toks.length) {
          if (k < toks.length - 1 && {
                val r = m.rank(toks(k), toks(k + 1))
                r != null && r.intValue() == best.intValue()
              }) {
            next += toks(k) + toks(k + 1)
            k += 2
          } else {
            next += toks(k)
            k += 1
          }
        }
        toks = next
        if (toks.length < 2) done = true
      }
    }
    var q = 0
    while (q < toks.length) {
      out += UTF8String.fromString(toks(q))
      q += 1
    }
  }
}
