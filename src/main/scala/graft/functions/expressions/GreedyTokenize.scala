package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: DETERMINISTIC greedy longest-match
  * tokenization of a string against a fixed vocabulary — the
  * vocab-driven token ids and counts a training pipeline derives from
  * its ACTUAL tokenizer, where [[graft.functions.TextFunctions.bpeishTokenCount]]
  * only approximates. Sequence packing (t12), shard budgets (p04/s12),
  * and the data card (p05) all consume token counts; this is the exact
  * source for them: `size(tokenizeGreedy(text, vocab))`.
  *
  * Semantics (the WordPiece-style greedy walk, mirrored token for
  * token by the t27 DuckDB oracle's recursive CTE): starting at the
  * left, take the LONGEST vocabulary token matching at the current
  * position and emit its id (the token's 0-based index in `vocab`);
  * if none matches, emit `-1` (UNK) and advance ONE code point —
  * code point, not Java char, so positions agree with codepoint-
  * addressed engines (DuckDB `substr`) on any plane. Duplicate or
  * empty vocab entries are rejected up front (with distinct entries a
  * same-length tie at one position would be the same string, so the
  * longest match is unique and the walk deterministic).
  *
  * Scale: a pure per-row projection over a trie built ONCE per
  * expression instance (the vocab is a plan literal — the broadcast-
  * artifact contract, same as the PQ codebooks) — zero shuffle,
  * codegen'd, each position costs one trie descent bounded by the
  * longest vocab token. At 100 TB this runs inside the parquet scan
  * stage like every other text kernel here.
  */
case class GreedyTokenize(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  require(vocab.nonEmpty, "tokenize_greedy: empty vocabulary")
  require(vocab.forall(_.nonEmpty),
    "tokenize_greedy: empty-string vocab entry (would never advance)")
  require(vocab.distinct.size == vocab.size,
    "tokenize_greedy: duplicate vocab entries (ids would be ambiguous)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"tokenize_greedy expects string, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val trie = new GreedyTokenize.Trie(vocab)

  override def nullSafeEval(input: Any): Any =
    GreedyTokenize.compute(input.asInstanceOf[UTF8String], trie)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("trie", trie,
      classOf[GreedyTokenize.Trie].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.GreedyTokenize.compute($c, $t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GreedyTokenize {

  /** Column-level entry point. */
  def apply(s: Column, vocab: Seq[String]): Column =
    GraftExpressionBridge.column(
      GreedyTokenize(GraftExpressionBridge.expression(s), vocab))

  /** Char-keyed prefix trie over the vocabulary; `id >= 0` marks a
    * word end. Built once per expression instance, shipped to
    * executors as a codegen reference object. */
  final class Trie(vocab: Seq[String]) extends Serializable {
    private[GreedyTokenize] val root = new Node
    vocab.iterator.zipWithIndex.foreach { case (tok, id) =>
      var n = root
      var i = 0
      while (i < tok.length) {
        var kid = n.kids.get(tok.charAt(i))
        if (kid == null) {
          kid = new Node
          n.kids.put(tok.charAt(i), kid)
        }
        n = kid
        i += 1
      }
      n.id = id
    }
  }

  private[GreedyTokenize] final class Node extends Serializable {
    var id: Int = -1
    val kids = new java.util.HashMap[Character, Node]()
  }

  /** The greedy walk. Public static so generated code can call it. */
  def compute(s: UTF8String, trie: Trie): ArrayData = {
    val str = s.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any](
      math.max(8, str.length / 4))
    var pos = 0
    while (pos < str.length) {
      // longest match from pos: descend while chars match, remember
      // the deepest word-end seen
      var n = trie.root
      var i = pos
      var bestId = -1
      var bestEnd = -1
      var live = true
      while (live && i < str.length) {
        n = n.kids.get(str.charAt(i))
        if (n == null) live = false
        else {
          i += 1
          if (n.id >= 0) { bestId = n.id; bestEnd = i }
        }
      }
      if (bestId >= 0) {
        out += bestId
        pos = bestEnd
      } else {
        out += -1
        // UNK advances one CODE POINT (surrogate pair = one token),
        // keeping positions aligned with codepoint-addressed mirrors
        pos += Character.charCount(str.codePointAt(pos))
      }
    }
    new GenericArrayData(out.toArray)
  }
}
