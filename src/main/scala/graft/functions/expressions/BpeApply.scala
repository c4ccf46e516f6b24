package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: apply an ORDERED list of BPE merges to
  * an EXISTING token array — the mid-training sibling of [[BpeEncode]]
  * (which starts from raw text and a WELL-FORMED full merge list).
  * [[graft.functions.TextFunctions.bpeTrainBatched]] is the caller:
  * each driver round applies its batch of pairwise symbol-disjoint
  * merges to the touched words' current tokenization, and the batch is
  * NOT a well-formed prefix list (its sides are symbols created in
  * earlier rounds), so [[BpeEncode]]'s min-rank-repeat shortcut does
  * not apply. Semantics are exactly the sequential form the t46 oracle
  * replays: each merge in list order, as ONE left-to-right
  * non-overlapping pass over the tokens.
  *
  * Why native: the equivalent Catalyst formulation is `batch` nested
  * `aggregate` higher-order functions, each allocating a fresh array
  * per element per row — measured at ~2.7× the incremental trainer's
  * per-round wall. This is a tight O(batch · length) imperative loop
  * with two reused buffers, codegen'd into the scan stage.
  */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  BpeApply.validate(merges)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bpe_apply expects array<string>, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val table = new BpeApply.Batch(merges)

  override def nullSafeEval(input: Any): Any =
    BpeApply.compute(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("merges", table,
      classOf[BpeApply.Batch].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.BpeApply.compute($c, $m);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeApply {

  /** Column-level entry point. */
  def apply(s: Column, merges: Seq[(String, String)]): Column =
    GraftExpressionBridge.column(
      BpeApply(GraftExpressionBridge.expression(s), merges))

  private[expressions] def validate(merges: Seq[(String, String)]): Unit = {
    require(merges.nonEmpty, "bpe_apply: empty merge list")
    require(merges.forall(m => m._1.nonEmpty && m._2.nonEmpty),
      "bpe_apply: merge with an empty side")
    require(merges.distinct.size == merges.size,
      "bpe_apply: duplicate merge pair (later copy could never apply)")
  }

  /** The batch, pre-converted once per expression instance and shipped
    * to executors as a codegen reference object. */
  final class Batch(merges: Seq[(String, String)]) extends Serializable {
    private[BpeApply] val left: Array[UTF8String] =
      merges.map(m => UTF8String.fromString(m._1)).toArray
    private[BpeApply] val right: Array[UTF8String] =
      merges.map(m => UTF8String.fromString(m._2)).toArray
    private[BpeApply] val joined: Array[UTF8String] =
      merges.map(m => UTF8String.fromString(m._1 + m._2)).toArray
  }

  /** Public static so generated code can call it. */
  def compute(arr: ArrayData, m: Batch): ArrayData = {
    var n = arr.numElements()
    var toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    var b = 0
    while (b < m.left.length && n >= 2) {
      val l = m.left(b)
      val r = m.right(b)
      // one left-to-right non-overlapping pass for this merge, writing
      // compactly into the same buffer
      var read = 0
      var write = 0
      while (read < n) {
        if (read < n - 1 && toks(read).equals(l) && toks(read + 1).equals(r)) {
          toks(write) = m.joined(b)
          read += 2
        } else {
          toks(write) = toks(read)
          read += 1
        }
        write += 1
      }
      n = write
      b += 1
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = toks(i); i += 1 }
    new GenericArrayData(out)
  }
}
