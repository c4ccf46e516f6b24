package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the DISTINCT word n-gram shingle array
  * of a word array in one pass — the row-level kernel of
  * [[graft.functions.Dedup.shingleRows]], every shingle-based
  * operator's first stage.
  *
  * BIT-IDENTICAL to `array_distinct(wordShingles(words, n))`: same
  * space-joined shingle strings (`concat_ws(" ", w[i..i+n-1])` — null
  * words skipped, empty strings kept), same first-occurrence order,
  * empty array below n words.
  *
  * Why native: the HOF form evaluates an interpreted
  * transform-lambda per window — n `element_at` probes plus a
  * `concat_ws` tree per shingle, millions of interpreted calls per
  * partition — then a second full array pass for `array_distinct`.
  * Here one loop over the word array builds and dedups the shingles;
  * and because a plain unary expression evaluates its CHILD once per
  * row (HOF lambdas re-evaluate captured expressions per element),
  * callers may inline `words(text)` directly without the
  * materialize-first rule the HOF needed.
  */
case class DistinctWordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"distinct_word_shingles: n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"distinct_word_shingles expects array<string>, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    DistinctWordShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.DistinctWordShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DistinctWordShingles {

  /** Column-level entry point. */
  def apply(words: Column, n: Int): Column =
    GraftExpressionBridge.column(
      DistinctWordShingles(GraftExpressionBridge.expression(words), n))

  private val Space = UTF8String.fromString(" ")

  /** The fused kernel. Public static so generated code can call it. */
  def compute(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet preserves first-occurrence order = array_distinct
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) {
        // concat_ws skips NULL elements; the splitter never emits them,
        // but match the HOF exactly if a caller hands nulls
        window(j) = if (words.isNullAt(i + j)) null
          else words.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(Space, window: _*))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
