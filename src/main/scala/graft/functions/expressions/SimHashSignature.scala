package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: a document's `bits`-wide SimHash
  * signature from its word array in ONE pass — distinct words, ±1 bit
  * votes from each distinct word's portable 56-bit hash, sign fold —
  * as a zero-shuffle per-row projection.
  *
  * BIT-IDENTICAL to the relational formulation the d05/d07/d20 oracles
  * mirror (`explode(words) → distinct → portableHash64 → per-bit vote
  * sums → sign`): same md5-derived word hash
  * ([[PortableHash56]] = `conv(substring(md5(w),1,14),16,10)`), same
  * distinct-word vote set, same `sum > 0` bit rule.
  *
  * Why native, beyond the per-word md5 expression chain: SimHash is a
  * PER-DOCUMENT function, but the relational form pays two wide
  * exchanges to compute it — a global distinct on the exploded
  * (doc, word) stream and a groupBy(doc) for the vote sums. In-row
  * there is no explode, no distinct shuffle, and no aggregation: the
  * signature is a projection, embarrassingly parallel at any corpus
  * size.
  *
  * Semantics pinned to the relational form: a document with NO words
  * produced no rows and so no signature — here that is a NULL result
  * (callers filter it); null ARRAY ELEMENTS are skipped (the word
  * splitter never emits them).
  */
case class SimHashSignature(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 56,
    s"simhash_signature: bits must be in [1, 56], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash_signature expects array<string>, got ${dt.sql}")
  }

  override def dataType: DataType = LongType

  // null input -> null (UnaryExpression default) AND empty word set ->
  // null (mirrors the relational drop of wordless documents)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimHashSignature.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |Object r = graft.functions.expressions.SimHashSignature.compute($c, $bits);
       |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) r).longValue(); }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSignature {

  /** Column-level entry point. */
  def apply(words: Column, bits: Int): Column =
    GraftExpressionBridge.column(
      SimHashSignature(GraftExpressionBridge.expression(words), bits))

  /** The fused kernel. Public static so generated code can call it.
    * Returns null (not 0) for an empty/all-null word array.
    */
  def compute(words: ArrayData, bits: Int): java.lang.Long = {
    val n = words.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    val votes = new Array[Int](bits)
    val dig = new Array[Byte](16)
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        if (seen.add(w)) {
          val bs = w.getBytes
          val h = PortableHash56.hash(bs, 0, bs.length, dig)
          var j = 0
          while (j < bits) {
            if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
            j += 1
          }
        }
      }
      i += 1
    }
    if (seen.isEmpty) null
    else {
      var sig = 0L
      var j = 0
      while (j < bits) {
        if (votes(j) > 0) sig |= (1L << j)
        j += 1
      }
      java.lang.Long.valueOf(sig)
    }
  }
}
