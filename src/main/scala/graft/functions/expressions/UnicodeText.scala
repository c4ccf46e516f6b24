package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization (NFC / NFD /
  * NFKC / NFKD) of a string column via `java.text.Normalizer`.
  *
  * Normalization is the FIRST stage of any multilingual corpus
  * pipeline: the same visible text can arrive precomposed (U+00E9) or
  * decomposed (U+0065 U+0301) depending on the crawler / OS / editor
  * that produced it, and every downstream content key — fingerprint
  * (d02), shingles (d03/d04), line hashes (d18), window hashes
  * (d23) — treats those byte sequences as DIFFERENT documents unless
  * the text is normalized first. Run `normalizeUnicode(col, "NFC")`
  * before fingerprint-keyed dedup on any corpus that mixes sources.
  *
  * Scale: a pure per-row projection — zero shuffle, codegen'd, and the
  * common case (ASCII / already-NFC text) is a single
  * `Normalizer.isNormalized` scan with NO allocation. At 100 TB this
  * runs inside the parquet scan stage.
  *
  * Oracle parity: DuckDB exposes `nfc_normalize()` — the t22 gate
  * pins NFC equivalence on planted decomposed/precomposed pairs.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(UnicodeNormalize.forms.contains(form),
    s"unicode_normalize: form must be one of NFC|NFD|NFKC|NFKD, got $form")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects string, got ${dt.sql}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.compute(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("form", form, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.expressions.UnicodeNormalize.compute($c, $f);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  private[expressions] val forms = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Column-level entry point. */
  def apply(s: Column, form: String): Column =
    GraftExpressionBridge.column(
      UnicodeNormalize(GraftExpressionBridge.expression(s), form))

  /** Public static so generated code can call it. Fast path: already-
    * normalized text (the overwhelming majority of real corpora)
    * returns the INPUT UTF8String — no string materialization at all.
    */
  def compute(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    val f = Normalizer.Form.valueOf(form)
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
}

/** Native Catalyst expression: accent folding — NFD-decompose, drop
  * combining marks (Unicode categories Mn/Me/Mc), re-compose to NFC.
  * `"café münchen"` → `"cafe munchen"`; characters with no canonical
  * decomposition (`ø`, `ß`, CJK) pass through unchanged.
  *
  * The standard "same word modulo diacritics" key for cross-source
  * matching (record linkage d24/d25, search-term canonicalization) —
  * the same transform DuckDB ships as `strip_accents()`, which the t22
  * oracle uses for parity on the planted accent fixtures.
  *
  * Scale: per-row projection, zero shuffle; pure-ASCII rows (detected
  * via the UTF8String byte scan) return the input object untouched.
  */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"strip_accents expects string, got ${dt.sql}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    StripAccents.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.expressions.StripAccents.compute($c);
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StripAccents {

  /** Column-level entry point. */
  def apply(s: Column): Column =
    GraftExpressionBridge.column(
      StripAccents(GraftExpressionBridge.expression(s)))

  /** Public static so generated code can call it. ASCII fast path:
    * 7-bit-only input returns the input object with no allocation.
    */
  def compute(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) {
      if (bytes(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.ENCLOSING_MARK &&
          t != Character.COMBINING_SPACING_MARK) sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }
}
