package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.{StripAccents, UnicodeNormalize}

/** Unicode normalization + accent folding
  * (`TextFunctions.normalizeUnicode` / `foldAccents`, native
  * codegen'd expressions). The t22 gate pins cross-engine parity with
  * DuckDB's `nfc_normalize`/`strip_accents`; here we pin per-form
  * semantics, nulls, the interpreted path, and dedup-key invariance.
  */
class UnicodeTextSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "caf\u00e9 m\u00fcnchen"          // \u00e9 \u00fc precomposed
  private val decomposed = "cafe\u0301 mu\u0308nchen"      // e+\u00b4 u+\u00a8

  private def one(text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(Tuple1(text)).toDF("t").select(c(col("t")).as("r"))
      .collect().head.getString(0)

  test("NFC composes, NFD decomposes, round-trip is idempotent") {
    assert(one(decomposed, TextFunctions.normalizeUnicode(_)) == composed)
    assert(one(composed, TextFunctions.normalizeUnicode(_, "NFD")) == decomposed)
    assert(one(composed, TextFunctions.normalizeUnicode(_)) == composed)
    // NFKC folds compatibility forms: fullwidth A (U+FF21) -> A
    assert(one("\uff21bc", TextFunctions.normalizeUnicode(_, "NFKC")) == "Abc")
    // but NFC leaves compatibility forms alone
    assert(one("\uff21bc", TextFunctions.normalizeUnicode(_)) == "\uff21bc")
  }

  test("foldAccents strips diacritics, passes non-decomposables") {
    assert(one(composed, TextFunctions.foldAccents) == "cafe munchen")
    assert(one(decomposed, TextFunctions.foldAccents) == "cafe munchen")
    assert(one("\u00f8re stra\u00dfe \u6f22", TextFunctions.foldAccents)
      == "\u00f8re stra\u00dfe \u6f22") // \u00f8 \u00df CJK untouched
    assert(one("\u014dmura \u00d1o", TextFunctions.foldAccents) == "omura No")
  }

  test("nulls propagate; invalid form rejected; interpreted == codegen") {
    val df = Seq(Some(decomposed), None).toDF("t")
    val rows = df.select(TextFunctions.normalizeUnicode(col("t")).as("n"),
        TextFunctions.foldAccents(col("t")).as("f")).collect()
    assert(rows(0).getString(0) == composed && rows(0).getString(1) == "cafe munchen")
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    intercept[IllegalArgumentException] {
      TextFunctions.normalizeUnicode(col("t"), "NFX")
    }
    // interpreted (eval) path agrees with the codegen path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val in = Literal(UTF8String.fromString(decomposed),
      org.apache.spark.sql.types.StringType)
    assert(UnicodeNormalize(in, "NFC").eval(null)
      == UTF8String.fromString(composed))
    assert(StripAccents(in).eval(null)
      == UTF8String.fromString("cafe munchen"))
  }

  test("normalization unifies dedup keys across renderings") {
    // the motivating bug: the same visible text in two renderings gets
    // two fingerprints raw, ONE after normalizeUnicode
    val df = Seq((1L, composed), (2L, decomposed)).toDF("id", "t")
    val raw = df.select(TextFunctions.fingerprint(col("t")).as("k"))
      .distinct().count()
    val norm = df.select(TextFunctions.fingerprint(
        TextFunctions.normalizeUnicode(col("t"))).as("k"))
      .distinct().count()
    assert(raw == 2L && norm == 1L)
  }
}
