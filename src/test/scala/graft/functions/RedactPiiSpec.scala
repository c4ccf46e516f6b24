package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PII redaction (`TextFunctions.redactPii`): sequential global
  * rewrite of email/phone/ipv4 matches to `<NAME>` placeholders, hit
  * counts from the original text. The t23 gate pins cross-engine
  * parity; here we pin per-pattern semantics and edge shapes.
  */
class RedactPiiSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String): Row =
    TextFunctions.redactPii(
        Seq((1L, text)).toDF("id", "t"), col("id"), col("t"))
      .collect().head

  test("each pattern redacts and counts") {
    val r = run("mail a@b.io then dial 555-123-4567 from 10.0.0.1")
    assert(r.getAs[String]("redacted")
      == "mail <EMAIL> then dial <PHONE> from <IPV4>")
    assert(r.getAs[Int]("email_hits") == 1)
    assert(r.getAs[Int]("phone_hits") == 1)
    assert(r.getAs[Int]("ipv4_hits") == 1)
    assert(r.getAs[Boolean]("has_hits"))
  }

  test("multiple hits, dotted phones, clean rows") {
    val multi = run("a@b.co c@d.org 555.111.2222")
    assert(multi.getAs[String]("redacted") == "<EMAIL> <EMAIL> <PHONE>")
    assert(multi.getAs[Int]("email_hits") == 2)
    val clean = run("nothing to hide here")
    assert(clean.getAs[String]("redacted") == "nothing to hide here")
    assert(!clean.getAs[Boolean]("has_hits"))
  }

  test("counts reflect the original text, not the rewritten one") {
    // an email whose host looks ipv4-ish: email redacts first, and the
    // ipv4 count still sees the original match
    val r = run("ping 1.2.3.4 and mail x@y.zz")
    assert(r.getAs[String]("redacted") == "ping <IPV4> and mail <EMAIL>")
    assert(r.getAs[Int]("ipv4_hits") == 1 && r.getAs[Int]("email_hits") == 1)
  }

  test("custom patterns and placeholder casing") {
    val df = TextFunctions.redactPii(
      Seq((1L, "order ab-123 shipped")).toDF("id", "t"),
      col("id"), col("t"), patterns = Seq("sku" -> "\\bab-\\d+\\b"))
    val r = df.collect().head
    assert(r.getAs[String]("redacted") == "order <SKU> shipped")
    assert(r.getAs[Int]("sku_hits") == 1)
  }
}
