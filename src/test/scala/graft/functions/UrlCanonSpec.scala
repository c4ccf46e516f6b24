package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** URL canonicalization ([[TextFunctions.canonicalizeUrl]]): every
  * normalization rule on hand-built fixtures, plus what must NOT
  * change (path case, interior slashes, non-default ports, non-URL
  * strings). The t31 gate hash-checks the chain against DuckDB.
  */
class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  private def canon(s: String): String =
    Seq(s).toDF("u").select(TextFunctions.canonicalizeUrl(col("u")))
      .head().getString(0)

  test("scheme/host lowercase; www, default port, fragment, slash go") {
    assert(canon("HTTP://WWW.Example.COM:80/Path/To/Page/?utm_source=x&b=2&a=1#frag")
      == "http://example.com/Path/To/Page?a=1&b=2")
    assert(canon("https://site.org:443/") == "https://site.org")
    assert(canon("https://www.WWW.x.com/p") == "https://x.com/p",
      "repeated www. prefixes strip in ONE pass (fixed point)")
    assert(canon("http://wwwx.com/keephost") == "http://wwwx.com/keephost",
      "www without a dot is a real host prefix, not the subdomain")
  }

  test("tracking params drop; survivors sort; empty query vanishes") {
    assert(canon("http://example.com/page?fbclid=123")
      == "http://example.com/page")
    assert(canon("https://x.io/p?gclid=9&utm_medium=m&z=1&a=2")
      == "https://x.io/p?a=2&z=1")
  }

  test("what must NOT change: path case, interior slashes, real ports") {
    assert(canon("https://Site.org/a//b/") == "https://site.org/a//b")
    assert(canon("http://example.com:8080/keep")
      == "http://example.com:8080/keep")
    assert(canon("not a url at all") == "not a url at all")
    assert(canon("https://site.org:4430/x") == "https://site.org:4430/x",
      ":443 strips only as a SUFFIX port, not a prefix of a real one")
    assert(canon("https://h.io/p#a?notquery=1") == "https://h.io/p",
      "a '?' inside the fragment is fragment, never query")
  }

  test("groupBy(canonical) is the URL dedup: variants land together") {
    val urls = Seq(
      "http://x.com/p", "HTTP://WWW.X.com/p/", "http://x.com:80/p#top",
      "http://x.com/p?utm_source=tw", "http://x.com/q"
    ).toDF("url")
    val groups = urls.groupBy(TextFunctions.canonicalizeUrl(col("url")))
      .count().orderBy(col("count").desc).collect()
    assert(groups.length == 2 && groups(0).getLong(1) == 4L,
      s"four variants of /p must share one canonical key: ${groups.toSeq}")
  }
}
