package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlCanonicalSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlCanonical.canonicalUrl(col("u")))
      .as[String].collect().toSeq

  test("case, default port, fragment, trailing slash, tracking params, param order") {
    val got = canon(
      "HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&ref=1#frag",
      "https://www.example.com/A/b?ref=1",
      "http://example.com:80/x",
      "http://example.com:8080/x",          // NON-default port survives
      "https://example.com:80/x",           // :80 is not https' default
      "HTTP://EXAMPLE.com/Path/CaseKept")   // path case preserved
    assert(got(0) === "https://www.example.com/A/b?ref=1")
    assert(got(0) === got(1), "the two spellings of one page must collapse")
    assert(got(2) === "http://example.com/x")
    assert(got(3) === "http://example.com:8080/x")
    assert(got(4) === "https://example.com:80/x")
    assert(got(5) === "http://example.com/Path/CaseKept")
  }

  test("query handling: all-tracking query drops the '?', order sorts, www kept") {
    val got = canon(
      "https://a.com/p?utm_campaign=c&utm_source=s",
      "https://a.com/p",
      "https://a.com/p?b=2&a=1",
      "https://a.com/p?a=1&b=2",
      "https://www.a.com/p")
    assert(got(0) === "https://a.com/p")
    assert(got(0) === got(1))
    assert(got(2) === "https://a.com/p?a=1&b=2")
    assert(got(2) === got(3), "param order is transport noise")
    assert(got(4) === "https://www.a.com/p", "www is deliberately kept")
  }

  test("tracking params drop case-insensitively and when valueless") {
    val got = canon(
      "https://a.com/p?UTM_SOURCE=x&ref=1",
      "https://a.com/p?Gclid=y&ref=1",
      "https://a.com/p?utm_source&ref=1",   // bare param, no '='
      "https://a.com/p?FBCLID&ref=1",
      "https://a.com/p?utm=1&ref=1")        // 'utm' alone is NOT utm_*
    assert(got(0) === "https://a.com/p?ref=1")
    assert(got(1) === "https://a.com/p?ref=1")
    assert(got(2) === "https://a.com/p?ref=1")
    assert(got(3) === "https://a.com/p?ref=1")
    assert(got(4) === "https://a.com/p?ref=1&utm=1")
  }

  test("ledger counts changed, canonical, and collapsed per group") {
    val df = Seq(
      ("s1", "https://a.com/p?utm_source=x"), // -> https://a.com/p
      ("s1", "HTTPS://A.com/p/"),             // -> https://a.com/p (collapse)
      ("s1", "https://a.com/q"),              // unchanged, distinct
      ("s2", "https://b.com/r")               // unchanged
    ).toDF("source", "url")
    val got = UrlCanonical.ledger(df, "url", "source").orderBy(col("source"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("s1", 3L, 2L, 2L, 1L, 333L),
      ("s2", 1L, 0L, 1L, 0L, 0L)))
  }
}
