package graft

import org.apache.spark.sql.functions._

import graft.functions.UrlFunctions._

/** URL canonicalization / domain extraction: variant collapse, malformed
  * degradation, and the registered-domain heuristic. */
class UrlFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(canonicalUrl(col("u"))).collect().map(_.getString(0)).toSeq

  test("case, trailing slash, query string, and fragment collapse to one key") {
    val got = canon(
      "https://WWW.Site.COM/Docs/5",
      "https://www.site.com/Docs/5/",
      "http://www.site.com/Docs/5?utm_source=feed&ref=9",
      "https://www.site.com/Docs/5#section-2")
    assert(got.forall(_ == "www.site.com/Docs/5"), got.toString)
    // path case is NOT folded — /Docs and /docs are different resources
    assert(canon("https://a.com/Docs/5") != canon("https://a.com/docs/5"))
  }

  test("a bare host canonicalizes to the host itself; root slash strips") {
    assert(canon("https://site.com") == Seq("site.com"))
    assert(canon("https://site.com/") == Seq("site.com"))
  }

  test("registered domain is the last two labels; deep subdomains fold") {
    val got = Seq("https://a.b.cdn.site.com/x", "https://SITE.org/", "https://site.com")
      .toDF("u").select(registeredDomain(col("u")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("site.com", "site.org", "site.com"))
  }

  test("malformed input degrades to NULL keys, never a thrown row") {
    val got = Seq("not a url", "").toDF("u")
      .select(urlHost(col("u"))).collect().map(r => Option(r.getString(0)))
    assert(got.forall(_.forall(_.isEmpty)), got.toString) // null or empty, no throw
  }
}
