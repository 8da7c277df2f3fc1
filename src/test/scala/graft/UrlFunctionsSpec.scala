package graft

import org.apache.spark.sql.functions._
import graft.functions.UrlFunctions

/** URL canonicalization: case, default ports, fragments, query-param
  * order, empty paths, registered-domain extraction. */
class UrlFunctionsSpec extends SparkSpec {

  private def norm(u: String): String =
    evalOne[String](UrlFunctions.normalizeUrl(lit(u)))
  private def dom(u: String): String =
    evalOne[String](UrlFunctions.registeredDomain(lit(u)))

  test("normalizeUrl lowercases scheme and host only") {
    norm("HTTPS://WWW.Example.COM/Path/File") shouldBe
      "https://www.example.com/Path/File"
  }

  test("normalizeUrl strips default ports and fragments") {
    norm("https://a.com:443/x#frag") shouldBe "https://a.com/x"
    norm("http://a.com:80/x") shouldBe "http://a.com/x"
    // non-default port survives
    norm("https://a.com:8443/x") shouldBe "https://a.com:8443/x"
  }

  test("normalizeUrl sorts query parameters and drops empties") {
    norm("https://a.com/p?b=2&a=1") shouldBe "https://a.com/p?a=1&b=2"
    norm("https://a.com/p?b=2&&a=1") shouldBe "https://a.com/p?a=1&b=2"
    norm("https://a.com/p?") shouldBe "https://a.com/p"
  }

  test("normalizeUrl gives bare hosts a root path") {
    norm("https://a.com") shouldBe "https://a.com/"
  }

  test("equivalent spellings canonicalize identically") {
    val forms = Seq(
      "HTTPS://A.Com:443/p?b=2&a=1#x",
      "https://a.com/p?a=1&b=2",
      "https://A.COM/p?b=2&a=1")
    forms.map(norm).distinct should have size 1
  }

  test("registeredDomain takes the last two labels, ignoring the port") {
    dom("https://www.news.site7-example.com:443/x") shouldBe
      "site7-example.com"
    dom("http://a.com/x") shouldBe "a.com"
  }

  test("isUrl rejects non-URLs") {
    evalOne[Boolean](UrlFunctions.isUrl(lit("https://a.com/x"))) shouldBe true
    evalOne[Boolean](UrlFunctions.isUrl(lit("not a url"))) shouldBe false
  }
}
