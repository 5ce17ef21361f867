package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class UrlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[Option[String]] =
    urls.toDF("u").select(Url.canonicalize($"u").as("c"))
      .as[Option[String]].collect().toSeq

  test("scheme and host lowercase; default ports stripped; fragment stripped") {
    assert(canon(
      "HTTP://Example.COM:80/Path/X#frag",
      "https://EXAMPLE.com:443/",
      "http://example.com:8080/x") == Seq(
      Some("http://example.com/Path/X"), // path case PRESERVED
      Some("https://example.com/"),
      Some("http://example.com:8080/x"))) // non-default port KEPT
  }

  test("tracking params removed, real params kept IN ORDER, empty query dropped") {
    assert(canon(
      "http://e.com/p?utm_source=f&b=2&utm_campaign=c&a=1",
      "http://e.com/p?gclid=x&ref=tw",
      "http://e.com/p?",
      "http://e.com/p?b=2&a=1") == Seq(
      Some("http://e.com/p?b=2&a=1"), // order preserved, NOT sorted
      Some("http://e.com/p"),
      Some("http://e.com/p"),
      Some("http://e.com/p?b=2&a=1")))
  }

  test("empty path → /; query with no path; scheme-less → null (quarantine as data)") {
    assert(canon(
      "http://e.com",
      "http://e.com?a=1",
      "www.e.com/x",
      "not a url") == Seq(
      Some("http://e.com/"),
      Some("http://e.com/?a=1"),
      None, None))
  }

  test("registeredDomain: last two labels, or three under a multi-part public suffix") {
    val got = Seq("a.b.example.com", "example.com", "localhost",
      "deep.sub.example.co.uk", "example.co.uk", "co.uk")
      .toDF("h").select(Url.registeredDomain($"h").as("d"))
      .as[String].collect().toSeq
    assert(got == Seq("example.com", "example.com", "localhost",
      "example.co.uk", "example.co.uk", "co.uk"))
  }

  private def res(base: String, hrefs: String*): Seq[Option[String]] =
    hrefs.map(h => (base, h)).toDF("b", "h")
      .select(Url.resolve($"b", $"h").as("r"))
      .as[Option[String]].collect().toSeq

  test("resolve: absolute http(s) stands alone; other schemes are not crawlable outlinks") {
    assert(res("http://a.com/d/p?q=1#f",
      "https://b.net/x", "HTTPS://b.net/x", "mailto:x@y.z",
      "javascript:void(0)", "ftp://b.net/f") == Seq(
      Some("https://b.net/x"), Some("HTTPS://b.net/x"), // verbatim — canon's job
      None, None, None))
  }

  test("resolve: scheme-relative, root-relative, query, fragment, empty, path-relative") {
    assert(res("HTTP://A.com:8080/d/p?q=1#f",
      "//cdn.c.com/l.js", "/r/2", "?page=2", "#top", "", "next/3") == Seq(
      Some("http://cdn.c.com/l.js"),
      Some("http://a.com:8080/r/2"), // port verbatim — canon's job
      Some("http://a.com:8080/d/p?page=2"), // base query replaced
      Some("http://a.com:8080/d/p?q=1#top"), // base query kept, canon strips #
      Some("http://a.com:8080/d/p?q=1"), // empty href = the page itself
      Some("http://a.com:8080/d/next/3"))) // base DIRECTORY + href
  }

  test("resolve: bare-path base resolves relatives at /; scheme-less base nulls relatives only") {
    assert(res("http://a.com", "x/y", "?p=1", "#t") == Seq(
      Some("http://a.com/x/y"), Some("http://a.com/?p=1"),
      Some("http://a.com/#t")))
    assert(res("no-scheme.com/d", "http://b.net/x", "/r", "rel") == Seq(
      Some("http://b.net/x"), None, None))
    // null href stays null (href-less <a name=…> anchors)
    val r = Seq(("http://a.com/", Option.empty[String])).toDF("b", "h")
      .select(Url.resolve($"b", $"h")).as[Option[String]].head()
    assert(r.isEmpty)
  }

  test("urlGroups: variants of one page collapse to one canonical group with min-id survivor") {
    val df = Seq(
      (1L, "http://e.com/p"),
      (2L, "HTTP://E.COM:80/p#x"),
      (3L, "http://e.com/p?utm_source=f"),
      (4L, "http://e.com/other"),
      (5L, "junk-no-scheme")).toDF("id", "url")
    val got = Url.urlGroups(df, $"url", $"id")
      .orderBy($"url_canon")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("http://e.com/other", 1L, 4L),
      ("http://e.com/p", 3L, 1L)))
  }
}
