package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** URL canonicalization golden cases + dedup semantics (the cross-engine
  * leg is the t15 DuckDB gate, which recomputes the chain). */
class UrlOpsSpec extends SparkSuite {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(UrlOps.canonicalizeUrl(col("u")).as("c"))
      .collect()(0).getString(0)

  test("golden cases: case, www, ports, tracking, fragments, slashes") {
    assert(canon("HTTP://WWW.Example.COM:80/A/b/?utm_source=x&q=1#top") ==
      "http://example.com/A/b?q=1")
    assert(canon("https://site.org:443/p") == "https://site.org/p")
    assert(canon("https://site.org:8443/p") == "https://site.org:8443/p") // non-default kept
    assert(canon("http://site.org:443/p") == "http://site.org:443/p") // wrong-scheme port kept
    assert(canon("http://a.b/?utm_campaign=x") == "http://a.b")
    assert(canon("http://a.b/x?fbclid=1&keep=2") == "http://a.b/x?keep=2")
    assert(canon("http://a.b/x?keep=2&gclid=1") == "http://a.b/x?keep=2")
    assert(canon("example.com/path/") == "example.com/path") // scheme-less
    assert(canon("  http://a.b/x  ") == "http://a.b/x") // trimmed
    assert(canon("http://a.b") == "http://a.b")
    // path case is SIGNIFICANT; only scheme+host fold
    assert(canon("HTTPS://HOST.io/CaseSensitive") == "https://host.io/CaseSensitive")
  }

  test("review-pinned edges: userinfo, protocol-relative, query values with '?'") {
    // userinfo is case-sensitive and must not block the www strip
    assert(canon("http://Alice@WWW.Site.COM/x") == "http://Alice@site.com/x")
    assert(canon("http://Alice@a.b/x") != canon("http://alice@a.b/x"))
    // protocol-relative URLs get full host normalization, prefix kept
    assert(canon("//WWW.Example.COM/x/") == "//example.com/x")
    assert(canon("//a.b/x") == canon("//WWW.A.B/x"))
    // repairs stop at the first '?': query values containing '?' or '/?'
    // pass through untouched
    assert(canon("http://a.b/p?u=/x/?q=1") == "http://a.b/p?u=/x/?q=1")
    assert(canon("http://a.b/p?next=?utm_source=x") == "http://a.b/p?next=?utm_source=x")
    // but a REAL leading tracking param still goes, repairing the query
    assert(canon("http://a.b/p?utm_source=s&next=?x") == "http://a.b/p?next=?x")
  }

  test("urlDedup excludes null and empty-canonical urls instead of grouping them") {
    val rows = Seq((1L, null), (2L, null), (3L, "   "), (4L, "#frag-only"),
      (5L, "http://keep.me/x")).toDF("doc_id", "url")
    val got = UrlOps.urlDedup(rows, "doc_id", "url").collect()
    assert(got.length == 1 && got(0).getString(0) == "http://keep.me/x")
  }

  test("urlDedup groups variants and keeps the smallest id") {
    val rows = Seq(
      (1L, "http://a.b/x/"), (2L, "HTTP://WWW.A.B/x?utm_source=z"),
      (7L, "http://a.b:80/x#f"), (9L, "http://other.c/y"))
      .toDF("doc_id", "url")
    val got = UrlOps.urlDedup(rows, "doc_id", "url")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("http://a.b/x" -> ((1L, 3L)), "http://other.c/y" -> ((9L, 1L))))
  }

  test("t15 gate: every canonical group has exactly its 4 variant members at sf0.001") {
    val got = graft.queries.LlmData.t15UrlDedup(spark, sf0001).collect()
    assert(got.length == 125)
    assert(got.forall(_.getLong(2) == 4L), "each canonical url must absorb 4 variants")
    assert(got.forall(r => r.getString(0).startsWith("http://site")))
    assert(got.forall(r => !r.getString(0).contains("utm") &&
      !r.getString(0).contains("#") && !r.getString(0).contains(":80")))
  }
}
