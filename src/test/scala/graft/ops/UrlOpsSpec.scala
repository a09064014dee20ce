package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(UrlOps.canonicalize(col("u"))).head().getString(0)

  test("parse: scheme/host/port/path/query/fragment; absent parts empty (port null)") {
    val r = UrlOps.parse(
      Seq("HTTPS://Sub.Example.COM:8443/a/b?x=1&y=2#frag").toDF("u"), "u")
      .head()
    assert(r.getString(1) === "https")
    assert(r.getString(2) === "sub.example.com")
    assert(r.getInt(3) === 8443)
    assert(r.getString(4) === "/a/b")
    assert(r.getString(5) === "x=1&y=2")
    assert(r.getString(6) === "frag")
    val bare = UrlOps.parse(Seq("http://h.io").toDF("u"), "u").head()
    assert(bare.isNullAt(3) && bare.getString(4) === ""
      && bare.getString(5) === "" && bare.getString(6) === "")
  }

  test("canonicalize: case, default ports, fragments, tracking params, empty path") {
    assert(canon("HTTPS://WWW.Example.COM:443/Page?utm_source=x&id=2#top")
      === "https://www.example.com/Page?id=2")
    assert(canon("http://Example.Com:80") === "http://example.com/")
    // non-default port kept; https on 80 kept (not its default)
    assert(canon("http://h.io:8080/p") === "http://h.io:8080/p")
    assert(canon("https://h.io:80/p") === "https://h.io:80/p")
    // tracking-param scrub tidies separators wherever the param sits
    assert(canon("http://h.io/p?utm_a=1&id=2") === "http://h.io/p?id=2")
    assert(canon("http://h.io/p?id=2&fbclid=abc") === "http://h.io/p?id=2")
    assert(canon("http://h.io/p?a=1&gclid=x&b=2") === "http://h.io/p?a=1&b=2")
    assert(canon("http://h.io/p?utm_a=1&utm_b=2") === "http://h.io/p")
    // path case preserved (paths ARE case-sensitive), query order kept
    assert(canon("http://h.io/A/B?b=2&a=1") === "http://h.io/A/B?b=2&a=1")
  }

  test("registeredDomain: last-two-labels heuristic") {
    val d = Seq("www.example.com", "a.b.example.com", "example.com")
      .toDF("h").select(UrlOps.registeredDomain(col("h")))
      .collect().map(_.getString(0))
    assert(d.toSeq === Seq("example.com", "example.com", "example.com"))
  }

  test("dedupByUrl: refetch shapes fold to one row keeping the smallest id") {
    val fetches = Seq(
      (10L, "https://WWW.Ex.COM:443/a?utm_s=1&id=5#f"),
      (3L, "https://www.ex.com/a?id=5"),
      (7L, "https://www.ex.com/a?id=5"),
      (5L, "http://other.ex.com/b")).toDF("doc_id", "url")
    val got = UrlOps.dedupByUrl(fetches, "doc_id", "url")
      .orderBy("url_canonical")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      ("http://other.ex.com/b", 5L, 1L),
      ("https://www.ex.com/a?id=5", 3L, 3L)))
  }
}
