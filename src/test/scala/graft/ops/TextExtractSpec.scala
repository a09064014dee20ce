package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextExtractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("t").select(TextExtract.stripMarkup(col("t")))
      .head().getString(0)

  test("script/style payloads dropped whole; tags become word boundaries") {
    assert(strip(
      """<html><head><script type="text/js">var x = "<p>not text</p>";
        |</script><style>p { color: red }</style></head>
        |<body><h1>Title</h1><p>one</p><p>two</p></body></html>""".stripMargin)
      === "Title one two")
    // multi-line script with the (?s) dotall contract
    assert(strip("<script>\nline1\nline2\n</script>after") === "after")
    // case-insensitive element names
    assert(strip("<SCRIPT>x</SCRIPT><STYLE>y</STYLE>z") === "z")
  }

  test("comments removed; entities decoded in the safe order; whitespace collapsed") {
    assert(strip("a <!-- hidden\nacross lines --> b") === "a b")
    assert(strip("&lt;tag&gt; &amp; &quot;q&#39;s&quot;&nbsp;end")
      === "<tag> & \"q's\" end")
    // &amp;lt; must decode to the LITERAL "&lt;", never twice to "<"
    assert(strip("&amp;lt;") === "&lt;")
    assert(strip("  a\t\tb\n\nc  ") === "a b c")
  }

  test("tag-soup degradation: unterminated script keeps its payload rather than eating the document") {
    // the non-greedy container match never fires without a closer, so
    // only the tag itself is stripped — the conservative failure mode
    assert(strip("<script>var x = 1; rest of doc") === "var x = 1; rest of doc")
    // unclosed ordinary tag: consumed to the next '>', not to EOF
    assert(strip("a <b unclosed c>d</b> e") === "a d e")
  }

  test("markupRatio: boilerplate-dense pages score high, clean text zero, empty input zero") {
    val rows = Seq(
      "<html><head><script>s</script></head><body><p>x</p></body></html>",
      "plain prose with no markup at all",
      "").toDF("t")
      .select(TextExtract.markupRatio(col("t")).as("r"))
      .collect().map(_.getDouble(0))
    assert(rows(0) > 0.9)
    assert(rows(1) === 0.0)
    assert(rows(2) === 0.0)
  }
}
