package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Markup-to-text extraction — the step a web corpus runs before ANY
  * text operator can see it: strip script/style payloads, comments and
  * tags, decode the common HTML entities, collapse whitespace. Until
  * this runs, language-ID counts JavaScript tokens, dedup shingles
  * match on boilerplate nav bars, and quality scores reward markup
  * density.
  *
  * Spark-first shape: like [[Pii]], the whole extraction is a chain of
  * built-in `regexp_replace` / `replace` projections — codegen'd,
  * map-only, zero UDFs, automata compiled once per task — so a 100 TB
  * crawl pays exactly one scan. Every pattern is deliberately
  * RE2-AND-Java compatible (non-greedy `.*?` and inline `(?is)` flags
  * are in both; NO lookaround, NO backreferences — RE2 has neither),
  * and whitespace classes are spelled explicitly (`[ \t\n\r\f]`, never
  * `\s`, whose definition differs between the engines), so DuckDB
  * oracles replay the extraction byte-for-byte.
  *
  * Scope is the deterministic 99% case (real-world tag soup with
  * unclosed elements degrades gracefully: an unterminated script block
  * keeps its payload as text rather than eating the document — the
  * non-greedy match simply never fires). It is NOT a browser: no CSS
  * visibility, no DOM reordering, numeric entities beyond the common
  * named set pass through.
  */
object TextExtract {

  /** Elements whose CONTENT is payload, not prose — dropped whole. */
  private val ContainerPatterns = Seq(
    "(?is)<script\\b[^>]*>.*?</script>",
    "(?is)<style\\b[^>]*>.*?</style>")

  /** HTML comment blocks (dotall — comments span lines). */
  private val CommentPattern = "(?s)<!--.*?-->"

  /** Any remaining tag, replaced by a space so `<p>a</p><p>b</p>`
    * reads "a b", never "ab".
    */
  private val TagPattern = "(?s)<[^>]*>"

  /** The named entities worth decoding in bulk text, in application
    * order: `&amp;` strictly LAST, else `&amp;lt;` would double-decode
    * into `<`.
    */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
    "&amp;" -> "&")

  /** Markup stripped, entities decoded, whitespace collapsed to single
    * spaces and trimmed — one codegen'd projection chain.
    */
  def stripMarkup(text: Column): Column = {
    val noContainers = ContainerPatterns.foldLeft(text)(
      (c, p) => regexp_replace(c, p, ""))
    val noTags = regexp_replace(
      regexp_replace(noContainers, CommentPattern, ""), TagPattern, " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (e, r)) =>
      replace(c, lit(e), lit(r))
    }
    trim(regexp_replace(decoded, "[ \t\n\r\f]+", " "))
  }

  /** Markup share of the raw bytes — the boilerplate-density signal
    * (a page whose text is 95% markup is nav chrome, not a document);
    * 0.0 for empty input.
    */
  def markupRatio(raw: Column): Column = {
    val clean = stripMarkup(raw)
    when(length(raw) === 0, 0.0)
      .otherwise((length(raw) - length(clean)).cast("double") / length(raw))
  }
}
