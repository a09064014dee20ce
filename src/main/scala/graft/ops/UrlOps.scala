package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL parsing, canonicalization and URL-level dedup — the FIRST dedup
  * stage of every web-corpus build (CCNet, RefinedWeb: drop refetches
  * of the same page before paying text-level MinHash), and the key
  * extractor behind per-domain caps and domain mixing.
  *
  * Spark-first shape: pure codegen'd column expressions
  * (`regexp_extract` + string builtins — zero UDFs; `parse_url` is
  * deliberately NOT used so DuckDB oracles can replay the exact same
  * RE2-and-Java-compatible patterns). Dedup is a keep-min-id
  * aggregation on the canonical key — one hash exchange, the
  * [[Dedup]] exact-family contract.
  *
  * Canonical form (the CCNet-style key, lossy on purpose):
  * lowercased scheme and host, default ports dropped (`:80` http /
  * `:443` https), fragment dropped, tracking params (`utm_*`,
  * `fbclid`, `gclid`) dropped, query otherwise KEPT (param order
  * preserved — reordering is rare in practice and sorting params
  * would need an explode), empty path normalized to `/`.
  */
object UrlOps {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostPortRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  private val QueryRe = "\\?([^#]*)"
  private val FragmentRe = "#(.*)$"

  /** Structured parts: `url_scheme/url_host/url_port/url_path/
    * url_query/url_fragment` appended as columns. Absent parts are
    * empty strings (regexp_extract's no-match convention in BOTH
    * engines), port additionally null-when-absent.
    */
  def parse(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val hostPort = regexp_extract(u, HostPortRe, 1)
    // chained withColumn (not withColumns(Map)) so the appended schema
    // order is deterministic: scheme, host, port, path, query, fragment
    df.withColumn("url_scheme", lower(regexp_extract(u, SchemeRe, 1)))
      .withColumn("url_host", lower(regexp_extract(hostPort, "^([^:]*)", 1)))
      .withColumn("url_port", when(hostPort.contains(":"),
        regexp_extract(hostPort, ":([0-9]+)$", 1).cast("int")))
      .withColumn("url_path", regexp_extract(u, PathRe, 1))
      .withColumn("url_query", regexp_extract(u, QueryRe, 1))
      .withColumn("url_fragment", regexp_extract(u, FragmentRe, 1))
  }

  /** The registrable-domain heuristic: last two dot-labels of the
    * host (`blog.example.com` → `example.com`). A public-suffix list
    * would treat `co.uk` correctly; this is the deterministic
    * approximation both engines can compute (`substring_index` from
    * the right), fine for capping/mixing over ordinary TLDs.
    */
  def registeredDomain(host: Column): Column =
    substring_index(host, ".", -2)

  /** Tracking params dropped from a query string, separators tidied:
    * `utm_a=1&id=2` → `id=2`, `id=2&utm_a=1` → `id=2`, all-tracking →
    * empty.
    */
  private def scrubQuery(q: Column): Column = {
    // anchored to the param start ((^|&) consumed with the param) so a
    // param whose NAME merely ends in a tracking name ("xfbclid=2",
    // "myutm_a=1") is untouched — an unanchored pattern would eat its
    // suffix and fold genuinely distinct URLs into one dedup key
    val dropped = regexp_replace(q, "(^|&)(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*", "")
    // collapse the separators the drop left behind: "&&", leading or
    // trailing "&"
    regexp_replace(regexp_replace(dropped, "&&+", "&"), "^&|&$", "")
  }

  /** The canonical URL-dedup key (see object doc for the contract). */
  def canonicalize(urlCol: Column): Column = {
    val scheme = lower(regexp_extract(urlCol, SchemeRe, 1))
    val hostPort = regexp_extract(urlCol, HostPortRe, 1)
    val host = lower(regexp_extract(hostPort, "^([^:]*)", 1))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val path0 = regexp_extract(urlCol, PathRe, 1)
    val path = when(path0 === "", "/").otherwise(path0)
    val query = scrubQuery(regexp_extract(urlCol, QueryRe, 1))
    concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(query =!= "", concat(lit("?"), query)).otherwise(lit("")))
  }

  /** URL-level dedup: one row per canonical URL, keeping the smallest
    * id (first fetch under a monotone id). Adds `url_canonical` and
    * `n_fetches`; one hash-partitioned aggregation over the canonical
    * key — no window, no sort.
    */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.withColumn("url_canonical", canonicalize(col(urlCol)))
      .groupBy(col("url_canonical"))
      .agg(min(col(idCol)).as(idCol),
        count(lit(1)).as("n_fetches"))
}
