package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub pass every training-data
  * pipeline runs before text reaches a model: emails, payment-card and
  * SSN shapes, phone numbers, IPv4 addresses replaced by typed
  * placeholders, with per-type incidence counts for the governance
  * report ([[TextAnalysis.sourceDatasheet]]'s missing column).
  *
  * Spark-first shape: the whole scrub is a chain of built-in
  * `regexp_replace` projections — codegen'd, map-only, zero UDFs, so
  * a 100 TB corpus pays one scan with the regex automata compiled
  * once per task. Patterns are deliberately RE2-safe (no lookaround,
  * no backreferences — character classes, bounded repeats and `\b`
  * only), so Java regex (Spark) and RE2 (DuckDB oracles; also what
  * Trino/BigQuery run) agree byte-for-byte — the
  * [[Dedup.normalizeText]] ASCII-scoped-compatibility rule applied to
  * redaction.
  *
  * Detection is pattern-shaped, not semantic: a placeholder-dense
  * corpus slice (e.g. code with versions like 10.2.3.4) will
  * over-redact, and exotic obfuscated PII escapes — the standard
  * trade for a regex pass. Counts are computed on the SAME staged
  * text each pattern actually saw (pattern i counts on text after
  * patterns 1..i−1 applied), so Σ counts ≡ placeholders inserted,
  * with no double-counting when shapes nest (a card number is never
  * also a phone).
  */
object Pii {

  /** (type, RE2+Java-compatible pattern, placeholder), applied in this
    * order — more specific shapes first so a card is consumed before
    * the phone patterns could take a bite of it.
    */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", "\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b", "<CARD>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\+\\d{7,15}\\b|\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b", "<PHONE>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** The redacted text: every pattern replaced by its placeholder, in
    * [[Patterns]] order.
    */
  def scrub(text: Column): Column =
    Patterns.foldLeft(text) { case (c, (_, re, rep)) =>
      regexp_replace(c, re, rep)
    }

  /** Per-row detection: the scrubbed text plus one `pii_<type>` count
    * column per pattern, each counted on the staged text that pattern
    * actually scanned.
    */
  def detect(df: DataFrame, textCol: String): DataFrame = {
    val staged = Patterns.scanLeft(col(textCol)) {
      case (c, (_, re, rep)) => regexp_replace(c, re, rep)
    }
    val counts = Patterns.zip(staged.init).map { case ((name, re, _), seen) =>
      regexp_count(seen, lit(re)).cast("long").as(s"pii_$name")
    }
    df.withColumns(
      Map("pii_scrubbed" -> staged.last) ++
        Patterns.zip(counts).map { case ((n, _, _), c) => s"pii_$n" -> c })
  }

  /** Governance rollup: per group, documents affected and total hits
    * per type — one codegen'd scan + one map-side-combined agg. Every
    * output column is an additive count, so report rows from disjoint
    * slices re-sum exactly ([[readReport]]) — the property
    * [[graft.streaming.PiiStream]]'s append-only maintenance relies on.
    */
  def report(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val d = detect(df, textCol)
    val total = Patterns.map(p => col(s"pii_${p._1}")).reduce(_ + _)
    d.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(total > 0, 1L).otherwise(0L)).as("docs_with_pii") +:
          Patterns.map(p => sum(col(s"pii_${p._1}")).as(s"n_${p._1}")): _*)
  }

  /** Read a persisted incidence table (streamed partial [[report]]
    * rows) and re-sum to one row per group — exact, counts are
    * additive; stream-built ≡ batch-built count for count.
    */
  def readReport(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      groupCol: String): DataFrame = {
    val t = spark.read.parquet(path)
    val sums = t.columns.filterNot(_ == groupCol)
      .map(c => sum(col(c)).as(c))
    t.groupBy(col(groupCol)).agg(sums.head, sums.tail: _*)
  }
}
