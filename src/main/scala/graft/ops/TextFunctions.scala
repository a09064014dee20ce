package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the text-analysis and dedup
  * operators. Everything here is built from `org.apache.spark.sql.functions`
  * higher-order array functions, so it stays inside whole-stage codegen —
  * no UDFs, no serialization boundary, and the same column can feed a
  * filter that Catalyst pushes around freely.
  */
object TextFunctions {

  /** Whitespace tokenization — the `documents.text` fixture is
    * single-space separated; `split` on literal space keeps the count
    * semantics identical to DuckDB's `string_split`.
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles: sliding windows of `n` tokens joined by a
    * space. Guarded so texts shorter than `n` tokens yield an empty
    * array (Spark's `sequence(0, negative)` would count *down*).
    * Reference formulation — pins the semantics of the native
    * [[graft.functions.WordShingles]] in the parity test.
    */
  def shinglesComposable(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Distinct shingle set for Jaccard-style set similarity — native
    * single-pass expression (the map-side entry fee of every text
    * near-dup operator).
    */
  def shingleSet(text: Column, n: Int): Column =
    graft.functions.GraftFunctions.shingles(tokens(text), n)

  /** |A ∩ B| / |A ∪ B| over two pre-distinct string arrays. Integer
    * cardinalities divided in double — bit-identical across engines, so
    * thresholds and ROUND are hash-stable.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter).cast("double")
  }

  /** Occurrences of a literal character n-gram in `text`, via the
    * replace-length trick: (len(t) - len(remove(t, g))) / len(g).
    * Codegen-friendly, and plain `replace` is expressible verbatim in
    * any SQL dialect (the oracle uses the identical formula).
    */
  def charNgramCount(text: Column, gram: String): Column =
    (length(text) - length(call_function("replace", text, lit(gram), lit("")))) / lit(gram.length)

  /** Count of tokens that appear in a fixed marker vocabulary. */
  def markerTokenCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => array_contains(lit(markers.toArray), t)))

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * other non-space characters — the usual pre-tokenizer shape. The
    * pattern is shared verbatim with the DuckDB oracle (RE2 and Java
    * regex agree on this subset).
    */
  val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  /** Order-sensitive document fingerprint: a polynomial rolling hash over
    * token lengths, `acc = (acc * 31 + len(tok)) mod 1e9+7`, folded
    * left-to-right. Unlike the Jaccard set-signature this distinguishes
    * permutations; mod-per-step keeps every intermediate in range under
    * ANSI overflow checking (Spark 4 default) and DuckDB alike.
    */
  def polyFingerprint(toks: Column): Column =
    aggregate(
      transform(toks, t => length(t).cast("long")),
      lit(7L),
      (acc, x) => (acc * lit(31L) + x) % lit(1000000007L))
}
