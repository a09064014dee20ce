package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass quality-scoring statistics over a text column:
  * `array<long>` of `[n_chars, n_tok, stop_hits, punct]`, where
  *   - `n_chars` = code-point count (≡ `length(text)`),
  *   - `n_tok`   = `size(split(text, " "))` (single-space separator,
  *     trailing empties kept — Java split limit −1 semantics, so
  *     n_tok = spaces + 1),
  *   - `stop_hits` = tokens exactly ∈ {the, a, of, and, to, in}
  *     (≡ `markerTokenCount`),
  *   - `punct` = code points outside `[a-z0-9 ]`
  *     (≡ `length(text) − length(regexp_replace(text, "[^a-z0-9 ]", ""))`).
  *
  * The composable formulation pays a full-text `regexp_replace` (regex
  * machinery + a materialized rewritten string, read only for its
  * length) plus a `split` array build per consumer — the q137
  * `graft_normalize` lesson again: round 12 measured the q148
  * calibration projection at **53× on the 64× probe** (per-doc regex
  * cost, cores saturated) before this kernel. One byte pass, no
  * intermediate strings, no regex. Parity with the composable forms is
  * pinned byte-for-byte in NativeExpressionsSpec, multi-byte UTF-8
  * included (a non-ASCII code point counts once toward n_chars and
  * once toward punct; continuation bytes are skipped).
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_text_stats expects string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextStats.compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.TextStats.compute($t));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  /** The single shared kernel — called from both interpreted eval and
    * generated code, so the two paths cannot drift.
    */
  def compute(t: UTF8String): Array[Long] = {
    val b = t.getBytes
    val n = b.length
    var nChars = 0L
    var nTok = 1L
    var stop = 0L
    var punct = 0L
    var tokStart = 0
    var i = 0
    while (i <= n) {
      val atEnd = i == n
      if (atEnd || b(i) == ' ') {
        val len = i - tokStart
        if (len == 1) {
          if (b(tokStart) == 'a') stop += 1
        } else if (len == 2) {
          val c0 = b(tokStart); val c1 = b(tokStart + 1)
          if ((c0 == 'o' && c1 == 'f') || (c0 == 't' && c1 == 'o') ||
              (c0 == 'i' && c1 == 'n')) stop += 1
        } else if (len == 3) {
          val c0 = b(tokStart); val c1 = b(tokStart + 1); val c2 = b(tokStart + 2)
          if ((c0 == 't' && c1 == 'h' && c2 == 'e') ||
              (c0 == 'a' && c1 == 'n' && c2 == 'd')) stop += 1
        }
        if (!atEnd) { nTok += 1; tokStart = i + 1 }
      }
      if (!atEnd) {
        val c = b(i)
        if ((c & 0xC0) != 0x80) { // code-point start (ASCII or lead byte)
          nChars += 1
          val clean = c == ' ' || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
          if (!clean) punct += 1
        }
      }
      i += 1
    }
    Array(nChars, nTok, stop, punct)
  }
}
