package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ASCII dedup-key normalization in ONE byte pass: lowercase A–Z, every
  * byte outside [a-z0-9] becomes a space, space runs collapse, ends
  * trim — the native form of
  * `trim(regexp_replace(regexp_replace(lower(t), "[^a-z0-9 ]", " "), " +", " "))`,
  * whose two regex passes measured ~2 ms/doc (22 s of q137's 42 s at
  * the 64× probe corpus; regex machinery + two intermediate strings).
  *
  * Byte-level is exact for the composable form: a multi-byte UTF-8
  * char fails `[a-z0-9 ]` as ONE char there and as 2–4 bytes here, but
  * both paths emit only spaces for it and the collapse merges either
  * way; ASCII lowercase agrees with `lower()` on A–Z and everything
  * else is mapped to space before case could matter. Parity is pinned
  * per-corpus and on adversarial strings in NativeExpressionsSpec.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_normalize expects string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NormalizeText.normalize($s);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  def normalize(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val out = new Array[Byte](in.length)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < in.length) {
      val c = in(i) & 0xff
      val mapped: Int =
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) c
        else if (c >= 'A' && c <= 'Z') c + 32
        else ' '
      if (mapped == ' ') {
        if (o > 0) pendingSpace = true // leading spaces never emit
      } else {
        if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
        out(o) = mapped.toByte; o += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o) // trailing pendingSpace never emits
  }
}
