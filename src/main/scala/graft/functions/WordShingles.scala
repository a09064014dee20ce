package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, in first-occurrence
  * order — the native form of
  * `array_distinct(transform(sequence(...), i => concat_ws(" ", slice(toks, i+1, n))))`,
  * which costs ~0.5 ms/doc in lambda machinery; this is a single pass
  * over UTF8String slices. Shingling is the map-side entry fee of every
  * text near-dup operator, so it's the first thing to go native.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.WordShingles.shingle($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")

  def shingle(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](len * 2)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      // concat_ws SKIPS null elements (no doubled separator) — the
      // composable reference does, so the native kernel must too.
      // isNullAt, not a null return from the getter: ArrayData impls
      // (e.g. ColumnarArray) don't guarantee null-checking getters.
      var j = 0
      var k = 0
      while (j < n) {
        if (!toks.isNullAt(i + j)) { window(k) = toks.getUTF8String(i + j); k += 1 }
        j += 1
      }
      seen.add(UTF8String.concatWs(Space, java.util.Arrays.copyOf(window, k): _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
