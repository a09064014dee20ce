package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Sign-bit binary quantization: `array<float|double>` → bit-packed
  * `array<long>` codes (64 dims per word; bit `i` of word `w` is set
  * iff element `w·64 + i` is strictly > 0). The classic 32×-memory
  * binary-embedding representation (Charikar 2002 SRP at one plane per
  * axis; Norouzi et al. 2012 build multi-index search over exactly
  * these codes): at 100 TB a float32 corpus' codes fit where the raw
  * vectors never would, and Hamming distance over packed words is an
  * XOR + POPCNT per 64 dims — see [[HammingDistance]].
  *
  * The final word of a non-multiple-of-64 dim is zero-padded; both
  * sides of any distance pad identically so padding never contributes.
  * A null element yields NULL (null-propagation like the HOF
  * formulation `transform` + `aggregate` would give).
  */
case class SignPack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_sign_pack expects array<double|float>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val words = new Array[Long]((n + 63) >>> 6)
    val f = isFloat
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
      if (x > 0.0) words(i >>> 6) |= (1L << (i & 63))
      i += 1
    }
    new GenericArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val words = ctx.freshName("words")
      val read =
        if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |final long[] $words = new long[($n + 63) >>> 6];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  if ($read > 0.0) $words[$i >>> 6] |= (1L << ($i & 63));
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($words);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignPack =
    copy(child = newChild)
}

/** Hamming distance between two bit-packed `array<long>` codes (the
  * [[SignPack]] representation): Σ POPCNT(aᵢ XOR bᵢ) — one fused
  * xor+popcount per 64 dims, no intermediate array (the HOF
  * formulation `aggregate(zip_with(a, b, bit_count(_ ^ _)), …)`
  * allocates a zipped array per pair; at top-k-join pair volumes that
  * allocation IS the cost). Length mismatch → NULL, mirroring
  * zip_with's null on asymmetric use — codes from differently-sized
  * vector spaces must never silently compare.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_hamming expects (array<long>, array<long>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var d = 0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      d += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $d = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $d += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}
