package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<double|float>` columns (each side
  * independently typed; floats widen to double per element INSIDE the
  * loop).
  *
  * The composable formulation (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * allocates an intermediate array and walks Catalyst's higher-order-
  * function machinery per element (~µs/row at dim 64); this expression
  * generates a tight primitive loop instead — the difference between an
  * interpreted inner loop and real SIMD-able code at 12M+ pairs.
  *
  * Why native float input matters: the SRP verify join carries RAW
  * float vectors through the pair exchange (half the bytes of doubles)
  * — wrapping them in `transform(_.cast("double"))` at the consumer
  * re-materializes a fresh double array PER CANDIDATE PAIR per side,
  * which round 8 measured as the q59 clean-line drift (3.55 → 4.33 s:
  * millions of 0.4-threshold pairs each paying two dim-D allocations).
  * Reading `getFloat` and widening in the multiply keeps the halved
  * exchange AND the allocation-free inner loop. Each float widens
  * exactly, so results stay bit-identical to cast-then-dot on doubles.
  *
  * Semantics mirror the composable form exactly (summation in index
  * order, left to right): length mismatch or a null element yields NULL,
  * like null-propagation through zip_with/aggregate — so results remain
  * bit-identical with the DuckDB oracle's list_dot_product on doubles.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects (array<double|float>, array<double|float>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val af = isFloat(left.dataType)
    val bf = isFloat(right.dataType)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      sum += x * y
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      def read(arr: String, dt: DataType): String =
        if (isFloat(dt)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += ${read(a, left.dataType)} * ${read(b, right.dataType)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}
