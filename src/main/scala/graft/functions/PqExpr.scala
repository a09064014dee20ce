package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native product-quantization kernels (see `graft.ops.Pq`).
  *
  * Why native: the higher-order-function formulation of the encode —
  * per subspace, a `transform` over the codebook of
  * `aggregate(zip_with(...))` distances plus an
  * `array_position(array_min)` argmin — evaluates ~m·k interpreted
  * lambdas and allocates ~m·k small arrays PER ROW (measured 1.6 ms/row
  * at m=8, k=16, dim=64: the 64× probe spent 69 of its 80 s here).
  * These kernels are the [[NearestCentroidEval]] treatment of the same
  * problem: codebooks/LUTs ride along as flat double[] reference
  * objects and the per-row work is a tight primitive loop inside
  * whole-stage codegen. The HOF formulation stays in `Pq` as the
  * reference semantics, pinned bit-identical in PqSpec.
  */
object PqEval {

  /** Unit-normalize `vec` and emit the per-subspace argmin codes.
    * `flat` is the row-major [subspace][centroid][component] codebook:
    * entry ((i·k + c)·subDim + j). The norm is a left-to-right
    * sum-of-squares (the `graft_dot`-based `l2Norm` order) and each
    * distance accumulates components left-to-right, so results are
    * bit-identical to the HOF reference. Ties keep the LOWEST centroid
    * (strict <), matching `array_position(ds, array_min(ds))`.
    * Returns null for a malformed vector (wrong length, null element,
    * zero norm).
    */
  def codes(
      vec: ArrayData,
      flat: Array[Double],
      m: Int,
      k: Int,
      subDim: Int,
      vecIsFloat: Boolean): Array[Int] = {
    val dim = m * subDim
    if (vec.numElements() != dim) return null
    var d = 0
    while (d < dim) {
      if (vec.isNullAt(d)) return null
      d += 1
    }
    @inline def at(j: Int): Double =
      if (vecIsFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
    var nrm2 = 0.0
    var j = 0
    while (j < dim) { val x = at(j); nrm2 += x * x; j += 1 }
    val nrm = math.sqrt(nrm2)
    if (!(nrm > 0)) return null
    val out = new Array[Int](m)
    var i = 0
    while (i < m) {
      var best = Double.PositiveInfinity
      var bi = 0
      var c = 0
      while (c < k) {
        val off = (i * k + c) * subDim
        var s = 0.0
        var jj = 0
        while (jj < subDim) {
          val x = at(i * subDim + jj) / nrm - flat(off + jj)
          s += x * x
          jj += 1
        }
        if (s < best) { best = s; bi = c }
        c += 1
      }
      out(i) = bi
      i += 1
    }
    out
  }

  /** ADC distance: Σ_i lut(i·k + codes(i)), accumulated in ascending
    * subspace order (the HOF `aggregate(sequence(...))` order). Null
    * for malformed codes (wrong length, null element, out-of-range).
    */
  def adc(codes: ArrayData, lut: Array[Double], m: Int, k: Int): java.lang.Double = {
    if (codes.numElements() != m) return null
    var s = 0.0
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return null
      val c = codes.getInt(i)
      if (c < 0 || c >= k) return null
      s += lut(i * k + c)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** The flat [subspace][centroid] ADC LUT of a RAW query vector —
    * what `graft.ops.Pq.flatLut(model, unitQueryArr(query))` computes
    * on the driver for one query, as a per-ROW kernel so a query
    * RELATION can build its own LUT column: unit-normalize (same
    * left-to-right norm order as [[codes]]), then
    * lut(i·k + c) = Σ_j (u(i·subDim+j) − cent(i,c,j))², components
    * accumulated left-to-right — bit-identical to the driver path
    * (PqSpec pins it). Null for malformed / zero-norm vectors.
    */
  def lut(
      vec: ArrayData,
      flat: Array[Double],
      m: Int,
      k: Int,
      subDim: Int,
      vecIsFloat: Boolean): Array[Double] = {
    val dim = m * subDim
    if (vec.numElements() != dim) return null
    var d = 0
    while (d < dim) {
      if (vec.isNullAt(d)) return null
      d += 1
    }
    @inline def at(j: Int): Double =
      if (vecIsFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
    var nrm2 = 0.0
    var j = 0
    while (j < dim) { val x = at(j); nrm2 += x * x; j += 1 }
    val nrm = math.sqrt(nrm2)
    if (!(nrm > 0)) return null
    val out = new Array[Double](m * k)
    var i = 0
    while (i < m) {
      var c = 0
      while (c < k) {
        val off = (i * k + c) * subDim
        var s = 0.0
        var jj = 0
        while (jj < subDim) {
          val x = at(i * subDim + jj) / nrm - flat(off + jj)
          s += x * x
          jj += 1
        }
        out(i * k + c) = s
        c += 1
      }
      i += 1
    }
    out
  }

  /** [[adc]] with the LUT as a per-row COLUMN instead of a constant —
    * the batch-retrieval pairing (each query row carries its own
    * [[lut]]). Same ascending-subspace accumulation, null for
    * malformed codes or a LUT of the wrong length.
    */
  def adcPair(
      codes: ArrayData, lut: ArrayData, m: Int, k: Int): java.lang.Double = {
    if (codes.numElements() != m) return null
    if (lut.numElements() != m * k) return null
    var s = 0.0
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return null
      val c = codes.getInt(i)
      if (c < 0 || c >= k) return null
      val idx = i * k + c
      if (lut.isNullAt(idx)) return null
      s += lut.getDouble(idx)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** Native PQ encode: raw vector → m sub-centroid codes (see
  * [[PqEval.codes]]).
  */
case class PqCodes(
    child: Expression,
    flat: Array[Double],
    m: Int,
    k: Int,
    subDim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  private def vecIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _)
        if m >= 1 && k >= 1 && subDim >= 1 && flat.length == m * k * subDim =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType | FloatType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_pq_codes: inconsistent codebook " +
          s"(flat=${flat.length}, m=$m, k=$k, subDim=$subDim)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_codes expects array<double|float>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(vec: Any): Any = {
    val r = PqEval.codes(
      vec.asInstanceOf[ArrayData], flat, m, k, subDim, vecIsFloat)
    if (r == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val arr = ctx.freshName("codes")
      s"""
         |final int[] $arr = graft.functions.PqEval.codes(
         |  $v, $flatRef, $m, $k, $subDim, $vecIsFloat);
         |if ($arr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($arr); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)

  // content-based equality so CSE/canonicalization sees two calls built
  // from equal driver-side codebooks as the same expression
  override def equals(other: Any): Boolean = other match {
    case o: PqCodes =>
      child == o.child && m == o.m && k == o.k && subDim == o.subDim &&
        java.util.Arrays.equals(flat, o.flat)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(m), Int.box(k), Int.box(subDim),
      Int.box(java.util.Arrays.hashCode(flat)))
}

/** Native ADC scoring of a codes column against a per-query flat LUT
  * (see [[PqEval.adc]]).
  */
case class PqAdc(
    child: Expression,
    lut: Array[Double],
    m: Int,
    k: Int)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _)
        if m >= 1 && k >= 1 && lut.length == m * k =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(IntegerType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_pq_adc: inconsistent LUT (lut=${lut.length}, m=$m, k=$k)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_adc expects array<int>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(codes: Any): Any =
    PqEval.adc(codes.asInstanceOf[ArrayData], lut, m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("pqLut", lut, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("adist")
      s"""
         |final java.lang.Double $r = graft.functions.PqEval.adc(
         |  $c, $lutRef, $m, $k);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)

  override def equals(other: Any): Boolean = other match {
    case o: PqAdc =>
      child == o.child && m == o.m && k == o.k &&
        java.util.Arrays.equals(lut, o.lut)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(m), Int.box(k),
      Int.box(java.util.Arrays.hashCode(lut)))
}

/** Native per-row ADC-LUT construction (see [[PqEval.lut]]): a query
  * RELATION builds its own `array<double>` LUT column against the fixed
  * codebook — the per-query half of the batch IVF-PQ retrieval pairing
  * ([[PqAdcPair]]); runs once per QUERY row, never per corpus row.
  */
case class PqLut(
    child: Expression,
    flat: Array[Double],
    m: Int,
    k: Int,
    subDim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  private def vecIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _)
        if m >= 1 && k >= 1 && subDim >= 1 && flat.length == m * k * subDim =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType | FloatType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_pq_lut: inconsistent codebook " +
          s"(flat=${flat.length}, m=$m, k=$k, subDim=$subDim)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_lut expects array<double|float>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(vec: Any): Any = {
    val r = PqEval.lut(
      vec.asInstanceOf[ArrayData], flat, m, k, subDim, vecIsFloat)
    if (r == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val arr = ctx.freshName("lut")
      s"""
         |final double[] $arr = graft.functions.PqEval.lut(
         |  $v, $flatRef, $m, $k, $subDim, $vecIsFloat);
         |if ($arr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($arr); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)

  override def equals(other: Any): Boolean = other match {
    case o: PqLut =>
      child == o.child && m == o.m && k == o.k && subDim == o.subDim &&
        java.util.Arrays.equals(flat, o.flat)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(m), Int.box(k), Int.box(subDim),
      Int.box(java.util.Arrays.hashCode(flat)))
}

/** Native ADC scoring of a codes column against a per-row LUT COLUMN
  * (see [[PqEval.adcPair]]) — the corpus×query half of the batch
  * IVF-PQ retrieval pairing ([[PqLut]] builds the LUT side).
  */
case class PqAdcPair(
    left: Expression,
    right: Expression,
    m: Int,
    k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _))
          if m >= 1 && k >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_pq_adc_pair: m=$m, k=$k must be >= 1")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_adc_pair expects (array<int>, array<double>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    PqEval.adcPair(codes.asInstanceOf[ArrayData],
      lut.asInstanceOf[ArrayData], m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val r = ctx.freshName("adist")
      s"""
         |final java.lang.Double $r = graft.functions.PqEval.adcPair(
         |  $c, $l, $m, $k);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcPair =
    copy(left = newLeft, right = newRight)
}
