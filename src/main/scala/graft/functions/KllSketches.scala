package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** KLL quantile sketch aggregates/readouts (Karnin–Lang–Liberty 2016,
  * via the Apache DataSketches KllDoublesSketch Spark already ships) —
  * the QUANTILE member of the mergeable-sketch family next to HLL
  * (distinct) and CountMin (frequency): bounded ~3KB state per group
  * at the default k regardless of value cardinality, which is what the
  * exact histogram path ([[graft.ops.Stats.exactQuantilesByGroup]])
  * cannot give on CONTINUOUS domains (classifier probabilities, LM
  * perplexities — every value distinct, histogram = the data).
  *
  * Error contract: rank error ≤ ε = getNormalizedRankError(k) with
  * 99% confidence (~1.65% at the default k=200) — the estimated
  * q-quantile's TRUE rank lies in [q−ε, q+ε]. Merge (union) preserves
  * the bound; merge-of-parts ≡ one-pass-over-whole in DISTRIBUTION
  * (not bit-identically — KLL compaction is level-structured, so the
  * retained items depend on arrival grouping; the suite gates on the
  * rank-error contract, never on state bytes).
  *
  * Same TypedImperativeAggregate shape as [[VectorSum]]: partial
  * buffers live as heap sketches per task and serialize (compact
  * form) only at the exchange.
  */
object KllOps {
  val MinK = 8
  val MaxK = 65535

  def requireK(k: Int): Unit =
    require(k >= MinK && k <= MaxK, s"kll: k=$k outside [$MinK, $MaxK]")

  private def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  /** Readout: estimated quantiles at the given ranks (INCLUSIVE
    * criteria, the library default); null for an empty sketch.
    */
  def quantiles(bytes: Array[Byte], qs: ArrayData): ArrayData = {
    val sk = heapify(bytes)
    if (sk.isEmpty) null
    else {
      val n = qs.numElements()
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        out(i) = sk.getQuantile(qs.getDouble(i), QuantileSearchCriteria.INCLUSIVE)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Readout: estimated normalized rank of `value` (INCLUSIVE); null
    * for an empty sketch.
    */
  def rank(bytes: Array[Byte], value: Double): java.lang.Double = {
    val sk = heapify(bytes)
    if (sk.isEmpty) null
    else java.lang.Double.valueOf(
      sk.getRank(value, QuantileSearchCriteria.INCLUSIVE))
  }

  /** Readout: the stream length the sketch has absorbed. */
  def n(bytes: Array[Byte]): Long = heapify(bytes).getN
}

/** Per-group KLL sketch of a double column → compact binary state.
  * NULL inputs are ignored (SQL agg convention); a group with no
  * non-null input yields an EMPTY sketch (not NULL) so sketch tables
  * stay total and unions have an identity.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  KllOps.requireK(k)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_kll_agg expects double, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Union of serialized KLL states (the rollup-on-read aggregate —
  * [[KllSketchAgg]]'s `hll_union_agg` twin). NULL states are ignored;
  * no input yields an empty sketch at the declared k. States built at
  * a different k merge fine (the result honors the smaller k's error
  * bound, the KLL merge rule).
  */
case class KllUnionAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  KllOps.requireK(k)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_kll_union_agg expects binary, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllUnionAgg =
    copy(child = newChild)
}

/** `graft_kll_quantiles(sketch, ranks)` → array<double> of estimated
  * quantiles (null for an empty sketch). Codegen'd as a static call so
  * sketch-table readouts stay inside whole-stage codegen.
  */
case class KllQuantiles(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_kll_quantiles expects (binary, array<double>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(sketch: Any, qs: Any): Any =
    KllOps.quantiles(sketch.asInstanceOf[Array[Byte]],
      qs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, q) => s"""
      ${ev.value} = graft.functions.KllOps.quantiles($s, $q);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantiles =
    copy(left = newLeft, right = newRight)
}

/** `graft_kll_rank(sketch, value)` → estimated normalized rank of the
  * value in the sketched distribution (null for an empty sketch).
  */
case class KllRank(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_kll_rank expects (binary, double), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(sketch: Any, v: Any): Any = {
    val r = KllOps.rank(sketch.asInstanceOf[Array[Byte]],
      v.asInstanceOf[Double])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, v) => s"""
      java.lang.Double ${ev.value}Boxed = graft.functions.KllOps.rank($s, $v);
      ${ev.isNull} = ${ev.value}Boxed == null;
      ${ev.value} = ${ev.isNull} ? -1.0 : ${ev.value}Boxed.doubleValue();
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllRank =
    copy(left = newLeft, right = newRight)
}
