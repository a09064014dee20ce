package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native element-wise SUM aggregate over an `array<double>` column —
  * the missing piece for mean-pooling chunk embeddings into document
  * embeddings (and for centroid computation) as a single hash
  * aggregation.
  *
  * Why an aggregate expression (SURVEY preference (b)) instead of
  * composition: the composable route is `posexplode` → groupBy
  * (key, pos) → avg → re-collect, which multiplies the shuffle by the
  * embedding dimension (a 1024-dim corpus ships 1024 rows per vector)
  * and needs a second shuffle to reassemble. This aggregate keeps the
  * plan a SINGLE hash agg with map-side partial aggregation: each
  * partition folds its vectors into one dims-length buffer, and only
  * those partial buffers shuffle — the same wire volume as shipping one
  * vector per partition per group.
  *
  * Semantics: NULL arrays are ignored (SQL SUM convention); all-NULL
  * input yields NULL. A NULL *element* or a dimension mismatch throws a
  * readable error instead of silently corrupting the centroid —
  * embeddings with ragged dims are upstream bugs (fail-fast, matching
  * the repo convention).
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_vec_sum expects array<double>, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Array[Double] = null

  private def add(buffer: Array[Double], arr: ArrayData): Array[Double] = {
    val n = arr.numElements()
    val acc = if (buffer == null) new Array[Double](n) else buffer
    if (acc.length != n)
      throw new IllegalArgumentException(
        s"graft_vec_sum: dimension mismatch (${acc.length} vs $n) — ragged embeddings upstream")
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_vec_sum: NULL element at dim $i — repair embeddings upstream")
      acc(i) += arr.getDouble(i)
      i += 1
    }
    acc
  }

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer else add(buffer, v.asInstanceOf[ArrayData])
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] =
    if (other == null) buffer
    else if (buffer == null) other
    else {
      if (buffer.length != other.length)
        throw new IllegalArgumentException(
          s"graft_vec_sum: partial dimension mismatch (${buffer.length} vs ${other.length})")
      var i = 0
      while (i < buffer.length) { buffer(i) += other(i); i += 1 }
      buffer
    }

  override def eval(buffer: Array[Double]): Any =
    if (buffer == null) null else new GenericArrayData(buffer)

  // A leading marker byte keeps the null (no input seen) buffer distinct
  // from a legitimate ZERO-LENGTH sum (all inputs were empty arrays):
  // without it, empty bytes would deserialize to null and the result
  // would flip between [] and NULL depending on whether the plan
  // serialized the partial buffer.
  override def serialize(buffer: Array[Double]): Array[Byte] =
    if (buffer == null) Array.emptyByteArray
    else {
      val bb = java.nio.ByteBuffer.allocate(1 + 8 * buffer.length)
      bb.put(1.toByte)
      var i = 0
      while (i < buffer.length) { bb.putDouble(1 + 8 * i, buffer(i)); i += 1 }
      bb.array()
    }

  override def deserialize(storageFormat: Array[Byte]): Array[Double] =
    if (storageFormat.isEmpty) null
    else {
      val n = (storageFormat.length - 1) / 8
      val out = new Array[Double](n)
      val bb = java.nio.ByteBuffer.wrap(storageFormat)
      var i = 0
      while (i < n) { out(i) = bb.getDouble(1 + 8 * i); i += 1 }
      out
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSum =
    copy(child = newChild)
}
