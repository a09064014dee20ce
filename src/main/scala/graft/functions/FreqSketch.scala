package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a native mergeable aggregate:
  * at most `capacity` (item, residual-count) counters survive any
  * partition's stream, and partial summaries merge by count addition
  * followed by a trim at the (capacity+1)-largest residual (the
  * mergeable-summaries construction — errors add, the bound survives
  * arbitrary merge trees, so the result is partitioning-independent in
  * its GUARANTEE even though residuals are not).
  *
  * Guarantee: every item with true count > N / (capacity+1) appears in
  * the summary, and each residual undercounts its true count by at most
  * N / (capacity+1). That makes this the candidate pass of an EXACT
  * two-pass heavy-hitters pipeline ([[graft.ops.TextAnalysis.heavyHitters]]):
  * the summary (≤ capacity rows per partition) is the only state that
  * ever shuffles — the corpus' (item, count) table never does.
  *
  * Semantics: NULL items are skipped; the empty stream yields an empty
  * array (there are no candidates, not "unknown candidates"). Output is
  * sorted (residual desc, item asc) for a deterministic display order;
  * residual VALUES legitimately depend on partitioning — only the
  * superset guarantee is portable, which is all the exact second pass
  * needs.
  */
case class MisraGriesTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1, s"graft_mg_topk: capacity must be >= 1, got $capacity")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_mg_topk expects a string item column, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buffer: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val item = v.asInstanceOf[UTF8String]
    buffer.get(item) match {
      case Some(c) => buffer.update(item, c + 1)
      case None if buffer.size < capacity =>
        // clone: eval may return a view over a reused row buffer
        buffer.update(item.clone(), 1L)
      case None =>
        // full and unseen: decrement everyone (the new item's 1 dies too)
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        buffer.keysIterator.foreach { k =>
          val c = buffer(k) - 1
          if (c == 0L) dead += k else buffer.update(k, c)
        }
        dead.foreach(buffer.remove)
    }
    buffer
  }

  override def merge(
      buffer: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, v) =>
      buffer.update(k, buffer.getOrElse(k, 0L) + v)
    }
    if (buffer.size > capacity) {
      // subtract the (capacity+1)-largest residual from everyone; at
      // most `capacity` strictly-larger counters can survive
      val counts = buffer.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (capacity + 1))
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buffer.keysIterator.foreach { k =>
        val c = buffer(k) - cut
        if (c <= 0L) dead += k else buffer.update(k, c)
      }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buffer.toArray.sortWith { case ((i1, c1), (i2, c2)) =>
      c1 > c2 || (c1 == c2 && i1.compareTo(i2) < 0)
    }
    new GenericArrayData(sorted.map { case (item, c) =>
      new GenericInternalRow(Array[Any](item, c))
    })
  }

  override def serialize(buffer: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    var bytes = 4
    buffer.keysIterator.foreach(k => bytes += 4 + k.numBytes() + 8)
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(buffer.size)
    buffer.foreach { case (k, c) =>
      val b = k.getBytes
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(storageFormat)
    val n = bb.getInt
    val out = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      out.update(UTF8String.fromBytes(b), bb.getLong)
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesTopK =
    copy(child = newChild)
}
