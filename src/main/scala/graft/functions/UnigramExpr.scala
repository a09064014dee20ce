package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native unigram-LM (SentencePiece-style) subword encoder kernel —
  * the Viterbi twin of [[BpeEncode]] (see `graft.ops.Unigram`).
  *
  * Semantics: each word is segmented into the maximum-total-score
  * sequence of vocabulary pieces under a fixed `(piece, score)` table
  * (scores are log-probabilities, Kudo 2018's decoding rule — cited by
  * RESULT: the Viterbi argmax over the segmentation lattice, not his
  * code). Characters absent from the vocabulary segment as single-char
  * pieces at `unkScore`, so a segmentation always exists. Determinism:
  * the DP scans split points left to right and keeps a strictly better
  * score, so among tied segmentations the one whose LAST piece is
  * longest wins at every suffix (`Unigram.encodeLocal` is the
  * reference; UnigramSpec pins row-for-row equality).
  *
  * Why native, same argument as [[BpeCodec]]: the per-word DP is a
  * tight loop inside whole-stage codegen with a per-task word →
  * pieces cache (Zipfian text pays the DP roughly once per distinct
  * word per task), and the piece table lives in ONE hash map per task
  * instead of an interpreted HOF stack that would grow with vocabulary
  * size.
  */
final class UnigramCodec(
    pieces: Array[String],
    scores: Array[Double],
    unkScore: Double)
    extends Serializable {
  require(pieces.length == scores.length,
    s"UnigramCodec: ${pieces.length} pieces vs ${scores.length} scores")

  @transient private lazy val table: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      m.put(pieces(i), java.lang.Double.valueOf(scores(i)))
      i += 1
    }
    m
  }
  @transient private lazy val maxLen: Int =
    if (pieces.isEmpty) 1 else pieces.iterator.map(_.length).max
  @transient private lazy val cache =
    new java.util.HashMap[String, Array[UTF8String]]()

  /** Viterbi segmentation of one word: best[i] = the max total score
    * of any segmentation of w[0, i); split points j scan ascending, a
    * candidate replaces the incumbent only when STRICTLY better, so
    * ties keep the smallest j — the longest last piece.
    */
  def encodeWord(w: String): Array[UTF8String] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    val n = w.length
    val best = new Array[Double](n + 1)
    val from = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      best(i) = Double.NegativeInfinity
      from(i) = -1
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val sc =
          if (i - j == 1) {
            val s = table.get(w.substring(j, i))
            if (s == null) unkScore else s.doubleValue()
          } else {
            val s = table.get(w.substring(j, i))
            if (s == null) Double.NegativeInfinity else s.doubleValue()
          }
        if (sc != Double.NegativeInfinity) {
          val cand = best(j) + sc
          if (cand > best(i)) { best(i) = cand; from(i) = j }
        }
        j += 1
      }
      i += 1
    }
    // backtrack
    val buf = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var p = n
    while (p > 0) {
      val j = from(p)
      buf += UTF8String.fromString(w.substring(j, p))
      p = j
    }
    val out = buf.reverseIterator.toArray
    if (cache.size >= BpeCodec.CacheCap) cache.clear()
    cache.put(w, out)
    out
  }

  /** Encode a token array into one flattened piece array. Empty words
    * contribute nothing; a null token nulls the whole result (the
    * [[BpeCodec.encode]] convention).
    */
  def encode(words: ArrayData): GenericArrayData = {
    val nw = words.numElements()
    val buf = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < nw) {
      if (words.isNullAt(i)) return null
      val w = words.getUTF8String(i).toString
      if (w.nonEmpty) buf ++= encodeWord(w)
      i += 1
    }
    new GenericArrayData(buf.toArray[Any])
  }
}

/** Native unigram-LM encode: array of words → flattened array of
  * pieces under a fixed `(piece, score)` vocabulary (see
  * [[UnigramCodec]]).
  */
case class UnigramEncode(
    child: Expression,
    pieces: Array[String],
    scores: Array[Double],
    unkScore: Double)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val codec = new UnigramCodec(pieces, scores, unkScore)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if pieces.length == scores.length &&
        pieces.forall(p => p != null && p.nonEmpty) =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_unigram_encode: malformed piece table " +
          s"(${pieces.length} pieces vs ${scores.length} scores, or " +
          "null/empty pieces)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_unigram_encode expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(words: Any): Any =
    codec.encode(words.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val codecRef = ctx.addReferenceObj("unigramCodec", codec,
      "graft.functions.UnigramCodec")
    nullSafeCodeGen(ctx, ev, w => {
      val arr = ctx.freshName("pieces")
      s"""
         |final org.apache.spark.sql.catalyst.util.GenericArrayData $arr =
         |  $codecRef.encode($w);
         |if ($arr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $arr; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)

  // content-based equality so CSE/canonicalization sees two calls built
  // from equal driver-side piece tables as the same expression
  override def equals(other: Any): Boolean = other match {
    case o: UnigramEncode =>
      child == o.child && pieces.sameElements(o.pieces) &&
        scores.sameElements(o.scores) && unkScore == o.unkScore
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(child,
      Int.box(java.util.Arrays.hashCode(pieces.asInstanceOf[Array[AnyRef]])),
      Int.box(java.util.Arrays.hashCode(scores)),
      Double.box(unkScore))
}
