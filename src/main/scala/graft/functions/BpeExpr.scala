package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE subword encoder kernels (see `graft.ops.Bpe`).
  *
  * Semantics: each word is split into single-character symbols and the
  * merge table is applied IN RANK ORDER, each merge as the greedy
  * left-to-right non-overlapping rewrite of `Bpe.mergePair` — i.e. the
  * exact transform `Bpe.trainMerges` applied to the histogram during
  * training, so encoding the training corpus reproduces training's
  * final symbol state (`Bpe.encodeLocal` is the reference
  * implementation; BpeSpec pins row-for-row equality, plus parity with
  * the built-ins-only `encodeTokensComposable` formulation).
  *
  * Why native: the composable form nests one `aggregate` higher-order
  * function PER MERGE inside a `transform` over the token array —
  * interpreted lambda evaluation whose expression tree grows linearly
  * with merge count (a 256-merge chain is a 256-deep HOF stack, the
  * same per-row interpreted-allocation wall PqExpr documents for PQ).
  * Here the merge loop is a tight per-word loop inside whole-stage
  * codegen, with two scale levers the expression form can't have:
  *   - a per-task word → subwords cache ([[BpeCodec.CacheCap]]
  *     entries): natural text is Zipfian, so the vast majority of
  *     token occurrences hit the cache and the merge loop runs
  *     approximately once per DISTINCT word per task — the
  *     vocabulary-dedup trick (encode distinct words, join back)
  *     without its posting-reassembly shuffle;
  *   - an O(1) substring pre-check per merge: symbols always
  *     concatenate to the original word, so a merge (l, r) can only
  *     fire if `l + r` occurs in the word — the rewrite pass is
  *     skipped for the (overwhelmingly common) merges that can't
  *     apply.
  */
/** Per-merge-table encoder with a bounded per-instance word cache.
  * Instances ride to executors inside the expression (one deserialized
  * copy per task, so the cache needs no locking). Top-level class (not
  * nested in an object) so generated code can name it directly.
  */
final class BpeCodec(lefts: Array[String], rights: Array[String])
    extends Serializable {
  require(lefts.length == rights.length,
    s"BpeCodec: ${lefts.length} left vs ${rights.length} right symbols")

  // merged(i) = lefts(i) + rights(i), the substring pre-check key
  @transient private lazy val merged: Array[String] =
    Array.tabulate(lefts.length)(i => lefts(i) + rights(i))
  @transient private lazy val cache =
    new java.util.HashMap[String, Array[UTF8String]]()

  private def mergePair(syms: Array[String], n0: Int, l: String, r: String): Int = {
    // in-place greedy left-to-right non-overlapping rewrite (the
    // reference Bpe.mergePair on a preallocated buffer); returns the
    // new symbol count
    var n = 0
    var i = 0
    while (i < n0) {
      val s = syms(i)
      if (n > 0 && syms(n - 1) == l && s == r) syms(n - 1) = l + r
      else { syms(n) = s; n += 1 }
      i += 1
    }
    n
  }

  def encodeWord(w: String): Array[UTF8String] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    val syms = new Array[String](w.length)
    var n = w.length
    var j = 0
    while (j < n) { syms(j) = String.valueOf(w.charAt(j)); j += 1 }
    var i = 0
    while (i < lefts.length && n > 1) {
      // adjacency of (l, r) in syms implies l+r is a substring of w
      if (w.contains(merged(i))) n = mergePair(syms, n, lefts(i), rights(i))
      i += 1
    }
    val out = new Array[UTF8String](n)
    j = 0
    while (j < n) { out(j) = UTF8String.fromString(syms(j)); j += 1 }
    if (cache.size >= BpeCodec.CacheCap) cache.clear()
    cache.put(w, out)
    out
  }

  /** Encode a token array into one flattened subword array. Empty
    * words contribute nothing; a null token nulls the whole result
    * (the PqExpr malformed-input convention).
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

object BpeCodec {
  /** Cache bound: cleared (not evicted) on overflow — natural-text
    * vocabularies at task granularity sit far below this, so the
    * clear path exists only to bound adversarial inputs.
    */
  val CacheCap = 1 << 16
}

/** Native BPE encode: array of words → flattened array of subwords
  * under a fixed rank-ordered merge table (see [[BpeCodec]]).
  */
case class BpeEncode(
    child: Expression,
    lefts: Array[String],
    rights: Array[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val codec = new BpeCodec(lefts, rights)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if lefts.length == rights.length &&
        lefts.forall(_ != null) && rights.forall(_ != null) =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_encode: malformed merge table " +
          s"(${lefts.length} left vs ${rights.length} right, or null symbols)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_encode expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(words: Any): Any =
    codec.encode(words.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val codecRef = ctx.addReferenceObj("bpeCodec", codec,
      "graft.functions.BpeCodec")
    nullSafeCodeGen(ctx, ev, w => {
      val arr = ctx.freshName("subwords")
      s"""
         |final org.apache.spark.sql.catalyst.util.GenericArrayData $arr =
         |  $codecRef.encode($w);
         |if ($arr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $arr; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  // content-based equality so CSE/canonicalization sees two calls built
  // from equal driver-side merge tables as the same expression
  override def equals(other: Any): Boolean = other match {
    case o: BpeEncode =>
      child == o.child && lefts.sameElements(o.lefts) &&
        rights.sameElements(o.rights)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(child,
      Int.box(java.util.Arrays.hashCode(lefts.asInstanceOf[Array[AnyRef]])),
      Int.box(java.util.Arrays.hashCode(rights.asInstanceOf[Array[AnyRef]])))
}
