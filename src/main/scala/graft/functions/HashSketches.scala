package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native sketching expressions for the dedup operators.
  *
  * Both replace composable higher-order-function pipelines that walk
  * Catalyst lambda machinery per (token × hash) step — the sketches are
  * the map-side cost of near-dup detection at corpus scale, so they get
  * tight generated loops instead. Hashing matches the composable
  * formulations exactly (Spark's xxhash64, seed 42), so swapping
  * implementations never changes results.
  */
object HashSketches {
  val Seed = 42L
  /** FNV-64 prime: odd, so multiplication is full-period mod 2^64. */
  val RollB = 0x100000001b3L

  /** O(n) rolling-polynomial window hashes; parity-pinned against the
    * composable aggregate form in HashSketchesSpec.
    */
  def rollingHashes(toks: ArrayData, width: Int): ArrayData = {
    val n = toks.numElements()
    if (n < width) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) =
        if (toks.isNullAt(i)) Seed
        else {
          val t = toks.getUTF8String(i)
          XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, Seed)
        }
      i += 1
    }
    var bw = 1L
    var j = 0
    while (j < width - 1) { bw *= RollB; j += 1 }
    val m = n - width + 1
    val out = new Array[Any](m)
    var acc = 0L
    j = 0
    while (j < width) { acc = acc * RollB + hs(j); j += 1 }
    out(0) = acc
    var s = 1
    while (s < m) {
      acc = (acc - hs(s - 1) * bw) * RollB + hs(s + width - 1)
      out(s) = acc
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
    * SIGMOD 2003 — the MOSS algorithm): over the k-gram rolling hashes
    * `h[0..m)`, every window of `window` consecutive hashes contributes
    * its MINIMUM (ties to the RIGHTMOST position); each selected
    * `(pos, fp)` is recorded once. The paper's guarantees carried here:
    * any match of at least `window + k − 1` tokens shares at least one
    * selected fingerprint (coverage), and the expected density of
    * selected positions is `2/(window+1)` (compression). Documents
    * shorter than one full window winnow to their single global
    * minimum. O(m) via a monotonic deque — values strictly below the
    * incoming hash survive, equals pop (that is the rightmost-tie
    * rule), so selected positions strictly increase.
    */
  def winnow(toks: ArrayData, k: Int, window: Int): Any = {
    val hsData = rollingHashes(toks, k).asInstanceOf[GenericArrayData]
    val m = hsData.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val h = new Array[Long](m)
    var i = 0
    while (i < m) { h(i) = hsData.getLong(i); i += 1 }
    val effWin = math.min(window, m)
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var lastSel = -1
    var end = 0
    while (end < m) {
      while (tail > head && h(deque(tail - 1)) >= h(end)) tail -= 1
      deque(tail) = end
      tail += 1
      if (end >= effWin - 1) {
        val lo = end - effWin + 1
        while (deque(head) < lo) head += 1
        val sel = deque(head)
        if (sel != lastSel) {
          out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](sel, h(sel)))
          lastSel = sel
        }
      }
      end += 1
    }
    new GenericArrayData(out.toArray)
  }

  def simhash64(toks: ArrayData): Any = {
    val n = toks.numElements()
    // Parity with the composable form: aggregate over an empty array is
    // the zero init → sketch 0L; a NULL token hashes to the bare seed
    // (Spark's xxhash64 leaves the seed untouched for NULL input).
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h =
        if (toks.isNullAt(i)) Seed
        else {
          val t = toks.getUTF8String(i)
          XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, Seed)
        }
      var b = 0
      while (b < 64) {
        counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def minhash(toks: ArrayData, numHashes: Int): Any = {
    val n = toks.numElements()
    // Parity with the composable form: array_min over an empty transform
    // is NULL per element, and a NULL shingle contributes the bare
    // per-family seed (xxhash64(h, NULL) = hashInt(h, 42)).
    if (n == 0) return new GenericArrayData(Array.fill[Any](numHashes)(null))
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val seeds = Array.tabulate(numHashes)(h => XXH64.hashInt(h, Seed))
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) {
        var h = 0
        while (h < numHashes) {
          if (seeds(h) < mins(h)) mins(h) = seeds(h)
          h += 1
        }
      } else {
        val t = toks.getUTF8String(i)
        var h = 0
        while (h < numHashes) {
          val v = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, seeds(h))
          if (v < mins(h)) mins(h) = v
          h += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box): Array[Any])
  }
}

/** 64-bit SimHash of a token array (semantics of Dedup.simhashComposable). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HashSketches.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val hs = "graft.functions.HashSketches"
      s"""
         |Object r = $hs.simhash64($a);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) r).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** MinHash signature (numHashes mins) of a shingle array — semantics of
  * Dedup.minhashSignatureComposable: element h is min over shingles of
  * xxhash64(h, shingle).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  // containsNull: an empty shingle set yields all-NULL elements
  // (array_min-over-empty parity with the composable form).
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HashSketches.minhash(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val hs = "graft.functions.HashSketches"
      s"""
         |Object r = $hs.minhash($a, $numHashes);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Positional rolling window hashes of a token array: element i is the
  * degree-(width−1) wrapping polynomial Σ_j H(tok[i+j])·B^(width−1−j)
  * over per-token xxhash64 values (seed 42, NULL token → bare seed,
  * matching the other sketches) with B the FNV-64 prime — i.e. exactly
  * `aggregate(slice(hs, i+1, width), 0L, (acc, h) -> acc·B + h)` of the
  * composable reference, computed in ONE O(n) pass via the rolling
  * recurrence acc′ = (acc − h_out·B^(width−1))·B + h_in instead of the
  * O(n·width) window re-walk. This is the any-alignment window
  * fingerprint behind exact substring dedup (Lee et al. 2022's
  * "Deduplicating Training Data Makes Language Models Better" family):
  * equal windows hash equal, and grouping ships 8-byte longs instead of
  * width-token strings.
  */
case class RollingWindowHashes(child: Expression, width: Int)
    extends UnaryExpression {
  require(width >= 1, "window width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hashes expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HashSketches.rollingHashes(input.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val hs = "graft.functions.HashSketches"
      s"""
         |Object r = $hs.rollingHashes($a, $width);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingWindowHashes =
    copy(child = newChild)
}

/** Winnowing fingerprint selection over the token array — see
  * [[HashSketches.winnow]] for the algorithm and guarantees. Emits
  * `array<struct<pos:int, fp:long>>`, positions ascending, each
  * selected fingerprint once.
  */
case class WinnowFingerprints(child: Expression, k: Int, window: Int)
    extends UnaryExpression {
  require(k >= 1, "k-gram width must be >= 1")
  require(window >= 1, "winnow window must be >= 1")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HashSketches.winnow(input.asInstanceOf[ArrayData], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val hs = "graft.functions.HashSketches"
      s"""
         |Object r = $hs.winnow($a, $k, $window);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}
