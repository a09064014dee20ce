package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Signed-random-projection bucket of an `array<double>` vector: the
  * sign pattern of `planes` pseudo-random hyperplane projections packed
  * into a long (semantics of `VectorOps.srpBucketComposable`).
  *
  * The composable form evaluates planes × dims higher-order-function
  * lambda steps per row (measured ~3.3 s to bucket 2 000 × dim-64
  * vectors across 8 tables at sf0.1); this expression is one generated
  * call into a primitive double loop. Plane coefficients are
  * xxhash64-derived uniforms in [-0.5, 0.5) keyed by
  * (seedBase + plane, dimension) — identical hashing to the composable
  * form (XXH64 chained over two int columns, seed 42), so swapping
  * implementations never moves a vector to a different bucket.
  */
object SrpHash {
  /** Plane-coefficient rows, cached per planeSeed. The coefficient for
    * (plane, dim) is a pure function of (planeSeed, dim) — xxhash64-
    * derived, CONSTANT across rows — yet the original inner loop
    * re-hashed every (row, table, plane, dim): at q61's solved 64×
    * regime (18 planes × 15 tables × 512k rows × dim 64 × 3 plan
    * passes) that was ~2 billion hashInt calls and the measured bulk of
    * the candidate-stage map time. Caching the derived row turns the
    * projection into a pure dot product at identical values (same
    * hashes, computed once). Memory: dims × 8 B per (table, plane) —
    * ~140 KB at the 64× regime — executor-static and corpus-independent.
    * Rows grow monotonically (copy-on-grow) if a wider vector arrives;
    * lock-free readers see either the old or the new row, both with
    * identical prefixes.
    */
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Double]]()

  private def coeffRow(planeSeed: Long, n: Int): Array[Double] = {
    val cached = coeffCache.get(planeSeed)
    if (cached != null && cached.length >= n) return cached
    coeffCache.compute(planeSeed, (_, old) => {
      if (old != null && old.length >= n) old
      else {
        val size = math.max(n, if (old == null) 64 else old.length << 1)
        val a = new Array[Double](size)
        var j = 0
        while (j < size) {
          val h = XXH64.hashInt(j, planeSeed)
          val m = ((h % 1000000L) + 1000000L) % 1000000L
          a(j) = m / 1000000.0 - 0.5
          j += 1
        }
        a
      }
    })
  }

  /** Projection of `vec` onto plane `planeSeed`'s cached coefficient
    * row — float elements widen exactly, so a float vector projects
    * bit-identically to its double-cast image.
    */
  private def project(
      vec: ArrayData, n: Int, isFloat: Boolean, planeSeed: Long): Double = {
    val cs = coeffRow(planeSeed, n)
    var proj = 0.0
    var j = 0
    if (isFloat) while (j < n) { proj += vec.getFloat(j) * cs(j); j += 1 }
    else while (j < n) { proj += vec.getDouble(j) * cs(j); j += 1 }
    proj
  }

  /** Parity notes (pinned in NativeExpressionsSpec):
    *   - empty vector → every projection folds over padded NULLs →
    *     sign 0 → bucket 0L
    *   - any NULL element → the fold is NULL from that point → all
    *     signs 0 → bucket 0L
    *   - NaN projection → Spark orders NaN above all doubles, so the
    *     composable `proj >= 0` is TRUE → sign 1 (Java's NaN >= 0 is
    *     false — hence the explicit isNaN branch)
    */
  def srpBucket64(vec: ArrayData, planes: Int, seedBase: Int): Long =
    srpBucket64(vec, planes, seedBase, false)

  def srpBucket64(
      vec: ArrayData, planes: Int, seedBase: Int, isFloat: Boolean): Long = {
    val n = vec.numElements()
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return 0L
      i += 1
    }
    if (n == 0) return 0L
    var out = 0L
    var p = 0
    while (p < planes) {
      // xxhash64(plane + seedBase, dim) = hashInt(dim, hashInt(plane + seedBase, 42))
      val planeSeed = XXH64.hashInt(p + seedBase, HashSketches.Seed)
      val proj = project(vec, n, isFloat, planeSeed)
      if (proj >= 0 || java.lang.Double.isNaN(proj)) out |= (1L << p)
      p += 1
    }
    out
  }

  /** Query-directed (multi-probe) posting set: the exact SRP bucket
    * FIRST, then the Hamming-1 neighbor buckets of the `probes` planes
    * with the smallest |projection| (margin), in ascending-margin order,
    * ties broken toward the lower plane index.
    *
    * Rationale: a near-duplicate pair that misses the exact bucket
    * almost always disagrees on a LOW-margin plane — conditional on a
    * sign flip at cosine θ, the plane's margin density is
    * ∝ φ(z)·Φ(−z·cotθ), concentrated near zero — so probing the p
    * lowest-margin planes captures most of the Hamming-1 catch mass at
    * (p+1)/(planes+1) of the posting volume
    * ([[graft.ops.Similarity.srpProbeCapture]] computes the capture
    * probability this buys; DedupSpec pins the recall it implies).
    *
    * Malformed vectors (empty, or any NULL element) take the same
    * early-exit as [[srpBucket64]]: bucket 0 with all margins treated as
    * zero, so ties select planes 0..probes−1 — element 0 always equals
    * [[srpBucket64]] (pinned in NativeExpressionsSpec).
    */
  def srpProbeBuckets(
      vec: ArrayData, planes: Int, seedBase: Int, probes: Int): Array[Long] =
    srpProbeBuckets(vec, planes, seedBase, probes, false)

  def srpProbeBuckets(
      vec: ArrayData, planes: Int, seedBase: Int, probes: Int,
      isFloat: Boolean): Array[Long] = {
    val p = math.min(probes, planes)
    val n = vec.numElements()
    var bad = n == 0
    var i = 0
    while (!bad && i < n) {
      if (vec.isNullAt(i)) bad = true
      i += 1
    }
    val out = new Array[Long](p + 1)
    if (bad) {
      var j = 0
      while (j < p) { out(j + 1) = 1L << j; j += 1 }
      return out // bucket 0; zero margins tie toward low plane indices
    }
    val proj = new Array[Double](planes)
    var bucket = 0L
    var pl = 0
    while (pl < planes) {
      val planeSeed = XXH64.hashInt(pl + seedBase, HashSketches.Seed)
      val s = project(vec, n, isFloat, planeSeed)
      if (s >= 0 || java.lang.Double.isNaN(s)) bucket |= (1L << pl)
      proj(pl) = if (java.lang.Double.isNaN(s)) Double.PositiveInfinity else math.abs(s)
      pl += 1
    }
    out(0) = bucket
    // partial selection of the p smallest margins: insertion into a
    // p-slot sorted window (planes ≤ 64, p ≤ planes — driver-solved
    // small constants; strict-less insertion keeps lower plane index
    // on ties because planes are visited in ascending order)
    val selIdx = new Array[Int](p)
    val selMar = new Array[Double](p)
    var filled = 0
    pl = 0
    while (p > 0 && pl < planes) {
      val m = proj(pl)
      if (filled < p || m < selMar(filled - 1)) {
        var pos = math.min(filled, p - 1)
        while (pos > 0 && selMar(pos - 1) > m) {
          selMar(pos) = selMar(pos - 1)
          selIdx(pos) = selIdx(pos - 1)
          pos -= 1
        }
        selMar(pos) = m
        selIdx(pos) = pl
        if (filled < p) filled += 1
      }
      pl += 1
    }
    var r = 0
    while (r < p) { out(r + 1) = bucket ^ (1L << selIdx(r)); r += 1 }
    out
  }
}

/** Native SRP bucket (see [[SrpHash.srpBucket64]]). Accepts
  * `array<double>` or `array<float>` — float elements widen exactly
  * inside the projection, so a float column buckets bit-identically to
  * its double-cast image without a per-row transform materialization.
  */
case class SrpBucket(child: Expression, planes: Int, seedBase: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _)
        if planes >= 1 && planes <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_srp: planes must be in [1, 64], got $planes")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_srp expects array<double|float>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SrpHash.srpBucket64(input.asInstanceOf[ArrayData], planes, seedBase, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SrpHash.srpBucket64($a, $planes, $seedBase, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
}

/** Native query-directed probe posting set (see
  * [[SrpHash.srpProbeBuckets]]): `array<long>` of the exact bucket plus
  * the `probes` lowest-margin Hamming-1 neighbor buckets.
  */
case class SrpProbeBuckets(
    child: Expression, planes: Int, seedBase: Int, probes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _)
        if planes >= 1 && planes <= 64 && probes >= 0 && probes <= planes =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_srp_probes: need planes in [1, 64] and probes in [0, planes], " +
          s"got planes=$planes probes=$probes")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_srp_probes expects array<double|float>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      SrpHash.srpProbeBuckets(
        input.asInstanceOf[ArrayData], planes, seedBase, probes, isFloat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.SrpHash.srpProbeBuckets(
         |    $a, $planes, $seedBase, $probes, $isFloat));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SrpProbeBuckets =
    copy(child = newChild)
}
