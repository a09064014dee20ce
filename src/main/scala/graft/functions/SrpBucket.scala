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
  /** Parity notes (pinned in NativeExpressionsSpec):
    *   - empty vector → every projection folds over padded NULLs →
    *     sign 0 → bucket 0L
    *   - any NULL element → the fold is NULL from that point → all
    *     signs 0 → bucket 0L
    *   - NaN projection → Spark orders NaN above all doubles, so the
    *     composable `proj >= 0` is TRUE → sign 1 (Java's NaN >= 0 is
    *     false — hence the explicit isNaN branch)
    */
  def srpBucket64(vec: ArrayData, planes: Int, seedBase: Int): Long = {
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
      var proj = 0.0
      var j = 0
      while (j < n) {
        val h = XXH64.hashInt(j, planeSeed)
        val m = ((h % 1000000L) + 1000000L) % 1000000L
        proj += vec.getDouble(j) * (m / 1000000.0 - 0.5)
        j += 1
      }
      if (proj >= 0 || java.lang.Double.isNaN(proj)) out |= (1L << p)
      p += 1
    }
    out
  }
}

/** Native SRP bucket (see [[SrpHash.srpBucket64]]). */
case class SrpBucket(child: Expression, planes: Int, seedBase: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if planes >= 1 && planes <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_srp: planes must be in [1, 64], got $planes")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_srp expects array<double>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SrpHash.srpBucket64(input.asInstanceOf[ArrayData], planes, seedBase)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SrpHash.srpBucket64($a, $planes, $seedBase);")

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
}
