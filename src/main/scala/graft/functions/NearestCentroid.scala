package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment over a FIXED centroid table: argmax over
  * c of dot(vec, cent_c) / (norm · |cent_c|), ties toward the higher
  * index — the exact semantics of the `greatest(struct(sim, idx)...)`
  * formulation `VectorOps.assignClusters` used before this expression
  * existed (pinned against it in NativeExpressionsSpec).
  *
  * Why native: the greatest-over-structs form materializes one struct
  * and one dot-product subtree PER CENTROID in the generated code —
  * at the corpus-scaled nClusters the operating rule calls for
  * (nClusters ~ N / expected-cluster-size), a 1024-centroid assignment
  * generated a ~15k-line class that failed janino compilation and fell
  * back to interpreted struct comparisons, measured ~185× at the 64×
  * probe. Here the centroid matrix rides along as ONE flat double[]
  * reference object (512 KB at 1024 × dim 64 — task-binary size, not
  * codegen size) and assignment is a tight two-level primitive loop,
  * the same loop at 16 centroids or 16k.
  *
  * A malformed vector (length ≠ dim, or a null element) yields NULL —
  * unreachable through assignClusters, which filters `l2Norm > 0`
  * first (null elements and empty arrays never pass).
  */
object NearestCentroidEval {
  /** Returns the centroid index, or -1 for the NULL (malformed) case.
    * `vecIsFloat` selects the element reader; each float widens exactly
    * to double, so assignments are bit-identical to cast-then-assign.
    */
  def nearest(
      vec: ArrayData,
      norm: Double,
      flat: Array[Double],
      norms: Array[Double],
      dim: Int,
      vecIsFloat: Boolean): Int = {
    if (vec.numElements() != dim) return -1
    var d = 0
    while (d < dim) {
      if (vec.isNullAt(d)) return -1
      d += 1
    }
    val k = norms.length
    var best = Double.NegativeInfinity
    var idx = 0
    var c = 0
    while (c < k) {
      var s = 0.0
      val off = c * dim
      var j = 0
      while (j < dim) {
        s += (if (vecIsFloat) vec.getFloat(j).toDouble else vec.getDouble(j)) * flat(off + j)
        j += 1
      }
      val sim = s / (norm * norms(c))
      // Double.compare orders NaN above reals and ties keep the LATER
      // (higher) index — both exactly the struct-greatest tiebreak.
      if (c == 0 || java.lang.Double.compare(sim, best) >= 0) {
        best = sim
        idx = c
      }
      c += 1
    }
    idx
  }

  /** The `n` nearest centroid indices, best-first — the relation-side
    * generalization of [[nearest]] used by `VectorOps.ivfKnnJoin` to
    * give every QUERY ROW its probe list in one map-only expression
    * (the single-query path computes the same list driver-side in
    * `probeClusters`). Order matches `probeClusters` exactly:
    * descending similarity, ties toward the LOWER index — note the
    * argmax in [[nearest]] ties toward the HIGHER index; the two rules
    * are each pinned by their own parity tests and both unreachable
    * through real corpora (exact float ties across distinct centroids).
    * Returns null for a malformed vector (wrong length / null element).
    */
  def nearestN(
      vec: ArrayData,
      norm: Double,
      flat: Array[Double],
      norms: Array[Double],
      dim: Int,
      n: Int,
      vecIsFloat: Boolean): Array[Int] = {
    if (vec.numElements() != dim) return null
    var d = 0
    while (d < dim) {
      if (vec.isNullAt(d)) return null
      d += 1
    }
    val k = norms.length
    val m = math.min(n, k)
    val simBuf = new Array[Double](m)
    val idxBuf = new Array[Int](m)
    var filled = 0
    var c = 0
    while (c < k) {
      var s = 0.0
      val off = c * dim
      var j = 0
      while (j < dim) {
        s += (if (vecIsFloat) vec.getFloat(j).toDouble else vec.getDouble(j)) * flat(off + j)
        j += 1
      }
      val sim = s / (norm * norms(c))
      // centroids arrive in ascending index order, so on an exact sim
      // tie the incumbent (lower index) keeps its slot — strictly-
      // greater is the only displacement, giving the (-sim, idx) order.
      var p = filled
      while (p > 0 && java.lang.Double.compare(sim, simBuf(p - 1)) > 0) p -= 1
      if (p < m) {
        var q = math.min(filled, m - 1)
        while (q > p) { simBuf(q) = simBuf(q - 1); idxBuf(q) = idxBuf(q - 1); q -= 1 }
        simBuf(p) = sim
        idxBuf(p) = c
        if (filled < m) filled += 1
      }
      c += 1
    }
    java.util.Arrays.copyOf(idxBuf, filled)
  }

  /** Hierarchical (coarse→fine) top-`n`: scan the `coarseProbes`
    * nearest of the √k-ish coarse centroids, then rank only the FINE
    * centroids grouped under them — O((coarseK + probed members) · dim)
    * per row instead of O(k · dim), the routing that keeps the
    * nClusters ~ N operating rule affordable when k reaches the
    * hundreds of thousands (SCALE.md "known far-scale limit").
    *
    * `memberStart`/`members` is the CSR layout of the fine→coarse
    * grouping: group g's fine indices are
    * `members(memberStart(g) until memberStart(g+1))`.
    *
    * Ties: both levels order by (-sim, lower index) — the idx-aware
    * comparator makes the result independent of enumeration order, so
    * with `coarseProbes == coarseK` (every group probed, every fine
    * centroid scanned) the output is EXACTLY [[nearestN]] — the strict
    * parity mode the suite pins. With fewer probes the scanned set
    * shrinks and the result is approximate in the usual IVF sense:
    * recall = probability the true argmax's group is probed.
    */
  def nearestNHier(
      vec: ArrayData,
      norm: Double,
      flat: Array[Double],
      norms: Array[Double],
      dim: Int,
      n: Int,
      vecIsFloat: Boolean,
      coarseFlat: Array[Double],
      coarseNorms: Array[Double],
      memberStart: Array[Int],
      members: Array[Int],
      coarseProbes: Int): Array[Int] = {
    if (vec.numElements() != dim) return null
    var d = 0
    while (d < dim) {
      if (vec.isNullAt(d)) return null
      d += 1
    }
    val coarseK = coarseNorms.length
    val p = math.min(coarseProbes, coarseK)
    // top-p coarse groups, (-sim, idx) order via the idx-aware insert
    val gSim = new Array[Double](p)
    val gIdx = new Array[Int](p)
    var gFilled = 0
    var g = 0
    while (g < coarseK) {
      var s = 0.0
      val off = g * dim
      var j = 0
      while (j < dim) {
        s += (if (vecIsFloat) vec.getFloat(j).toDouble else vec.getDouble(j)) * coarseFlat(off + j)
        j += 1
      }
      val sim = s / (norm * coarseNorms(g))
      var pos = gFilled
      while (pos > 0 && {
        val cmp = java.lang.Double.compare(sim, gSim(pos - 1))
        cmp > 0 || (cmp == 0 && g < gIdx(pos - 1))
      }) pos -= 1
      if (pos < p) {
        var q = math.min(gFilled, p - 1)
        while (q > pos) { gSim(q) = gSim(q - 1); gIdx(q) = gIdx(q - 1); q -= 1 }
        gSim(pos) = sim
        gIdx(pos) = g
        if (gFilled < p) gFilled += 1
      }
      g += 1
    }
    // top-n fine centroids among the probed groups' members
    val k = norms.length
    val m = math.min(n, k)
    val simBuf = new Array[Double](m)
    val idxBuf = new Array[Int](m)
    var filled = 0
    var gi = 0
    while (gi < gFilled) {
      val grp = gIdx(gi)
      var mi = memberStart(grp)
      val end = memberStart(grp + 1)
      while (mi < end) {
        val c = members(mi)
        var s = 0.0
        val off = c * dim
        var j = 0
        while (j < dim) {
          s += (if (vecIsFloat) vec.getFloat(j).toDouble else vec.getDouble(j)) * flat(off + j)
          j += 1
        }
        val sim = s / (norm * norms(c))
        // members arrive group-by-group (NOT ascending), so the insert
        // must compare the index too for the (-sim, idx) total order
        var pos = filled
        while (pos > 0 && {
          val cmp = java.lang.Double.compare(sim, simBuf(pos - 1))
          cmp > 0 || (cmp == 0 && c < idxBuf(pos - 1))
        }) pos -= 1
        if (pos < m) {
          var q = math.min(filled, m - 1)
          while (q > pos) { simBuf(q) = simBuf(q - 1); idxBuf(q) = idxBuf(q - 1); q -= 1 }
          simBuf(pos) = sim
          idxBuf(pos) = c
          if (filled < m) filled += 1
        }
        mi += 1
      }
      gi += 1
    }
    java.util.Arrays.copyOf(idxBuf, filled)
  }
}

/** Native nearest-centroid (see [[NearestCentroidEval.nearest]]).
  * `flat` is the row-major nCentroids × dim matrix; `norms` its
  * per-centroid L2 norms (precomputed once, driver-side).
  */
case class NearestCentroid(
    left: Expression,
    right: Expression,
    flat: Array[Double],
    norms: Array[Double],
    dim: Int)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private def vecIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType | FloatType, _), DoubleType)
          if dim >= 1 && norms.nonEmpty && flat.length == norms.length * dim =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType | FloatType, _), DoubleType) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_nearest_centroid: inconsistent centroid table " +
            s"(flat=${flat.length}, norms=${norms.length}, dim=$dim)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_nearest_centroid expects (array<double|float>, double), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(vec: Any, norm: Any): Any = {
    val r = NearestCentroidEval.nearest(
      vec.asInstanceOf[ArrayData], norm.asInstanceOf[Double], flat, norms, dim, vecIsFloat)
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centsFlat", flat, "double[]")
    val normsRef = ctx.addReferenceObj("centNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, (v, nrm) => {
      val r = ctx.freshName("cluster")
      s"""
         |final int $r = graft.functions.NearestCentroidEval.nearest(
         |  $v, $nrm, $flatRef, $normsRef, $dim, $vecIsFloat);
         |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)

  // Array fields compare by reference under the synthesized case-class
  // equals, so two semantically identical calls built from separate
  // driver-side tables would never be semanticEquals — defeating
  // canonicalization / common-subexpression elimination (a cost leak,
  // not a correctness one). Compare the table by content instead.
  override def equals(other: Any): Boolean = other match {
    case o: NearestCentroid =>
      left == o.left && right == o.right && dim == o.dim &&
        java.util.Arrays.equals(flat, o.flat) &&
        java.util.Arrays.equals(norms, o.norms)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(left, right, Int.box(dim),
      Int.box(java.util.Arrays.hashCode(flat)),
      Int.box(java.util.Arrays.hashCode(norms)))
}

/** Native top-`n` nearest centroids (see [[NearestCentroidEval.nearestN]])
  * — one `array<int>` of probe-cluster indices per input row, best-first.
  * This is what lets a query RELATION route itself through an IVF cut of
  * the space in a single map-only pass (`VectorOps.ivfKnnJoin`): the
  * alternative — a per-centroid struct subtree + array_sort — regrows
  * exactly the janino-breaking codegen the scalar [[NearestCentroid]]
  * exists to avoid.
  */
case class NearestCentroids(
    left: Expression,
    right: Expression,
    flat: Array[Double],
    norms: Array[Double],
    dim: Int,
    n: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  private def vecIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType | FloatType, _), DoubleType)
          if dim >= 1 && n >= 1 && norms.nonEmpty &&
            flat.length == norms.length * dim =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType | FloatType, _), DoubleType) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_nearest_centroids: inconsistent centroid table or n " +
            s"(flat=${flat.length}, norms=${norms.length}, dim=$dim, n=$n)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_nearest_centroids expects (array<double|float>, double), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(vec: Any, norm: Any): Any = {
    val r = NearestCentroidEval.nearestN(
      vec.asInstanceOf[ArrayData], norm.asInstanceOf[Double],
      flat, norms, dim, n, vecIsFloat)
    if (r == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centsFlat", flat, "double[]")
    val normsRef = ctx.addReferenceObj("centNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, (v, nrm) => {
      val arr = ctx.freshName("probes")
      s"""
         |final int[] $arr = graft.functions.NearestCentroidEval.nearestN(
         |  $v, $nrm, $flatRef, $normsRef, $dim, $n, $vecIsFloat);
         |if ($arr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($arr); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroids =
    copy(left = newLeft, right = newRight)

  // content-based equality for the same CSE reason as NearestCentroid
  override def equals(other: Any): Boolean = other match {
    case o: NearestCentroids =>
      left == o.left && right == o.right && dim == o.dim && n == o.n &&
        java.util.Arrays.equals(flat, o.flat) &&
        java.util.Arrays.equals(norms, o.norms)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(left, right, Int.box(dim), Int.box(n),
      Int.box(java.util.Arrays.hashCode(flat)),
      Int.box(java.util.Arrays.hashCode(norms)))
}

/** Hierarchical top-n nearest centroids (see
  * [[NearestCentroidEval.nearestNHier]]) — the two-level routing that
  * replaces the flat O(k · dim)-per-row scan once the centroid table
  * outgrows it. The coarse table and CSR grouping ride along as
  * reference objects like the fine table does.
  */
case class NearestCentroidsHier(
    left: Expression,
    right: Expression,
    flat: Array[Double],
    norms: Array[Double],
    dim: Int,
    n: Int,
    coarseFlat: Array[Double],
    coarseNorms: Array[Double],
    memberStart: Array[Int],
    members: Array[Int],
    coarseProbes: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  private def vecIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType | FloatType, _), DoubleType)
          if dim >= 1 && n >= 1 && coarseProbes >= 1 &&
            norms.nonEmpty && flat.length == norms.length * dim &&
            coarseNorms.nonEmpty &&
            coarseFlat.length == coarseNorms.length * dim &&
            memberStart.length == coarseNorms.length + 1 &&
            memberStart.head == 0 && memberStart.last == members.length &&
            members.length == norms.length =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType | FloatType, _), DoubleType) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_nearest_centroids_hier: inconsistent tables " +
            s"(flat=${flat.length}, norms=${norms.length}, dim=$dim, n=$n, " +
            s"coarse=${coarseNorms.length}, members=${members.length}, " +
            s"memberStart=${memberStart.length}, probes=$coarseProbes)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_nearest_centroids_hier expects (array<double|float>, double), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(vec: Any, norm: Any): Any = {
    val r = NearestCentroidEval.nearestNHier(
      vec.asInstanceOf[ArrayData], norm.asInstanceOf[Double],
      flat, norms, dim, n, vecIsFloat,
      coarseFlat, coarseNorms, memberStart, members, coarseProbes)
    if (r == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centsFlat", flat, "double[]")
    val normsRef = ctx.addReferenceObj("centNorms", norms, "double[]")
    val cFlatRef = ctx.addReferenceObj("coarseFlat", coarseFlat, "double[]")
    val cNormsRef = ctx.addReferenceObj("coarseNorms", coarseNorms, "double[]")
    val startRef = ctx.addReferenceObj("memberStart", memberStart, "int[]")
    val membersRef = ctx.addReferenceObj("members", members, "int[]")
    nullSafeCodeGen(ctx, ev, (v, nrm) => {
      val arr = ctx.freshName("probes")
      s"""
         |final int[] $arr = graft.functions.NearestCentroidEval.nearestNHier(
         |  $v, $nrm, $flatRef, $normsRef, $dim, $n, $vecIsFloat,
         |  $cFlatRef, $cNormsRef, $startRef, $membersRef, $coarseProbes);
         |if ($arr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($arr); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidsHier =
    copy(left = newLeft, right = newRight)

  // content-based equality for the same CSE reason as NearestCentroid
  override def equals(other: Any): Boolean = other match {
    case o: NearestCentroidsHier =>
      left == o.left && right == o.right && dim == o.dim && n == o.n &&
        coarseProbes == o.coarseProbes &&
        java.util.Arrays.equals(flat, o.flat) &&
        java.util.Arrays.equals(norms, o.norms) &&
        java.util.Arrays.equals(coarseFlat, o.coarseFlat) &&
        java.util.Arrays.equals(memberStart, o.memberStart) &&
        java.util.Arrays.equals(members, o.members)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(left, right, Int.box(dim), Int.box(n),
      Int.box(coarseProbes),
      Int.box(java.util.Arrays.hashCode(flat)),
      Int.box(java.util.Arrays.hashCode(coarseFlat)),
      Int.box(java.util.Arrays.hashCode(members)))
}
