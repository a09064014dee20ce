package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Gates for [[VectorOps.kmeansRefine]] — the distributed full-corpus
  * Lloyd refinement behind `refineIters` on the IVF/SemDeDup entry
  * points. The in-memory reference below reimplements one refinement
  * pass exactly as specified (assign each unit vector to its argmax-
  * cosine centroid with the native ties-to-HIGHER-index rule, sum unit
  * vectors per cluster, renormalize, hold empty clusters), so the
  * distributed path is pinned against independently written math, not
  * against itself.
  */
class KmeansRefineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dotA(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(dotA(v, v)); v.map(_ / n)
  }
  /** Native argmax parity: strict Double.compare, ties keep the LATER
    * (higher) centroid index.
    */
  private def assign(p: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = Double.NegativeInfinity; var idx = 0; var c = 0
    while (c < cents.length) {
      val s = dotA(p, cents(c)) /
        (math.sqrt(dotA(p, p)) * math.sqrt(dotA(cents(c), cents(c))))
      if (c == 0 || java.lang.Double.compare(s, best) >= 0) { best = s; idx = c }
      c += 1
    }
    idx
  }
  private def refineRef(
      points: Seq[Array[Double]],
      init: Array[Array[Double]],
      iters: Int): Array[Array[Double]] = {
    var cents = init
    for (_ <- 0 until iters) {
      val sums = Array.fill(cents.length)(new Array[Double](points.head.length))
      val counts = new Array[Long](cents.length)
      points.foreach { p =>
        val u = unit(p)
        val c = assign(u, cents)
        var d = 0
        while (d < u.length) { sums(c)(d) += u(d); d += 1 }
        counts(c) += 1
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0) cents(c)
        else {
          val n = math.sqrt(dotA(sums(c), sums(c)))
          if (n > 0) sums(c).map(_ / n) else cents(c)
        }
      }.toArray
    }
    cents
  }

  /** Three tight clusters around orthogonal axes, sizes 200/60/60 —
    * the skew that lets a tiny sample miss the small clusters.
    */
  private def clusteredRows(seed: Int): Seq[Array[Double]] = {
    val r = new scala.util.Random(seed)
    val axes = Seq(
      Array(1.0, 0, 0, 0, 0, 0),
      Array(0, 1.0, 0, 0, 0, 0),
      Array(0, 0, 1.0, 0, 0, 0))
    val sizes = Seq(200, 60, 60)
    axes.zip(sizes).flatMap { case (ax, n) =>
      (0 until n).map { _ =>
        ax.map(x => x + (r.nextDouble() - 0.5) * 0.08)
      }
    }
  }

  test("distributed refinement ≡ in-memory reference (3 iterations, 1e-9)") {
    import spark.implicits._
    val rows = clusteredRows(7)
    val df = rows.map(_.toSeq).toDF("v")
    val init = VectorOps.kmeansCentroids(df, "v", k = 4, iters = 2, seed = 11L)
    val got = VectorOps.kmeansRefine(df, "v", init, iters = 3)
    val want = refineRef(rows, init, iters = 3)
    assert(got.length == want.length)
    got.zip(want).zipWithIndex.foreach { case ((g, w), c) =>
      g.zip(w).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"centroid $c drifted: $a vs $b")
      }
    }
    // and the post-refinement ASSIGNMENT (what the index actually
    // uses) agrees exactly
    val wantAssign = rows.map(p => assign(unit(p), want))
    val gotAssign = rows.map(p => assign(unit(p), got))
    assert(gotAssign == wantAssign)
  }

  test("full-corpus refinement improves the objective a skewed sample fit missed") {
    import spark.implicits._
    val rows = clusteredRows(13)
    val df = rows.map(_.toSeq).toDF("v")
    // A fit whose sample saw ONLY the big cluster (the failure mode a
    // skewed corpus induces at scale): all three centroids start as
    // perturbed copies of the big cluster's axis, blind to e2/e3 —
    // constructed directly so the premise doesn't ride on sample luck.
    val sampleFit = Array(
      unit(Array(1.0, 0.02, 0, 0.03, 0, 0)),
      unit(Array(1.0, 0, 0.04, 0, 0.01, 0)),
      unit(Array(1.0, 0.01, 0, 0, 0, 0.05)))
    val refined = VectorOps.kmeansRefine(df, "v", sampleFit, iters = 5)
    def objective(cents: Array[Array[Double]]): Double =
      rows.map { p =>
        val u = unit(p); dotA(u, unit(cents(assign(u, cents))))
      }.sum / rows.length
    val before = objective(sampleFit)
    val after = objective(refined)
    assert(after > before + 0.005,
      s"refinement did not improve mean assigned cosine: $before -> $after")
    // the sample-blind SMALL clusters are the point: under the sample
    // fit their rows sit near-orthogonal to every centroid (cos ≈ 0);
    // refinement must give them real representation. (Full purity is
    // NOT asserted — Lloyd from a degenerate init can legitimately
    // settle in a local optimum that splits the big cluster; what it
    // cannot do is keep ignoring 120 coherent rows.)
    def smallClusterCos(cents: Array[Array[Double]]): Double = {
      val small = rows.drop(200)
      small.map { p =>
        val u = unit(p); dotA(u, unit(cents(assign(u, cents))))
      }.sum / small.length
    }
    val smallBefore = smallClusterCos(sampleFit)
    val smallAfter = smallClusterCos(refined)
    assert(smallBefore < 0.3,
      s"test premise broken: the 4-row sample fit already covers the small clusters ($smallBefore)")
    assert(smallAfter > 0.5,
      s"refinement left the small clusters unrepresented: $smallBefore -> $smallAfter")
  }

  test("refineIters = 0 is exactly the sample fit; empty clusters hold bit-identically") {
    import spark.implicits._
    val rows = clusteredRows(29)
    val df = rows.map(_.toSeq).toDF("v")
    val base = VectorOps.kmeansCentroids(df, "v", k = 3, iters = 2, seed = 3L)
    val same = VectorOps.kmeansCentroidsRefined(df, "v", k = 3, iters = 2, seed = 3L)
    assert(base.zip(same).forall { case (a, b) => a.sameElements(b) })

    // a centroid pointing AWAY from every row gets no assignment and
    // must survive refinement bit-identical (held, not zeroed)
    val dead = Array(-1.0, -1.0, -1.0, 0.0, 0.0, 0.0).map(_ / math.sqrt(3))
    val init = Array(Array(1.0, 0, 0, 0, 0, 0), dead)
    val out = VectorOps.kmeansRefine(df, "v", init, iters = 2)
    assert(out(1).sameElements(dead), "empty cluster was not held")
  }

  test("hier-routed refinement (past hierThreshold) matches flat when probes cover all groups") {
    import spark.implicits._
    val rows = clusteredRows(31)
    val df = rows.map(_.toSeq).toDF("v")
    val init = VectorOps.kmeansCentroids(df, "v", k = 4, iters = 2, seed = 17L)
    val flat = VectorOps.kmeansRefine(df, "v", init, iters = 2,
      hierThreshold = Int.MaxValue)
    // hierThreshold = 1 forces coarse→fine routing; coarseProbes = 4 ≥
    // ⌈√4⌉ groups probes every group, so routing is exact and the two
    // paths may differ only by partial-sum merge order
    val hier = VectorOps.kmeansRefine(df, "v", init, iters = 2,
      hierThreshold = 1, coarseProbes = 4)
    flat.zip(hier).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
  }
}
