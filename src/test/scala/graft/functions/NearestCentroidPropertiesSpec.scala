package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the pure JVM half of the native
  * nearest-centroid expression — random vector/centroid sweeps the
  * corpus parity test (SimilaritySpec) can't cover, run WITHOUT a
  * Spark session (the eval function is plain code).
  */
object NearestCentroidPropertiesSpec extends Properties("graft.nearestCentroid") {

  private val dimGen = Gen.choose(1, 8)
  private def vecGen(dim: Int): Gen[Array[Double]] =
    Gen.listOfN(dim, Gen.choose(-5.0, 5.0)).map(_.toArray)
      .suchThat(v => math.sqrt(v.map(x => x * x).sum) > 1e-9)

  /** Straight-line reference: argmax of dot/(norm·|c|), ties (via
    * Double.compare, NaN above reals) toward the HIGHER index — the
    * struct-greatest semantics the expression scaladoc pins.
    */
  private def reference(
      vec: Array[Double], cents: Array[Array[Double]]): Int = {
    val norm = math.sqrt(vec.map(x => x * x).sum)
    val sims = cents.map { c =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      vec.zip(c).map { case (a, b) => a * b }.sum / (norm * cn)
    }
    sims.zipWithIndex.maxBy { case (s, i) => (s, i) }(
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))._2
  }

  property("native eval ≡ argmax reference on random vectors and tables") =
    forAll(for {
      dim <- dimGen
      k <- Gen.choose(1, 20)
      cents <- Gen.listOfN(k, vecGen(dim))
      vec <- vecGen(dim)
    } yield (dim, cents.toArray, vec)) { case (dim, cents, vec) =>
      val flat = cents.flatten
      val norms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
      val norm = math.sqrt(vec.map(x => x * x).sum)
      val got = NearestCentroidEval.nearest(
        new GenericArrayData(vec), norm, flat, norms, dim, vecIsFloat = false)
      got == reference(vec, cents)
    }

  property("duplicated centroid: the higher index wins (tie rule)") =
    forAll(for {
      dim <- dimGen
      c <- vecGen(dim)
      k <- Gen.choose(1, 6)
    } yield (dim, c, k)) { case (dim, c, k) =>
      // k copies of the same centroid -> every sim ties exactly
      val cents = Array.fill(k)(c)
      val flat = cents.flatten
      val norms = cents.map(cc => math.sqrt(cc.map(x => x * x).sum))
      val norm = math.sqrt(c.map(x => x * x).sum)
      NearestCentroidEval.nearest(
        new GenericArrayData(c), norm, flat, norms, dim, vecIsFloat = false) == k - 1
    }

  /** Reference for the top-n variant: full sort by (-sim, idx) — the
    * `probeClusters` driver-side semantics nearestN pins.
    */
  private def referenceN(
      vec: Array[Double], cents: Array[Array[Double]], n: Int): Seq[Int] = {
    val norm = math.sqrt(vec.map(x => x * x).sum)
    cents.zipWithIndex.map { case (c, i) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      (vec.zip(c).map { case (a, b) => a * b }.sum / (norm * cn), i)
    }.sortBy { case (s, i) => (-s, i) }.take(n).map(_._2).toSeq
  }

  property("nearestN ≡ sort-take reference (order, ties, n >= k truncation)") =
    forAll(for {
      dim <- dimGen
      k <- Gen.choose(1, 20)
      cents <- Gen.listOfN(k, vecGen(dim))
      vec <- vecGen(dim)
      n <- Gen.choose(1, 25) // deliberately allowed past k
    } yield (dim, cents.toArray, vec, n)) { case (dim, cents, vec, n) =>
      val flat = cents.flatten
      val norms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
      val norm = math.sqrt(vec.map(x => x * x).sum)
      val got = NearestCentroidEval.nearestN(
        new GenericArrayData(vec), norm, flat, norms, dim, n, vecIsFloat = false).toSeq
      got == referenceN(vec, cents, n)
    }

  property("nearestN on duplicated centroids keeps ascending index order (tie rule)") =
    forAll(for {
      dim <- dimGen
      c <- vecGen(dim)
      k <- Gen.choose(1, 6)
    } yield (dim, c, k)) { case (dim, c, k) =>
      val cents = Array.fill(k)(c)
      val flat = cents.flatten
      val norms = cents.map(cc => math.sqrt(cc.map(x => x * x).sum))
      val norm = math.sqrt(c.map(x => x * x).sum)
      // every sim ties exactly -> (-sim, idx) order is 0, 1, ..., k-1
      NearestCentroidEval.nearestN(
        new GenericArrayData(c), norm, flat, norms, dim, k, vecIsFloat = false)
        .toSeq == (0 until k)
    }

  property("nearestNHier probing ALL coarse groups ≡ flat nearestN (strict parity mode)") =
    forAll(for {
      dim <- dimGen
      k <- Gen.choose(1, 20)
      cents <- Gen.listOfN(k, vecGen(dim))
      vec <- vecGen(dim)
      n <- Gen.choose(1, 25)
      ck <- Gen.choose(1, k)
      coarse <- Gen.listOfN(ck, vecGen(dim))
      grouping <- Gen.listOfN(k, Gen.choose(0, ck - 1)) // arbitrary grouping
    } yield (dim, cents.toArray, vec, n, coarse.toArray, grouping.toArray)) {
      case (dim, cents, vec, n, coarse, grouping) =>
        val flat = cents.flatten
        val norms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
        val norm = math.sqrt(vec.map(x => x * x).sum)
        val ck = coarse.length
        // CSR from the arbitrary grouping, ascending fine index per group
        val memberStart = new Array[Int](ck + 1)
        grouping.foreach(g => memberStart(g + 1) += 1)
        for (g <- 1 to ck) memberStart(g) += memberStart(g - 1)
        val cursor = memberStart.clone()
        val members = new Array[Int](cents.length)
        for (i <- cents.indices) { members(cursor(grouping(i))) = i; cursor(grouping(i)) += 1 }
        // with every group probed, the scanned fine set is everything →
        // exactly the flat result regardless of coarse table/grouping
        val got = NearestCentroidEval.nearestNHier(
          new GenericArrayData(vec), norm, flat, norms, dim, n, vecIsFloat = false,
          coarse.flatten, coarse.map(c => math.sqrt(c.map(x => x * x).sum)),
          memberStart, members, coarseProbes = ck).toSeq
        got == NearestCentroidEval.nearestN(
          new GenericArrayData(vec), norm, flat, norms, dim, n, vecIsFloat = false).toSeq
    }

  property("malformed vectors (wrong length) signal null, never a cluster") =
    forAll(for {
      dim <- Gen.choose(2, 8)
      c <- vecGen(dim)
      shorter <- vecGen(dim - 1)
    } yield (dim, c, shorter)) { case (dim, c, shorter) =>
      val norms = Array(math.sqrt(c.map(x => x * x).sum))
      NearestCentroidEval.nearest(
        new GenericArrayData(shorter), 1.0, c, norms, dim, vecIsFloat = false) == -1
    }
}
