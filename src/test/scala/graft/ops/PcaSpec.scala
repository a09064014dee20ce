package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dotA(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("components are orthonormal, eigenvalues non-negative descending, Cv = λv") {
    import spark.implicits._
    // 60 rows < sampleRows, so the "sample" is the full input and the
    // covariance is recomputable exactly in the test
    val rows = (0 until 60).map { i =>
      val r = new scala.util.Random(i)
      Array.fill(6)(r.nextDouble() * (1 + i % 3))
    }
    val df = rows.map(_.toSeq).toDF("v")
    val m = VectorOps.pcaFit(df, "v", c = 6)
    for (i <- m.components.indices; j <- i until m.components.length) {
      val d = dotA(m.components(i), m.components(j))
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-9, s"component dot ($i,$j) = $d")
    }
    assert(m.eigenvalues.forall(_ >= -1e-12))
    assert(m.eigenvalues.sliding(2).forall(p => p.length < 2 || p(0) >= p(1) - 1e-12))
    // rebuild the covariance from the same rows and check Cv = λv
    val d = 6; val n = rows.length
    val mean = Array.tabulate(d)(j => rows.map(_(j)).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n)
    for (k <- m.components.indices) {
      val v = m.components(k)
      val cv = Array.tabulate(d)(i => dotA(cov(i), v))
      val resid = math.sqrt(cv.zip(v.map(_ * m.eigenvalues(k)))
        .map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(resid < 1e-9, s"eigenpair $k residual $resid")
    }
    assert(m.mean.zip(mean).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("a planted dominant direction is recovered as the first component") {
    import spark.implicits._
    val e = Array(1.0, 1.0, 0.0, 0.0).map(_ / math.sqrt(2))
    // ONE generator: per-row Random(i) first draws are correlated
    // across consecutive seeds and collapse the planted variance
    val r = new scala.util.Random(42)
    val rows = (0 until 200).map { _ =>
      val big = (r.nextDouble() - 0.5) * 10
      val noise = (r.nextDouble() - 0.5) * 0.1
      Array(e(0) * big, e(1) * big, noise, (r.nextDouble() - 0.5) * 0.05)
    }
    val m = VectorOps.pcaFit(rows.map(_.toSeq).toDF("v"), "v", c = 2)
    assert(math.abs(dotA(m.components(0), e)) > 0.999,
      s"first component ${m.components(0).toSeq} missed the planted direction")
    assert(m.eigenvalues(0) > 20 * m.eigenvalues(1))
  }

  test("distributed projection ≡ local arithmetic, and the fit is deterministic") {
    val embs = Tables.load(spark, TestSpark.Sf001, "embeddings")
    val m = VectorOps.pcaFit(embs, "embedding", c = 4)
    val m2 = VectorOps.pcaFit(embs, "embedding", c = 4)
    assert(m.components.map(_.toSeq).toSeq === m2.components.map(_.toSeq).toSeq)
    assert(m.eigenvalues.toSeq === m2.eigenvalues.toSeq)
    val got = VectorOps.pcaProject(embs, "embedding", m)
      .select(col("vec_id"), col("pca")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val local = embs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    for ((id, x) <- local.take(50)) {
      val expected = m.components.map(cp => dotA(x, cp) - dotA(m.mean, cp))
      val g = got(id)
      assert(g.length === expected.length)
      for (i <- expected.indices)
        assert(math.abs(g(i) - expected(i)) < 1e-6, s"vec $id comp $i")
    }
  }

  test("projection plan is map-only: no exchange, inside codegen") {
    val embs = Tables.load(spark, TestSpark.Sf001, "embeddings")
    val m = VectorOps.pcaFit(embs, "embedding", c = 4)
    val df = VectorOps.pcaProject(embs, "embedding", m).select("vec_id", "pca")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(p).isDefined,
      s"projection fell out of codegen:\n$p")
  }
}
