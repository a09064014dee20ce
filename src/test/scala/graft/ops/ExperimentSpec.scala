package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExperimentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cuped: planted linear covariate — theta recovered, variance collapses, arm means de-noised") {
    // y = 2x + armEffect + deterministic noise; x varies a lot, so the
    // raw arm means are dominated by covariate imbalance
    val rows = (1L to 400L).map { i =>
      val arm = if (i % 2 == 0) "t" else "c"
      val x = (i % 37).toDouble
      val eff = if (arm == "t") 3.0 else 0.0
      (arm, i, x, 2.0 * x + eff + (i % 5).toDouble)
    }.toDF("arm", "id", "x", "y")
    val out = Experiment.cuped(rows, "arm", "y", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    val t = out("t"); val c = out("c")
    // closed-form reference over the same exact sums
    val d = rows.select("arm", "x", "y").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val n = d.length.toDouble
    val (sx, sy) = (d.map(_._2).sum, d.map(_._3).sum)
    val varX = (d.map(v => v._2 * v._2).sum - sx * sx / n) / n
    val covXY = (d.map(v => v._2 * v._3).sum - sx * sy / n) / n
    val theta = covXY / varX
    assert(t.getAs[Double]("theta")
      === math.rint(theta * 1e6) / 1e6)
    // variance reduction is large: x explains most of y
    assert(t.getAs[Double]("var_reduction") > 0.9)
    // adjusted treatment effect ≈ the planted 3.0, far closer than raw
    val adjGap = t.getAs[Double]("mean_adj") - c.getAs[Double]("mean_adj")
    assert(math.abs(adjGap - 3.0) < 0.5, s"adjusted gap $adjGap")
    // degenerate covariate → NULL theta/var_adj, not a blowup
    val const = rows.withColumn("x", lit(7.0))
    val degen = Experiment.cuped(const, "arm", "y", "x").head()
    assert(degen.isNullAt(degen.fieldIndex("theta")))
    assert(degen.isNullAt(degen.fieldIndex("var_adj")))
  }

  test("srmCheck: balance, planted mismatch, absent arm, unknown arm") {
    val balanced = (1 to 100).map(i => Tuple1(if (i % 2 == 0) "a" else "b"))
      .toDF("arm")
    val ok = Experiment.srmCheck(balanced, "arm",
      Map("a" -> 0.5, "b" -> 0.5)).head()
    assert(ok.getAs[Double]("chi2") === 0.0)
    assert(ok.getAs[Long]("df") === 1L)
    // 90/10 observed against a 50/50 design: chi2 = 2·(40²/50) = 64
    val skew = ((1 to 90).map(_ => "a") ++ (1 to 10).map(_ => "b"))
      .map(Tuple1(_)).toDF("arm")
    val bad = Experiment.srmCheck(skew, "arm", Map("a" -> 0.5, "b" -> 0.5))
      .head()
    assert(bad.getAs[Double]("chi2") === 64.0)
    // a designed arm that never shows up gets an explicit 0-count row
    val absent = Experiment.srmCheck(balanced, "arm",
      Map("a" -> 0.4, "b" -> 0.4, "ghost" -> 0.2))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_obs")).toMap
    assert(absent("ghost") === 0L)
    // an observed arm outside the design IS the mismatch — fail fast
    intercept[IllegalArgumentException] {
      Experiment.srmCheck(balanced, "arm", Map("a" -> 1.0)).collect()
    }
  }

  test("ratioMetric: delta-method SE vs an in-memory reference; two-arm z; degenerate paths") {
    val rows = (1L to 300L).map { i =>
      val arm = if (i % 2 == 0) "t" else "c"
      val x = (1 + i % 7).toDouble            // sessions per user
      val y = (i % 3).toDouble                // conversions per user
      (arm, i, y, x)
    }.toDF("arm", "id", "y", "x")
    val out = Experiment.ratioMetric(rows, "arm", "y", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    // in-memory delta method for one arm
    val c = (1L to 300L).filter(_ % 2 == 1)
      .map(i => ((i % 3).toDouble, (1 + i % 7).toDouble))
    val n = c.length.toDouble
    val (sy, sx) = (c.map(_._1).sum, c.map(_._2).sum)
    val r = sy / sx
    val varY = (c.map(v => v._1 * v._1).sum - sy * sy / n) / n
    val varX = (c.map(v => v._2 * v._2).sum - sx * sx / n) / n
    val covXY = (c.map(v => v._1 * v._2).sum - sx * sy / n) / n
    val se = math.sqrt(
      (varY - 2.0 * r * covXY + r * r * varX) / (n * (sx / n) * (sx / n)))
    assert(out("c").getAs[Double]("ratio") === math.rint(r * 1e6) / 1e6)
    assert(math.abs(out("c").getAs[Double]("se") - se) < 1e-6)
    assert(!out("c").isNullAt(out("c").fieldIndex("z")))
    // three arms → z NULL (no canonical pair), per-arm stats intact
    val three = rows.withColumn("arm",
      (col("id") % 3).cast("string"))
    val t3 = Experiment.ratioMetric(three, "arm", "y", "x").head()
    assert(t3.isNullAt(t3.fieldIndex("z")))
    assert(!t3.isNullAt(t3.fieldIndex("ratio")))
    // zero denominator arm → NULL ratio/se, not a blowup
    val degen = Seq(("z", 1L, 1.0, 0.0), ("z", 2L, 2.0, 0.0))
      .toDF("arm", "id", "y", "x")
    val dz = Experiment.ratioMetric(degen, "arm", "y", "x").head()
    assert(dz.isNullAt(dz.fieldIndex("ratio")) &&
      dz.isNullAt(dz.fieldIndex("se")))
  }

  test("trimmedMean: outliers clipped, duplicate mass split exactly at the cut, empty-middle NULL") {
    // 18 ones + two huge outliers, trim 1/20 of n=20 → 1 row each side:
    // drops one 1 and one 1000 → mean of (17×1 + 1000)/18
    val vals = (Seq.fill(18)(1.0) ++ Seq(1000.0, 1000.0)).zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) }
    val got = Experiment.trimmedMeanByGroup(
      vals.toDF("grp", "id", "v"), Seq("grp"), "v").head()
    assert(got.getAs[Long]("n_rows") === 20L)
    assert(got.getAs[Long]("n_kept") === 18L)
    assert(got.getAs[Double]("trimmed_mean")
      === math.rint((17.0 + 1000.0) / 18 * 1e6) / 1e6)
    // agrees with an in-memory sorted trim on messy duplicated data
    val messy = (1L to 257L).map(i => ("h", i, ((i * 31) % 13).toDouble))
    val g2 = Experiment.trimmedMeanByGroup(
      messy.toDF("grp", "id", "v"), Seq("grp"), "v", 1, 10).head()
    val sorted = messy.map(_._3).sorted
    val tt = math.ceil(257 / 10.0).toInt
    val mid = sorted.slice(tt, 257 - tt)
    assert(g2.getAs[Double]("trimmed_mean")
      === math.rint(mid.sum / mid.length * 1e6) / 1e6)
    // trimming everything → NULL, not a division blowup
    val tiny = Seq(("t", 1L, 5.0), ("t", 2L, 6.0)).toDF("grp", "id", "v")
    val nul = Experiment.trimmedMeanByGroup(tiny, Seq("grp"), "v", 2, 5)
      .head()
    assert(nul.getAs[Long]("n_kept") === 0L)
    assert(nul.isNullAt(nul.fieldIndex("trimmed_mean")))
    intercept[IllegalArgumentException] {
      Experiment.trimmedMeanByGroup(tiny, Seq("grp"), "v", 1, 2)
    }
  }
}
