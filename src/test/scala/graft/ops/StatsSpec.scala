package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exactQuantilesByGroup: hand fixture with ties — disc convention, element of the group") {
    // group A: values 1,2,2,3,100 (n=5): ranks p25→ceil(1.25)=2 → 2,
    // p50→ceil(2.5)=3 → 2, p90→ceil(4.5)=5 → 100, p99→5 → 100
    // group B: single value (n=1): every quantile is it
    val df = Seq(("A", 1L), ("A", 2L), ("A", 2L), ("A", 3L), ("A", 100L),
      ("B", 7L)).toDF("g", "v")
    val got = Stats.exactQuantilesByGroup(df, Seq("g"), "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got("A") === ((5L, 2L, 2L, 100L, 100L)))
    assert(got("B") === ((1L, 7L, 7L, 7L, 7L)))
  }

  test("exactQuantilesByGroup: agrees with a sort-based reference on the corpus") {
    val df = Tables.load(spark, TestSpark.Sf001, "documents")
      .select(col("source"),
        size(array_remove(TextFunctions.tokens(col("text")), ""))
          .cast("long").as("n"))
    val got = Stats.exactQuantilesByGroup(df, Seq("source"), "n")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val raw = df.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, vs) => s -> vs.map(_._2).sorted }
    def q(vs: Array[Long], num: Long, den: Long): Long =
      vs(((vs.length * num + den - 1) / den - 1).toInt)
    assert(got.keySet === raw.keySet)
    raw.foreach { case (s, vs) =>
      assert(got(s) === ((vs.length.toLong, q(vs, 1, 4), q(vs, 1, 2),
        q(vs, 9, 10), q(vs, 99, 100))), s"source $s")
    }
  }

  test("exactQuantilesByGroup: monotone across probabilities; name clashes fail fast") {
    val df = Tables.load(spark, TestSpark.Sf001, "documents")
      .select(col("source"), length(col("text")).cast("long").as("n"))
    val bad = Stats.exactQuantilesByGroup(df, Seq("source"), "n")
      .filter(col("p25") > col("p50") || col("p50") > col("p90") ||
        col("p90") > col("p99")).count()
    assert(bad === 0L)
    val e = intercept[IllegalArgumentException] {
      Stats.exactQuantilesByGroup(
        df.withColumnRenamed("n", "p50"), Seq("source"), "p50")
    }
    assert(e.getMessage.contains("p50"))
  }

  test("weightedQuantilesByGroup: hand fixture — the heavy value owns the median; n_rows is total mass") {
    // values 1 (w=1), 10 (w=8), 100 (w=1): W=10, p50 target ceil(5)=5 → 10,
    // p25 target ceil(2.5)=3 → 10, p90 target 9 → 10, p99 target 10 → 100
    val df = Seq(("A", 1L, 1L), ("A", 10L, 8L), ("A", 100L, 1L))
      .toDF("g", "v", "w")
    val got = Stats.weightedQuantilesByGroup(df, Seq("g"), "v", "w")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got("A") === ((10L, 10L, 10L, 10L, 100L)))
    // unit weights reduce to the unweighted operator
    val docs0 = Tables.load(spark, TestSpark.Sf001, "documents")
      .select(col("source"),
        size(array_remove(TextFunctions.tokens(col("text")), ""))
          .cast("long").as("n"))
    val unit = Stats.weightedQuantilesByGroup(
        docs0.withColumn("one", lit(1L)), Seq("source"), "n", "one")
      .collect().map(r => r.toSeq).toSet
    val plain = Stats.exactQuantilesByGroup(docs0, Seq("source"), "n")
      .collect().map(r => r.toSeq).toSet
    assert(unit === plain)
  }

  test("benfordScreen: hand fixture — digit extraction incl. sub-1 and scientific ranges, zero-count digits present, non-positive excluded") {
    // digits: 1.5->1, 19->1, 0.02->2, 300->3, 25->2, 1e7->1, 0.0|−4 dropped
    val df = Seq(("A", 1.5), ("A", 19.0), ("A", 0.02), ("A", 300.0),
      ("A", 25.0), ("A", 1e7), ("A", 0.0), ("A", -4.0))
      .toDF("g", "v")
    val rows = Stats.benfordScreen(df, Seq("g"), "v")
      .collect().map(r => r.getInt(1) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows.size === 9)
    assert(rows(1)._1 === 3L && rows(2)._1 === 2L && rows(3)._1 === 1L)
    (4 to 9).foreach(d => assert(rows(d)._1 === 0L, s"digit $d"))
    assert(rows.values.forall(_._2 === 6L)) // n excludes the two non-positives
    assert(rows(1)._3 === 0.5)
    // chi2 matches an in-test recompute
    val chi2 = Stats.benfordScreen(df, Seq("g"), "v")
      .select("chi2").head().getDouble(0)
    val want = (1 to 9).map { d =>
      val expN = math.log10(1.0 + 1.0 / d) * 6
      val nD = rows(d)._1.toDouble
      (nD - expN) * (nD - expN) / expN
    }.sum
    assert(math.abs(chi2 - BigDecimal(want)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) <= 1e-9)
  }

  test("benfordScreen: corpus invariants — shares sum to 1 per group, all nine digits, chi2 finite and shared across the group") {
    val got = Stats.benfordScreen(
      Tables.load(spark, TestSpark.Sf001, "lineitem"),
      Seq("l_returnflag"), "l_extendedprice")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(6)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (g, rows) =>
      assert(rows.map(_._2).toSet === (1 to 9).toSet, s"group $g digits")
      assert(rows.map(_._3).sum === rows.head._4, s"group $g counts vs n")
      assert(rows.map(_._6).distinct.length === 1, s"group $g chi2 shared")
      assert(rows.head._6 >= 0 && !rows.head._6.isNaN)
    }
  }

  test("columnProfile: hand fixture — nulls, distincts, min/max strings; empty column list fails fast") {
    val df = Seq((1L, Some("b")), (2L, None), (2L, Some("a")))
      .toDF("k", "s")
    val got = Stats.columnProfile(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5)))).toMap
    assert(got("k") === ((3L, 0L, 2L, "1", "2")))
    assert(got("s") === ((3L, 1L, 2L, "a", "b")))
    intercept[IllegalArgumentException] {
      Stats.columnProfile(df, Nil)
    }
    // the approximate path stays within its advertised 5% at tiny scale
    val approx = Stats.columnProfile(df, Seq("k"), exact = false)
      .head().getLong(3)
    assert(approx === 2L)
  }

  test("groupedTrend: exact fit on a planted line, NULL on degenerate groups, r2 = 1 on noiseless data") {
    val df = Seq(
      // group A: y = 3x + 7 exactly
      ("A", 1L, 10L), ("A", 2L, 13L), ("A", 3L, 16L), ("A", 4L, 19L),
      // group B: single point -> NULLs
      ("B", 5L, 100L),
      // group C: zero x-variance -> NULLs
      ("C", 2L, 1L), ("C", 2L, 9L))
      .toDF("g", "x", "y")
    val got = Stats.groupedTrend(df, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("A").getLong(1) === 4L)
    assert(got("A").getDouble(2) === 3.0 && got("A").getDouble(3) === 7.0)
    assert(got("A").getDouble(4) === 1.0)
    Seq("B", "C").foreach { g =>
      assert(got(g).isNullAt(2) && got(g).isNullAt(3) && got(g).isNullAt(4), g)
    }
    // flat-y group: slope 0, r2 NULL (zero y-variance)
    val flat = Stats.groupedTrend(
      Seq(("F", 1L, 5L), ("F", 2L, 5L)).toDF("g", "x", "y"), Seq("g"), "x", "y")
      .head()
    assert(flat.getDouble(2) === 0.0 && flat.isNullAt(4))
    intercept[IllegalArgumentException] {
      Stats.groupedTrend(df, Nil, "x", "y")
    }
  }

  test("percentRankByGroup: ties share the min-rank value, singles are 0, equals the window percent_rank on the corpus") {
    // group A values 1,2,2,5: pr(1)=0, pr(2)=1/3, pr(5)=1; B single -> 0
    val df = Seq(("A", 1L), ("A", 2L), ("A", 2L), ("A", 5L), ("B", 9L))
      .toDF("g", "v")
    val got = Stats.percentRankByGroup(df, Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got(("A", 1L)) === 0.0 && got(("A", 5L)) === 1.0)
    assert(math.abs(got(("A", 2L)) - 0.333333) < 1e-9)
    assert(got(("B", 9L)) === 0.0)
    // corpus: two-phase table ≡ the whole-partition-window formulation
    val d = Tables.load(spark, TestSpark.Sf001, "documents")
      .select(col("source"),
        size(array_remove(TextFunctions.tokens(col("text")), ""))
          .cast("long").as("n"))
    val two = Stats.percentRankByGroup(d, Seq("source"), "n")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("n")
    val win = d.withColumn("pr", round(percent_rank().over(w), 6))
      .select("source", "n", "pr").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(two === win)
  }

  test("pairedBootstrap: degenerate certainty — constant deltas pin p and collapse the CI") {
    import spark.implicits._
    // A beats B by exactly 5 on every item: every replicate mean is 5
    val up = (1L to 120L).map(i => (i, 10.0 + 5.0, 10.0)).toDF("id", "a", "b")
    val r1 = Stats.pairedBootstrap(up, "id", "a", "b", nBoot = 200).head()
    assert(r1.getLong(0) === 120L && r1.getLong(1) === 200L)
    assert(r1.getDouble(2) === 5.0)                       // mean_delta
    assert(r1.getDouble(3) === 0.004975)                  // minimal add-one p, ROUND(1/201, 6)
    assert(r1.getDouble(4) === 5.0 && r1.getDouble(5) === 5.0) // CI collapses
    // identical systems: every replicate mean is 0 → p = 1
    val same = (1L to 120L).map(i => (i, 3.0, 3.0)).toDF("id", "a", "b")
    val r2 = Stats.pairedBootstrap(same, "id", "a", "b", nBoot = 200).head()
    assert(r2.getDouble(2) === 0.0 && r2.getDouble(3) === 1.0)
    assert(r2.getDouble(4) === 0.0 && r2.getDouble(5) === 0.0)
  }

  test("pairedBootstrap: noisy positive effect — CI brackets the observed mean, bounds ordered, p small") {
    import spark.implicits._
    // deterministic noise in [-2, 2] around a +1 effect
    val d = (1L to 400L).map(i => (i, 1.0 + (i % 5) - 2.0, 0.0))
      .toDF("id", "a", "b")
    val r = Stats.pairedBootstrap(d, "id", "a", "b", nBoot = 400).head()
    val (mean, p, lo, hi) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(mean === 1.0)
    assert(lo <= hi)
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] should bracket $mean")
    assert(lo > 0.0, s"a +1 effect at n=400 should exclude 0 (lo=$lo)")
    assert(p < 0.05, s"p=$p")
    intercept[IllegalArgumentException] {
      Stats.pairedBootstrap(d, "id", "a", "b", nBoot = 10)
    }
  }

  test("cusumByGroup: closed form ≡ the sequential max(0, C+x−k) recurrence; planted shift alarms, spikes decay") {
    import spark.implicits._
    // baseline ~10 with a sustained +8 shift from t=30
    val series = (1 to 50).map(i =>
      ("g", i, (10 + (i % 3) + (if (i >= 30) 8 else 0)).toDouble))
    val df = series.toDF("grp", "t", "x")
    val got = Stats.cusumByGroup(df, Seq("grp"), "t", "x")
      .orderBy("t").collect()
      .map(r => (r.getInt(1), r.getAs[Double]("cusum"), r.getAs[Boolean]("alarm")))
    // sequential reference with the SAME k
    val xs = series.map(_._3)
    val n = xs.length.toDouble
    val mean = xs.sum / n
    val sd = math.sqrt((xs.map(v => v * v).sum - xs.sum * xs.sum / n) / n)
    val k = mean + 0.5 * sd
    var c = 0.0
    val ref = xs.map { v => c = math.max(0.0, c + v - k); c }
    got.zip(ref).foreach { case ((t, g, _), r) =>
      assert(math.abs(g - math.rint(r * 1e6) / 1e6) < 1e-9, s"t=$t")
    }
    // the sustained shift crosses h·σ; the pre-shift region never does
    assert(got.filter(_._1 >= 35).exists(_._3), "shift never alarmed")
    assert(!got.filter(_._1 < 30).exists(_._3), "false alarm before the shift")
    // a single spike decays back to zero rather than latching
    val spike = (1 to 40).map(i =>
      ("s", i, (10 + (i % 3) + (if (i == 20) 60 else 0)).toDouble))
    val sg = Stats.cusumByGroup(spike.toDF("grp", "t", "x"),
      Seq("grp"), "t", "x").orderBy("t").collect()
    assert(sg(19).getAs[Double]("cusum") > sg(39).getAs[Double]("cusum"),
      "spike should decay")
  }

  test("seasonalNaiveEval: perfect weekly pattern → mase 0; constant series → NULL scale; lag join drops boundary rows") {
    import spark.implicits._
    // period-7 pattern, 28 days: seasonal error 0, naive error > 0
    val weekly = (1 to 28).map(i => ("w", i, (i % 7).toDouble * 3 + 5))
    val w = Stats.seasonalNaiveEval(weekly.toDF("grp", "t", "x"),
      Seq("grp"), "t", "x", season = 7).head()
    assert(w.getAs[Long]("n_eval") === 21L) // first 7 days have no lag
    assert(w.getAs[Double]("mae_seasonal") === 0.0)
    assert(w.getAs[Double]("mase") === 0.0)
    // constant series: naive error 0 → NULL mase, not a division blowup
    val const = (1 to 20).map(i => ("c", i, 4.0))
    val cr = Stats.seasonalNaiveEval(const.toDF("grp", "t", "x"),
      Seq("grp"), "t", "x", season = 7).head()
    assert(cr.isNullAt(cr.fieldIndex("mase")))
    intercept[IllegalArgumentException] {
      Stats.seasonalNaiveEval(const.toDF("grp", "t", "x"),
        Seq("grp"), "t", "x", season = 1)
    }
  }

  test("pairedBootstrap: Poisson(1) weight machinery — CDF literals and empirical weight mean") {
    // the shared thresholds really are the Poisson(1) CDF
    val expect = (0 to 7).scanLeft(0.0) { (acc, k) =>
      acc + math.exp(-1.0) / (1 to k).product
    }.tail
    Stats.PoissonCdf.zip(expect).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-15)
    }
    assert(Stats.PoissonCdf.last > 0.999989) // truncation bias ~1e-5
    // resampled item multiplicity averages ~1 (weights are Poisson(1))
    import spark.implicits._
    val d = (1L to 2000L).map(i => (i, 1.0, 0.0)).toDF("id", "a", "b")
    val r = Stats.pairedBootstrap(d, "id", "a", "b", nBoot = 50).head()
    // constant delta 1 → every replicate mean is exactly 1 whatever
    // the weights; the CI collapsing to [1, 1] shows Σw never hit 0
    assert(r.getDouble(4) === 1.0 && r.getDouble(5) === 1.0)
  }
}
