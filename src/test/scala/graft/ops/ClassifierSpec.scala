package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed logistic regression (q120): the DataFrame-algebra
  * trainer against the in-memory reference, convergence, and
  * generalization on a held-out split of a synthetic separable corpus.
  */
class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("distributed training matches the in-memory reference") {
    val rows = Seq(
      (0L, Classifier.BiasIdx, 1.0), (0L, 3L, 0.5), (0L, 7L, 0.25),
      (1L, Classifier.BiasIdx, 1.0), (1L, 3L, 0.4),
      (2L, Classifier.BiasIdx, 1.0), (2L, 5L, 0.6), (2L, 7L, 0.2),
      (3L, Classifier.BiasIdx, 1.0), (3L, 5L, 0.7))
    val labels = Map(0L -> 1.0, 1L -> 1.0, 2L -> 0.0, 3L -> 0.0)
    val feats = rows.toDF("doc_id", "idx", "x")
    val lab = labels.toSeq.toDF("doc_id", "y")
    val got = Classifier.trainLogReg(feats, lab, "doc_id", iters = 7, lr = 1.5, l2 = 0.01)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Classifier.trainLogRegLocal(rows, labels, iters = 7, lr = 1.5, l2 = 0.01)
    assert(got.keySet === want.keySet)
    got.foreach { case (j, w) =>
      assert(math.abs(w - want(j)) < 1e-10, s"idx $j: $w vs ${want(j)}")
    }
  }

  /** Synthetic separable corpus: "good" docs draw from stopword-ish
    * vocabulary A, "bad" docs from symbol-ish vocabulary B, with a
    * shared ambiguous token so the problem isn't trivially keyed.
    */
  private def corpus(n: Int, seed: Int): Seq[(Long, String, Double)] = {
    val rnd = new scala.util.Random(seed)
    val a = Vector("the", "and", "of", "to", "in", "is", "was", "for")
    val b = Vector("zzq", "xj9", "qqp", "vv2", "kk8", "jjx", "m0m", "w4w")
    (0 until n).map { i =>
      val good = i % 2 == 0
      val pool = if (good) a else b
      val words = (0 until 12).map(_ => pool(rnd.nextInt(pool.size))) :+ "shared"
      (i.toLong, words.mkString(" "), if (good) 1.0 else 0.0)
    }
  }

  test("log-loss decreases and held-out accuracy is high on separable data") {
    val data = corpus(240, seed = 7)
    val df = data.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
    val lab = data.map { case (id, _, y) => (id, y) }.toDF("doc_id", "y")
    val feats = Classifier.hashedFeatures(df, "doc_id", "text", dim = 1 << 12).cache()
    val trainIds = (id: org.apache.spark.sql.Column) => id % 3 =!= 0
    val fTrain = feats.filter(trainIds($"doc_id"))
    val lTrain = lab.filter(trainIds($"doc_id"))
    val w2 = Classifier.trainLogReg(fTrain, lTrain, "doc_id", iters = 2, lr = 4.0)
    val w12 = Classifier.trainLogReg(fTrain, lTrain, "doc_id", iters = 12, lr = 4.0)
    val loss2 = Classifier.logLoss(fTrain, lTrain, w2, "doc_id")
    val loss12 = Classifier.logLoss(fTrain, lTrain, w12, "doc_id")
    assert(loss12 < loss2, s"loss should fall with iterations: $loss12 vs $loss2")
    val holdout = Classifier.scoreLogReg(
        feats.filter(!trainIds($"doc_id")), w12, "doc_id")
      .join(lab, Seq("doc_id"))
      .select((when(($"p" >= 0.5) === ($"y" === 1.0), 1).otherwise(0)).as("ok"))
      .agg(avg("ok")).head().getDouble(0)
    assert(holdout >= 0.95, s"held-out accuracy $holdout on separable data")
    feats.unpersist()
  }

  test("tol early stop: converges under the iteration budget, holds the held-out gate, and tol=0 path is untouched") {
    val data = corpus(240, seed = 7)
    val df = data.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
    val lab = data.map { case (id, _, y) => (id, y) }.toDF("doc_id", "y")
    val feats = Classifier.hashedFeatures(df, "doc_id", "text", dim = 1 << 12).cache()
    val trainIds = (id: org.apache.spark.sql.Column) => id % 3 =!= 0
    val fTrain = feats.filter(trainIds($"doc_id"))
    val lTrain = lab.filter(trainIds($"doc_id"))
    // a generous budget + a loose tol: separable data flattens fast
    val res = Classifier.trainLogRegStats(fTrain, lTrain, "doc_id",
      iters = 40, lr = 4.0, tol = 0.01)
    assert(res.stepsApplied < 40,
      s"early stop never fired: ${res.stepsApplied} steps")
    assert(!res.lastLoss.isNaN && res.lastLoss < 0.5,
      s"converged at implausible loss ${res.lastLoss}")
    val acc = Classifier.scoreLogReg(
        feats.filter(!trainIds($"doc_id")), res.weights, "doc_id")
      .join(lab, Seq("doc_id"))
      .select((when(($"p" >= 0.5) === ($"y" === 1.0), 1).otherwise(0)).as("ok"))
      .agg(avg("ok")).head().getDouble(0)
    assert(acc >= 0.95, s"held-out accuracy $acc after early stop")
    // tol off → full budget runs, loss not evaluated
    val full = Classifier.trainLogRegStats(fTrain, lTrain, "doc_id",
      iters = 3, lr = 4.0)
    assert(full.stepsApplied === 3 && full.lastLoss.isNaN)
    feats.unpersist()
  }

  test("sampled gradients (sampleFrac < 1) hold the held-out accuracy gate") {
    val data = corpus(400, seed = 13)
    val df = data.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
    val lab = data.map { case (id, _, y) => (id, y) }.toDF("doc_id", "y")
    val feats = Classifier.hashedFeatures(df, "doc_id", "text", dim = 1 << 12).cache()
    val trainIds = (id: org.apache.spark.sql.Column) => id % 3 =!= 0
    val w = Classifier.trainLogReg(
      feats.filter(trainIds($"doc_id")), lab.filter(trainIds($"doc_id")),
      "doc_id", iters = 12, lr = 4.0, sampleFrac = 0.5)
    val acc = Classifier.scoreLogReg(
        feats.filter(!trainIds($"doc_id")), w, "doc_id")
      .join(lab, Seq("doc_id"))
      .select((when(($"p" >= 0.5) === ($"y" === 1.0), 1).otherwise(0)).as("ok"))
      .agg(avg("ok")).head().getDouble(0)
    assert(acc >= 0.95, s"held-out accuracy $acc under 0.5 mini-batches")
    // determinism: the hash-sampled schedule is seeded, so a rerun is
    // bit-identical
    val w2 = Classifier.trainLogReg(
      feats.filter(trainIds($"doc_id")), lab.filter(trainIds($"doc_id")),
      "doc_id", iters = 12, lr = 4.0, sampleFrac = 0.5)
    val a = w.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = w2.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b)
    feats.unpersist()
  }

  test("lengthFeature separates a purely length-driven label that BoW provably cannot see") {
    // one token repeated n times: tf/dl = 1.0 and bias = 1.0 for EVERY
    // doc — the BoW feature vectors are identical, so no linear model
    // can beat the base rate; the LenIdx row restores the signal
    val data = (0L until 200L).map { i =>
      val n = if (i % 2 == 0) 60 else 10
      (i, Seq.fill(n)("word").mkString(" "), if (i % 2 == 0) 1.0 else 0.0)
    }
    val df = data.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
    val lab = data.map { case (id, _, y) => (id, y) }.toDF("doc_id", "y")
    def acc(lenF: Boolean): Double = {
      val feats = Classifier.hashedFeatures(df, "doc_id", "text",
        dim = 1 << 10, lengthFeature = lenF)
      val w = Classifier.trainLogReg(feats, lab, "doc_id", iters = 12, lr = 4.0)
      Classifier.scoreLogReg(feats, w, "doc_id")
        .join(lab, Seq("doc_id"))
        .select((when(($"p" >= 0.5) === ($"y" === 1.0), 1).otherwise(0)).as("ok"))
        .agg(avg("ok")).head().getDouble(0)
    }
    assert(acc(lenF = false) <= 0.6, "identical BoW vectors cannot separate")
    assert(acc(lenF = true) >= 0.95, "length feature failed to separate")
  }

  test("aucScore: hand-computed mid-rank AUC with ties; perfect/reversed/all-tied/single-class edges") {
    def auc(rows: Seq[(Double, Double)]): (Long, Long, Option[Double]) = {
      val r = Classifier.aucScore(rows.toDF("s", "y"), "s", "y").head()
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }
    // scores .1,.2,.2,.3 labels 0,0,1,1 → mid-ranks 1, 2.5, 2.5, 4;
    // Σmr⁺ = 6.5 → AUC = (6.5 − 3)/4 = 0.875
    assert(auc(Seq((0.1, 0.0), (0.2, 0.0), (0.2, 1.0), (0.3, 1.0)))
      === ((2L, 2L, Some(0.875))))
    assert(auc(Seq((0.1, 0.0), (0.2, 0.0), (0.8, 1.0), (0.9, 1.0)))
      === ((2L, 2L, Some(1.0))))
    assert(auc(Seq((0.9, 0.0), (0.8, 0.0), (0.2, 1.0), (0.1, 1.0)))
      === ((2L, 2L, Some(0.0))))
    assert(auc(Seq((0.5, 0.0), (0.5, 1.0), (0.5, 0.0), (0.5, 1.0)))
      === ((2L, 2L, Some(0.5))))
    assert(auc(Seq((0.1, 1.0), (0.2, 1.0))) === ((2L, 0L, None)))
  }

  test("aucByGroup ≡ per-group aucScore; single-class group reports NULL") {
    val df = Seq(
      ("g1", 0.1, 0.0), ("g1", 0.2, 0.0), ("g1", 0.2, 1.0), ("g1", 0.3, 1.0),
      ("g2", 0.9, 0.0), ("g2", 0.8, 0.0), ("g2", 0.2, 1.0), ("g2", 0.1, 1.0),
      ("g3", 0.5, 1.0), ("g3", 0.6, 1.0))
      .toDF("g", "s", "y")
    val got = Classifier.aucByGroup(df, "g", "s", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    for (g <- Seq("g1", "g2", "g3")) {
      val solo = Classifier.aucScore(
        df.filter(col("g") === g).select("s", "y"), "s", "y").head()
      assert(got(g) === ((solo.getLong(0), solo.getLong(1),
        if (solo.isNullAt(2)) None else Some(solo.getDouble(2)))), s"group $g")
    }
    assert(got("g1")._3 === Some(0.875))
    assert(got("g2")._3 === Some(0.0))
    assert(got("g3")._3 === None)
  }

  test("calibrationReport: hand-computed buckets, top-edge clamp, empty buckets absent") {
    val df = Seq(
      (0.05, 0.0), (0.05, 1.0), // bucket 0: mean_p .05, frac .5, gap .45
      (0.95, 1.0), (1.0, 1.0),  // bucket 9 (p=1.0 clamps): mean .975, frac 1
      (0.55, 0.0))              // bucket 5
      .toDF("p", "y")
    val got = Classifier.calibrationReport(df, "p", "y", nBuckets = 10)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.toSeq === Seq(
      (0L, 2L, 0.05, 0.5, 0.45),
      (5L, 1L, 0.55, 0.0, -0.55),
      (9L, 2L, 0.975, 1.0, 0.025)))
  }

  test("hashedFeatures: length-normalized tf plus exactly one bias row per doc") {
    val df = Seq((1L, "a a b c"), (2L, "")).toDF("doc_id", "text")
    val f = Classifier.hashedFeatures(df, "doc_id", "text", dim = 1 << 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(f.forall(_._1 == 1L), "empty doc contributes no rows (not even bias)")
    val bias = f.filter(_._2 == Classifier.BiasIdx)
    assert(bias.length === 1 && bias.head._3 === 1.0)
    val xs = f.filterNot(_._2 == Classifier.BiasIdx).map(_._3).sorted
    assert(xs === Array(0.25, 0.25, 0.5), "tf/4 for b, c and 2/4 for a")
  }

  test("interRaterAgreement: textbook Cohen fixture (kappa = 0.4) and perfect-agreement pair") {
    // r1/r2 contingency: (1,1)x20 (1,0)x5 (0,1)x10 (0,0)x15
    // po = 0.7, pe = 0.5*0.6 + 0.5*0.4 = 0.5, kappa = 0.4 exactly.
    // r3 duplicates r1 → kappa(r1, r3) = 1.
    val rows = (0 until 50).map { i =>
      val (a, b) =
        if (i < 20) (1, 1) else if (i < 25) (1, 0)
        else if (i < 35) (0, 1) else (0, 0)
      (i.toLong, a, b, a)
    }
    val out = Classifier.interRaterAgreement(
        rows.toDF("id", "r1", "r2", "r3"), "id", Seq("r1", "r2", "r3"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4),
          if (r.isNullAt(5)) Double.NaN else r.getDouble(5)))
      .toMap
    val (n12, po12, pe12, k12) = out(("r1", "r2"))
    assert(n12 === 50L && po12 === 0.7 && pe12 === 0.5 && k12 === 0.4)
    val (_, po13, _, k13) = out(("r1", "r3"))
    assert(po13 === 1.0 && k13 === 1.0)
    assert(out.contains(("_fleiss", "_all")))
  }

  test("interRaterAgreement: Fleiss ≡ independent inline reference on random 3-category labels") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.tabulate(40)(i =>
      (i.toLong, rnd.nextInt(3), rnd.nextInt(3), rnd.nextInt(3)))
    // independent replay of the Fleiss formulas
    val k = 3
    val n = rows.size
    val cells = rows.flatMap { case (id, a, b, c) => Seq(a, b, c).map(id -> _) }
      .groupBy(identity).view.mapValues(_.size).toMap
    val pi = rows.map { case (id, _, _, _) =>
      (0 until 3).map(l => { val c = cells.getOrElse(id -> l, 0); c * (c - 1) }).sum /
        (k * (k - 1)).toDouble
    }
    val pbar = pi.sum / n
    val pl = (0 until 3).map(l =>
      rows.map { case (_, a, b, c) => Seq(a, b, c).count(_ == l) }.sum /
        (n * k).toDouble)
    val peF = pl.map(p => p * p).sum
    val expect = BigDecimal((pbar - peF) / (1 - peF))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Classifier.interRaterAgreement(
        rows.toDF("id", "r1", "r2", "r3"), "id", Seq("r1", "r2", "r3"))
      .filter(col("rater_a") === "_fleiss").head()
    assert(math.abs(got.getDouble(5) - expect) < 2e-6,
      s"fleiss kappa ${got.getDouble(5)} != $expect")
  }

  test("bradleyTerry ≡ in-memory MM reference to 1e-9 on a skewed random tournament") {
    val rnd = new scala.util.Random(13)
    val items = Vector("a", "b", "c", "d", "e", "f")
    // true strengths 6..1: i beats j with prob s_i/(s_i+s_j)
    val comps = Seq.fill(400) {
      val i = rnd.nextInt(6); var j = rnd.nextInt(6)
      while (j == i) j = rnd.nextInt(6)
      val si = (6 - i).toDouble; val sj = (6 - j).toDouble
      if (rnd.nextDouble() < si / (si + sj)) (items(i), items(j))
      else (items(j), items(i))
    }
    val got = Classifier.bradleyTerry(
        comps.toDF("winner", "loser"), "winner", "loser", iters = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val ref = Classifier.bradleyTerryLocal(comps, iters = 20)
    assert(got.keySet === ref.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - ref(k)) < 1e-9, s"$k: $v vs ${ref(k)}")
    }
    // normalization: Σ strength = nItems
    assert(math.abs(got.values.sum - 6.0) < 1e-9)
    // the planted order should be recovered on 400 samples
    assert(got("a") > got("f"), s"dominant item not ranked above weakest: $got")
    // the distributed loop (fast path disabled) matches the fast path
    val dist = Classifier.bradleyTerry(
        comps.toDF("winner", "loser"), "winner", "loser", iters = 20,
        localMatchRows = 0L)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(dist.keySet === got.keySet)
    dist.foreach { case (k, v) =>
      assert(math.abs(v - got(k)) < 1e-9, s"fast vs distributed $k: ${got(k)} vs $v")
    }
  }

  test("bradleyTerry: dominance orders strengths; direction swap inverts; self-pairs dropped") {
    // round-robin where a beats everyone, b beats c
    val comps = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("a", "a"))
    val got = Classifier.bradleyTerry(
        comps.toDF("winner", "loser"), "winner", "loser", iters = 30)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byItem = got.map(r => r._1 -> r._4).toMap
    assert(byItem("a") > byItem("b") && byItem("b") > byItem("c"), s"$byItem")
    val wins = got.map(r => r._1 -> r._2).toMap
    assert(wins === Map("a" -> 2L, "b" -> 1L, "c" -> 0L), "self-pair must not count as a win")
    val swapped = Classifier.bradleyTerry(
        comps.toDF("winner", "loser"), "loser", "winner", iters = 30)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(swapped("c") > swapped("b") && swapped("b") > swapped("a"), s"$swapped")
  }

  test("interRaterAgreement: NULL-labeled items are dropped; degenerate marginals yield NULL kappa") {
    val rows = Seq(
      (1L, Some(1), Some(1)), (2L, Some(1), Some(1)),
      (3L, None, Some(1)))
      .toDF("id", "r1", "r2")
    val out = Classifier.interRaterAgreement(rows, "id", Seq("r1", "r2"))
      .filter(col("rater_a") === "r1").head()
    assert(out.getLong(2) === 2L, "null-labeled item must not count")
    assert(out.isNullAt(5), "pe = 1 must give NULL kappa, not a division blowup")
  }

  test("conformalCalibrate: hand fixture — exact order-statistic radius, ties by id, small-group NULL") {
    // group g: scores 1..10, alpha = 1/10 → k = ceil(11·9/10) = 10 →
    // qhat = the 10th smallest = 10.0
    val cal = ((1 to 10).map(i => ("g", i.toDouble, i.toLong)) ++
      // group tiny: n = 3, k = ceil(4·9/10) = 4 > 3 → NULL radius
      (1 to 3).map(i => ("tiny", i.toDouble, 100L + i)))
      .toDF("grp", "s", "id")
    val iv = Classifier.conformalCalibrate(cal, Seq("grp"), "s", "id")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(iv("g") === ((10L, Some(10.0))))
    assert(iv("tiny") === ((3L, None)))
    // alpha = 1/2 → k = ceil(11/2) = 6 → the 6th smallest
    val med = Classifier.conformalCalibrate(cal.filter($"grp" === "g"),
      Seq("grp"), "s", "id", alphaNum = 1, alphaDen = 2).head()
    assert(med.getDouble(2) === 6.0)
    // agrees with an in-memory reference on non-trivial scores
    val scores = (1 to 137).map(i => ("h", ((i * 2654435761L) % 1000).toDouble, i.toLong))
    val got = Classifier.conformalCalibrate(scores.toDF("grp", "s", "id"),
      Seq("grp"), "s", "id").head().getDouble(2)
    val k = math.ceil(138 * 9 / 10.0).toInt
    assert(got === scores.map(_._2).sorted.apply(k - 1))
    intercept[IllegalArgumentException] {
      Classifier.conformalCalibrate(cal, Seq("grp"), "s", "id", 10, 10)
    }
  }

  test("isotonicCalibrate: minimax fit ≡ sequential PAV reference; monotone; identity on monotone input") {
    // classic violator pattern: bucket positive-rates 0.8, 0.2, 0.5 →
    // PAV pools the first two to 0.5, then all three to 0.5
    def mk(rates: Seq[(Double, Int, Int)]) = // (center, pos, neg)
      rates.zipWithIndex.flatMap { case ((c, pos, neg), _) =>
        Seq.fill(pos)((c, 1.0)) ++ Seq.fill(neg)((c, 0.0))
      }.toDF("p", "y")
    val fit1 = Classifier.isotonicCalibrate(
      mk(Seq((0.1, 8, 2), (0.3, 2, 8), (0.5, 5, 5))), "p", "y", 10)
      .orderBy("bucket").collect().map(_.getAs[Double]("calibrated"))
    assert(fit1.toSeq === Seq(0.5, 0.5, 0.5))
    // sequential pool-adjacent-violators reference on random-ish rates
    val rates = (0 until 12).map(i =>
      ((i + 0.5) / 12.0, ((i * 2654435761L) % 10).toInt + 1,
        ((i * 40503L) % 7).toInt + 1))
    val got = Classifier.isotonicCalibrate(mk(rates), "p", "y", 12)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getAs[Double]("calibrated")))
    // reversed-list PAV: head is the newest block; pool while the
    // PREVIOUS block's average ≥ the new one's (an isotonic violation)
    def pav(blocks: List[(Double, Double)]): List[(Double, Double)] =
      blocks match {
        case (y1, w1) :: (y2, w2) :: rest if y2 / w2 >= y1 / w1 - 1e-12 =>
          pav((y1 + y2, w1 + w2) :: rest)
        case b :: rest => b :: pav(rest)
        case Nil => Nil
      }
    val pooled = rates.foldLeft(List.empty[(Double, Double)]) {
      case (acc, (_, pos, neg)) =>
        pav(((pos.toDouble, (pos + neg).toDouble)) :: acc)
    }.reverse
    // PAV blocks are unions of whole buckets: expand block values to
    // units, then read each bucket's value at its first unit offset
    val unitVals = pooled.flatMap { case (y0, w0) =>
      Seq.fill(w0.toInt)(y0 / w0) }
    val masses = rates.map(r => r._2 + r._3)
    val refByBucket = masses.scanLeft(0)(_ + _).init.map(unitVals(_))
    got.zip(refByBucket).foreach { case ((bkt, g), r) =>
      assert(math.abs(g - math.rint(r * 1e6) / 1e6) < 1e-9, s"bucket $bkt")
    }
    // monotone non-decreasing always
    assert(got.map(_._2).sliding(2).forall(s => s.head <= s.last + 1e-12))
    // already-monotone input is returned unchanged
    val mono = Classifier.isotonicCalibrate(
      mk(Seq((0.1, 1, 9), (0.5, 5, 5), (0.9, 9, 1))), "p", "y", 10)
      .orderBy("bucket").collect().map(_.getAs[Double]("calibrated"))
    assert(mono.toSeq === Seq(0.1, 0.5, 0.9))
    intercept[IllegalArgumentException] {
      Classifier.isotonicCalibrate(mk(rates), "p", "y", 1000)
    }
  }

  test("conformalApply: bands bracket ~1-alpha of exchangeable points; NULL radius gives NULL bounds") {
    // deterministic pseudo-noise around a constant prediction — the
    // exchangeability conformal needs; calibrate on odd ids, test on
    // even ids
    val rows = (1L to 4000L).map { i =>
      val u = ((i * 2654435761L + 17L) % 4096).toDouble / 4096.0
      ("g", i, 50.0, 50.0 + (u - 0.5) * 20.0) // y in yhat ± 10
    }.toDF("grp", "id", "yhat", "y")
    val cal = rows.filter($"id" % 2 === 1)
      .withColumn("s", abs($"y" - $"yhat"))
    val iv = Classifier.conformalCalibrate(cal, Seq("grp"), "s", "id")
    val applied = Classifier.conformalApply(
      rows.filter($"id" % 2 === 0), iv, Seq("grp"), "yhat")
    val (n, covered) = applied
      .agg(count(lit(1)), sum(when($"y".between($"pi_lo", $"pi_hi"), 1L)
        .otherwise(0L))).as[(Long, Long)].head()
    val cov = covered.toDouble / n
    assert(cov >= 0.87 && cov <= 0.95, s"coverage $cov at alpha=0.1")
    // unseen group → NULL bounds, not a dropped row or a fake radius
    val stranger = Seq(("other", 1L, 5.0, 5.0)).toDF("grp", "id", "yhat", "y")
    val sr = Classifier.conformalApply(stranger, iv, Seq("grp"), "yhat").head()
    assert(sr.isNullAt(sr.fieldIndex("pi_lo")) &&
      sr.isNullAt(sr.fieldIndex("pi_hi")))
  }
}
