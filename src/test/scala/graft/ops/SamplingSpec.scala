package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Tables.load(spark, TestSpark.Sf001, "documents")

  test("quotaPerGroup keeps exactly min(k, group size) smallest-order rows per group") {
    val df = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (10L, "b"), (11L, "b"),
      (20L, "c")).toDF("id", "grp")
    val kept = Sampling.quotaPerGroup(df, Seq("grp"), "id", 2)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(kept === Set(("a", 1L), ("a", 2L), ("b", 10L), ("b", 11L), ("c", 20L)))
  }

  test("quotaPerGroup preserves a caller column named _graft_rk (no silent clobber)") {
    val df = Seq((1L, "a", 99), (2L, "a", 98), (3L, "a", 97))
      .toDF("id", "grp", "_graft_rk")
    val out = Sampling.quotaPerGroup(df, Seq("grp"), "id", 2)
    assert(out.columns.toSeq === df.columns.toSeq)
    val kept = out.collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(kept === Set((1L, 99), (2L, 98)))
  }

  test("stratifiedSplit: exact floor(n/k) test rows per stratum, deterministic, guards `split`") {
    val out = Sampling.stratifiedSplit(docs.select("doc_id", "lang"), Seq("lang"), "doc_id", 5)
    val perStratum = out.groupBy("lang").agg(
        count(lit(1)).as("n"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(perStratum.nonEmpty)
    perStratum.foreach { case (lang, n, nTest) =>
      assert(nTest === n / 5, s"stratum $lang: $nTest test of $n")
    }
    // deterministic: same membership across runs
    val a = out.filter(col("split") === "test").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedSplit(docs.select("doc_id", "lang"), Seq("lang"), "doc_id", 5)
      .filter(col("split") === "test").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSplit(out, Seq("lang"), "doc_id", 5) // already has `split`
    }
  }

  test("repeatByWeight rejects an input that already has a `copy` column") {
    val df = Seq((1L, "x")).toDF("id", "copy")
    val e = intercept[IllegalArgumentException] {
      Sampling.repeatByWeight(df, lit(2.0), "id")
    }
    assert(e.getMessage.contains("copy"))
  }

  test("quotaPerGroup plans a WindowGroupLimit (map-side pre-prune before the exchange)") {
    val plan = Sampling.quotaPerGroup(docs, Seq("lang", "source"), "doc_id", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("hashSample: deterministic, near-target fraction, referentially intact across tables") {
    val a = Sampling.hashSample(docs, "doc_id", 0.5)
    val n = docs.count().toDouble
    val kept = a.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(math.abs(kept.size / n - 0.5) < 0.2, s"${kept.size}/$n far from 0.5")
    // deterministic: same predicate, same rows
    val again = Sampling.hashSample(docs, "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === kept)
    // referential integrity: a second table sampled on the same key
    // keeps exactly the same key set (unlike df.sample)
    val other = docs.select(col("doc_id"), col("lang"))
    val otherKept = Sampling.hashSample(other, "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(otherKept === kept)
  }

  test("repeatByWeight: integer weights exact, fractional near-target, <1 downsamples, 0 empties") {
    val n = docs.count().toDouble
    def copies(w: Double) = Sampling.repeatByWeight(docs, lit(w), "doc_id").count().toDouble
    assert(copies(2.0) === 2 * n)
    assert(copies(0.0) === 0.0)
    // fractional parts land near target, deterministically
    val c225 = copies(2.25)
    assert(math.abs(c225 / n - 2.25) < 0.15, s"2.25x gave ${c225 / n}")
    assert(copies(2.25) === c225) // rerun identical
    val c05 = copies(0.5)
    assert(math.abs(c05 / n - 0.5) < 0.15, s"0.5x gave ${c05 / n}")
    // the fractional draw is the hashSample draw: weight 0.5's survivors
    // are exactly hashSample(0.5)'s keys (same predicate, same seed)
    val viaRepeat = Sampling.repeatByWeight(docs, lit(0.5), "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaSample = Sampling.hashSample(docs, "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaRepeat === viaSample)
  }

  test("hashSample fractions nest: sample(f1) ⊆ sample(f2) for f1 < f2, with exact endpoints") {
    // the bound is monotone in the fraction, so growing a split (1% →
    // 10% → 50%) only ADDS rows — a curriculum can scale up without
    // resampling what it already trained on
    def ids(f: Double) = Sampling.hashSample(docs, "doc_id", f)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val (s01, s10, s50) = (ids(0.01), ids(0.10), ids(0.50))
    assert(s01.subsetOf(s10) && s10.subsetOf(s50))
    assert(ids(0.0).isEmpty)
    assert(ids(1.0).size === docs.count())
  }

  test("seededShuffle: partition-invariant, dense per-shard positions, seed changes the order") {
    val out = Sampling.seededShuffle(docs, "doc_id", 8)
      .select("doc_id", "shard", "pos")
    val a = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Sampling.seededShuffle(docs.repartition(13), "doc_id", 8)
      .select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b, "order must not depend on physical partitioning")
    // every shard's positions are exactly 1..size (a replayable manifest)
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3) === (1L to rows.size).toSet, s"shard $shard not dense")
    }
    val reseeded = Sampling.seededShuffle(docs, "doc_id", 8, seed = 7L)
      .select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(reseeded !== a, "a different seed must give a different order")
  }

  test("seededShuffle: the two-phase pos matches the per-shard rank definition at two shard counts") {
    // pos must equal row_number() over (partition by shard order by mix,
    // key) — the DEFINITION the two-phase plan replaces — regardless of
    // nShards or input partitioning. Recompute the definition driver-side
    // from the emitted (shard, mix-order) relation and compare exactly.
    for (nShards <- Seq(3, 8); parts <- Seq(1, 13)) {
      val rows = Sampling.seededShuffle(docs.repartition(parts), "doc_id", nShards)
        .select("doc_id", "shard", "pos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      def mix(k: Long): Long =
        math.floorMod(math.floorMod(k, 2147483648L) * 2654435761L + 42L, 4294967296L)
      val want = rows.groupBy(_._2).toSeq.flatMap { case (shard, rs) =>
        rs.sortBy { case (k, _, _) => (mix(k), k) }
          .zipWithIndex.map { case ((k, _, _), i) => (k, shard, i + 1L) }
      }.toSet
      assert(rows.toSet === want, s"nShards=$nShards parts=$parts")
    }
  }

  test("seededShuffle rejects inputs that already carry shard/pos columns") {
    import spark.implicits._
    val df = Seq((1L, 0L)).toDF("doc_id", "shard")
    intercept[IllegalArgumentException] {
      Sampling.seededShuffle(df, "doc_id", 4)
    }
  }

  test("weightedSample: per-group cap, determinism under repartitioning, weight > 0 contract") {
    val out = Sampling.weightedSample(
      docs.select("doc_id", "source"), "doc_id", lit(1.0), Seq("source"), 10)
    val perGroup = out.groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(perGroup.nonEmpty)
    perGroup.foreach { case (src, n) => assert(n <= 10, s"$src overflowed: $n") }
    val a = out.collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedSample(
        docs.select("doc_id", "source").repartition(13), "doc_id", lit(1.0), Seq("source"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(a === b, "sample not invariant to physical partitioning")
    // weight <= 0 rows can never be drawn
    val zeroed = Sampling.weightedSample(
        docs.select("doc_id", "source"), "doc_id",
        when(col("doc_id") % 2 === 0, lit(0.0)).otherwise(lit(1.0)), Seq("source"), 10)
      .collect().map(_.getLong(0))
    assert(zeroed.forall(_ % 2 === 1), "zero-weight rows were sampled")
  }

  test("weightedSample: heavier rows are drawn proportionally more often (A-ES distribution)") {
    // one group, 10x weight on ids < 100 vs ids >= 100 (400 of them):
    // total weight splits 1000 vs 400, so a draw of 50 should be
    // dominated by heavy rows — and NO weight can exceed its one slot.
    val df = spark.range(500).toDF("id")
    val heavy = Sampling.weightedSample(
        df, "id", when(col("id") < 100, lit(10.0)).otherwise(lit(1.0)),
        Seq.empty, 50)
      .collect().map(_.getLong(0))
    assert(heavy.length === 50)
    val nHeavy = heavy.count(_ < 100)
    // E[heavy] ≈ 35–40 of 50 under A-ES; anything over 30 shows the
    // weight bites, anything under 50 shows no row exceeds one slot
    assert(nHeavy > 30, s"only $nHeavy/50 heavy rows — weights not applied")
    assert(heavy.distinct.length === 50, "sampling WITH replacement detected")
  }

  test("quantileBucket: quartile ids 0-3, ~n/4 per bucket, boundaries exact") {
    val df = spark.range(1000).toDF("id")
      .withColumn("v", col("id").cast("double"))
    val out = Sampling.quantileBucket(df, "v", Seq(0.25, 0.5, 0.75))
    val counts = out.groupBy("bucket").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(counts.keySet === Set(0, 1, 2, 3))
    // exact percentile over 0..999: cuts at 249.75/499.5/749.25 →
    // buckets of 250 each
    assert(counts.values.toSeq.sorted === Seq(250L, 250L, 250L, 250L))
    // a value equal to a cut point buckets upward (>= comparison)
    val cutEq = Sampling.quantileBucket(
        Seq(0.0, 1.0, 2.0).toDF("v"), "v", Seq(0.5))
      .collect().map(r => (r.getDouble(0), r.getInt(1))).toMap
    assert(cutEq(1.0) === 1, "value at the cut must land in the upper bucket")
    assert(cutEq(0.0) === 0 && cutEq(2.0) === 1)
  }

  test("contiguousIndex: 0..n-1 in key order, invariant to shard count and physical partitioning") {
    val docs = graft.Tables.load(spark, graft.TestSpark.Sf001, "documents")
    def run(df: org.apache.spark.sql.DataFrame, shards: Int) =
      Sampling.contiguousIndex(df, "doc_id", shards)
        .select("doc_id", "global_idx")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val base = run(docs, 8)
    val n = base.length
    assert(base.map(_._2).toSeq === (0L until n), "index must be the dense rank of doc_id")
    assert(run(docs, 1).toSeq === base.toSeq, "1 shard ≡ 8 shards")
    assert(run(docs.repartition(13), 5).toSeq === base.toSeq,
      "result must not depend on input partitioning")
    // pass-through: all original columns survive
    val out = Sampling.contiguousIndex(docs, "doc_id", 4)
    assert(out.columns.toSeq === docs.columns.toSeq :+ "global_idx")
  }

  test("temperatureSample: τ=1 is the natural cut, low τ up-samples the tail, deterministic") {
    val nTok = size(graft.ops.TextFunctions.tokens(col("text")))
    // τ = 1: p_i = t_i/Σt → fraction_i = budget/Σt — IDENTICAL for
    // every source (natural proportions, one global rate)
    val nat = Sampling.temperatureSample(docs, "doc_id", "source", nTok,
      temperature = 1.0, budgetTokens = 10000L, seed = 7L)
    val natFracs = nat.select("fraction").distinct().collect().map(_.getDouble(0))
    assert(natFracs.length == 1, s"τ=1 fractions diverged: ${natFracs.toSeq}")
    val total = docs.select(nTok.cast("long").as("n")).agg(sum("n")).head().getLong(0)
    assert(math.abs(natFracs.head - math.min(1.0, 10000.0 / total)) < 1e-6)

    // τ = 0.25 flattens: the smallest source's fraction must exceed the
    // biggest source's (tail up-sampled relative to head)
    val flat = Sampling.temperatureSample(docs, "doc_id", "source", nTok,
      temperature = 0.25, budgetTokens = 10000L, seed = 7L)
    val bySize = docs.select(col("source"), nTok.cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._2)
    val fracs = flat.select("source", "fraction").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val (smallest, biggest) = (bySize.head._1, bySize.last._1)
    if (bySize.head._2 != bySize.last._2)
      assert(fracs(smallest) > fracs(biggest),
        s"low τ did not up-sample the tail: $fracs vs sizes ${bySize.toSeq}")

    // deterministic: the SAME document set on a rerun; a different seed
    // moves the cut. seededMix is AFFINE in the seed (mix' = mix + Δ
    // mod 2³²), so a threshold cut only changes for keys in the
    // rotated boundary band — the probe seed must rotate by a large
    // fraction of the ring to observably reshuffle a 500-doc corpus.
    val again = Sampling.temperatureSample(docs, "doc_id", "source", nTok,
      temperature = 0.25, budgetTokens = 10000L, seed = 7L)
    assert(flat.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    val reseeded = Sampling.temperatureSample(docs, "doc_id", "source", nTok,
      temperature = 0.25, budgetTokens = 10000L, seed = 3000000000L)
    assert(reseeded.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq !==
      flat.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)

    // the materialized token mass tracks the budget (LCG uniformity):
    // within 25% on this 500-doc corpus
    val got = flat.agg(sum("n_tok")).head().getLong(0).toDouble
    assert(got > 10000 * 0.75 && got < 10000 * 1.25,
      s"sampled token mass $got far from the 10000 budget")
  }

  test("keySkewReport: exact Gini and shares on hand fixtures; uniform and single-key degenerate to 0") {
    import spark.implicits._
    // counts {a:1, b:1, c:2, d:4}: T=8 K=4, ranks asc (1,1,2,4) →
    // rw = 1+2+6+16 = 25, G = 50/32 − 5/4 = 0.3125
    val skewed = (Seq.fill(1)("a") ++ Seq.fill(1)("b") ++
      Seq.fill(2)("c") ++ Seq.fill(4)("d")).toDF("k")
    val r = Salting.keySkewReport(skewed, "k", topK = 2).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((8L, 4L, 4L)))
    assert(r.getDouble(3) === 0.5)    // max_share
    assert(r.getDouble(4) === 0.75)   // top2_share = (4+2)/8
    assert(r.getDouble(5) === 0.3125) // gini
    val uniform = (1 to 12).map(i => s"k${i % 4}").toDF("k")
    assert(Salting.keySkewReport(uniform, "k").head().getDouble(5) === 0.0)
    val single = Seq.fill(5)("only").toDF("k")
    val s1 = Salting.keySkewReport(single, "k").head()
    assert(s1.getDouble(5) === 0.0)
    assert(s1.getDouble(3) === 1.0)
  }

  test("prefixSum: exclusive weighted prefix in key order across shards; collision rejected") {
    import spark.implicits._
    val df = (1L to 100L).map(k => (k, k * 3L)).toDF("k", "w")
    val got = Sampling.prefixSum(df, "k", "w", nShards = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (1L to 100L).foreach { k =>
      assert(got(k) === (1L until k).map(_ * 3L).sum, s"k=$k")
    }
    intercept[IllegalArgumentException] {
      Sampling.prefixSum(df.withColumnRenamed("w", "cum_sum"), "k", "cum_sum")
    }
  }

  test("contiguousIndex rejects an existing global_idx column and bad shard counts") {
    import spark.implicits._
    val df = Seq((1L, 5L)).toDF("doc_id", "global_idx")
    intercept[IllegalArgumentException] {
      Sampling.contiguousIndex(df, "doc_id", 4)
    }
    intercept[IllegalArgumentException] {
      Sampling.contiguousIndex(df.drop("global_idx"), "doc_id", 0)
    }
  }

  test("curriculumShuffle: equals the per-bucket window reference; contiguous 1..n per bucket; partitioning-invariant") {
    val d = docs.select(col("doc_id"),
      least(expr("size(array_remove(split(text, ' '), '')) div 100"),
        lit(3)).cast("long").as("bucket"))
    def run(x: org.apache.spark.sql.DataFrame) =
      Sampling.curriculumShuffle(x, "doc_id", "bucket")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = run(d)
    assert(run(d.repartition(11)) === got)
    // naive single-window reference
    val mixOf = d.select(col("doc_id"),
        Sampling.seededMix(col("doc_id"), 42L).as("mix"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = got.keys.toSeq.groupBy(id => got(id)._1).flatMap { case (b, ids) =>
      ids.sortBy(id => (mixOf(id), id)).zipWithIndex
        .map { case (id, i) => id -> ((b, i + 1L)) }
    }.toMap
    assert(got === want)
    // contiguous positions per bucket
    got.values.groupBy(_._1).foreach { case (b, vs) =>
      assert(vs.map(_._2).toSeq.sorted === (1L to vs.size).toSeq, s"bucket $b")
    }
    intercept[IllegalArgumentException] {
      Sampling.curriculumShuffle(d.withColumn("pos", lit(1)), "doc_id", "bucket")
    }
  }

  test("groupSplit: planted near-dup twins co-assign; splits never straddle a group") {
    val df = Seq(
      (1L, "same lead text here"), (2L, "same lead text here"),
      (3L, "other text entirely"), (4L, "third body of words"))
      .toDF("doc_id", "k")
    val got = Sampling.groupSplit(df, "doc_id", "k")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(1L) === got(2L), "twins straddled splits")
    // corpus-level: every lead-16 group is split-coherent
    val keyed = docs.select(col("doc_id"),
      array_join(slice(split(col("text"), " "), 1, 16), " ").as("k"))
    val straddlers = Sampling.groupSplit(keyed, "doc_id", "k")
      .groupBy("k").agg(countDistinct("split").as("n"))
      .filter(col("n") > 1).count()
    assert(straddlers === 0L)
  }

  test("groupSplit: fractions near the cuts on mostly-unique keys; deterministic; bad cuts fail fast") {
    val keyed = docs.select(col("doc_id"),
      array_join(slice(split(col("text"), " "), 1, 16), " ").as("k"))
    val byShare = Sampling.groupSplit(keyed, "doc_id", "k")
      .groupBy("split").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = byShare.values.sum.toDouble
    assert(byShare.keySet === Set("train", "val", "test"))
    assert(byShare("train") / total > 0.90 && byShare("train") / total < 0.99,
      s"train share off: $byShare")
    def run() = Sampling.groupSplit(keyed, "doc_id", "k")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toSet
    assert(run() === run())
    intercept[IllegalArgumentException] {
      Sampling.groupSplit(keyed, "doc_id", "k", cuts = Seq(("train", 90)))
    }
    intercept[IllegalArgumentException] {
      Sampling.groupSplit(keyed, "doc_id", "k",
        cuts = Seq(("a", 98), ("a", 100)))
    }
  }
}
