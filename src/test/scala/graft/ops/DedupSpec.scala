package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Tables.load(spark, TestSpark.Sf001, "documents")

  test("exact dedup collapses constructed duplicates to min id") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", Seq("text"))
      .select("doc_id", "dup_count").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 2L, 3L -> 1L))
  }

  test("normalizedDedup: case/punct/spacing variants collapse; norm_only_dup names exactly what raw dedup misses") {
    val df = Seq(
      (1L, "hello world"),     // canonical of the whole variant family
      (2L, "Hello,  World!"),  // case + punct + double space
      (3L, "hello world"),     // raw duplicate of 1
      (4L, " hello   world "), // spacing only
      (5L, "goodbye"))         // unique
      .toDF("doc_id", "text")
    val out = Dedup.normalizedDedup(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    assert(out.toSeq === Seq(
      (1L, 1L, false, false),
      (2L, 1L, true, true),   // raw-unique, caught ONLY by normalization
      (3L, 1L, true, false),  // raw dedup already catches it
      (4L, 1L, true, true),
      (5L, 5L, false, false)))
    // the normalizer itself: lowercase, punct→space, collapse, trim
    val norm = df.select(Dedup.normalizeText($"text").as("n"))
      .collect().map(_.getString(0))
    assert(norm.toSeq === Seq("hello world", "hello world", "hello world",
      "hello world", "goodbye"))
  }

  test("exact dedup ≡ groupBy(content) formulation on the corpus (hash key changes the plan, not the relation)") {
    val byHash = Dedup.exact(docs, "doc_id", Seq("text"))
      .select("doc_id", "dup_count").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val byText = docs.groupBy("text")
      .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("dup_count"))
      .select("doc_id", "dup_count").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(byHash === byText)
  }

  test("exact dedup: NULLs group together and (null, x) ≠ (x, null) across columns") {
    // Spark's hash exprs skip null inputs; contentHash128's isnull tags
    // are what keeps the shifted tuples in DISTINCT groups.
    val df = Seq(
      (1L, Option("x"), Option.empty[String]),
      (2L, Option.empty[String], Option("x")),
      (3L, Option.empty[String], Option.empty[String]),
      (4L, Option.empty[String], Option.empty[String]))
      .toDF("doc_id", "c1", "c2")
    val out = Dedup.exact(df, "doc_id", Seq("c1", "c2"))
      .select("doc_id", "dup_count").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("deltaDedup: admits only index-unseen, within-delta-unique content (min id wins)") {
    val corpus = Seq((2L, "seen before"), (4L, "also seen")).toDF("doc_id", "text")
    val delta = Seq(
      (11L, "seen before"),  // in index → rejected
      (13L, "brand new"),    // admitted
      (15L, "brand new"),    // within-delta dup of 13 → rejected
      (17L, "also new"))     // admitted
      .toDF("doc_id", "text")
    val index = Dedup.indexHashes(corpus, Seq("text"))
    val out = Dedup.deltaDedup(delta, index, "doc_id", Seq("text"))
    assert(out.columns.toSeq === delta.columns.toSeq)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet === Set(13L, 17L))
  }

  test("bloomDeltaDedup ≡ deltaDedup on the corpus at any fpp (sketch changes the plan, not the relation)") {
    val index = Dedup.indexHashes(docs.filter($"doc_id" % 3 =!= 0), Seq("text"))
    val delta = docs.filter($"doc_id" % 3 === 0)
    val plain = Dedup.deltaDedup(delta, index, "doc_id", Seq("text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // fpp 0.9 floods the verify path with false positives; fpp 1e-6
    // sends almost everything down the definite-new branch. Both must
    // produce the identical admitted set — fpp is a cost knob only.
    for (fpp <- Seq(0.9, 0.05, 1e-6)) {
      val bloomed = Dedup.bloomDeltaDedup(delta, index, "doc_id", Seq("text"), fpp)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(bloomed === plain, s"fpp=$fpp")
    }
  }

  test("bloomDeltaDedup: empty index admits every within-delta-unique row; bad fpp rejected") {
    val delta = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "text")
    val empty = Dedup.indexHashes(delta.filter($"doc_id" < 0), Seq("text"))
    val out = Dedup.bloomDeltaDedup(delta, empty, "doc_id", Seq("text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 3L))
    intercept[IllegalArgumentException] {
      Dedup.bloomDeltaDedup(delta, empty, "doc_id", Seq("text"), fpp = 1.0)
    }
  }

  test("bloomDeltaDedup nIndexHint: sizing-only — identical relation even when the hint is wrong") {
    val index = Dedup.indexHashes(docs.filter($"doc_id" % 3 =!= 0), Seq("text"))
    val delta = docs.filter($"doc_id" % 3 === 0)
    val plain = Dedup.deltaDedup(delta, index, "doc_id", Seq("text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // exact hint (the production path: cardinality from table metadata,
    // no count() action), a wildly-low hint, and the adversarial 0-hint
    // against a NON-empty index: all must keep the anti-join
    // authoritative — the hint can degrade the prefilter, never dedup.
    for (hint <- Seq(Some(index.count()), Some(5L), Some(0L))) {
      val hinted = Dedup.bloomDeltaDedup(
          delta, index, "doc_id", Seq("text"), nIndexHint = hint)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(hinted === plain, s"hint=$hint")
    }
    intercept[IllegalArgumentException] {
      Dedup.bloomDeltaDedup(delta, index, "doc_id", Seq("text"), nIndexHint = Some(-1L))
    }
  }

  test("exact dedup does not clobber a caller column named _graft_ch") {
    val df = Seq((1L, "a", "keep"), (2L, "a", "keep2"))
      .toDF("doc_id", "text", "_graft_ch")
    val out = Dedup.exact(df, "doc_id", Seq("text", "_graft_ch"))
    assert(out.columns.toSeq === Seq("text", "_graft_ch", "doc_id", "dup_count"))
    assert(out.count() === 2) // distinct on (text, _graft_ch) — caller col still a real key
  }

  test("substringDedup: any-alignment catch, overlap merge, first-occurrence win") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val doc1 = s"alpha beta $shared gamma"
    val doc2 = s"x1 x2 x3 $shared y1" // same substring, different alignment
    val out = Dedup.substringDedup(
        Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text"),
        "doc_id", "text", minTokens = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    // first occurrence (doc 1) keeps everything
    assert(out(1L).getAs[String]("clean_text") === doc1)
    assert(out(1L).getAs[Long]("tokens_removed") === 0L)
    // doc 2 loses EXACTLY the 10 shared tokens: the three duplicated
    // 8-windows overlap and merge to one 10-token cut
    assert(out(2L).getAs[String]("clean_text") === "x1 x2 x3 y1")
    assert(out(2L).getAs[Long]("tokens_removed") === 10L)
    assert(out(2L).getAs[Long]("tokens_total") === 14L)
  }

  test("substringDedup catches the offset duplicate spanDedup's fixed stride misses") {
    val shared = (1 to 8).map(i => s"t$i").mkString(" ")
    val df = Seq(
      (1L, s"$shared a1 a2 a3 a4 a5 a6 a7 a8"),
      (2L, s"pre $shared b1 b2 b3 b4 b5 b6 b7")).toDF("doc_id", "text")
    // fixed 8-stride spans never line up with the offset-by-1 copy
    val spans = Dedup.spanDedup(df, "doc_id", "text", 8)
      .collect().map(r => r.getAs[Long]("spans_kept") -> r.getAs[Long]("spans_total"))
    assert(spans.forall { case (kept, total) => kept == total })
    val sub = Dedup.substringDedup(df, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("tokens_removed")).toMap
    assert(sub === Map(1L -> 0L, 2L -> 8L))
  }

  test("substringDedup: within-doc repetition dedups against itself") {
    val w = (1 to 8).map(i => s"w$i").mkString(" ")
    val out = Dedup.substringDedup(
        Seq((5L, s"$w $w")).toDF("doc_id", "text"),
        "doc_id", "text", minTokens = 8).head()
    assert(out.getAs[String]("clean_text") === w)
    assert(out.getAs[Long]("tokens_removed") === 8L)
  }

  test("substringDedup: short docs pass through untouched") {
    val out = Dedup.substringDedup(
        Seq((9L, "just seven tokens in this tiny doc")).toDF("doc_id", "text"),
        "doc_id", "text", minTokens = 8).head()
    assert(out.getAs[String]("clean_text") === "just seven tokens in this tiny doc")
    assert(out.getAs[Long]("tokens_removed") === 0L)
    assert(out.getAs[Long]("tokens_total") === 7L)
  }

  test("MinHash-LSH finds every exact near-dup pair (recall 1.0 here) with no false positives") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 32, 8, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    // The >= threshold verify step makes LSH ⊆ exact; banding determines recall.
    assert(lsh.subsetOf(exact))
    assert(lsh === exact, s"recall ${lsh.size}/${exact.size}")
  }

  test("minhashParamsFor: S-curve feasibility, least-noise selection, honest infeasibility") {
    // catch probability is the closed form both gates rest on
    assert(math.abs(Dedup.minhashCatchProb(1, 1, 0.5) - 0.5) < 1e-12)
    assert(math.abs(Dedup.minhashCatchProb(2, 1, 0.5) - 0.75) < 1e-12)
    // solved banding meets recall at the threshold; every feasible
    // divisor banding catches at least as much noise (optimality)
    val numHashes = 32
    val bands = Dedup.minhashParamsFor(numHashes, threshold = 0.5,
      targetRecall = 0.95, noiseSim = 0.2)
    assert(numHashes % bands == 0)
    val rows = numHashes / bands
    assert(Dedup.minhashCatchProb(bands, rows, 0.5) >= 0.95)
    val solvedNoise = Dedup.minhashCatchProb(bands, rows, 0.2)
    (1 to numHashes).filter(numHashes % _ == 0).foreach { b =>
      if (Dedup.minhashCatchProb(b, numHashes / b, 0.5) >= 0.95)
        assert(Dedup.minhashCatchProb(b, numHashes / b, 0.2) >= solvedNoise - 1e-12,
          s"bands=$b feasible with less noise than the solved $bands")
    }
    // a budget too small for the demand errors instead of under-recalling
    intercept[IllegalArgumentException] {
      Dedup.minhashParamsFor(2, threshold = 0.9, targetRecall = 0.999)
    }
    // end-to-end: the auto-banded pairs hit the recall gate against the
    // exact relation (the q21/q22 pairing, with the knob solved)
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = Dedup.minhashLshPairsAuto(docs, "doc_id", "text", 3, 32, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto.subsetOf(exact))
    assert(auto.size.toDouble >= 0.95 * exact.size,
      s"auto-banded recall ${auto.size}/${exact.size}")
  }

  test("MinHash-LSH maxBucket guard: a bucket AT the cap expands pairs; one OVER it drops whole") {
    // boundary semantics of the round-11 WindowGroupLimit rank-prune
    // guard: it must reproduce the legacy anti-join's drop rule
    // exactly (> maxBucket dropped, == maxBucket kept), with bands = 1
    // so each corpus is a single bucket
    def pairs(n: Int, cap: Int): Long =
      Dedup.minhashLshPairs(
        (1L to n.toLong).map(i => (i, "same text in every doc here")).toDF("doc_id", "text"),
        "doc_id", "text", shingleN = 3, numHashes = 32, bands = 1,
        threshold = 0.5, maxBucket = cap).count()
    assert(pairs(6, 6) === 6L * 5 / 2, "bucket at the cap must expand fully")
    assert(pairs(7, 6) === 0L, "bucket over the cap must drop whole, not truncate")
  }

  test("prefix-filtered set-similarity join ≡ plain inverted-index join (exactness)") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = canon(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3))
    val pref = canon(Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 3, 0.3))
    assert(plain.nonEmpty)
    assert(pref === plain)
  }

  test("auto path selection: uniform corpus → plain join; boilerplate skew → prefix (pure rule + measured stats)") {
    // Pure decision rule on the documented boundaries.
    assert(Dedup.chooseJaccardPath(0, 0, 0) === Dedup.JaccardExact)
    assert(Dedup.chooseJaccardPath(260388, 2791946, 25) === Dedup.JaccardExact) // sf0.1 stats
    assert(Dedup.chooseJaccardPath(1000, 33001, 10) === Dedup.JaccardPrefix)    // sumDfSq/P > 32
    assert(Dedup.chooseJaccardPath(1000, 16500, 130) === Dedup.JaccardPrefix)   // maxDf² > 16·P
    // Measured stats: the synthetic corpus is uniform → plain join.
    assert(Dedup.jaccardPathFor(docs, "doc_id", "text", 3) === Dedup.JaccardExact)
    // A boilerplate-dominated corpus (one footer in every doc) is the
    // skew case the prefix order exists for.
    val boiler = (1L to 300L).map(i => (i, s"body$i unique$i token$i common boiler plate footer text here"))
      .toDF("doc_id", "text")
    assert(Dedup.jaccardPathFor(boiler, "doc_id", "text", 3) === Dedup.JaccardPrefix)
  }

  test("auto ≡ plain exact relation on both corpus shapes (selection can change cost, never results)") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val uniform = canon(Dedup.ngramJaccardPairsAuto(docs, "doc_id", "text", 3, 0.5))
    assert(uniform.nonEmpty)
    assert(uniform === canon(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)))
    // Skewed fixture: auto picks prefix (asserted above); result must
    // still equal the plain join's exact relation, planted near-dup
    // pair included.
    val boiler = ((1L to 300L).map(i =>
        (i, s"body$i unique$i token$i common boiler plate footer text here")) ++
      Seq((900L, "same aaa bbb ccc ddd eee"), (901L, "same aaa bbb ccc ddd fff")))
      .toDF("doc_id", "text")
    val auto = canon(Dedup.ngramJaccardPairsAuto(boiler, "doc_id", "text", 3, 0.3))
    assert(auto === canon(Dedup.ngramJaccardPairs(boiler, "doc_id", "text", 3, 0.3)))
    assert(auto.exists(t => t._1 == 900L && t._2 == 901L))
  }

  test("hot-shingle cut: exact scores for pairs sharing a cold shingle; only all-hot pairs drop") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // Boilerplate footer in EVERY doc (its shingles hit df=14 > maxDocFreq=5);
    // unique bodies keep body shingles at df <= 2.
    val boiler = "common boiler plate footer text"
    val corpus =
      (1L to 10L).map(i => (i, s"body$i alpha$i beta$i gamma$i delta$i $boiler")) ++
      Seq( // near-dup pair differing in one token → shares cold body shingles
        (100L, s"same aaa bbb ccc ddd eee $boiler"),
        (101L, s"same aaa bbb ccc ddd fff $boiler"),
        // pure-boilerplate pair: intersection is ONLY hot shingles
        (200L, boiler), (201L, boiler))
    val df = corpus.toDF("doc_id", "text")
    val exact = canon(Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.3))
    val cut = canon(Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.3, maxDocFreq = 5))
    // the documented recall bound: a pair drops iff its intersection is
    // entirely hot — here, exactly the pairs touching a pure-boilerplate
    // doc (200/201 contribute no cold shingle to any intersection)
    assert(exact.map(t => (t._1, t._2)).contains((200L, 201L)))
    val allHot = exact.filter(t => t._1 >= 200L || t._2 >= 200L)
    assert(allHot.nonEmpty)
    assert(cut === exact -- allHot)
    // and the surviving near-dup pair scores its EXACT jaccard (hot shingles
    // restored by the per-doc hot-array correction, not cold-count-only)
    val exactScore = exact.find(t => (t._1, t._2) == ((100L, 101L))).map(_._3)
    val cutScore = cut.find(t => (t._1, t._2) == ((100L, 101L))).map(_._3)
    assert(exactScore.isDefined && cutScore === exactScore)
  }

  test("hot-shingle cut inactive on a uniform corpus: identical relation to the unbounded path") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = canon(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5))
    val cut = canon(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, maxDocFreq = 100))
    assert(plain.nonEmpty && cut === plain)
  }

  test("SimHash: identical texts at distance 0; near-dups within radius are a subset of Jaccard pairs' universe") {
    val df = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"), (3L, "q r s t u v w x"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxDistance = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs.get((1L, 2L)) === Some(0L))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("embedding near-dup pairs are symmetric-free (id_a < id_b) and above threshold") {
    val embs = Tables.load(spark, TestSpark.Sf001, "embeddings")
    val out = Dedup.embeddingNearDupPairs(embs, "vec_id", "embedding", 0.4).collect()
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
    assert(out.forall(r => r.getDouble(2) >= 0.4))
  }

  test("SRP-LSH embedding near-dup pairs: subset of exact relation, recall >= 0.95 (q59 gate)") {
    val embs = Tables.load(spark, TestSpark.Sf001, "embeddings")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = canon(Dedup.embeddingNearDupPairs(embs, "vec_id", "embedding", 0.4))
    val lsh = canon(Similarity.srpNearDupPairs(embs, "vec_id", "embedding", 0.4,
      planes = 5, tables = 12))
    assert(exact.nonEmpty)
    // exact-cosine verify ⇒ precision 1 (values included: same rounding)
    assert(lsh.subsetOf(exact))
    // measured 1.0 on this corpus; >= 0.95 keeps the gate robust to a
    // regenerated fixture (theoretical per-pair miss ≈ 2.6e-3 at cos 0.4)
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.95, s"recall $recall (${lsh.size}/${exact.size})")
  }

  test("production SRP regime (0.9 / 16 planes / 8 tables): recall >= 0.95 on planted twins (q61 gate)") {
    val embs = Tables.load(spark, TestSpark.Sf001, "embeddings")
    val corpus = graft.analytics.DataOpsQueries.twinCorpus(embs)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = canon(Dedup.embeddingNearDupPairs(corpus, "vec_id", "embedding", 0.9))
    // the planted relation is exactly vector-vs-its-twin: no cross pair
    // sneaks over 0.9, every planted twin lands over it
    val n = embs.count()
    assert(exact.map(t => (t._1, t._2)) ===
      (0L until n).map(i => (i, i + 10000000L)).toSet)
    val lsh = canon(Similarity.srpNearDupPairs(corpus, "vec_id", "embedding", 0.9))
    assert(lsh.subsetOf(exact)) // exact-cosine verify ⇒ precision 1
    val recall = lsh.size.toDouble / exact.size
    // theoretical per-pair miss at cosine ≈ 0.956 with Hamming-1 probing
    // is ~1.4e-3 over 8 tables; 0.95 keeps the gate robust
    assert(recall >= 0.95, s"recall $recall (${lsh.size}/${exact.size})")
  }

  test("srpParamsFor: recall target, tables cap, and cost optimality hold; planes track log n at tight thresholds") {
    def cost(n: Long, b: Int, t: Int): Double =
      t * ((b + 1).toDouble + (b + 1).toDouble * n / math.pow(2.0, b))
    for (n <- Seq(500L, 4000L, 256000L, 100000000L); thr <- Seq(0.4, 0.9)) {
      val (b, tbl) = Similarity.srpParamsFor(n, thr)
      assert(tbl <= 64, s"n=$n t=$thr -> ($b, $tbl) breaks the tables cap")
      // predicted recall at the boundary meets the target
      val recall = 1.0 - math.pow(1.0 - Similarity.srpCatchProb(b, thr), tbl)
      assert(recall >= 0.95 - 1e-9, s"n=$n t=$thr -> ($b, $tbl) recall $recall")
      // optimality: no other in-cap recall-meeting config is cheaper
      for (b2 <- 4 to 48) {
        val c2 = Similarity.srpCatchProb(b2, thr)
        if (c2 > 0 && c2 < 1) {
          val t2 = math.max(1, math.ceil(math.log(0.05) / math.log(1 - c2)).toInt)
          if (t2 <= 64)
            assert(cost(n, b, tbl) <= cost(n, b2, t2) + 1e-9,
              s"n=$n t=$thr: ($b,$tbl) costs more than ($b2,$t2)")
        }
      }
    }
    // the knob that must track corpus size does
    assert(Similarity.srpParamsFor(256000L, 0.9)._1 > Similarity.srpParamsFor(4000L, 0.9)._1)
    // the hand-tuned production regime's recall claim checks out under
    // the same closed form the rule uses (16 planes x 8 tables at 0.9)
    val handTuned = 1.0 - math.pow(1.0 - Similarity.srpCatchProb(16, 0.9), 8)
    assert(handTuned >= 0.94 && handTuned <= 0.96, s"$handTuned")
  }

  test("srpProbeCapture / srpParamsDirectedFor: capture curve sane, full probe recovered, recall target met") {
    for (thr <- Seq(0.4, 0.9); b <- Seq(5, 13, 20)) {
      val cap = Similarity.srpProbeCapture(b, thr)
      assert(cap(0) === 0.0)
      // monotone nondecreasing in p, and full probing captures everything
      (1 to b).foreach(p => assert(cap(p) >= cap(p - 1) - 1e-12, s"b=$b thr=$thr p=$p"))
      assert(math.abs(cap(b) - 1.0) < 1e-6, s"capture($b)=${cap(b)}")
      // at capture=1 the directed catch IS the full-probe closed form
      assert(math.abs(Similarity.srpDirectedCatchProb(b, thr, 1.0) -
        Similarity.srpCatchProb(b, thr)) < 1e-12)
      // directed probing concentrates: a few probes capture most of the
      // flip mass (the property the posting-volume cut rests on)
      if (b >= 13 && thr == 0.9)
        assert(cap(4) > 0.5, s"cap(4)=${cap(4)} at b=$b — directed probing buys nothing")
    }
    for (n <- Seq(500L, 4000L, 256000L, 100000000L); thr <- Seq(0.4, 0.9)) {
      val (b, t, p) = Similarity.srpParamsDirectedFor(n, thr)
      assert(t <= 64 && p >= 0 && p <= b, s"n=$n thr=$thr -> ($b,$t,$p)")
      val c = Similarity.srpDirectedCatchProb(b, thr, Similarity.srpProbeCapture(b, thr)(p))
      val recall = 1.0 - math.pow(1.0 - c, t)
      assert(recall >= 0.95 - 1e-9, s"n=$n thr=$thr -> ($b,$t,$p) recall $recall")
      // never a larger posting fan-out than the full-probe solution
      val (b0, t0) = Similarity.srpParamsFor(n, thr)
      assert(t * (p + 1) <= t0 * (b0 + 1),
        s"n=$n thr=$thr: directed ($b,$t,$p) posts more than full ($b0,$t0)")
      // probing disabled: p pinned to 0 and the recall target still met
      // on the exact-bucket catch alone (the probe=false contract)
      val (bn, tn, pn) = Similarity.srpParamsDirectedFor(n, thr, probing = false)
      assert(pn === 0, s"n=$n thr=$thr probing=false -> p=$pn")
      val cn = Similarity.srpDirectedCatchProb(bn, thr, 0.0)
      val recallN = 1.0 - math.pow(1.0 - cn, tn)
      assert(recallN >= 0.95 - 1e-9,
        s"n=$n thr=$thr probing=false -> ($bn,$tn) recall $recallN")
    }
  }

  test("directed probing (probePlanes): subset of exact relation, recall >= 0.95 on planted twins") {
    val embs = Tables.load(spark, TestSpark.Sf001, "embeddings")
    val corpus = graft.analytics.DataOpsQueries.twinCorpus(embs)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = canon(Dedup.embeddingNearDupPairs(corpus, "vec_id", "embedding", 0.9))
    // explicit directed regime (not the solver): planes=13, 2 probes —
    // solved tables for that catch at the 0.9 boundary
    val cap = Similarity.srpProbeCapture(13, 0.9)(2)
    val c = Similarity.srpDirectedCatchProb(13, 0.9, cap)
    val t = math.max(1, math.ceil(math.log(0.05) / math.log(1.0 - c)).toInt)
    val lsh = canon(Similarity.srpNearDupPairs(corpus, "vec_id", "embedding", 0.9,
      planes = 13, tables = t, probePlanes = 2))
    assert(lsh.subsetOf(exact))
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.95, s"recall $recall (${lsh.size}/${exact.size})")
  }

  test("srpNearDupPairsAuto: solved parameters keep precision 1 and recall >= 0.95 on planted twins") {
    val embs = Tables.load(spark, TestSpark.Sf001, "embeddings")
    val corpus = graft.analytics.DataOpsQueries.twinCorpus(embs)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = canon(Dedup.embeddingNearDupPairs(corpus, "vec_id", "embedding", 0.9))
    val auto = canon(Similarity.srpNearDupPairsAuto(corpus, "vec_id", "embedding", 0.9))
    assert(exact.nonEmpty)
    assert(auto.subsetOf(exact)) // exact-cosine verify ⇒ precision 1
    val recall = auto.size.toDouble / exact.size
    assert(recall >= 0.95, s"recall $recall (${auto.size}/${exact.size})")
  }

  test("SemDeDup: precision 1.0, recall >= 0.95 vs exact dropped set on planted twins (q85 gate)") {
    val embs = Tables.load(spark, TestSpark.Sf001, "embeddings")
    val corpus = graft.analytics.DataOpsQueries.twinCorpus(embs)
    // exact semantics: drop every id with a smaller-id neighbor over 0.9
    val exactDropped = Dedup.embeddingNearDupPairs(corpus, "vec_id", "embedding", 0.9)
      .select("id_b").distinct()
      .collect().map(_.getLong(0)).toSet
    val survivors = VectorOps.semDedup(corpus, "vec_id", "embedding",
        threshold = 0.9, nClusters = 16)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val allIds = corpus.select("vec_id").collect().map(_.getLong(0)).toSet
    val dropped = allIds -- survivors
    // within-cluster cosine is computed exactly → nothing non-duplicate drops
    assert(dropped.subsetOf(exactDropped), s"false drops: ${dropped -- exactDropped}")
    // misses are only twin pairs straddling a cluster boundary
    val recall = dropped.size.toDouble / exactDropped.size
    assert(recall >= 0.95, s"recall $recall (${dropped.size}/${exactDropped.size})")
  }

  test("SemDeDup: mega-cluster skew cap skips (under-dedups), never drops non-duplicates") {
    import spark.implicits._
    // 30 identical vectors land in one cluster of 30 > maxCluster=10 →
    // cluster skipped, all 30 survive; the distinct pair elsewhere still dedups.
    val rows = (1L to 30L).map(i => (i, Array(1.0f, 0.0f, 0.0f))) ++
      Seq((100L, Array(0.0f, 1.0f, 0.05f)), (101L, Array(0.0f, 1.0f, 0.06f)))
    val df = rows.toDF("vec_id", "embedding")
    // nClusters=2: one direction per cluster — more clusters could seed
    // the near-identical pair apart on this degenerate two-direction data
    val out = VectorOps.semDedup(df, "vec_id", "embedding",
        threshold = 0.9, nClusters = 2, maxCluster = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((1L to 30L).toSet.subsetOf(out), "capped cluster must survive whole")
    assert(out.contains(100L) && !out.contains(101L), s"pair not deduped: $out")
  }

  test("SRP coverage guard: throws when the skew cap would silently empty the result") {
    import spark.implicits._
    // 30 identical vectors, 4-plane buckets, maxBucket=5: every posting
    // sits in an oversized bucket, so without the guard the pair set is
    // empty and indistinguishable from 'no near-dups'.
    val df = (1L to 30L).map(i => (i, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalStateException] {
      Similarity.srpNearDupPairs(df, "vec_id", "embedding", 0.9,
        planes = 4, tables = 2, maxBucket = 5, coverageGuard = true)
    }
    assert(e.getMessage.contains("drop ALL"))
    // the default stays a lazy plan builder (no eager pass): silent
    // empty, for callers that inspect their outputs
    val out = Similarity.srpNearDupPairs(df, "vec_id", "embedding", 0.9,
      planes = 4, tables = 2, maxBucket = 5)
    assert(out.count() === 0)
  }

  test("zero-norm vectors never pair: NaN cosine must not satisfy any threshold") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.0f, 0.0f, 0.0f)), // zero vector: cosine would be 0/0 = NaN
      (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(1.0f, 0.01f, 0.0f))).toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === Set((2L, 3L)), s"zero vector paired: $exact")
    val lsh = Similarity.srpNearDupPairs(df, "vec_id", "embedding", 0.9, planes = 4, tables = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(Set((2L, 3L))), s"zero vector paired via LSH: $lsh")
  }

  test("SRP-LSH skew guard: degenerate identical vectors drop, distinct vectors survive") {
    import spark.implicits._
    // 60 copies of one vector (one bucket everywhere > maxBucket=20) plus
    // two near-identical outliers that must still pair up.
    val rows = (1L to 60L).map(i => (i, Array(1.0f, 0.0f, 0.0f))) ++
      Seq((100L, Array(0.0f, 1.0f, 0.1f)), (101L, Array(0.0f, 1.0f, 0.11f)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.srpNearDupPairs(df, "vec_id", "embedding", 0.9,
      planes = 4, tables = 12, maxBucket = 20)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((100L, 101L)))
  }

  test("LSH skew guard drops degenerate buckets instead of going quadratic") {
    // 200 identical docs → one bucket of 200 > maxBucket=50 → dropped.
    val df = (1L to 200L).map(i => (i, "same same same same")).toDF("doc_id", "text")
    val out = Dedup.minhashLshPairs(df, "doc_id", "text",
      shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5, maxBucket = 50)
    assert(out.count() === 0)
  }

  test("spanDedup: repeated span keeps first occurrence, docs rebuild in position order") {
    val df = Seq(
      (1L, "a b c d e f"),          // spans: "a b c", "d e f"
      (2L, "x y z a b c"),          // loses "a b c" to doc 1
      (3L, "d e f d e f"))          // second in-doc copy also loses
      .toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("a b c d e f", 2L, 2L)))
    assert(out(2L) === (("x y z", 1L, 2L)))
    // doc 3's first "d e f" loses to doc 1's sid-1 span; its own second
    // copy loses too — the doc survives as an emptied row, not a gap.
    assert(out(3L) === (("", 0L, 2L)))
  }

  test("spanDedup: within one doc the EARLIER position wins the election") {
    val df = Seq((7L, "p q r s t u p q r")).toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, "doc_id", "text", 3).collect().head
    assert(out.getString(1) === "p q r s t u")
    assert((out.getLong(2), out.getLong(3)) === ((2L, 3L)))
  }

  test("spanDedup over the corpus: surviving token mass equals distinct-span mass") {
    // Global invariant tying the rebuild to the election: total spans
    // kept across all docs == number of distinct spans in the corpus.
    val out = Dedup.spanDedup(docs, "doc_id", "text", 10)
    val kept = out.agg(sum("spans_kept")).head().getLong(0)
    val toks = split(col("text"), " ")
    val distinctSpans = docs
      .select(explode(transform(sequence(lit(0), size(toks) - 1, lit(10)),
        st => concat_ws(" ", slice(toks, st + 1, lit(10))))).as("span"))
      .distinct().count()
    assert(kept === distinctSpans)
    assert(out.count() === docs.count())
  }

  test("crossSourceDupMatrix: planted mirrors count once per pair, diagonal counts within-source dups") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared one", "a"), (2L, "shared one", "b"), (3L, "shared one", "c"),
      (4L, "shared two", "a"), (5L, "shared two", "b"),
      (6L, "a only dup", "a"), (7L, "a only dup", "a"),
      (8L, "unique x", "a"), (9L, "unique y", "b"),
      // same content twice in BOTH a and b: one pair row (distinct
      // keys), plus a diagonal row for each source
      (10L, "both dup", "a"), (11L, "both dup", "a"),
      (12L, "both dup", "b"), (13L, "both dup", "b"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.crossSourceDupMatrix(docs, "text", "source")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("a", "b") -> 3L,  // shared one, shared two, both dup
      ("a", "c") -> 1L,  // shared one
      ("b", "c") -> 1L,
      ("a", "a") -> 2L,  // a only dup, both dup
      ("b", "b") -> 1L)) // both dup
  }
}
