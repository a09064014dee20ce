package graft.ops

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def hist(pairs: (String, Long)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    pairs.toDF("word", "wc")
  }

  test("overlap counting and greedy non-overlapping rewrite: 'aaa' fuses in two merges then exhausts") {
    // pairs of "aaa"×2: (a,a) occurs at two positions → count 4 (overlaps
    // counted, Sennrich get_stats semantics). The REWRITE is greedy
    // non-overlapping: [a,a,a] → [aa,a], so merge 2 is (aa,a) count 2,
    // after which the word is one symbol and training stops early.
    val expected = Seq(Bpe.Merge(0, "a", "a", 4L), Bpe.Merge(1, "aa", "a", 2L))
    assert(Bpe.trainMerges(hist("aaa" -> 2L), 5) === expected)
    assert(Bpe.trainMergesLocal(Seq("aaa" -> 2L), 5) === expected)
  }

  test("tie-break is (count desc, left asc, right asc)") {
    val h = Seq("cd" -> 1L, "ab" -> 1L)
    val got = Bpe.trainMergesLocal(h, 1)
    assert(got === Seq(Bpe.Merge(0, "a", "b", 1L)))
    assert(Bpe.trainMerges(hist(h: _*), 1) === got)
  }

  test("merged symbols chain: repeated bigram word folds left-to-right") {
    // "ababab": (a,b)=3 beats (b,a)=2 → [ab,ab,ab]; then (ab,ab)=2
    // rewrites GREEDILY to [abab, ab] (not three-way), then (abab,ab).
    val merges = Bpe.trainMergesLocal(Seq("ababab" -> 1L), 3)
    assert(merges === Seq(
      Bpe.Merge(0, "a", "b", 3L),
      Bpe.Merge(1, "ab", "ab", 2L),
      Bpe.Merge(2, "abab", "ab", 1L)))
    assert(Bpe.trainMerges(hist("ababab" -> 1L), 3) === merges)
  }

  test("distributed ≡ reference over 25 seeded random histograms (tie-heavy small alphabet)") {
    // alphabet {a, b} with tiny words maximizes pair-count ties and
    // merged-symbol collisions — the regime where a tie-break or
    // greedy-rewrite divergence between the two implementations would
    // surface. Seeds fixed: this is a property sweep, reproducibly.
    for (seed <- 0 until 25) {
      val rnd = new scala.util.Random(seed)
      val words = (0 until (2 + rnd.nextInt(6))).map { _ =>
        val w = (0 until (1 + rnd.nextInt(6)))
          .map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString
        w -> (1L + rnd.nextInt(5))
      }.groupBy(_._1).map { case (w, ws) => w -> ws.map(_._2).sum }.toSeq
      val expected = Bpe.trainMergesLocal(words, 6)
      val got = Bpe.trainMerges(hist(words: _*), 6)
      assert(got === expected, s"divergence at seed $seed on $words")
    }
  }

  test("batched ≡ sequential ≡ reference at 256 merges on the documents corpus") {
    // the production-scale contract: the disjoint-batch selection with
    // the strict-cutoff rule must reproduce 256 one-at-a-time argmax
    // steps exactly — same pairs, same ranks, same counts — while
    // spending ~numMerges/E[batch] shuffles instead of numMerges.
    val docs = Tables.load(spark, TestSpark.Sf001, "documents")
    val h = Bpe.wordHistogram(docs, "text")
    val local = h.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val expected = Bpe.trainMergesLocal(local, 256)
    val got = Bpe.trainMerges(h, 256)
    assert(got === expected)
    // maxBatch = 1 is the classic loop; it must agree too
    assert(Bpe.trainMerges(h, 24, maxBatch = 1) === expected.take(24))
  }

  test("distributed ≡ in-memory reference on the documents corpus, 12 merges") {
    val docs = Tables.load(spark, TestSpark.Sf001, "documents")
    val h = Bpe.wordHistogram(docs, "text")
    val local = h.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val got = Bpe.trainMerges(h, 12)
    val expected = Bpe.trainMergesLocal(local, 12)
    assert(got === expected)
    assert(got.size === 12)
  }

  // ------------------------------------------------------------ encode

  test("encode: native ≡ reference encodeLocal per document at 16 and 64 merges") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, TestSpark.Sf001, "documents")
    val h = Bpe.wordHistogram(docs, "text")
    for (n <- Seq(16, 64)) {
      val merges = Bpe.trainMerges(h, n)
      val got = Bpe.encode(docs, "text", merges, "sub")
        .select(col("doc_id"), col("sub")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val texts = docs.select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      for ((id, text) <- texts) {
        val expected = text.split(" ", -1).filter(_.nonEmpty).toSeq
          .flatMap(w => Bpe.encodeLocal(w, merges))
        assert(got(id) === expected, s"doc $id diverged at $n merges")
      }
    }
  }

  test("encodeWords/decodeWords: the boundary-preserving round-trip is exact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.Sf001, "documents")
    val merges = Bpe.trainMerges(Bpe.wordHistogram(docs, "text"), 32)
    // corpus round-trip: decode(encodeWords(text)) == text for every doc
    val rt = Bpe.encodeWords(docs, "text", merges, "ws")
      .select(col("doc_id"), col("text"), Bpe.decodeWords(col("ws")).as("back"))
      .filter(col("text") =!= col("back"))
      .count()
    assert(rt === 0L, s"$rt documents failed the encode/decode round-trip")
    // flattening encodeWords reproduces the flat encode exactly — the
    // two shapes agree on content, differing only in boundaries
    val both = Bpe.encodeWords(docs, "text", merges, "ws")
      .select(col("doc_id"), flatten(col("ws")).as("flat"))
      .join(Bpe.encode(docs, "text", merges, "sub").select(col("doc_id"), col("sub")),
        Seq("doc_id"))
      .filter(not(col("flat") === col("sub")))
      .count()
    assert(both === 0L, "encodeWords flattened diverged from encode")
    // generated words: subwords concatenate to the word, per word
    val gen = Seq((1L, "aa bab abab b"), (2L, ""), (3L, "zq")).toDF("doc_id", "text")
    val rows = Bpe.encodeWords(gen, "text", merges, "ws")
      .select(col("doc_id"), Bpe.decodeWords(col("ws")).as("back"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) === "aa bab abab b")
    assert(rows(2L) === "")
    assert(rows(3L) === "zq")
  }

  test("encode: native ≡ composable HOF formulation at 16 merges") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, TestSpark.Sf001, "documents")
    val merges = Bpe.trainMerges(Bpe.wordHistogram(docs, "text"), 16)
    val both = Bpe.encode(docs, "text", merges, "native")
      .withColumn("composable",
        Bpe.encodeTokensComposable(TextFunctions.tokens(col("text")), merges))
    assert(both.filter(not(col("native") === col("composable"))).count() === 0)
  }

  test("encode reproduces training's final symbol state (hand-computed)") {
    // the train-consistency invariant the rank-order semantics buys:
    // encoding a training word yields exactly the symbol sequence its
    // histogram row held when training stopped. Hand trace:
    //   (a,b)=7 → (a,a)=6 → (ab,ab)=4 → (aa,a)=3
    val words = Seq("ababab" -> 2L, "abc" -> 1L, "aaa" -> 3L)
    val merges = Bpe.trainMergesLocal(words, 4)
    assert(merges === Seq(
      Bpe.Merge(0, "a", "b", 7L), Bpe.Merge(1, "a", "a", 6L),
      Bpe.Merge(2, "ab", "ab", 4L), Bpe.Merge(3, "aa", "a", 3L)))
    assert(Bpe.encodeLocal("ababab", merges) === Seq("abab", "ab"))
    assert(Bpe.encodeLocal("abc", merges) === Seq("ab", "c"))
    assert(Bpe.encodeLocal("aaa", merges) === Seq("aaa"))
    // subwords always concatenate back to the word
    for ((w, _) <- words)
      assert(Bpe.encodeLocal(w, merges).mkString === w)
  }

  test("encode edge cases: empty text, repeated words hit the cache coherently") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val merges = Seq(Bpe.Merge(0, "a", "b", 9L), Bpe.Merge(1, "ab", "c", 5L))
    val df = Seq((1L, "abc abc abc"), (2L, ""), (3L, "x abc"), (4L, "  "))
      .toDF("id", "text")
    val got = Bpe.encode(df, "text", merges, "sub")
      .select("id", "sub").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) === Seq("abc", "abc", "abc"))
    assert(got(2L) === Seq.empty)
    assert(got(3L) === Seq("x", "abc"))
    assert(got(4L) === Seq.empty)
  }
}
