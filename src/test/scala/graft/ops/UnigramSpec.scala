package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer: Viterbi decoding semantics (max total score,
  * longest-last-piece ties, unk fallback), native kernel ≡ in-memory
  * reference, distributed hard-EM training ≡ local reference
  * bit-for-bit (exact integer counts), coverage invariants, and the
  * fertility-report shape over the documents corpus.
  */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def hist(pairs: (String, Long)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    pairs.toDF("word", "wc")
  }

  test("Viterbi picks the maximum-score segmentation, not the greedy-longest one") {
    // "abc": greedy-longest grabs "ab"+"c" (−3 −4 = −7); the DP must
    // find "a"+"bc" (−2 −2 = −4).
    val table = Map("a" -> -2.0, "ab" -> -3.0, "bc" -> -2.0, "c" -> -4.0,
      "b" -> -5.0)
    assert(Unigram.encodeLocal("abc", table) === Seq("a", "bc"))
  }

  test("ties keep the longest last piece; unknown chars fall back to single-char unk") {
    // both splits score −6; the strict-> scan keeps smaller j — the
    // longer last piece
    val tied = Map("a" -> -3.0, "bc" -> -3.0, "ab" -> -3.0, "c" -> -3.0)
    assert(Unigram.encodeLocal("abc", tied) === Seq("a", "bc"))
    // 'z' is out of vocabulary: segments alone at UnkScore
    val v = Map("ab" -> -1.0)
    assert(Unigram.encodeLocal("azb", v) === Seq("a", "z", "b"))
    assert(Unigram.encodeLocal("", v) === Seq.empty)
  }

  test("native UnigramEncode ≡ encodeLocal per document on the corpus; repeated words hit the cache coherently") {
    val docs = Tables.load(spark, TestSpark.Sf001, "documents").limit(300)
    val h = Bpe.wordHistogram(docs, "text")
    val vocab = Unigram.trainPieces(h, vocabSize = 80, maxPieceLen = 4,
      seedSize = 400, emRounds = 2)
    val table = vocab.map(p => p.piece -> p.score).toMap
    val got = Unigram.encode(docs.select("doc_id", "text"), "text", vocab)
      .select("doc_id", "text", "pieces")
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val expected = r.getString(1).split(" ", -1).filter(_.nonEmpty).toSeq
        .flatMap(w => Unigram.encodeLocal(w, table)).toSeq
      assert(r.getSeq[String](2) === expected, s"doc ${r.getLong(0)}")
    }
  }

  test("distributed trainPieces ≡ in-memory reference bit-for-bit (pieces, counts, scores)") {
    val words = Seq("the" -> 40L, "there" -> 12L, "then" -> 9L,
      "cat" -> 20L, "cats" -> 11L, "concatenate" -> 3L, "dog" -> 17L,
      "dodge" -> 5L, "thecat" -> 2L)
    val expected = Unigram.trainPiecesLocal(words, vocabSize = 30,
      maxPieceLen = 4, seedSize = 200, emRounds = 3)
    val got = Unigram.trainPieces(hist(words: _*), vocabSize = 30,
      maxPieceLen = 4, seedSize = 200, emRounds = 3)
    assert(got === expected)
  }

  test("distributed ≡ reference over 25 seeded random histograms (tie-heavy small alphabet)") {
    for (seed <- 0 until 25) {
      val rnd = new scala.util.Random(seed)
      val words = (0 until (2 + rnd.nextInt(6))).map { _ =>
        val w = (0 until (1 + rnd.nextInt(7)))
          .map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString
        w -> (1L + rnd.nextInt(5))
      }.groupBy(_._1).map { case (w, ws) => w -> ws.map(_._2).sum }.toSeq
      val expected = Unigram.trainPiecesLocal(words, vocabSize = 6,
        maxPieceLen = 3, seedSize = 64, emRounds = 3)
      val got = Unigram.trainPieces(hist(words: _*), vocabSize = 6,
        maxPieceLen = 3, seedSize = 64, emRounds = 3)
      assert(got === expected, s"divergence at seed $seed on $words")
    }
  }

  test("coverage invariants: every seed character survives pruning; every training word re-encodes losslessly") {
    val words = Seq("alpha" -> 9L, "beta" -> 7L, "gamma" -> 5L, "xyzzy" -> 1L)
    val vocab = Unigram.trainPiecesLocal(words, vocabSize = 8,
      maxPieceLen = 4, seedSize = 100, emRounds = 3)
    val chars = words.flatMap(_._1.toSeq).distinct.map(_.toString)
    val kept = vocab.map(_.piece).toSet
    chars.foreach(c => assert(kept.contains(c), s"char $c dropped"))
    val table = vocab.map(p => p.piece -> p.score).toMap
    words.foreach { case (w, _) =>
      assert(Unigram.encodeLocal(w, table).mkString === w)
    }
  }

  test("encodeWords preserves word boundaries and concatenates back to the text") {
    val docs = Tables.load(spark, TestSpark.Sf001, "documents").limit(100)
    val h = Bpe.wordHistogram(docs, "text")
    val vocab = Unigram.trainPieces(h, vocabSize = 60, maxPieceLen = 4,
      seedSize = 300, emRounds = 2)
    val rows = Unigram.encodeWords(docs.select("text"), "text", vocab)
      .select(col("text"), Bpe.decodeWords(col("word_pieces")).as("rt"))
      .collect()
    rows.foreach(r => assert(r.getString(1) === r.getString(0)))
  }

  test("seedCandidates counts substrings exactly (brute-force fixture)") {
    val h = Seq("aba" -> 2L, "ba" -> 3L)
    val brute = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    for ((w, c) <- h; s <- 0 until w.length;
         l <- 1 to math.min(3, w.length - s))
      brute(w.substring(s, s + l)) += c
    val got = Unigram.seedCandidates(hist(h: _*), maxPieceLen = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === brute.toMap)
  }
}
