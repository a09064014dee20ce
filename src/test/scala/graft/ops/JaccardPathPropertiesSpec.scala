package graft.ops

import graft.TestSpark
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck property for [[Dedup.jaccardPathFor]]'s sampling noise:
  * the 1-in-4 document sample must reproduce the EXACT-statistics plan
  * decision whenever the corpus's true Σdf²/P sits outside the
  * documented noise band [32/1.5, 32·1.5] around the selection
  * threshold (a noise flip to prefix on a uniform corpus costs ~3×,
  * measured 8.4 s vs 2.6 s at sf0.1 — the property bounds when that
  * can happen).
  *
  * Corpus construction puts the true ratio where the generator wants
  * it: `blocks` blocks of `d` documents; each document carries Wu = 4
  * unique words (→ 4 shingles with df = 1, two of them junction
  * shingles) plus a block-shared run of Ws = 4 words (→ 2 shingles
  * with df = d). True Σdf²/P = (Wu + (Ws−2)·d) / (Wu + Ws − 2) =
  * (4 + 2d) / 6, so d = 3R − 2 dials in any target ratio R —
  * generated on both sides of the band (R ∈ [8, 20] and [50, 110])
  * with a random id salt so different documents land in the hash
  * sample each trial. The maxDf² rule cannot fire in this range
  * (d² ≪ 16·P for every generated d), so the Σdf²/P rule is the one
  * under test. Fixed initial seed: the property is a regression gate,
  * not a fuzzer.
  */
object JaccardPathPropertiesSpec extends Properties("graft.jaccardPath") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)
      .withInitialSeed(org.scalacheck.rng.Seed(421984L))

  private val caseGen: Gen[(Int, Long, Boolean)] = for {
    low <- Gen.oneOf(true, false)
    r <- if (low) Gen.choose(8, 20) else Gen.choose(50, 110)
    salt <- Gen.choose(0L, 1L << 40)
  } yield (3 * r - 2, salt, low)

  property("1-in-4 sampled decision == exact decision outside the 1.5x band") =
    forAll(caseGen) { case (d, salt, low) =>
      val spark = TestSpark.spark
      import spark.implicits._
      val blocks = 8
      val rows = for {
        b <- 0 until blocks
        i <- 0 until d
      } yield {
        val id = salt + b.toLong * d + i
        val uniq = (0 until 4).map(w => s"u${b}_${i}_$w").mkString(" ")
        val shared = (0 until 4).map(w => s"s${b}_$w").mkString(" ")
        (id, s"$uniq $shared")
      }
      val corpus = rows.toDF("doc_id", "text")
      val exact = Dedup.jaccardPathFor(corpus, "doc_id", "text", sampleMod = 1)
      val sampled = Dedup.jaccardPathFor(corpus, "doc_id", "text", sampleMod = 4)
      // construction sanity: the exact decision is the intended side
      val expected = if (low) Dedup.JaccardExact else Dedup.JaccardPrefix
      exact == expected && sampled == exact
    }
}
