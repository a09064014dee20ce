package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the winnowing fingerprint family (Schleimer et al. 2003):
  * the native expression against an independently written O(m·w)
  * reference, the paper's coverage theorem as a randomized property,
  * the selection-density bound, and the MOSS copy-pair report.
  */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent reference: xxhash64(seed 42) per token, FNV-prime
    * polynomial window hash re-walked per window (no rolling), then for
    * every window of `w` consecutive window-hashes the minimum with the
    * RIGHTMOST tie, deduplicated consecutively.
    */
  private def winnowRef(toks: Seq[String], k: Int, w: Int): Seq[(Int, Long)] = {
    if (toks.length < k) return Seq.empty
    val tokHash = toks.map { t =>
      val b = org.apache.spark.unsafe.types.UTF8String.fromString(t)
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(b.getBaseObject, b.getBaseOffset, b.numBytes, 42L)
    }
    val m = toks.length - k + 1
    val h = (0 until m).map { s =>
      var acc = 0L
      (s until s + k).foreach(i => acc = acc * 0x100000001b3L + tokHash(i))
      acc
    }
    val effWin = math.min(w, m)
    val sel = (0 to m - effWin).map { lo =>
      var best = lo
      ((lo + 1) until (lo + effWin)).foreach(i => if (h(i) <= h(best)) best = i)
      best
    }.distinct
    sel.map(p => (p, h(p)))
  }

  private def runNative(toks: Seq[String], k: Int, w: Int): Seq[(Int, Long)] =
    Seq(Tuple1(toks)).toDF("t")
      .select(explode(graft.functions.GraftFunctions.winnow(col("t"), k, w)).as("f"))
      .select("f.pos", "f.fp").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq

  test("native winnow ≡ independent reference over random corpora (incl. short docs)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 40) {
      val n = rnd.nextInt(30) // 0..29 tokens: shorter than k, shorter than w, longer
      val vocab = Seq("a", "b", "c", "d", "e")
      val toks = Seq.fill(n)(vocab(rnd.nextInt(vocab.length)))
      val k = 1 + rnd.nextInt(3)
      val w = 1 + rnd.nextInt(5)
      val got = runNative(toks, k, w)
      val want = winnowRef(toks, k, w)
      assert(got === want, s"trial $trial toks=$toks k=$k w=$w")
      // selected positions strictly increase (the deque invariant)
      assert(got.map(_._1) === got.map(_._1).sorted.distinct)
    }
  }

  test("coverage theorem: a shared run of window+k-1 tokens shares a fingerprint") {
    val k = 3; val w = 4
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 30) {
      // two random docs over DISJOINT vocabularies + one shared run of
      // exactly w+k-1 tokens from a third vocabulary, planted anywhere
      val shared = Seq.fill(w + k - 1)("s" + rnd.nextInt(50))
      def doc(prefixVocab: String): Seq[String] = {
        val pre = Seq.fill(rnd.nextInt(15))(prefixVocab + rnd.nextInt(30))
        val post = Seq.fill(rnd.nextInt(15))(prefixVocab + rnd.nextInt(30))
        pre ++ shared ++ post
      }
      val fa = winnowRef(doc("x"), k, w).map(_._2).toSet
      val fb = winnowRef(doc("y"), k, w).map(_._2).toSet
      assert(fa.intersect(fb).nonEmpty,
        s"trial $trial: shared ${w + k - 1}-token run produced no shared fingerprint")
    }
  }

  test("density: each selection survives at most `window` windows (count lower bound)") {
    val toks = Seq.tabulate(500)(i => "t" + (i * 31 % 499)) // long, near-distinct
    val k = 4; val w = 8
    val got = runNative(toks, k, w)
    val m = toks.length - k + 1
    val nWindows = m - w + 1
    assert(got.size >= nWindows / w,
      s"${got.size} selections cannot cover $nWindows windows at persistence ≤ $w")
    assert(got.size <= nWindows, "more selections than windows")
  }

  test("winnowCopyPairs: planted copy found, boilerplate posting cap drops degenerate fp") {
    val copied = (0 until 12).map("c" + _).mkString(" ")
    val docs = Seq(
      (1L, "x1 x2 x3 " + copied + " x4 x5"),
      (2L, "y1 y2 " + copied + " y3 y4 y5 y6"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowCopyPairs(docs, "doc_id", "text",
        k = 3, window = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
    // a fingerprint present in EVERY doc is boilerplate: maxPosting = 2
    // drops its posting whole, so a pair sharing ONLY boilerplate vanishes
    val boiler = (0 until 12).map("b" + _).mkString(" ")
    val many = Seq(
      (1L, boiler + " a1 a2 a3"), (2L, boiler + " a4 a5 a6"),
      (3L, boiler + " a7 a8 a9"), (4L, boiler + " b1 b2 b3"))
      .toDF("doc_id", "text")
    val capped = TextAnalysis.winnowCopyPairs(many, "doc_id", "text",
        k = 3, window = 4, minShared = 1, maxPosting = 2)
      .collect()
    assert(capped.isEmpty, s"boilerplate-only pairs survived the posting cap")
  }
}
