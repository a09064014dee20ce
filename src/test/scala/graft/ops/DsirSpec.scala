package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance weights (q119): the distributed paths against an
  * in-memory reference, the hashed production path against the exact
  * oracle-carrying path, and the resampling direction itself.
  */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** In-memory reference: same add-one smoothing, same top-V cap with
    * (count desc, feature asc) ties, independent arithmetic path.
    */
  private def localDsir(
      docs: Seq[(Long, String)],
      isTarget: Long => Boolean,
      vocabSize: Int): Map[Long, Double] = {
    def feats(t: String): Seq[String] = {
      val w = t.split(" ", -1)
      if (w.length < 2) Seq.empty
      else w.init.zip(w.tail).map { case (a, b) => s"$a $b" }.toSeq
    }
    val perDoc = docs.map { case (id, t) =>
      id -> feats(t).groupBy(identity).map { case (f, g) => f -> g.size.toLong }
    }.filter(_._2.nonEmpty)
    val raw = perDoc.flatMap(_._2).groupBy(_._1).map { case (f, g) => f -> g.map(_._2).sum }
    val vocab = raw.toSeq.sortBy { case (f, c) => (-c, f) }.take(vocabSize).toMap
    val tgt = perDoc.filter(p => isTarget(p._1)).flatMap(_._2)
      .groupBy(_._1).map { case (f, g) => f -> g.map(_._2).sum }
    val traw = vocab.values.sum.toDouble
    // .toSeq first: mapping over the key SET would dedupe equal counts
    val ttgt = vocab.keys.toSeq.map(f => tgt.getOrElse(f, 0L)).sum.toDouble
    val vn = vocab.size.toDouble
    val ratio = vocab.map { case (f, craw) =>
      f -> (math.log((tgt.getOrElse(f, 0L) + 1) / (ttgt + vn)) -
        math.log((craw + 1) / (traw + vn)))
    }
    perDoc.flatMap { case (id, fc) =>
      val terms = fc.collect { case (f, c) if vocab.contains(f) => c * ratio(f) }
      if (terms.isEmpty) None else Some(id -> terms.sum)
    }.toMap
  }

  private val tiny = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the cat sat on a hat"),
    (2L, "stock market crash wipes gains"),
    (3L, "market crash hits the bank"),
    (4L, "the dog sat on the mat"),
    (5L, "bank gains wipe out the crash"))

  test("exact path matches the in-memory reference (capped and uncapped vocab)") {
    val df = tiny.toDF("doc_id", "text")
    for (v <- Seq(4, 1000)) {
      val got = TextAnalysis.dsirWeights(df, "doc_id", "text", $"doc_id" < 2, v)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = localDsir(tiny, _ < 2, v)
      assert(got.keySet === want.keySet, s"vocabSize=$v row set")
      got.foreach { case (id, w) =>
        assert(math.abs(w - want(id)) < 5e-4, // got is rounded to 4 digits
          s"vocabSize=$v doc $id: got $w want ${want(id)}")
      }
    }
  }

  test("hashed path == exact path when no bigrams collide") {
    val docs = graft.Tables.load(spark, TestSpark.Sf001, "documents")
      .limit(200).cache()
    val feats = docs.filter(size(split($"text", " ")) >= 2)
      .select(explode(zip_with(
        slice(split($"text", " "), lit(1), size(split($"text", " ")) - 1),
        slice(split($"text", " "), lit(2), size(split($"text", " ")) - 1),
        (a, b) => concat_ws(" ", a, b))).as("f"))
    val buckets = 1L << 40
    val nFeats = feats.select("f").distinct().count()
    val nBuckets = feats
      .select(pmod(xxhash64($"f"), lit(buckets)).as("h"))
      .distinct().count()
    assert(nFeats === nBuckets, "test precondition: hash collisions at 2^40 buckets")
    val pred = $"doc_id" % 5 === 0
    val exact = TextAnalysis.dsirWeights(docs, "doc_id", "text", pred, 1 << 30)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hashed = TextAnalysis.dsirWeightsHashed(docs, "doc_id", "text", pred, buckets)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hashed.keySet === exact.keySet)
    exact.foreach { case (id, w) =>
      assert(math.abs(hashed(id) - w) <= 1e-4 + 1e-9, // both rounded to 4 digits
        s"doc $id: hashed ${hashed(id)} vs exact $w")
    }
    docs.unpersist()
  }

  test("weights rank target-like docs above off-domain docs") {
    // Target = finance docs 2,3,5; doc 4 is cat-domain, never in target.
    val df = tiny.toDF("doc_id", "text")
    val w = TextAnalysis.dsirWeights(df, "doc_id", "text",
        $"doc_id".isin(2L, 3L, 5L), 1000)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val financeMin = Seq(2L, 3L, 5L).map(w).min
    val catMax = Seq(0L, 1L, 4L).map(w).max
    assert(financeMin > catMax,
      s"finance docs ($financeMin) should outweigh cat docs ($catMax)")
  }

  test("resample: deterministic per seed, without replacement, seed-sensitive, weight-biased") {
    val df = tiny.toDF("doc_id", "text")
    def sel(seed: Long, n: Int = 3): Seq[Long] =
      TextAnalysis.dsirResample(df, "doc_id", "text",
          $"doc_id".isin(2L, 3L, 5L), n = n, vocabSize = 1000, seed = seed)
        .collect().map(_.getLong(0)).toSeq
    assert(sel(1L) === sel(1L), "same seed, same sample")
    assert(sel(1L).distinct.size === 3, "without replacement")
    // sampling ∝ exp(weight): the high-weight finance docs (targets)
    // dominate the draws over the cat docs
    val counts = (1L to 20L).map(s => sel(s).toSet).flatten
      .groupBy(identity).view.mapValues(_.size)
    val fin = Seq(2L, 3L, 5L).map(counts.getOrElse(_, 0)).sum
    val cat = Seq(0L, 1L, 4L).map(counts.getOrElse(_, 0)).sum
    assert(fin > cat, s"finance draws $fin should beat cat draws $cat")
    // seed sensitivity needs weights the noise can actually move:
    // equal-weight docs (identical text) make the pick pure noise —
    // different seeds must then rotate the selected set
    val flat = (0L to 7L).map(i => (i, "one single common text for everyone"))
      .toDF("doc_id", "text")
    val flatDraws = (1L to 12L).map { s =>
      TextAnalysis.dsirResample(flat, "doc_id", "text",
          $"doc_id" < 4, n = 3, vocabSize = 1000, seed = s)
        .collect().map(_.getLong(0)).toSet
    }
    assert(flatDraws.distinct.size > 1, "seeds must change an all-ties sample")
  }

  test("single-bucket hashing degenerates to all-zero weights (full collision)") {
    val df = tiny.toDF("doc_id", "text")
    val w = TextAnalysis.dsirWeightsHashed(df, "doc_id", "text", $"doc_id" < 2, 1L)
      .collect().map(_.getDouble(1))
    assert(w.nonEmpty && w.forall(_ === 0.0),
      "one bucket => p_tgt == p_raw == 1 => every log-ratio 0")
  }
}
