package graft.ops

import graft.TestSpark
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for greedy sequence packing over random
  * corpora — sweeps the id/token-count space the example suite can't.
  * Few samples, real Spark jobs: each case is one job.
  */
object PackingPropertiesSpec extends Properties("graft.packing") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 60)
    ids <- Gen.listOfN(n, Gen.choose(0L, 1000000L)).map(_.distinct)
    toks <- Gen.listOfN(ids.length, Gen.choose(1L, 900L))
  } yield ids.zip(toks)

  property("exactly-once, budget respected, determinism — any corpus/budget/partitions") =
    forAll(corpus, Gen.choose(100L, 600L), Gen.choose(1, 4)) { (rows, budget, parts) =>
      val df = rows.toDF("doc_id", "n_tokens")
      def run() = Packing.packGreedy(df, "doc_id", "n_tokens", budget, parts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val out = run()
      val exactlyOnce = out.map(_._1).toSet == rows.map(_._1).toSet &&
        out.length == rows.length
      val binSums = out.groupBy(_._2).view.mapValues(es => (es.length, es.map(_._3).sum))
      val budgetOk = binSums.values.forall { case (nDocs, total) =>
        total <= budget || nDocs == 1
      }
      val deterministic = run().toSet == out.toSet
      exactlyOnce && budgetOk && deterministic
    }

  private val textCorpus: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(0, 30)
    ids <- Gen.listOfN(n, Gen.choose(0L, 100000L)).map(_.distinct)
    texts <- Gen.listOfN(ids.length, for {
      k <- Gen.choose(0, 40)
      ws <- Gen.listOfN(k, Gen.oneOf("a", "bb", "ccc", "dddd", "x1"))
    } yield ws.mkString(" "))
  } yield ids.zip(texts)

  property("concatChunks conserves tokens and fills every block but the last — any corpus/blockSize") =
    forAll(textCorpus, Gen.choose(1, 16)) { (rows, bs) =>
      val df = rows.toDF("doc_id", "text")
      val out = Packing.concatChunks(df, "doc_id", "text", bs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val perDoc = out.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val want = rows.map { case (id, t) =>
        id -> t.split(" ").count(_.nonEmpty).toLong
      }.filter(_._2 > 0).toMap
      val conserve = perDoc == want
      val blocks = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val full = blocks.isEmpty || {
        val last = blocks.keys.max
        blocks.forall { case (b, t) => b == last || t == bs.toLong } &&
          blocks.keys.toSet == (0L to last).toSet
      }
      conserve && full
    }

  property("slidingChunks covers every token exactly under stride=window; overlap otherwise bounded") =
    forAll(textCorpus, Gen.choose(1, 8)) { (rows, w0 ) =>
      val df = rows.toDF("doc_id", "text")
      val stride = math.max(1, w0 / 2 + 1)
      val out = Packing.slidingChunks(df, "doc_id", "text", w0, stride)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      out.forall { case (id, cid, chunk, nt) =>
        val toks = rows.toMap.apply(id).split(" ").filter(_.nonEmpty)
        val s = (cid * stride).toInt
        val want = toks.slice(s, s + w0)
        chunk.split(" ").filter(_.nonEmpty).toSeq == want.toSeq &&
          nt == want.length.toLong
      }
    }
}
