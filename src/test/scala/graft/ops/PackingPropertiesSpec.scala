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
}
