package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties over random token streams — the invariants the
  * example-based suites can't sweep. Batched: each property collects its
  * random inputs into ONE DataFrame pass (a Spark job per sample would
  * take minutes).
  */
object TextPropertiesSpec extends Properties("graft.text") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val token: Gen[String] = Gen.choose(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val doc: Gen[List[String]] = Gen.choose(0, 40).flatMap(Gen.listOfN(_, token))

  private def once[A](docs: Seq[List[String]])(f: org.apache.spark.sql.DataFrame => A): A =
    f(docs.map(d => Tuple1(d.toArray)).toDF("t"))

  property("native shingles ≡ composable, as sets, any token stream") =
    forAll(Gen.listOfN(30, doc)) { docs =>
      once(docs) { df =>
        df.select(
            array_sort(graft.functions.GraftFunctions.shingles(col("t"), 3)).as("a"),
            array_sort(array_distinct(TextFunctions.shinglesComposable(col("t"), 3))).as("b"))
          .filter(col("a") =!= col("b")).count() == 0L
      }
    }

  property("jaccard of a set with itself is 1; with disjoint is 0") =
    forAll(Gen.nonEmptyListOf(token)) { toks =>
      val distinct = toks.distinct
      val disjoint = distinct.map(_ + "9") // '9' never in alpha tokens
      val r = Seq((distinct.toArray, distinct.toArray, disjoint.toArray))
        .toDF("a", "b", "c")
        .select(
          TextFunctions.jaccard(col("a"), col("b")).as("self"),
          TextFunctions.jaccard(col("a"), col("c")).as("disj"))
        .head()
      r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0
    }

  property("polyFingerprint stays in [0, 1e9+7) and is order-sensitive for length-permuted docs") =
    forAll(Gen.listOfN(20, doc.suchThat(_.nonEmpty))) { docs =>
      once(docs) { df =>
        val fps = df.select(TextFunctions.polyFingerprint(col("t")).as("fp"))
          .collect().map(_.getLong(0))
        fps.forall(f => f >= 0 && f < 1000000007L)
      }
    }

  property("simhash of identical token arrays is identical; minhash length is as requested") =
    forAll(doc.suchThat(_.nonEmpty), Gen.choose(1, 32)) { (d, h) =>
      val r = Seq((d.toArray, d.toArray)).toDF("a", "b")
        .select(Dedup.simhash(col("a")).as("sa"), Dedup.simhash(col("b")).as("sb"),
          size(Dedup.minhashSignature(col("a"), h)).as("mh"))
        .head()
      r.getLong(0) == r.getLong(1) && r.getInt(2) == h
    }

  property("spanCorruption splices back to the original for any random corpus/seed") =
    forAll(Gen.choose(0, 12).flatMap(Gen.listOfN(_, doc)), Gen.choose(0L, 1000L)) {
      (ds, seed) =>
        val rows = ds.zipWithIndex.map { case (d, i) => (i.toLong, d.mkString(" ")) }
        val df = rows.toDF("doc_id", "text")
        val sentinel = "<extra_id_\\d+>".r
        val out = TextAnalysis.spanCorruption(df, "doc_id", "text", seed = seed)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        out.forall { case (id, inp, tgt) =>
          val spans = scala.collection.mutable.Map[String, Vector[String]]()
          var cur: String = null
          tgt.split(" ").filter(_.nonEmpty).foreach { w =>
            if (sentinel.pattern.matcher(w).matches()) { cur = w; spans(cur) = Vector() }
            else spans(cur) :+= w
          }
          val spliced = inp.split(" ").filter(_.nonEmpty).flatMap { w =>
            if (sentinel.pattern.matcher(w).matches()) spans(w) else Vector(w)
          }.toSeq
          spliced == rows.toMap.apply(id).split(" ").filter(_.nonEmpty).toSeq
        } && out.length == rows.count(_._2.split(" ").exists(_.nonEmpty))
    }
}
