package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck sweeps for the round-12 operator layer — the invariants
  * example suites can't enumerate. Batched like TextPropertiesSpec:
  * each sample list becomes ONE DataFrame pass.
  */
object Round12PropertiesSpec extends Properties("graft.round12") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val event: Gen[(Long, Option[String], Long, Long)] = for {
    k <- Gen.choose(1L, 5L)
    v <- Gen.option(Gen.oneOf("A", "B", "C"))
    ts <- Gen.choose(0L, 20L)
  } yield (k, v, ts, 0L)

  property("scd2: any change stream folds into a contiguous, one-current, no-echo version chain") =
    forAll(Gen.nonEmptyListOf(event)) { raw =>
      // unique seq per row for a deterministic order
      val ev = raw.zipWithIndex.map { case ((k, v, ts, _), i) => (k, v, ts, i.toLong) }
      val out = Scd2.fromChanges(ev.toDF("k", "v", "ts", "sq"),
          Seq("k"), "v", "ts", "sq")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getString(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
      val byKey = out.groupBy(_._1)
      val refVersions = ev.groupBy(_._1).map { case (k, es) =>
        val vs = es.sortBy(e => (e._3, e._4)).map(_._2)
        k -> (1 + vs.sliding(2).count(p => p.length == 2 && p(0) != p(1)))
      }
      byKey.forall { case (k, rows) =>
        val s = rows.sortBy(_._2)
        s.map(_._2).toSeq == (1L to s.length.toLong) &&       // contiguous
        s.count(_._6) == 1 && s.last._6 &&                    // one open current
        s.init.forall(_._5 != -1L) && s.last._5 == -1L &&
        s.sliding(2).forall {                                 // chain + no echo
          case Array(a, b) => a._5 == b._4 && a._3 != b._3
          case _ => true
        } &&
        s.length == refVersions(k)                            // change count
      } && byKey.keySet == ev.map(_._1).toSet
    }

  private val word: Gen[String] = Gen.choose(1, 5)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val text: Gen[String] = Gen.choose(1, 25)
    .flatMap(Gen.listOfN(_, word)).map(_.mkString(" "))

  property("rougeN: identity pair scores 1/1/1; overlap never exceeds either side; swap transposes p and r") =
    forAll(Gen.nonEmptyListOf(Gen.zip(text, text))) { ps =>
      val pairs = ps.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("id", "cand", "ref")
      val self = TextAnalysis.rougeN(
          pairs.select(col("id"), col("cand"), col("cand").as("ref")),
          "id", "cand", "ref")
        .collect().forall(r => r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0 &&
          r.getDouble(6) == 1.0)
      val fwd = TextAnalysis.rougeN(pairs, "id", "cand", "ref")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)),
            (r.getDouble(4), r.getDouble(5)))).toMap
      val rev = TextAnalysis.rougeN(
          pairs.select(col("id"), col("ref").as("cand"), col("cand").as("ref")),
          "id", "cand", "ref")
        .collect().map(r => r.getLong(0) -> (r.getDouble(4), r.getDouble(5))).toMap
      self &&
      fwd.forall { case (_, ((nc, nr, ov), _)) => ov <= nc && ov <= nr } &&
      fwd.forall { case (id, (_, (p, r))) => rev(id) == ((r, p)) }
    }

  property("countMin: estimates dominate exact counts for every key under any random multiset and 3-way split merge ≡ whole") =
    forAll(Gen.nonEmptyListOf(word)) { toks =>
      val df = toks.zipWithIndex.map { case (t, i) => (i % 3, t) }.toDF("part", "tok")
        .withColumn("g", lit("x"))
      val whole = Sketches.cmAgg(df, Seq("g"), "tok", width = 64)
      val merged = Sketches.cmMerge(
        (0 until 3).map(p => Sketches.cmAgg(df.filter(col("part") === p),
          Seq("g"), "tok", width = 64)).reduce(_ unionByName _), Seq("g"))
      def cells(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => (r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
      val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val est = Sketches.cmEstimate(whole,
          toks.distinct.map(t => ("x", t)).toDF("g", "tok"),
          Seq("g"), "tok", width = 64)
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      cells(whole) == cells(merged) &&
      exact.forall { case (t, c) => est(t) >= c }
    }
}
