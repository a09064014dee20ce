package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BasketsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pairAffinity: hand fixture — counts, both confidences, lift; duplicate basket lines collapse") {
    // baskets: 1:{x,y,z} 2:{x,y} 3:{x} 4:{y,w} — w appears once, pruned;
    // (x,y) co-occurs twice; x support 3, y support 3; 4 baskets.
    val df = Seq((1L, "x"), (1L, "x"), (1L, "y"), (1L, "z"),
      (2L, "x"), (2L, "y"), (3L, "x"), (4L, "y"), (4L, "w"))
      .toDF("b", "it")
    val got = Baskets.pairAffinity(df, "b", "it")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)),
          (r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8))))
      .toMap
    // only (x,y) reaches minPairCount=2: z and w are singles
    assert(got.keySet === Set(("x", "y")))
    val ((na, nb, nab), (supp, cab, cba, lift)) = got(("x", "y"))
    assert((na, nb, nab) === ((3L, 3L, 2L)))
    assert(supp === 0.5) // 2 of 4 baskets
    assert(math.abs(cab - 0.666667) < 1e-9 && math.abs(cba - 0.666667) < 1e-9)
    assert(math.abs(lift - 0.888889) < 1e-9) // 4*2/(3*3)
  }

  test("pairAffinity: mega-baskets past the cap are dropped whole; guards fail fast") {
    val mega = (1 to 60).map(i => (1L, s"m$i")) ++
      Seq((2L, "a"), (2L, "b"), (3L, "a"), (3L, "b"))
    val df = mega.toDF("b", "it")
    val got = Baskets.pairAffinity(df, "b", "it", maxBasketItems = 50)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("a", "b"))) // the mega basket contributed nothing
    intercept[IllegalArgumentException] {
      Baskets.pairAffinity(df, "b", "it", minPairCount = 0)
    }
    intercept[IllegalArgumentException] {
      Baskets.pairAffinity(df, "b", "it", maxBasketItems = 1)
    }
  }

  test("pairAffinity: equals the quadratic ground truth on the lineitem corpus") {
    val li = Tables.load(spark, TestSpark.Sf001, "lineitem")
    val got = Baskets.pairAffinity(li, "l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)), r.getDouble(8))).toMap
    // brute: every distinct (basket, item), all pairs, no prune
    val items = li.select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nBaskets = items.map(_._1).distinct.length.toDouble
    val supp = items.groupBy(_._2).map { case (it, xs) => it -> xs.length.toLong }
    val want = items.groupBy(_._1).values.flatMap { xs =>
      val is = xs.map(_._2).sorted
      for (i <- is.indices; j <- (i + 1) until is.length)
        yield (is(i), is(j))
    }.groupBy(identity).collect { case (p, occ) if occ.size >= 2 =>
      p -> ((supp(p._1), supp(p._2), occ.size.toLong),
        BigDecimal(nBaskets * occ.size / (supp(p._1) * supp(p._2)).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    assert(got.keySet === want.keySet && got.nonEmpty)
    want.foreach { case (p, (counts, lift)) =>
      assert(got(p)._1 === counts, s"pair $p counts")
      assert(math.abs(got(p)._2 - lift) <= 1e-9, s"pair $p lift")
    }
  }
}
