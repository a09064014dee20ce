package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExpectationsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import Expectations._

  lazy val dim = Seq((1L, "x"), (2L, "y")).toDF("id", "v")

  test("each check counts exactly its violations; report preserves checklist order") {
    val df = Seq(
      (Some(1L), Some(5.0), "A", "abc"),
      (Some(1L), Some(500.0), "Z", "abc"),   // range + accepted violations
      (None, Some(5.0), "A", "ab"),          // null key + regex violation
      (Some(3L), None, "A", "abc"))          // fk violation (3 not in dim)
      .toDF("k", "q", "flag", "s")
    val rep = Expectations.validate(df, Seq(
      NotNull("k"),
      InRange("q", 0.0, 100.0),
      Accepted("flag", Seq("A", "B")),
      Matches("s", "abc"), // anchored full match: "ab" must fail
      Unique(Seq("k")),
      ForeignKey(Seq("k"), dim, Seq("id"), "dim")))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(3)))
    assert(rep.map(_._1).toSeq === Seq("not_null(k)",
      "in_range(q, 0.0, 100.0)", "accepted(flag)", "matches(s)",
      "unique(k)", "foreign_key(k -> dim)"))
    val byName = rep.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byName("not_null(k)") === ((1L, false)))
    assert(byName("in_range(q, 0.0, 100.0)") === ((1L, false)))
    assert(byName("accepted(flag)") === ((1L, false)))
    assert(byName("matches(s)") === ((1L, false)))   // "ab" fails full match
    assert(byName("unique(k)") === ((1L, false)))    // two k=1 rows → 1 extra
    assert(byName("foreign_key(k -> dim)") === ((1L, false))) // k=3; null k skipped
  }

  test("NotNull tolerance, regex anchoring, all-green table") {
    val df = Seq((Some(1L), "AB"), (None, "CD"), (Some(2L), "EF"),
      (Some(3L), "GH")).toDF("k", "s")
    // 25% nulls pass a 0.25 tolerance, fail a 0.2 one
    val rep = Expectations.validate(df, Seq(
      NotNull("k", maxNullFrac = 0.25),
      NotNull("k", maxNullFrac = 0.2))).collect()
    assert(rep(0).getBoolean(3) === true)
    // same check name at two thresholds collapses in the name map —
    // document by asserting the stricter row exists with the count
    assert(rep.forall(_.getLong(2) === 1L))
    // rlike is anchored: "AB" must not pass a pattern matching "A"
    val anch = Expectations.validate(df.na.drop(), Seq(Matches("s", "A")))
      .head()
    assert(anch.getLong(2) === 3L) // none of AB/EF/GH fully match "A"
    val green = Expectations.validate(df.na.drop(), Seq(
      NotNull("k"), Unique(Seq("k")),
      ForeignKey(Seq("k"), Seq(1L, 2L, 3L).toDF("id"), Seq("id"), "ids")))
    assert(green.collect().forall(_.getBoolean(3)))
    intercept[IllegalArgumentException] {
      Expectations.validate(df, Nil)
    }
  }

  test("streaming monitor: appended micro-batch counts re-sum to the batch validate; redelivery no-ops; global checks refused") {
    val checks = Seq(
      NotNull("k", 0.5),
      NotNull("k"),
      InRange("q", 0.0, 100.0),
      Matches("s", "ab.*"))
    val df = Seq(
      (Some(1L), Some(5.0), "abc"),
      (None, Some(500.0), "abc"),
      (Some(2L), Some(50.0), "xyz"),
      (None, Some(7.0), "abz"))
      .toDF("k", "q", "s")
    val path = java.nio.file.Files
      .createTempDirectory("graft-exstream").toString + "/rep"
    // three slices arriving as micro-batches (one empty — conditional
    // sums over empty slices must append zeros, not NULLs)
    val slices = Seq(
      df.filter($"q" < 10.0), df.filter($"q" >= 10.0), df.limit(0))
    slices.zipWithIndex.foreach { case (b, i) =>
      assert(graft.streaming.ExpectationsStream.appendBatch(
        b, i.toLong, checks, path, streamId = "ex1"))
    }
    // redelivery of batch 1 is a ledgered no-op
    assert(!graft.streaming.ExpectationsStream.appendBatch(
      slices(1), 1L, checks, path, streamId = "ex1"))

    val want = Expectations.validate(df, checks)
      .collect().toSeq.map(_.toSeq)
    val got = graft.streaming.ExpectationsStream
      .readReport(spark, path, checks)
      .collect().toSeq.map(_.toSeq)
    assert(got === want)
    // the tolerant NotNull passes on TOTALS (2/4 ≤ 0.5) even though
    // batch 2 alone was 100% null — thresholds judge the re-sum,
    // never a single slice
    assert(got.find(_.head == "not_null(k, 0.5)").get(3) === true)
    assert(got.find(_.head == "not_null(k)").get(3) === false)

    val ex = intercept[IllegalArgumentException] {
      Expectations.rowLocalReport(df, Seq(Unique(Seq("k"))))
    }
    assert(ex.getMessage.contains("batch-only"))
    // a check added to the list AFTER batches landed surfaces as an
    // explicit zero-observation row, never silently vanishing
    val extended = checks :+ Accepted("s", Seq("abc"))
    val ext = graft.streaming.ExpectationsStream
      .readReport(spark, path, extended)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(ext("accepted(s)") === ((0L, 0L, true)))
    // duplicate names refused on the streaming compiler too
    val dup = intercept[IllegalArgumentException] {
      Expectations.rowLocalReport(df, Seq(NotNull("k"), NotNull("k")))
    }
    assert(dup.getMessage.contains("duplicate"))
  }

  test("corpus contracts: the generator's known dirty facts are caught, clean facts pass") {
    val li = graft.Tables.load(spark, graft.TestSpark.Sf001, "lineitem")
    val o = graft.Tables.load(spark, graft.TestSpark.Sf001, "orders")
    val rep = Expectations.validate(li, Seq(
      InRange("l_quantity", 1.0, 50.0),
      Unique(Seq("l_orderkey", "l_linenumber")),
      ForeignKey(Seq("l_orderkey"), o, Seq("o_orderkey"), "orders")))
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(rep("in_range(l_quantity, 1.0, 50.0)"))
    assert(!rep("unique(l_orderkey, l_linenumber)"),
      "the generator does NOT keep this tuple unique — must be caught")
    assert(rep("foreign_key(l_orderkey -> orders)"))
  }
}
