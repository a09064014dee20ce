package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed range join ≡ naive theta join, every qualifying pair exactly once") {
    val rnd = new scala.util.Random(3)
    val left = Seq.tabulate(300)(i =>
      (i.toLong, (i % 7).toLong, rnd.nextInt(2000).toLong - 500))
      .toDF("lid", "k", "lts")
    val right = Seq.tabulate(300)(i =>
      (i.toLong + 1000, (i % 7).toLong, rnd.nextInt(2000).toLong - 500))
      .toDF("rid", "k", "rts")
    val got = RangeJoin.byBucket(left, right, Seq("k"), "lts", "rts", 50L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = left.as("a").join(right.as("b"),
        col("a.k") === col("b.k") && abs(col("a.lts") - col("b.rts")) <= 50)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq === naive.sorted.toSeq)
    // exactly once: no pair duplicated by the 3-bin replication
    assert(got.length === got.distinct.length)
    assert(naive.nonEmpty, "fixture produced no in-range pairs")
  }

  test("boundaries: |Δ| = tolerance included, tolerance+1 excluded; negative bins floor correctly") {
    val left = Seq((1L, 0L, -100L), (2L, 0L, 0L)).toDF("lid", "k", "lts")
    val right = Seq((10L, 0L, -130L), (11L, 0L, -131L), (12L, 0L, 30L), (13L, 0L, 31L))
      .toDF("rid", "k", "rts")
    val got = RangeJoin.byBucket(left, right, Seq("k"), "lts", "rts", 30L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 12L)))
  }

  test("plan is an equi-join — no nested loop, no cartesian — and collisions are rejected") {
    val left = Seq((1L, 0L, 0L)).toDF("lid", "k", "lts")
    val right = Seq((2L, 0L, 1L)).toDF("rid", "k", "rts")
    val plan = RangeJoin.byBucket(left, right, Seq("k"), "lts", "rts", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a non-equi plan:\n$plan")
    intercept[IllegalArgumentException] {
      RangeJoin.byBucket(left, right.withColumnRenamed("rid", "lid"),
        Seq("k"), "lts", "rts", 10L)
    }
  }

  test("interval overlap ≡ naive theta join, each pair exactly once (incl. multi-bucket spans)") {
    val rnd = new scala.util.Random(11)
    // spans up to 120 over bucketWidth 50 → intervals covering 1–4 buckets,
    // so the first-intersection-bin dedup is genuinely exercised
    val left = Seq.tabulate(250) { i =>
      val s = rnd.nextInt(2000).toLong - 500
      (i.toLong, (i % 5).toLong, s, s + rnd.nextInt(120))
    }.toDF("lid", "k", "ls", "le")
    val right = Seq.tabulate(250) { i =>
      val s = rnd.nextInt(2000).toLong - 500
      (i.toLong + 1000, (i % 5).toLong, s, s + rnd.nextInt(120))
    }.toDF("rid", "k", "rs", "re")
    val got = RangeJoin.intervalOverlap(left, right, Seq("k"),
        "ls", "le", "rs", "re", bucketWidth = 50L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = left.as("a").join(right.as("b"),
        col("a.k") === col("b.k") &&
          col("a.ls") <= col("b.re") && col("b.rs") <= col("a.le"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq === naive.sorted.toSeq)
    assert(got.length === got.distinct.length, "a pair met in more than one bin")
    assert(naive.nonEmpty, "fixture produced no overlapping pairs")
  }

  test("interval overlap boundaries: touching endpoints join (closed), gap of 1 does not; nested and identical intervals join once") {
    val left = Seq(
      (1L, 0L, 100L),   // touches r10's start exactly
      (2L, 200L, 210L), // gap of 1 before r11
      (3L, 300L, 400L), // contains r12 entirely
      (4L, 500L, 510L)) // identical to r13
      .toDF("lid", "ls", "le")
    val right = Seq(
      (10L, 100L, 150L),
      (11L, 211L, 220L),
      (12L, 320L, 330L),
      (13L, 500L, 510L))
      .toDF("rid", "rs", "re")
    val got = RangeJoin.intervalOverlap(left, right, Seq.empty,
        "ls", "le", "rs", "re", bucketWidth = 64L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (3L, 12L), (4L, 13L)))
  }

  test("interval overlap guards: equi-join plan, reserved/collision names, empty interval and span cap raise") {
    val left = Seq((1L, 0L, 10L)).toDF("lid", "ls", "le")
    val right = Seq((2L, 5L, 15L)).toDF("rid", "rs", "re")
    val plan = RangeJoin.intervalOverlap(left, right, Seq.empty,
        "ls", "le", "rs", "re", bucketWidth = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join degenerated to a non-equi plan:\n$plan")
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(left.withColumn("_rj_bin", lit(1)), right,
        Seq.empty, "ls", "le", "rs", "re", 10L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(left, right.withColumnRenamed("rid", "lid"),
        Seq.empty, "ls", "le", "rs", "re", 10L)
    }
    val emptyIv = Seq((1L, 10L, 0L)).toDF("lid", "ls", "le")
    val e1 = intercept[Exception] {
      RangeJoin.intervalOverlap(emptyIv, right, Seq.empty,
        "ls", "le", "rs", "re", 10L).collect()
    }
    assert(e1.getMessage.contains("empty interval"), e1.getMessage)
    val wide = Seq((1L, 0L, 1000000L)).toDF("lid", "ls", "le")
    val e2 = intercept[Exception] {
      RangeJoin.intervalOverlap(wide, right, Seq.empty,
        "ls", "le", "rs", "re", 10L, maxBucketsPerRow = 100).collect()
    }
    assert(e2.getMessage.contains("buckets"), e2.getMessage)
  }
}
