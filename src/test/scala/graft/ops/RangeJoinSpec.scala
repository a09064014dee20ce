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
}
