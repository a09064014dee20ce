package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FeaturesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decayedActivity: hand-computed half-life terms, recency, reference = newest event") {
    val ref = 1700000000L
    val h = 3600L
    val df = Seq(
      (1L, ref),            // term 1.0
      (1L, ref - 24 * h),   // one half-life → 0.5
      (1L, ref - 48 * h),   // two → 0.25
      (2L, ref - 12 * h))   // 2^-0.5 ≈ 0.707107
      .toDF("user_id", "sec")
      .select($"user_id", timestamp_seconds($"sec").as("ts"))
    val got = Features.decayedActivity(df, "user_id", "ts", halfLifeHours = 24.0)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1L, 3L, 0L, 1.75),
      (2L, 1L, 12 * h, 0.7071)))
  }

  test("decayedActivity rejects a non-positive half-life") {
    val df = Seq((1L, 0L)).toDF("user_id", "sec")
      .select($"user_id", timestamp_seconds($"sec").as("ts"))
    intercept[IllegalArgumentException] {
      Features.decayedActivity(df, "user_id", "ts", halfLifeHours = 0.0)
    }
  }

  test("eventSequences: exact order with tie-break; physical partitioning never changes the sequence") {
    val df = Seq(
      (1L, 100L, 2L, "b"), (1L, 100L, 1L, "a"), // ts tie → event_id order
      (1L, 50L, 9L, "z"),
      (2L, 10L, 3L, "only"))
      .toDF("user_id", "sec", "event_id", "event_type")
      .select($"user_id", timestamp_seconds($"sec").as("ts"),
        $"event_id", $"event_type")
    def run(d: org.apache.spark.sql.DataFrame) =
      Features.eventSequences(d, Seq("user_id"), Seq("ts", "event_id"), "event_type")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val got = run(df)
    assert(got(1L) === (("z a b", 3L)))
    assert(got(2L) === (("only", 1L)))
    assert(run(df.repartition(7)) === got)
    intercept[IllegalArgumentException] {
      Features.eventSequences(df, Nil, Seq("ts"), "event_type")
    }
  }

  test("eventTransitions: pairs respect order and never cross groups; singleton groups vanish") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), // a→b, b→a
      (2L, 1L, "x"),                               // singleton: nothing
      (3L, 5L, "b"), (3L, 9L, "b"))                // b→b
      .toDF("g", "ord", "tok")
    val got = Features.eventTransitions(df, Seq("g"), Seq("ord"), "tok")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("a", "b") -> 1L, ("b", "a") -> 1L, ("b", "b") -> 1L))
    // corpus: total transitions = total events - number of groups
    val ev = graft.Tables.load(spark, TestSpark.Sf001, "events")
      .withColumn("day", to_date(col("ts")))
    val t = Features.eventTransitions(ev, Seq("user_id", "day"),
      Seq("ts", "event_id"), "event_type")
    val nT = t.agg(sum("n")).head().getLong(0)
    val nE = ev.count()
    val nG = ev.select("user_id", "day").distinct().count()
    assert(nT === nE - nG)
  }

  test("cohortRetention: hand fixture — Monday cohorts, gap weeks absent, rates exact") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // u1, u2 first seen week of Mon 2024-01-01; u3 the next week.
    // u1 active weeks 0 and 2 (gap at 1); u2 only week 0; u3 weeks 0, 1.
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-17 09:00:00")),
      (2L, ts("2024-01-05 23:59:59")),
      (3L, ts("2024-01-08 00:00:00")), (3L, ts("2024-01-18 12:00:00")))
      .toDF("user_id", "ts")
    val got = Features.cohortRetention(ev, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(("2024-01-01", 0L)) === ((2L, 2L, 1.0)))
    assert(got(("2024-01-01", 2L)) === ((2L, 1L, 0.5)))
    assert(!got.contains(("2024-01-01", 1L))) // nobody active that week
    assert(got(("2024-01-08", 0L)) === ((1L, 1L, 1.0)))
    assert(got(("2024-01-08", 1L)) === ((1L, 1L, 1.0)))
    assert(got.size === 4)
  }

  test("cohortRetention: corpus invariants — offset-0 rate is 1.0, cells bounded by cohort, cohorts partition users") {
    val ev = graft.Tables.load(spark, TestSpark.Sf001, "events")
    val got = Features.cohortRetention(ev, "user_id", "ts")
    val rows = got.collect().map(r => (r.getDate(0).toString, r.getLong(1),
      r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (cw, off, nc, na, rate) =>
      assert(off >= 0, s"$cw offset")
      assert(na <= nc, s"$cw/$off cell exceeds cohort")
      assert(math.abs(rate - BigDecimal(na.toDouble / nc)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) <= 1e-12)
      if (off == 0) assert(na === nc, s"$cw offset-0 must be the whole cohort")
    }
    val nUsers = ev.select("user_id").distinct().count()
    val cohortSum = rows.filter(_._2 == 0L).map(_._3).sum
    assert(cohortSum === nUsers, "cohort sizes must partition the user base")
  }

  test("conversionLag: first qualifying to-event at-or-after the first from; pre-from purchases don't count; non-converts keep NULLs") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: view @10:00, purchases @09:00 (before — ignored) and @10:30
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 09:00:00"), "purchase"),
      (1L, ts("2024-01-01 10:30:00"), "purchase"),
      // u2: view only — non-convert
      (2L, ts("2024-01-01 11:00:00"), "view"),
      // u3: purchase at the SAME instant as the view (>= is inclusive)
      (3L, ts("2024-01-01 12:00:00"), "view"),
      (3L, ts("2024-01-01 12:00:00"), "purchase"),
      // u4: purchase with no view at all — absent from the funnel
      (4L, ts("2024-01-01 13:00:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = Features.conversionLag(ev, "user_id", "ts", "event_type",
        "view", "purchase")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got === Map(1L -> 1800L, 2L -> -1L, 3L -> 0L))
    intercept[IllegalArgumentException] {
      Features.conversionLag(ev, "user_id", "ts", "event_type", "view", "view")
    }
  }
}
