package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fromChanges: hand fixture — runs collapse, re-opened value gets a NEW version, ties order by seq") {
    val ev = Seq(
      // K1: A A B B A -> 3 versions (A re-opens as version 3, not merged)
      (1L, "A", 10L, 1L), (1L, "A", 20L, 2L), (1L, "B", 30L, 3L),
      (1L, "B", 40L, 4L), (1L, "A", 50L, 5L),
      // K2: same-ts tie, seq decides X before Y
      (2L, "X", 10L, 1L), (2L, "Y", 10L, 2L))
      .toDF("k", "v", "ts", "sq")
    val got = Scd2.fromChanges(ev, Seq("k"), "v", "ts", "sq")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))).toMap
    assert(got((1L, 1L)) === (("A", 10L, 30L, false)))
    assert(got((1L, 2L)) === (("B", 30L, 50L, false)))
    assert(got((1L, 3L)) === (("A", 50L, -1L, true)))
    // tie: X's interval is zero-width [10, 10), Y is current
    assert(got((2L, 1L)) === (("X", 10L, 10L, false)))
    assert(got((2L, 2L)) === (("Y", 10L, -1L, true)))
    assert(got.size === 5)
  }

  test("fromChanges: null-safe value transitions version correctly") {
    val ev = Seq(
      (1L, Option.empty[String], 10L, 1L), (1L, Some("A"), 20L, 2L),
      (1L, Option.empty[String], 30L, 3L), (1L, Option.empty[String], 40L, 4L))
      .toDF("k", "v", "ts", "sq")
    val got = Scd2.fromChanges(ev, Seq("k"), "v", "ts", "sq")
      .orderBy("version").collect()
    assert(got.length === 3) // null, A, null (two trailing nulls collapse)
    assert(got(0).isNullAt(2) && got(1).getString(2) === "A" && got(2).isNullAt(2))
    assert(got(2).getBoolean(5))
  }

  test("fromChanges: orders corpus invariants — contiguous versions, chained intervals, one current, no same-value neighbors") {
    val orders = Tables.load(spark, TestSpark.Sf001, "orders")
      .select("o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
    val dim = Scd2.fromChanges(orders, Seq("o_custkey"),
      "o_orderstatus", "o_orderdate", "o_orderkey")
    val rows = dim.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getString(2), r.getAs[java.time.LocalDateTime](3),
      if (r.isNullAt(4)) null else r.getAs[java.time.LocalDateTime](4),
      r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (k, vs) =>
      val s = vs.sortBy(_._2)
      assert(s.map(_._2).toSeq === (1L to s.length.toLong), s"key $k versions")
      assert(s.count(_._6) === 1 && s.last._6, s"key $k current")
      s.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(a._5 === b._4, s"key $k interval chain")
        assert(a._3 !== b._3, s"key $k consecutive versions must differ")
        assert(a._4.compareTo(b._4) <= 0, s"key $k valid_from monotone")
      }
      assert(s.init.forall(_._5 != null) && s.last._5 == null, s"key $k open tail")
    }
    // version count ≡ number of value changes in the event stream
    val events = orders.collect().map(r => (r.getLong(0), r.getString(1),
      r.getAs[java.time.LocalDateTime](2), r.getLong(3)))
    val wantVersions = events.groupBy(_._1).map { case (k, es) =>
      val ordered = es.sortBy(e =>
        (e._3.toEpochSecond(java.time.ZoneOffset.UTC), e._4)).map(_._2)
      k -> (1 + ordered.sliding(2).count(p => p.length == 2 && p(0) != p(1)))
    }
    val gotVersions = rows.groupBy(_._1).map { case (k, vs) => k -> vs.length }
    assert(gotVersions === wantVersions)
  }

  test("pointInTime: facts land in the containing interval; zero-width versions never match; pre-history is NULL") {
    val ev = Seq(
      (1L, "A", 10L, 1L), (1L, "B", 30L, 2L),
      // key 2: two changes at ts 10 -> X is zero-width, Y current
      (2L, "X", 10L, 1L), (2L, "Y", 10L, 2L))
      .toDF("k", "v", "ts", "sq")
    val dim = Scd2.fromChanges(ev, Seq("k"), "v", "ts", "sq")
    val facts = Seq((1L, 5L), (1L, 10L), (1L, 29L), (1L, 30L), (1L, 99L),
      (2L, 10L), (3L, 50L)).toDF("k", "fts")
    val got = Scd2.pointInTime(facts, dim, Seq("k"), "fts", Seq("v", "version"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(got((1L, 5L)) === null)        // before first version
    assert(got((1L, 10L)) === "A")        // inclusive at valid_from
    assert(got((1L, 29L)) === "A")
    assert(got((1L, 30L)) === "B")        // boundary goes to the NEW version
    assert(got((1L, 99L)) === "B")        // open current interval
    assert(got((2L, 10L)) === "Y")        // zero-width X skipped
    assert(got((3L, 50L)) === null)       // unknown key kept, NULL attach
    assert(got.size === 7)
  }

  test("pointInTime: equals the interval-containment reference on the orders/lineitem corpus") {
    val o = Tables.load(spark, TestSpark.Sf001, "orders")
    val dim = Scd2.fromChanges(
      o.select("o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"),
      Seq("o_custkey"), "o_orderstatus", "o_orderdate", "o_orderkey")
    val facts = Tables.load(spark, TestSpark.Sf001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_shipdate")
      .join(o.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey")).drop("o_orderkey")
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic
    // lineitem, so compare the full output as a sorted multiset of
    // (fact identity, attached version) tuples, one per fact row.
    val got = Scd2.pointInTime(facts, dim, Seq("o_custkey"), "l_shipdate",
        Seq("o_orderstatus", "version"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3),
        r.getAs[java.time.LocalDateTime](2).toString,
        if (r.isNullAt(4)) -1L else r.getLong(5))).sorted
    // reference: brute interval scan per fact
    val intervals = dim.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getAs[java.time.LocalDateTime](3),
      if (r.isNullAt(4)) null else r.getAs[java.time.LocalDateTime](4)))
      .groupBy(_._1)
    val want = facts.collect().map { r =>
      val (ok, ln, ts, ck) = (r.getLong(0), r.getInt(1),
        r.getAs[java.time.LocalDateTime](2), r.getLong(3))
      val hit = intervals.getOrElse(ck, Array.empty).find { case (_, _, f, t) =>
        ts.compareTo(f) >= 0 && (t == null || ts.compareTo(t) < 0)
      }
      (ok, ln, ck, ts.toString, hit.map(_._2).getOrElse(-1L))
    }.sorted
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }

  test("stream-built change log folds to the batch dimension; redelivery is a ledger no-op; a duplicate change row is a semantic echo") {
    val root = java.nio.file.Files.createTempDirectory("graft-scd2-stream").toString
    val changes = Tables.load(spark, TestSpark.Sf001, "orders")
      .select("o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
    changes.repartition(3).write.parquet(s"$root/src")
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType),
        StructField("o_orderdate", TimestampNTZType),
        StructField("o_orderkey", LongType))))
      .option("maxFilesPerTrigger", "1").parquet(s"$root/src")
    val q = graft.streaming.Scd2Stream.changeSink(stream, s"$root/log")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    def dim = graft.streaming.Scd2Stream.readDimension(spark, s"$root/log",
        Seq("o_custkey"), "o_orderstatus", "o_orderdate", "o_orderkey")
      .collect().map(_.toString).sorted.toSeq
    val streamed = dim
    val direct = Scd2.fromChanges(changes, Seq("o_custkey"),
        "o_orderstatus", "o_orderdate", "o_orderkey")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed === direct)
    // ledger: a redelivered (streamId, batchId) appends nothing
    val batch = changes.limit(5)
    assert(graft.streaming.Scd2Stream.appendBatch(batch, 42L, s"$root/log",
      streamId = "manual"))
    val afterOnce = dim
    assert(!graft.streaming.Scd2Stream.appendBatch(batch, 42L, s"$root/log",
      streamId = "manual"))
    assert(dim === afterOnce)
    // semantic echo: even a ledger-bypassing exact-duplicate change row
    // cannot open a version (consecutive equal values collapse)
    graft.streaming.Scd2Stream.appendBatch(batch, 43L, s"$root/log",
      streamId = "manual")
    assert(dim === afterOnce)
  }

  test("fromChanges: reserved output names on the input fail fast") {
    val bad = Seq((1L, "A", 10L, 1L, 9L)).toDF("k", "v", "ts", "sq", "version")
    val e = intercept[IllegalArgumentException] {
      Scd2.fromChanges(bad, Seq("k"), "v", "ts", "sq")
    }
    assert(e.getMessage.contains("version"))
    intercept[IllegalArgumentException] {
      Scd2.fromChanges(Seq((1L, "A")).toDF("k", "v"), Seq(), "v", "k", "k")
    }
  }
}
