package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val events = Tables.load(spark, TestSpark.Sf001, "events")
    .select(to_date(col("ts")).cast("string").as("day"), col("user_id"))

  test("merge-of-parts equals sketch-of-whole regardless of partitioning") {
    // sketch per (day, arbitrary shard), then union the shards per day
    val sharded = Sketches.hllAgg(
      events.withColumn("shard", pmod(col("user_id"), lit(7L))),
      Seq("day", "shard"), "user_id")
    val rolled = Sketches.hllRollup(sharded, Seq("day"))
      .select(col("day"), Sketches.hllEstimate(col("sketch")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Sketches.hllAgg(events, Seq("day"), "user_id")
      .select(col("day"), Sketches.hllEstimate(col("sketch")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled === direct)
  }

  test("sparse regime is EXACT: estimates equal count(DISTINCT) at gate cardinalities") {
    val est = Sketches.hllAgg(events, Seq("day"), "user_id")
      .select(col("day"), Sketches.hllEstimate(col("sketch")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy("day").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === exact) // the q164 oracle's load-bearing fact
    // global rollup exact too
    val allEst = Sketches.hllRollup(
      Sketches.hllAgg(events, Seq("day"), "user_id"), Nil)
      .select(Sketches.hllEstimate(col("sketch"))).head().getLong(0)
    assert(allEst === events.select(countDistinct("user_id")).head().getLong(0))
  }

  test("promoted regime holds the ~1.6% RSE contract (5% gate at 3 sigma)") {
    val n = 200000L
    val big = spark.range(n).select(lit("g").as("g"), col("id"))
    val est = Sketches.hllAgg(big, Seq("g"), "id")
      .select(Sketches.hllEstimate(col("sketch"))).head().getLong(0)
    assert(math.abs(est - n).toDouble / n < 0.05, s"est=$est for n=$n")
  }

  test("range rollup answers a day-window distinct without rescanning rows") {
    val daily = Sketches.hllAgg(events, Seq("day"), "user_id")
    val window = daily.filter(col("day") <= "2024-01-10")
    val est = Sketches.hllRollup(window, Nil)
      .select(Sketches.hllEstimate(col("sketch"))).head().getLong(0)
    val exact = events.filter(col("day") <= "2024-01-10")
      .select(countDistinct("user_id")).head().getLong(0)
    assert(est === exact)
  }

  test("hllOverlapMatrix: sparse-regime overlaps are exact vs a string-join ground truth; clamped at 0") {
    val toks = graft.Tables.load(spark, TestSpark.Sf001, "documents")
      .select(col("source"),
        explode(array_remove(TextFunctions.tokens(col("text")), "")).as("w"))
    val got = Sketches.hllOverlapMatrix(
        Sketches.hllAgg(toks, Seq("source"), "w"), "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val d = toks.distinct().collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = (for {
      a <- d.keys; b <- d.keys if a < b
    } yield (a, b) -> (d(a) & d(b)).size.toLong).toMap
    assert(got === want)
    assert(got.values.forall(_ >= 0))
    // disjoint groups → overlap 0 (the clamp never goes negative)
    val disjoint = Seq(("x", "a1"), ("x", "a2"), ("y", "b1")).toDF("g", "w")
    val z = Sketches.hllOverlapMatrix(
        Sketches.hllAgg(disjoint, Seq("g"), "w"), "g")
      .collect()
    assert(z.length === 1 && z.head.getLong(2) === 0L)
  }

  test("sketch table: stream-built rollup ≡ batch build; redelivered batch is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-sketch-stream").toString
    val parts = events.repartition(3)
    parts.write.parquet(s"$root/src")
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("day", StringType), StructField("user_id", LongType))))
      .option("maxFilesPerTrigger", "1").parquet(s"$root/src")
    val q = graft.streaming.SketchStream
      .sketchSink(stream, Seq("day"), "user_id", s"$root/tbl")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    def estimates = Sketches.readSketchTable(spark, s"$root/tbl", Seq("day"))
      .select(col("day"), Sketches.hllEstimate(col("sketch")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val streamed = estimates
    val direct = Sketches.hllAgg(events, Seq("day"), "user_id")
      .select(col("day"), Sketches.hllEstimate(col("sketch")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === direct)
    // redelivery of an already-ledgered (streamId, batchId) is a no-op
    val once = graft.streaming.SketchStream.appendBatch(
      events.limit(10), 99L, Seq("day"), "user_id", s"$root/tbl",
      streamId = "manual")
    assert(once)
    val snapshot = estimates
    val twice = graft.streaming.SketchStream.appendBatch(
      events.limit(10), 99L, Seq("day"), "user_id", s"$root/tbl",
      streamId = "manual")
    assert(!twice)
    assert(estimates === snapshot)
    // compaction folds the append litter without touching estimates
    // (the index-compaction contract, same shared machinery)
    val dir = new org.apache.hadoop.fs.Path(s"$root/tbl")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def nFiles = fs.listStatus(dir).count(s0 => s0.isFile &&
      !s0.getPath.getName.startsWith(".") && !s0.getPath.getName.startsWith("_"))
    val before = nFiles
    val folded = Compaction.compactDirs(spark, Seq(dir),
      maxFilesPerDir = 1, targetBytes = 64L << 20, opName = "sketch-compact")
    assert(folded.nonEmpty && nFiles < before)
    assert(estimates === snapshot)
  }

  test("lgK and group validation fail fast") {
    intercept[IllegalArgumentException] {
      Sketches.hllAgg(events, Seq("day"), "user_id", lgK = 2)
    }
    intercept[IllegalArgumentException] {
      Sketches.hllAgg(events, Nil, "user_id")
    }
  }

  lazy val toks = Tables.load(spark, TestSpark.Sf001, "documents")
    .select(col("source"),
      explode(array_remove(split(col("text"), " "), "")).as("tok"))

  test("cm: estimates dominate exact counts and hold the e/width overcount bound on the corpus") {
    val width = 2048
    val table = Sketches.cmAgg(toks, Seq("source"), "tok", width = width)
    val exact = toks.groupBy("source", "tok").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val nPerSource = toks.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val probes = toks.select("source", "tok").distinct()
      .union(toks.select("source").distinct()
        .select(col("source"), lit("zzz_absent").as("tok")))
    val est = Sketches.cmEstimate(table, probes, Seq("source"), "tok",
        width = width)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(est.nonEmpty)
    est.foreach { case ((src, t), e) =>
      val truth = exact.getOrElse((src, t), 0L)
      assert(e >= truth, s"($src, $t): CM must never undercount")
      val bound = math.ceil(math.E / width * nPerSource(src)).toLong
      assert(e - truth <= bound,
        s"($src, $t): overcount ${e - truth} exceeds e/width bound $bound")
    }
  }

  test("cm: merge-of-parts equals sketch-of-whole cell-for-cell; global rollup matches direct") {
    def cells(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    val whole = cells(Sketches.cmAgg(toks, Seq("source"), "tok"))
    val even = toks.filter(xxhash64(col("tok")) % 2 === 0)
    val odd = toks.filter(xxhash64(col("tok")) % 2 =!= 0)
    val merged = cells(Sketches.cmMerge(
      Sketches.cmAgg(even, Seq("source"), "tok")
        .unionByName(Sketches.cmAgg(odd, Seq("source"), "tok")),
      Seq("source")))
    assert(merged === whole)
    // collapse to one global sketch ≡ building it directly
    val global = Sketches.cmMerge(
      Sketches.cmAgg(toks, Seq("source"), "tok"), Nil)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val direct = Sketches.cmAgg(toks.select(lit(1).as("g"), col("tok")),
        Seq("g"), "tok")
      .collect().map(r => (r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(global === direct)
  }

  test("cm: stream-built table ≡ batch build cell-for-cell; redelivered batch is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-cm-stream").toString
    toks.repartition(3).write.parquet(s"$root/src")
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("source", StringType), StructField("tok", StringType))))
      .option("maxFilesPerTrigger", "1").parquet(s"$root/src")
    val q = graft.streaming.SketchStream
      .cmSink(stream, Seq("source"), "tok", s"$root/tbl")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    def cells = Sketches.cmMerge(spark.read.parquet(s"$root/tbl"), Seq("source"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    val streamed = cells
    val direct = Sketches.cmAgg(toks, Seq("source"), "tok")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(streamed === direct)
    val once = graft.streaming.SketchStream.cmAppendBatch(
      toks.limit(10), 7L, Seq("source"), "tok", s"$root/tbl", streamId = "manual")
    assert(once)
    val snapshot = cells
    val twice = graft.streaming.SketchStream.cmAppendBatch(
      toks.limit(10), 7L, Seq("source"), "tok", s"$root/tbl", streamId = "manual")
    assert(!twice)
    assert(cells === snapshot)
  }

  test("cm: depth/width guards fail fast") {
    intercept[IllegalArgumentException] {
      Sketches.cmAgg(toks, Seq("source"), "tok", depth = 0)
    }
    intercept[IllegalArgumentException] {
      Sketches.cmAgg(toks, Seq("source"), "tok", width = 4)
    }
    intercept[IllegalArgumentException] {
      Sketches.cmAgg(toks, Nil, "tok")
    }
  }

  // ------------------------------------------------------------- KLL

  lazy val docs = Tables.load(spark, TestSpark.Sf001, "documents")
    .select(col("source"), col("doc_id"), col("n_chars"))

  /** True inclusive normalized rank of v in the group's values. */
  private def trueRank(values: Seq[Double], v: Double): Double =
    values.count(_ <= v).toDouble / values.length

  private def byGroup: Map[String, Seq[Double]] =
    docs.collect().map(r => r.getString(0) -> r.getLong(2).toDouble)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  test("kll: per-group quantile estimates hold the rank-error contract vs exact (2ε gate)") {
    val k = 200
    val eps = org.apache.datasketches.kll.KllSketch
      .getNormalizedRankError(k, false)
    val qs = Seq(0.25, 0.5, 0.75, 0.9)
    val est = Sketches.kllGroupQuantiles(
      Sketches.kllAgg(docs, Seq("source"), "n_chars", k), qs)
      .collect().map(r => r.getString(0) -> qs.indices.map(i => r.getDouble(i + 1)))
      .toMap
    val groups = byGroup
    for ((src, estQs) <- est; (q, v) <- qs.zip(estQs)) {
      val r = trueRank(groups(src), v)
      assert(math.abs(r - q) <= 2 * eps + 1.0 / groups(src).length,
        s"source=$src q=$q est=$v trueRank=$r")
    }
  }

  test("kll: merge-of-parts honors the same bound; global rollup ≡ collapse of parts in distribution") {
    val k = 200
    val eps = org.apache.datasketches.kll.KllSketch
      .getNormalizedRankError(k, false)
    val sharded = Sketches.kllAgg(
      docs.withColumn("shard", pmod(col("doc_id"), lit(5L))),
      Seq("source", "shard"), "n_chars", k)
    val rolled = Sketches.kllGroupQuantiles(
      Sketches.kllRollup(sharded, Seq("source"), k = k), Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val groups = byGroup
    for ((src, med) <- rolled) {
      val r = trueRank(groups(src), med)
      assert(math.abs(r - 0.5) <= 2 * eps + 1.0 / groups(src).length,
        s"merged median source=$src est=$med trueRank=$r")
    }
    // global collapse: one row, same contract over the whole corpus
    val all = groups.values.flatten.toSeq
    val global = Sketches.kllGroupQuantiles(
      Sketches.kllRollup(sharded, Nil, k = k), Seq(0.5))
      .head().getDouble(0)
    assert(math.abs(trueRank(all, global) - 0.5) <= 2 * eps + 1.0 / all.length)
  }

  test("kllDatasheet: one-pass mass + quantile columns — exact regime equals brute force, estimation regime holds 2ε") {
    val qs = Seq(0.25, 0.5, 0.75)
    val groups = byGroup
    // exact regime (k >> any group): quartiles ARE the inclusive order
    // statistics and the mass columns the plain aggregates
    val ds = Sketches.kllDatasheet(docs, Seq("source"), "n_chars", qs,
        k = 4096)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          qs.indices.map(i => r.getDouble(3 + i)))))
      .toMap
    assert(ds.keySet === groups.keySet)
    for ((src, (n, tot, quart)) <- ds) {
      val vals = groups(src)
      assert(n === vals.length.toLong)
      assert(tot === vals.map(_.toLong).sum)
      val sorted = vals.sorted
      qs.zip(quart).foreach { case (q, v) =>
        val want = sorted.find(x =>
          sorted.count(_ <= x).toDouble / sorted.length >= q).get
        assert(v === want, s"datasheet source=$src q=$q")
      }
    }
    // estimation regime (k = 200 over the collapsed corpus — n >> k):
    // the same consumer holds the 2ε rank-error contract
    val k = 200
    val eps = org.apache.datasketches.kll.KllSketch
      .getNormalizedRankError(k, false)
    val all = groups.values.flatten.toSeq
    val row = Sketches.kllDatasheet(
        docs.withColumn("one", lit("all")), Seq("one"), "n_chars", qs, k)
      .head()
    assert(row.getLong(1) === all.length.toLong)
    qs.zipWithIndex.foreach { case (q, i) =>
      val r = trueRank(all, row.getDouble(3 + i))
      assert(math.abs(r - q) <= 2 * eps + 1.0 / all.length,
        s"datasheet estimation q=$q trueRank=$r")
    }
  }

  test("kll: exact regime (n < k) — estimates are EXACT order statistics; rank readout inverse-consistent; null/empty edges") {
    // every group far below k: the sketch retains all values
    val k = 4096
    val qs = Seq(0.25, 0.5, 0.75)
    val est = Sketches.kllGroupQuantiles(
      Sketches.kllAgg(docs, Seq("source"), "n_chars", k), qs)
      .collect().map(r => r.getString(0) -> qs.indices.map(i => r.getDouble(i + 1)))
      .toMap
    val groups = byGroup
    for ((src, estQs) <- est; (q, v) <- qs.zip(estQs)) {
      val sorted = groups(src).sorted
      // inclusive quantile = smallest value whose rank (#≤v / n) >= q
      val want = sorted.find(x =>
        sorted.count(_ <= x).toDouble / sorted.length >= q).get
      assert(v === want, s"exact-regime source=$src q=$q")
    }
    // rank(quantile(q)) >= q, with equality-on-grid in the exact regime
    val sk = Sketches.kllAgg(docs, Seq("source"), "n_chars", k)
    // argument order guard: (sketch, value), not (value, sketch) —
    // rejected at analysis (select is eagerly analyzed)
    intercept[org.apache.spark.sql.AnalysisException] {
      sk.select(col("source"),
        graft.functions.GraftFunctions.kllRank(
          graft.functions.GraftFunctions.kllQuantiles(col("sketch"),
            Seq(0.5)).getItem(0), col("sketch")).as("bad"))
    }
    val ranks = sk.select(col("source"),
        graft.functions.GraftFunctions.kllRank(col("sketch"),
          element_at(graft.functions.GraftFunctions.kllQuantiles(
            col("sketch"), Seq(0.5)), 1)).as("rk"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    for ((src, rk) <- ranks)
      assert(rk >= 0.5 && rk <= 0.5 + 1.0 / groups(src).length + 1e-12)
    // all-null group → empty sketch → null readout
    val empty = Sketches.kllAgg(
      Seq(("a", null.asInstanceOf[java.lang.Double])).toDF("g", "v"),
      Seq("g"), "v", 200)
    assert(empty.select(graft.functions.GraftFunctions
      .kllQuantiles(col("sketch"), Seq(0.5))).head().isNullAt(0))
  }

  test("kll: stream-built table holds the contract; redelivered batch is a no-op; k guard fails fast") {
    val root = java.nio.file.Files.createTempDirectory("graft-kll").toString
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    val b1 = docs.filter(col("doc_id") % 2 === 1)
    assert(graft.streaming.SketchStream.kllAppendBatch(
      b0, 0L, Seq("source"), "n_chars", s"$root/tbl", streamId = "m"))
    assert(graft.streaming.SketchStream.kllAppendBatch(
      b1, 1L, Seq("source"), "n_chars", s"$root/tbl", streamId = "m"))
    val rowsBefore = spark.read.parquet(s"$root/tbl").count()
    assert(!graft.streaming.SketchStream.kllAppendBatch(
      b1, 1L, Seq("source"), "n_chars", s"$root/tbl", streamId = "m"))
    assert(spark.read.parquet(s"$root/tbl").count() === rowsBefore)
    val eps = org.apache.datasketches.kll.KllSketch
      .getNormalizedRankError(200, false)
    val med = Sketches.kllGroupQuantiles(
      Sketches.readKllTable(spark, s"$root/tbl", Seq("source")), Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val groups = byGroup
    for ((src, v) <- med)
      assert(math.abs(trueRank(groups(src), v) - 0.5)
        <= 2 * eps + 1.0 / groups(src).length)
    intercept[IllegalArgumentException] {
      Sketches.kllAgg(docs, Seq("source"), "n_chars", k = 4)
    }
  }

  test("theta: θ=1 regime — estimate, intersection and difference are EXACT set sizes") {
    val t = toks.distinct()
    val est = Sketches.thetaAgg(t, Seq("source"), "tok")
      .select(col("source"), Sketches.thetaEstimate(col("sketch")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = t.groupBy("source").agg(countDistinct("tok").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === exact)
    // pairwise set algebra vs an exact join ground truth
    val got = Sketches.thetaOverlapMatrix(
        Sketches.thetaAgg(t, Seq("source"), "tok"), "source")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val sets = t.collect().map(r => r.getString(0) -> r.getString(1))
      .groupBy(_._1).map { case (s0, a) => s0 -> a.map(_._2).toSet }
    for {
      (sa, a) <- sets; (sb, b) <- sets if sa < sb
    } assert(got((sa, sb)) ===
        ((a & b).size.toLong, (a -- b).size.toLong, (b -- a).size.toLong),
      s"pair ($sa, $sb)")
  }

  test("theta: union rollup ≡ direct build; merge-of-parts insensitive to partitioning") {
    val sharded = Sketches.thetaAgg(
      events.withColumn("shard", pmod(col("user_id"), lit(5L))),
      Seq("day", "shard"), "user_id")
    val rolled = Sketches.thetaRollup(sharded, Seq("day"))
      .select(col("day"), Sketches.thetaEstimate(col("sketch")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Sketches.thetaAgg(events, Seq("day"), "user_id")
      .select(col("day"), Sketches.thetaEstimate(col("sketch")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled === direct)
  }

  test("theta: estimation mode holds the RSE contract; intersection beats inclusion–exclusion's compounding") {
    val n = 200000L
    val big = spark.range(n).select(lit("g").as("g"), col("id"))
    val est = Sketches.thetaAgg(big, Seq("g"), "id")
      .select(Sketches.thetaEstimate(col("sketch"))).head().getLong(0)
    assert(math.abs(est - n).toDouble / n < 0.05, s"est=$est for n=$n")
    // two 200k sets with a known 100k overlap: the DIRECT intersection
    // estimate stays within 5% of truth even though all operand
    // sketches are in estimation mode
    val a = spark.range(0, 200000).select(lit("a").as("g"), col("id"))
    val b = spark.range(100000, 300000).select(lit("b").as("g"), col("id"))
    val m = Sketches.thetaOverlapMatrix(
        Sketches.thetaAgg(a.unionByName(b), Seq("g"), "id"), "g")
      .head()
    assert(math.abs(m.getLong(2) - 100000L).toDouble / 100000 < 0.05,
      s"shared=${m.getLong(2)}")
    assert(math.abs(m.getLong(3) - 100000L).toDouble / 100000 < 0.05,
      s"only_a=${m.getLong(3)}")
  }

  test("theta: stream-built table ≡ batch build in every readout; redelivered batch is a no-op; lgK guard") {
    val root = java.nio.file.Files.createTempDirectory("graft-theta-stream").toString
    events.repartition(3).write.parquet(s"$root/src")
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("day", StringType), StructField("user_id", LongType))))
      .option("maxFilesPerTrigger", "1").parquet(s"$root/src")
    val q = graft.streaming.SketchStream
      .thetaSink(stream, Seq("day"), "user_id", s"$root/tbl")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    def estimates = Sketches.readThetaTable(spark, s"$root/tbl", Seq("day"))
      .select(col("day"), Sketches.thetaEstimate(col("sketch")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Sketches.thetaAgg(events, Seq("day"), "user_id")
      .select(col("day"), Sketches.thetaEstimate(col("sketch")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estimates === direct)
    assert(graft.streaming.SketchStream.thetaAppendBatch(
      events.limit(10), 7L, Seq("day"), "user_id", s"$root/tbl",
      streamId = "m"))
    val snapshot = estimates
    assert(!graft.streaming.SketchStream.thetaAppendBatch(
      events.limit(10), 7L, Seq("day"), "user_id", s"$root/tbl",
      streamId = "m"))
    assert(estimates === snapshot)
    intercept[IllegalArgumentException] {
      Sketches.thetaAgg(events, Seq("day"), "user_id", lgK = 2)
    }
    intercept[IllegalArgumentException] {
      Sketches.thetaAgg(events, Nil, "user_id")
    }
  }
}
