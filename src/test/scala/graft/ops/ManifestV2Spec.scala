package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-manifest v2 (q132/q133): the composition pins — the
  * oracle-gated chain vs the full chain at a keep-all threshold, the
  * classifier gate's real effect, packing invariants, and the
  * streaming twin (per-micro-batch gating + periodic selection ≡ the
  * batch manifest).
  */
class ManifestV2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = Tables.load(spark, TestSpark.Sf001, "documents")

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getLong(6), r.getLong(7))

  test("keep-all classifier threshold: q133 minus packing ≡ q132 row-for-row") {
    val base = ManifestV2.oracleChain(docs).orderBy("doc_id").collect().map(key)
    assert(base.nonEmpty, "empty manifest — composition pins nothing")
    // σ(x·w) > 0 always, so pThreshold = 0 keeps every survivor: the
    // classifier stage degenerates to identity and the chains coincide
    val full = ManifestV2.full(docs, pThreshold = 0.0)
      .select("doc_id", "source", "n_tok", "dsir_w", "gkey", "fraction",
        "shard", "pos")
      .orderBy("doc_id").collect().map(key)
    assert(full.toSeq === base.toSeq)
  }

  test("hoisted gate model: full(trainedWeights = trainGateWeights(docs)) ≡ self-training full, row for row") {
    val selfTrained = ManifestV2.full(docs, pThreshold = 0.0,
        gateQuantile = Some(0.3)).orderBy("doc_id").collect()
    val w = ManifestV2.trainGateWeights(docs)
    val hoisted = ManifestV2.full(docs, pThreshold = 0.0,
        gateQuantile = Some(0.3), trainedWeights = Some(w))
      .orderBy("doc_id").collect()
    assert(selfTrained.nonEmpty)
    assert(hoisted.toSeq === selfTrained.toSeq)
    // and a collected-then-relit weight table (the q133 memo shape)
    // behaves the same as the live one
    import spark.implicits._
    val relit = w.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .toSeq.toDF("idx", "w")
    val viaMemoShape = ManifestV2.full(docs, pThreshold = 0.0,
        gateQuantile = Some(0.3), trainedWeights = Some(relit))
      .orderBy("doc_id").collect()
    assert(viaMemoShape.toSeq === selfTrained.toSeq)
  }

  test("the classifier gate bites where the rules cannot: Gopher-passing low-quality docs are rejected") {
    import spark.implicits._
    // every doc passes the Gopher rules (≥ 50 words, sane lengths, ≥ 2
    // stopwords), but the odd docs draw from a junk vocabulary whose
    // '!' characters push the q28 weak label to 0 — the rules and the
    // classifier DISAGREE on them, which is the gate's whole value
    val rnd = new scala.util.Random(3)
    // 4-char fillers keep mean word length safely inside [3, 10]; the
    // explicit stopword prefix keeps r_stop deterministic on both sides
    val goodV = Vector("word", "text", "data", "line", "info", "page")
    val badV = Vector("zz!q", "xj!9", "qq!p", "vv!2", "kk!8", "jj!x")
    val rows = (0L until 200L).map { i =>
      val good = i % 2 == 0
      val pool = if (good) goodV else badV
      val words = Seq("the", "and", "of") ++
        (0 until 58).map(_ => pool(rnd.nextInt(pool.size)))
      (i, s"src${i % 4}", words.mkString(" "))
    }
    val d = rows.toDF("doc_id", "source", "text")
    val surv = ManifestV2.gopherSurvivors(d)
    assert(surv.count() === 200L, "fixture must pass the rules wholesale")
    val gated = ManifestV2.classifierGate(d, surv, pThreshold = 0.5)
    val keptIds = gated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.nonEmpty, "threshold 0.5 rejected everything")
    val goodIds = rows.collect { case (i, _, _) if i % 2 == 0 => i }.toSet
    val badKept = keptIds.diff(goodIds)
    assert(badKept.size <= 10,
      s"gate kept ${badKept.size} of 100 junk-vocab docs")
    assert(goodIds.diff(keptIds).size <= 10,
      s"gate dropped ${goodIds.diff(keptIds).size} of 100 good docs")
  }

  test("gateQuantile: the data-derived cut drops ~q of survivors, preferring classifier-favored docs") {
    import spark.implicits._
    // reuse the bite fixture: rules pass everything, scores separate
    val rnd = new scala.util.Random(3)
    val goodV = Vector("word", "text", "data", "line", "info", "page")
    val badV = Vector("zz!q", "xj!9", "qq!p", "vv!2", "kk!8", "jj!x")
    val rows = (0L until 200L).map { i =>
      val pool = if (i % 2 == 0) goodV else badV
      (i, s"src${i % 4}",
        (Seq("the", "and", "of") ++
          (0 until 58).map(_ => pool(rnd.nextInt(pool.size)))).mkString(" "))
    }
    val d = rows.toDF("doc_id", "source", "text")
    val surv = ManifestV2.gopherSurvivors(d)
    val kept = ManifestV2.classifierGate(d, surv, pThreshold = 0.0,
        gateQuantile = Some(0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // ≥ half survives (ties keep the boundary score), and the kept set
    // is dominated by the classifier-favored half
    assert(kept.size >= 100 && kept.size <= 120, s"kept ${kept.size} of 200")
    val good = kept.count(_ % 2 == 0)
    assert(good >= kept.size - 10, s"quantile cut kept $good good of ${kept.size}")
    // determinism: exact percentile + deterministic training → same cut
    val kept2 = ManifestV2.classifierGate(d, surv, pThreshold = 0.0,
        gateQuantile = Some(0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === kept2)
  }

  test("manifest invariants: membership ⊆ survivors, contiguous per-shard positions, bins respect the budget") {
    val m = ManifestV2.full(docs, pThreshold = 0.0, packBudget = 512L).cache()
    try {
      val survIds = ManifestV2.gopherSurvivors(docs)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val rows = m.collect()
      assert(rows.nonEmpty)
      assert(rows.map(_.getLong(0)).forall(survIds), "manifest row outside the gated corpus")
      // shard ∈ [0, Shards); positions are 1..n contiguous per shard
      val byShard = rows.groupBy(_.getLong(6))
      assert(byShard.keySet.forall(s => s >= 0 && s < ManifestV2.Shards))
      byShard.foreach { case (s, rs) =>
        val pos = rs.map(_.getLong(7)).sorted
        assert(pos.toSeq === (1L to rs.length).toSeq, s"shard $s positions: ${pos.toList}")
      }
      // packing: no multi-doc bin exceeds the budget; singleton bins may
      // (the oversize-doc contract)
      val bins = rows.groupBy(_.getLong(8))
      bins.foreach { case (b, rs) =>
        val tot = rs.map(_.getLong(2)).sum
        if (rs.length > 1)
          assert(tot <= 512L, s"bin $b holds $tot tokens across ${rs.length} docs")
      }
    } finally m.unpersist()
  }

  test("manifest diff: every status fires on a hand fixture; shard moves outrank pos moves") {
    import spark.implicits._
    val old = Seq((1L, 0L, 1L), (2L, 0L, 2L), (3L, 1L, 1L), (5L, 1L, 2L))
      .toDF("doc_id", "shard", "pos")
    val neu = Seq((2L, 0L, 1L), (3L, 2L, 9L), (4L, 1L, 1L), (5L, 1L, 2L))
      .toDF("doc_id", "shard", "pos")
    val got = ManifestV2.diff(old, neu, "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq(
      (1L, "dropped"),
      (2L, "moved_pos"),
      (3L, "moved_shard"), // pos ALSO moved — shard wins the label
      (4L, "added"),
      (5L, "unchanged")))
  }

  test("applyDiff round trip: replaying diff(old, new) onto old reconstructs new exactly") {
    import spark.implicits._
    val d = Tables.load(spark, TestSpark.Sf001, "documents")
    def manifest(pred: org.apache.spark.sql.Column) =
      graft.ops.Sampling.seededShuffle(
        d.filter(pred).select("doc_id"), "doc_id", 8)
    val old = manifest(col("n_chars") <= 450)
    val neu = manifest(col("n_chars") >= 150)
    val rebuilt = ManifestV2.applyDiff(
      ManifestV2.diff(old, neu, "doc_id"), "doc_id")
    val want = neu.select("doc_id", "shard", "pos").orderBy("doc_id")
      .collect().toSeq
    val got = rebuilt.orderBy("doc_id").collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("applyTombstones ≡ full per-shard renumber of survivors; untouched shards byte-identical; diff twin matches diff()") {
    import spark.implicits._
    val man = ManifestV2.oracleChain(docs).localCheckpoint(true)
    // takedown set chosen so SOME shard keeps zero deletions (the
    // pass-through path must actually exercise)
    val tombs = man.filter(col("doc_id") % 3 === 1).select("doc_id")
    assert(tombs.count() > 0)
    val got = ManifestV2.applyTombstones(man, tombs, "doc_id")

    // the reference: brute-force re-rank survivors inside EVERY shard
    // (row_number over the old pos order) — the incremental shift must
    // reproduce it exactly
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("pos")
    val want = man.join(tombs, Seq("doc_id"), "left_anti")
      .withColumn("pos", row_number().over(w).cast("long"))
    val keyCols = man.columns.toSeq
    assert(got.orderBy("doc_id").collect().toSeq
      === want.select(keyCols.map(col).toIndexedSeq: _*)
        .orderBy("doc_id").collect().toSeq)

    // rows in shards with no deletion are bit-identical pass-through
    val delShards = man.join(tombs, Seq("doc_id"), "left_semi")
      .select("shard").distinct().as[Long].collect().toSet
    val untouched = got.filter(!col("shard").isin(delShards.toSeq: _*))
    val before = man.join(tombs, Seq("doc_id"), "left_anti")
      .filter(!col("shard").isin(delShards.toSeq: _*))
    assert(untouched.orderBy("doc_id").collect().toSeq
      === before.select(keyCols.map(col).toIndexedSeq: _*)
        .orderBy("doc_id").collect().toSeq)

    // the selective diff ≡ the generic diff over (old, patched new)
    val sel = ManifestV2.tombstoneDiff(man, tombs, "doc_id")
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    val gen = ManifestV2.diff(man, got, "doc_id")
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(sel === gen)
    // statuses are exactly dropped / moved_pos / unchanged, all present
    val statuses = sel.map(_(1).asInstanceOf[String]).toSet
    assert(statuses === Set("dropped", "moved_pos", "unchanged"))
    // tombstoning an id the manifest never scheduled is a no-op
    val noop = ManifestV2.applyTombstones(man,
      Seq(999999999L).toDF("doc_id"), "doc_id")
    assert(noop.orderBy("doc_id").collect().toSeq
      === man.orderBy("doc_id").collect().toSeq)
  }

  test("mass-delete path: applyTombstonesMerge ≡ the broadcast plan row-for-row; the size guard dispatches to it") {
    import spark.implicits._
    val man = ManifestV2.oracleChain(docs).localCheckpoint(true)
    // a BULK removal — every third doc — where the sort-merge plan is
    // the right trade; both paths must agree exactly
    val tombs = man.filter(col("doc_id") % 3 === 1).select("doc_id")
    val broadcastPath = ManifestV2.applyTombstones(man, tombs, "doc_id")
      .orderBy("doc_id").collect().toSeq
    val mergePath = ManifestV2.applyTombstonesMerge(man, tombs, "doc_id")
      .orderBy("doc_id").collect().toSeq
    assert(mergePath === broadcastPath)
    // maxBroadcastDeletes = 0 forces the dispatch — same rows again
    val dispatched = ManifestV2.applyTombstones(man, tombs, "doc_id",
        maxBroadcastDeletes = 0L)
      .orderBy("doc_id").collect().toSeq
    assert(dispatched === broadcastPath)
    // merge path no-op contract matches too
    val noop = ManifestV2.applyTombstonesMerge(man,
      Seq(999999999L).toDF("doc_id"), "doc_id")
    assert(noop.orderBy("doc_id").collect().toSeq
      === man.orderBy("doc_id").collect().toSeq)
  }

  test("binTombstoneReport: affected bins only, with exact doc/token shrink") {
    import spark.implicits._
    val packed = Seq(
      (1L, 10L, 100L), (2L, 10L, 200L), (3L, 11L, 300L),
      (4L, 12L, 400L), (5L, 12L, 500L))
      .toDF("doc_id", "bin_id", "n_tokens")
    val got = ManifestV2.binTombstoneReport(packed,
        Seq(2L, 4L, 5L).toDF("doc_id"), "doc_id", "bin_id", "n_tokens")
      .orderBy("bin_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // bin 11 is unaffected — absent from the work-list; bin 12 empties
    assert(got.toSeq === Seq(
      (10L, 2L, 1L, 300L, 100L),
      (12L, 2L, 0L, 900L, 0L)))
  }

  test("degenerate corpora: nothing survives the rules → empty manifest, no crash (incl. the quantile gate)") {
    import spark.implicits._
    // every doc fails Gopher (too short)
    val d = (0L until 20L).map(i => (i, s"src${i % 2}", "too short"))
      .toDF("doc_id", "source", "text")
    assert(ManifestV2.gopherSurvivors(d).count() === 0L)
    assert(ManifestV2.oracleChain(d).count() === 0L)
    // the quantile gate's percentile over zero scored survivors is
    // NULL — must resolve to keep-nothing, not NPE
    assert(ManifestV2.full(d, pThreshold = 0.0,
      gateQuantile = Some(0.3)).count() === 0L)
  }

  test("streaming twin: per-micro-batch Gopher gating + periodic selection ≡ the batch manifest") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-manifest2")
    val (src, admitted, ckpt) = (s"$root/src", s"$root/admitted", s"$root/ckpt")
    docs.select("doc_id", "source", "text").repartition(3).write.parquet(src)
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType),
        StructField("source", StringType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
    // stage 1 runs INSIDE the stream (row-local → commutes with
    // batching); the selection stages run periodically over admissions
    val q = ManifestV2.admissionSink(stream, admitted)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = ManifestV2.selectAndShard(spark.read.parquet(admitted))
      .orderBy("doc_id").collect().map(key)
    val batch = ManifestV2.oracleChain(docs).orderBy("doc_id").collect().map(key)
    assert(streamed.toSeq === batch.toSeq)
  }
}
