package graft.functions

import graft.{Tables, TestSpark}
import graft.ops.{Dedup, TextFunctions, VectorOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native codegen expressions must be bit-identical with the composable
  * built-ins formulations they replace — parity checked over the real
  * corpus, plus null/edge semantics.
  */
class NativeExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft_vec_sum ≡ posexplode mean over the corpus, across forced partial merges") {
    val embs = Tables.load(spark, TestSpark.Sf001, "embeddings")
      .select(pmod($"vec_id", lit(7L)).as("gid"), $"embedding")
      .repartition(8) // force partial buffers + serialize/merge path
    val native = VectorOps.meanPool(embs, "gid", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val exploded = embs
      .select($"gid", posexplode(VectorOps.toDoubleVec($"embedding")).as(Seq("pos", "v")))
      .groupBy("gid", "pos").agg(avg("v").as("m"))
      .groupBy("gid")
      .agg(array_sort(collect_list(struct($"pos", $"m"))).as("ps"))
      .select($"gid", transform($"ps", p => round(p.getField("m"), 6)).as("centroid"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(native.keySet === exploded.keySet)
    native.keySet.foreach { g =>
      assert(native(g) === exploded(g), s"group $g")
    }
  }

  test("graft_vec_sum: NULL arrays are ignored; ragged dims fail readably") {
    val withNull = Seq(
      (1L, Some(Seq(1.0, 2.0))),
      (1L, Option.empty[Seq[Double]]),
      (1L, Some(Seq(3.0, 4.0))))
      .toDF("gid", "v")
    val got = withNull.groupBy("gid")
      .agg(GraftFunctions.vecSum($"v").as("s"))
      .head().getSeq[Double](1)
    assert(got === Seq(4.0, 6.0)) // null row skipped, not zero-filled
    val ragged = Seq((1L, Seq(1.0, 2.0)), (1L, Seq(1.0))).toDF("gid", "v")
    val e = intercept[Exception] {
      ragged.groupBy("gid").agg(GraftFunctions.vecSum($"v")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("graft_vec_sum")), s"got $e")
  }

  test("graft_vec_sum: empty-array inputs sum to [], not NULL, across the serialized path") {
    // A zero-length partial buffer must survive serialize/deserialize
    // distinct from the null no-input buffer.
    val df = Seq((1L, Seq.empty[Double]), (1L, Seq.empty[Double]))
      .toDF("gid", "v").repartition(4)
    val r = df.groupBy("gid").agg(GraftFunctions.vecSum($"v").as("s")).head()
    assert(!r.isNullAt(1), "empty-array sum collapsed to NULL")
    assert(r.getSeq[Double](1) === Seq.empty[Double])
  }

  test("graft_mg_topk: superset guarantee holds across partitionings (zipf-ish stream)") {
    // Items with true count > N/(capacity+1) MUST appear in the summary
    // no matter how the stream is partitioned (merge trees differ).
    val rows = (0 until 2000).flatMap { i =>
      val item = s"w${i % 40}"
      Seq.fill(if (i % 40 < 4) 12 else 1)(item) // 4 heavy items
    }
    val n = rows.length.toLong
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 4, 32)) {
      val df = rows.toDF("w").repartition(parts)
      for (cap <- Seq(8, 20)) {
        val sketch = df.agg(GraftFunctions.mgTopK($"w", cap).as("s"))
          .select(explode($"s").as("c")).select($"c.item", $"c.count")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(sketch.size <= cap, s"parts=$parts cap=$cap size=${sketch.size}")
        val mustHave = exact.filter { case (_, c) => c * (cap + 1) > n }.keySet
        assert(mustHave.subsetOf(sketch.keySet),
          s"parts=$parts cap=$cap missing ${mustHave -- sketch.keySet}")
        // residuals never overcount and undercount by at most N/(cap+1)
        sketch.foreach { case (w, c) =>
          assert(c <= exact(w), s"overcount of $w")
          assert(exact(w) - c <= n / (cap + 1) + 1, s"undercount bound of $w")
        }
      }
    }
  }

  test("graft_mg_topk: null items skipped; empty input yields empty array, not NULL") {
    val df = Seq(Some("a"), None, Some("a"), Some("b")).toDF("w")
    val s = df.agg(GraftFunctions.mgTopK($"w", 4).as("s")).head().getSeq[org.apache.spark.sql.Row](0)
    assert(s.map(r => (r.getString(0), r.getLong(1))) === Seq(("a", 2L), ("b", 1L)))
    val empty = spark.emptyDataFrame.select(lit("x").as("w")).limit(0)
      .agg(GraftFunctions.mgTopK($"w", 4).as("s")).head()
    assert(!empty.isNullAt(0) && empty.getSeq[org.apache.spark.sql.Row](0).isEmpty)
  }

  test("heavyHitters is EXACT: equals the groupBy/HAVING relation on corpus bigrams") {
    import graft.ops.TextAnalysis
    val toks = TextFunctions.tokens(col("text"))
    val items = Tables.load(spark, TestSpark.Sf001, "documents")
      .filter(size(toks) >= 2)
      .select(explode(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat_ws(" ", a, b))).as("token"))
    for (k <- Seq(100, 800)) {
      val fast = TextAnalysis.heavyHitters(items, "token", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
      val n = items.count()
      val exact = items.groupBy("token").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * k > n)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
      assert(fast === exact, s"k=$k")
    }
  }

  test("graft_dot ≡ aggregate/zip_with fold over the embeddings corpus") {
    val e = Tables.load(spark, TestSpark.Sf001, "embeddings")
      .withColumn("v", VectorOps.toDoubleVec(col("embedding")))
    val diff = e.select(
      (VectorOps.dot(col("v"), col("v")) -
        VectorOps.dotComposable(col("v"), col("v"))).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff === 0.0)
  }

  test("graft_dot: native float input ≡ cast-then-dot on doubles, bit-identical") {
    // the SRP verify feeds RAW float vectors to the dot (no per-pair
    // toDoubleVec materialization) — each float must widen exactly, so
    // float×float, float×double and double×double all agree to the bit
    val e = Tables.load(spark, TestSpark.Sf001, "embeddings")
      .withColumn("v", VectorOps.toDoubleVec(col("embedding")))
    val diff = e.select(
      greatest(
        abs(VectorOps.dot(col("embedding"), col("embedding")) -
          VectorOps.dot(col("v"), col("v"))),
        abs(VectorOps.dot(col("embedding"), col("v")) -
          VectorOps.dot(col("v"), col("v")))).as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    assert(diff === 0.0)
  }

  test("graft_dot: length mismatch and null element → NULL (zip_with parity)") {
    val df = Seq(
      (Array(1.0, 2.0), Array(1.0, 2.0, 3.0)),
      (Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    val out = df.select(VectorOps.dot(col("a"), col("b")).as("d")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) === 11.0)
  }

  test("graft_simhash ≡ composable simhash over the documents corpus") {
    val toks = Tables.load(spark, TestSpark.Sf001, "documents")
      .select(TextFunctions.tokens(col("text")).as("t"))
    val n = toks.select(Dedup.simhash(col("t")).as("a"),
        Dedup.simhashComposable(col("t")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n === 0)
  }

  test("graft_minhash ≡ composable signature over the documents corpus") {
    val sh = Tables.load(spark, TestSpark.Sf001, "documents")
      .select(TextFunctions.shingleSet(col("text"), 3).as("s"))
      .filter(size(col("s")) > 0)
    val n = sh.select(Dedup.minhashSignature(col("s"), 16).as("a"),
        Dedup.minhashSignatureComposable(col("s"), 16).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n === 0)
  }

  test("graft_shingles ≡ composable shingle set over the documents corpus") {
    val d = Tables.load(spark, TestSpark.Sf001, "documents")
      .select(TextFunctions.tokens(col("text")).as("t"))
    val n = d.select(
        array_sort(graft.functions.GraftFunctions.shingles(col("t"), 3)).as("a"),
        array_sort(array_distinct(TextFunctions.shinglesComposable(col("t"), 3))).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n === 0)
    // short docs: fewer tokens than n → empty array, not null, not error
    val short = Seq(Tuple1(Array("a", "b"))).toDF("t")
      .select(graft.functions.GraftFunctions.shingles(col("t"), 3).as("s")).head()
    assert(short.getSeq[String](0).isEmpty)
  }

  test("graft_rolling_hashes ≡ independent per-window polynomial over the corpus") {
    // The reference walks each window separately (O(n·width)) in plain
    // Scala — ANSI mode rejects the wrapping multiply in a composable
    // SQL form, and wrapping IS the contract (polynomial mod 2^64).
    val width = 5
    val b = graft.functions.HashSketches.RollB
    def tokHash(t: String): Long =
      if (t == null) graft.functions.HashSketches.Seed
      else {
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(t)
        org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          u.getBaseObject, u.getBaseOffset, u.numBytes,
          graft.functions.HashSketches.Seed)
      }
    def localWindows(toks: Seq[String]): Seq[Long] =
      if (toks.length < width) Seq.empty
      else (0 to toks.length - width).map { i =>
        toks.slice(i, i + width).foldLeft(0L)((acc, t) => acc * b + tokHash(t))
      }
    val rows = Tables.load(spark, TestSpark.Sf001, "documents")
      .select(TextFunctions.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= width)
      .select(col("t"),
        graft.functions.GraftFunctions.rollingWindowHashes(col("t"), width).as("a"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === localWindows(r.getSeq[String](0)))
    }
    // short docs: fewer tokens than width → empty array, not null
    val short = Seq(Tuple1(Array("a", "b"))).toDF("t")
      .select(graft.functions.GraftFunctions.rollingWindowHashes(col("t"), 3).as("s"))
      .head()
    assert(short.getSeq[Long](0).isEmpty)
    // the grouping contract: equal windows hash equal across docs/offsets
    val two = Seq(Tuple1(Array("x", "a", "b", "c")), Tuple1(Array("a", "b", "c", "y")))
      .toDF("t")
      .select(graft.functions.GraftFunctions.rollingWindowHashes(col("t"), 3).as("h"))
      .collect()
    assert(two(0).getSeq[Long](0)(1) === two(1).getSeq[Long](0)(0))
  }

  test("graft_srp ≡ composable SRP bucket over the embeddings corpus, all tables") {
    val e = Tables.load(spark, TestSpark.Sf001, "embeddings")
      .withColumn("v", VectorOps.toDoubleVec(col("embedding")))
    val n = e.filter((0 until 8).map(t =>
        VectorOps.srpBucket(col("v"), 8, t * 8) =!=
          VectorOps.srpBucketComposable(col("v"), 8, t * 8)).reduce(_ || _))
      .count()
    assert(n === 0)
  }

  test("graft_srp / graft_srp_probes: native float input ≡ double-cast input") {
    // the candidate plan feeds the raw array<float> embedding straight
    // to the sketch — every bucket and every probe posting must match
    // the double-cast image exactly
    val e = Tables.load(spark, TestSpark.Sf001, "embeddings")
      .withColumn("v", VectorOps.toDoubleVec(col("embedding")))
    val nb = e.filter((0 until 4).map(t =>
        VectorOps.srpBucket(col("embedding"), 8, t * 8) =!=
          VectorOps.srpBucket(col("v"), 8, t * 8)).reduce(_ || _))
      .count()
    assert(nb === 0)
    val np = e.filter(
        VectorOps.srpProbeBuckets(col("embedding"), 8, 0, 3) =!=
          VectorOps.srpProbeBuckets(col("v"), 8, 0, 3))
      .count()
    assert(np === 0)
  }

  test("graft_srp edge semantics: empty / null-element / NaN vectors match composable") {
    val df = Seq(
      Tuple1(Array.empty[java.lang.Double]),
      Tuple1(Array[java.lang.Double](1.0, null, 2.0)),
      Tuple1(Array[java.lang.Double](Double.NaN, 1.0)),
      Tuple1(Array[java.lang.Double](0.5, -0.25, 3.0))).toDF("v")
    val rows = df.select(
      VectorOps.srpBucket(col("v"), 8, 0).as("n"),
      VectorOps.srpBucketComposable(col("v"), 8, 0).as("c")).collect()
    rows.foreach { r =>
      assert(Option(r.get(0)) === Option(r.get(1)), s"srp mismatch: $r")
    }
    // NULL input → NULL out (unary null propagation on both paths)
    val nullRow = Seq(Tuple1(null: Array[java.lang.Double])).toDF("v")
      .select(VectorOps.srpBucket(col("v"), 8, 0).as("n")).head()
    assert(nullRow.isNullAt(0))
  }

  test("graft_srp_probes: bucket-first, Hamming-1 neighbors, margin-ordered selection (corpus + unit)") {
    // Over the corpus: element 0 is exactly graft_srp; every probe is a
    // Hamming-1 neighbor of it; probes+1 distinct elements; and with
    // probes = planes the SET equals the full XOR expansion the legacy
    // probe path builds.
    val planes = 12
    val e = Tables.load(spark, TestSpark.Sf001, "embeddings")
      .withColumn("v", VectorOps.toDoubleVec(col("embedding")))
      .select(
        VectorOps.srpBucket(col("v"), planes, 0).as("bucket"),
        VectorOps.srpProbeBuckets(col("v"), planes, 0, 3).as("pb3"),
        VectorOps.srpProbeBuckets(col("v"), planes, 0, planes).as("pbAll"))
    val bad = e.filter(
      col("pb3").getItem(0) =!= col("bucket") ||
      size(col("pb3")) =!= lit(4) ||
      size(array_distinct(col("pb3"))) =!= lit(4) ||
      exists(slice(col("pb3"), 2, 3),
        b => call_function("bit_count", b.bitwiseXOR(col("bucket"))) =!= lit(1)) ||
      size(array_except(col("pbAll"),
        array_union(array(col("bucket")),
          transform(sequence(lit(0), lit(planes - 1)),
            p => col("bucket").bitwiseXOR(call_function("shiftleft", lit(1L), p)))))) =!= lit(0))
      .count()
    assert(bad === 0)
    // Unit: the selected planes are exactly the p smallest |projection|s
    // under the identical xxhash64 coefficient chain, margin-ascending.
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val vec = Array(0.9, -1.7, 0.31, 2.4, -0.05, 0.66)
    val ad = new GenericArrayData(vec)
    val got = graft.functions.SrpHash.srpProbeBuckets(ad, planes, 7, 4)
    val bucket = graft.functions.SrpHash.srpBucket64(ad, planes, 7)
    assert(got(0) === bucket)
    val margins = (0 until planes).map { p =>
      val planeSeed = XXH64.hashInt(p + 7, graft.functions.HashSketches.Seed)
      val proj = vec.zipWithIndex.map { case (x, j) =>
        val h = XXH64.hashInt(j, planeSeed)
        val m = ((h % 1000000L) + 1000000L) % 1000000L
        x * (m / 1000000.0 - 0.5)
      }.sum
      (math.abs(proj), p)
    }
    val expectPlanes = margins.sortBy(identity).take(4).map(_._2)
    assert(got.drop(1).toSeq === expectPlanes.map(p => bucket ^ (1L << p)),
      s"margins=$margins")
    // malformed vectors: bucket 0, ties toward low plane indices
    val malformed = new GenericArrayData(Array[Any](1.0, null, 2.0))
    assert(graft.functions.SrpHash.srpProbeBuckets(malformed, 8, 0, 2).toSeq
      === Seq(0L, 1L, 2L))
  }

  test("sketches of empty and null-element arrays match the composable forms exactly") {
    val df = Seq(
      Tuple1(Array.empty[String]),
      Tuple1(Array[String](null, "a", null)),
      Tuple1(Array[String]("a", "b"))).toDF("t")
    val rows = df.select(
      Dedup.simhash(col("t")).as("sn"),
      Dedup.simhashComposable(col("t")).as("sc"),
      Dedup.minhashSignature(col("t"), 4).as("mn"),
      Dedup.minhashSignatureComposable(col("t"), 4).as("mc")).collect()
    rows.foreach { r =>
      assert(Option(r.get(0)) === Option(r.get(1)), s"simhash mismatch: $r")
      assert(Option(r.get(2)).map(_.toString) === Option(r.get(3)).map(_.toString),
        s"minhash mismatch: $r")
    }
  }

  test("graft_shingles skips null tokens exactly like concat_ws (no doubled separator)") {
    val df = Seq(Tuple1(Array[String]("a", null, "b", "c"))).toDF("t")
    val r = df.select(
      graft.functions.GraftFunctions.shingles(col("t"), 3).as("n"),
      array_distinct(TextFunctions.shinglesComposable(col("t"), 3)).as("c")).head()
    assert(r.getSeq[String](0) === r.getSeq[String](1))
    assert(r.getSeq[String](0).contains("a b")) // null skipped, single space
  }

  test("non-literal numHashes argument fails with a diagnosable message") {
    Tables.registerViews(spark, TestSpark.Sf001)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array('a'), doc_id) FROM documents").collect()
    }
    assert(e.getMessage.contains("integer literal"), e.getMessage)
  }

  test("graft_nearest_centroid: separately-built identical calls are semanticEquals (CSE-able)") {
    // Array fields would compare by reference under case-class equals;
    // the content-based override is what lets canonicalization collapse
    // two identical assignments built from separate driver-side tables.
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def build() = GraftFunctions.buildNearestCentroid(Seq(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      Literal(1.0),
      Literal.create(Array(1.0, 0.0, 0.0, 1.0), ArrayType(DoubleType)),
      Literal(2)))
    val (a, b) = (build(), build())
    assert(a ne b)
    assert(a === b)
    assert(a.semanticEquals(b), "identical nearest-centroid calls must canonicalize equal")
    assert(a.hashCode === b.hashCode)
    // and a different table must NOT compare equal
    val c = GraftFunctions.buildNearestCentroid(Seq(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      Literal(1.0),
      Literal.create(Array(0.0, 1.0, 1.0, 0.0), ArrayType(DoubleType)),
      Literal(2)))
    assert(!a.semanticEquals(c))
  }

  test("nearest-centroid builders reject zero-norm and non-finite centroids at construction") {
    // A zero-norm centroid makes every cosine against it NaN, and NaN
    // orders ABOVE every real sim in the top-n insert loops — the
    // malformed centroid would head every probe list. Contract check
    // lives in the builders so no per-row cost is paid.
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def scalarWith(table: Array[Double]) = GraftFunctions.buildNearestCentroid(Seq(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      Literal(1.0),
      Literal.create(table, ArrayType(DoubleType)),
      Literal(2)))
    val e = intercept[IllegalArgumentException] {
      scalarWith(Array(1.0, 0.0, 0.0, 0.0)) // centroid 1 is the zero vector
    }
    assert(e.getMessage.contains("norm"))
    intercept[IllegalArgumentException] {
      scalarWith(Array(1.0, 0.0, Double.NaN, 1.0)) // NaN-poisoned centroid
    }
    intercept[IllegalArgumentException] { // top-n builder shares the check
      GraftFunctions.buildNearestCentroids(Seq(
        BoundReference(0, ArrayType(DoubleType), nullable = true),
        Literal(1.0),
        Literal.create(Array(1.0, 0.0, 0.0, 0.0), ArrayType(DoubleType)),
        Literal(2), Literal(2)))
    }
    // a well-formed table still builds
    scalarWith(Array(1.0, 0.0, 0.0, 1.0))
  }

  test("graft_nearest_centroid: native float input ≡ cast-then-assign on doubles") {
    // assignClusters now feeds the RAW embedding column (array<float>)
    // straight to the expression — every float must widen exactly inside
    // the centroid loop, so the assignment matches the double path row
    // for row (same guarantee graft_dot pins above).
    val e = Tables.load(spark, TestSpark.Sf001, "embeddings")
    val cents = e.orderBy(col("vec_id")).limit(4)
      .select(VectorOps.toDoubleVec(col("embedding")).as("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    val dv = VectorOps.toDoubleVec(col("embedding"))
    val mismatches = e.select(
      GraftFunctions.nearestCentroid(
        col("embedding"), VectorOps.l2Norm(col("embedding")), cents).as("raw"),
      GraftFunctions.nearestCentroid(
        dv, VectorOps.l2Norm(dv), cents).as("dbl"))
      .filter(not(col("raw") <=> col("dbl")))
      .count()
    assert(mismatches === 0L)
  }

  test("graft_normalize ≡ the double-regex composable form on the corpus and on adversarial strings") {
    val docs = Tables.load(spark, TestSpark.Sf001, "documents")
    val corpusDiff = docs.select(
        Dedup.normalizeText(col("text")).as("n"),
        graft.ops.Dedup.normalizeTextComposable(col("text")).as("c"))
      .filter(col("n") =!= col("c")).count()
    assert(corpusDiff === 0L)
    val edge = Seq(
      "", " ", "   ", "a", " a ", "A  B!!C", "Hello,  World!",
      "tabs\tand\nnewlines", "digits 123 mix 4a5", "UPPER lower 42",
      "émigré café naïve", "日本語 text", "a—b–c", "!@#$%^&*()",
      "trailing space ", " leading", "a  b   c    d")
      .toDF("t")
    val edgeDiff = edge.select(
        Dedup.normalizeText(col("t")).as("n"),
        graft.ops.Dedup.normalizeTextComposable(col("t")).as("c"))
      .collect()
    edgeDiff.foreach { r =>
      assert(r.getString(0) === r.getString(1),
        s"native '${r.getString(0)}' vs composable '${r.getString(1)}'")
    }
    // NULL propagates, not NPEs
    val n = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
      .select(Dedup.normalizeText(col("t"))).head()
    assert(n.isNullAt(0))
  }

  test("graft_text_stats ≡ the composable split/markerTokenCount/regex forms on the corpus and edges") {
    import graft.ops.{TextAnalysis, TextFunctions}
    def composable(t: org.apache.spark.sql.Column) = array(
      length(t).cast("long"),
      size(TextFunctions.tokens(t)).cast("long"),
      TextFunctions.markerTokenCount(TextFunctions.tokens(t), TextAnalysis.Stopwords)
        .cast("long"),
      (length(t) - length(regexp_replace(t, "[^a-z0-9 ]", ""))).cast("long"))
    val docs = Tables.load(spark, TestSpark.Sf001, "documents")
    val corpusDiff = docs.select(
        GraftFunctions.textStats(col("text")).as("n"),
        composable(col("text")).as("c"))
      .filter(col("n") =!= col("c")).count()
    assert(corpusDiff === 0L)
    val edge = Seq(
      "", " ", "   ", "a", " a ", "the", "and the a of to in",
      "andy thee ain", "A  B!!C", "tabs\tand\nnewlines",
      "digits 123 mix 4a5", "UPPER lower 42", "émigré café naïve",
      "日本語 text", "trailing space ", " leading", "a  b   c    d",
      "the  the", "in") // double-space: empty token between stopwords
      .toDF("t")
    edge.select(GraftFunctions.textStats(col("t")).as("n"),
        composable(col("t")).as("c"), col("t"))
      .collect().foreach { r =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"text='${r.getString(2)}'")
      }
    val n = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
      .select(GraftFunctions.textStats(col("t"))).head()
    assert(n.isNullAt(0))
  }

  test("SQL surface: graft_dot / graft_simhash resolve by name") {
    Tables.registerViews(spark, TestSpark.Sf001)
    val r = spark.sql(
      """SELECT graft_dot(transform(embedding, x -> CAST(x AS DOUBLE)),
        |                 transform(embedding, x -> CAST(x AS DOUBLE))) AS d
        |FROM embeddings LIMIT 1""".stripMargin).head()
    assert(r.getDouble(0) > 0.0)
  }
}
